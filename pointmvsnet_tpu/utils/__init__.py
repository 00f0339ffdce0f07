"""Runtime utilities: solver, checkpointing, logging, meters, eval export.

Reference counterpart: ``pointmvsnet/utils/`` (SURVEY.md §2.11–§2.15).
"""
