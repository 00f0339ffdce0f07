"""Standard DTU scan splits (public MVSNet/Point-MVSNet protocol).

Reference counterpart: the scan index lists hard-coded in
``pointmvsnet/dataset/dtu.py`` (SURVEY.md §2.2). These are the canonical
79/18/22 train/val/eval splits from the MVSNet release.
"""

DTU_TRAIN_SCANS = [
    2, 6, 7, 8, 14, 16, 18, 19, 20, 22, 30, 31, 36, 39, 41, 42, 44, 45, 46,
    47, 50, 51, 52, 53, 55, 57, 58, 60, 61, 63, 64, 65, 68, 69, 70, 71, 72,
    74, 76, 83, 84, 85, 87, 88, 89, 90, 91, 92, 93, 94, 95, 96, 97, 98, 99,
    100, 101, 102, 103, 104, 105, 107, 108, 109, 111, 112, 113, 115, 116,
    119, 120, 121, 122, 123, 124, 125, 126, 127, 128,
]

DTU_VAL_SCANS = [
    3, 5, 17, 21, 28, 35, 37, 38, 40, 43, 56, 59, 66, 67, 82, 86, 106, 117,
]

DTU_EVAL_SCANS = [
    1, 4, 9, 10, 11, 12, 13, 15, 23, 24, 29, 32, 33, 34, 48, 49, 62, 75, 77,
    110, 114, 118,
]
