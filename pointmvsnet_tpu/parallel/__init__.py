"""Parallelism: device mesh, sharded train/eval steps.

Replaces the reference's ``torch.nn.DataParallel`` call sites (SURVEY.md
§2.12) with the TPU-native equivalent: one ``jax.sharding.Mesh`` over ICI,
``jit`` with NamedSharding constraints — XLA inserts the gradient
all-reduce (psum) that DataParallel's gather performed on GPU0.
"""

from pointmvsnet_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    make_mesh_eval,
    replicate,
    shard_batch,
)
from pointmvsnet_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "make_mesh_eval",
    "shard_batch",
    "replicate",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
