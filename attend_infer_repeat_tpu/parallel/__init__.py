"""Parallelism layer: device meshes and sharding for data-parallel AIR.

The reference is strictly single-process/single-device (SURVEY §3.1 —
no DP/TP/PP/SP/EP, no comm backend).  This layer is therefore new
TPU-native capability, not a port: a ``jax.sharding.Mesh`` over the
``data`` axis, replicated parameters, batch sharded across chips, and
XLA-inserted collectives (gradient ``psum`` over ICI) via GSPMD.

Tensor/pipeline/sequence/expert parallelism are deliberately N/A at this
model size (~2 M params, 50×50 images — SURVEY §3.1): the mesh API keeps
the axes extensible, but fabricating TP for a 256-wide MLP would be
slower than replicating.  The IWAE particle axis (BASELINE config 4)
composes as a vmap inside each shard.
"""

from attend_infer_repeat_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from attend_infer_repeat_tpu.parallel.shard_map_step import (
    make_shardmap_train_step,
)

__all__ = ["batch_sharding", "make_mesh", "replicate", "shard_batch",
           "make_shardmap_train_step"]
