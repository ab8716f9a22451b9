"""Multi-chip scaling: device meshes, sharded sweeps, collective merges."""

from edlib_tpu.parallel.dist import (
    make_alignment_mesh,
    shard_target_slices,
    sharded_hw_search,
    sharded_sweep_dp,
)

__all__ = [
    "make_alignment_mesh",
    "shard_target_slices",
    "sharded_hw_search",
    "sharded_sweep_dp",
]
