"""Multi-chip scaling: device meshes, sharded sweeps, collective merges."""

from edlib_tpu.parallel.dist import (
    make_alignment_mesh,
    shard_target_slices,
    sharded_hw_locations,
    sharded_hw_search,
    sharded_nw_pipeline,
    sharded_reduce_pipeline,
    sharded_reduce_dp,
    sharded_sweep_dp,
)
from edlib_tpu.parallel.pipeline import (
    pipelined_sweep_summaries,
    split_target_segments,
)

__all__ = [
    "make_alignment_mesh",
    "shard_target_slices",
    "sharded_hw_locations",
    "sharded_hw_search",
    "sharded_nw_pipeline",
    "sharded_reduce_pipeline",
    "sharded_reduce_dp",
    "sharded_sweep_dp",
    "pipelined_sweep_summaries",
    "split_target_segments",
]
