"""edlib_tpu — a TPU-native sequence-alignment (edit distance) framework.

A from-scratch re-design of the capabilities of edlib (Šošić & Šikić,
Bioinformatics 2017; reference C++ at Martinsos/edlib) for TPU hardware:

* the unit of work is a **batch of alignments** (vmap'd Myers bit-vector DP
  over JAX / Pallas), not a single pair;
* bit-parallel words are ``uint32`` VPU lanes instead of CPU ``uint64``;
* the target-column loop is a ``lax.scan`` / Pallas grid instead of a C loop;
* multi-chip scaling uses ``jax.sharding`` meshes + collectives instead of
  threads (the reference has none).

Public API (parity with the reference Python binding, edlib.pyx:56-238):

    align(query, target, mode="NW", task="distance", k=-1,
          additionalEqualities=None) -> dict
    getNiceAlignment(alignResult, query, target, gapSymbol="-") -> dict

TPU-first batch API (the throughput path — no reference equivalent):

    align_batch(queries, targets, mode=..., task=..., k=...) -> list[dict]

Lower-level pieces live in :mod:`edlib_tpu.ops` (kernels/engines),
:mod:`edlib_tpu.path` (traceback / Hirschberg), :mod:`edlib_tpu.parallel`
(mesh sharding) and :mod:`edlib_tpu.io` (FASTA).
"""

from edlib_tpu.types import (
    STATUS_OK,
    STATUS_ERROR,
    AlignMode,
    AlignTask,
    CigarFormat,
    EDOP_MATCH,
    EDOP_INSERT,
    EDOP_DELETE,
    EDOP_MISMATCH,
    AlignConfig,
    AlignResult,
    new_align_config,
    default_align_config,
)
from edlib_tpu.align import align, align_batch
from edlib_tpu.cigar import alignment_to_cigar, cigar_to_alignment
from edlib_tpu.longpair import (
    nw_distance_long,
    semiglobal_locations_long,
    shw_best_long,
)
from edlib_tpu.mapping import map_reads
from edlib_tpu.nice import getNiceAlignment

__version__ = "0.1.0"

__all__ = [
    "align",
    "align_batch",
    "map_reads",
    "nw_distance_long",
    "shw_best_long",
    "semiglobal_locations_long",
    "getNiceAlignment",
    "alignment_to_cigar",
    "cigar_to_alignment",
    "AlignMode",
    "AlignTask",
    "CigarFormat",
    "AlignConfig",
    "AlignResult",
    "new_align_config",
    "default_align_config",
    "EDOP_MATCH",
    "EDOP_INSERT",
    "EDOP_DELETE",
    "EDOP_MISMATCH",
    "STATUS_OK",
    "STATUS_ERROR",
]
