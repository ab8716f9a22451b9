"""Segmented HW search: one (or few) queries vs one very long target.

HW (infix) search parallelises along the target: an alignment of cost <= k
spans at most Q+k target columns and HW restarts free at every column, so
the target can be cut into S overlapping segments (left halo Q+k-1 columns,
NULL-padded before the target start) whose core score streams are exact
wherever <= k — the same invariant as the multi-chip "sp" sharding
(edlib_tpu/parallel/dist.py), applied WITHIN a chip to turn a long single
search into a full batch of lanes.

This is the TPU answer to the reference's banded long-target scan
(edlib.cpp:550-704 over 1Mbp+ targets): a 1Mbp x 300bp HW search becomes
~1024 lanes x ~1.3kbp sweeps on the batched kernel.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from edlib_tpu import encode

# Peq row convention (matches parallel/dist.py): row sigma = WILDCARD,
# row sigma+1 = NULL (matches nothing).


def plan_segments(tlen: int, halo: int, w_pad: int,
                  max_lanes: int = 1024) -> Tuple[int, int]:
    """(n_segments, core_len): enough segments to fill lanes without letting
    halo overhead dominate (halo work <= ~50% of core work)."""
    if tlen <= 0:
        return 1, 1
    min_core = max(32, halo // 2)
    n = max(1, min(max_lanes, math.ceil(tlen / min_core)))
    core = math.ceil(tlen / n)
    n = math.ceil(tlen / core)
    return n, core


def segment_target(t_ids: np.ndarray, sigma: int, n_seg: int, core: int,
                   halo: int, w_pad: int) -> np.ndarray:
    """int32 (n_seg, halo + core + w_pad) slices; NULL before target start,
    WILDCARD after target end and in the w_pad tail."""
    tlen = len(t_ids)
    null_sym = sigma + 1
    wild = sigma
    L = halo + core + w_pad
    out = np.full((n_seg, L), wild, dtype=np.int32)
    padded = np.concatenate([
        np.full(halo, null_sym, dtype=np.int32),
        np.asarray(t_ids, dtype=np.int32),
        np.full(n_seg * core - tlen, wild, dtype=np.int32),
    ])
    for s in range(n_seg):
        out[s, :halo + core] = padded[s * core:s * core + halo + core]
    return out


def hw_stream_segmented(q_ids: np.ndarray, t_ids: np.ndarray, sigma: int,
                        k_eff: int, interpret: bool = False
                        ) -> Optional[np.ndarray]:
    """Full bottom-row score stream cell(Q-1, c), c in [0, tlen), via the
    batched device kernel over target segments.

    Entries are exact wherever <= k_eff; entries the segmentation cannot
    certify are clamped to SCORE_INF-like large values (they are > k_eff).
    Returns None when the device path is unavailable.
    """
    import os
    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        return None
    forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
    try:
        import jax
    except Exception:
        return None
    if not forced and jax.default_backend() != "tpu":
        return None
    from edlib_tpu.ops import pallas_kernel as pk

    qlen = len(q_ids)
    tlen = len(t_ids)
    n_words = encode.num_words(qlen)
    if sigma + 2 > pk.max_sigma1(n_words, shared=False):
        return None
    w_pad = n_words * 32 - qlen
    halo = qlen + int(k_eff) - 1
    n_seg, core = plan_segments(tlen, halo, w_pad)
    slices = segment_target(t_ids, sigma, n_seg, core, halo, w_pad)

    # Peq replicated across lanes, with wildcard + NULL rows.
    eq = np.eye(sigma, dtype=bool)
    peq_row = np.zeros((sigma + 2, n_words), np.uint32)
    peq_row[:sigma + 1] = encode.build_peq_words(
        np.asarray(q_ids, np.uint8), eq, n_words=n_words)
    peq_row[sigma + 1] = 0  # NULL row
    peq = np.broadcast_to(peq_row, (n_seg, sigma + 2, n_words)).copy()

    sweeper = pk.PallasSweeper(chunk=256, interpret=(forced == "interpret"))
    streams = sweeper.sweep(peq, slices, hin0=0)  # (n_seg, L)

    # Core columns: segment s, core col j -> global position s*core + j.
    cores = streams[:, halo + w_pad:]
    assembled = cores.reshape(-1)[:tlen].astype(np.int64)
    return assembled
