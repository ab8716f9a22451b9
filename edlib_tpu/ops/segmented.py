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


def hw_best_segmented(read_ids, t_ids: np.ndarray, sigma: int,
                      max_lanes: int = 4096
                      ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Per-read (best, first best end position) for FEW reads vs one long
    target, with the reduction ON DEVICE.

    Each read fans out over overlapping target segments as lanes of the
    two-phase reduce kernel; only O(B x n_seg) scalars leave the chip
    (best, first-pos per segment), merged on host in O(n_seg) — unlike the
    stream path, nothing O(tlen) ships over the (slow, tunneled) link.
    The target transfers ONCE (O(tlen)); the per-lane slice views are
    gathered on device.

    Exactness: with halo = 2*qmax - 1 every segment's core scores are exact
    wherever <= qlen (ops/segmented.py module invariant), and HW best is
    always <= qlen, so the merged (best, first-pos) equals the full-stream
    (min, argmin).

    Returns (best int64 (B,), pos int64 (B,)) in target coordinates, or
    None when the device path is unavailable.
    """
    import os
    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        return None
    forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
    try:
        import jax
        import jax.numpy as jnp
    except Exception:
        return None
    if not forced:
        # Bounded subprocess probe before any in-process jax init (a wedged
        # tunneled backend blocks indefinitely in jax.default_backend()).
        from edlib_tpu.utils import hw
        if not hw.device_ready() or jax.default_backend() != "tpu":
            return None
    from edlib_tpu.ops import pallas_kernel as pk

    B = len(read_ids)
    tlen = len(t_ids)
    if B == 0 or tlen == 0:
        return None
    qmax = max(len(r) for r in read_ids)
    qmin = min(len(r) for r in read_ids)
    n_words = encode.num_words(qmax)
    if sigma + 2 > pk.max_sigma1(n_words, shared=False):
        return None
    w_max = n_words * 32 - qmin
    halo = 2 * qmax - 1  # qlen + k_eff - 1 at k_eff = qlen, for every read
    n_seg, core = plan_segments(tlen, halo, w_max,
                                max_lanes=max(1, max_lanes // B))
    L = halo + core + w_max
    null_sym, wild = sigma + 1, sigma

    eq = np.eye(sigma, dtype=bool)
    peq = np.zeros((B, sigma + 2, n_words), np.uint32)
    lo = np.zeros((B, n_seg), np.int32)
    hi = np.zeros((B, n_seg), np.int32)
    # Segment s covers target columns [s*core, s*core + core_s).
    seg_cols = np.minimum(core, tlen - core * np.arange(n_seg))
    for i, r in enumerate(read_ids):
        peq[i, :sigma + 1] = encode.build_peq_words(
            np.asarray(r, np.uint8), eq, n_words=n_words)
        peq[i, sigma + 1] = 0  # NULL row: matches nothing (halo padding)
        w_i = n_words * 32 - len(r)
        # Scan column c of a slice reads cell(Q-1, c - w_i); the core starts
        # at slice column halo, so the reduce window is halo+w_i .. +core_s.
        lo[i] = halo + w_i
        hi[i] = halo + w_i + seg_cols

    # Device-side slice gather: one padded target transfer, n_seg views.
    # Columns past a slice's halo+core region may hold real target symbols
    # instead of wildcards (unlike segment_target) — harmless, the reduce
    # window never reaches them and the DP is left-to-right.
    t_dev = jnp.asarray(np.ascontiguousarray(t_ids, dtype=np.int32))
    padded = jnp.concatenate([
        jnp.full((halo,), null_sym, jnp.int32), t_dev,
        jnp.full((n_seg * core - tlen + w_max,), wild, jnp.int32)])
    idx = (core * np.arange(n_seg)[:, None]
           + np.arange(L)[None, :])  # static (n_seg, L)
    slices_dev = padded[jnp.asarray(idx)]
    tg = jnp.broadcast_to(slices_dev[None], (B, n_seg, L)).reshape(
        B * n_seg, L)
    peq_dev = jnp.broadcast_to(
        jnp.asarray(peq)[:, None], (B, n_seg, sigma + 2, n_words)).reshape(
        B * n_seg, sigma + 2, n_words)
    best, pfirst, _, _ = pk.reduce_flat_device(
        peq_dev, tg, jnp.asarray(lo.reshape(-1)), jnp.asarray(hi.reshape(-1)),
        hin0=0, interpret=(forced == "interpret"))
    best = np.asarray(best).reshape(B, n_seg).astype(np.int64)
    pfirst = np.asarray(pfirst).reshape(B, n_seg).astype(np.int64)

    out_best = np.empty(B, np.int64)
    out_pos = np.empty(B, np.int64)
    seg_base = core * np.arange(n_seg)
    for i, r in enumerate(read_ids):
        w_i = n_words * 32 - len(r)
        b = best[i].min()
        gpos = seg_base + (pfirst[i] - halo - w_i)
        out_best[i] = b
        out_pos[i] = gpos[best[i] == b].min()
    return out_best, out_pos


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
    if not forced:
        # Bounded subprocess probe before any in-process jax init (a wedged
        # tunneled backend blocks indefinitely in jax.default_backend()).
        from edlib_tpu.utils import hw
        if not hw.device_ready() or jax.default_backend() != "tpu":
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
