"""Batched alignment on device — the TPU throughput path.

The reference CLI loops pairs serially through one core (aligner.cpp:162-225);
here the batch IS the parallel axis: pairs are bucketed by shape (power-of-two
word count and scan length to bound recompilation), packed into device arrays,
swept by the batched Myers engine, and post-processed with exactly the same
location/path rules as the single-pair orchestrator — results are verified
identical to per-pair ``align`` in tests.

HW start locations are themselves batched: all (pair, end-location)
reversed-SHW re-runs (the scheme of edlib.cpp:230-266) are collected into one
device batch instead of re-running serially per location.
"""

from __future__ import annotations

import functools
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from edlib_tpu import encode, native_loader
from edlib_tpu.align import _filter_locations, align
from edlib_tpu.path.hirschberg import obtain_alignment
from edlib_tpu.types import (
    STATUS_OK,
    AlignMode,
    AlignResult,
    AlignTask,
)

_INF = float("inf")


def _pow2_at_least(x: int, floor: int = 1) -> int:
    n = floor
    while n < x:
        n *= 2
    return n


class GlobalAlphabet:
    """Shared symbol table across a batch (engine ids are mapping-invariant;
    per-pair alphabetLength is computed separately for API parity)."""

    def __init__(self):
        self.letter_idx = np.full(256, -1, dtype=np.int16)
        self.alphabet = bytearray()

    def encode(self, seq: bytes) -> np.ndarray:
        arr = np.frombuffer(seq, dtype=np.uint8)
        unseen = arr[self.letter_idx[arr] < 0]
        if unseen.size:
            # First-appearance order (matches transform_sequences,
            # edlib.cpp:1417-1462) so these ids stay safe to surface.
            uniq, first = np.unique(unseen, return_index=True)
            for c in uniq[np.argsort(first)]:
                self.letter_idx[c] = len(self.alphabet)
                self.alphabet.append(int(c))
        return self.letter_idx[arr].astype(np.int32)

    @property
    def sigma(self) -> int:
        return len(self.alphabet)


def _sweep_bucket(q_ids_list, t_ids_list, sigma: int, eq: np.ndarray,
                  n_words: int, t_scan: int, hin0: int) -> np.ndarray:
    """Pack one shape bucket and run the batched sweep; returns (B, t_scan)
    int32 score streams."""
    B = len(q_ids_list)
    # Pad the batch axis to a power of two so compiled sweep shapes are
    # reused across calls (padding rows are all-wildcard no-ops).
    B_pad = _pow2_at_least(B, floor=8)
    peq = np.full((B_pad, sigma + 1, n_words), 0xFFFFFFFF, dtype=np.uint32)
    targets = np.full((B_pad, t_scan), sigma, dtype=np.int32)  # wildcard fill
    for b, (q_ids, t_ids) in enumerate(zip(q_ids_list, t_ids_list)):
        peq[b] = encode.build_peq_words(q_ids, eq, n_words=n_words)
        targets[b, :len(t_ids)] = t_ids
    return _run_sweep(peq, targets, hin0)[:B]


def _pallas_mode() -> str:
    """'tpu' to use the Pallas kernel, 'interpret' to force the interpreter
    (tests), '' to use the XLA scan engine."""
    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        return ""
    forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
    if forced:
        return forced
    from edlib_tpu.utils import hw
    if not hw.device_ready():  # bounded probe BEFORE in-process jax init
        return ""
    import jax
    return "tpu" if jax.default_backend() == "tpu" else ""


def _run_sweep(peq: np.ndarray, targets: np.ndarray, hin0: int) -> np.ndarray:
    """Dispatch a packed sweep to the right engine for the current backend.

    On TPU the XLA scan engine is latency-bound (per-step while-loop
    overhead), so the Pallas kernel runs the column loop on-chip; on CPU the
    scan engine wins (Pallas would interpret).
    """
    from edlib_tpu.ops import jax_engine, pallas_kernel

    mode = _pallas_mode()
    if mode and peq.shape[1] <= pallas_kernel.max_sigma1(peq.shape[2],
                                                         shared=False):
        chunk = int(os.environ.get("EDLIB_TPU_PALLAS_CHUNK", "256"))
        sweeper = pallas_kernel.PallasSweeper(
            chunk=chunk, interpret=(mode == "interpret"))
        return sweeper.sweep(peq, targets, hin0=hin0)
    return np.asarray(jax_engine.sweep_scores(peq, targets, hin0=hin0))


class PairSummary:
    """Everything the orchestration needs from one pair's sweep, without the
    O(T) score stream: the reference's banded engines keep only this much
    live state too (edlib.cpp:657-693)."""

    __slots__ = ("best", "pos_first", "pos_last", "last_score", "positions")

    def __init__(self, best, pos_first, pos_last, last_score, positions):
        self.best = best              # min over real end positions
        self.pos_first = pos_first    # first position attaining it
        self.pos_last = pos_last      # last position attaining it
        self.last_score = last_score  # score at position tlen-1 (NW)
        self.positions = positions    # all minimal positions, or None


def _summarize_stream(stream: np.ndarray, want_hits: bool) -> PairSummary:
    best = int(stream.min())
    hits = np.nonzero(stream == best)[0].astype(np.int64)
    return PairSummary(best, int(hits[0]), int(hits[-1]), int(stream[-1]),
                       hits if want_hits else None)


def _filter_best_positions(best: int, positions, qlen: int, k_eff
                           ) -> Tuple[int, List[int]]:
    """Same contract as align._filter_locations, from (best, hit list)."""
    from edlib_tpu.align import _neg1_candidate_exists
    overall = int(best)
    if _neg1_candidate_exists(qlen):
        overall = min(overall, qlen)
    if overall > k_eff:
        return -1, []
    out: List[int] = []
    if _neg1_candidate_exists(qlen) and qlen == overall:
        out.append(-1)
    if int(best) == overall:
        out.extend(int(p) for p in positions)
    return overall, out


def _decode_hit_words(words: np.ndarray, shift: int) -> np.ndarray:
    """Sorted positions from a packed uint32 bitmask row (bit j of word g =
    position 32g + j + shift)."""
    nz = np.nonzero(words)[0]
    if nz.size == 0:
        return np.empty(0, dtype=np.int64)
    bits = (words[nz, None] >> np.arange(32, dtype=np.uint32)) & 1
    g_idx, b_idx = np.nonzero(bits)
    return np.sort(nz[g_idx].astype(np.int64) * 32 + b_idx) + shift


def _run_bucket_mesh(mesh, idxs, pairs, metas, sigma, eq, nw_b, t_scan,
                     hin0, want_hits, shared) -> List[PairSummary]:
    """One bucket on a device mesh: sp+dp halo sharding for shared-target
    HW, dp sharding otherwise; locations merged on device (parallel/dist)."""
    from edlib_tpu.parallel import dist

    n_dev = mesh.devices.size
    B = len(idxs)
    B_pad = -(-B // n_dev) * n_dev
    qlens = [len(pairs[i][0]) for i in idxs]
    ws = np.array([metas[i][1] for i in idxs], np.int32)

    if shared and hin0 == 0:
        # Sequence-parallel HW: halo-sliced shared target, pmin/pmax merge.
        sp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("sp", 1)
        dp = n_dev // sp
        B_pad = -(-B // dp) * dp
        t_ids = pairs[idxs[0]][1]
        qmax = max(qlens)
        w_max = int(ws.max())
        halo = 2 * qmax - 1
        # Word-align the core start so the kernel engine's packed hit
        # bitmask slices on uint32 boundaries (bigger halo stays exact).
        halo += (-(halo + w_max)) % 32
        peq = np.zeros((B_pad, sigma + 2, nw_b), np.uint32)
        peq[:, :sigma + 1] = 0xFFFFFFFF  # pad lanes: wildcard profiles
        w_lanes = np.full(B_pad, w_max, np.int32)
        for row, i in enumerate(idxs):
            peq[row, :sigma + 1] = encode.build_peq_words(pairs[i][0], eq,
                                                          n_words=nw_b)
            peq[row, sigma + 1] = 0  # NULL row for halo padding
            w_lanes[row] = metas[i][1]
        slices, C = dist.shard_target_slices(np.asarray(t_ids), sigma, sp,
                                             halo, w_max, c_multiple=32)
        best, pf, pl_, hits = dist.sharded_hw_locations(
            mesh, peq, slices, halo, w_max, len(t_ids), w_lanes=w_lanes,
            want_hits=want_hits)
        best, pf, pl_ = (np.asarray(best), np.asarray(pf), np.asarray(pl_))
        if want_hits:
            hits = np.asarray(hits)
        out = []
        for row, i in enumerate(idxs):
            delta = int(w_max - w_lanes[row])
            positions = None
            if want_hits:
                positions = _decode_hit_words(hits[row], delta)
                positions = positions[positions < len(t_ids)]
            # The sharded kernel reports positions directly (no W shift)
            # and has no final-column capture: NW never routes here.
            out.append(PairSummary(int(best[row]), int(pf[row]),
                                   int(pl_[row]), _BIG_SENTINEL, positions))
        return out

    # Data-parallel: per-pair targets (or non-HW modes).
    peq = np.full((B_pad, sigma + 1, nw_b), 0xFFFFFFFF, dtype=np.uint32)
    targets = np.full((B_pad, t_scan), sigma, dtype=np.int32)
    lo = np.zeros(B_pad, np.int32)
    hi = np.zeros(B_pad, np.int32)
    for row, i in enumerate(idxs):
        q_ids, t_ids = pairs[i]
        peq[row] = encode.build_peq_words(q_ids, eq, n_words=nw_b)
        targets[row, :len(t_ids)] = t_ids
        lo[row] = metas[i][1]
        hi[row] = metas[i][1] + len(t_ids)
    best, pf, pl_, last, hits = dist.sharded_reduce_dp(
        mesh, peq, targets, lo, hi, hin0, want_hits=want_hits)
    best, pf, pl_, last = (np.asarray(best), np.asarray(pf),
                           np.asarray(pl_), np.asarray(last))
    if want_hits:
        hits = np.asarray(hits)
    out = []
    for row, i in enumerate(idxs):
        w = metas[i][1]
        positions = None
        if want_hits:
            positions = _decode_hit_words(hits[row], -w)
        out.append(PairSummary(int(best[row]), int(pf[row]) - w,
                               int(pl_[row]) - w, int(last[row]), positions))
    return out


_BIG_SENTINEL = 0x3FFFFFFF


def _eqstream_ok(mode: str, n_pairs: int, nw_b: int, t_scan: int,
                 sigma: int) -> bool:
    """Whether a per-lane-target bucket past the select-chain alphabet cap
    can run the (legacy) eq-stream kernels: HBM footprint of the REAL
    intermediates under the cap.  The kernel pads lanes to B_TILE tiles
    (not the pow2 estimate), keeps the gathered stream twice (eqs + the
    tile-transposed eq_t), and the MXU gather materialises a
    (B_pad, t_scan, sigma+1) bf16 one-hot operand (XLA cannot fuse
    producers into matmul operands) — the dominant term at large sigma."""
    if not mode:
        return False
    from edlib_tpu.ops import pallas_kernel
    b_pad = -(-max(n_pairs, 1) // pallas_kernel.B_TILE) \
        * pallas_kernel.B_TILE
    cap = int(os.environ.get("EDLIB_TPU_EQSTREAM_MAX_MB", "1024")) << 20
    stream = b_pad * t_scan * nw_b * 4 * 2        # eqs + eq_t copy
    onehot = b_pad * t_scan * (sigma + 1) * 2     # bf16 matmul operand
    return stream + onehot <= cap


_BITPLANE_MAX_ALTS = 4


@functools.lru_cache(maxsize=32)
def _bigalpha_plan_cached(sigma: int, eq_key: bytes):
    eqb = np.frombuffer(eq_key, dtype=bool).reshape(sigma, sigma).copy()
    np.fill_diagonal(eqb, True)
    cnt = eqb.sum(1)
    universal = cnt >= sigma
    live = ~universal
    n_alts = int(cnt[live].max()) if live.any() else 1
    if n_alts > _BITPLANE_MAX_ALTS:
        return None
    altset = np.full((sigma, n_alts), -1, np.int32)
    for v in np.nonzero(live)[0]:
        alts = np.nonzero(eqb[v])[0]
        altset[v, :len(alts)] = alts
    return altset, universal, n_alts


def _bigalpha_plan(sigma: int, eq: np.ndarray):
    """Host-side decomposition of the equality matrix for the bit-plane
    kernels: per-symbol alternative-id table (each query row matches the
    target symbols in its row's set), universal-row mask (rows matching
    everything ride the packed pad mask), and the alternative count E.
    None when some non-universal row matches more than
    _BITPLANE_MAX_ALTS symbols (dense custom equalities — legacy
    eq-stream handles those).  Cached per equality matrix."""
    eqb = np.ascontiguousarray(eq[:sigma, :sigma].astype(bool))
    return _bigalpha_plan_cached(sigma, eqb.tobytes())


def _run_bucket_bitplane(idxs, pairs, metas, sigma, plan, nw_b, t_scan,
                         hin0, want_hits, mode) -> List[PairSummary]:
    """One per-lane-target bucket of ANY alphabet size via the bit-plane
    kernels (pallas_kernel.reduce_flat_device_bitplane): Eq rows are
    rebuilt in kernel from VMEM-resident query-id bit planes — no select
    chain, no HBM Eq stream, no one-hot gather.  The reference's full
    sigma <= 256 (edlib.cpp:1417-1462) with no alphabet cliff."""
    import jax.numpy as jnp
    from edlib_tpu.ops import pallas_kernel

    altset, universal, n_alts = plan
    nb = pallas_kernel.bitplane_nb(sigma)
    sent = (1 << nb) - 1
    R = nw_b * 32
    B = len(idxs)
    q_alts = np.full((B, n_alts, R), sent, np.int32)
    pad_words = np.zeros((B, nw_b), np.uint32)
    targets = np.full((B, t_scan), sigma, np.int32)
    lo = np.zeros(B, np.int32)
    hi = np.zeros(B, np.int32)
    row_bit = (np.uint32(1) << (np.arange(R, dtype=np.uint32) % 32))
    for row, i in enumerate(idxs):
        q_ids, t_ids = pairs[i]
        qlen = len(q_ids)
        qv = np.asarray(q_ids, np.int64)
        alts = altset[qv].T                        # (n_alts, qlen)
        q_alts[row, :, :qlen] = np.where(alts >= 0, alts, sent)
        always = np.ones(R, bool)
        always[:qlen] = universal[qv]
        pad_words[row] = np.bitwise_or.reduce(
            np.where(always, row_bit, 0).reshape(nw_b, 32), axis=1)
        targets[row, :len(t_ids)] = t_ids
        lo[row] = metas[i][1]
        hi[row] = metas[i][1] + len(t_ids)
    outs = pallas_kernel.reduce_flat_device_bitplane(
        jnp.asarray(q_alts), jnp.asarray(pad_words), jnp.asarray(targets),
        jnp.asarray(lo), jnp.asarray(hi), hin0=hin0, sigma=sigma,
        want_hits=want_hits, interpret=(mode == "interpret"))
    best, pf, pl_, last = (np.asarray(o) for o in outs[:4])
    hits = np.asarray(outs[4]) if want_hits else None
    out = []
    for row, i in enumerate(idxs):
        w = metas[i][1]
        positions = None
        if want_hits:
            positions = _decode_hit_words(hits[row], -w)
        out.append(PairSummary(int(best[row]), int(pf[row]) - w,
                               int(pl_[row]) - w, int(last[row]), positions))
    return out


def _bigalpha_route(mode: str, sigma: int, eq: np.ndarray, n_pairs: int,
                    nw_b: int, t_scan: int):
    """Routing for per-lane-target buckets past the select-chain alphabet
    cap: ('bitplane', plan) when the in-kernel bit-plane engine applies
    (the fast default), ('eqstream', None) for dense equality matrices the
    plane decomposition cannot express, (None, None) -> host engines."""
    if not mode:
        return None, None
    from edlib_tpu.ops import pallas_kernel
    if os.environ.get("EDLIB_TPU_BITPLANE", "") != "0":
        plan = _bigalpha_plan(sigma, eq)
        if plan is not None and pallas_kernel.bitplane_ok(
                nw_b, sigma, plan[2]):
            return "bitplane", plan
    if _eqstream_ok(mode, n_pairs, nw_b, t_scan, sigma):
        return "eqstream", None
    return None, None


def _run_bucket_eqstream(idxs, pairs, metas, sigma, eq, nw_b, t_scan,
                         hin0, want_hits, mode) -> List[PairSummary]:
    """One per-lane-target bucket with sigma past the select-chain cap:
    Eq rows gathered by exact MXU one-hot matmuls and streamed through the
    eq-stream reduce/hits kernels — the reference's full sigma <= 256
    (edlib.cpp:1417-1462) without leaving the chip."""
    import jax.numpy as jnp
    from edlib_tpu.ops import pallas_kernel

    B = len(idxs)
    B_pad = _pow2_at_least(B, floor=8)
    peq = np.full((B_pad, sigma + 1, nw_b), 0xFFFFFFFF, dtype=np.uint32)
    targets = np.full((B_pad, t_scan), sigma, np.int32)
    lo = np.zeros(B_pad, np.int32)
    hi = np.zeros(B_pad, np.int32)
    for row, i in enumerate(idxs):
        q_ids, t_ids = pairs[i]
        peq[row] = encode.build_peq_words(q_ids, eq, n_words=nw_b)
        targets[row, :len(t_ids)] = t_ids
        lo[row] = metas[i][1]
        hi[row] = metas[i][1] + len(t_ids)
    chunk = pallas_kernel.eqstream_chunk(nw_b)
    outs = pallas_kernel.reduce_flat_device_eqstream(
        jnp.asarray(peq), jnp.asarray(targets), jnp.asarray(lo),
        jnp.asarray(hi), hin0=hin0, chunk=chunk, want_hits=want_hits,
        interpret=(mode == "interpret"))
    best, pf, pl_, last = (np.asarray(o) for o in outs[:4])
    hits = np.asarray(outs[4]) if want_hits else None
    out = []
    for row, i in enumerate(idxs):
        w = metas[i][1]
        positions = None
        if want_hits:
            positions = _decode_hit_words(hits[row], -w)
        out.append(PairSummary(int(best[row]), int(pf[row]) - w,
                               int(pl_[row]) - w, int(last[row]), positions))
    return out


def _shw_banded_bucket(sweeper, peq, targets, lo, hi, kb, k_user,
                       want_hits, shared):
    """Banded SHW bucket: k-doubling ladder over the sliding-window
    kernel, capped at the per-lane guaranteed bounds kb (>= each lane's
    true best, so the capped run always completes every lane within the
    k_user cutoff) — the device counterpart of the reference's SHW under
    the doubling loop (edlib.cpp:58-78 banding + 154-160 boundaries).

    Returns (best, pos_first, pos_last, positions) over the first len(kb)
    lanes, scan-column space; not-found lanes (true best > k_user) report
    _BIG_SENTINEL / empty positions.
    """
    B = len(kb)
    k_lim = max(int(kb.max(initial=1)), 1)
    if k_user >= 0:
        k_lim = min(k_lim, max(int(k_user), 1))
    best = np.full(B, _BIG_SENTINEL, np.int64)
    pf = np.full(B, -1, np.int64)
    pl_ = np.full(B, -1, np.int64)
    done = np.zeros(B, bool)
    k_cur = min(64, k_lim)
    while True:
        rb, rf, rl = sweeper.reduce_shw_banded(peq, targets, lo, hi, k_cur,
                                               shared=shared)
        newly = ~done & (rb[:B] <= k_cur)
        best[newly] = rb[:B][newly]
        pf[newly] = rf[:B][newly]
        pl_[newly] = rl[:B][newly]
        done |= newly
        if done.all() or k_cur >= k_lim:
            break
        k_cur = min(k_cur * 2, k_lim)
        if 2 * k_cur >= peq.shape[2] * 32:
            # The next window would span every word — no pruning left to
            # buy, so go straight to the guaranteed cap (one final rung
            # instead of log2 full-width rungs).
            k_cur = k_lim
    positions: List[Optional[np.ndarray]] = [None] * B
    if want_hits:
        if done.any():
            # All minimal cells of a found lane lie within +-best of the
            # diagonal, so one hits pass at the found maximum covers all.
            k_h = max(int(best[done].max()), 1)
            bb = np.full(peq.shape[0], -(1 << 30), np.int64)
            bb[:B][done] = best[done]
            hits = sweeper.hits_shw_banded(peq, targets, lo, hi, bb, k_h,
                                           shared=shared)
            for b in range(B):
                positions[b] = hits[b] if done[b] \
                    else np.empty(0, np.int64)
        else:
            positions = [np.empty(0, np.int64) for _ in range(B)]
    return best, pf, pl_, positions


def _run_bucketed_summary(pairs: List[Tuple[np.ndarray, np.ndarray]],
                          sigma: int, eq: np.ndarray, hin0: int,
                          want_hits: bool, mesh=None, shw_kb=None,
                          k_user: int = -1) -> List[PairSummary]:
    """Bucketed sweeps returning per-pair summaries (real position space).

    On TPU this is the two-phase Pallas path: a register-resident reduction
    pass, plus (only when the all-minimal-locations list is needed) a packed
    hit-bitmask pass — O(B) and O(B*T/32) device output instead of the
    O(B*T) int32 streams.  Buckets whose pairs all share one target object
    use the shared-target variants (scalar SMEM symbols, no S1-way select,
    no alphabet cap).  Elsewhere falls back to the XLA stream engine.
    """
    from edlib_tpu.ops import pallas_kernel
    mode = _pallas_mode()

    buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    metas = []
    for i, (q_ids, t_ids) in enumerate(pairs):
        nw = encode.num_words(len(q_ids))
        nw_b = _pow2_at_least(nw)
        w = nw_b * 32 - len(q_ids)
        t_scan = _pow2_at_least(len(t_ids) + w, floor=32)
        buckets[(nw_b, t_scan)].append(i)
        metas.append((nw_b, w, t_scan))

    out: List[Optional[PairSummary]] = [None] * len(pairs)
    for (nw_b, t_scan), idxs in buckets.items():
        shared = (len(idxs) > 1
                  and all(pairs[i][1] is pairs[idxs[0]][1] for i in idxs))
        if mesh is not None:
            for i, summ in zip(idxs, _run_bucket_mesh(
                    mesh, idxs, pairs, metas, sigma, eq, nw_b, t_scan,
                    hin0, want_hits, shared)):
                out[i] = summ
            continue
        use_pallas = bool(mode) and (
            shared or sigma + 1 <= pallas_kernel.max_sigma1(nw_b, False))
        if not use_pallas:
            route, plan = _bigalpha_route(mode, sigma, eq, len(idxs),
                                          nw_b, t_scan)
            if route == "bitplane":
                for i, summ in zip(idxs, _run_bucket_bitplane(
                        idxs, pairs, metas, sigma, plan, nw_b, t_scan,
                        hin0, want_hits, mode)):
                    out[i] = summ
                continue
            if route == "eqstream":
                for i, summ in zip(idxs, _run_bucket_eqstream(
                        idxs, pairs, metas, sigma, eq, nw_b, t_scan, hin0,
                        want_hits, mode)):
                    out[i] = summ
                continue
            streams = _sweep_bucket([pairs[i][0] for i in idxs],
                                    [pairs[i][1] for i in idxs],
                                    sigma, eq, nw_b, t_scan, hin0)
            for row, i in enumerate(idxs):
                w = metas[i][1]
                tlen = len(pairs[i][1])
                out[i] = _summarize_stream(streams[row, w:w + tlen],
                                           want_hits)
            continue

        use_band = (shw_kb is not None and hin0 == 1
                    and nw_b >= _band_min_words())
        if (not shared and not use_band and sigma >= 32
                and os.environ.get("EDLIB_TPU_BITPLANE", "") != "0"):
            # Mid-size alphabets: the bit-plane kernels beat the S1-way
            # select chain well before the 64-row cap (measured 1.5x+ at
            # sigma>=32 on per-lane 2kbp batches; never worse above 16).
            plan = _bigalpha_plan(sigma, eq)
            if plan is not None and pallas_kernel.bitplane_ok(
                    nw_b, sigma, plan[2]):
                for i, summ in zip(idxs, _run_bucket_bitplane(
                        idxs, pairs, metas, sigma, plan, nw_b, t_scan,
                        hin0, want_hits, mode)):
                    out[i] = summ
                continue
        B = len(idxs)
        B_pad = _pow2_at_least(B, floor=8)
        peq = np.full((B_pad, sigma + 1, nw_b), 0xFFFFFFFF, dtype=np.uint32)
        lo = np.zeros(B_pad, np.int64)
        hi = np.zeros(B_pad, np.int64)
        for row, i in enumerate(idxs):
            q_ids, t_ids = pairs[i]
            peq[row] = encode.build_peq_words(q_ids, eq, n_words=nw_b)
            lo[row] = metas[i][1]
            hi[row] = metas[i][1] + len(t_ids)
        if shared:
            targets = pairs[idxs[0]][1]
        else:
            targets = np.full((B_pad, t_scan), sigma, dtype=np.int32)
            for row, i in enumerate(idxs):
                t_ids = pairs[i][1]
                targets[row, :len(t_ids)] = t_ids
        chunk = int(os.environ.get("EDLIB_TPU_PALLAS_CHUNK", "256"))
        sweeper = pallas_kernel.PallasSweeper(
            chunk=chunk, interpret=(mode == "interpret"))
        if shw_kb is not None and hin0 == 1 \
                and nw_b >= _band_min_words():
            kb = np.array([shw_kb[i] for i in idxs], np.int64)
            bbest, bpf, bpl, bpos = _shw_banded_bucket(
                sweeper, peq, targets, lo, hi, kb, k_user, want_hits,
                shared)
            for row, i in enumerate(idxs):
                w = metas[i][1]
                positions = None
                if want_hits:
                    positions = bpos[row] - w
                out[i] = PairSummary(int(bbest[row]), int(bpf[row]) - w,
                                     int(bpl[row]) - w, _BIG_SENTINEL,
                                     positions)
            continue
        best, pf, pl_, last = sweeper.reduce(peq, targets, lo, hi, hin0,
                                             shared=shared)
        if want_hits:
            hit_cols = sweeper.hits(peq, targets, lo, hi, best, hin0,
                                    shared=shared)
        for row, i in enumerate(idxs):
            w = metas[i][1]
            positions = None
            if want_hits:
                positions = hit_cols[row] - w
            out[i] = PairSummary(int(best[row]), int(pf[row]) - w,
                                 int(pl_[row]) - w, int(last[row]),
                                 positions)
    return out


_NW_BAND_MIN_WORDS = 8  # band pruning pays only for multi-word queries


def _band_min_words() -> int:
    """Minimum bucket word count for the banded kernels (env-overridable so
    interpreter-mode tests can exercise the banded drivers on tiny shapes
    without paying the full kernels' unrolled compile)."""
    return int(os.environ.get("EDLIB_TPU_BAND_MIN_WORDS",
                              _NW_BAND_MIN_WORDS))


def _run_bucketed_nw_banded(pairs: List[Tuple[np.ndarray, np.ndarray]],
                            sigma: int, eq: np.ndarray,
                            k_user: int) -> np.ndarray:
    """Batched banded NW distances with bucket-level k-doubling.

    Returns (len(pairs),) int64: the exact distance where it is <= k_user
    (always found when k_user < 0), else -1.  Device counterpart of the
    reference's doubling loop around the banded NW engine (edlib.cpp:58-78
    + 796-870): each doubling reruns the bucket with a wider static
    diagonal band; banded results > the current k are discarded as
    unreliable, exactly the pruning-only contract of the native engine.
    Buckets too small to band (or past the Pallas alphabet cap) use the
    full-sweep reduce kernel / XLA stream engine instead.
    """
    from edlib_tpu.ops import pallas_kernel
    mode = _pallas_mode()
    out = np.full(len(pairs), -1, np.int64)

    buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    metas = []
    for i, (q_ids, t_ids) in enumerate(pairs):
        nw = encode.num_words(len(q_ids))
        nw_b = _pow2_at_least(nw)
        w = nw_b * 32 - len(q_ids)
        t_scan = _pow2_at_least(len(t_ids) + w, floor=32)
        buckets[(nw_b, t_scan)].append(i)
        metas.append((nw_b, w, t_scan))

    chunk = int(os.environ.get("EDLIB_TPU_PALLAS_CHUNK", "256"))
    for (nw_b, t_scan), idxs in buckets.items():
        shared = (len(idxs) > 1
                  and all(pairs[i][1] is pairs[idxs[0]][1] for i in idxs))
        use_pallas = bool(mode) and (
            shared or sigma + 1 <= pallas_kernel.max_sigma1(nw_b, False))
        band_ok = use_pallas and nw_b >= _band_min_words()

        if not use_pallas:
            route, plan = _bigalpha_route(mode, sigma, eq, len(idxs),
                                          nw_b, t_scan)
            if route is not None:
                # Full-sweep NW distance via the bit-plane / eq-stream
                # reduce (no banding, but on-chip — beats the XLA scan
                # engine there).
                if route == "bitplane":
                    summs = _run_bucket_bitplane(idxs, pairs, metas, sigma,
                                                 plan, nw_b, t_scan, 1,
                                                 False, mode)
                else:
                    summs = _run_bucket_eqstream(idxs, pairs, metas, sigma,
                                                 eq, nw_b, t_scan, 1,
                                                 False, mode)
                for row, i in enumerate(idxs):
                    out[i] = int(summs[row].last_score)
                continue
            streams = _sweep_bucket([pairs[i][0] for i in idxs],
                                    [pairs[i][1] for i in idxs],
                                    sigma, eq, nw_b, t_scan, 1)
            for row, i in enumerate(idxs):
                w = metas[i][1]
                tlen = len(pairs[i][1])
                out[i] = int(streams[row, w + tlen - 1])
            continue

        B = len(idxs)
        B_pad = _pow2_at_least(B, floor=8)
        peq = np.full((B_pad, sigma + 1, nw_b), 0xFFFFFFFF, dtype=np.uint32)
        hi = np.zeros(B_pad, np.int64)
        D = np.zeros(B, np.int64)
        cap = 0
        for row, i in enumerate(idxs):
            q_ids, t_ids = pairs[i]
            peq[row] = encode.build_peq_words(q_ids, eq, n_words=nw_b)
            hi[row] = metas[i][1] + len(t_ids)
            D[row] = len(q_ids) - len(t_ids)
            cap = max(cap, max(len(q_ids), len(t_ids)))
        if shared:
            targets = pairs[idxs[0]][1]
        else:
            targets = np.full((B_pad, t_scan), sigma, dtype=np.int32)
            for row, i in enumerate(idxs):
                t_ids = pairs[i][1]
                targets[row, :len(t_ids)] = t_ids
        sweeper = pallas_kernel.PallasSweeper(
            chunk=chunk, interpret=(mode == "interpret"))

        if not band_ok:
            lo = np.maximum(hi - 1, 0)
            _, _, _, last = sweeper.reduce(peq, targets, lo, hi, 1,
                                           shared=shared)
            for row, i in enumerate(idxs):
                out[i] = int(last[row])
            continue

        k_lim = cap if k_user < 0 else min(k_user, cap)
        # Hamming cap: the bucket ladder at max over lanes of the bound
        # finishes every lane — the final overshoot doubling disappears on
        # substitution-dominated buckets (encode.nw_upper_bound).
        hb_max = max(max((encode.nw_upper_bound(pairs[i][0], pairs[i][1],
                                                eq) for i in idxs),
                         default=1), 1)
        k_lim = min(k_lim, hb_max)
        k_cur = min(max(64, int(np.abs(D).min(initial=0))), k_lim)
        done = np.zeros(B, bool)
        while True:
            feas = ~done & (np.abs(D) <= k_cur)
            if feas.any():
                # ceil((D-k)/2) / floor((D+k)/2) over the feasible lanes
                d_lo = int(np.min(-((k_cur - D[feas]) // 2)))
                d_hi = int(np.max((D[feas] + k_cur) // 2))
                rl = sweeper.reduce_nw_banded(peq, targets, hi, d_lo, d_hi,
                                              shared=shared)[:B]
                newly = feas & (rl[:B] <= k_cur)
                for row in np.nonzero(newly)[0]:
                    out[idxs[row]] = int(rl[row])
                done |= newly
            if done.all() or k_cur >= k_lim:
                break
            k_cur = min(k_cur * 2, k_lim)
    if k_user >= 0:
        # The hamming cap can complete lanes whose distance exceeds the
        # user k; keep the documented <=k_user-or-minus-1 contract.
        out[out > k_user] = -1
    return out


def _run_bucketed(pairs: List[Tuple[np.ndarray, np.ndarray]], sigma: int,
                  eq: np.ndarray, hin0: int) -> List[np.ndarray]:
    """Sweep arbitrary (q_ids, t_ids) pairs, bucketed by shape.

    Returns, per pair, the true bottom-row score stream cell(Q-1, c) for
    c in [0, tlen) — already W-shifted.
    """
    buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    metas = []
    for i, (q_ids, t_ids) in enumerate(pairs):
        nw = encode.num_words(len(q_ids))
        nw_b = _pow2_at_least(nw)
        w = nw_b * 32 - len(q_ids)
        t_scan = _pow2_at_least(len(t_ids) + w, floor=32)
        buckets[(nw_b, t_scan)].append(i)
        metas.append((nw_b, w, t_scan))
    out: List[Optional[np.ndarray]] = [None] * len(pairs)
    for (nw_b, t_scan), idxs in buckets.items():
        scores = _sweep_bucket([pairs[i][0] for i in idxs],
                               [pairs[i][1] for i in idxs],
                               sigma, eq, nw_b, t_scan, hin0)
        for row, i in enumerate(idxs):
            w = metas[i][1]
            tlen = len(pairs[i][1])
            out[i] = scores[row, w:w + tlen]
    return out


def align_batch_device(queries: Sequence, targets: Sequence,
                       mode="NW", task="distance", k=-1,
                       additionalEqualities=None, mesh=None) -> List[dict]:
    mode = AlignMode.parse(mode)
    task = AlignTask.parse(task)
    if k is None:
        k = -1

    # The device path needs a consistent byte space across the batch; fall
    # back to per-pair host alignment for exotic hashable alphabets.
    try:
        byte_pairs = []
        eq_pairs = None
        map_cache: Dict[int, bytes] = {}

        def to_bytes(s):
            got = map_cache.get(id(s))
            if got is None:
                got = map_cache[id(s)] = encode._map_ascii(s)
            return got

        for q, t in zip(queries, targets):
            byte_pairs.append((to_bytes(q), to_bytes(t)))
        if additionalEqualities is not None:
            eq_pairs = [(encode._eq_symbol_to_byte(a),
                         encode._eq_symbol_to_byte(b))
                        for a, b in additionalEqualities]
    except encode.NeedsAlphabetMapping:
        return [align(q, t, mode=mode, task=task, k=k,
                      additionalEqualities=additionalEqualities)
                for q, t in zip(queries, targets)]

    glob = GlobalAlphabet()
    # Encode each distinct object once: broadcast targets (align_batch with
    # one target) share one id array, which both kills O(B*T) host encode
    # work and lets the bucketed sweeps detect shared-target buckets (the
    # scalar-symbol Pallas kernels) by object identity.
    enc_cache: Dict[int, np.ndarray] = {}

    def enc(seq: bytes) -> np.ndarray:
        key = id(seq)
        got = enc_cache.get(key)
        if got is None:
            got = enc_cache[key] = glob.encode(seq)
        return got

    id_pairs = [(enc(qb), enc(tb)) for qb, tb in byte_pairs]
    sigma = glob.sigma
    eq = encode.build_equality_matrix(bytes(glob.alphabet), eq_pairs)
    k_eff = _INF if k < 0 else k

    # On TPU, alphabets beyond the Pallas select limit route to the
    # bit-plane kernels (in-kernel Eq reconstruction — no alphabet cap),
    # or to the legacy eq-stream kernels for dense equality matrices;
    # only when neither applies (dense equalities AND an Eq-stream HBM
    # footprint past the cap) does the batch fall back to the native host
    # path.  Shared-target batches are exempt either way: the
    # scalar-symbol kernels have no alphabet cap.
    from edlib_tpu.ops import pallas_kernel
    all_shared = (len(id_pairs) > 1
                  and all(t is id_pairs[0][1] for _, t in id_pairs))
    nw_max = max((encode.num_words(len(q)) for q, _ in id_pairs
                  if len(q)), default=1)
    if (_pallas_mode() == "tpu" and not all_shared
            and sigma + 1 > pallas_kernel.max_sigma1(nw_max, False)):
        bucket_counts: Dict[Tuple[int, int], int] = defaultdict(int)
        for q_ids, t_ids in id_pairs:
            if len(q_ids) == 0 or len(t_ids) == 0:
                continue
            nw_b = _pow2_at_least(encode.num_words(len(q_ids)))
            w = nw_b * 32 - len(q_ids)
            t_scan = _pow2_at_least(len(t_ids) + w, floor=32)
            bucket_counts[(nw_b, t_scan)] += 1
        if not all(_bigalpha_route("tpu", sigma, eq, n, nw_b,
                                   t_scan)[0] is not None
                   for (nw_b, t_scan), n in bucket_counts.items()):
            return [align(q, t, mode=mode, task=task, k=k,
                          additionalEqualities=additionalEqualities)
                    for q, t in zip(queries, targets)]

    results: List[AlignResult] = []
    main_idx = []  # indices with non-empty sequences needing device sweeps
    for i, (q_ids, t_ids) in enumerate(id_pairs):
        qb, tb = byte_pairs[i]
        alphabet_len = len(set(qb) | set(tb))
        res = AlignResult(status=STATUS_OK, alphabet_length=alphabet_len)
        if len(q_ids) == 0 or len(t_ids) == 0:
            # Early empty-sequence convention (edlib.cpp:166-184).
            if mode == AlignMode.NW:
                res.edit_distance = max(len(q_ids), len(t_ids))
                res.end_locations = np.array([len(t_ids) - 1], np.int64)
            else:
                res.edit_distance = len(q_ids)
                res.end_locations = np.array([-1], np.int64)
            res.num_locations = 1
        else:
            main_idx.append(i)
        results.append(res)

    if mesh is None and mode != AlignMode.NW and main_idx:
        # Slice-worthy semiglobal batches auto-shard over every attached
        # chip (mapping._auto_mesh gates: all-TPU, >= 2 devices, cell
        # floor, EDLIB_TPU_AUTO_MESH).  NW stays on the banded single-
        # device kernel — its Ukkonen pruning beats raw dp sharding.
        from edlib_tpu.mapping import _auto_mesh
        mesh = _auto_mesh(sum(len(id_pairs[i][0]) * len(id_pairs[i][1])
                              for i in main_idx))

    if main_idx and mode == AlignMode.NW and mesh is None:
        # NW needs only the final-column score: the banded kernel prunes
        # the word loop to Ukkonen's diagonal band with k-doubling.
        dists = _run_bucketed_nw_banded([id_pairs[i] for i in main_idx],
                                        sigma, eq, k)
        for i, d in zip(main_idx, dists):
            res = results[i]
            tlen = len(id_pairs[i][1])
            if 0 <= d <= k_eff:
                res.edit_distance = int(d)
                res.end_locations = np.array([tlen - 1], np.int64)
                res.num_locations = 1
    elif main_idx:
        hin0 = 0 if mode == AlignMode.HW else 1
        want_hits = mode != AlignMode.NW
        sweep_pairs = [id_pairs[i] for i in main_idx]
        if mode == AlignMode.SHW:
            # SHW minimal end positions never exceed Q-1+best with
            # best <= min(k, Q), so columns beyond Q+min(k, Q) cannot
            # contribute — truncate the scan (band death, edlib.cpp:644-654).
            trunc = []
            slice_cache: Dict[Tuple[int, int], np.ndarray] = {}
            for q_ids, t_ids in sweep_pairs:
                lim = len(q_ids) + min(len(q_ids),
                                       k if k >= 0 else len(q_ids))
                if len(t_ids) > lim:
                    # One slice object per (target, lim) so broadcast
                    # targets keep their identity-based shared-bucket
                    # fast path.
                    key = (id(t_ids), lim)
                    if key not in slice_cache:
                        slice_cache[key] = t_ids[:lim]
                    t_ids = slice_cache[key]
                trunc.append((q_ids, t_ids))
            sweep_pairs = trunc
        shw_kb = None
        if mode == AlignMode.SHW and mesh is None:
            # Guaranteed per-pair bounds on the SHW best: best <= d_NW
            # (the full truncated target is one candidate prefix) <= the
            # hamming bound, and best <= Q (align against one target
            # char, delete the rest of the query) — so the banded ladder
            # capped there always completes every lane.
            shw_kb = np.array(
                [min(encode.nw_upper_bound(q, t, eq), max(len(q), 1))
                 for q, t in sweep_pairs], np.int64)
        summaries = _run_bucketed_summary(sweep_pairs, sigma, eq, hin0,
                                          want_hits, mesh=mesh,
                                          shw_kb=shw_kb, k_user=k)
        for i, summ in zip(main_idx, summaries):
            res = results[i]
            qlen = len(id_pairs[i][0])
            tlen = len(id_pairs[i][1])
            if mode == AlignMode.NW:
                score = summ.last_score
                if score <= k_eff:
                    res.edit_distance = score
                    res.end_locations = np.array([tlen - 1], np.int64)
                    res.num_locations = 1
            else:
                best, positions = _filter_best_positions(
                    summ.best, summ.positions, qlen, k_eff)
                res.edit_distance = best
                if best >= 0:
                    res.end_locations = np.array(positions, np.int64)
                    res.num_locations = len(positions)

    if task in (AlignTask.LOC, AlignTask.PATH):
        _fill_start_locations(results, id_pairs, main_idx, mode, sigma, eq,
                              mesh=mesh)

    if task == AlignTask.PATH:
        todo = [i for i in main_idx if results[i].edit_distance >= 0]

        # Small windows (the read-mapping shape: thousands of ~qlen+k
        # alignment windows) reconstruct on device in batch — capture +
        # decode + walk in one dispatch per slab (path/batched.py), the
        # chip-side counterpart of edlib.cpp:883-893 + 976-1134.  Oversize
        # windows and leftovers keep the pooled native reconstruction.
        from edlib_tpu.path import batched as batched_path
        bmode = batched_path.enabled() \
            if len(todo) >= batched_path.min_batch() else None
        if bmode:
            def _dev_eligible(i):
                res = results[i]
                qlen = len(id_pairs[i][0])
                wlen = int(res.end_locations[0]) \
                    - int(res.start_locations[0]) + 1
                if wlen < 1 or qlen < 1 \
                        or qlen * wlen > batched_path.max_cells():
                    return False
                nw_b = _pow2_at_least(encode.num_words(qlen))
                if nw_b * 32 > 32767 or wlen > 32767:
                    # The device path's packed transfers bound both axes
                    # at int16 (query rows for the walk state, window
                    # columns for the packed c0/c_f rows); out-of-range
                    # pairs — only device-eligible when the other axis
                    # is tiny or the cell cap is raised — keep the
                    # native walkers.
                    return False
                return sigma + 1 <= pallas_kernel.max_sigma1(nw_b, False)

            dev_todo = [i for i in todo if _dev_eligible(i)]
            if len(dev_todo) >= batched_path.min_batch():
                dev_pairs, dev_dists = [], []
                for i in dev_todo:
                    res = results[i]
                    q_ids, t_ids = id_pairs[i]
                    s0_ = int(res.start_locations[0])
                    e0_ = int(res.end_locations[0])
                    dev_pairs.append((q_ids, t_ids[s0_:e0_ + 1]))
                    dev_dists.append(int(res.edit_distance))
                ops_list = batched_path.batched_windows_path(
                    dev_pairs, dev_dists, sigma, eq, bmode)
                for i, ops in zip(dev_todo, ops_list):
                    results[i].alignment = ops
                    results[i].alignment_length = len(ops)
                done_set = set(dev_todo)
                todo = [i for i in todo if i not in done_set]

        def one_path(i, parallel=True):
            res = results[i]
            q_ids, t_ids = id_pairs[i]
            start0 = int(res.start_locations[0])
            end0 = int(res.end_locations[0])
            window = t_ids[start0:end0 + 1].astype(np.uint8)
            res.alignment = obtain_alignment(q_ids.astype(np.uint8), window,
                                             eq, res.edit_distance,
                                             parallel=parallel)
            res.alignment_length = len(res.alignment)

        # Pairs are independent and the native reconstruction releases the
        # GIL (ctypes), so batched PATH scales across cores; each pooled
        # pair runs its recursion single-threaded (the pool supplies the
        # parallelism — nested forking thrashes).
        if (len(todo) >= 4 and native_loader.available()
                and not os.environ.get("EDLIB_TPU_THREADS", "") in ("0", "1")):
            from concurrent.futures import ThreadPoolExecutor
            workers = min(len(todo), os.cpu_count() or 1)
            with ThreadPoolExecutor(max_workers=workers) as pool:
                list(pool.map(lambda i: one_path(i, parallel=False), todo))
        else:
            for i in todo:
                one_path(i)

    return [r.to_dict() for r in results]


def _fill_start_locations(results, id_pairs, main_idx, mode, sigma, eq,
                          mesh=None):
    """Start locations; HW batches every reversed-SHW re-run on device."""
    if mode != AlignMode.HW:
        for i in main_idx:
            res = results[i]
            if res.edit_distance >= 0:
                res.start_locations = np.zeros(res.num_locations, np.int64)
        return

    sub_pairs = []   # (pair index, end location) per sub-task
    sub_owner = []
    for i in main_idx:
        res = results[i]
        if res.edit_distance < 0:
            continue
        res.start_locations = np.zeros(res.num_locations, np.int64)
        q_ids, t_ids = id_pairs[i]
        rq = q_ids[::-1].copy()
        for j, e in enumerate(res.end_locations):
            e = int(e)
            if e == -1:
                res.start_locations[j] = 0  # open edge case, edlib.cpp:237-249
                continue
            # The last minimal reversed-SHW position p satisfies
            # p <= Q-1+e_d (any SHW cell value >= position - (Q-1)), so
            # only the last Q+e_d target chars before e can matter — the
            # host-side analogue of the reference's band-death early exit
            # (edlib.cpp:644-654).  A short read mapped in a Mbp target
            # re-sweeps ~Q+k columns instead of the whole prefix.
            lim = len(q_ids) + res.edit_distance
            rt_prefix = t_ids[max(0, e + 1 - lim):e + 1][::-1].copy()
            sub_pairs.append((rq, rt_prefix))
            sub_owner.append((i, j, e))

    if not sub_pairs:
        return
    # Only the LAST minimal SHW position is needed (edlib.cpp:258-260): the
    # reduce pass carries it directly — no score streams, no hit pass.
    # These re-runs take the plain full-sweep reduce kernels: the prefix
    # slice above already caps each sweep at ~Q+d columns, and a stage-
    # level A/B showed the banded variant buying nothing on top of it
    # (round-4 revshw_banded_speedup rows ~1.0 — the stage is bound by
    # the per-lane target transfer, not kernel word count), so the
    # round-4 exact-k banded routing was deleted as measured dead weight.
    summaries = _run_bucketed_summary(sub_pairs, sigma, eq, hin0=1,
                                      want_hits=False, mesh=mesh)
    for (i, j, e), summ in zip(sub_owner, summaries):
        results[i].start_locations[j] = e - summ.pos_last
