"""Batched device PATH: thousands of small alignment windows on chip.

The reference reconstructs each small-window path by storing every column's
(Pv, Mv) during one NW sweep and bit-walking back (edlib.cpp:883-893 capture
+ 976-1134 walk), one pair at a time.  The batched TPU equivalent runs in
three fused device stages (one jit dispatch per slab):

  1. capture — the Pallas column-capture kernel sweeps every window in the
     batch and stores packed per-column (Pv, Mv, Ph, Mh) delta words to
     HBM (ops/pallas_kernel.py::capture_flat_device want_h=True);
  2. decode — the move at every cell is a PURE BITWISE function of those
     masks (go_up <=> Pv, go_left <=> Ph, MATCH <=> the vertical delta
     cancels the row-above horizontal delta): no cell values are ever
     materialised, no prefix sums run;
  3. walk — per-cell move codes (the reference's exact preference:
     up/INSERT, then left/DELETE, then diagonal; MATCH iff the diagonal
     value is unchanged) and diagonal MATCH-run lengths are precomputed
     VECTORIZED over the whole rectangle, then a batched lax.scan walks
     one EDIT EVENT per step (a MATCH-run jump or one op) — ~2*dist+2
     sequential steps instead of qlen+wlen, each one latency-bound
     (B,)-gather (identical cell values + identical preference ==
     identical ops, see path/traceback.py).

Only the per-step (move, run-length) codes (a few MB) and the final
(r, c) leave the device; the host expands runs, reverses, and prepends
the boundary run (all-DELETE / all-INSERT), exactly like the scalar
walk's r==-1 / c==-1 exits.
"""

from __future__ import annotations

import functools
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from edlib_tpu.types import (EDOP_DELETE, EDOP_INSERT, EDOP_MATCH,
                             EDOP_MISMATCH)

# Windows bigger than this many DP cells route to the native pool instead —
# the decode's (B, T, Q) value tensor stops paying for itself (and the
# reference would Hirschberg such windows anyway; both methods emit the
# same ops, so routing is invisible in the output).
_MAX_CELLS = 1 << 18
# Fewer device-eligible windows than this and the pooled native walkers win
# on dispatch latency alone ("1" forces the device path regardless).
_MIN_BATCH = 192
# HBM working-set budget for one decode slab (the dominant intermediates
# are ~10 bytes per padded DP cell: bit-unpack int8 pair + int32 cumsum/V).
_BUDGET_MB = 1536

_MOVE_TO_OP = np.array([255, EDOP_INSERT, EDOP_DELETE, EDOP_MATCH,
                        EDOP_MISMATCH], dtype=np.uint8)


def enabled() -> Optional[str]:
    """'tpu' / 'interpret' when the batched device PATH may run, else None."""
    env = os.environ.get("EDLIB_TPU_BATCHED_PATH", "")
    if env in ("0", "off"):
        return None
    from edlib_tpu.batch import _pallas_mode
    mode = _pallas_mode()
    return mode or None


def min_batch() -> int:
    if os.environ.get("EDLIB_TPU_BATCHED_PATH", "") == "1":
        return 1
    return int(os.environ.get("EDLIB_TPU_BATCHED_PATH_MIN", _MIN_BATCH))


def max_cells() -> int:
    return int(os.environ.get("EDLIB_TPU_BATCHED_PATH_MAX_CELLS",
                              _MAX_CELLS))


def _pow2_at_least(x: int, floor: int = 1) -> int:
    n = floor
    while n < x:
        n *= 2
    return n


@functools.partial(jax.jit, static_argnames=("sigma", "n_words", "C",
                                             "chunk", "steps", "interpret"))
def _capture_walk(buf, eq_s1, *, sigma: int, n_words: int, C: int,
                  chunk: int, steps: int, interpret: bool):
    """One fused device dispatch: Peq build -> capture -> decode ->
    movecode/run precompute -> event walk.

    buf: uint8 (B, total + C + 6) — ONE packed upload per slab (the
    tunneled device pays ~25 ms RTT per buffer, so six small transfers
    cost more than the compute): query ids [0:total] (global alphabet,
    pad ignored), window ids [total:total+C] (pad columns = sigma,
    wildcard), then qlen, r0, c0 as little-endian uint16 pairs.
    eq_s1: bool (sigma+1, sigma+1) equality matrix incl. wildcard row/col
    Returns ONE int16 (2*steps + 2, B): rows [0:steps] move codes,
    [steps:2*steps] run counts, then r_f, c_f.

    The naive walk gathers 3 neighbor values per DP cell on the path —
    qlen + wlen sequential (B,)-gathers, each latency-bound on TPU
    (~0.2 ms/step: 82 ms of a 100 ms slab at 8192x128x128).  Here the
    per-cell move is precomputed VECTORIZED over the whole rectangle with
    the reference's exact preference (up/INSERT, then left/DELETE, then
    diagonal; MATCH iff unchanged — edlib.cpp:1038-1112 order), plus the
    length of every diagonal MATCH run (log-doubling over diagonal
    shifts), so the walk advances one EDIT EVENT per step: a MATCH-run
    jump or a single op.  Exactly dist events + <= dist+1 run jumps, so
    `steps` need only be ~2*dist+2 (the caller buckets slabs by distance)
    — identical ops to the scalar walk by construction, ~10x fewer
    sequential gathers.
    """
    from edlib_tpu.ops.pallas_kernel import capture_flat_device

    B = buf.shape[0]
    total = n_words * 32

    def u16(col):
        return (buf[:, col].astype(jnp.int32)
                + (buf[:, col + 1].astype(jnp.int32) << 8))

    q_ids = buf[:, :total]
    windows = buf[:, total:total + C]
    qlens = u16(total + C)
    r0 = u16(total + C + 2)
    c0 = u16(total + C + 4)

    rows = jnp.arange(total, dtype=jnp.int32)
    q_pad = jnp.where(q_ids.astype(jnp.int32) > sigma, sigma,
                      q_ids.astype(jnp.int32))
    pad_mask = rows[None, :] >= qlens[:, None]              # (B, total)
    # match[b, s, i] = eq(s, q[b, i]) | pad-wildcard — build_peq_device
    # generalized to equality matrices (C4/C5, edlib.cpp:63-94 + 358-384).
    match = eq_s1[:, q_pad]                                 # (S1, B, total)
    match = jnp.transpose(match, (1, 0, 2)) | pad_mask[:, None, :]
    bits32 = match.reshape(B, sigma + 1, n_words, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    peq = (bits32 << shifts).sum(axis=3, dtype=jnp.uint32)  # (B, S1, NW)

    pv, mv, ph, mh = capture_flat_device(
        peq, windows.astype(jnp.int32), hin0=1, chunk=chunk,
        interpret=interpret, want_h=True)
    Tp = pv.shape[1]
    # Per-cell move with the scalar walk's exact preference, as a PURE
    # BITWISE function of Myers' own delta masks (no value decode, no
    # prefix sums):
    #   go_up   (u+1 == v)  <=>  v - u = +1      <=>  Pv bit (r, c)
    #   go_left (l+1 == v)  <=>  h(r, c) = +1    <=>  Ph bit (r, c)
    #   MATCH   (ul == v)   <=>  delta_v(r, c) + h(r-1, c) == 0
    # with the analytic boundary h(-1, c) = +1 (top row costs c+1).
    bidx = jnp.arange(32, dtype=jnp.uint32)

    def bits(x):   # (B, Tp, NW) uint32 -> (B, Tp, total) bool
        return ((x[..., None] >> bidx) & 1).astype(jnp.bool_).reshape(
            B, Tp, total)

    pvb, mvb, phb, mhb = bits(pv), bits(mv), bits(ph), bits(mh)
    ph_up = jnp.concatenate(
        [jnp.ones((B, Tp, 1), jnp.bool_), phb[..., :-1]], axis=2)
    mh_up = jnp.concatenate(
        [jnp.zeros((B, Tp, 1), jnp.bool_), mhb[..., :-1]], axis=2)
    diag_match = ((pvb & mh_up) | (mvb & ph_up)
                  | (~pvb & ~mvb & ~ph_up & ~mh_up))
    one, two, three, four = (jnp.int8(v) for v in (1, 2, 3, 4))
    movec = jnp.where(pvb, one,
                      jnp.where(phb, two,
                                jnp.where(diag_match, three, four)))
    # movec: (B, Tp, total) int8 — these tensors are pure HBM traffic.

    # Diagonal MATCH-run lengths by log-doubling: run[cc, j] counts the
    # consecutive movec==3 cells ending at (cc, j) walking up-left
    # (including the cell itself); after K doublings run is exact for
    # runs < 2^(K+1) >= min(Tp, total) + 1.  uint8 when the run bound
    # fits (mapping buckets: min dim 128), else int16.
    run_dt = jnp.uint8 if min(Tp, total) <= 255 else jnp.int16
    run = (movec == three).astype(run_dt)
    span = 1
    while span < min(Tp, total):
        shifted = jnp.pad(run, ((0, 0), (span, 0), (span, 0)))[
            :, :Tp, :total]
        run = run + jnp.where(run == jnp.asarray(span, run_dt), shifted,
                              jnp.asarray(0, run_dt))
        span *= 2
    # movec|run<<3: int16 holds runs <= 4095; possible only when BOTH
    # dims exceed 4095, i.e. a raised EDLIB_TPU_BATCHED_PATH_MAX_CELLS
    # (default 2^18 cells caps min(dim) at 512) — widen then.
    pk_dt = jnp.int16 if min(Tp, total) <= 4095 else jnp.int32
    packed = (movec.astype(jnp.int32)
              | (run.astype(jnp.int32) << 3)).astype(pk_dt)
    packedf = packed.reshape(B, Tp * total)

    def step(state, _):
        r, c, done = state
        bdry = (r < 0) | (c < 0)
        idx = jnp.clip(c, 0, Tp - 1) * total + jnp.clip(r, 0, total - 1)
        p = jnp.take_along_axis(packedf, idx[:, None],
                                axis=1)[:, 0].astype(jnp.int32)
        m = p & 7
        n = jnp.where(m == 3, p >> 3, 1)
        act = ~done & ~bdry
        dr = jnp.where(m == 2, 0, n)
        dc = jnp.where(m == 1, 0, n)
        emit_m = jnp.where(act, m, 0).astype(jnp.int8)
        emit_n = jnp.where(act, n, 0).astype(jnp.int16)
        r = jnp.where(act, r - dr, r)
        c = jnp.where(act, c - dc, c)
        return (r, c, done | bdry), (emit_m, emit_n)

    state0 = (r0.astype(jnp.int32), c0.astype(jnp.int32),
              jnp.zeros((B,), bool))
    (r_f, c_f, _), (moves, counts) = jax.lax.scan(step, state0, None,
                                                  length=steps)
    # ONE packed download (RTT again): moves/counts/r_f/c_f as int16 rows.
    return jnp.concatenate(
        [moves.astype(jnp.int16), counts,
         r_f.astype(jnp.int16)[None], c_f.astype(jnp.int16)[None]], axis=0)


def _slab_size(C: int, total_rows: int) -> int:
    budget = int(os.environ.get("EDLIB_TPU_BATCHED_PATH_BUDGET_MB",
                                _BUDGET_MB)) * (1 << 20)
    per_lane = max(1, C * total_rows * 10)  # ~10 B per padded DP cell
    slab = max(256, min(8192, budget // per_lane))
    return _pow2_at_least(slab + 1) // 2  # round down to a power of two


def batched_windows_path(pairs: List[Tuple[np.ndarray, np.ndarray]],
                         dists: List[int], sigma: int, eq: np.ndarray,
                         mode: str) -> List[np.ndarray]:
    """Ops (uint8 EDOP arrays) for many (query, window) NW alignments.

    pairs: (q_ids, window_ids) int arrays in the global alphabet; dists the
    known edit distances (the walk's starting values).  mode: 'tpu' or
    'interpret'.  Caller guarantees qlen >= 1, wlen >= 1, and
    qlen * wlen <= max_cells() for every pair, plus nw_b * 32 <= 32767
    AND wlen <= 32767 (walk rows and packed c0/c_f transfer as int16).
    """
    chunk = 128
    out: List[Optional[np.ndarray]] = [None] * len(pairs)

    # Equality matrix extended with the wildcard row/col (index sigma).
    eq_s1 = np.ones((sigma + 1, sigma + 1), bool)
    eq_s1[:sigma, :sigma] = eq[:sigma, :sigma].astype(bool)

    from edlib_tpu import encode
    buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for i, (q_ids, w_ids) in enumerate(pairs):
        nw_b = _pow2_at_least(encode.num_words(len(q_ids)))
        assert nw_b * 32 <= 32767 and len(w_ids) <= 32767, \
            "int16 transfer bounds (see docstring)"
        C = _pow2_at_least(len(w_ids), floor=chunk)
        buckets[(nw_b, C)].append(i)

    import time
    prof = bool(os.environ.get("EDLIB_TPU_BPATH_PROF"))
    t_pack = t_disp = t_fetch = t_asm = 0.0

    eq_dev = jnp.asarray(eq_s1)
    # Phase 1: pack + dispatch EVERY slab (async) before fetching any —
    # slab k's device compute overlaps slab k-1's result download, and
    # each slab is exactly one upload + one download (tunnel RTT bound).
    inflight = []
    for (nw_b, C), idxs in buckets.items():
        total = nw_b * 32
        slab = _slab_size(C, total)
        # The event walk needs ~2*dist+2 steps; sorting the bucket by
        # distance makes slabs distance-homogeneous, so each slab's step
        # count (a compile-shape bucket, pow2) tracks ITS worst lane
        # instead of the bucket's.
        idxs = sorted(idxs, key=lambda i: dists[i])
        for s0 in range(0, len(idxs), slab):
            t0 = time.time()
            sub = idxs[s0:s0 + slab]
            # Every dispatch uses the bucket's full slab shape (pad lanes
            # are cheap; a second compiled variant over a tunneled
            # remote-compile service is not).
            B = slab
            buf = np.zeros((B, total + C + 6), np.uint8)
            buf[:, total:total + C] = sigma
            buf[:, total + C] = 1                  # pad lanes: qlen=1
            for row, i in enumerate(sub):
                q_ids, w_ids = pairs[i]
                buf[row, :len(q_ids)] = q_ids
                buf[row, total:total + len(w_ids)] = w_ids
                for col, val in ((total + C, len(q_ids)),
                                 (total + C + 2, len(q_ids) - 1),
                                 (total + C + 4, len(w_ids) - 1)):
                    buf[row, col] = val & 0xFF
                    buf[row, col + 1] = val >> 8
            steps = _pow2_at_least(
                min(2 * max(dists[i] for i in sub) + 4, total + C),
                floor=16)
            t1 = time.time()
            packed = _capture_walk(
                jnp.asarray(buf), eq_dev, sigma=sigma, n_words=nw_b, C=C,
                chunk=chunk, steps=steps, interpret=(mode == "interpret"))
            inflight.append((sub, steps, packed))
            t2 = time.time()
            t_pack += t1 - t0
            t_disp += t2 - t1

    # Phase 2: fetch + assemble in dispatch order.
    for sub, steps, packed in inflight:
        t2 = time.time()
        packed = np.asarray(packed)                # ONE (2*steps+2, B) pull
        moves = np.ascontiguousarray(packed[:steps].T)       # (B, steps)
        counts = np.ascontiguousarray(packed[steps:2 * steps].T)
        r_f = packed[-2]
        c_f = packed[-1]
        t3 = time.time()
        ends = moves == 0
        n_moves = np.where(ends.any(axis=1),
                           np.argmax(ends, axis=1), moves.shape[1])
        for row, i in enumerate(sub):
            ne = n_moves[row]
            walk = np.repeat(_MOVE_TO_OP[moves[row, :ne]],
                             counts[row, :ne])
            if int(r_f[row]) == -1:
                tail = np.full(int(c_f[row]) + 1, EDOP_DELETE, np.uint8)
            else:
                tail = np.full(int(r_f[row]) + 1, EDOP_INSERT, np.uint8)
            out[i] = np.concatenate([walk, tail])[::-1].copy()
        t4 = time.time()
        t_fetch += t3 - t2
        t_asm += t4 - t3
    if prof:
        print(f"[bpath prof] pack={t_pack:.3f}s dispatch={t_disp:.3f}s "
              f"fetch={t_fetch:.3f}s assemble={t_asm:.3f}s")
    return out  # type: ignore[return-value]
