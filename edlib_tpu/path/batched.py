"""Batched device PATH: thousands of small alignment windows on chip.

The reference reconstructs each small-window path by storing every column's
(Pv, Mv) during one NW sweep and bit-walking back (edlib.cpp:883-893 capture
+ 976-1134 walk), one pair at a time.  The batched TPU equivalent runs in
three fused device stages (one jit dispatch per slab):

  1. capture — the Pallas column-capture kernel sweeps every window in the
     batch and stores packed per-column (Pv, Mv) words to HBM
     (ops/pallas_kernel.py::capture_flat_device);
  2. decode — cell values from the TOP boundary anchor, entirely on device:
     cell(r, c) = (c+1) + prefix_sum(Pv bits - Mv bits), a bit-unpack plus
     one cumsum (the query's trailing wildcard pad rows sit BELOW every real
     row, so real cells are exact);
  3. walk — a batched lax.scan traceback over all windows at once, with the
     reference's exact move preference (up/INSERT, then left/DELETE, then
     diagonal; MATCH iff the diagonal value is unchanged — identical cell
     values + identical preference == identical ops, see path/traceback.py).

Only the per-step move codes (a few MB) and the final (r, c) leave the
device; the host assembles ops arrays by reversing each move run and
prepending the boundary run (all-DELETE / all-INSERT), exactly like the
scalar walk's r==-1 / c==-1 exits.
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


@functools.partial(jax.jit, static_argnames=("sigma", "n_words", "chunk",
                                             "steps", "interpret"))
def _capture_walk(q_ids, qlens, windows, r0, c0, v0, eq_s1, *, sigma: int,
                  n_words: int, chunk: int, steps: int, interpret: bool):
    """One fused device dispatch: Peq build -> capture -> decode -> walk.

    q_ids:   uint8 (B, Qmax) query ids (global alphabet), pad ignored
    windows: uint8 (B, C) window ids, pad columns = sigma (wildcard)
    r0/c0:   int32 (B,) start cell (qlen-1, wlen-1); v0 = edit distance
    eq_s1:   bool (sigma+1, sigma+1) equality matrix incl. wildcard row/col
    Returns (moves int8 (steps, B), r_f, c_f).
    """
    from edlib_tpu.ops.pallas_kernel import capture_flat_device

    B, qmax = q_ids.shape
    total = n_words * 32
    rows = jnp.arange(total, dtype=jnp.int32)
    q_pad = jnp.full((B, total), sigma, jnp.int32)
    q_pad = q_pad.at[:, :qmax].set(q_ids.astype(jnp.int32))
    pad_mask = rows[None, :] >= qlens[:, None]              # (B, total)
    # match[b, s, i] = eq(s, q[b, i]) | pad-wildcard — build_peq_device
    # generalized to equality matrices (C4/C5, edlib.cpp:63-94 + 358-384).
    match = eq_s1[:, q_pad]                                 # (S1, B, total)
    match = jnp.transpose(match, (1, 0, 2)) | pad_mask[:, None, :]
    bits32 = match.reshape(B, sigma + 1, n_words, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    peq = (bits32 << shifts).sum(axis=3, dtype=jnp.uint32)  # (B, S1, NW)

    pv, mv = capture_flat_device(peq, windows.astype(jnp.int32), hin0=1,
                                 chunk=chunk, interpret=interpret)
    Tp = pv.shape[1]
    q1 = total + 1
    # Vertical deltas from the packed words; decode every padded row (rows
    # past qlen are wildcard drains — never visited, r0 < qlen).  The cell
    # matrix is never materialised: with vbase[b, t, j] = sum_{i<j} delta_i
    # (an int16 cumsum over a zero-padded delta — |vbase| <= total), every
    # value is cell(j-1, c) = (c+1) + vbase[b, c, j], and the init column
    # c = -1 is the analytic cell(r, -1) = r+1.
    bidx = jnp.arange(32, dtype=jnp.uint32)
    delta = (((pv[..., None] >> bidx) & 1).astype(jnp.int8)
             - ((mv[..., None] >> bidx) & 1).astype(jnp.int8))
    vbase = jnp.cumsum(
        jnp.pad(delta.reshape(B, Tp, total),
                ((0, 0), (0, 0), (1, 0))).astype(jnp.int16), axis=2)
    Vf = vbase.reshape(B, -1)                              # (B, Tp * q1)

    def gather(cc, j):
        # V[b, cc, j]: cc = target column + 1 (cc = 0 is the init column).
        j = jnp.clip(j, 0, q1 - 1)
        tcol = jnp.clip(cc - 1, 0, Tp - 1)
        base = jnp.take_along_axis(Vf, (tcol * q1 + j)[:, None],
                                   axis=1)[:, 0].astype(jnp.int32)
        return jnp.where(cc <= 0, j, cc + base)

    def step(state, _):
        r, c, v, done = state
        bdry = (r < 0) | (c < 0)
        u = gather(c + 1, r)        # cell(r-1, c)
        l_ = gather(c, r + 1)       # cell(r, c-1)
        ul = gather(c, r)           # cell(r-1, c-1)
        act = ~done & ~bdry
        go_up = u + 1 == v
        go_left = ~go_up & (l_ + 1 == v)
        diag = ~go_up & ~go_left
        move = jnp.where(go_up, 1,
                         jnp.where(go_left, 2,
                                   jnp.where(ul == v, 3, 4)))
        move = jnp.where(act, move, 0).astype(jnp.int8)
        r = jnp.where(act & (go_up | diag), r - 1, r)
        c = jnp.where(act & (go_left | diag), c - 1, c)
        v = jnp.where(act, jnp.where(go_up, u,
                                     jnp.where(go_left, l_, ul)), v)
        return (r, c, v, done | bdry), move

    state0 = (r0.astype(jnp.int32), c0.astype(jnp.int32),
              v0.astype(jnp.int32), jnp.zeros((B,), bool))
    (r_f, c_f, _, _), moves = jax.lax.scan(step, state0, None, length=steps)
    return moves, r_f, c_f


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
    qlen * wlen <= max_cells() for every pair, and padded query words
    nw_b * 32 <= 32767 (the decode cumsum accumulates in int16).
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
        assert nw_b * 32 <= 32767, "int16 decode bound (see docstring)"
        C = _pow2_at_least(len(w_ids), floor=chunk)
        buckets[(nw_b, C)].append(i)

    import time
    prof = bool(os.environ.get("EDLIB_TPU_BPATH_PROF"))
    t_pack = t_disp = t_fetch = t_asm = 0.0

    eq_dev = jnp.asarray(eq_s1)
    for (nw_b, C), idxs in buckets.items():
        total = nw_b * 32
        qmax = total  # full word width: compile shapes stable across calls
        steps = total + C
        slab = _slab_size(C, total)
        for s0 in range(0, len(idxs), slab):
            t0 = time.time()
            sub = idxs[s0:s0 + slab]
            # Every dispatch uses the bucket's full slab shape (pad lanes
            # are cheap; a second compiled variant over a tunneled
            # remote-compile service is not).
            B = slab
            q_arr = np.zeros((B, qmax), np.uint8)
            w_arr = np.full((B, C), sigma, np.uint8)
            qlens = np.ones(B, np.int32)
            r0 = np.zeros(B, np.int32)
            c0 = np.zeros(B, np.int32)
            v0 = np.zeros(B, np.int32)
            for row, i in enumerate(sub):
                q_ids, w_ids = pairs[i]
                q_arr[row, :len(q_ids)] = q_ids
                w_arr[row, :len(w_ids)] = w_ids
                qlens[row] = len(q_ids)
                r0[row] = len(q_ids) - 1
                c0[row] = len(w_ids) - 1
                v0[row] = dists[i]
            t1 = time.time()
            moves, r_f, c_f = _capture_walk(
                jnp.asarray(q_arr), jnp.asarray(qlens), jnp.asarray(w_arr),
                jnp.asarray(r0), jnp.asarray(c0), jnp.asarray(v0), eq_dev,
                sigma=sigma, n_words=nw_b, chunk=chunk, steps=steps,
                interpret=(mode == "interpret"))
            t2 = time.time()
            moves = np.ascontiguousarray(np.asarray(moves).T)  # (B, steps)
            r_f = np.asarray(r_f)
            c_f = np.asarray(c_f)
            t3 = time.time()
            ends = moves == 0
            n_moves = np.where(ends.any(axis=1),
                               np.argmax(ends, axis=1), moves.shape[1])
            for row, i in enumerate(sub):
                walk = _MOVE_TO_OP[moves[row, :n_moves[row]]]
                if int(r_f[row]) == -1:
                    tail = np.full(int(c_f[row]) + 1, EDOP_DELETE, np.uint8)
                else:
                    tail = np.full(int(r_f[row]) + 1, EDOP_INSERT, np.uint8)
                out[i] = np.concatenate([walk, tail])[::-1].copy()
            if prof:
                t4 = time.time()
                t_pack += t1 - t0
                t_disp += t2 - t1
                t_fetch += t3 - t2
                t_asm += t4 - t3
    if prof:
        print(f"[bpath prof] pack={t_pack:.3f}s dispatch={t_disp:.3f}s "
              f"fetch={t_fetch:.3f}s assemble={t_asm:.3f}s")
    return out  # type: ignore[return-value]
