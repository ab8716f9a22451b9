"""Batched Myers bit-vector engine in JAX (the TPU compute path).

TPU-first re-design of the reference's scalar engines (C6 calculateBlock,
edlib.cpp:412-447; C8/C9 column loops, edlib.cpp:550-928):

* the main parallel axis is a **batch of alignments** (B pairs), mapped to
  VPU lanes — the reference aligns one pair per call;
* bit-vector words are ``uint32`` (TPU VPU has no 64-bit integer lanes);
  the carry-propagating add ``(Eq & Pv) + Pv`` wraps per-word and the
  inter-word carry rides the Myers hin/hout chain (a ``lax.scan`` over the
  word axis), exactly like the reference's inter-block chain;
* the target loop is a ``lax.scan`` over columns (XLA while-loop on device);
* instead of decoding scores out of the final block bit-by-bit
  (getBlockCellValues, edlib.cpp:470-529), each element's target is extended
  with W wildcard columns: a wildcard column copies cells diagonally, so the
  padded bottom-row score at column c IS cell(Q-1, c-W) — the score stream
  covers every end position (and the NW corner) with no bit decoding.

Shapes are static; per-element query/target lengths ride in as data (the
wildcard rows/columns make shorter sequences exact, not approximate).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from edlib_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

WORD_SIZE = 32
_TOP_BIT = WORD_SIZE - 1


def calculate_block(Pv, Mv, Eq, hin):
    """One Myers block update, vectorised over any leading shape.

    Pv/Mv/Eq: uint32 arrays; hin: int32 in {-1, 0, +1} (same shape).
    Returns (PvOut, MvOut, hout).  ~17 VPU ops per 32 DP cells.
    """
    hin_neg = (hin < 0).astype(jnp.uint32)
    hin_pos = (hin > 0).astype(jnp.uint32)
    Xv = Eq | Mv
    Eq = Eq | hin_neg
    Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq
    Ph = Mv | ~(Xh | Pv)
    Mh = Pv & Xh
    hout = ((Ph >> _TOP_BIT) & 1).astype(jnp.int32) - (
        (Mh >> _TOP_BIT) & 1).astype(jnp.int32)
    Ph = (Ph << 1) | hin_pos
    Mh = (Mh << 1) | hin_neg
    PvOut = Mh | ~(Xv | Ph)
    MvOut = Ph & Xv
    return PvOut, MvOut, hout


def _column_update(Pv, Mv, eq, hin0):
    """Advance one DP column: chain hin through the word axis (leading dim).

    Pv/Mv/eq: uint32 (NW, B).  Returns (Pv', Mv', hout_last (B,)).
    The sequential chain mirrors the reference's block loop
    (edlib.cpp:586-598); NW is small so the scan is cheap relative to the
    batch-wide VPU work per word.
    """
    # Derive the init from data so its varying-axes type matches the loop
    # output under shard_map (constants are unvarying; mixing fails).
    hin_init = (eq[0, :] & 0).astype(jnp.int32) + hin0

    def word_step(hin, xs):
        pv, mv, e = xs
        pv2, mv2, hout = calculate_block(pv, mv, e, hin)
        return hout, (pv2, mv2)

    hout_last, (Pv2, Mv2) = jax.lax.scan(word_step, hin_init, (Pv, Mv, eq))
    return Pv2, Mv2, hout_last


@functools.partial(jax.jit, static_argnames=("hin0", "unroll"))
def sweep_scores(peq: jnp.ndarray, targets: jnp.ndarray, hin0: int,
                 unroll: int = 1) -> jnp.ndarray:
    """Batched full sweep; emits the padded-bottom score after every column.

    peq:     uint32 (B, sigma+1, NW) — packed query profiles (row sigma is
             the wildcard symbol, all ones).
    targets: int32 (B, T_scan) — transformed symbols, wildcard(=sigma)-padded
             per element (W wildcard columns appended, then filler).
    hin0:    0 for HW (free gap before query, edlib.cpp:584), else 1.

    Returns int32 (B, T_scan): scores[b, c] = cell(Q_pad-1, c) which equals
    the true cell(qlen-1, c - W_b) for c >= W_b.
    """
    B, S1, NW = peq.shape
    peq_t = jnp.transpose(peq, (1, 2, 0))  # (S1, NW, B) — word-major layout

    # Data-derived inits: depend on BOTH inputs so their varying-axes types
    # under shard_map match the loop outputs (constants are unvarying).
    zero_b = (peq_t[0, 0] & 0).astype(jnp.int32) + (targets[:, 0] & 0)  # (B,)
    Pv0 = jnp.broadcast_to(zero_b.astype(jnp.uint32)[None, :], (NW, B)) \
        | jnp.uint32(0xFFFFFFFF)
    Mv0 = jnp.broadcast_to(zero_b.astype(jnp.uint32)[None, :], (NW, B))
    score0 = zero_b + NW * WORD_SIZE

    def col_step(carry, sym):
        Pv, Mv, score = carry
        idx = sym[None, None, :].astype(jnp.int32)
        eq = jnp.take_along_axis(peq_t, jnp.broadcast_to(idx, (1, NW, B)),
                                 axis=0)[0]
        Pv, Mv, hout = _column_update(Pv, Mv, eq, hin0)
        score = score + hout
        return (Pv, Mv, score), score

    (_, _, _), scores = jax.lax.scan(col_step, (Pv0, Mv0, score0),
                                     targets.T, unroll=unroll)
    return scores.T


# ---------------------------------------------------------------------------
# Resumable sweep: the scan carry (Pv, Mv, score) is an explicit checkpoint.
# Device counterpart of the reference's targetStopPosition column snapshot
# (edlib.cpp:725-727, 896-908): stream a long target through bounded memory
# in segments, persist/restore the state between segments (or hand it to the
# next host in a pipeline).
# ---------------------------------------------------------------------------


def initial_state(B: int, n_words: int):
    """Fresh sweep state (column -1): Pv all ones, Mv zero, padded-bottom
    score = n_words*32."""
    return (np.full((n_words, B), 0xFFFFFFFF, dtype=np.uint32),
            np.zeros((n_words, B), dtype=np.uint32),
            np.full((B,), n_words * WORD_SIZE, dtype=np.int32))


@functools.partial(jax.jit, static_argnames=("hin0",))
def sweep_scores_resumable(peq: jnp.ndarray, targets: jnp.ndarray,
                           state, hin0: int):
    """Like sweep_scores but takes and returns the carried state.

    state: (Pv (NW, B) uint32, Mv (NW, B) uint32, score (B,) int32).
    Returns (scores (B, T_seg) int32, new_state).  Chaining segments
    t0|t1|... reproduces the single-call sweep exactly.
    """
    B, S1, NW = peq.shape
    peq_t = jnp.transpose(peq, (1, 2, 0))

    def col_step(carry, sym):
        Pv, Mv, score = carry
        idx = sym[None, None, :].astype(jnp.int32)
        eq = jnp.take_along_axis(peq_t, jnp.broadcast_to(idx, (1, NW, B)),
                                 axis=0)[0]
        Pv, Mv, hout = _column_update(Pv, Mv, eq, hin0)
        score = score + hout
        return (Pv, Mv, score), score

    new_state, scores = jax.lax.scan(col_step, tuple(state), targets.T)
    return scores.T, new_state


def semiglobal_scores_batch(peq, targets, mode_is_hw: bool):
    return sweep_scores(peq, targets, hin0=0 if mode_is_hw else 1)


def nw_scores_batch(peq, targets):
    return sweep_scores(peq, targets, hin0=1)


# ---------------------------------------------------------------------------
# Column capture (PATH support): like sweep_scores but also stores the per-
# column bit state, the device analogue of AlignmentData (edlib.cpp:22-47).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("hin0",))
def sweep_capture(peq: jnp.ndarray, targets: jnp.ndarray, hin0: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full sweep capturing (Pv, Mv, padded-bottom score) per column.

    Returns (Ps uint32 (B, T, NW), Ms uint32 (B, T, NW), scores (B, T)).
    Memory: T * NW * 8 bytes per element — use for traceback windows only.
    """
    B, S1, NW = peq.shape
    peq_t = jnp.transpose(peq, (1, 2, 0))
    zero_b = (peq_t[0, 0] & 0).astype(jnp.int32) + (targets[:, 0] & 0)
    Pv0 = jnp.broadcast_to(zero_b.astype(jnp.uint32)[None, :], (NW, B)) \
        | jnp.uint32(0xFFFFFFFF)
    Mv0 = jnp.broadcast_to(zero_b.astype(jnp.uint32)[None, :], (NW, B))
    score0 = zero_b + NW * WORD_SIZE

    def col_step(carry, sym):
        Pv, Mv, score = carry
        idx = sym[None, None, :].astype(jnp.int32)
        eq = jnp.take_along_axis(peq_t, jnp.broadcast_to(idx, (1, NW, B)),
                                 axis=0)[0]
        Pv, Mv, hout = _column_update(Pv, Mv, eq, hin0)
        score = score + hout
        return (Pv, Mv, score), (Pv, Mv, score)

    _, (Ps, Ms, scores) = jax.lax.scan(col_step, (Pv0, Mv0, score0),
                                       targets.T)
    # (T, NW, B) -> (B, T, NW); (T, B) -> (B, T)
    return (jnp.transpose(Ps, (2, 0, 1)), jnp.transpose(Ms, (2, 0, 1)),
            scores.T)


def decode_block_cells(P: np.ndarray, M: np.ndarray, bottom: np.ndarray
                       ) -> np.ndarray:
    """Decode all 32 cell values of word blocks from bit state (host numpy).

    P/M: uint32 (...,); bottom: int32 (...,) score of each block's bottom
    cell.  Returns int64 (..., 32) with entry i = cell at bit i.
    Vectorised counterpart of getBlockCellValues (edlib.cpp:470-482).
    """
    P = np.asarray(P, dtype=np.uint32)
    M = np.asarray(M, dtype=np.uint32)
    shifts = np.arange(WORD_SIZE, dtype=np.uint32)
    p_bits = ((P[..., None] >> shifts) & 1).astype(np.int64)
    m_bits = ((M[..., None] >> shifts) & 1).astype(np.int64)
    diff = p_bits - m_bits  # cell(i) - cell(i-1)
    # cell(i) = bottom - sum_{j>i} diff(j)
    suffix = np.cumsum(diff[..., ::-1], axis=-1)[..., ::-1]
    suffix = np.concatenate(
        [suffix[..., 1:], np.zeros_like(suffix[..., :1])], axis=-1)
    return np.asarray(bottom, dtype=np.int64)[..., None] - suffix
