"""Anti-diagonal wavefront kernel: ONE long alignment on a whole TPU chip.

The batched kernels parallelise over alignments; this kernel parallelises a
single pair over its query words.  Word w (32 DP rows) processes column
c = d - w at wavefront step d — every word on an anti-diagonal is
independent, so the whole (padded) query advances as one (R, 128) uint32
tile per step:

* state is tiny: Pv, Mv are ONE uint32 per word → two (R, 128) tiles;
* the inter-word hin/hout chain of the column formulation becomes a
  *spatial* hand-off: hout emitted by word w-1 at step d-1 is hin of word w
  at step d — a one-word-slot shift of the hout tiles per step;
* the per-word target symbol shifts the same way: sym_w(d) = target[d - w],
  maintained by inserting target[d] at word slot 0 each step;
* word axis is row-major on (R, 128): a one-slot shift is a lanes-roll plus
  a sublane-roll fix on lane 0 (2 rolls + 2 selects).

Scope (exactness tested in interpreter mode, against the host engine, and
on hardware up to 1Mbp pairs):
  * ``Wavefront`` — unbanded: NW distance + HW/SHW best score / first best
    end position, ~(T+W+NW) steps of ~45 VPU ops on ceil(NW/128)x128 lanes;
  * ``BandedWavefront`` — NW distance and SHW best-end search with a
    sliding banded window (exact within k, dynamic-k doubling on the
    host), ~8-30x less work on similar pairs.
Both run in bounded resumable segments (state = explicit checkpoint).

Reference counterpart: the strictly sequential column loops of
edlib.cpp:550-928, re-shaped so a single multi-Mbp alignment can use the
whole VPU instead of one word at a time.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edlib_tpu import encode
from edlib_tpu.ops.pallas_kernel import _compiler_params

LANES = 128
SUB_MIN = 8
_BIG = np.int32(0x3FFFFFFF)
# Select-chain cost per step is sigma+1 ops on the (R,128) tile against a
# ~45-op baseline: 32 covers protein (sigma~25) + quality alphabets at
# ~1.7x step cost; beyond that the native engine is the faster route.
MAX_SIGMA_WAVEFRONT = 32


def _shift_words(x, fill):
    """out[w] = x[w-1] along row-major word order of (R, 128); out[0]=fill."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    tmp = pltpu.roll(x, 1, 1)       # [r, l] = x[r, l-1]; lane 0 gets x[r, 127]
    fix = pltpu.roll(tmp, 1, 0)     # [r, 0] = x[r-1, 127]
    out = jnp.where(lanes == 0, fix, tmp)
    return jnp.where((lanes == 0) & (rows == 0),
                     jnp.full_like(x, fill), out)


def _wf_kernel(d_base_ref, targets_ref, peq_ref, state_in_ref, out_ref,
               state_out_ref, stream_ref, pv_ref, mv_ref, sym_ref,
               hn_ref, hp_ref, sc_ref, rmin_ref, rpos_ref, *, R: int,
               sigma1: int, chunk: int, hin0: int, n_words: int,
               col_lo: int, col_hi: int, t_scan: int, emit_stream: bool,
               word0: int = 0):
    """word0 > 0 runs the SAME recurrences on the word window
    [word0, word0 + R*128): the pinned-tail phase of the banded wavefront
    (once its window stops sliding, the banded kernel IS this kernel on
    the window — band entry/exit only ever acted through slides), which is
    how banded runs get full bottom-score streams.  Slot 0's hin then uses
    the banded top-boundary +1 fill via hin0=1, keeping every value an
    upper bound that is exact wherever <= k."""
    t_step = pl.program_id(0)
    n_chunks = pl.num_programs(0)
    shape = (R, LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    word_idx = word0 + rows * LANES + lanes
    # Bottom word's fixed tile slot (static): its score is sampled each
    # step into a collector tile that shifts one slot per step, flushed to
    # the HBM stream once per chunk — the spatial analogue of a per-step
    # dynamic scalar store, which Mosaic cannot do.
    row_b = (n_words - 1 - word0) // LANES
    lane_b = (n_words - 1 - word0) % LANES

    @pl.when(t_step == 0)
    def _init():
        # Resume from the carried state (int tiles ride bitcast as uint32).
        pv_ref[...] = state_in_ref[0]
        mv_ref[...] = state_in_ref[1]
        sym_ref[...] = state_in_ref[2].astype(jnp.int32)
        hn_ref[...] = state_in_ref[3].astype(jnp.int32)
        hp_ref[...] = state_in_ref[4].astype(jnp.int32)
        sc_ref[...] = state_in_ref[5].astype(jnp.int32)
        rmin_ref[...] = state_in_ref[6].astype(jnp.int32)
        rpos_ref[...] = state_in_ref[7].astype(jnp.int32)

    def step(i, carry):
        Pv, Mv, symwin, hneg, hpos, scores, runmin, runpos, coll = carry
        d = d_base_ref[0] + t_step * chunk + i
        symwin = _shift_words(symwin, targets_ref[i, 0])
        hneg = _shift_words(hneg, 0)
        hpos = _shift_words(hpos, hin0)
        eq = jnp.zeros(shape, jnp.uint32)
        for s in range(sigma1):
            eq = jnp.where(symwin == s, peq_ref[s], eq)
        hneg_u = hneg.astype(jnp.uint32)
        hpos_u = hpos.astype(jnp.uint32)
        Xv = eq | Mv
        eq2 = eq | hneg_u
        Xh = (((eq2 & Pv) + Pv) ^ Pv) | eq2
        Ph = Mv | ~(Xh | Pv)
        Mh = Pv & Xh
        hout_pos = (Ph >> 31).astype(jnp.int32)
        hout_neg = (Mh >> 31).astype(jnp.int32)
        Ph = (Ph << 1) | hpos_u
        Mh = (Mh << 1) | hneg_u
        Pv_new = Mh | ~(Xv | Ph)
        Mv_new = Ph & Xv
        col = d - word_idx
        active = (col >= 0) & (col < t_scan) & (word_idx < n_words)
        Pv = jnp.where(active, Pv_new, Pv)
        Mv = jnp.where(active, Mv_new, Mv)
        scores = scores + jnp.where(active, hout_pos - hout_neg, 0)
        hneg = jnp.where(active, hout_neg, 0)
        hpos = jnp.where(active, hout_pos, 0)
        upd = ((word_idx == n_words - 1) & active & (col >= col_lo)
               & (col < col_hi) & (scores < runmin))
        runmin = jnp.where(upd, scores, runmin)
        runpos = jnp.where(upd, col, runpos)
        if emit_stream:
            coll = _shift_words(coll, scores[row_b, lane_b])
        return (Pv, Mv, symwin, hneg, hpos, scores, runmin, runpos, coll)

    carry0 = (pv_ref[...], mv_ref[...], sym_ref[...], hn_ref[...],
              hp_ref[...], sc_ref[...], rmin_ref[...], rpos_ref[...],
              jnp.zeros(shape, jnp.int32))
    # Manual unroll (Mosaic fori_loop is full-or-no unroll only).
    unroll = 4 if chunk % 4 == 0 else 1

    def steps(i, carry):
        for j in range(unroll):
            carry = step(i * unroll + j, carry)
        return carry

    (Pv, Mv, symwin, hneg, hpos, scores, runmin, runpos,
     coll) = jax.lax.fori_loop(0, chunk // unroll, steps, carry0)
    if emit_stream:
        # Slot j of this chunk's flushed tile = the bottom word's score
        # after step (chunk-1-j) of the chunk (newest sample at slot 0).
        stream_ref[...] = coll
    pv_ref[...] = Pv
    mv_ref[...] = Mv
    sym_ref[...] = symwin
    hn_ref[...] = hneg
    hp_ref[...] = hpos
    sc_ref[...] = scores
    rmin_ref[...] = runmin
    rpos_ref[...] = runpos

    @pl.when(t_step == n_chunks - 1)
    def _emit():
        out_ref[0] = scores
        out_ref[1] = runmin
        out_ref[2] = runpos
        state_out_ref[0] = Pv
        state_out_ref[1] = Mv
        state_out_ref[2] = symwin.astype(jnp.uint32)
        state_out_ref[3] = hneg.astype(jnp.uint32)
        state_out_ref[4] = hpos.astype(jnp.uint32)
        state_out_ref[5] = scores.astype(jnp.uint32)
        state_out_ref[6] = runmin.astype(jnp.uint32)
        state_out_ref[7] = runpos.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=(
    "R", "sigma1", "chunk", "hin0", "n_words", "col_lo", "col_hi",
    "t_scan", "emit_stream", "word0", "interpret"))
def _wavefront_call(d_base, targets, peq, state, *, R, sigma1, chunk, hin0,
                    n_words, col_lo, col_hi, t_scan, emit_stream=False,
                    word0=0, interpret=False):
    """One resumable segment of the wavefront: runs targets.shape[0]*chunk
    steps from absolute step d_base, returns (out (3,R,128) int32,
    new state (8,R,128) uint32, stream (n_chunks|1, R, 128) int32)."""
    n_chunks = targets.shape[0]
    kernel = functools.partial(_wf_kernel, R=R, sigma1=sigma1, chunk=chunk,
                               hin0=hin0, n_words=n_words, col_lo=col_lo,
                               col_hi=col_hi, t_scan=t_scan,
                               emit_stream=emit_stream, word0=word0)
    shape = (R, LANES)
    if emit_stream:
        stream_spec = pl.BlockSpec((None,) + shape, lambda j: (j, 0, 0),
                                   memory_space=pltpu.VMEM)
        stream_shape = jax.ShapeDtypeStruct((n_chunks,) + shape, jnp.int32)
    else:
        stream_spec = pl.BlockSpec((None,) + shape, lambda j: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
        stream_shape = jax.ShapeDtypeStruct((1,) + shape, jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, chunk, 1), lambda j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((sigma1,) + shape, lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8,) + shape, lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3,) + shape, lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8,) + shape, lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            stream_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3,) + shape, jnp.int32),
            jax.ShapeDtypeStruct((8,) + shape, jnp.uint32),
            stream_shape,
        ),
        scratch_shapes=[
            pltpu.VMEM(shape, jnp.uint32),   # Pv
            pltpu.VMEM(shape, jnp.uint32),   # Mv
            pltpu.VMEM(shape, jnp.int32),    # symbol window
            pltpu.VMEM(shape, jnp.int32),    # hout_neg
            pltpu.VMEM(shape, jnp.int32),    # hout_pos
            pltpu.VMEM(shape, jnp.int32),    # per-word bottom scores
            pltpu.VMEM(shape, jnp.int32),    # running min (bottom word)
            pltpu.VMEM(shape, jnp.int32),    # running argmin
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(d_base, targets, peq, state)


class Wavefront:
    """Host-side driver for the wavefront kernel.

    Long runs are split into bounded segments (seg_chunks grid steps per
    pallas_call) with the full wavefront state carried between calls — this
    keeps single kernel executions short (watchdog-safe) and makes the
    state an explicit checkpoint (the device analogue of the reference's
    targetStopPosition column snapshot).
    """

    def __init__(self, chunk: int = 512, interpret: bool = False,
                 seg_chunks: int = 32):
        self.chunk = chunk
        self.interpret = interpret
        self.seg_chunks = seg_chunks

    def _prepare(self, q_ids: np.ndarray, t_ids: np.ndarray, sigma: int,
                 wildcard_ext: bool = True, eq=None):
        qlen = len(q_ids)
        n_words = encode.num_words(qlen)
        rows_needed = -(-n_words // LANES)
        R = max(SUB_MIN, -(-rows_needed // SUB_MIN) * SUB_MIN)
        w_pad = (n_words * 32 - qlen) if wildcard_ext else 0
        t_scan = len(t_ids) + w_pad
        n_steps = t_scan + n_words - 1
        n_chunks = -(-n_steps // self.chunk)
        # Pad to a whole number of segments; surplus steps are inactive.
        seg = min(self.seg_chunks, n_chunks)
        n_chunks = -(-n_chunks // seg) * seg
        if eq is None:
            eq = np.eye(sigma, dtype=bool)
        peq_words = encode.build_peq_words(np.asarray(q_ids, np.uint8), eq,
                                           n_words=n_words)
        peq = np.zeros((sigma + 1, R, LANES), np.uint32)
        flat = peq.reshape(sigma + 1, R * LANES)
        flat[:, :n_words] = peq_words
        targets = np.full((n_chunks, self.chunk, 1), sigma, np.int32)
        tflat = targets.reshape(-1)
        tflat[:len(t_ids)] = t_ids
        tflat[len(t_ids):t_scan] = sigma  # wildcard extension
        return peq, targets, n_words, R, w_pad, t_scan

    @staticmethod
    def initial_state(R: int) -> np.ndarray:
        shape = (R, LANES)
        word_idx = (np.arange(R)[:, None] * LANES
                    + np.arange(LANES)[None, :]).astype(np.int64)
        state = np.zeros((8, R, LANES), np.uint32)
        state[0] = 0xFFFFFFFF                      # Pv
        state[5] = ((word_idx + 1) * 32).astype(np.uint32)  # scores
        state[6] = np.uint32(_BIG)                 # running min
        state[7] = 0xFFFFFFFF                      # running argmin (-1)
        return state

    def column_cells(self, q_ids: np.ndarray, t_ids: np.ndarray, sigma: int,
                     stop: int, eq=None) -> np.ndarray:
        """NW column cells cell(r, stop), r in [0, qlen) — the Hirschberg
        half-sweep on device (device analogue of etn_nw_cells_at /
        myersCalcEditDistanceNW's targetStopPosition, edlib.cpp:896-908).

        Runs the wavefront over target[:stop+1] with NO wildcard extension,
        so every word's final (Pv, Mv, score) is its state at exactly
        column ``stop``; the 32-cells-per-word bit-decode happens on host
        (O(qlen) scalar work on a tiny transfer).
        """
        qlen = len(q_ids)
        t_trunc = np.asarray(t_ids)[:stop + 1]
        peq, targets, n_words, R, w_pad, t_scan = self._prepare(
            q_ids, t_trunc, sigma, wildcard_ext=False, eq=eq)
        n_chunks = targets.shape[0]
        seg = min(self.seg_chunks, n_chunks)
        state = self.initial_state(R)
        for s0 in range(0, n_chunks, seg):
            d_base = np.array([s0 * self.chunk], np.int32)
            _, state, _ = _wavefront_call(
                d_base, targets[s0:s0 + seg], peq, state,
                R=R, sigma1=sigma + 1, chunk=self.chunk, hin0=1,
                n_words=n_words, col_lo=0, col_hi=0,
                t_scan=t_scan, interpret=self.interpret)
        state = np.asarray(state).reshape(8, R * LANES)[:, :n_words]
        Pv, Mv = state[0], state[1]
        bottom = state[5].astype(np.int32).astype(np.int64)
        # Decode word w's 32 rows from its bottom score (vectorised):
        # cell(w, b) = bottom[w] - sum_{j > b} (P_bit(j) - M_bit(j)).
        bits = np.arange(32, dtype=np.uint32)
        delta = (((Pv[:, None] >> bits) & 1).astype(np.int64)
                 - ((Mv[:, None] >> bits) & 1).astype(np.int64))
        above = np.cumsum(delta[:, ::-1], axis=1)[:, ::-1] - delta
        cells = (bottom[:, None] - above).reshape(-1)
        return cells[:qlen]

    def run(self, q_ids: np.ndarray, t_ids: np.ndarray, sigma: int,
            hin0: int, col_lo: int, col_hi: int, emit_stream: bool = False):
        peq, targets, n_words, R, w_pad, t_scan = self._prepare(
            q_ids, t_ids, sigma)
        if emit_stream and self.chunk > R * LANES:
            raise ValueError("stream emission needs chunk <= R*128 "
                             "(collector capacity)")
        n_chunks = targets.shape[0]
        seg = min(self.seg_chunks, n_chunks)
        state = self.initial_state(R)
        out = None
        stream_tiles = []
        for s0 in range(0, n_chunks, seg):
            d_base = np.array([s0 * self.chunk], np.int32)
            out, state, stream = _wavefront_call(
                d_base, targets[s0:s0 + seg], peq, state,
                R=R, sigma1=sigma + 1, chunk=self.chunk, hin0=hin0,
                n_words=n_words, col_lo=col_lo, col_hi=col_hi,
                t_scan=t_scan, emit_stream=emit_stream,
                interpret=self.interpret)
            if emit_stream:
                stream_tiles.append(np.asarray(stream))
        flat = np.asarray(out).reshape(3, R * LANES)
        if not emit_stream:
            return flat[:, n_words - 1], w_pad
        # Decode: chunk t's tile slot j = bottom-word score after step
        # (t*chunk + chunk-1-j); col c of word n_words-1 runs at step
        # c + n_words - 1.
        tiles = np.concatenate(stream_tiles)  # (n_chunks, R, 128)
        by_step = tiles.reshape(n_chunks, R * LANES)[:, :self.chunk][:, ::-1]
        by_step = by_step.reshape(-1)
        stream = by_step[n_words - 1:n_words - 1 + t_scan]
        return flat[:, n_words - 1], w_pad, stream

    def semiglobal_scores(self, q_ids: np.ndarray, t_ids: np.ndarray,
                          sigma: int, mode_is_hw: bool) -> np.ndarray:
        """Full bottom-row score stream cell(Q-1, c), c in [0, tlen) —
        the device analogue of ops/host.semiglobal_scores (the input to
        align._filter_locations for all-locations lists)."""
        qlen = len(q_ids)
        n_words = encode.num_words(qlen)
        w_pad = n_words * 32 - qlen
        _, _, stream = self.run(q_ids, t_ids, sigma,
                                hin0=0 if mode_is_hw else 1,
                                col_lo=0, col_hi=0, emit_stream=True)
        return stream[w_pad:w_pad + len(t_ids)]

    def nw_distance(self, q_ids: np.ndarray, t_ids: np.ndarray,
                    sigma: int) -> int:
        """cell(Q-1, T-1): the bottom word's final padded-bottom score."""
        col, _ = self.run(q_ids, t_ids, sigma, hin0=1, col_lo=0, col_hi=0)
        return int(col[0])

    def semiglobal_best(self, q_ids: np.ndarray, t_ids: np.ndarray,
                        sigma: int, mode_is_hw: bool) -> Tuple[int, int]:
        """(best, first best end position) over real end positions."""
        qlen = len(q_ids)
        n_words = encode.num_words(qlen)
        w_pad = n_words * 32 - qlen
        col, _ = self.run(q_ids, t_ids, sigma,
                          hin0=0 if mode_is_hw else 1,
                          col_lo=w_pad, col_hi=w_pad + len(t_ids))
        return int(col[1]), int(col[2]) - w_pad


# ---------------------------------------------------------------------------
# Banded wavefront (NW): a sliding window of WINW = R*128 word slots tracks
# the Ukkonen band down the main diagonal.
#
# Word w's rows intersect the band [c+lo, c+hi] at its wavefront column
# c = d - w iff 33w is in [d+lo-31, d+hi], so the window base advances one
# word every ~33 steps (a deterministic schedule).  On a slide the slot
# contents roll UP one slot; the entering bottom word is synthesized as
# "cell above + 1 each" (Pv=ones, score = above's step-(d-2) score + 32 —
# reconstructed as score - hout since the hout tiles still hold step d-1),
# and the window-top word's successor receives the boundary hin=+1 fill —
# both are the standard banded-Myers upper-bound approximations (cf. the
# native banded engine): every value <= k is exact, so the result is the
# true NW distance whenever it is <= k (host runs the dynamic-k doubling).
#
# Each pallas call runs a bounded number of steps with the target slice for
# those steps resident in VMEM (the consumed column index drifts at ~32/33
# per step, so block-streamed SMEM targets cannot follow it); the full
# state (incl. the Peq window) is carried between calls.
# ---------------------------------------------------------------------------


def _wfb_kernel(params_ref, enter_ref, targets_ref, state_in_ref,
                state_out_ref, *, R: int, sigma1: int, n_steps: int,
                n_words: int, lo: int, t_scan: int, tgt_rows: int,
                col_lo: int, col_hi: int):
    """One banded segment.

    params_ref: SMEM int32 [d0, col0, base0]  (absolute first step; first
        target index held in targets_ref; window base at segment entry).
    enter_ref: SMEM int32 (1, max_slides*sigma1) — Peq values (bit-identical
        int32 views) of the words that will enter the window during this
        segment, indexed by slide count.  Mosaic cannot do unaligned VMEM
        scalar reads, and the entering schedule is deterministic, so the
        host precomputes it.
    targets_ref: SMEM (1, tgt_len) int32 — target_ext[col0 : col0+tgt_len]
        (single-row layout: SMEM pads every row to a full lane stripe).
    state: (8 + sigma1, R, 128) uint32:
        [Pv, Mv, symwin, hneg, hpos, scores, runmin, runpos,
         peq window rows...].
    col_lo/col_hi: when col_hi > col_lo, track the running (min, first
        argmin) of the bottom word's padded-bottom score over wavefront
        columns [col_lo, col_hi) — the semiglobal end-position search.
    """
    shape = (R, LANES)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    slot_idx = rows * LANES + lanes
    WINW = R * LANES
    base_cap = max(0, n_words - WINW)
    d0 = params_ref[0]
    col0 = params_ref[1]
    base0 = params_ref[2]

    def base_of(d):
        b = jnp.maximum((d + lo - 31) // 33, 0)
        return jnp.minimum(b, base_cap)

    def slide_up(x, fill_val):
        # pltpu.roll requires non-negative shifts: -1 == size-1.
        tmp = pltpu.roll(x, LANES - 1, 1)  # [r, l] = x[r, l+1]; lane 127 wraps
        fix = pltpu.roll(tmp, R - 1, 0)    # [r, 127] = x[r+1, 0... next row]
        y = jnp.where(lanes == LANES - 1, fix, tmp)
        return jnp.where((lanes == LANES - 1) & (rows == R - 1),
                         jnp.full_like(x, fill_val), y)

    def step(i, carry):
        Pv, Mv, symwin, hneg, hpos, scores, runmin, runpos, peq_win = carry
        d = d0 + i
        base_prev = base_of(d - 1)
        base = base_of(d)
        do = base != base_prev

        # --- window slide (base advanced by one word) ---
        bottom_score = scores[R - 1, LANES - 1]
        bottom_h = (hpos[R - 1, LANES - 1] - hneg[R - 1, LANES - 1])
        enter_score = bottom_score - bottom_h + 32
        Pv = jnp.where(do, slide_up(Pv, jnp.uint32(0xFFFFFFFF)), Pv)
        Mv = jnp.where(do, slide_up(Mv, jnp.uint32(0)), Mv)
        symwin = jnp.where(do, slide_up(symwin, 0), symwin)
        hneg = jnp.where(do, slide_up(hneg, 0), hneg)
        hpos = jnp.where(do, slide_up(hpos, 0), hpos)
        scores = jnp.where(do, slide_up(scores, enter_score), scores)
        if col_hi > col_lo:
            runmin = jnp.where(do, slide_up(runmin, _BIG), runmin)
            runpos = jnp.where(do, slide_up(runpos, -1), runpos)
        slide_idx = base - base0
        new_peq = []
        for sidx in range(sigma1):
            val = enter_ref[0, slide_idx * sigma1 + sidx].astype(jnp.uint32)
            new_peq.append(jnp.where(do, slide_up(peq_win[sidx], val),
                                     peq_win[sidx]))
        peq_win = tuple(new_peq)

        # --- per-step word-slot shift + advance ---
        tpos = d - base - col0
        sym_fill = targets_ref[0, tpos]
        symwin = _shift_words(symwin, sym_fill)
        hneg = _shift_words(hneg, 0)
        hpos = _shift_words(hpos, 1)

        eq = jnp.zeros(shape, jnp.uint32)
        for sidx in range(sigma1):
            eq = jnp.where(symwin == sidx, peq_win[sidx], eq)
        hneg_u = hneg.astype(jnp.uint32)
        hpos_u = hpos.astype(jnp.uint32)
        Xv = eq | Mv
        eq2 = eq | hneg_u
        Xh = (((eq2 & Pv) + Pv) ^ Pv) | eq2
        Ph = Mv | ~(Xh | Pv)
        Mh = Pv & Xh
        hout_pos = (Ph >> 31).astype(jnp.int32)
        hout_neg = (Mh >> 31).astype(jnp.int32)
        Ph = (Ph << 1) | hpos_u
        Mh = (Mh << 1) | hneg_u
        Pv_new = Mh | ~(Xv | Ph)
        Mv_new = Ph & Xv

        word = base + slot_idx
        col = d - word
        active = (col >= 0) & (col < t_scan) & (word < n_words)
        Pv = jnp.where(active, Pv_new, Pv)
        Mv = jnp.where(active, Mv_new, Mv)
        scores = scores + jnp.where(active, hout_pos - hout_neg, 0)
        hneg = jnp.where(active, hout_neg, 0)
        hpos = jnp.where(active, hout_pos, 0)
        if col_hi > col_lo:
            upd = ((word == n_words - 1) & active & (col >= col_lo)
                   & (col < col_hi) & (scores < runmin))
            runmin = jnp.where(upd, scores, runmin)
            runpos = jnp.where(upd, col, runpos)
        return (Pv, Mv, symwin, hneg, hpos, scores, runmin, runpos, peq_win)

    carry0 = (state_in_ref[0], state_in_ref[1],
              state_in_ref[2].astype(jnp.int32),
              state_in_ref[3].astype(jnp.int32),
              state_in_ref[4].astype(jnp.int32),
              state_in_ref[5].astype(jnp.int32),
              state_in_ref[6].astype(jnp.int32),
              state_in_ref[7].astype(jnp.int32),
              tuple(state_in_ref[8 + sidx] for sidx in range(sigma1)))
    # Manual unroll (Mosaic fori_loop is full-or-no unroll only).
    unroll = 4 if n_steps % 4 == 0 else 1

    def steps(i, carry):
        for j in range(unroll):
            carry = step(i * unroll + j, carry)
        return carry

    (Pv, Mv, symwin, hneg, hpos, scores, runmin, runpos,
     peq_win) = jax.lax.fori_loop(0, n_steps // unroll, steps, carry0)
    state_out_ref[0] = Pv
    state_out_ref[1] = Mv
    state_out_ref[2] = symwin.astype(jnp.uint32)
    state_out_ref[3] = hneg.astype(jnp.uint32)
    state_out_ref[4] = hpos.astype(jnp.uint32)
    state_out_ref[5] = scores.astype(jnp.uint32)
    state_out_ref[6] = runmin.astype(jnp.uint32)
    state_out_ref[7] = runpos.astype(jnp.uint32)
    for sidx in range(sigma1):
        state_out_ref[8 + sidx] = peq_win[sidx]


@functools.partial(jax.jit, static_argnames=(
    "R", "sigma1", "n_steps", "n_words", "lo", "t_scan", "tgt_rows",
    "col_lo", "col_hi", "interpret"))
def _wfb_call(params, enter, targets, state, *, R, sigma1, n_steps, n_words,
              lo, t_scan, tgt_rows, col_lo, col_hi, interpret):
    shape = (R, LANES)
    kernel = functools.partial(_wfb_kernel, R=R, sigma1=sigma1,
                               n_steps=n_steps, n_words=n_words, lo=lo,
                               t_scan=t_scan, tgt_rows=tgt_rows,
                               col_lo=col_lo, col_hi=col_hi)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 + sigma1,) + shape, jnp.uint32),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(params, enter, targets, state)


class BandedWavefront:
    """NW distance / SHW best-end search for one long pair with a sliding
    banded window.

    Exact whenever the true result is <= k; the public entries run the
    dynamic-k doubling loop.  Window word-capacity buckets are powers of
    two so compiled kernels are reused across k's.  (HW has no static
    band — free starts at every column defeat the |r-c| bound — so long
    HW goes through the unbanded wavefront or the segmented batch path.)
    """

    def __init__(self, seg_steps: int = 65536, interpret: bool = False,
                 r_min: int = SUB_MIN):
        self.seg_steps = seg_steps
        self.interpret = interpret
        self.r_min = r_min  # < SUB_MIN only for interpret-mode slide tests

    def _band_geometry(self, qlen: int, tlen: int, k: int):
        n_words = encode.num_words(qlen)
        diff = qlen - tlen
        s = max(0, (k - abs(diff)) // 2)
        lo = min(0, diff) - s
        hi = max(0, diff) + s
        band_words = (hi - lo + 31) // 33 + 3
        R = self.r_min
        while R * LANES < band_words:
            R *= 2
        rows_all = -(-n_words // LANES)
        R_full = max(SUB_MIN, -(-rows_all // SUB_MIN) * SUB_MIN)
        R = min(R, R_full)
        return n_words, lo, R

    def _init(self, q_ids: np.ndarray, t_ids: np.ndarray, sigma: int,
              n_words: int, R: int, eq=None):
        """(peq_flat, rows_all, t_ext, state) for a banded run."""
        qlen, tlen = len(q_ids), len(t_ids)
        WINW = R * LANES
        w_pad = n_words * 32 - qlen
        t_scan = tlen + w_pad
        if eq is None:
            eq = np.eye(sigma, dtype=bool)
        peq_words = encode.build_peq_words(np.asarray(q_ids, np.uint8), eq,
                                           n_words=n_words)
        # Allocate at least R rows: the entering-word gather computes its
        # (unused) index even on non-slide steps and must stay in bounds.
        rows_all = max(1, -(-n_words // LANES), R)
        peq = np.zeros((sigma + 1, rows_all, LANES), np.uint32)
        peq.reshape(sigma + 1, -1)[:, :n_words] = peq_words

        t_ext = np.full(t_scan + self.seg_steps + WINW + LANES, sigma,
                        np.int32)
        t_ext[:tlen] = t_ids

        state = np.zeros((8 + sigma + 1, R, LANES), np.uint32)
        state[0] = 0xFFFFFFFF  # Pv
        slot = (np.arange(R)[:, None] * LANES + np.arange(LANES)[None, :])
        state[5] = ((slot + 1) * 32).astype(np.uint32)  # scores (base 0)
        state[6] = np.uint32(_BIG)   # running min
        state[7] = 0xFFFFFFFF        # running argmin (-1)
        for sidx in range(sigma + 1):
            state[8 + sidx] = peq.reshape(sigma + 1, -1)[sidx][
                np.minimum(slot.reshape(-1), rows_all * LANES - 1)
            ].reshape(R, LANES)
        return peq.reshape(sigma + 1, -1), rows_all, t_ext, state

    @staticmethod
    def _band_dead(state, d, n_words, lo, R, k) -> bool:
        """Frontier-death test (host-side, between segments): every cell of
        word w is >= score_w - 31, and DP edges never decrease values, so
        min over the window's live words of (bottom score) - 31 > k proves
        every future cell > k — the device analogue of the CPU core's
        band-vanish early exit (one ~50KB state fetch per segment)."""
        WINW = R * LANES
        base = min(max((d - 1 + lo - 31) // 33, 0), max(0, n_words - WINW))
        scores = np.asarray(state[5]).reshape(-1).astype(np.int64)
        valid = (base + np.arange(WINW)) < n_words
        if not valid.any():
            return False
        return int(scores[valid].min()) - 31 > k

    def _segment(self, state, d, n_steps, peq_flat, rows_all, t_ext, *,
                 sigma, n_words, lo, R, t_scan, col_lo, col_hi):
        """One banded segment of n_steps from absolute step d."""
        WINW = R * LANES

        def base_of(dd):
            return min(max((dd + lo - 31) // 33, 0),
                       max(0, n_words - WINW))

        base0 = base_of(d)
        col0 = max(0, d - base0)
        tgt_rows = -(-(n_steps + WINW + LANES) // LANES)
        seg_t = t_ext[col0:col0 + tgt_rows * LANES][None, :]
        params = np.array([d, col0, base0], np.int32)
        # Entering-word Peq schedule: slide s brings word
        # (base0 + s) + WINW - 1 into the window bottom.
        max_slides = n_steps // 33 + 3
        ent_words = np.minimum(base0 + np.arange(max_slides) + WINW - 1,
                               rows_all * LANES - 1)
        enter = (peq_flat[:, ent_words].T.astype(np.uint32)
                 .view(np.int32).reshape(1, -1))
        return _wfb_call(
            params, np.ascontiguousarray(enter), seg_t, state,
            R=R, sigma1=sigma + 1, n_steps=n_steps,
            n_words=n_words, lo=lo, t_scan=t_scan, tgt_rows=tgt_rows,
            col_lo=col_lo, col_hi=col_hi, interpret=self.interpret)

    def _run_banded(self, q_ids: np.ndarray, t_ids: np.ndarray, sigma: int,
                    n_words: int, lo: int, R: int, col_lo: int, col_hi: int,
                    eq=None, k_exit=None):
        """Run the banded sweep; return the final bottom-word slot of the
        (scores, runmin, runpos) planes as python ints.

        k_exit: when set, stop as soon as the frontier provably exceeds it
        (_band_dead) — failing dynamic-k ladder iterations then cost a few
        segments instead of the whole sweep, like the CPU band-vanish.
        Any (runmin, runpos) hit recorded before death is still returned
        (hits at the bottom keep the frontier <= k, so death can only
        happen after the last hit)."""
        qlen, tlen = len(q_ids), len(t_ids)
        WINW = R * LANES
        w_pad = n_words * 32 - qlen
        t_scan = tlen + w_pad
        n_steps_total = t_scan + n_words - 1
        peq_flat, rows_all, t_ext, state = self._init(
            q_ids, t_ids, sigma, n_words, R, eq=eq)

        def base_of(d):
            return min(max((d + lo - 31) // 33, 0), max(0, n_words - WINW))

        d = 0
        died = False
        while d < n_steps_total:
            state = self._segment(state, d, self.seg_steps, peq_flat,
                                  rows_all, t_ext, sigma=sigma,
                                  n_words=n_words, lo=lo, R=R,
                                  t_scan=t_scan, col_lo=col_lo,
                                  col_hi=col_hi)
            d += self.seg_steps  # fixed-size segments; overshoot is inert
            if k_exit is not None and d < n_steps_total and self._band_dead(
                    state, d, n_words, lo, R, k_exit):
                died = True
                break
        state = np.asarray(state)
        # The window kept sliding through the (inactive) overshoot steps;
        # locate the bottom word by the base at the last EXECUTED step.
        base_final = base_of(d - 1)
        slot_idx = (n_words - 1) - base_final
        if slot_idx >= R * LANES:
            # Died before the window reached the bottom word: every
            # bottom-row cell is provably > k_exit, nothing was tracked.
            return (int(_BIG), int(_BIG), -1)
        flat = state.reshape(8 + sigma + 1, -1)[:, slot_idx]
        # On death the bottom word's FINAL-column score was never reached;
        # only the tracked (runmin, runpos) hits (all <= k_exit) are valid.
        score = int(_BIG) if died else int(np.int32(flat[5]))
        return (score, int(np.int32(flat[6])), int(np.int32(flat[7])))

    def distance_bounded(self, q_ids: np.ndarray, t_ids: np.ndarray,
                         sigma: int, k: int, eq=None):
        """NW distance if <= k else None (value then unreliable)."""
        qlen, tlen = len(q_ids), len(t_ids)
        n_words, lo, R = self._band_geometry(qlen, tlen, k)
        score, _, _ = self._run_banded(q_ids, t_ids, sigma, n_words, lo, R,
                                       col_lo=0, col_hi=0, eq=eq, k_exit=k)
        return score if score <= k else None

    def shw_best_bounded(self, q_ids: np.ndarray, t_ids: np.ndarray,
                         sigma: int, k: int, eq=None):
        """SHW (prefix mode) (best score, first best end position) if the
        best is <= k, else None.

        SHW cells are prefix-vs-prefix global distances, so
        cell(r, c) >= |r - c|: the diagonal band lo=-k..hi=+k covers every
        cell of value <= k, and end columns beyond qlen-1+k cannot hold a
        value <= k — the target is truncated there (pruning-only).
        Reference counterpart: edlib.cpp:550-704 with the SHW start/stop
        block bounds.
        """
        qlen, tlen = len(q_ids), len(t_ids)
        k = min(k, max(qlen, tlen))
        tlen_eff = min(tlen, qlen + k)
        t_eff = np.asarray(t_ids)[:tlen_eff]
        n_words = encode.num_words(qlen)
        lo, hi = -k, k
        band_words = (hi - lo + 31) // 33 + 3
        R = self.r_min
        while R * LANES < band_words:
            R *= 2
        rows_all = -(-n_words // LANES)
        R_full = max(SUB_MIN, -(-rows_all // SUB_MIN) * SUB_MIN)
        R = min(R, R_full)
        w_pad = n_words * 32 - qlen
        _, best, pos = self._run_banded(
            q_ids, t_eff, sigma, n_words, lo, R,
            col_lo=w_pad, col_hi=w_pad + tlen_eff, eq=eq, k_exit=k)
        return (best, pos - w_pad) if best <= k else None

    # Segment-size buckets for landing the banded phase inside the
    # [window-pin, first-emission] step interval (which is always >= 64
    # steps wide: 33*WINW - 2k - 33 with WINW >= (2k+31)//33 + 3).
    _TAIL_BUCKETS = (65536, 32768, 4096, 512, 64)

    def shw_locations_bounded(self, q_ids: np.ndarray, t_ids: np.ndarray,
                              sigma: int, k: int, eq=None):
        """SHW (best, [ALL minimal end positions]) if best <= k, else None
        — the banded full-stream search.

        Phase 1 runs the sliding banded window up to a step in
        [d_pin, d_emit]: d_pin is where the window stops sliding (base at
        cap), d_emit the first step at which the bottom word reaches a
        column that can hold a value <= k (SHW cell(Q-1, p) >= |p-(Q-1)|,
        so only columns [Q-1-k, Q-1+k] matter).  After the pin the banded
        kernel's recurrences ARE the unbanded kernel's on the window
        (slides were the only band-specific action), so phase 2 hands the
        state to the stream-emitting wavefront kernel with a word0 offset
        and collects the bottom-score stream over the emission columns —
        the "banded full streams" the unbanded collector trick could not
        reach while the window still slid.  Every emitted value <= k is
        exact (standard banded-Myers upper-bound contract).
        """
        from edlib_tpu.align import _filter_locations
        qlen, tlen = len(q_ids), len(t_ids)
        k = min(k, max(qlen, tlen))
        tlen_eff = min(tlen, qlen + k)
        if qlen - k > tlen_eff:
            # Every SHW alignment deletes >= qlen - tlen_eff > k chars.
            return None
        t_eff = np.asarray(t_ids)[:tlen_eff]
        n_words = encode.num_words(qlen)
        lo = -k
        band_words = (2 * k + 31) // 33 + 3
        R = self.r_min
        while R * LANES < band_words:
            R *= 2
        rows_all_q = -(-n_words // LANES)
        R_full = max(SUB_MIN, -(-rows_all_q // SUB_MIN) * SUB_MIN)
        R = min(R, R_full)
        WINW = R * LANES
        w_pad = n_words * 32 - qlen
        t_scan = tlen_eff + w_pad
        n_steps_total = t_scan + n_words - 1
        base_cap = max(0, n_words - WINW)
        # Handoff needs the LAST slide executed: the slide to base_cap
        # happens at the start of step d with base_of(d) == base_cap, so
        # the slide-less phase 2 must start at d >= d_pin + 1 (a handoff
        # AT d_pin would leave the window one word short).
        d_pin = 0 if base_cap == 0 else 33 * base_cap + 31 + k + 1
        c_emit = w_pad + max(0, qlen - 1 - k)  # first scan col that can be <= k
        d_emit = (n_words - 1) + c_emit
        if d_pin > d_emit:  # unreachable by the WINW bound; belt-and-braces
            d_pin = 0
            base_cap = 0
            R = R_full
            WINW = R * LANES

        peq_flat, rows_all, t_ext, state = self._init(
            q_ids, t_eff, sigma, n_words, R, eq=eq)

        # Phase 1: banded segments to a step d1 in [d_pin, d_emit].
        # Bucket sizes are clipped to seg_steps (t_ext's slack is sized
        # from it) and to the remaining scan.
        buckets = tuple(b for b in self._TAIL_BUCKETS
                        if b <= self.seg_steps) or (self.seg_steps,)
        d = 0
        while d < d_pin:
            limit = min(d_emit, n_steps_total)
            b = next((b for b in buckets if d + b <= limit), None)
            if b is None:  # tiny remaining gap; exact-size fallback
                b = min(d_pin - d, self.seg_steps, max(1, limit - d))
            state = self._segment(state, d, b, peq_flat, rows_all, t_ext,
                                  sigma=sigma, n_words=n_words, lo=lo, R=R,
                                  t_scan=t_scan, col_lo=0, col_hi=0)
            d += b
            if d < d_pin and self._band_dead(state, d, n_words, lo, R, k):
                # Bottom-row columns are all in the future: nothing <= k.
                return None

        # Phase 2: pinned-tail stream (word0 = base_cap).
        state = np.asarray(state)
        tail_state = np.ascontiguousarray(state[:8])
        peq_tile = np.zeros((sigma + 1, R, LANES), np.uint32)
        wsel = np.minimum(base_cap + np.arange(WINW), rows_all * LANES - 1)
        peq_tile.reshape(sigma + 1, -1)[:] = peq_flat[:, wsel]
        chunk = min(512, WINW)
        tail_steps = n_steps_total - d
        n_chunks = -(-tail_steps // chunk)
        seg = 32
        n_chunks = -(-n_chunks // seg) * seg
        slab_idx = (d - base_cap) + np.arange(n_chunks * chunk)
        slab = np.full(n_chunks * chunk, sigma, np.int32)
        valid = (slab_idx >= 0) & (slab_idx < len(t_ext))
        slab[valid] = t_ext[slab_idx[valid]]
        targets = slab.reshape(n_chunks, chunk, 1)
        tiles = []
        tstate = tail_state
        for s0 in range(0, n_chunks, seg):
            d_base = np.array([d + s0 * chunk], np.int32)
            _, tstate, stream = _wavefront_call(
                d_base, targets[s0:s0 + seg], peq_tile, tstate,
                R=R, sigma1=sigma + 1, chunk=chunk, hin0=1,
                n_words=n_words, col_lo=0, col_hi=0, t_scan=t_scan,
                emit_stream=True, word0=base_cap,
                interpret=self.interpret)
            tiles.append(np.asarray(stream))
        tiles = np.concatenate(tiles)  # (n_chunks, R, 128)
        by_step = tiles.reshape(n_chunks, R * LANES)[:, :chunk][:, ::-1]
        by_step = by_step.reshape(-1)  # index s = sample after step d + s
        # Bottom word is at scan col c after step c + n_words - 1.
        scores_cells = np.full(tlen_eff, _BIG, np.int64)
        c0 = max(w_pad, d - (n_words - 1))  # cols before d are pre-tail (> k)
        steps0 = c0 + n_words - 1 - d
        n_c = t_scan - c0
        scores_cells[c0 - w_pad:] = by_step[steps0:steps0 + n_c][
            :tlen_eff - (c0 - w_pad)]
        best, positions = _filter_locations(scores_cells, qlen, k)
        return (best, positions) if best >= 0 else None

    def shw_locations(self, q_ids: np.ndarray, t_ids: np.ndarray,
                      sigma: int, k: int = -1, eq=None):
        """SHW (best, [all minimal end positions]); (-1, []) when k >= 0
        and the best exceeds k.  Dynamic-k doubling when k < 0."""
        qlen = len(q_ids)
        cap = max(1, min(qlen, self._hamming_cap(q_ids, t_ids, eq)))
        if k < 0:
            kk = 64
            while True:
                r = self.shw_locations_bounded(q_ids, t_ids, sigma,
                                               min(kk, cap), eq=eq)
                if r is not None:
                    return r
                if kk >= cap:
                    raise RuntimeError("unreachable: SHW best <= cap")
                kk *= 2
        r = self.shw_locations_bounded(q_ids, t_ids, sigma, k, eq=eq)
        return (-1, []) if r is None else r

    @staticmethod
    def _hamming_cap(q_ids, t_ids, eq) -> int:
        """encode.nw_upper_bound, also valid for semiglobal ladders
        (semiglobal best <= d_NW); at Mbp scale each spared doubling
        round is ~hundreds of kernel dispatches."""
        return encode.nw_upper_bound(q_ids, t_ids, eq)

    def nw_distance(self, q_ids: np.ndarray, t_ids: np.ndarray,
                    sigma: int, k: int = -1, eq=None) -> int:
        qlen, tlen = len(q_ids), len(t_ids)
        bound = max(1, min(max(qlen, tlen),
                           self._hamming_cap(q_ids, t_ids, eq)))
        if k < 0:
            kk = 64
            while True:
                d = self.distance_bounded(q_ids, t_ids, sigma,
                                          min(kk, bound), eq=eq)
                if d is not None:
                    return d
                if kk >= bound:
                    raise RuntimeError("unreachable: NW <= hamming cap")
                kk *= 2
        d = self.distance_bounded(q_ids, t_ids, sigma, min(k, bound), eq=eq)
        return -1 if d is None else d

    def shw_best(self, q_ids: np.ndarray, t_ids: np.ndarray, sigma: int,
                 k: int = -1, eq=None) -> Tuple[int, int]:
        """SHW (best score, first best end position); (-1, -1) when k >= 0
        and the best exceeds k.  Dynamic-k doubling when k < 0 (the bottom
        row always holds a value <= qlen, so the loop terminates)."""
        qlen = len(q_ids)
        cap = max(1, min(qlen, self._hamming_cap(q_ids, t_ids, eq)))
        if k < 0:
            kk = 64
            while True:
                r = self.shw_best_bounded(q_ids, t_ids, sigma,
                                          min(kk, cap), eq=eq)
                if r is not None:
                    return r
                if kk >= cap:
                    raise RuntimeError("unreachable: SHW best <= cap")
                kk *= 2
        r = self.shw_best_bounded(q_ids, t_ids, sigma, k, eq=eq)
        return (-1, -1) if r is None else r
