"""Pallas TPU kernel for the batched Myers sweep — the hot path.

Replaces the XLA ``lax.scan`` engine (ops/jax_engine.py) on TPU, where
per-step while-loop overhead dominates the tiny per-column work.  Design:

* **Batch tile = one VPU tile.**  1024 alignments = (8, 128) lanes; every
  bitwise op of the Myers block update (C6, edlib.cpp:412-447) advances all
  1024 alignments at once.  uint32 words (32 DP cells per lane) — ~20 VPU
  ops per word-column ⇒ ~1.6 cell/op ⇒ multi-TCUPS/chip headroom.
* **Grid = (batch_tiles, target_chunks).**  TPU grid steps run sequentially;
  the DP state (Pv, Mv, score) lives in VMEM scratch and persists across the
  target-chunk axis (reset when a new batch tile starts).  Pallas pipelines
  the target-chunk input blocks (HBM→VMEM) and score output blocks
  automatically — compute overlaps DMA.
* **Query profiles resident in VMEM.**  Peq laid out (S1, NW, 8, 128); the
  per-column Eq lookup is an S1-way select against the symbol tile (TPU has
  no per-lane gather; for S1 beyond ~32 the XLA engine is used instead).
* The inter-word carry is the hin/hout chain, unrolled over NW (static).

Same observable semantics as the other engines: emits the padded-bottom
score stream; wildcard-extended targets make it cover every end position
(see ops/jax_engine.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edlib_tpu.utils.jaxcache import ensure_compile_cache

ensure_compile_cache()

LANES = 128
SUBLANES = 8
B_TILE = SUBLANES * LANES  # 1024 alignments per kernel tile
MAX_SIGMA_PALLAS = 32      # legacy blanket cap; prefer max_sigma1()

# A v4/v5 core has 128MiB of VMEM but Mosaic enforces a 16MiB *scoped*
# limit by default, which long-query kernels overflow (nw=256 words of Peq
# is 10.5MiB double-buffered — an 8kbp batch with banding off died at
# 16.53M).  Raise the cap for every kernel — but only as far as the
# attached generation physically has: v2/v3 cores carry 16MiB of VMEM, so
# admitting 96MiB there would turn a clean host-path routing decision into
# a Mosaic compile failure at runtime.  Resolved lazily (jax backend init
# must stay behind the bounded device_ready probes) and cached; unknown
# generations get a conservative 32MiB (an 8MiB Peq budget via the /4
# split in max_sigma1).  EDLIB_TPU_VMEM_LIMIT_MB overrides.
_VMEM_BY_GENERATION = {2: 16, 3: 16}  # MiB of physical VMEM per core
_VMEM_DEFAULT_MB = 96                 # v4/v5/v6 (128MiB physical)
_VMEM_UNKNOWN_MB = 32
_vmem_limit_cache = None


def vmem_limit_bytes() -> int:
    """Mosaic scoped-VMEM cap for this process's default device (lazy)."""
    global _vmem_limit_cache
    if _vmem_limit_cache is not None:
        return _vmem_limit_cache
    import os
    import re
    env = os.environ.get("EDLIB_TPU_VMEM_LIMIT_MB")
    if env:
        _vmem_limit_cache = int(env) * 1024 * 1024
        return _vmem_limit_cache
    mb = _VMEM_UNKNOWN_MB
    try:
        dev = jax.devices()[0]
        if dev.platform != "tpu":
            mb = _VMEM_DEFAULT_MB  # interpret/CPU runs: limit is unused
        else:
            m = re.search(r"v(\d+)", getattr(dev, "device_kind", "") or "")
            if m:
                mb = _VMEM_BY_GENERATION.get(int(m.group(1)),
                                             _VMEM_DEFAULT_MB)
    except Exception:
        pass
    _vmem_limit_cache = mb * 1024 * 1024
    return _vmem_limit_cache


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes())


def max_sigma1(n_words: int, shared: bool) -> int:
    """Largest Peq row count (sigma+1, + NULL where used) the kernels
    accept for this word count.

    Shared-target kernels fetch Eq rows by scalar index (no select
    chain), so their only bound is Peq residency in VMEM — budget a
    quarter of vmem_limit_bytes() for Peq (it is double-buffered, and
    state tiles / target streams / unroll temporaries need the rest):
    full 256-symbol alphabets fit up to ~192 words (6kbp queries) on
    v4/v5 generations.  General per-lane kernels pay an S1-way select
    per word per column; 64 keeps the select cost and Mosaic compile
    time sane (protein + extended alphabets) — beyond that the native
    host path wins regardless.
    """
    vmem_rows = max(1, (vmem_limit_bytes() // 4)
                    // (max(1, n_words) * SUBLANES * LANES * 4))
    return min(257 if shared else 64, vmem_rows)

_ONES = np.uint32(0xFFFFFFFF)


def _advance_word(Pv, Mv, Eq, hin_neg_u, hin_pos_u):
    """Myers block update on (8,128) uint32 tiles.

    hin/hout ride as two uint32 masks (1 where the horizontal delta is -1 /
    +1) — extracting hout from the top bits BEFORE the shift avoids any
    int<->uint round trip in the carry chain (~18 VPU ops per 32 cells).
    Returns (Pv', Mv', hout_neg_u, hout_pos_u).
    """
    Xv = Eq | Mv
    Eq = Eq | hin_neg_u
    Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq
    Ph = Mv | ~(Xh | Pv)
    Mh = Pv & Xh
    hout_pos = Ph >> 31
    hout_neg = Mh >> 31
    Ph = (Ph << 1) | hin_pos_u
    Mh = (Mh << 1) | hin_neg_u
    PvOut = Mh | ~(Xv | Ph)
    MvOut = Ph & Xv
    return PvOut, MvOut, hout_neg, hout_pos


def _sweep_kernel(targets_ref, peq_ref, scores_ref, pv_ref, mv_ref,
                  score_ref, *, n_words: int, sigma1: int, chunk: int,
                  hin0: int):
    """One grid step: advance `chunk` columns for one batch tile.

    targets_ref: (chunk, 8, 128) int32 VMEM (pipelined in)
    peq_ref:     (sigma1, n_words, 8, 128) uint32 VMEM
    scores_ref:  (chunk, 8, 128) int32 VMEM (pipelined out)
    pv/mv_ref:   (n_words, 8, 128) uint32 scratch — persistent state
    score_ref:   (8, 128) int32 scratch
    """
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _reset():
        pv_ref[...] = jnp.full((n_words, SUBLANES, LANES), _ONES, jnp.uint32)
        mv_ref[...] = jnp.zeros((n_words, SUBLANES, LANES), jnp.uint32)
        score_ref[...] = jnp.full((SUBLANES, LANES), n_words * 32, jnp.int32)

    def column(c, carry):
        pvs, mvs, score = carry  # state in registers, not refs
        sym = targets_ref[c]
        hin_neg = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        if hin0 == 0:
            hin_pos = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        else:
            hin_pos = jnp.ones((SUBLANES, LANES), jnp.uint32)
        new_pvs, new_mvs = [], []
        for w in range(n_words):
            # S1-way select: Eq[w] = Peq[sym, w] per lane.
            eq = jnp.zeros((SUBLANES, LANES), jnp.uint32)
            for s in range(sigma1):
                eq = jnp.where(sym == s, peq_ref[s, w], eq)
            pv, mv, hin_neg, hin_pos = _advance_word(
                pvs[w], mvs[w], eq, hin_neg, hin_pos)
            new_pvs.append(pv)
            new_mvs.append(mv)
        score = score + hin_pos.astype(jnp.int32) \
            - hin_neg.astype(jnp.int32)
        scores_ref[c] = score
        return tuple(new_pvs), tuple(new_mvs), score

    carry0 = (tuple(pv_ref[w] for w in range(n_words)),
              tuple(mv_ref[w] for w in range(n_words)), score_ref[...])
    # Mosaic supports only full or no unroll in fori_loop; unroll manually
    # to amortise loop overhead (same trick as the shared kernel).
    unroll = 8 if chunk % 8 == 0 else 1

    def columns(i, carry):
        for j in range(unroll):
            carry = column(i * unroll + j, carry)
        return carry

    pvs, mvs, score = jax.lax.fori_loop(0, chunk // unroll, columns, carry0)
    for w in range(n_words):
        pv_ref[w] = pvs[w]
        mv_ref[w] = mvs[w]
    score_ref[...] = score


@functools.partial(jax.jit,
                   static_argnames=("hin0", "chunk", "interpret"))
def sweep_scores_pallas(peq: jnp.ndarray, targets: jnp.ndarray, hin0: int,
                        chunk: int = 256, interpret: bool = False
                        ) -> jnp.ndarray:
    """Batched Myers sweep on TPU via Pallas.

    peq:     uint32 (n_tiles, S1, NW, 8, 128)
    targets: int32  (n_tiles, n_chunks, chunk, 8, 128)
    Returns int32 (n_tiles, n_chunks, chunk, 8, 128) score streams.
    """
    n_tiles, sigma1, n_words = peq.shape[:3]
    n_chunks = targets.shape[1]

    kernel = functools.partial(_sweep_kernel, n_words=n_words, sigma1=sigma1,
                               chunk=chunk, hin0=hin0)
    grid = (n_tiles, n_chunks)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, n_chunks, chunk, SUBLANES, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(targets, peq)


# ---------------------------------------------------------------------------
# Shared-target kernel with in-kernel reduction — the read-mapping hot path.
#
# All lanes align against the SAME target (reads vs one reference), so the
# per-column symbol is a scalar prefetched to SMEM: the query-profile lookup
# becomes one dynamic VMEM row read instead of an S1-way select, and the
# kernel reduces (best score, first best column) on the fly so only two
# (8,128) tiles per batch tile ever leave the chip — essential both for HBM
# traffic and for tunneled hosts.
# ---------------------------------------------------------------------------


def _shared_kernel(targets_ref, peq_ref, best_ref, pos_ref, pv_ref, mv_ref,
                   score_ref, run_best_ref, run_pos_ref, *, n_words: int,
                   chunk: int, hin0: int, col_lo: int, col_hi: int):
    """targets_ref: (1, chunk) int32 SMEM — shared symbols for this chunk
    (single-row layout: SMEM pads every ROW to a full lane stripe, so a
    (chunk, 1) column layout would cost 128x the SMEM and cap chunk=512).
    peq_ref: (S1, n_words, 8, 128) uint32 VMEM.
    best_ref/pos_ref: (8, 128) int32 outputs (written on the last chunk).
    """
    t_step = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(t_step == 0)
    def _reset():
        pv_ref[...] = jnp.full((n_words, SUBLANES, LANES), _ONES, jnp.uint32)
        mv_ref[...] = jnp.zeros((n_words, SUBLANES, LANES), jnp.uint32)
        score_ref[...] = jnp.full((SUBLANES, LANES), n_words * 32, jnp.int32)
        run_best_ref[...] = jnp.full((SUBLANES, LANES), 0x3FFFFFFF, jnp.int32)
        run_pos_ref[...] = jnp.full((SUBLANES, LANES), -1, jnp.int32)

    def column(c, carry):
        # DP state rides in the fori carry (vector registers), not refs —
        # no VMEM load/store per word per column.
        pvs, mvs, score, run_best, run_pos = carry
        sym = targets_ref[0, c]
        hin_neg = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        if hin0 == 0:
            hin_pos = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        else:
            hin_pos = jnp.ones((SUBLANES, LANES), jnp.uint32)
        new_pvs, new_mvs = [], []
        for w in range(n_words):
            pv, mv, hin_neg, hin_pos = _advance_word(
                pvs[w], mvs[w], peq_ref[sym, w], hin_neg, hin_pos)
            new_pvs.append(pv)
            new_mvs.append(mv)
        score = score + hin_pos.astype(jnp.int32) \
            - hin_neg.astype(jnp.int32)
        # Only columns mapping to real end positions participate in the
        # reduction: col in [W, W + tlen) (warm-up columns decode negative
        # positions; trailing wildcard filler drains upper cells down).
        col = t_step * chunk + c
        upd = (score < run_best) & (col >= col_lo) & (col < col_hi)
        run_best = jnp.where(upd, score, run_best)
        run_pos = jnp.where(upd, col, run_pos)
        return tuple(new_pvs), tuple(new_mvs), score, run_best, run_pos

    carry0 = (tuple(pv_ref[w] for w in range(n_words)),
              tuple(mv_ref[w] for w in range(n_words)),
              score_ref[...], run_best_ref[...], run_pos_ref[...])

    # Mosaic supports only full or no unroll in fori_loop; unroll sixteen
    # columns manually to amortise loop overhead (chunk % 16 == 0; 32 was
    # measured at parity with a much slower compile).
    def sixteen_columns(i, carry):
        for j in range(16):
            carry = column(i * 16 + j, carry)
        return carry

    pvs, mvs, score, run_best, run_pos = jax.lax.fori_loop(
        0, chunk // 16, sixteen_columns, carry0)
    for w in range(n_words):
        pv_ref[w] = pvs[w]
        mv_ref[w] = mvs[w]
    score_ref[...] = score
    run_best_ref[...] = run_best
    run_pos_ref[...] = run_pos

    @pl.when(t_step == n_chunks - 1)
    def _emit():
        best_ref[...] = run_best_ref[...]
        pos_ref[...] = run_pos_ref[...]


@functools.partial(jax.jit, static_argnames=("hin0", "chunk", "col_lo",
                                              "col_hi", "interpret"))
def sweep_best_pallas_shared(peq: jnp.ndarray, target_chunks: jnp.ndarray,
                             hin0: int, col_lo: int, col_hi: int,
                             chunk: int = 256,
                             interpret: bool = False):
    """Shared-target sweep returning (best, first-best column) per lane.

    peq: uint32 (n_tiles, S1, NW, 8, 128); target_chunks: int32
    (n_chunks, 1, chunk) — the shared wildcard-extended target.
    Returns (best (n_tiles, 8, 128) int32, pos (n_tiles, 8, 128) int32);
    pos is a scan-column index (caller subtracts W for positions; -1 when
    nothing was seen, impossible for nonempty targets).
    """
    n_tiles, sigma1, n_words = peq.shape[:3]
    n_chunks = target_chunks.shape[0]
    kernel = functools.partial(_shared_kernel, n_words=n_words, chunk=chunk,
                               hin0=hin0, col_lo=col_lo, col_hi=col_hi)
    grid = (n_tiles, n_chunks)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 1, chunk), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(target_chunks, peq)


# ---------------------------------------------------------------------------
# Two-phase batched engines (round 2): the 20x gap between the general
# streaming kernel (~260 GCUPS) and the shared reduction kernel (~5100) is
# the per-column (chunk, 8, 128) HBM score stores, not the compute.  The
# reference closes its equivalent gap with Ukkonen banding + k-tightening
# (edlib.cpp:601-642, 796-870) — pruning that cuts work AND output; here the
# same effect comes from keeping the DP state and the *answers* in registers:
#
#   phase 1 (reduce): carry (best, first-pos, last-pos, final-col score) in
#     vector registers; only four (8,128) tiles leave the chip per batch
#     tile.  Covers NW distance, HW/SHW best score, and the reversed-SHW
#     start-location rule (last minimal position) in ONE pass.
#   phase 2 (hits): given per-lane best from phase 1, emit a packed uint32
#     bitmask of columns whose score equals it — 32x less HBM/transfer than
#     the int32 stream — only when the all-minimal-locations list is needed.
#
# Both phases come in general (per-lane target, S1-way select) and shared
# (scalar symbol from SMEM) variants from one kernel factory.
# ---------------------------------------------------------------------------

_BIG = 0x3FFFFFFF


def _fetch_eq(peq_ref, sym, w, sigma1, shared):
    """Eq tile for word w: dynamic row read (shared) or S1-way select."""
    if shared:
        return peq_ref[sym, w]
    eq = jnp.zeros((SUBLANES, LANES), jnp.uint32)
    for s in range(sigma1):
        eq = jnp.where(sym == s, peq_ref[s, w], eq)
    return eq


def _bitplane_tb(sym, nb: int):
    """Per-column bit-broadcast masks: tb[b] = 0xFFFFFFFF iff bit b of the
    lane's target symbol is set (uint32 (8,128) each)."""
    symu = sym.astype(jnp.uint32)
    return [jnp.uint32(0) - ((symu >> jnp.uint32(b)) & jnp.uint32(1))
            for b in range(nb)]


def _bitplane_eq(planes_ref, pad_w, tb, wild, w: int, n_words: int,
                 nb: int, n_alts: int):
    """Eq word w from VMEM-resident query-id bit planes: XNOR-AND trick.

    Row i matches symbol s iff every bit of alt_e(i) equals the
    corresponding bit of s for some alternative e, i.e.
        Eq_e[w] = ~ OR_b (planes[e, b, w] ^ tb[b])
    (planes[e, b, w] bit i = bit b of alt_e(32w + i)).  ~16 VPU ops per
    word per alternative — alphabet-size-INDEPENDENT, vs the O(S1) select
    chain and the HBM-bound pre-gathered Eq stream."""
    acc = pad_w | wild
    for e in range(n_alts):
        x = planes_ref[(e * nb) * n_words + w] ^ tb[0]
        for b in range(1, nb):
            x = x | (planes_ref[(e * nb + b) * n_words + w] ^ tb[b])
        acc = acc | ~x
    return acc


def _reduce_kernel(*refs, n_words: int, sigma1: int, chunk: int,
                   hin0: int, shared: bool, unroll: int,
                   resume: bool = False, eq_stream: bool = False,
                   bitplane: int = 0, n_alts: int = 1, wildcard: int = -1):
    """Phase-1 kernel: in-register reduction over the score stream.

    lo/hi_ref: (8,128) int32 per-lane scan-column windows [lo, hi) — lo is
    the lane's wildcard pad W (first real end position), hi = W + tlen.
    Outputs (all (8,128) int32, written on the last chunk):
      best   = min score over the window          (HW/SHW distance)
      pfirst = first column attaining it          (map-style best hit)
      plast  = last column attaining it           (reversed-SHW start rule,
                                                   edlib.cpp:258-260)
      last   = score at column hi-1               (NW distance)

    resume: the DP state starts from (pv0, mv0, s0) input refs instead of
    the fresh-sweep reset, and the final (Pv, Mv, score) is emitted —
    the kernel analogue of jax_engine.sweep_scores_resumable, so
    sequential multi-shard pipelines (ppermute carry hand-off) run this
    same body per segment.
    """
    if resume:
        (targets_ref, peq_ref, lo_ref, hi_ref, pv0_ref, mv0_ref, s0_ref,
         best_ref, pfirst_ref, plast_ref, last_ref,
         pvo_ref, mvo_ref, so_ref,
         pv_ref, mv_ref, score_ref, rb_ref, rpf_ref, rpl_ref,
         rl_ref) = refs
    elif bitplane:
        # Per-lane symbol stream + VMEM-resident query-id bit planes: the
        # Eq rows are computed IN KERNEL via the XNOR-AND trick
        # (_bitplane_eq) — no alphabet cap (C3's sigma <= 256,
        # edlib.cpp:1417-1462), no HBM Eq stream, no select chain.
        (targets_ref, planes_ref, pad_ref, lo_ref, hi_ref,
         best_ref, pfirst_ref, plast_ref, last_ref,
         pv_ref, mv_ref, score_ref, rb_ref, rpf_ref, rpl_ref,
         rl_ref) = refs
        peq_ref = targets_ref
    elif eq_stream:
        # Eq rows arrive precomputed per column (the MXU one-hot gather,
        # see eqstream_gather): no symbol stream, no Peq residency — and
        # therefore no alphabet cap (C3's full sigma <= 256,
        # edlib.cpp:1417-1462).
        (targets_ref, lo_ref, hi_ref,
         best_ref, pfirst_ref, plast_ref, last_ref,
         pv_ref, mv_ref, score_ref, rb_ref, rpf_ref, rpl_ref,
         rl_ref) = refs
        peq_ref = targets_ref
    else:
        (targets_ref, peq_ref, lo_ref, hi_ref,
         best_ref, pfirst_ref, plast_ref, last_ref,
         pv_ref, mv_ref, score_ref, rb_ref, rpf_ref, rpl_ref,
         rl_ref) = refs
    t_step = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(t_step == 0)
    def _reset():
        if resume:
            pv_ref[...] = pv0_ref[...]
            mv_ref[...] = mv0_ref[...]
            score_ref[...] = s0_ref[...]
        else:
            pv_ref[...] = jnp.full((n_words, SUBLANES, LANES), _ONES,
                                   jnp.uint32)
            mv_ref[...] = jnp.zeros((n_words, SUBLANES, LANES), jnp.uint32)
            score_ref[...] = jnp.full((SUBLANES, LANES), n_words * 32,
                                      jnp.int32)
        rb_ref[...] = jnp.full((SUBLANES, LANES), _BIG, jnp.int32)
        rpf_ref[...] = jnp.full((SUBLANES, LANES), -1, jnp.int32)
        rpl_ref[...] = jnp.full((SUBLANES, LANES), -1, jnp.int32)
        rl_ref[...] = jnp.full((SUBLANES, LANES), _BIG, jnp.int32)

    lo = lo_ref[...]
    hi = hi_ref[...]

    def column(c, carry):
        pvs, mvs, score, rb, rpf, rpl, rl = carry
        if eq_stream:
            sym = None
        else:
            sym = targets_ref[0, c] if shared else targets_ref[c]
        if bitplane:
            tb = _bitplane_tb(sym, bitplane)
            wild = jnp.where(sym == wildcard, _ONES, jnp.uint32(0))
        hin_neg = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        if hin0 == 0:
            hin_pos = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        else:
            hin_pos = jnp.ones((SUBLANES, LANES), jnp.uint32)
        new_pvs, new_mvs = [], []
        for w in range(n_words):
            if bitplane:
                eq = _bitplane_eq(planes_ref, pad_ref[w], tb, wild, w,
                                  n_words, bitplane, n_alts)
            elif eq_stream:
                eq = targets_ref[c * n_words + w]
            else:
                eq = _fetch_eq(peq_ref, sym, w, sigma1, shared)
            pv, mv, hin_neg, hin_pos = _advance_word(
                pvs[w], mvs[w], eq, hin_neg, hin_pos)
            new_pvs.append(pv)
            new_mvs.append(mv)
        score = score + hin_pos.astype(jnp.int32) \
            - hin_neg.astype(jnp.int32)
        col = t_step * chunk + c
        in_win = (col >= lo) & (col < hi)
        upd = (score < rb) & in_win
        rpf = jnp.where(upd, col, rpf)
        rpl = jnp.where((score <= rb) & in_win, col, rpl)
        rb = jnp.where(upd, score, rb)
        rl = jnp.where(col == hi - 1, score, rl)
        return tuple(new_pvs), tuple(new_mvs), score, rb, rpf, rpl, rl

    carry0 = (tuple(pv_ref[w] for w in range(n_words)),
              tuple(mv_ref[w] for w in range(n_words)),
              score_ref[...], rb_ref[...], rpf_ref[...], rpl_ref[...],
              rl_ref[...])

    def columns(i, carry):
        for j in range(unroll):
            carry = column(i * unroll + j, carry)
        return carry

    pvs, mvs, score, rb, rpf, rpl, rl = jax.lax.fori_loop(
        0, chunk // unroll, columns, carry0)
    for w in range(n_words):
        pv_ref[w] = pvs[w]
        mv_ref[w] = mvs[w]
    score_ref[...] = score
    rb_ref[...] = rb
    rpf_ref[...] = rpf
    rpl_ref[...] = rpl
    rl_ref[...] = rl

    @pl.when(t_step == n_chunks - 1)
    def _emit():
        best_ref[...] = rb_ref[...]
        pfirst_ref[...] = rpf_ref[...]
        plast_ref[...] = rpl_ref[...]
        last_ref[...] = rl_ref[...]
        if resume:
            pvo_ref[...] = pv_ref[...]
            mvo_ref[...] = mv_ref[...]
            so_ref[...] = score_ref[...]


def _sweep_reduce_call(peq: jnp.ndarray, targets: jnp.ndarray,
                       lo: jnp.ndarray, hi: jnp.ndarray, hin0: int,
                       chunk: int = 256, shared: bool = False,
                       interpret: bool = False):
    """Unjitted body of sweep_reduce_pallas — callable inside shard_map
    (a nested top-level jit carries its own device assignment, which the
    manual mesh context rejects)."""
    n_tiles, sigma1, n_words = peq.shape[:3]
    n_chunks = targets.shape[0] if shared else targets.shape[1]
    if interpret:
        unroll = 1  # unrolled bodies are minutes-slow XLA:CPU compiles
    else:
        unroll = 16 if chunk % 16 == 0 else (8 if chunk % 8 == 0 else 1)
    kernel = functools.partial(_reduce_kernel, n_words=n_words,
                               sigma1=sigma1, chunk=chunk, hin0=hin0,
                               shared=shared, unroll=unroll)
    if shared:
        t_spec = pl.BlockSpec((None, 1, chunk), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.SMEM)
    else:
        t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                              lambda i, j: (i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            t_spec,
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec,
        ],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32)
            for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(targets, peq, lo, hi)


@functools.partial(jax.jit, static_argnames=("hin0", "chunk", "shared",
                                             "interpret"))
def sweep_reduce_pallas(peq: jnp.ndarray, targets: jnp.ndarray,
                        lo: jnp.ndarray, hi: jnp.ndarray, hin0: int,
                        chunk: int = 256, shared: bool = False,
                        interpret: bool = False):
    """Phase-1 sweep: (best, first-pos, last-pos, final-col score) per lane.

    peq: uint32 (n_tiles, S1, NW, 8, 128); lo/hi: int32 (n_tiles, 8, 128).
    targets: int32 (n_tiles, n_chunks, chunk, 8, 128), or, when shared,
    (n_chunks, 1, chunk) — one wildcard-extended target for every lane.
    """
    return _sweep_reduce_call(peq, targets, lo, hi, hin0, chunk=chunk,
                              shared=shared, interpret=interpret)


def _sweep_reduce_resumable_call(peq, targets, lo, hi, pv0, mv0, s0,
                                 hin0: int, chunk: int = 256,
                                 shared: bool = False,
                                 interpret: bool = False):
    """Resumable phase-1 reduce (unjitted, shard_map-safe).

    State tiles: pv0/mv0 uint32 (n_tiles, NW, 8, 128), s0 int32
    (n_tiles, 8, 128).  Returns (best, pfirst, plast, last, pv, mv, s).
    """
    n_tiles, sigma1, n_words = peq.shape[:3]
    n_chunks = targets.shape[0] if shared else targets.shape[1]
    if interpret:
        unroll = 1
    else:
        unroll = 16 if chunk % 16 == 0 else (8 if chunk % 8 == 0 else 1)
    kernel = functools.partial(_reduce_kernel, n_words=n_words,
                               sigma1=sigma1, chunk=chunk, hin0=hin0,
                               shared=shared, unroll=unroll, resume=True)
    if shared:
        t_spec = pl.BlockSpec((None, 1, chunk), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.SMEM)
    else:
        t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                              lambda i, j: (i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((None, n_words, SUBLANES, LANES),
                              lambda i, j: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            t_spec,
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec, state_spec, state_spec, tile_spec,
        ],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec,
                   state_spec, state_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, n_words, SUBLANES, LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, n_words, SUBLANES, LANES),
                                 jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(targets, peq, lo, hi, pv0, mv0, s0)


def reduce_resumable_flat_device(peq, targets, lo, hi, pv0, mv0, s0,
                                 hin0: int, chunk: int = 256,
                                 interpret: bool = False):
    """Flat-layout resumable reduce for mesh pipelines: (B, S1, NW) /
    targets / state (B, NW) uint32 x2 + (B,) int32 in, flat outputs
    (best, pfirst, plast, last) (B,) int32 + state (B, NW) x2 + (B,).
    targets: (B, T) per-lane, or 1-D (T,) — one SHARED target for every
    lane (scalar SMEM symbols, no select chain).  B is padded to kernel
    tiles on device (pad lanes sweep wildcard profiles; reads masked by
    hi).  T must be a multiple of chunk: padding columns would be SWEPT
    into the returned carry and corrupt the next chained segment."""
    B, S1, NW = peq.shape
    shared = targets.ndim == 1
    T = targets.shape[0] if shared else targets.shape[1]
    assert T % chunk == 0, (
        f"resumable segments need T % chunk == 0 (T={T}, chunk={chunk}): "
        "pad columns would corrupt the carry")
    n_tiles = -(-B // B_TILE)
    n_chunks = T // chunk
    Bp = n_tiles * B_TILE
    peq_p = jnp.full((Bp, S1, NW), _ONES, jnp.uint32).at[:B].set(peq)
    peq_t = jnp.transpose(
        peq_p.reshape(n_tiles, SUBLANES, LANES, S1, NW), (0, 3, 4, 1, 2))
    if shared:
        tg_t = targets.astype(jnp.int32).reshape(n_chunks, 1, chunk)
    else:
        tg_p = jnp.zeros((Bp, T), jnp.int32).at[:B].set(targets)
        tg_t = jnp.transpose(
            tg_p.reshape(n_tiles, SUBLANES, LANES, n_chunks, chunk),
            (0, 3, 4, 1, 2))
    lo_t = _pack_lanes_device(lo.astype(jnp.int32), n_tiles, jnp.int32(0))
    hi_t = _pack_lanes_device(hi.astype(jnp.int32), n_tiles, jnp.int32(0))

    def pack_state(st, fill):
        stp = jnp.full((Bp, NW), fill, st.dtype).at[:B].set(st)
        return jnp.transpose(
            stp.reshape(n_tiles, SUBLANES, LANES, NW), (0, 3, 1, 2))

    pv_t = pack_state(pv0, _ONES)
    mv_t = pack_state(mv0, jnp.uint32(0))
    s_t = _pack_lanes_device(s0.astype(jnp.int32), n_tiles,
                             jnp.int32(NW * 32))
    outs = _sweep_reduce_resumable_call(peq_t, tg_t, lo_t, hi_t, pv_t,
                                        mv_t, s_t, hin0=hin0, chunk=chunk,
                                        shared=shared, interpret=interpret)
    flat4 = tuple(o.reshape(-1)[:B] for o in outs[:4])
    pv = jnp.transpose(outs[4], (0, 2, 3, 1)).reshape(Bp, NW)[:B]
    mv = jnp.transpose(outs[5], (0, 2, 3, 1)).reshape(Bp, NW)[:B]
    s = outs[6].reshape(-1)[:B]
    return flat4 + (pv, mv, s)


def _hits_kernel(*refs, n_words: int, sigma1: int,
                 chunk: int, hin0: int, shared: bool,
                 eq_stream: bool = False, bitplane: int = 0,
                 n_alts: int = 1, wildcard: int = -1):
    """Phase-2 kernel: packed bitmask of columns with score == best.

    hits_ref: (chunk//32, 8, 128) uint32 per grid step; bit j of group g =
    hit at scan column t_step*chunk + g*32 + j.
    """
    if bitplane:
        (targets_ref, planes_ref, pad_ref, lo_ref, hi_ref, best_ref,
         hits_ref, pv_ref, mv_ref, score_ref) = refs
        peq_ref = targets_ref
    elif eq_stream:
        (targets_ref, lo_ref, hi_ref, best_ref, hits_ref,
         pv_ref, mv_ref, score_ref) = refs
        peq_ref = targets_ref
    else:
        (targets_ref, peq_ref, lo_ref, hi_ref, best_ref, hits_ref,
         pv_ref, mv_ref, score_ref) = refs
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _reset():
        pv_ref[...] = jnp.full((n_words, SUBLANES, LANES), _ONES, jnp.uint32)
        mv_ref[...] = jnp.zeros((n_words, SUBLANES, LANES), jnp.uint32)
        score_ref[...] = jnp.full((SUBLANES, LANES), n_words * 32, jnp.int32)

    lo = lo_ref[...]
    hi = hi_ref[...]
    best = best_ref[...]

    def column(c, carry):
        pvs, mvs, score, mask = carry
        if eq_stream:
            sym = None
        else:
            sym = targets_ref[0, c] if shared else targets_ref[c]
        if bitplane:
            tb = _bitplane_tb(sym, bitplane)
            wild = jnp.where(sym == wildcard, _ONES, jnp.uint32(0))
        hin_neg = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        if hin0 == 0:
            hin_pos = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        else:
            hin_pos = jnp.ones((SUBLANES, LANES), jnp.uint32)
        new_pvs, new_mvs = [], []
        for w in range(n_words):
            if bitplane:
                eq = _bitplane_eq(planes_ref, pad_ref[w], tb, wild, w,
                                  n_words, bitplane, n_alts)
            elif eq_stream:
                eq = targets_ref[c * n_words + w]
            else:
                eq = _fetch_eq(peq_ref, sym, w, sigma1, shared)
            pv, mv, hin_neg, hin_pos = _advance_word(
                pvs[w], mvs[w], eq, hin_neg, hin_pos)
            new_pvs.append(pv)
            new_mvs.append(mv)
        score = score + hin_pos.astype(jnp.int32) \
            - hin_neg.astype(jnp.int32)
        col = t_step * chunk + c
        hit = ((score == best) & (col >= lo) & (col < hi)) \
            .astype(jnp.uint32)
        mask = mask | (hit << jnp.uint32(c % 32))
        return tuple(new_pvs), tuple(new_mvs), score, mask

    def group(g, carry):
        pvs, mvs, score = carry
        mask = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        inner = (pvs, mvs, score, mask)
        # 32 columns per group: bit positions are static, one VMEM store.
        for j in range(32):
            inner = column(g * 32 + j, inner)
        pvs, mvs, score, mask = inner
        hits_ref[g] = mask
        return pvs, mvs, score

    carry0 = (tuple(pv_ref[w] for w in range(n_words)),
              tuple(mv_ref[w] for w in range(n_words)), score_ref[...])
    pvs, mvs, score = jax.lax.fori_loop(0, chunk // 32, group, carry0)
    for w in range(n_words):
        pv_ref[w] = pvs[w]
        mv_ref[w] = mvs[w]
    score_ref[...] = score


def _sweep_hits_call(peq: jnp.ndarray, targets: jnp.ndarray,
                     lo: jnp.ndarray, hi: jnp.ndarray, best: jnp.ndarray,
                     hin0: int, chunk: int = 256, shared: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """Unjitted body of sweep_hits_pallas (shard_map-safe)."""
    n_tiles, sigma1, n_words = peq.shape[:3]
    n_chunks = targets.shape[0] if shared else targets.shape[1]
    assert chunk % 32 == 0
    kernel = functools.partial(_hits_kernel, n_words=n_words, sigma1=sigma1,
                               chunk=chunk, hin0=hin0, shared=shared)
    if shared:
        t_spec = pl.BlockSpec((None, 1, chunk), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.SMEM)
    else:
        t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                              lambda i, j: (i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            t_spec,
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec, tile_spec,
        ],
        out_specs=pl.BlockSpec((None, None, chunk // 32, SUBLANES, LANES),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, n_chunks, chunk // 32, SUBLANES, LANES), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(targets, peq, lo, hi, best)


@functools.partial(jax.jit, static_argnames=("hin0", "chunk", "shared",
                                             "interpret"))
def sweep_hits_pallas(peq: jnp.ndarray, targets: jnp.ndarray,
                      lo: jnp.ndarray, hi: jnp.ndarray, best: jnp.ndarray,
                      hin0: int, chunk: int = 256, shared: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """Phase-2 sweep: packed per-lane hit bitmasks for score == best.

    Returns uint32 (n_tiles, n_chunks, chunk//32, 8, 128).  chunk % 32 == 0.
    """
    return _sweep_hits_call(peq, targets, lo, hi, best, hin0, chunk=chunk,
                            shared=shared, interpret=interpret)


# ---------------------------------------------------------------------------
# Banded batched NW sweep (round 2).
#
# Ukkonen's static diagonal band, batched: a >=k-cost lower bound puts every
# cell of a <=k-cost corner path on diagonals d = row - col in
# [ceil((D-k)/2), floor((D+k)/2)], D = qlen - tlen (the reference gets the
# same effect dynamically per column, edlib.cpp:796-870).  The wildcard
# row/column padding moves along diagonals, so the bound holds unchanged in
# scan space.  The band becomes a SLIDING WORD WINDOW of static width n_win
# whose per-target-chunk offset is precomputed on host (SMEM data, not trace
# constants: k-doubling at fixed width reuses one compiled kernel).  The
# offset is constant within a chunk, so the kernel loads the window's
# (Pv, Mv) once per chunk with one dynamic slice and carries them in vector
# registers through the column loop — the exact register-resident structure
# of the full reduce kernel, at n_win instead of n_words words per column.
#
# Words that have not yet entered the window sit at the (Pv=~0, Mv=0)
# reset, which IS edlib's band-growth ramp init (edlib.cpp:851-857), so the
# window sliding down needs no re-initialisation; words that leave through
# the top are simply never read again (offsets are nondecreasing).  hin
# into the window top is +1, matching the reference's banded NW.  The
# carried score tracks the window's bottom row (+32 per slid word at chunk
# boundaries); the final-column readout happens only where the window has
# reached the bottom word, and the host treats results > k as "not found
# at this k" (retry with doubled k) — pruning-only semantics, exact
# whenever distance <= k.
# ---------------------------------------------------------------------------

_WIN_ROUND = 4  # window widths round up to this many words (compile reuse)


def _fetch_eq_win(peq_ref, peq_win, off, sym, w, sigma1, shared):
    """Eq tile for window word w.

    shared: dynamic (symbol, word) read STRAIGHT FROM THE REF —
    dynamic_slice on a loaded value is not lowerable by Mosaic (found by
    the CLI byte-diff drive: interpret-mode tests never exercise the
    lowering), but dynamic ref indexing is.  Non-shared: S1-way select
    over the pre-sliced (S1, n_win, 8, 128) window (only the symbol is
    dynamic, so the unrolled column loop stays cheap to compile)."""
    if shared:
        return peq_ref[sym, off + w]
    eq = jnp.zeros((SUBLANES, LANES), jnp.uint32)
    for s in range(sigma1):
        eq = jnp.where(sym == s, peq_win[s, w], eq)
    return eq


def _nw_banded_kernel(woff_ref, targets_ref, peq_ref, hi_ref, out_ref,
                      pv_ref, mv_ref, sb_ref, rl_ref, *, n_words: int,
                      n_win: int, sigma1: int, chunk: int, shared: bool,
                      unroll: int):
    """Banded NW: score at per-lane scan column hi-1, band-pruned.

    woff_ref: (n_chunks,) int32 SMEM — the window's top word for each
    target chunk, nondecreasing, in [0, n_words - n_win].  hi_ref:
    (8,128) int32 per-lane exclusive end scan columns.  out_ref: (8,128).
    """
    t_step = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    off = woff_ref[t_step]

    @pl.when(t_step == 0)
    def _reset():
        pv_ref[...] = jnp.full((n_words, SUBLANES, LANES), _ONES, jnp.uint32)
        mv_ref[...] = jnp.zeros((n_words, SUBLANES, LANES), jnp.uint32)
        sb_ref[...] = jnp.full((SUBLANES, LANES), (off + n_win) * 32,
                               jnp.int32)
        rl_ref[...] = jnp.full((SUBLANES, LANES), _BIG, jnp.int32)

    @pl.when(t_step > 0)
    def _slide():
        prev = woff_ref[jnp.maximum(t_step - 1, 0)]
        sb_ref[...] = sb_ref[...] + (off - prev) * 32

    hi = hi_ref[...]
    at_bottom = off == n_words - n_win

    pv_blk = pv_ref[pl.ds(off, n_win)]
    mv_blk = mv_ref[pl.ds(off, n_win)]
    peq_win = peq_ref[:, pl.ds(off, n_win)]

    def column(c, carry):
        pvs, mvs, sb, rl = carry
        sym = targets_ref[0, c] if shared else targets_ref[c]
        hn = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        hp = jnp.ones((SUBLANES, LANES), jnp.uint32)  # NW/band-top boundary
        new_pvs, new_mvs = [], []
        for w in range(n_win):
            eq = _fetch_eq_win(peq_ref, peq_win, off, sym, w,
                                   sigma1, shared)
            pv, mv, hn, hp = _advance_word(pvs[w], mvs[w], eq, hn, hp)
            new_pvs.append(pv)
            new_mvs.append(mv)
        sb = sb + hp.astype(jnp.int32) - hn.astype(jnp.int32)
        col = t_step * chunk + c
        rl = jnp.where(at_bottom & (col == hi - 1), sb, rl)
        return tuple(new_pvs), tuple(new_mvs), sb, rl

    carry0 = (tuple(pv_blk[w] for w in range(n_win)),
              tuple(mv_blk[w] for w in range(n_win)),
              sb_ref[...], rl_ref[...])

    def columns(i, carry):
        for j in range(unroll):
            carry = column(i * unroll + j, carry)
        return carry

    pvs, mvs, sb, rl = jax.lax.fori_loop(0, chunk // unroll, columns, carry0)
    pv_ref[pl.ds(off, n_win)] = jnp.stack(list(pvs))
    mv_ref[pl.ds(off, n_win)] = jnp.stack(list(mvs))
    sb_ref[...] = sb
    rl_ref[...] = rl

    @pl.when(t_step == n_chunks - 1)
    def _emit():
        out_ref[...] = rl_ref[...]


@functools.partial(jax.jit, static_argnames=("n_win", "chunk", "shared",
                                             "interpret"))
def sweep_nw_banded_pallas(peq: jnp.ndarray, targets: jnp.ndarray,
                           woff: jnp.ndarray, hi: jnp.ndarray, n_win: int,
                           chunk: int = 256, shared: bool = False,
                           interpret: bool = False):
    """Banded batched NW distances: int32 (n_tiles, 8, 128) scan scores.

    peq: uint32 (n_tiles, S1, NW, 8, 128); woff: int32 (n_chunks,) window
    offsets; hi: int32 (n_tiles, 8, 128); n_win: static window width in
    words.  Results are exact where <= the banding k, else garbage > k.
    """
    n_tiles, sigma1, n_words = peq.shape[:3]
    assert 0 < n_win <= n_words
    n_chunks = targets.shape[0] if shared else targets.shape[1]
    # Column unrolling is a Mosaic-throughput lever only; under the
    # interpreter it just multiplies XLA:CPU compile time (trace size is
    # unroll * n_win advance bodies), so keep the loop rolled there.
    if interpret:
        unroll = 1
    else:
        unroll = 16 if chunk % 16 == 0 else (8 if chunk % 8 == 0 else 1)
    kernel = functools.partial(_nw_banded_kernel, n_words=n_words,
                               n_win=n_win, sigma1=sigma1, chunk=chunk,
                               shared=shared, unroll=unroll)
    if shared:
        t_spec = pl.BlockSpec((None, 1, chunk), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.SMEM)
    else:
        t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                              lambda i, j: (i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            t_spec,
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(woff, targets, peq, hi)


def _shw_banded_kernel(woff_ref, targets_ref, peq_ref, lo_ref, hi_ref,
                       best_ref, pfirst_ref, plast_ref,
                       pv_ref, mv_ref, sb_ref, rb_ref, rpf_ref, rpl_ref, *,
                       n_words: int, n_win: int, sigma1: int, chunk: int,
                       shared: bool, unroll: int):
    """Banded SHW reduce: (best, first-pos, last-pos) over the bottom row,
    band-pruned with the same sliding word window as the banded NW kernel.

    SHW cells are prefix-vs-prefix global distances (reference SHW shares
    NW's boundary conditions, edlib.cpp:154-160), so every cell of value
    <= k lies on scan diagonals row - col in [-k, k] — and, because scan
    columns carry no per-lane W shift, that range is LANE-INDEPENDENT:
    real cell (i, j) sits at scan (i, j) with |i - j| <= k, and the
    wildcard drain from (qlen-1, j) to the padded bottom row rides the
    constant diagonal qlen-1-j in [-k, k].  The band-top hin = +1 is
    exactly SHW's row boundary at word 0 and the pessimistic band
    boundary elsewhere, so values are overestimates everywhere and exact
    wherever the true value is <= k: min/argmin over the window read
    columns is exact whenever the true best is <= k (pruning-only,
    k-ladder on host).  Reads only count where the window has reached the
    bottom word — the schedule guarantees it has at every k-feasible read
    column (w_hi = n_words there by the drain-diagonal bound).
    """
    t_step = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    off = woff_ref[t_step]

    @pl.when(t_step == 0)
    def _reset():
        pv_ref[...] = jnp.full((n_words, SUBLANES, LANES), _ONES, jnp.uint32)
        mv_ref[...] = jnp.zeros((n_words, SUBLANES, LANES), jnp.uint32)
        sb_ref[...] = jnp.full((SUBLANES, LANES), (off + n_win) * 32,
                               jnp.int32)
        rb_ref[...] = jnp.full((SUBLANES, LANES), _BIG, jnp.int32)
        rpf_ref[...] = jnp.full((SUBLANES, LANES), -1, jnp.int32)
        rpl_ref[...] = jnp.full((SUBLANES, LANES), -1, jnp.int32)

    @pl.when(t_step > 0)
    def _slide():
        prev = woff_ref[jnp.maximum(t_step - 1, 0)]
        sb_ref[...] = sb_ref[...] + (off - prev) * 32

    lo = lo_ref[...]
    hi = hi_ref[...]
    at_bottom = off == n_words - n_win

    pv_blk = pv_ref[pl.ds(off, n_win)]
    mv_blk = mv_ref[pl.ds(off, n_win)]
    peq_win = peq_ref[:, pl.ds(off, n_win)]

    def column(c, carry):
        pvs, mvs, sb, rb, rpf, rpl = carry
        sym = targets_ref[0, c] if shared else targets_ref[c]
        hn = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        hp = jnp.ones((SUBLANES, LANES), jnp.uint32)  # SHW/band-top boundary
        new_pvs, new_mvs = [], []
        for w in range(n_win):
            eq = _fetch_eq_win(peq_ref, peq_win, off, sym, w,
                                   sigma1, shared)
            pv, mv, hn, hp = _advance_word(pvs[w], mvs[w], eq, hn, hp)
            new_pvs.append(pv)
            new_mvs.append(mv)
        sb = sb + hp.astype(jnp.int32) - hn.astype(jnp.int32)
        col = t_step * chunk + c
        in_win = at_bottom & (col >= lo) & (col < hi)
        upd = (sb < rb) & in_win
        rpf = jnp.where(upd, col, rpf)
        rpl = jnp.where((sb <= rb) & in_win, col, rpl)
        rb = jnp.where(upd, sb, rb)
        return tuple(new_pvs), tuple(new_mvs), sb, rb, rpf, rpl

    carry0 = (tuple(pv_blk[w] for w in range(n_win)),
              tuple(mv_blk[w] for w in range(n_win)),
              sb_ref[...], rb_ref[...], rpf_ref[...], rpl_ref[...])

    def columns(i, carry):
        for j in range(unroll):
            carry = column(i * unroll + j, carry)
        return carry

    pvs, mvs, sb, rb, rpf, rpl = jax.lax.fori_loop(0, chunk // unroll,
                                                   columns, carry0)
    pv_ref[pl.ds(off, n_win)] = jnp.stack(list(pvs))
    mv_ref[pl.ds(off, n_win)] = jnp.stack(list(mvs))
    sb_ref[...] = sb
    rb_ref[...] = rb
    rpf_ref[...] = rpf
    rpl_ref[...] = rpl

    @pl.when(t_step == n_chunks - 1)
    def _emit():
        best_ref[...] = rb_ref[...]
        pfirst_ref[...] = rpf_ref[...]
        plast_ref[...] = rpl_ref[...]


@functools.partial(jax.jit, static_argnames=("n_win", "chunk", "shared",
                                             "interpret"))
def sweep_shw_banded_pallas(peq: jnp.ndarray, targets: jnp.ndarray,
                            woff: jnp.ndarray, lo: jnp.ndarray,
                            hi: jnp.ndarray, n_win: int, chunk: int = 256,
                            shared: bool = False, interpret: bool = False):
    """Banded batched SHW reduce: (best, pfirst, plast) each
    int32 (n_tiles, 8, 128) in scan-column space; exact wherever the true
    best is <= the banding k, else garbage > k (host retries)."""
    n_tiles, sigma1, n_words = peq.shape[:3]
    assert 0 < n_win <= n_words
    n_chunks = targets.shape[0] if shared else targets.shape[1]
    if interpret:
        unroll = 1
    else:
        unroll = 16 if chunk % 16 == 0 else (8 if chunk % 8 == 0 else 1)
    kernel = functools.partial(_shw_banded_kernel, n_words=n_words,
                               n_win=n_win, sigma1=sigma1, chunk=chunk,
                               shared=shared, unroll=unroll)
    if shared:
        t_spec = pl.BlockSpec((None, 1, chunk), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.SMEM)
    else:
        t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                              lambda i, j: (i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            t_spec,
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec,
        ],
        out_specs=(tile_spec, tile_spec, tile_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32)
            for _ in range(3)),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(woff, targets, peq, lo, hi)


def _shw_banded_hits_kernel(woff_ref, targets_ref, peq_ref, lo_ref, hi_ref,
                            best_ref, hits_ref, pv_ref, mv_ref, sb_ref, *,
                            n_words: int, n_win: int, sigma1: int,
                            chunk: int, shared: bool, unroll32: bool):
    """Banded phase-2: packed bitmask of window-read columns with
    score == best (the banded analogue of _hits_kernel; exact for lanes
    whose best is <= the banding k, by the _shw_banded_kernel argument).

    unroll32: statically unroll each 32-column bit group (Mosaic — static
    bit positions); False keeps the loop rolled with a dynamic shift,
    which the interpreter needs (32 x n_win unrolled advance bodies are
    minutes-slow XLA:CPU compiles)."""
    t_step = pl.program_id(1)
    off = woff_ref[t_step]

    @pl.when(t_step == 0)
    def _reset():
        pv_ref[...] = jnp.full((n_words, SUBLANES, LANES), _ONES, jnp.uint32)
        mv_ref[...] = jnp.zeros((n_words, SUBLANES, LANES), jnp.uint32)
        sb_ref[...] = jnp.full((SUBLANES, LANES), (off + n_win) * 32,
                               jnp.int32)

    @pl.when(t_step > 0)
    def _slide():
        prev = woff_ref[jnp.maximum(t_step - 1, 0)]
        sb_ref[...] = sb_ref[...] + (off - prev) * 32

    lo = lo_ref[...]
    hi = hi_ref[...]
    best = best_ref[...]
    at_bottom = off == n_words - n_win

    pv_blk = pv_ref[pl.ds(off, n_win)]
    mv_blk = mv_ref[pl.ds(off, n_win)]
    peq_win = peq_ref[:, pl.ds(off, n_win)]

    def column(c, bit, carry):
        pvs, mvs, sb, mask = carry
        sym = targets_ref[0, c] if shared else targets_ref[c]
        hn = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        hp = jnp.ones((SUBLANES, LANES), jnp.uint32)
        new_pvs, new_mvs = [], []
        for w in range(n_win):
            eq = _fetch_eq_win(peq_ref, peq_win, off, sym, w,
                                   sigma1, shared)
            pv, mv, hn, hp = _advance_word(pvs[w], mvs[w], eq, hn, hp)
            new_pvs.append(pv)
            new_mvs.append(mv)
        sb = sb + hp.astype(jnp.int32) - hn.astype(jnp.int32)
        col = t_step * chunk + c
        hit = ((sb == best) & at_bottom & (col >= lo) & (col < hi)) \
            .astype(jnp.uint32)
        mask = mask | (hit << bit)
        return tuple(new_pvs), tuple(new_mvs), sb, mask

    def group(g, carry):
        pvs, mvs, sb = carry
        mask = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        inner = (pvs, mvs, sb, mask)
        if unroll32:
            for j in range(32):  # static bit positions, one VMEM store
                inner = column(g * 32 + j, jnp.uint32(j), inner)
        else:
            inner = jax.lax.fori_loop(
                0, 32,
                lambda j, car: column(g * 32 + j, j.astype(jnp.uint32),
                                      car),
                inner)
        pvs, mvs, sb, mask = inner
        hits_ref[g] = mask
        return pvs, mvs, sb

    carry0 = (tuple(pv_blk[w] for w in range(n_win)),
              tuple(mv_blk[w] for w in range(n_win)), sb_ref[...])
    pvs, mvs, sb = jax.lax.fori_loop(0, chunk // 32, group, carry0)
    pv_ref[pl.ds(off, n_win)] = jnp.stack(list(pvs))
    mv_ref[pl.ds(off, n_win)] = jnp.stack(list(mvs))
    sb_ref[...] = sb


@functools.partial(jax.jit, static_argnames=("n_win", "chunk", "shared",
                                             "interpret"))
def sweep_shw_banded_hits_pallas(peq: jnp.ndarray, targets: jnp.ndarray,
                                 woff: jnp.ndarray, lo: jnp.ndarray,
                                 hi: jnp.ndarray, best: jnp.ndarray,
                                 n_win: int, chunk: int = 256,
                                 shared: bool = False,
                                 interpret: bool = False) -> jnp.ndarray:
    """Banded packed hit bitmasks: uint32
    (n_tiles, n_chunks, chunk//32, 8, 128); chunk % 32 == 0."""
    n_tiles, sigma1, n_words = peq.shape[:3]
    assert 0 < n_win <= n_words and chunk % 32 == 0
    n_chunks = targets.shape[0] if shared else targets.shape[1]
    kernel = functools.partial(_shw_banded_hits_kernel, n_words=n_words,
                               n_win=n_win, sigma1=sigma1, chunk=chunk,
                               shared=shared, unroll32=not interpret)
    if shared:
        t_spec = pl.BlockSpec((None, 1, chunk), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.SMEM)
    else:
        t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                              lambda i, j: (i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            t_spec,
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec, tile_spec,
        ],
        out_specs=pl.BlockSpec((None, None, chunk // 32, SUBLANES, LANES),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, n_chunks, chunk // 32, SUBLANES, LANES), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(woff, targets, peq, lo, hi, best)


# ---------------------------------------------------------------------------
# Value-adaptive banded semiglobal reduce (round 4).
#
# Static diagonal bands cannot prune HW read mapping (every column is a
# candidate start, so no scan diagonal is dead a priori); the reference's
# entire HW speed story is the *value*-adaptive Ukkonen band: drop the
# bottom blocks while their cells provably exceed k, regrow them just in
# time, and tighten k to the best score seen (edlib.cpp:601-642, 657-674).
# This kernel is that machinery rebuilt for a 1024-lane VPU tile.
#
# MEASURED OUTCOME (v5e, bench workload 4096x120bp vs 64kbp shared target):
# exact at every k, but 0.67x the unbanded shared kernel, and the runtime
# is IDENTICAL at k=8 and k=32 — the shared band never shrinks.  The band
# is one window for the whole tile (lanes are lockstep), and with ~1024
# uncorrelated reads a few lanes are always within ~100 columns of their
# match dip, so min-over-lanes keeps every word alive.  Tile-shared
# value-adaptive banding is structurally unprofitable for uniform batched
# mapping; it wins only when lanes' low-score regions are correlated
# (shared-window batches, single-pair column streaming).  The shipped
# batched pruning path is instead the exact MXU q-gram prefilter
# (ops/qfilter.py) + windowed verification; this kernel is kept for the
# correlated cases and for its dynamic-k SMEM ladder machinery:
#
# * The live band is a word window [0, w_hi) shared by the whole tile
#   (lanes run in lockstep; per-lane bands would serialize the VPU).  w_hi
#   lives in SMEM scratch and persists across target chunks.
# * Adaptation happens every G columns: values move at most +-1 per
#   column, so every reference rule holds with a G-column slack —
#     shrink word w when  min_lanes(bottom_w - keff) >= 32 + G
#       (cheap rule: all 32 cells then exceed keff for the whole group;
#        reference: score >= k + WORD_SIZE, edlib.cpp:613-616),
#     grow past the last live word while min_lanes(bottom - keff) <= G
#       (reference: left-block bottom <= k, edlib.cpp:603-611; ramp
#        bottoms +32 per extra word),
#     and rejoining words reset to the (Pv=~0, Mv=0) ramp — the same
#     upper-bound init as the reference's regrown block.
# * keff = min(k, best-so-far) per lane: in-sweep k-tightening.  k itself
#   is a dynamic SMEM scalar, so ONE compiled kernel serves the whole
#   host-side k-doubling ladder (results are exact for lanes whose true
#   best <= k; others emit overestimates > k and the host retries).
# * The group body is a lax.switch over static live-width CLASSES: Mosaic
#   needs static shapes, so w_hi is rounded up to the next class and each
#   branch advances exactly that many words (dead words pass through in
#   registers).  A scalar branch skips the dead words' vector work — the
#   pruning is real, not masked.
# * Every strong_period columns a strong reduce (reference
#   STRONG_REDUCE_NUM, edlib.cpp:619-623) decodes exact per-word minimum
#   cell values from the Pv/Mv bit deltas (suffix-max scan over unpacked
#   bit planes) and re-evaluates the keep rule without the 32+G slack —
#   this is what collapses the steady-state band to one word on mapping
#   workloads.
#
# Per-word bottom scores ride as carried (8,128) tiles (sw[w] += hout
# after word w — two extra VPU ops per live word-column); the bottom
# word's sw IS the emitted score stream, reduced to (best, first, last)
# exactly like _reduce_kernel.
# ---------------------------------------------------------------------------


def adaptive_classes(n_words: int):
    """Static live-width classes for the adaptive kernel (ascending,
    always ending at n_words).  Fine-grained at the bottom — mapping
    workloads spend their steady state at 1-2 live words — and coarse
    above to bound trace size (sum(classes) ~ 2.5 * n_words)."""
    if n_words <= 4:
        return list(range(1, n_words + 1))
    cs = [1, 2, 4]
    step = max(2, n_words // 4)
    w = 4 + step
    while w < n_words:
        cs.append(w)
        w += step
    cs.append(n_words)
    return sorted(set(c for c in cs if c <= n_words))


def _min_cells_exact(pv, mv, bottom):
    """Exact per-lane minimum cell value of one word from its bit deltas.

    cell(r) = bottom - sum_{i>r} delta(i), delta(i) = Pv bit i - Mv bit i
    (bit 0 = top row), so min_r cell(r) = bottom - max suffix-sum of the
    deltas (empty suffix included: min <= bottom).  ~130 VPU ops — run
    only inside the strong-reduce cond, every strong_period columns.
    """
    total = jnp.zeros(bottom.shape, jnp.int32)
    best = jnp.zeros(bottom.shape, jnp.int32)
    one = jnp.uint32(1)
    for i in range(31, -1, -1):
        d = ((pv >> jnp.uint32(i)) & one).astype(jnp.int32) \
            - ((mv >> jnp.uint32(i)) & one).astype(jnp.int32)
        total = total + d
        best = jnp.maximum(best, total)
    return bottom - best


def _hw_adaptive_kernel(k_ref, woff_dummy_ref, targets_ref, peq_ref, lo_ref,
                        hi_ref, best_ref, pfirst_ref, plast_ref,
                        pv_ref, mv_ref, sw_ref, rb_ref, rpf_ref, rpl_ref,
                        whi_ref, *, n_words: int, sigma1: int, chunk: int,
                        group: int, classes, hin0: int, shared: bool,
                        strong_every: int, interpret: bool):
    """Value-adaptive banded semiglobal reduce (see section comment).

    k_ref: (1,) int32 SMEM — the ladder k (dynamic; one compile per shape).
    woff_dummy_ref: unused placeholder keeping the arg layout uniform.
    Outputs (best, pfirst, plast) like _shw_banded_kernel.
    """
    del woff_dummy_ref
    t_step = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    n_classes = len(classes)
    k = k_ref[0]

    @pl.when(t_step == 0)
    def _reset():
        pv_ref[...] = jnp.full((n_words, SUBLANES, LANES), _ONES, jnp.uint32)
        mv_ref[...] = jnp.zeros((n_words, SUBLANES, LANES), jnp.uint32)
        for wdx in range(n_words):
            sw_ref[wdx] = jnp.full((SUBLANES, LANES), 32 * (wdx + 1),
                                   jnp.int32)
        rb_ref[...] = jnp.full((SUBLANES, LANES), _BIG, jnp.int32)
        rpf_ref[...] = jnp.full((SUBLANES, LANES), -1, jnp.int32)
        rpl_ref[...] = jnp.full((SUBLANES, LANES), -1, jnp.int32)
        # Initial band: ceil((k+1)/32) words (edlib.cpp:562), rounded up
        # to a class.
        raw = jnp.clip((k + 32) // 32, 1, n_words)
        whi0 = jnp.int32(classes[-1])
        for c in reversed(classes[:-1]):
            whi0 = jnp.where(raw <= c, jnp.int32(c), whi0)
        whi_ref[0] = whi0

    lo = lo_ref[...]
    hi = hi_ref[...]

    def column(base_c, j, cw, carry):
        pvs, mvs, sws, rb, rpf, rpl = carry
        c = base_c + j
        sym = targets_ref[0, c] if shared else targets_ref[c]
        hn = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        if hin0 == 0:
            hp = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        else:
            hp = jnp.ones((SUBLANES, LANES), jnp.uint32)
        pvs, mvs, sws = list(pvs), list(mvs), list(sws)
        for w in range(cw):
            eq = _fetch_eq(peq_ref, sym, w, sigma1, shared)
            pvs[w], mvs[w], hn, hp = _advance_word(pvs[w], mvs[w], eq, hn, hp)
            sws[w] = sws[w] + hp.astype(jnp.int32) - hn.astype(jnp.int32)
        if cw == n_words:
            score = sws[n_words - 1]
            col = t_step * chunk + c
            in_win = (col >= lo) & (col < hi)
            upd = (score < rb) & in_win
            rpf = jnp.where(upd, col, rpf)
            rpl = jnp.where((score <= rb) & in_win, col, rpl)
            rb = jnp.where(upd, score, rb)
        return tuple(pvs), tuple(mvs), tuple(sws), rb, rpf, rpl

    def group_branch(cw):
        def branch(base_c, carry):
            if interpret:
                return jax.lax.fori_loop(
                    0, group,
                    lambda j, car: column(base_c, j, cw, car), carry)
            for j in range(group):
                carry = column(base_c, j, cw, carry)
            return carry
        return branch

    branches = [group_branch(cw) for cw in classes]

    def adapt(g, whi, pvs, mvs, sws, rb):
        """Group-boundary band update; returns (whi', pvs', mvs', sws')."""
        keff = jnp.minimum(k, rb)
        # Per-word min-lane relative bottoms (stale entries masked below).
        m = [jnp.min(sws[w] - keff) for w in range(n_words)]
        mlast = m[0]
        last_bot = sws[0]
        for w in range(1, n_words):
            is_last = whi == w + 1
            mlast = jnp.where(is_last, m[w], mlast)
            last_bot = jnp.where(is_last, sws[w], last_bot)
        grow = mlast <= group
        n_grow = jnp.where(grow, (group - mlast) // 32 + 1, 0)
        grown = jnp.minimum(jnp.int32(n_words), whi + n_grow)
        keep_hi = jnp.int32(1)
        for w in range(1, n_words):
            keep = (w < whi) & (m[w] < 32 + group)
            keep_hi = jnp.where(keep, jnp.int32(w + 1), keep_hi)
        raw_whi = jnp.where(grow, grown, keep_hi)

        if strong_every > 0:
            # Strong reduce (exact min cells, no 32-cell slack) every
            # strong_every groups — phase-offset by t_step so it also
            # fires across chunk boundaries.
            def strong(rw):
                kh = jnp.int32(1)
                for w in range(1, n_words):
                    mc = jnp.min(_min_cells_exact(pvs[w], mvs[w], sws[w])
                                 - keff)
                    keep = (w < whi) & (mc <= group)
                    kh = jnp.where(keep, jnp.int32(w + 1), kh)
                return jnp.minimum(rw, jnp.maximum(kh, jnp.where(
                    grow, grown, jnp.int32(1))))
            gg = t_step * (chunk // group) + g + 1
            raw_whi = jax.lax.cond(gg % strong_every == 0, strong,
                                   lambda rw: rw, raw_whi)

        # Round up to a class.
        whi_new = jnp.int32(classes[-1])
        for cclass in reversed(classes[:-1]):
            whi_new = jnp.where(raw_whi <= cclass, jnp.int32(cclass),
                                whi_new)
        # Reset rejoining words to the ramp continuing from the last live
        # word's bottom (upper bound; reference edlib.cpp:606-608).
        pvs, mvs, sws = list(pvs), list(mvs), list(sws)
        ones_t = jnp.full((SUBLANES, LANES), _ONES, jnp.uint32)
        zero_t = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        for w in range(1, n_words):
            rejoin = (w >= whi) & (w < whi_new)
            pvs[w] = jnp.where(rejoin, ones_t, pvs[w])
            mvs[w] = jnp.where(rejoin, zero_t, mvs[w])
            sws[w] = jnp.where(rejoin, last_bot + 32 * (w - whi + 1),
                               sws[w])
        return whi_new, tuple(pvs), tuple(mvs), tuple(sws)

    def group_step(g, carry):
        whi, pvs, mvs, sws, rb, rpf, rpl = carry
        idx = jnp.int32(0)
        for ci, cclass in enumerate(classes[:-1]):
            idx = jnp.where(whi > cclass, jnp.int32(ci + 1), idx)
        pvs, mvs, sws, rb, rpf, rpl = jax.lax.switch(
            idx, branches, g * group, (pvs, mvs, sws, rb, rpf, rpl))
        whi, pvs, mvs, sws = adapt(g, whi, pvs, mvs, sws, rb)
        return whi, pvs, mvs, sws, rb, rpf, rpl

    carry0 = (whi_ref[0],
              tuple(pv_ref[w] for w in range(n_words)),
              tuple(mv_ref[w] for w in range(n_words)),
              tuple(sw_ref[w] for w in range(n_words)),
              rb_ref[...], rpf_ref[...], rpl_ref[...])
    whi, pvs, mvs, sws, rb, rpf, rpl = jax.lax.fori_loop(
        0, chunk // group, group_step, carry0)
    for w in range(n_words):
        pv_ref[w] = pvs[w]
        mv_ref[w] = mvs[w]
        sw_ref[w] = sws[w]
    rb_ref[...] = rb
    rpf_ref[...] = rpf
    rpl_ref[...] = rpl
    whi_ref[0] = whi

    @pl.when(t_step == n_chunks - 1)
    def _emit():
        best_ref[...] = rb_ref[...]
        pfirst_ref[...] = rpf_ref[...]
        plast_ref[...] = rpl_ref[...]


@functools.partial(jax.jit, static_argnames=("hin0", "chunk", "group",
                                             "shared", "strong_every",
                                             "interpret"))
def sweep_hw_adaptive_pallas(peq: jnp.ndarray, targets: jnp.ndarray,
                             lo: jnp.ndarray, hi: jnp.ndarray,
                             k: jnp.ndarray, hin0: int = 0,
                             chunk: int = 256, group: int = 8,
                             shared: bool = False, strong_every: int = 64,
                             interpret: bool = False):
    """Value-adaptive banded semiglobal reduce: (best, pfirst, plast) each
    int32 (n_tiles, 8, 128) in scan-column space.

    k: int32 (1,) — dynamic pruning threshold (plus in-sweep per-lane
    tightening to the running best).  Exact for lanes whose true best is
    <= k; other lanes emit overestimates > k (host ladder retries).
    strong_every: exact min-cell strong reduce every this many groups
    (0 disables).  chunk % group == 0.
    """
    n_tiles, sigma1, n_words = peq.shape[:3]
    n_chunks = targets.shape[0] if shared else targets.shape[1]
    assert chunk % group == 0
    classes = tuple(adaptive_classes(n_words))
    kernel = functools.partial(
        _hw_adaptive_kernel, n_words=n_words, sigma1=sigma1, chunk=chunk,
        group=group, classes=classes, hin0=hin0, shared=shared,
        strong_every=strong_every, interpret=interpret)
    if shared:
        t_spec = pl.BlockSpec((None, 1, chunk), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.SMEM)
    else:
        t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                              lambda i, j: (i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    woff_dummy = jnp.zeros((1,), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            t_spec,
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec,
        ],
        out_specs=(tile_spec, tile_spec, tile_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32)
            for _ in range(3)),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(jnp.asarray(k, jnp.int32).reshape(1), woff_dummy, targets, peq,
      lo, hi)


def nw_band_schedule(n_words: int, n_chunks: int, chunk: int,
                     d_lo: int, d_hi: int):
    """(per-chunk window offsets, static window width) for the band.

    d_lo/d_hi: live diagonals row - col in scan space (min/max over the
    bucket's lanes of ceil((D-k)/2) / floor((D+k)/2), D = qlen - tlen).
    The window always covers [w_lo, w_hi) of the exact band — wider is
    still exact (extra top words just advance further; extra bottom words
    start from the ramp reset) — and reaches the bottom word by the chunk
    holding each feasible lane's final column.
    """
    j = np.arange(n_chunks, dtype=np.int64)
    c_first = j * chunk
    c_last = c_first + chunk - 1
    w_hi = np.clip((c_last + d_hi) // 32 + 1, 1, n_words)
    w_lo = np.clip((c_first + d_lo) // 32, 0, n_words - 1)
    w_lo = np.minimum(w_lo, w_hi - 1)
    width = int(np.max(w_hi - w_lo))
    n_win = min(-(-width // _WIN_ROUND) * _WIN_ROUND, n_words)
    woff = np.clip(w_lo, 0, n_words - n_win)
    woff = np.maximum.accumulate(woff)
    return woff.astype(np.int32), n_win


def build_peq_device(q_ids: jnp.ndarray, qlens: jnp.ndarray, sigma: int,
                     n_words: int) -> jnp.ndarray:
    """Query profiles built on device (no host transfer of packed tables).

    q_ids: int32 (B, Qmax) (entries past qlens are ignored); returns uint32
    (B, sigma+1, n_words) with wildcard padding rows past each qlen.
    """
    B, qmax = q_ids.shape
    total = n_words * 32
    rows = jnp.arange(total, dtype=jnp.int32)
    q_pad = jnp.full((B, total), -1, dtype=jnp.int32)
    q_pad = q_pad.at[:, :qmax].set(q_ids)
    pad_mask = rows[None, :] >= qlens[:, None]          # (B, total)
    sym = jnp.arange(sigma + 1, dtype=jnp.int32)
    match = (q_pad[:, None, :] == sym[None, :, None]) | pad_mask[:, None, :] \
        | (sym[None, :, None] == sigma)                 # (B, S1, total)
    bits = match.reshape(B, sigma + 1, n_words, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (bits << shifts).sum(axis=3, dtype=jnp.uint32)


def pack_tiles_device(peq_flat: jnp.ndarray) -> jnp.ndarray:
    """(B, S1, NW) -> (n_tiles, S1, NW, 8, 128) on device; B % 1024 == 0."""
    B, S1, NW = peq_flat.shape
    n_tiles = B // B_TILE
    p = peq_flat.reshape(n_tiles, SUBLANES, LANES, S1, NW)
    return jnp.transpose(p, (0, 3, 4, 1, 2))


def _pack_lanes_device(vals: jnp.ndarray, n_tiles: int, fill) -> jnp.ndarray:
    """(B,) -> (n_tiles, 8, 128) lanes-major, padded with fill (device)."""
    B = vals.shape[0]
    out = jnp.full((n_tiles * B_TILE,), fill, vals.dtype)
    out = out.at[:B].set(vals)
    return out.reshape(n_tiles, SUBLANES, LANES)


def reduce_flat_device(peq: jnp.ndarray, targets: jnp.ndarray,
                       lo: jnp.ndarray, hi: jnp.ndarray, hin0: int,
                       chunk: int = 256, want_hits: bool = False,
                       interpret: bool = False):
    """Flat-layout batched reduce for mesh-sharded callers (parallel/dist):
    packs (B, S1, NW) / (B, T) into kernel tiles ON DEVICE, runs the
    two-phase reduce (+ hits) kernels, and unpacks back to (B,) vectors —
    traceable inside shard_map, so every shard of a mesh runs the same
    register-resident kernels as the single-chip path instead of the
    latency-bound XLA scan engine.

    Returns (best, pos_first, pos_last, last_score) each (B,) int32 in
    scan-column space, plus (B, ceil(T/32)) uint32 packed hit words when
    want_hits (bit j of word g = scan column 32g + j) — the same width
    as the XLA-engine path, so the two engines are shape-identical.
    """
    B, S1, NW = peq.shape
    T = targets.shape[1]
    n_tiles = -(-B // B_TILE)
    n_chunks = -(-T // chunk)
    Bp, Tp = n_tiles * B_TILE, n_chunks * chunk
    peq_p = jnp.full((Bp, S1, NW), _ONES, jnp.uint32).at[:B].set(peq)
    peq_t = jnp.transpose(
        peq_p.reshape(n_tiles, SUBLANES, LANES, S1, NW), (0, 3, 4, 1, 2))
    # wildcard(S1-1) fill keeps pad columns inert (reads masked by hi)
    tg_p = jnp.full((Bp, Tp), S1 - 1, jnp.int32).at[:B, :T].set(targets)
    tg_t = jnp.transpose(
        tg_p.reshape(n_tiles, SUBLANES, LANES, n_chunks, chunk),
        (0, 3, 4, 1, 2))
    lo_t = _pack_lanes_device(lo.astype(jnp.int32), n_tiles, jnp.int32(0))
    hi_t = _pack_lanes_device(hi.astype(jnp.int32), n_tiles, jnp.int32(0))
    outs = _sweep_reduce_call(peq_t, tg_t, lo_t, hi_t, hin0=hin0,
                              chunk=chunk, interpret=interpret)
    flat = tuple(o.reshape(-1)[:B] for o in outs)
    if not want_hits:
        return flat
    best_t = _pack_lanes_device(flat[0], n_tiles, jnp.int32(-(1 << 30)))
    masks = _sweep_hits_call(peq_t, tg_t, lo_t, hi_t, best_t, hin0=hin0,
                             chunk=chunk, interpret=interpret)
    G = chunk // 32
    hits = jnp.transpose(masks, (0, 3, 4, 1, 2)).reshape(Bp, n_chunks * G)
    # Trim to the XLA-engine width (pad bits are provably zero: cols >= T
    # sit past every hi window).
    return flat + (hits[:B, :-(-T // 32)],)


# ---------------------------------------------------------------------------
# Eq-stream engines (round 4): per-lane-target batches past the select-chain
# alphabet cap.  The general kernels pay an S1-way select per word per
# column, so max_sigma1 caps them at 64 Peq rows; beyond that the reference
# still covers sigma <= 256 (edlib.cpp:1417-1462).  Here the Eq lookup moves
# OUT of the kernel onto the MXU: one-hot(target symbol) x Peq byte-plane
# matmuls gather every column's Eq rows exactly (each one-hot row has a
# single 1.0, each byte plane < 256 is exact in bf16, and the f32
# accumulation of one nonzero product is exact), and the kernels stream the
# precomputed (chunk*NW, 8, 128) Eq blocks from HBM — no symbol stream, no
# Peq residency, no alphabet cap.  Bandwidth-bound by design (NW words read
# per lane-column), which still beats falling off the chip entirely.
# ---------------------------------------------------------------------------


def eqstream_gather(peq: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """eq[b, c, w] = peq[b, targets[b, c], w] via exact MXU one-hot matmuls.

    peq: uint32 (B, S1, NW); targets: int32 (B, T) in [0, S1).
    Returns uint32 (B, T, NW).
    """
    B, S1, NW = peq.shape
    T = targets.shape[1]
    onehot = jax.nn.one_hot(targets, S1, dtype=jnp.bfloat16)      # (B, T, S1)
    planes = jnp.stack([(peq >> (8 * p)) & jnp.uint32(0xFF)
                        for p in range(4)], axis=-1)              # (B,S1,NW,4)
    planes = planes.reshape(B, S1, NW * 4).astype(jnp.bfloat16)
    g = jnp.einsum("bts,bsw->btw", onehot, planes,
                   preferred_element_type=jnp.float32)
    gb = g.astype(jnp.uint32).reshape(B, T, NW, 4)
    return (gb[..., 0] | (gb[..., 1] << 8)
            | (gb[..., 2] << 16) | (gb[..., 3] << 24))


def eqstream_chunk(n_words: int) -> int:
    """Largest target chunk whose double-buffered Eq block fits the VMEM
    budget (block = chunk * NW * 1024 lanes * 4 B, two in flight)."""
    budget = vmem_limit_bytes() // 4
    for chunk in (256, 128, 64, 32):
        if chunk * n_words * B_TILE * 4 * 2 <= budget:
            return chunk
    return 32


def _sweep_reduce_eqstream_call(eq_chunks: jnp.ndarray, lo: jnp.ndarray,
                                hi: jnp.ndarray, hin0: int, n_words: int,
                                chunk: int, interpret: bool = False):
    """eq_chunks: uint32 (n_tiles, n_chunks, chunk*NW, 8, 128) — column c's
    word w at row c*NW + w.  Returns the reduce kernel's 4 output tiles."""
    n_tiles, n_chunks = eq_chunks.shape[:2]
    if interpret:
        unroll = 1
    else:
        unroll = 16 if chunk % 16 == 0 else (8 if chunk % 8 == 0 else 1)
    kernel = functools.partial(_reduce_kernel, n_words=n_words, sigma1=0,
                               chunk=chunk, hin0=hin0, shared=False,
                               unroll=unroll, eq_stream=True)
    eq_spec = pl.BlockSpec((None, None, chunk * n_words, SUBLANES, LANES),
                           lambda i, j: (i, j, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[eq_spec, tile_spec, tile_spec],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32)
            for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(eq_chunks, lo, hi)


def _sweep_hits_eqstream_call(eq_chunks: jnp.ndarray, lo: jnp.ndarray,
                              hi: jnp.ndarray, best: jnp.ndarray, hin0: int,
                              n_words: int, chunk: int,
                              interpret: bool = False):
    n_tiles, n_chunks = eq_chunks.shape[:2]
    assert chunk % 32 == 0
    kernel = functools.partial(_hits_kernel, n_words=n_words, sigma1=0,
                               chunk=chunk, hin0=hin0, shared=False,
                               eq_stream=True)
    eq_spec = pl.BlockSpec((None, None, chunk * n_words, SUBLANES, LANES),
                           lambda i, j: (i, j, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[eq_spec, tile_spec, tile_spec, tile_spec],
        out_specs=pl.BlockSpec((None, None, chunk // 32, SUBLANES, LANES),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, n_chunks, chunk // 32, SUBLANES, LANES), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(eq_chunks, lo, hi, best)


@functools.partial(jax.jit, static_argnames=("hin0", "chunk", "want_hits",
                                             "interpret"))
def reduce_flat_device_eqstream(peq: jnp.ndarray, targets: jnp.ndarray,
                                lo: jnp.ndarray, hi: jnp.ndarray, hin0: int,
                                chunk: int = 128, want_hits: bool = False,
                                interpret: bool = False):
    """Flat-layout reduce for per-lane-target batches of ANY alphabet size:
    one fused dispatch building the MXU Eq streams and running the
    eq-stream reduce (+ hits) kernels.  Same returns as reduce_flat_device.
    """
    B, S1, NW = peq.shape
    T = targets.shape[1]
    n_tiles = -(-B // B_TILE)
    n_chunks = -(-T // chunk)
    Bp, Tp = n_tiles * B_TILE, n_chunks * chunk
    peq_p = jnp.full((Bp, S1, NW), _ONES, jnp.uint32).at[:B].set(peq)
    tg_p = jnp.full((Bp, Tp), S1 - 1, jnp.int32).at[:B, :T].set(targets)
    eqs = eqstream_gather(peq_p, tg_p)                        # (Bp, Tp, NW)
    eq_t = jnp.transpose(
        eqs.reshape(n_tiles, SUBLANES, LANES, n_chunks, chunk, NW),
        (0, 3, 4, 5, 1, 2)).reshape(
            n_tiles, n_chunks, chunk * NW, SUBLANES, LANES)
    lo_t = _pack_lanes_device(lo.astype(jnp.int32), n_tiles, jnp.int32(0))
    hi_t = _pack_lanes_device(hi.astype(jnp.int32), n_tiles, jnp.int32(0))
    outs = _sweep_reduce_eqstream_call(eq_t, lo_t, hi_t, hin0=hin0,
                                       n_words=NW, chunk=chunk,
                                       interpret=interpret)
    flat = tuple(o.reshape(-1)[:B] for o in outs)
    if not want_hits:
        return flat
    best_t = _pack_lanes_device(flat[0], n_tiles, jnp.int32(-(1 << 30)))
    masks = _sweep_hits_eqstream_call(eq_t, lo_t, hi_t, best_t, hin0=hin0,
                                      n_words=NW, chunk=chunk,
                                      interpret=interpret)
    G = chunk // 32
    hits = jnp.transpose(masks, (0, 3, 4, 1, 2)).reshape(Bp, n_chunks * G)
    return flat + (hits[:B, :-(-T // 32)],)


# ---------------------------------------------------------------------------
# Bit-plane engine (round 5): the eq-stream gather replaced by IN-KERNEL Eq
# computation.  The round-4 eq-stream paid a materialised (B, T, S1) one-hot
# (XLA cannot fuse producers into matmul operands) plus a (B, T, NW) Eq
# stream — measured 7.0 ms of a 10.7 ms call at sigma=200.  Here the kernel
# keeps each lane's query-symbol ids as nb = ceil(log2(sigma+2)) packed BIT
# PLANES in VMEM and reconstructs Eq per column with the XNOR-AND trick
# (_bitplane_eq): ~16 VPU ops per word per alternative, independent of
# sigma.  HBM traffic per lane-column drops from 4*NW bytes (pre-gathered
# words) to 4 (one int32 symbol).  additionalEqualities ride as up to
# n_alts alternative ids per row; rows matching everything (wildcard pad,
# universal equality rows) ride in a packed pad mask.  Covers the
# reference's full sigma <= 256 (edlib.cpp:1417-1462) with no cliff.
# ---------------------------------------------------------------------------


def bitplane_nb(sigma: int) -> int:
    """Bit planes per alternative: enough for symbols [0, sigma] plus a
    sentinel id (1<<nb)-1 > sigma that matches no target symbol."""
    return (sigma + 1).bit_length()


def bitplane_identity_operands(q_arr: jnp.ndarray, qlens: jnp.ndarray,
                               sigma: int, n_words: int):
    """(q_alts, pad_words) for IDENTITY equality: q_alts are just the
    reads (E=1) with the sentinel in every pad slot, pad_words the packed
    bits of rows past each qlen.  The one place the bit-plane operand
    layout is defined for identity callers (qfilter verify, the fused
    mapping fallback, harnesses) — change it here only."""
    B = q_arr.shape[0]
    R = n_words * 32
    sent = jnp.int32((1 << bitplane_nb(sigma)) - 1)
    rows = jnp.arange(R, dtype=jnp.int32)
    pad = rows[None, :] >= qlens[:, None]                   # (B, R)
    qa_full = jnp.full((B, R), sent, jnp.int32).at[
        :, :q_arr.shape[1]].set(q_arr.astype(jnp.int32))
    q_alts = jnp.where(pad, sent, qa_full)[:, None, :]
    pad_words = (pad.reshape(B, n_words, 32).astype(jnp.uint32)
                 << jnp.arange(32, dtype=jnp.uint32)).sum(
        2, dtype=jnp.uint32)
    return q_alts, pad_words


def bitplane_ok(n_words: int, sigma: int, n_alts: int) -> bool:
    """Whether the bit-plane kernels apply: plane block VMEM-resident
    (n_alts * nb * NW uint32 rows) within a quarter of the VMEM budget."""
    rows = n_alts * bitplane_nb(sigma) * n_words
    return rows * SUBLANES * LANES * 4 <= vmem_limit_bytes() // 4


def _sweep_reduce_bitplane_call(tg_t, planes_t, pad_t, lo, hi, *, hin0: int,
                                n_words: int, nb: int, n_alts: int,
                                wildcard: int, chunk: int,
                                interpret: bool = False):
    """tg_t: int32 (n_tiles, n_chunks, chunk, 8, 128) per-lane symbols;
    planes_t: uint32 (n_tiles, n_alts*nb*n_words, 8, 128);
    pad_t: uint32 (n_tiles, n_words, 8, 128)."""
    n_tiles, n_chunks = tg_t.shape[:2]
    if interpret:
        unroll = 1
    else:
        unroll = 16 if chunk % 16 == 0 else (8 if chunk % 8 == 0 else 1)
    kernel = functools.partial(_reduce_kernel, n_words=n_words, sigma1=0,
                               chunk=chunk, hin0=hin0, shared=False,
                               unroll=unroll, bitplane=nb, n_alts=n_alts,
                               wildcard=wildcard)
    t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                          lambda i, j: (i, j, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    planes_spec = pl.BlockSpec((None, n_alts * nb * n_words, SUBLANES,
                                LANES), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    pad_spec = pl.BlockSpec((None, n_words, SUBLANES, LANES),
                            lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[t_spec, planes_spec, pad_spec, tile_spec, tile_spec],
        out_specs=(tile_spec, tile_spec, tile_spec, tile_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32)
            for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(tg_t, planes_t, pad_t, lo, hi)


def _sweep_hits_bitplane_call(tg_t, planes_t, pad_t, lo, hi, best, *,
                              hin0: int, n_words: int, nb: int, n_alts: int,
                              wildcard: int, chunk: int,
                              interpret: bool = False):
    n_tiles, n_chunks = tg_t.shape[:2]
    assert chunk % 32 == 0
    kernel = functools.partial(_hits_kernel, n_words=n_words, sigma1=0,
                               chunk=chunk, hin0=hin0, shared=False,
                               bitplane=nb, n_alts=n_alts,
                               wildcard=wildcard)
    t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                          lambda i, j: (i, j, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    planes_spec = pl.BlockSpec((None, n_alts * nb * n_words, SUBLANES,
                                LANES), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    pad_spec = pl.BlockSpec((None, n_words, SUBLANES, LANES),
                            lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((None, SUBLANES, LANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[t_spec, planes_spec, pad_spec, tile_spec, tile_spec,
                  tile_spec],
        out_specs=pl.BlockSpec((None, None, chunk // 32, SUBLANES, LANES),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, n_chunks, chunk // 32, SUBLANES, LANES), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(tg_t, planes_t, pad_t, lo, hi, best)


@functools.partial(jax.jit, static_argnames=("hin0", "sigma", "chunk",
                                             "want_hits", "interpret"))
def reduce_flat_device_bitplane(q_alts: jnp.ndarray, pad_words: jnp.ndarray,
                                targets: jnp.ndarray, lo: jnp.ndarray,
                                hi: jnp.ndarray, hin0: int, sigma: int,
                                chunk: int = 256, want_hits: bool = False,
                                interpret: bool = False):
    """Flat-layout reduce for per-lane-target batches of ANY alphabet size
    via in-kernel bit-plane Eq computation.  Same returns as
    reduce_flat_device.

    q_alts: int32 (B, E, R) — alternative symbol ids per query row (R =
      NW*32); rows/slots with no alternative carry the sentinel
      (1 << nb) - 1 (or any value > sigma).  For identity equality E = 1
      and q_alts[:, 0] is just the padded query ids.
    pad_words: uint32 (B, NW) — packed bits of rows that match EVERY
      symbol (query wildcard pad rows, universal equality rows).
    targets: int32 (B, T) symbols in [0, sigma]; sigma is the wildcard.
    """
    B, E, R = q_alts.shape
    NW = R // 32
    nb = bitplane_nb(sigma)
    T = targets.shape[1]
    n_tiles = -(-B // B_TILE)
    n_chunks = -(-T // chunk)
    Bp, Tp = n_tiles * B_TILE, n_chunks * chunk
    sent = jnp.int32((1 << nb) - 1)
    qa = jnp.full((Bp, E, R), sent, jnp.int32).at[:B].set(
        q_alts.astype(jnp.int32))
    pw = jnp.full((Bp, NW), _ONES, jnp.uint32).at[:B].set(pad_words)
    shifts_b = jnp.arange(nb, dtype=jnp.int32)[None, None, :, None]
    bitsp = ((qa[:, :, None, :] >> shifts_b) & 1).astype(jnp.uint32)
    # bitsp: (Bp, E, nb, R)
    planes = (bitsp.reshape(Bp, E, nb, NW, 32)
              << jnp.arange(32, dtype=jnp.uint32)).sum(
        4, dtype=jnp.uint32).reshape(Bp, E * nb * NW)
    planes_t = jnp.transpose(
        planes.reshape(n_tiles, SUBLANES, LANES, E * nb * NW), (0, 3, 1, 2))
    pad_t = jnp.transpose(
        pw.reshape(n_tiles, SUBLANES, LANES, NW), (0, 3, 1, 2))
    tg_p = jnp.full((Bp, Tp), sigma, jnp.int32).at[:B, :T].set(targets)
    tg_t = jnp.transpose(
        tg_p.reshape(n_tiles, SUBLANES, LANES, n_chunks, chunk),
        (0, 3, 4, 1, 2))
    lo_t = _pack_lanes_device(lo.astype(jnp.int32), n_tiles, jnp.int32(0))
    hi_t = _pack_lanes_device(hi.astype(jnp.int32), n_tiles, jnp.int32(0))
    outs = _sweep_reduce_bitplane_call(
        tg_t, planes_t, pad_t, lo_t, hi_t, hin0=hin0, n_words=NW, nb=nb,
        n_alts=E, wildcard=sigma, chunk=chunk, interpret=interpret)
    flat = tuple(o.reshape(-1)[:B] for o in outs)
    if not want_hits:
        return flat
    best_t = _pack_lanes_device(flat[0], n_tiles, jnp.int32(-(1 << 30)))
    masks = _sweep_hits_bitplane_call(
        tg_t, planes_t, pad_t, lo_t, hi_t, best_t, hin0=hin0, n_words=NW,
        nb=nb, n_alts=E, wildcard=sigma, chunk=chunk, interpret=interpret)
    G = chunk // 32
    hits = jnp.transpose(masks, (0, 3, 4, 1, 2)).reshape(Bp, n_chunks * G)
    return flat + (hits[:B, :-(-T // 32)],)


def nw_banded_flat_device(peq: jnp.ndarray, targets: jnp.ndarray,
                          hi: jnp.ndarray, d_lo: int, d_hi: int,
                          chunk: int = 256, interpret: bool = False):
    """Traceable flat banded-NW distances — the mesh/shard_map counterpart
    of PallasSweeper.reduce_nw_banded: packs (B, S1, NW) / (B, T) into
    kernel tiles ON DEVICE and runs the banded NW kernel with the static
    sliding word window for live diagonals [d_lo, d_hi] (d_lo/d_hi are
    python ints).  Returns (B,) int32 scan scores — exact where <= the
    band's k, garbage above it (pruning-only contract, same as the native
    banded engine)."""
    B, S1, NW = peq.shape
    T = targets.shape[1]
    n_tiles = -(-B // B_TILE)
    n_chunks = -(-T // chunk)
    Bp, Tp = n_tiles * B_TILE, n_chunks * chunk
    peq_p = jnp.full((Bp, S1, NW), _ONES, jnp.uint32).at[:B].set(peq)
    peq_t = jnp.transpose(
        peq_p.reshape(n_tiles, SUBLANES, LANES, S1, NW), (0, 3, 4, 1, 2))
    tg_p = jnp.full((Bp, Tp), S1 - 1, jnp.int32).at[:B, :T].set(targets)
    tg_t = jnp.transpose(
        tg_p.reshape(n_tiles, SUBLANES, LANES, n_chunks, chunk),
        (0, 3, 4, 1, 2))
    woff, n_win = nw_band_schedule(NW, n_chunks, chunk, d_lo, d_hi)
    hi_t = _pack_lanes_device(hi.astype(jnp.int32), n_tiles, jnp.int32(0))
    out = sweep_nw_banded_pallas(peq_t, tg_t, jnp.asarray(woff), hi_t,
                                 n_win, chunk=chunk, interpret=interpret)
    return out.reshape(-1)[:B]


def _pack_shared_flat(peq: jnp.ndarray, target_scan: jnp.ndarray,
                      fill_sym: int, chunk: int):
    B, S1, NW = peq.shape
    L = target_scan.shape[0]
    n_tiles = -(-B // B_TILE)
    n_chunks = -(-L // chunk)
    peq_p = jnp.full((n_tiles * B_TILE, S1, NW), _ONES,
                     jnp.uint32).at[:B].set(peq)
    peq_t = jnp.transpose(
        peq_p.reshape(n_tiles, SUBLANES, LANES, S1, NW), (0, 3, 4, 1, 2))
    tg = jnp.full((n_chunks * chunk,), fill_sym,
                  jnp.int32).at[:L].set(target_scan.astype(jnp.int32))
    return peq_t, tg.reshape(n_chunks, 1, chunk), n_tiles


def reduce_flat_device_shared(peq: jnp.ndarray, target_scan: jnp.ndarray,
                              lo: jnp.ndarray, hi: jnp.ndarray, hin0: int,
                              fill_sym: int, chunk: int = 256,
                              interpret: bool = False):
    """Shared-target flat reduce for mesh-sharded callers: every lane of
    this shard sweeps ONE target (scalar SMEM symbols, no select chain).
    peq (B, S1, NW) uint32, target_scan (L,) int32 (padded out with
    fill_sym; reads are masked by hi).  Returns (best, pos_first,
    pos_last, last_score) each (B,) int32 in scan-column space."""
    B = peq.shape[0]
    peq_t, tg_t, n_tiles = _pack_shared_flat(peq, target_scan, fill_sym,
                                             chunk)
    lo_t = _pack_lanes_device(lo.astype(jnp.int32), n_tiles, jnp.int32(0))
    hi_t = _pack_lanes_device(hi.astype(jnp.int32), n_tiles, jnp.int32(0))
    outs = _sweep_reduce_call(peq_t, tg_t, lo_t, hi_t, hin0=hin0,
                              chunk=chunk, shared=True, interpret=interpret)
    return tuple(o.reshape(-1)[:B] for o in outs)


def hits_flat_device_shared(peq: jnp.ndarray, target_scan: jnp.ndarray,
                            lo: jnp.ndarray, hi: jnp.ndarray,
                            best: jnp.ndarray, hin0: int, fill_sym: int,
                            chunk: int = 256,
                            interpret: bool = False) -> jnp.ndarray:
    """Shared-target packed hit bitmasks: (B, ceil_32(L)) uint32, bit j of
    word g = scan column 32g + j has score == best (per lane)."""
    B = peq.shape[0]
    peq_t, tg_t, n_tiles = _pack_shared_flat(peq, target_scan, fill_sym,
                                             chunk)
    lo_t = _pack_lanes_device(lo.astype(jnp.int32), n_tiles, jnp.int32(0))
    hi_t = _pack_lanes_device(hi.astype(jnp.int32), n_tiles, jnp.int32(0))
    best_t = _pack_lanes_device(best.astype(jnp.int32), n_tiles,
                                jnp.int32(-(1 << 30)))
    masks = _sweep_hits_call(peq_t, tg_t, lo_t, hi_t, best_t, hin0=hin0,
                             chunk=chunk, shared=True, interpret=interpret)
    n_chunks, G = masks.shape[1], chunk // 32
    Bp = n_tiles * B_TILE
    return jnp.transpose(masks, (0, 3, 4, 1, 2)).reshape(
        Bp, n_chunks * G)[:B]


class PallasSweeper:
    """Host-side packing for the Pallas sweep: lanes-major batch layout.

    Batch element b maps to tile b // 1024, sublane (b % 1024) // 128,
    lane b % 128.
    """

    def __init__(self, chunk: int = 256, interpret: bool = False):
        self.chunk = chunk
        self.interpret = interpret

    def pack(self, peq_flat: np.ndarray, targets_flat: np.ndarray):
        """peq_flat uint32 (B, S1, NW), targets_flat int32 (B, T_scan)."""
        B, S1, NW = peq_flat.shape
        T = targets_flat.shape[1]
        n_tiles = -(-B // B_TILE)
        n_chunks = -(-T // self.chunk)
        Bp = n_tiles * B_TILE
        Tp = n_chunks * self.chunk
        peq = np.full((Bp, S1, NW), _ONES, dtype=np.uint32)
        peq[:B] = peq_flat
        tg = np.zeros((Bp, Tp), dtype=np.int32)
        tg[:B, :T] = targets_flat
        # (Bp, S1, NW) -> (n_tiles, S1, NW, 8, 128)
        peq = peq.reshape(n_tiles, SUBLANES, LANES, S1, NW)
        peq = peq.transpose(0, 3, 4, 1, 2).copy()
        # (Bp, Tp) -> (n_tiles, n_chunks, chunk, 8, 128)
        tg = tg.reshape(n_tiles, SUBLANES, LANES, n_chunks, self.chunk)
        tg = tg.transpose(0, 3, 4, 1, 2).copy()
        return peq, tg, B, T

    def unpack_scores(self, scores: np.ndarray, B: int, T: int) -> np.ndarray:
        n_tiles, n_chunks, chunk = scores.shape[:3]
        s = scores.transpose(0, 3, 4, 1, 2).reshape(n_tiles * B_TILE,
                                                    n_chunks * chunk)
        return s[:B, :T]

    def sweep(self, peq_flat: np.ndarray, targets_flat: np.ndarray,
              hin0: int) -> np.ndarray:
        peq, tg, B, T = self.pack(peq_flat, targets_flat)
        scores = sweep_scores_pallas(peq, tg, hin0=hin0, chunk=self.chunk,
                                     interpret=self.interpret)
        return self.unpack_scores(np.asarray(scores), B, T)

    # -- two-phase reduce/hits path (round 2) --------------------------------

    def _packed(self, peq_flat, targets, hi, shared: bool):
        """Packed (peq, tg) for the reduce/hits/banded kernels, cached by
        input OBJECT IDENTITY so k-ladders and reduce-then-hits pairs pack
        once.  Contract: callers keep peq_flat/targets alive for the
        sweeper's lifetime (per-bucket sweepers do) — a freed-and-reused
        id would alias the cache."""
        cached = getattr(self, "_pack_cache", None)
        key = (id(peq_flat), id(targets))
        if cached is not None and cached[0] == key:
            return cached[1], cached[2]
        peq = self.pack_peq(peq_flat)
        if shared:
            sigma1 = peq_flat.shape[1]
            tg = self.pack_target_shared(np.asarray(targets, np.int32),
                                         sigma1 - 1,
                                         t_scan=int(np.max(hi, initial=0)))
        else:
            tg = self.pack_targets_general(targets)
        self._pack_cache = (key, peq, tg)
        return peq, tg

    @staticmethod
    def _decode_mask_rows(masks, B: int):
        """Packed hit bitmasks (n_tiles, n_chunks, G, 8, 128) -> per-lane
        sorted scan columns for the first B lanes."""
        masks = np.asarray(masks)
        n_tiles, n_chunks, G = masks.shape[:3]
        m = masks.transpose(0, 3, 4, 1, 2).reshape(n_tiles * B_TILE,
                                                   n_chunks * G)
        out = []
        shifts = np.arange(32, dtype=np.uint32)
        for b in range(B):
            words = m[b]
            nz = np.nonzero(words)[0]
            if nz.size == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            bits = (words[nz, None] >> shifts) & 1
            g_idx, b_idx = np.nonzero(bits)
            out.append(np.sort(nz[g_idx].astype(np.int64) * 32 + b_idx))
        return out

    def pack_lanes(self, vals: np.ndarray, fill: int = 0) -> np.ndarray:
        """(B,) int -> (n_tiles, 8, 128) int32 in the lanes-major layout."""
        B = vals.shape[0]
        n_tiles = -(-B // B_TILE)
        out = np.full(n_tiles * B_TILE, fill, dtype=np.int32)
        out[:B] = vals
        return out.reshape(n_tiles, SUBLANES, LANES)

    def unpack_lanes(self, arr: np.ndarray, B: int) -> np.ndarray:
        """(n_tiles, 8, 128) -> (B,)."""
        return np.asarray(arr).reshape(-1)[:B]

    def pack_peq(self, peq_flat: np.ndarray) -> np.ndarray:
        B, S1, NW = peq_flat.shape
        n_tiles = -(-B // B_TILE)
        peq = np.full((n_tiles * B_TILE, S1, NW), _ONES, dtype=np.uint32)
        peq[:B] = peq_flat
        peq = peq.reshape(n_tiles, SUBLANES, LANES, S1, NW)
        return peq.transpose(0, 3, 4, 1, 2).copy()

    def pack_targets_general(self, targets_flat: np.ndarray) -> np.ndarray:
        B, T = targets_flat.shape
        n_tiles = -(-B // B_TILE)
        n_chunks = -(-T // self.chunk)
        tg = np.zeros((n_tiles * B_TILE, n_chunks * self.chunk),
                      dtype=np.int32)
        tg[:B, :T] = targets_flat
        tg = tg.reshape(n_tiles, SUBLANES, LANES, n_chunks, self.chunk)
        return tg.transpose(0, 3, 4, 1, 2).copy()

    def pack_target_shared(self, target_scan: np.ndarray, sigma: int,
                           t_scan: int = 0) -> np.ndarray:
        """Shared target -> (n_chunks, 1, chunk) int32, wildcard(-sigma)
        filled out to at least t_scan scan columns (the scan must cover
        every lane's window hi = W + tlen, which extends past the raw
        target by that lane's wildcard pad W)."""
        T = max(target_scan.shape[0], t_scan)
        n_chunks = -(-T // self.chunk)
        tg = np.full(n_chunks * self.chunk, sigma, dtype=np.int32)
        tg[:target_scan.shape[0]] = target_scan
        return tg.reshape(n_chunks, 1, self.chunk)

    def reduce(self, peq_flat: np.ndarray, targets, lo: np.ndarray,
               hi: np.ndarray, hin0: int, shared: bool = False):
        """Phase-1: (best, pos_first, pos_last, last_score), each (B,) int64
        in scan-column space (caller shifts by per-lane W).

        targets: (B, T_scan) when general, or a 1-D shared scan target.
        """
        import jax.numpy as jnp
        B = peq_flat.shape[0]
        peq, tg = self._packed(peq_flat, targets, hi, shared)
        lo_t = self.pack_lanes(lo)
        hi_t = self.pack_lanes(hi)  # fill 0: empty window for pad lanes
        outs = sweep_reduce_pallas(jnp.asarray(peq), jnp.asarray(tg),
                                   jnp.asarray(lo_t), jnp.asarray(hi_t),
                                   hin0=hin0, chunk=self.chunk,
                                   shared=shared, interpret=self.interpret)
        return tuple(self.unpack_lanes(o, B).astype(np.int64) for o in outs)

    def reduce_nw_banded(self, peq_flat: np.ndarray, targets,
                         hi: np.ndarray, d_lo: int, d_hi: int,
                         shared: bool = False) -> np.ndarray:
        """Banded NW distances: (B,) int64 scores (garbage > k when the
        distance exceeds the band's k — caller filters/retries).

        targets: (B, T_scan) int32 when general, else a 1-D shared scan
        target; hi: (B,) exclusive end scan columns; d_lo/d_hi: the live
        scan diagonals (see nw_band_schedule).
        """
        import jax.numpy as jnp
        B = peq_flat.shape[0]
        n_words = peq_flat.shape[2]
        peq, tg = self._packed(peq_flat, targets, hi, shared)
        n_chunks = tg.shape[0] if shared else tg.shape[1]
        woff, n_win = nw_band_schedule(n_words, n_chunks, self.chunk,
                                       d_lo, d_hi)
        hi_t = self.pack_lanes(hi)
        out = sweep_nw_banded_pallas(jnp.asarray(peq), jnp.asarray(tg),
                                     jnp.asarray(woff), jnp.asarray(hi_t),
                                     n_win, chunk=self.chunk,
                                     shared=shared,
                                     interpret=self.interpret)
        return self.unpack_lanes(np.asarray(out), B).astype(np.int64)

    def reduce_shw_banded(self, peq_flat: np.ndarray, targets,
                          lo: np.ndarray, hi: np.ndarray, k: int,
                          shared: bool = False):
        """Banded SHW reduce: (best, pos_first, pos_last) each (B,) int64
        in scan-column space; exact for lanes whose true best <= k
        (pruning-only — the caller retries or falls back otherwise).

        The band is lane-independent: every SHW cell of value <= k and
        its wildcard drain lie on scan diagonals in [-k, k]
        (see _shw_banded_kernel).
        """
        import jax.numpy as jnp
        B = peq_flat.shape[0]
        n_words = peq_flat.shape[2]
        peq, tg = self._packed(peq_flat, targets, hi, shared)
        n_chunks = tg.shape[0] if shared else tg.shape[1]
        woff, n_win = nw_band_schedule(n_words, n_chunks, self.chunk,
                                       -k, k)
        lo_t = self.pack_lanes(lo)
        hi_t = self.pack_lanes(hi)
        outs = sweep_shw_banded_pallas(jnp.asarray(peq), jnp.asarray(tg),
                                       jnp.asarray(woff),
                                       jnp.asarray(lo_t), jnp.asarray(hi_t),
                                       n_win, chunk=self.chunk,
                                       shared=shared,
                                       interpret=self.interpret)
        return tuple(self.unpack_lanes(np.asarray(o), B).astype(np.int64)
                     for o in outs)

    def reduce_hw_adaptive(self, peq_flat: np.ndarray, targets,
                           lo: np.ndarray, hi: np.ndarray, k: int,
                           hin0: int = 0, group: int = 8,
                           strong_every: int = 64, shared: bool = False):
        """Value-adaptive banded semiglobal reduce: (best, pfirst, plast)
        each (B,) int64 in scan-column space.  Exact for lanes whose true
        best <= k; others emit overestimates > k (caller ladders k).  k is
        DYNAMIC — repeat calls at doubled k reuse one compiled kernel."""
        import jax.numpy as jnp
        B = peq_flat.shape[0]
        peq, tg = self._packed(peq_flat, targets, hi, shared)
        lo_t = self.pack_lanes(lo)
        hi_t = self.pack_lanes(hi)
        outs = sweep_hw_adaptive_pallas(
            jnp.asarray(peq), jnp.asarray(tg), jnp.asarray(lo_t),
            jnp.asarray(hi_t), jnp.asarray([max(0, int(k))], jnp.int32),
            hin0=hin0, chunk=self.chunk, group=group, shared=shared,
            strong_every=strong_every, interpret=self.interpret)
        return tuple(self.unpack_lanes(np.asarray(o), B).astype(np.int64)
                     for o in outs)

    def hits_shw_banded(self, peq_flat: np.ndarray, targets, lo: np.ndarray,
                        hi: np.ndarray, best: np.ndarray, k: int,
                        shared: bool = False):
        """Banded phase-2: per-lane sorted scan columns with score == best
        (exact for lanes whose best <= k).  Returns list of int64 arrays."""
        import jax.numpy as jnp
        B = peq_flat.shape[0]
        n_words = peq_flat.shape[2]
        peq, tg = self._packed(peq_flat, targets, hi, shared)
        n_chunks = tg.shape[0] if shared else tg.shape[1]
        woff, n_win = nw_band_schedule(n_words, n_chunks, self.chunk,
                                       -k, k)
        lo_t = self.pack_lanes(lo)
        hi_t = self.pack_lanes(hi)
        best_t = self.pack_lanes(np.asarray(best, np.int64), fill=-(1 << 30))
        masks = sweep_shw_banded_hits_pallas(
            jnp.asarray(peq), jnp.asarray(tg), jnp.asarray(woff),
            jnp.asarray(lo_t), jnp.asarray(hi_t), jnp.asarray(best_t),
            n_win, chunk=self.chunk, shared=shared,
            interpret=self.interpret)
        return self._decode_mask_rows(masks, B)

    def hits(self, peq_flat: np.ndarray, targets, lo: np.ndarray,
             hi: np.ndarray, best: np.ndarray, hin0: int,
             shared: bool = False):
        """Phase-2: per-lane sorted scan columns where score == best.

        Returns a list of int64 arrays, one per lane (scan-column space).
        """
        import jax.numpy as jnp
        B = peq_flat.shape[0]
        peq, tg = self._packed(peq_flat, targets, hi, shared)
        lo_t = self.pack_lanes(lo)
        hi_t = self.pack_lanes(hi)
        best_t = self.pack_lanes(np.asarray(best, np.int64), fill=-(1 << 30))
        masks = sweep_hits_pallas(jnp.asarray(peq), jnp.asarray(tg),
                                  jnp.asarray(lo_t), jnp.asarray(hi_t),
                                  jnp.asarray(best_t), hin0=hin0,
                                  chunk=self.chunk, shared=shared,
                                  interpret=self.interpret)
        return self._decode_mask_rows(masks, B)


# ---------------------------------------------------------------------------
# Column-capture kernel (round 4): batched device PATH for small windows.
#
# The reference's small-window PATH stores every column's (Pv, Mv) during the
# NW sweep and bit-walks them back (edlib.cpp:883-893 capture + 976-1134
# walk).  Batched TPU equivalent: this kernel is the full-sweep engine with
# the per-column state *stored* instead of reduced — (chunk*NW, 8, 128)
# uint32 output blocks per grid step, pipelined VMEM->HBM while the next
# chunk computes.  No score output is needed: every cell value decodes from
# the TOP boundary anchor, cell(r, c) = (c+1) + sum_{i<=r}(P_i - M_i), so
# the decode is a prefix sum over unpacked bits (path/batched.py does this
# plus the batched walk on device).
# ---------------------------------------------------------------------------


def _advance_word_h(Pv, Mv, Eq, hin_neg_u, hin_pos_u):
    """_advance_word that also returns the UNSHIFTED horizontal delta
    masks (Ph bit i = [cell(i,c) - cell(i,c-1) == +1], Mh likewise -1) —
    the per-row horizontal deltas the traceback preference needs."""
    Xv = Eq | Mv
    Eq = Eq | hin_neg_u
    Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq
    Ph = Mv | ~(Xh | Pv)
    Mh = Pv & Xh
    hout_pos = Ph >> 31
    hout_neg = Mh >> 31
    Phs = (Ph << 1) | hin_pos_u
    Mhs = (Mh << 1) | hin_neg_u
    PvOut = Mhs | ~(Xv | Phs)
    MvOut = Phs & Xv
    return PvOut, MvOut, hout_neg, hout_pos, Ph, Mh


def _capture_kernel(*refs, n_words: int, sigma1: int, chunk: int, hin0: int,
                    shared: bool, unroll: int, want_h: bool = False):
    """pvo/mvo_ref: (chunk*n_words, 8, 128) uint32 per grid step — column c's
    word w lands at row c*n_words + w (5-D blocks keep Mosaic layouts).
    want_h also stores the per-column horizontal delta masks (Ph, Mh):
    the traceback's move preference is a pure bitwise function of
    (Pv, Ph, Mh) — no prefix-sum decode needed (path/batched.py)."""
    if want_h:
        (targets_ref, peq_ref, pvo_ref, mvo_ref, pho_ref, mho_ref,
         pv_ref, mv_ref) = refs
    else:
        (targets_ref, peq_ref, pvo_ref, mvo_ref, pv_ref, mv_ref) = refs
    t_step = pl.program_id(1)

    @pl.when(t_step == 0)
    def _reset():
        pv_ref[...] = jnp.full((n_words, SUBLANES, LANES), _ONES, jnp.uint32)
        mv_ref[...] = jnp.zeros((n_words, SUBLANES, LANES), jnp.uint32)

    def column(c, carry):
        pvs, mvs = carry
        sym = targets_ref[0, c] if shared else targets_ref[c]
        hin_neg = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        if hin0 == 0:
            hin_pos = jnp.zeros((SUBLANES, LANES), jnp.uint32)
        else:
            hin_pos = jnp.ones((SUBLANES, LANES), jnp.uint32)
        new_pvs, new_mvs = [], []
        for w in range(n_words):
            eq = _fetch_eq(peq_ref, sym, w, sigma1, shared)
            if want_h:
                pv, mv, hin_neg, hin_pos, ph, mh = _advance_word_h(
                    pvs[w], mvs[w], eq, hin_neg, hin_pos)
                pho_ref[c * n_words + w] = ph
                mho_ref[c * n_words + w] = mh
            else:
                pv, mv, hin_neg, hin_pos = _advance_word(
                    pvs[w], mvs[w], eq, hin_neg, hin_pos)
            pvo_ref[c * n_words + w] = pv
            mvo_ref[c * n_words + w] = mv
            new_pvs.append(pv)
            new_mvs.append(mv)
        return tuple(new_pvs), tuple(new_mvs)

    def columns(i, carry):
        for j in range(unroll):
            carry = column(i * unroll + j, carry)
        return carry

    carry0 = (tuple(pv_ref[w] for w in range(n_words)),
              tuple(mv_ref[w] for w in range(n_words)))
    pvs, mvs = jax.lax.fori_loop(0, chunk // unroll, columns, carry0)
    for w in range(n_words):
        pv_ref[w] = pvs[w]
        mv_ref[w] = mvs[w]


def _sweep_capture_call(peq: jnp.ndarray, targets: jnp.ndarray, hin0: int,
                        chunk: int = 128, shared: bool = False,
                        interpret: bool = False, want_h: bool = False):
    """Unjitted capture sweep: per-column (Pv, Mv[, Ph, Mh]) words to HBM.

    Returns 2 (or 4 with want_h) uint32 arrays, each
    (n_tiles, n_chunks, chunk*NW, 8, 128).
    """
    n_tiles, sigma1, n_words = peq.shape[:3]
    n_chunks = targets.shape[0] if shared else targets.shape[1]
    if interpret:
        unroll = 1
    else:
        unroll = 8 if chunk % 8 == 0 else 1
    kernel = functools.partial(_capture_kernel, n_words=n_words,
                               sigma1=sigma1, chunk=chunk, hin0=hin0,
                               shared=shared, unroll=unroll, want_h=want_h)
    if shared:
        t_spec = pl.BlockSpec((None, 1, chunk), lambda i, j: (j, 0, 0),
                              memory_space=pltpu.SMEM)
    else:
        t_spec = pl.BlockSpec((None, None, chunk, SUBLANES, LANES),
                              lambda i, j: (i, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    cap_spec = pl.BlockSpec((None, None, chunk * n_words, SUBLANES, LANES),
                            lambda i, j: (i, j, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    cap_shape = jax.ShapeDtypeStruct(
        (n_tiles, n_chunks, chunk * n_words, SUBLANES, LANES), jnp.uint32)
    n_out = 4 if want_h else 2
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            t_spec,
            pl.BlockSpec((None, sigma1, n_words, SUBLANES, LANES),
                         lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(cap_spec for _ in range(n_out)),
        out_shape=tuple(cap_shape for _ in range(n_out)),
        scratch_shapes=[
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
            pltpu.VMEM((n_words, SUBLANES, LANES), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(targets, peq)


def capture_flat_device(peq: jnp.ndarray, targets: jnp.ndarray, hin0: int,
                        chunk: int = 128, interpret: bool = False,
                        want_h: bool = False):
    """Flat-layout capture sweep (traceable): peq (B, S1, NW) uint32,
    targets (B, T) int32 per-lane windows (pad columns with the wildcard
    symbol — their captured words are ignored by the walk).  Returns
    (pv, mv) — plus (ph, mh) horizontal delta masks with want_h — each
    uint32 (B, Tp, NW) with Tp = T rounded up to chunk.
    """
    B, S1, NW = peq.shape
    T = targets.shape[1]
    n_tiles = -(-B // B_TILE)
    n_chunks = -(-T // chunk)
    Bp, Tp = n_tiles * B_TILE, n_chunks * chunk
    peq_p = jnp.full((Bp, S1, NW), _ONES, jnp.uint32).at[:B].set(peq)
    peq_t = jnp.transpose(
        peq_p.reshape(n_tiles, SUBLANES, LANES, S1, NW), (0, 3, 4, 1, 2))
    tg_p = jnp.full((Bp, Tp), S1 - 1, jnp.int32).at[:B, :T].set(targets)
    tg_t = jnp.transpose(
        tg_p.reshape(n_tiles, SUBLANES, LANES, n_chunks, chunk),
        (0, 3, 4, 1, 2))
    caps = _sweep_capture_call(peq_t, tg_t, hin0=hin0, chunk=chunk,
                               interpret=interpret, want_h=want_h)

    def unpack(cap):
        # (n_tiles, n_chunks, chunk*NW, 8, 128) -> (B, Tp, NW)
        c5 = cap.reshape(n_tiles, n_chunks, chunk, NW, SUBLANES, LANES)
        return jnp.transpose(c5, (0, 4, 5, 1, 2, 3)).reshape(Bp, Tp, NW)[:B]

    return tuple(unpack(c) for c in caps)
