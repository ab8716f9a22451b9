"""Exact MXU q-gram prefilter for batched HW read mapping.

The reference prunes its DP with a value-adaptive Ukkonen band
(edlib.cpp:601-642) — inherently serial, per-read machinery.  The batched
TPU equivalent of that pruning is *candidate elimination before the DP*:
a q-gram filter whose bound is PROVABLE, computed as one big bf16 matmul
so the MXU (not the VPU) carries the work.  Only the few candidate
windows that survive are verified by the bit-parallel Pallas kernel; a
full sweep backstops the (rare) unresolved reads, so results are exact.

Soundness (distinct-gram form of the q-gram lemma):
  If read R (length m, with D distinct q-gram values among its m-q+1
  q-gram occurrences) aligns inside target window W with <= k errors,
  then each of the <= k edit operations destroys at most q of R's gram
  OCCURRENCES, hence at most q distinct gram VALUES lose their last
  occurrence; every surviving value is a literal substring of W.  So at
  least D - k*q of R's distinct gram values occur in W.

  We compute   C[b, w] = sum_g pres_read[b, g] * pres_win[w, g]
  (both factors binary presence bitmaps) — C is exactly the number of
  distinct shared gram values, therefore
      C[b, w] < D_b - k*q   ==>   no <=k hit of read b lies fully
                                  inside window w.
  The filter only ever REMOVES provably-dead windows — never a true hit.
  D_b = sum_g pres_read[b, g] is a row reduction of the same bitmap.

Window geometry: windows of length L at stride s cover every alignment
span iff s <= L - P + 1 where P = m + k is the maximum span length
(an alignment with <= k errors spans m - dels + ins <= m + k target
positions).  With s <= L - P + 1, window floor(a/s) contains any span
starting at a, so every potential hit is fully inside >= 1 window.

Exact arithmetic: presence entries are 0/1 (exact in bf16), products are
0/1, and the MXU accumulates in f32 (exact integers < 2^24).

Out-of-alphabet / padding symbols only ever ADD presence (ids clamp into
range; read-side invalid grams route to a trash column), which keeps the
bound one-sided: false candidates cost verification time, never
correctness.

Equality extensions (additionalEqualities) break literal-gram matching,
so callers must route non-identity alphabets to the full sweep.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_VOCAB = 1 << 16      # sigma**q cap: presence table width


def choose_q(sigma: int, qlen_min: int, k: int, L: int,
             n_sigma_noise: float = 6.0,
             max_vocab: Optional[int] = None,
             bump: bool = True) -> Optional[int]:
    """Smallest q whose filter is sound AND effective, or None.

    Sound: threshold tau = (qlen_min - q + 1) - k*q >= 1 (worst case
    D = m - q + 1, all grams distinct).  Effective: tau clears the
    random-window shared-gram count by n_sigma_noise standard deviations
    (normal approx of C ~ Bin(m', p), p = expected gram presence in an
    L-window), so random windows essentially never pass.

    Real targets are NOT random: correlated oligo usage gives genome
    windows a far fatter shared-gram tail than the binomial model (on the
    1 Mbp chromosome the model's q=5 leaves 22% of reads with > maxc
    passing windows; q=6 leaves 4 of 10240).  One extra order of q costs
    nothing on the MXU (the presence matmul is vocab-independent in time
    up to the HBM cap), so bump q by one whenever that stays sound.

    max_vocab: the caller's presence-table budget (e.g. its HBM bound for
    (n_win + B) rows of sigma**q + 1 bf16 entries); the bump — and the
    base choice — only pick a q whose vocab fits, so a too-ambitious bump
    degrades to the un-bumped q instead of disabling the filter.
    """
    if sigma < 2 or qlen_min < 2 or k < 0:
        return None
    cap = MAX_VOCAB if max_vocab is None else min(MAX_VOCAB, max_vocab)
    chosen = None
    for q in range(2, 17):
        vocab = sigma ** q
        if vocab > cap:
            return None
        m_eff = qlen_min - q + 1
        if m_eff < 1:
            continue
        tau = m_eff - k * q
        if tau < 1:
            continue
        p = 1.0 - (1.0 - 1.0 / vocab) ** max(1, L - q + 1)
        mu = m_eff * p
        sd = math.sqrt(max(1e-9, m_eff * p * (1.0 - p)))
        if tau > mu + n_sigma_noise * sd:
            chosen = q
            break
    if chosen is None or not bump:
        # bump=False: callers running the index-derived auto-tuner start
        # at the model's minimal q and escalate ON EVIDENCE — the filter
        # matmul is FLOP-bound at vocab = sigma**q (measured at MXU
        # peak), so one needless order of q costs sigma x the FLOPs.
        return chosen
    q2 = chosen + 1
    if (sigma ** q2 <= cap and qlen_min - q2 + 1 >= 1
            and (qlen_min - q2 + 1) - k * q2 >= 1):
        return q2
    return chosen


def window_geometry(tlen: int, qmax: int, k: int,
                    L: Optional[int] = None) -> Optional[Tuple[int, int, int]]:
    """(L, stride, n_win) covering every possible <=k alignment span.

    None when the target is too short for windowed filtering to help
    (fewer than 4 windows — just sweep it)."""
    P = qmax + k
    if L is None:
        # Window ~2x the span, rounded to the 128-lane grain.
        L = max(256, -(-2 * P // 128) * 128)
    stride = L - P + 1
    if stride < 1 or tlen <= L:
        return None
    n_win = (tlen - L + stride - 1) // stride + 1
    if n_win < 4:
        return None
    return L, stride, n_win


def _gram_ids(ids, q: int, sigma: int):
    """Rolling gram ids of an int32 sequence (jnp): out[i] = sum_j
    clamp(ids[i+j]) * sigma^j for i in [0, N-q].  Out-of-alphabet symbols
    clamp to 0 (sound: can only add presence)."""
    n = ids.shape[-1]
    c = jnp.clip(ids, 0, sigma - 1).astype(jnp.int32)
    out = jnp.zeros(ids.shape[:-1] + (n - q + 1,), jnp.int32)
    for j in range(q):
        out = out + c[..., j:n - q + 1 + j] * (sigma ** j)
    return out


@functools.partial(jax.jit, static_argnames=("sigma", "q", "L", "stride",
                                             "n_win"))
def window_presence(t_ids, sigma: int, q: int, L: int, stride: int,
                    n_win: int):
    """bf16 (n_win, sigma**q) binary gram-presence table of the target's
    length-L windows at the given stride (windows past the end read
    clamped symbols — extra presence only, sound)."""
    vocab = sigma ** q
    tlen = t_ids.shape[0]
    gids = _gram_ids(t_ids, q, sigma)                     # (tlen - q + 1,)
    starts = jnp.arange(n_win, dtype=jnp.int32) * stride
    span = L - q + 1
    idx = jnp.clip(starts[:, None] + jnp.arange(span)[None, :], 0,
                   tlen - q)                              # (n_win, span)
    win_gids = gids[idx]
    pres = jnp.zeros((n_win, vocab), jnp.bfloat16)
    return pres.at[jnp.arange(n_win)[:, None], win_gids].set(
        jnp.bfloat16(1))


@functools.partial(jax.jit, static_argnames=("sigma", "q"))
def read_gram_presence(q_ids, qlens, sigma: int, q: int):
    """bf16 (B, sigma**q) binary gram presence per read, plus int32 (B,)
    distinct-gram counts D_b.  Grams crossing a read's qlen boundary are
    dropped (exact per-read presence).

    Computed as a batched one-hot outer product on the MXU — split gid =
    hi*Blo + lo, counts[b,hi,lo] = sum_j onehot(hi_j) x onehot(lo_j),
    presence = min(counts, 1) — instead of a row scatter (TPU scatters
    serialize; this is one einsum).  Counts <= qmax stay exact in f32."""
    vocab = sigma ** q
    B, qmax = q_ids.shape
    m = qmax - q + 1
    gids = _gram_ids(q_ids, q, sigma)                     # (B, m)
    valid = jnp.arange(m)[None, :] <= (qlens - q)[:, None]
    Ahi = sigma ** (q // 2)
    Blo = vocab // Ahi
    if Blo <= 512:
        hi = jnp.where(valid, gids // Blo, -1)            # -1 -> zero row
        lo = gids % Blo
        oh_hi = jax.nn.one_hot(hi, Ahi, dtype=jnp.bfloat16)
        oh_lo = jax.nn.one_hot(lo, Blo, dtype=jnp.bfloat16)
        counts = jnp.einsum("bmi,bmj->bij", oh_hi, oh_lo,
                            preferred_element_type=jnp.float32)
        pres = jnp.minimum(counts, 1.0).astype(jnp.bfloat16)
        pres = pres.reshape(B, vocab)
    else:  # huge vocab (sigma**q > ~256k): scatter fallback
        gids = jnp.where(valid, gids, vocab)              # trash column
        pres = jnp.zeros((B, vocab + 1), jnp.bfloat16)
        pres = pres.at[jnp.arange(B)[:, None], gids].set(jnp.bfloat16(1))
        pres = pres[:, :vocab]
    distinct = pres.sum(1, dtype=jnp.float32).astype(jnp.int32)
    return pres, distinct


def candidate_counts(read_pres, win_pres):
    """f32 (B, n_win) distinct shared-gram counts: ONE bf16 MXU matmul
    (exact integer arithmetic, see module docstring)."""
    return jnp.dot(read_pres, win_pres.T,
                   preferred_element_type=jnp.float32)


_BIG = 1 << 30


def verify_cols(L: int, nw: int, chunk: int) -> int:
    """Scan width of one verification lane (window + wildcard extension,
    rounded to the chunk grain)."""
    return -(-(L + nw * 32) // chunk) * chunk


@functools.partial(jax.jit, static_argnames=("sigma", "q", "L", "stride",
                                             "n_win", "Lv"))
def build_target_index(t_ids, sigma: int, q: int, L: int, stride: int,
                       n_win: int, Lv: int):
    """Per-target index, built ONCE and reused across read batches:
      win_pres (n_win, sigma**q) bf16 — window gram-presence bitmap;
      win_syms (n_win, Lv) int32 — each window's verification target row
        (window slice; wildcard symbols past tlen so boundary windows
        flush their last W positions; interior windows keep real target
        symbols past L in their tail — harmless, the reduce masks columns
        >= hi and the wildcard query rows carry the diagonal regardless).
    """
    tlen = t_ids.shape[0]
    win_pres = window_presence(t_ids, sigma, q, L, stride, n_win)
    ws = jnp.arange(n_win, dtype=jnp.int32) * stride
    base_idx = ws[:, None] + jnp.arange(Lv, dtype=jnp.int32)
    win_syms = jnp.where(base_idx < tlen,
                         t_ids[jnp.clip(base_idx, 0, tlen - 1)], sigma)
    return win_pres, win_syms


def _top_candidates(Cm, maxc: int):
    """Top-maxc (value, index) per row, two-stage tournament.

    lax.top_k full-sorts n_win (~19 ms at 4k x 4k) and a flat argmax
    ladder re-reads the whole matrix maxc times; instead keep a per-64-
    column segment max and, per pick, re-read only the winning segment
    (argmax over n_win/64 + one 64-wide gather/scatter) — one full pass
    total instead of maxc.  Which windows are picked only matters when
    more than maxc pass the filter, and that case is reported unresolved
    (callers fall back), so tie-break differences are unobservable."""
    B, n_win = Cm.shape
    G = 64
    S = -(-n_win // G)
    Cp = jnp.pad(Cm, ((0, 0), (0, S * G - n_win)), constant_values=-2.0)
    Cp = Cp.reshape(B, S, G)
    seg_max = Cp.max(2)                                   # (B, S)

    def ladder(M, m):
        """Flat repeated-argmax top-m over a SMALL matrix (no scatters —
        TPU scatters serialize; where-masking a small row is free)."""
        cols = jnp.arange(M.shape[1], dtype=jnp.int32)[None, :]
        vs, ix = [], []
        for _ in range(m):
            j = jnp.argmax(M, 1).astype(jnp.int32)
            vs.append(jnp.take_along_axis(M, j[:, None], 1)[:, 0])
            ix.append(j)
            M = jnp.where(cols == j[:, None], -2.0, M)
        return jnp.stack(vs, 1), jnp.stack(ix, 1)

    # The top-m elements lie inside the top-m segments by segment-max
    # (if an element beat one of those segments' maxes it would displace
    # it), so: rank segments, gather their columns, rank elements there.
    n_seg = min(maxc, S)
    _, seg_ids = ladder(seg_max, n_seg)                   # (B, n_seg)
    sub = jnp.take_along_axis(Cp, seg_ids[:, :, None], 1)  # (B, n_seg, G)
    vals, flat = ladder(sub.reshape(B, n_seg * G), maxc)
    seg_of = jnp.take_along_axis(seg_ids, flat // G, 1)   # (B, maxc)
    return vals, seg_of * G + flat % G


@functools.partial(jax.jit, static_argnames=(
    "sigma", "q", "L", "stride", "tlen", "k", "maxc", "nw", "chunk",
    "interpret"))
def filter_verify_batch(q_arr, qlens, win_pres, win_syms, *, sigma: int,
                        q: int, L: int, stride: int, tlen: int, k: int,
                        maxc: int, nw: int, chunk: int = 256,
                        interpret: bool = False):
    """Filter + verify one read batch against a prebuilt target index.

    q_arr: int32 (B, qmax) transformed reads; qlens: int32 (B,).  Returns
      gbest (B,) int32 — exact best HW score when the read RESOLVED and
        gbest <= k; > k (up to _BIG) means proven best > k;
      gpos (B,) int32 — first best end position (real target coords);
      resolved (B,) bool — False when more than maxc windows passed the
        filter (top-maxc by count were verified, but a hit could hide in
        an unverified window: caller must fall back to the full sweep).

    MXU filter (candidate_counts) -> top-maxc candidate windows by count
    -> per-lane windowed Pallas verification (select-chain kernels for
    small alphabets; bit-plane kernels beyond sigma=32, where the S1-way
    select costs more to run AND compile) -> on-device combine.
    Position semantics: every verified window's score stream dominates
    the global one (fewer allowed starts) and touches it exactly on
    spans it contains, so min-combining (score, first-pos) over
    candidate windows reproduces the global (best, first best end
    position) whenever the true best is <= k — the window containing the
    globally-first best span reports exactly that column, and any other
    window reporting the same score does so at a true best column >= it.
    """
    from edlib_tpu.ops.pallas_kernel import (bitplane_identity_operands,
                                             build_peq_device,
                                             reduce_flat_device,
                                             reduce_flat_device_bitplane)
    q_arr = q_arr.astype(jnp.int32)   # callers may ship uint8 (4x less
    B = q_arr.shape[0]                # host->device traffic for the reads)
    read_pres, distinct = read_gram_presence(q_arr, qlens, sigma, q)
    C = candidate_counts(read_pres, win_pres)             # (B, n_win)
    tau = (distinct - k * q).astype(jnp.float32)          # per-read
    passing = C >= tau[:, None]
    n_pass = passing.sum(1, dtype=jnp.int32)
    Cm = jnp.where(passing, C, -1.0)
    vals, widx = _top_candidates(Cm, maxc)                # (B, maxc)
    valid = vals >= 0.0
    starts = widx * stride                                # (B, maxc)
    W = nw * 32 - qlens                                   # (B,)
    l_eff = jnp.minimum(L, tlen - starts)                 # (B, maxc)
    # Window rows come from the prebuilt index, candidates row-gathered:
    # scan target = window slice then wildcard extension (bottom-row score
    # at scan col c == true score at col c - W_b).
    sym = win_syms[widx]                                  # (B, maxc, Lv)
    targets = sym.reshape(B * maxc, win_syms.shape[1])
    lo = jnp.broadcast_to(W[:, None], (B, maxc)).reshape(B * maxc)
    hi = (W[:, None] + l_eff).reshape(B * maxc)
    if sigma > 32:
        # The filter requires identity equality (module docstring), so
        # the bit-plane q_alts are just the reads (E=1) with the
        # trailing pad rows riding the pad mask.
        q_alts, pad_words = bitplane_identity_operands(q_arr, qlens,
                                                       sigma, nw)
        best_c, pf_c, _, _ = reduce_flat_device_bitplane(
            jnp.repeat(q_alts, maxc, axis=0),
            jnp.repeat(pad_words, maxc, axis=0), targets, lo, hi,
            hin0=0, sigma=sigma, chunk=chunk, interpret=interpret)
    else:
        peq = build_peq_device(q_arr, qlens, sigma, nw)   # (B, S1, NW)
        peq_rep = jnp.repeat(peq, maxc, axis=0)
        best_c, pf_c, _, _ = reduce_flat_device(
            peq_rep, targets, lo, hi, hin0=0, chunk=chunk,
            interpret=interpret)
    best_c = jnp.where(valid, best_c.reshape(B, maxc), _BIG)
    pf_c = pf_c.reshape(B, maxc)
    gbest = best_c.min(1)
    gpos_c = starts + pf_c - W[:, None]                   # real coords
    gpos = jnp.where(best_c == gbest[:, None], gpos_c, _BIG).min(1)
    resolved = n_pass <= maxc
    return gbest, gpos, resolved


@functools.partial(jax.jit, static_argnames=("sigma", "q", "k"))
def sample_pass_counts(q_arr, qlens, win_pres, sigma: int, q: int, k: int):
    """Per-sample passing-window counts — the filter's own first stage run
    on probe reads (exactly read_gram_presence -> candidate_counts ->
    threshold), used to measure a target's shared-gram tail."""
    pres, distinct = read_gram_presence(q_arr, qlens, sigma, q)
    C = candidate_counts(pres, win_pres)
    tau = (distinct - k * q).astype(jnp.float32)
    return (C >= tau[:, None]).sum(1, dtype=jnp.int32)


_MAXC_LADDER = (4, 8, 16, 32, 64)


def auto_tune(t_np, sigma: int, q0: int, k: int, qlen_min: int, L: int,
              stride: int, n_win: int, Lv: int, index_builder,
              n_samples: int = 128, max_vocab: Optional[int] = None):
    """(q, maxc, win_pres, win_syms, pred_resolved) derived from the
    TARGET INDEX ITSELF, or (None, ...) when no sound q bounds the
    shared-gram tail (repeat-rich targets where candidate elimination
    cannot work and the full sweep is the honest route).

    The noise model in choose_q assumes random targets; real genomes have
    fatter tails and repeat-rich targets (tandem repeats, homopolymer
    runs) blow them up entirely — n_pass approaches n_win, resolution
    collapses, and every read pays the fallback.  Instead of hardcoding
    maxc, probe reads sampled FROM the target run the filter's own first
    stage against the index (sample_pass_counts): the p99 pass count
    picks maxc from the ladder, and if even maxc=64 leaves >10% of
    probes unresolved the filter reports itself useless (q escalates
    first while sound and within the vocab budget).  Probes carry k
    substitutions — the WORST read the filter must still resolve: a
    mutated read's tau = D - k*q sits ~k*q below an error-free probe's,
    so error-free probes overstate the margin and accept a q whose
    mutated-read tail explodes (measured: q=5 at 1 Mbp passes error-free
    probes but leaves 22% of 5%-mutated reads with >16 windows).

    index_builder(q) -> (win_pres, win_syms) builds (or returns cached)
    the index for a given q, so accepted q's index is reused by the
    actual filter call.
    """
    cap = MAX_VOCAB if max_vocab is None else min(MAX_VOCAB, max_vocab)
    rng = np.random.RandomState(12345)
    starts = rng.randint(0, max(1, len(t_np) - qlen_min), n_samples)
    probes = np.stack([t_np[s:s + qlen_min] for s in starts]).astype(
        np.int32)
    if k > 0 and sigma > 1:
        # Design-point load: k substitutions per probe (<= k edits).
        rows = np.arange(n_samples)[:, None]
        pos = rng.randint(0, qlen_min, (n_samples, k))
        delta = rng.randint(1, sigma, (n_samples, k)).astype(np.int32)
        probes[rows, pos] = (probes[rows, pos] + delta) % sigma
    qlens = jnp.full((n_samples,), qlen_min, jnp.int32)
    q_try = q0
    last_resort = None
    while True:
        win_pres, win_syms = index_builder(q_try)
        n_pass = np.asarray(sample_pass_counts(
            jnp.asarray(probes), qlens, win_pres, sigma, q_try, k))
        p99 = int(np.percentile(n_pass, 99))
        for maxc in _MAXC_LADDER[:-1]:
            # Clean acceptance ladder tops out at 32: a 64-candidate
            # verify costs ~8x the typical 8 AND usually rides with a
            # fat unresolved tail — one more order of q is cheaper
            # (measured at 1 Mbp: q=5/maxc=64 maps 3x slower than
            # q=6/maxc=8).  64 stays available as the last resort below.
            if p99 + 5 <= maxc:
                pred = float((n_pass <= maxc).mean())
                return q_try, maxc, win_pres, win_syms, pred
        pred64 = float((n_pass <= _MAXC_LADDER[-1]).mean())
        if pred64 >= 0.9 and last_resort is None:
            last_resort = (q_try, _MAXC_LADDER[-1], win_pres, win_syms,
                           pred64)
        if int(np.median(n_pass)) > max(_MAXC_LADDER[-1], n_win // 8):
            # The TYPICAL probe matches a large fraction of all windows:
            # exact repeats share every gram at any q, so escalating only
            # burns index builds (vocab x sigma each step) — bail now.
            break
        q2 = q_try + 1
        m_eff2 = qlen_min - q2 + 1
        if sigma ** q2 > cap or m_eff2 < 1 or m_eff2 - k * q2 < 1:
            break
        q_try = q2
    if last_resort is not None:
        return last_resort
    return None, 0, None, None, 0.0


def filter_verify_map(q_arr, qlens, t_ids, *, sigma: int, q: int, L: int,
                      stride: int, n_win: int, k: int, maxc: int, nw: int,
                      chunk: int = 256, interpret: bool = False):
    """One-shot convenience: build the target index, then filter + verify
    (see filter_verify_batch; callers mapping many batches against one
    target should build the index once via build_target_index)."""
    Lv = verify_cols(L, nw, chunk)
    win_pres, win_syms = build_target_index(t_ids, sigma, q, L, stride,
                                            n_win, Lv)
    return filter_verify_batch(
        q_arr, qlens, win_pres, win_syms, sigma=sigma, q=q, L=L,
        stride=stride, tlen=t_ids.shape[0], k=k, maxc=maxc, nw=nw,
        chunk=chunk, interpret=interpret)
