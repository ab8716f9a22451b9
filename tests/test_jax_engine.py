"""Batched JAX engine vs host big-int engine: identical score streams."""

import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import host as host_engine
from edlib_tpu.ops import jax_engine
from edlib_tpu.types import AlignMode


def build_batch(rng, B, sigma=4, qmax=90, tmax=300):
    """Random batch with ragged lengths; returns packed device inputs plus
    per-pair host data."""
    pairs = []
    n_words = 1
    for _ in range(B):
        qlen = rng.randint(1, qmax)
        tlen = rng.randint(1, tmax)
        q = rng.randint(0, sigma, qlen).astype(np.uint8)
        t = rng.randint(0, sigma, tlen).astype(np.uint8)
        pairs.append((q, t))
        n_words = max(n_words, encode.num_words(qlen))
    eq = np.eye(sigma, dtype=bool)
    t_scan = max(len(t) for _, t in pairs) + n_words * 32  # room for W pad
    peq = np.zeros((B, sigma + 1, n_words), dtype=np.uint32)
    targets = np.full((B, t_scan), sigma, dtype=np.int32)  # wildcard filler
    ws = []
    for b, (q, t) in enumerate(pairs):
        peq[b] = encode.build_peq_words(q, eq, n_words=n_words)
        targets[b, :len(t)] = t
        ws.append(n_words * 32 - len(q))
    return pairs, eq, peq, targets, np.array(ws)


@pytest.mark.parametrize("mode", [AlignMode.HW, AlignMode.SHW])
def test_semiglobal_matches_host(mode, rng):
    pairs, eq, peq, targets, ws = build_batch(rng, B=16)
    scores = np.asarray(jax_engine.semiglobal_scores_batch(
        peq, targets, mode_is_hw=(mode == AlignMode.HW)))
    for b, (q, t) in enumerate(pairs):
        hpeq = encode.build_peq_bigint(q, eq)
        host = host_engine.semiglobal_scores(hpeq, t, len(q), mode)
        W = ws[b]
        got = scores[b, W:W + len(t)]
        np.testing.assert_array_equal(got, host)


def test_nw_matches_host(rng):
    pairs, eq, peq, targets, ws = build_batch(rng, B=16)
    scores = np.asarray(jax_engine.nw_scores_batch(peq, targets))
    for b, (q, t) in enumerate(pairs):
        hpeq = encode.build_peq_bigint(q, eq)
        state, _, _ = host_engine.nw_run(hpeq, t, len(q))
        assert scores[b, ws[b] + len(t) - 1] == state.score


def test_capture_matches_scores(rng):
    pairs, eq, peq, targets, ws = build_batch(rng, B=4, qmax=70, tmax=100)
    Ps, Ms, scores = jax_engine.sweep_capture(peq, targets, hin0=1)
    s2 = np.asarray(jax_engine.sweep_scores(peq, targets, hin0=1))
    np.testing.assert_array_equal(np.asarray(scores), s2)
    # Decoded cells of the last block must be consistent with the bottom
    # score stream and with the host column decode.
    Ps, Ms = np.asarray(Ps), np.asarray(Ms)
    for b, (q, t) in enumerate(pairs):
        hpeq = encode.build_peq_bigint(q, eq)
        provider = host_engine.HostColumnProvider(hpeq, t, len(q))
        n_words = peq.shape[2]
        for c in [0, len(t) // 2, len(t) - 1]:
            cells = jax_engine.decode_block_cells(
                Ps[b, c], Ms[b, c], np.asarray(scores)[b, c]
                - 32 * np.arange(n_words - 1, -1, -1))
            # Wrong bottoms for all but the last block; check last block only.
            last = cells[-1]
            host_cells = provider.cells(c)[1:]  # true cells rows 0..Q-1
            qlen = len(q)
            lo = (n_words - 1) * 32
            n_real = qlen - lo
            if n_real > 0:
                np.testing.assert_array_equal(last[:n_real],
                                              host_cells[lo:lo + n_real])


def test_calculate_block_matches_host_advance(rng):
    """Single-word fuzz: the uint32 block update == big-int advance."""
    import jax.numpy as jnp
    for _ in range(200):
        qlen = rng.randint(1, 33)
        mask = (1 << qlen) - 1
        Pv = rng.randint(0, 1 << 32, dtype=np.uint64) & mask
        Mv = rng.randint(0, 1 << 32, dtype=np.uint64) & mask & ~Pv
        Eq = rng.randint(0, 1 << 32, dtype=np.uint64) & mask
        hin = int(rng.randint(-1, 2))
        hPv, hMv, hout = host_engine.advance_column(
            int(Pv), int(Mv), int(Eq), hin, mask, 1 << (qlen - 1))
        # Pad to 32 bits with wildcard rows (Eq ones above qlen, Pv ones).
        pad = ((1 << 32) - 1) ^ mask
        jP, jM, jh = jax_engine.calculate_block(
            jnp.uint32(int(Pv) | pad), jnp.uint32(int(Mv)),
            jnp.uint32(int(Eq) | pad), jnp.int32(hin))
        assert (int(jP) & mask) == hPv
        assert (int(jM) & mask) == hMv
        # hout of the padded word corresponds to the padded bottom cell, not
        # row qlen-1, so only compare when the word is full.
        if qlen == 32:
            assert int(jh) == hout
