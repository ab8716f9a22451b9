"""Pallas TPU kernel vs XLA engine — identical score streams.

Runs in Pallas interpreter mode on CPU (real-TPU execution is exercised by
bench.py / __graft_entry__.py on hardware).
"""

import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import jax_engine
from edlib_tpu.ops.pallas_kernel import PallasSweeper


@pytest.mark.parametrize("hin0", [0, 1])
def test_pallas_matches_xla(hin0, rng):
    B, sigma, NW, T = 12, 4, 3, 160
    eq = np.eye(sigma, dtype=bool)
    peq = np.zeros((B, sigma + 1, NW), np.uint32)
    tg = np.full((B, T), sigma, np.int32)
    for b in range(B):
        qlen = rng.randint(40, NW * 32 + 1)
        tlen = rng.randint(20, T - NW * 32)
        q = rng.randint(0, sigma, qlen).astype(np.uint8)
        t = rng.randint(0, sigma, tlen).astype(np.uint8)
        peq[b] = encode.build_peq_words(q, eq, n_words=NW)
        tg[b, :tlen] = t
    sweeper = PallasSweeper(chunk=32, interpret=True)
    s_pallas = sweeper.sweep(peq, tg, hin0=hin0)
    s_xla = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=hin0))
    np.testing.assert_array_equal(s_pallas, s_xla)


def test_pallas_multi_tile_padding(rng):
    """Batch that isn't a multiple of the 1024-lane tile, T not a multiple
    of the chunk — padding must not perturb real elements."""
    B, sigma, NW, T = 5, 3, 1, 45
    eq = np.eye(sigma, dtype=bool)
    peq = np.zeros((B, sigma + 1, NW), np.uint32)
    tg = np.full((B, T), sigma, np.int32)
    for b in range(B):
        q = rng.randint(0, sigma, rng.randint(1, 33)).astype(np.uint8)
        peq[b] = encode.build_peq_words(q, eq, n_words=NW)
        tg[b, :40] = rng.randint(0, sigma, 40)
    sweeper = PallasSweeper(chunk=32, interpret=True)
    s_pallas = sweeper.sweep(peq, tg, hin0=1)
    s_xla = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=1))
    np.testing.assert_array_equal(s_pallas, s_xla)


def test_max_sigma1_caps():
    from edlib_tpu.ops.pallas_kernel import max_sigma1
    assert max_sigma1(4, shared=True) == 257    # full byte alphabet fits
    assert max_sigma1(64, shared=True) == 96    # VMEM-bound (24MiB Peq)
    assert max_sigma1(4, shared=False) == 64    # select-chain bound
    assert max_sigma1(512, shared=False) == 12  # VMEM-bound


@pytest.mark.parametrize("sigma", [25, 60])
@pytest.mark.slow
def test_pallas_large_alphabet_general(sigma, rng):
    """Per-lane-target kernels at protein/extended alphabets (select
    chain) — exact vs the XLA engine."""
    B, NW, T = 8, 2, 96
    eq = np.eye(sigma, dtype=bool)
    peq = np.zeros((B, sigma + 1, NW), np.uint32)
    tg = np.full((B, T), sigma, np.int32)
    for b in range(B):
        q = rng.randint(0, sigma, rng.randint(30, NW * 32 + 1)
                        ).astype(np.uint8)
        tlen = rng.randint(20, T - NW * 32)
        tg[b, :tlen] = rng.randint(0, sigma, tlen)
        peq[b] = encode.build_peq_words(q, eq, n_words=NW)
    sweeper = PallasSweeper(chunk=32, interpret=True)
    s_pallas = sweeper.sweep(peq, tg, hin0=0)
    s_xla = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=0))
    np.testing.assert_array_equal(s_pallas, s_xla)


@pytest.mark.parametrize("sigma", [25, 200])
def test_pallas_large_alphabet_shared(sigma, rng):
    """Shared-target best+pos kernel at large alphabets (scalar-indexed
    Eq rows: no select chain, VMEM-only cap) — exact vs the XLA engine."""
    from edlib_tpu.ops.pallas_kernel import sweep_best_pallas_shared
    B, NW, chunk = 1024, 2, 32
    qlen = NW * 32
    tlen = 100
    eq = np.eye(sigma, dtype=bool)
    t = rng.randint(0, sigma, tlen).astype(np.int32)
    w = NW * 32 - qlen
    t_scan = tlen + w
    n_chunks = -(-t_scan // chunk)
    tg_sh = np.full((n_chunks, 1, chunk), sigma, np.int32)
    tg_sh.reshape(-1)[:tlen] = t
    peq = np.zeros((1, B, sigma + 1, NW), np.uint32)  # will reshape to tiles
    peq_b = np.zeros((B, sigma + 1, NW), np.uint32)
    for b in range(B):
        q = rng.randint(0, sigma, qlen).astype(np.uint8)
        peq_b[b] = encode.build_peq_words(q, eq, n_words=NW)
    # tile layout (n_tiles, S1, NW, 8, 128)
    tiles = peq_b.reshape(1, 8, 128, sigma + 1, NW).transpose(0, 3, 4, 1, 2)
    best, pos = sweep_best_pallas_shared(
        np.ascontiguousarray(tiles), tg_sh, hin0=0,
        col_lo=w, col_hi=w + tlen, chunk=chunk, interpret=True)
    tg_full = np.broadcast_to(
        tg_sh.reshape(-1)[None, :n_chunks * chunk], (B, n_chunks * chunk))
    s_xla = np.asarray(jax_engine.sweep_scores(
        peq_b, np.ascontiguousarray(tg_full), hin0=0))[:, :t_scan]
    want_best = s_xla[:, w:w + tlen].min(axis=1)
    np.testing.assert_array_equal(np.asarray(best).reshape(-1), want_best)
