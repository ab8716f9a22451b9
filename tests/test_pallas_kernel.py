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
