"""Consistency checks (SURVEY §5: the race-detector/sanitizer analogue).

The reference is single-threaded and re-entrant; its sanitizer is valgrind
(native/Makefile `check-memory` covers ours).  On the JAX side the
corresponding hazards are jit-vs-eager divergence and dtype overflow —
checked here.
"""

import jax
import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import jax_engine


def build(rng, B=6, sigma=4, NW=2, T=80):
    eq = np.eye(sigma, dtype=bool)
    peq = np.zeros((B, sigma + 1, NW), np.uint32)
    tg = np.full((B, T), sigma, np.int32)
    for b in range(B):
        q = rng.randint(0, sigma, rng.randint(10, NW * 32 + 1)).astype(np.uint8)
        peq[b] = encode.build_peq_words(q, eq, n_words=NW)
        tfill = min(60, T)
        tg[b, :tfill] = rng.randint(0, sigma, tfill)
    return peq, tg


def test_jit_vs_eager(rng):
    peq, tg = build(rng)
    jitted = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=1))
    with jax.disable_jit():
        eager = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=1))
    np.testing.assert_array_equal(jitted, eager)


def test_block_update_no_uint_overflow_hazard(rng):
    """The carry add (Eq & Pv) + Pv intentionally wraps; verify the wrap
    semantics match the big-int ground truth at the all-ones boundary."""
    import jax.numpy as jnp
    from edlib_tpu.ops import host as host_engine

    Pv = np.uint32(0xFFFFFFFF)
    Mv = np.uint32(0)
    Eq = np.uint32(0xFFFFFFFF)
    jP, jM, jh = jax_engine.calculate_block(jnp.uint32(Pv), jnp.uint32(Mv),
                                            jnp.uint32(Eq), jnp.int32(1))
    mask = (1 << 32) - 1
    hP, hM, hh = host_engine.advance_column(int(Pv), int(Mv), int(Eq), 1,
                                            mask, 1 << 31)
    assert int(jP) == hP and int(jM) == hM and int(jh) == hh


def test_reentrancy_interleaved_calls(rng):
    """Interleaved sweeps with different shapes must not perturb each other
    (no global state in any engine)."""
    peq1, tg1 = build(rng, B=4, NW=1, T=40)
    peq2, tg2 = build(rng, B=8, NW=3, T=120)
    a1 = np.asarray(jax_engine.sweep_scores(peq1, tg1, hin0=0))
    b1 = np.asarray(jax_engine.sweep_scores(peq2, tg2, hin0=1))
    a2 = np.asarray(jax_engine.sweep_scores(peq1, tg1, hin0=0))
    b2 = np.asarray(jax_engine.sweep_scores(peq2, tg2, hin0=1))
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
