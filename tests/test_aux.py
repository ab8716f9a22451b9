"""Auxiliary subsystems: resumable sweeps (checkpoint/resume), profiling."""

import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import jax_engine
from edlib_tpu.utils.profiling import Timer, gcups


def test_resumable_sweep_matches_single_call(rng):
    B, sigma, NW, T = 8, 4, 2, 96
    eq = np.eye(sigma, dtype=bool)
    peq = np.zeros((B, sigma + 1, NW), np.uint32)
    tg = np.full((B, T), sigma, np.int32)
    for b in range(B):
        q = rng.randint(0, sigma, rng.randint(20, 65)).astype(np.uint8)
        peq[b] = encode.build_peq_words(q, eq, n_words=NW)
        tg[b, :80] = rng.randint(0, sigma, 80)

    full = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=1))

    # Stream in 3 segments, checkpointing the carry between them.
    state = jax_engine.initial_state(B, NW)
    outs = []
    for seg in (tg[:, :30], tg[:, 30:60], tg[:, 60:]):
        scores, state = jax_engine.sweep_scores_resumable(peq, seg, state,
                                                          hin0=1)
        # Round-trip the checkpoint through host numpy (persistence).
        state = tuple(np.asarray(s) for s in state)
        outs.append(np.asarray(scores))
    np.testing.assert_array_equal(np.concatenate(outs, axis=1), full)


def test_resumable_state_is_stop_column_snapshot(rng):
    """The carried state after c columns == the host engine's stop-column
    state (the targetStopPosition analogue)."""
    from edlib_tpu.ops import host as host_engine
    sigma, qlen = 4, 40
    eq = np.eye(sigma, dtype=bool)
    q = rng.randint(0, sigma, qlen).astype(np.uint8)
    t = rng.randint(0, sigma, 70).astype(np.uint8)
    NW = encode.num_words(qlen)
    peq = encode.build_peq_words(q, eq, n_words=NW)[None]
    tg = t.astype(np.int32)[None]
    stop = 41
    _, (Pv, Mv, score) = jax_engine.sweep_scores_resumable(
        peq, tg[:, :stop + 1], jax_engine.initial_state(1, NW), hin0=1)
    hpeq = encode.build_peq_bigint(q, eq)
    hstate, _, _ = host_engine.nw_run(hpeq, t, qlen, stop=stop)
    # Compare decoded real-row cells of the last block (the 32-bit padded
    # bottom differs from the bigint engine's unpadded bottom by design).
    from edlib_tpu.ops.jax_engine import decode_block_cells
    host_cells = host_engine.decode_cells(hstate.Pv, hstate.Mv, qlen,
                                          boundary=stop + 1)
    last = decode_block_cells(np.asarray(Pv)[-1, 0], np.asarray(Mv)[-1, 0],
                              np.asarray(score)[0])
    lo = (NW - 1) * 32
    n_real = qlen - lo
    np.testing.assert_array_equal(last[:n_real], host_cells[lo:lo + n_real])


def test_timer_and_gcups():
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.summary()
    assert gcups(100, 1000, 10, 1.0) == pytest.approx(1e-3)
