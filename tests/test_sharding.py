"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import jax_engine
from edlib_tpu.parallel import (
    make_alignment_mesh,
    shard_target_slices,
    sharded_hw_search,
    sharded_sweep_dp,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def build_uniform_batch(rng, B, qlen, sigma=4):
    """Batch of equal-length queries; Peq with wildcard + null rows."""
    nw = encode.num_words(qlen)
    eq = np.eye(sigma, dtype=bool)
    peq = np.zeros((B, sigma + 2, nw), np.uint32)
    queries = []
    for b in range(B):
        q = rng.randint(0, sigma, qlen).astype(np.uint8)
        queries.append(q)
        peq[b, :sigma + 1] = encode.build_peq_words(q, eq, n_words=nw)
        peq[b, sigma + 1] = 0  # NULL row: matches nothing
    return queries, peq, nw


def test_dp_sweep_matches_single_device(rng):
    mesh = make_alignment_mesh(8, dp=8, sp=1)
    B, sigma, NW, T = 16, 4, 2, 128
    eq = np.eye(sigma, dtype=bool)
    peq = np.zeros((B, sigma + 1, NW), np.uint32)
    tg = np.full((B, T), sigma, np.int32)
    for b in range(B):
        q = rng.randint(0, sigma, 50).astype(np.uint8)
        peq[b] = encode.build_peq_words(q, eq, n_words=NW)
        tg[b, :100] = rng.randint(0, sigma, 100)
    sharded = np.asarray(sharded_sweep_dp(mesh, peq, tg, hin0=1))
    single = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=1))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_hw_search_exact_within_k(rng):
    """Target sharded over sp with halos: every score <= k_eff must equal
    the full-target sweep; the pmin-merged best must be the global best."""
    sigma, qlen, B = 4, 48, 8
    k_eff = qlen  # unbounded-k case: halo = 2*qlen - 1
    halo = qlen + k_eff - 1
    mesh = make_alignment_mesh(8, dp=2, sp=4)
    queries, peq, nw = build_uniform_batch(rng, B, qlen, sigma)
    w_pad = nw * 32 - qlen

    T = 701
    target = rng.randint(0, sigma, T).astype(np.int32)
    # Plant one exact occurrence of query 0 so best == 0 exists.
    target[300:300 + qlen] = queries[0]

    slices, C = shard_target_slices(target, sigma, 4, halo, w_pad)
    best, cores = sharded_hw_search(mesh, peq, slices, halo, w_pad, qlen)
    best = np.asarray(best)
    cores = np.asarray(cores)  # (4, B, C)

    # Reference: single-device full-target sweep.
    tg_full = np.full((B, T + w_pad), sigma, np.int32)
    tg_full[:, :T] = target
    full = np.asarray(jax_engine.sweep_scores(peq, tg_full, hin0=0))
    full_scores = full[:, w_pad:]  # position p at col p + w_pad

    # Reassemble sharded core streams into global positions.
    assembled = np.concatenate([cores[d] for d in range(4)], axis=1)[:, :T]
    exact = full_scores <= k_eff
    np.testing.assert_array_equal(assembled[exact], full_scores[exact])
    np.testing.assert_array_equal(best, full_scores.min(axis=1))
    assert best[0] == 0  # planted hit found


def test_mesh_factorization():
    m = make_alignment_mesh(8)
    assert m.devices.size == 8
    m = make_alignment_mesh(8, dp=4)
    assert dict(zip(m.axis_names, m.devices.shape)) == {"dp": 4, "sp": 2}


@pytest.mark.slow
def test_nw_carry_pipeline_matches_single_device(rng):
    """Sequential (Pv, Mv, score) hand-off across "sp" (ppermute) must be
    bit-identical to the single-device resumable chain — the multi-host
    long-NW capability (SURVEY §5 long-context)."""
    from edlib_tpu.parallel import sharded_nw_pipeline

    B, sigma, qlen, T = 4, 4, 70, 333
    eq = np.eye(sigma, dtype=bool)
    nw = encode.num_words(qlen)
    w_pad = nw * 32 - qlen
    peq = np.zeros((B, sigma + 1, nw), np.uint32)
    queries = []
    for b in range(B):
        q = rng.randint(0, sigma, qlen).astype(np.uint8)
        queries.append(q)
        peq[b] = encode.build_peq_words(q, eq, n_words=nw)
    target = rng.randint(0, sigma, T).astype(np.int32)

    for dp, sp in ((1, 8), (2, 4)):
        mesh = make_alignment_mesh(8, dp=dp, sp=sp)
        cores, C = sharded_nw_pipeline(mesh, peq, target, qlen)
        got = np.asarray(cores).transpose(1, 0, 2).reshape(B, sp * C)

        # single-device chain over the same padded scan, two segments
        padded = np.full(sp * C, sigma, np.int32)
        padded[:T] = target
        tg = np.broadcast_to(padded[None, :], (B, sp * C))
        state = jax_engine.initial_state(B, nw)
        cut = sp * C // 2
        s1, state = jax_engine.sweep_scores_resumable(
            peq, tg[:, :cut], state, hin0=1)
        s2, _ = jax_engine.sweep_scores_resumable(
            peq, tg[:, cut:], state, hin0=1)
        want = np.concatenate([np.asarray(s1), np.asarray(s2)], axis=1)
        np.testing.assert_array_equal(got, want)
        # the NW distance sits at scan column T + w_pad - 1
        from edlib_tpu.oracle import edit_distance_simple
        for b in range(B):
            d, _ = edit_distance_simple(queries[b],
                                        target.astype(np.uint8), "NW")
            assert got[b, T + w_pad - 1] == d
