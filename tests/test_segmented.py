"""Segmented long-target HW search vs the host engine ground truth."""

import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import host as host_engine
from edlib_tpu.ops.segmented import (
    hw_best_segmented,
    hw_stream_segmented,
    plan_segments,
    segment_target,
)


def test_plan_segments_shapes():
    n, core = plan_segments(10000, halo=199, w_pad=28)
    assert n * core >= 10000
    assert core >= 99  # halo overhead bounded


def test_segmented_stream_matches_host(rng, monkeypatch):
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    sigma = 4
    for qlen, tlen in ((40, 1500), (64, 2000), (17, 997)):
        q = rng.randint(0, sigma, qlen).astype(np.uint8)
        t = rng.randint(0, sigma, tlen).astype(np.uint8)
        # Plant an exact hit so best == 0 exists.
        s = rng.randint(0, tlen - qlen)
        t[s:s + qlen] = q
        k_eff = qlen  # unbounded-k equivalent for HW
        got = hw_stream_segmented(q, t.astype(np.int32), sigma, k_eff)
        assert got is not None
        hpeq = encode.build_peq_bigint(q, np.eye(sigma, dtype=bool))
        truth = host_engine.semiglobal_scores(hpeq, t, qlen, "HW")
        exact = truth <= k_eff
        np.testing.assert_array_equal(got[exact], truth[exact])
        assert (got >= truth).all()  # approximations only ever overestimate
        assert got.min() == truth.min()


def test_hw_best_segmented_matches_host(rng, monkeypatch):
    """Device-reduced (best, first-pos) == full-stream (min, argmin) for a
    mixed-length read set, including mutated near-hits and tie positions."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    sigma = 4
    tlen = 2500
    t = rng.randint(0, sigma, tlen).astype(np.int32)
    reads = []
    for i, qlen in enumerate((40, 64, 17, 100, 33)):
        q = rng.randint(0, sigma, qlen).astype(np.uint8)
        if i % 2 == 0:  # plant a mutated hit (and for i=0 a tie: two copies)
            for rep in range(2 if i == 0 else 1):
                s = rng.randint(0, tlen - qlen)
                win = q.copy()
                for p in rng.choice(qlen, max(1, qlen // 20), replace=False):
                    win[p] = rng.randint(0, sigma)
                t[s:s + qlen] = win
        reads.append(q)
    got = hw_best_segmented(reads, t, sigma, max_lanes=64)
    assert got is not None
    for i, q in enumerate(reads):
        hpeq = encode.build_peq_bigint(q, np.eye(sigma, dtype=bool))
        truth = host_engine.semiglobal_scores(hpeq, t.astype(np.uint8),
                                              len(q), "HW")
        assert got[0][i] == truth.min(), i
        assert got[1][i] == int(np.argmin(truth)), i
