"""Segmented long-target HW search vs the host engine ground truth."""

import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import host as host_engine
from edlib_tpu.ops.segmented import (
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
