"""Banded native engines vs unbanded ground truth (pruning-only contract)."""

import numpy as np
import pytest

from edlib_tpu import encode, native_loader
from edlib_tpu.ops import host as host_engine
from edlib_tpu.types import AlignMode

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native library unavailable")


def make_pair(rng, qlen, tlen, sigma=4, similar=False):
    if similar and tlen >= qlen:
        t = rng.randint(0, sigma, tlen).astype(np.uint8)
        s = rng.randint(0, tlen - qlen + 1)
        q = t[s:s + qlen].copy()
        muts = rng.rand(qlen) < 0.1
        q[muts] = rng.randint(0, sigma, muts.sum())
        return q, t
    return (rng.randint(0, sigma, qlen).astype(np.uint8),
            rng.randint(0, sigma, tlen).astype(np.uint8))


@pytest.mark.parametrize("hin0,mode", [(0, AlignMode.HW), (1, AlignMode.SHW)])
def test_banded_semiglobal_exact_within_k(hin0, mode, rng):
    for trial in range(25):
        qlen = rng.randint(1, 200)
        tlen = rng.randint(1, 800)
        similar = trial % 2 == 0
        q, t = make_pair(rng, qlen, tlen, similar=similar)
        eq = np.eye(4, dtype=bool)
        hpeq = encode.build_peq_bigint(q, eq)
        truth = host_engine.semiglobal_scores(hpeq, t, qlen, mode)
        nw64 = encode.num_words(qlen, 64)
        w64 = nw64 * 64 - qlen
        peq64 = encode.build_peq_words(q, eq, word_size=64, n_words=nw64)
        t_ext = np.concatenate([t, np.full(w64, 4, np.uint8)])
        for k in (0, 3, int(truth.min()), int(truth.min()) + 5, qlen, 10**6):
            banded = native_loader.sweep_scores_banded_native(
                peq64, t_ext, hin0, k)[w64:]
            # k tightens to the running best internally; every entry <= that
            # k must be exact, and the global min must survive whenever
            # min <= k.
            if truth.min() <= k:
                assert banded.min() == truth.min()
                exact = banded < native_loader.SCORE_INF
                lim = min(k, truth.min())
                keep = truth <= lim
                np.testing.assert_array_equal(banded[keep], truth[keep])


def test_banded_nw_exact(rng):
    for trial in range(40):
        qlen = rng.randint(1, 400)
        tlen = rng.randint(1, 400)
        similar = trial % 2 == 0
        q, t = make_pair(rng, qlen, tlen, similar=similar)
        eq = np.eye(4, dtype=bool)
        hpeq = encode.build_peq_bigint(q, eq)
        state, _, _ = host_engine.nw_run(hpeq, t, qlen)
        truth = int(state.score)
        nw64 = encode.num_words(qlen, 64)
        peq64 = encode.build_peq_words(q, eq, word_size=64, n_words=nw64)
        for k in (truth - 1, truth, truth + 3, max(qlen, tlen)):
            got = native_loader.nw_distance_banded_native(peq64, t, qlen, k)
            expected = truth if truth <= k else -1
            assert got == expected, (trial, qlen, tlen, k, got, expected)


def test_native_full_align_matches_python(rng):
    """etn_align (the C orchestrator) vs the Python orchestration path."""
    from edlib_tpu.align import align_ids
    from edlib_tpu.types import AlignTask
    for _ in range(20):
        qlen = rng.randint(1, 150)
        tlen = rng.randint(1, 600)
        q, t = make_pair(rng, qlen, tlen, similar=bool(rng.randint(2)))
        qb, tb = q.tobytes(), t.tobytes()
        for mode in ("NW", "SHW", "HW"):
            for k in (-1, 2):
                res = native_loader.align_native(qb, tb, mode, True, k, None)
                q_ids, t_ids, alphabet = __import__(
                    "edlib_tpu.encode", fromlist=["x"]).transform_sequences(
                        qb, tb)
                eq = encode.build_equality_matrix(alphabet, None)
                want = align_ids(q_ids, t_ids, eq, k, AlignMode.parse(mode),
                                 AlignTask.LOC, len(alphabet))
                assert res["editDistance"] == want.edit_distance
                if want.edit_distance >= 0:
                    np.testing.assert_array_equal(res["endLocations"],
                                                  want.end_locations)
                    np.testing.assert_array_equal(res["startLocations"],
                                                  want.start_locations)
