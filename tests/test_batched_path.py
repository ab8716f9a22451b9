"""Batched device PATH (path/batched.py + the column-capture kernel).

The batched capture/decode/walk must emit byte-identical ops to the scalar
traceback (path/traceback.py), which is itself parity-locked to the
reference walk (edlib.cpp:976-1134) by the differential suites.  Runs the
Pallas interpreter on CPU with tiny shapes; real-chip validation lives in
scripts/capture_perf_hw.py (batched_path rows) and the genome parity suite.
"""

import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.align import align
from edlib_tpu.batch import align_batch_device
from edlib_tpu.ops.host import HostColumnProvider
from edlib_tpu.path import batched as bp
from edlib_tpu.path.traceback import traceback

SIGMA = 4


def _scalar_ops(q_ids, w_ids, dist):
    eq = np.eye(SIGMA, dtype=bool)
    peq = encode.build_peq_bigint(q_ids.astype(np.uint8), eq)
    provider = HostColumnProvider(peq, w_ids, len(q_ids))
    return traceback(provider, len(q_ids), len(w_ids), dist)


def _nw_dist(q_ids, w_ids):
    from edlib_tpu.oracle import edit_distance_simple
    return edit_distance_simple(q_ids, w_ids, "NW")[0]


def _rand_pairs(rng, n, qspan, wspan):
    pairs, dists = [], []
    for _ in range(n):
        q = rng.randint(0, SIGMA, rng.randint(*qspan)).astype(np.int32)
        w = rng.randint(0, SIGMA, rng.randint(*wspan)).astype(np.int32)
        pairs.append((q, w))
        dists.append(_nw_dist(q, w))
    return pairs, dists


def test_batched_windows_path_matches_scalar_walk(rng):
    pairs, dists = _rand_pairs(rng, 24, (3, 90), (3, 200))
    # Mixed word counts and window buckets in one call.
    eq = np.eye(SIGMA, dtype=bool)
    got = bp.batched_windows_path(pairs, dists, SIGMA, eq, mode="interpret")
    for i, (q, w) in enumerate(pairs):
        want = _scalar_ops(q, w, dists[i])
        assert got[i].dtype == np.uint8
        assert np.array_equal(got[i], want), i


def test_batched_windows_path_boundary_runs(rng):
    # Walks that exit through the top row / left column exercise the
    # host-side boundary-run prepend (all-DELETE / all-INSERT).
    pairs = [
        (np.zeros(1, np.int32), np.zeros(64, np.int32)),   # 1 x 64: deletes
        (np.zeros(64, np.int32), np.zeros(1, np.int32)),   # 64 x 1: inserts
        (np.arange(4, dtype=np.int32) % SIGMA,
         np.arange(4, dtype=np.int32)[::-1].copy() % SIGMA),
    ]
    dists = [_nw_dist(q, w) for q, w in pairs]
    eq = np.eye(SIGMA, dtype=bool)
    got = bp.batched_windows_path(pairs, dists, SIGMA, eq, mode="interpret")
    for i, (q, w) in enumerate(pairs):
        assert np.array_equal(got[i], _scalar_ops(q, w, dists[i])), i


@pytest.mark.parametrize("mode", ["NW", "HW", "SHW"])
def test_align_batch_routes_batched_path(rng, monkeypatch, mode):
    """align_batch_device(task=path) through the batched device route emits
    the same dict (CIGAR included) as per-pair align()."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_BATCHED_PATH", "1")
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    queries, targets = [], []
    for _ in range(9):
        queries.append(bytes(rng.randint(65, 65 + SIGMA, rng.randint(10, 70),
                                         dtype=np.uint8)))
        targets.append(bytes(rng.randint(65, 65 + SIGMA,
                                         rng.randint(40, 220),
                                         dtype=np.uint8)))
    got = align_batch_device(queries, targets, mode=mode, task="path")
    for i, (q, t) in enumerate(zip(queries, targets)):
        want = align(q, t, mode=mode, task="path")
        assert got[i]["editDistance"] == want["editDistance"], i
        assert got[i]["cigar"] == want["cigar"], i
        assert got[i]["locations"] == want["locations"], i


def test_align_batch_path_with_equalities(rng, monkeypatch):
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_BATCHED_PATH", "1")
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    eqs = [("A", "T")]
    queries = [bytes(rng.randint(65, 69, 40, dtype=np.uint8))
               for _ in range(4)]
    targets = [bytes(rng.randint(65, 69, 90, dtype=np.uint8))
               for _ in range(4)]
    got = align_batch_device(queries, targets, mode="HW", task="path",
                             additionalEqualities=eqs)
    for i, (q, t) in enumerate(zip(queries, targets)):
        want = align(q, t, mode="HW", task="path", additionalEqualities=eqs)
        assert got[i]["cigar"] == want["cigar"], i
        assert got[i]["editDistance"] == want["editDistance"], i


def test_oversize_windows_route_to_pool(monkeypatch, rng):
    """Pairs past the cell cap keep the native/host reconstruction and the
    batch still returns correct paths."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_BATCHED_PATH", "1")
    monkeypatch.setenv("EDLIB_TPU_BATCHED_PATH_MAX_CELLS", "64")
    queries = [bytes(rng.randint(65, 69, 30, dtype=np.uint8))
               for _ in range(3)]
    targets = [bytes(rng.randint(65, 69, 60, dtype=np.uint8))
               for _ in range(3)]
    got = align_batch_device(queries, targets, mode="NW", task="path")
    for i, (q, t) in enumerate(zip(queries, targets)):
        want = align(q, t, mode="NW", task="path")
        assert got[i]["cigar"] == want["cigar"], i
