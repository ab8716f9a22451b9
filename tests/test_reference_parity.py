"""Byte-exact differential tests against the compiled reference library.

The strongest parity check: for random inputs across all modes, tasks, and
k values, every observable field (editDistance, locations incl. order and
start locations, extended CIGAR, alphabetLength) must match the reference
edlibAlign exactly.  Skipped when the reference sources / toolchain are
unavailable.
"""

import numpy as np
import pytest

from edlib_tpu import align

from .reference_oracle import get_reference_lib, reference_align

pytestmark = pytest.mark.skipif(get_reference_lib() is None,
                                reason="reference edlib oracle unavailable")

MODES = ["NW", "SHW", "HW"]
TASKS = ["distance", "locations", "path"]


def assert_same(query, target, mode, task, k=-1, eqs=None):
    ours = align(query, target, mode=mode, task=task, k=k,
                 additionalEqualities=eqs)
    ref = reference_align(query, target, mode=mode, task=task, k=k,
                          additionalEqualities=eqs)
    ctx = f"mode={mode} task={task} k={k} q={query[:40]!r} t={target[:40]!r}"
    assert ours["editDistance"] == ref["editDistance"], ctx
    assert ours["alphabetLength"] == ref["alphabetLength"], ctx
    assert ours["locations"] == ref["locations"], ctx
    assert ours["cigar"] == ref["cigar"], ctx


@pytest.mark.parametrize("task", TASKS)
@pytest.mark.parametrize("mode", MODES)
def test_random_parity(mode, task):
    rng = np.random.RandomState(1234)
    for i in range(15):
        sigma = rng.choice([2, 4, 10])
        qlen = 1 + rng.randint(200)
        tlen = 1 + rng.randint(1500)
        query = bytes(rng.randint(65, 65 + sigma, qlen, dtype=np.uint8))
        target = bytes(rng.randint(65, 65 + sigma, tlen, dtype=np.uint8))
        assert_same(query, target, mode, task)
        if i % 3 == 0:
            ref_score = reference_align(query, target, mode=mode)["editDistance"]
            for k in (max(0, ref_score - 1), ref_score, ref_score + 1):
                assert_same(query, target, mode, task, k=k)


@pytest.mark.parametrize("mode", MODES)
def test_random_parity_reference_scale(mode):
    """The reference suite's own size distribution (runTests.cpp:95-100):
    Q in [50, 349], T in [500, 10499], alphabet 10."""
    rng = np.random.RandomState(42)
    for i in range(10):
        qlen = 50 + rng.randint(300)
        tlen = 500 + rng.randint(10000)
        query = bytes(rng.randint(48, 58, qlen, dtype=np.uint8))
        target = bytes(rng.randint(48, 58, tlen, dtype=np.uint8))
        task = TASKS[i % 3]
        assert_same(query, target, mode, task)
        # Similar pairs stress the banded paths harder.
        close = bytearray(target[:qlen + 50])
        for j in range(0, len(close), 17):
            close[j] = 48
        assert_same(bytes(close[:qlen]), target, mode, task)


@pytest.mark.parametrize("mode", MODES)
def test_word_boundary_parity(mode):
    """Query lengths at/near 32 and 64-bit word boundaries, where padding
    artifacts (the -1 end location, final-column readout) live."""
    rng = np.random.RandomState(7)
    for qlen in [1, 2, 31, 32, 33, 63, 64, 65, 127, 128, 129]:
        for tlen in [1, 2, 5, qlen, qlen + 3, 200]:
            query = bytes(rng.randint(65, 69, qlen, dtype=np.uint8))
            target = bytes(rng.randint(65, 69, tlen, dtype=np.uint8))
            for task in TASKS:
                assert_same(query, target, mode, task)


@pytest.mark.parametrize("mode", MODES)
def test_degenerate_parity(mode):
    cases = [
        (b"AA", b"B"),          # -1 end location case (runTests.cpp:444-476)
        (b"A", b"A"),
        (b"A", b"B"),
        (b"AAAA", b"AAAA"),
        (b"ABAB" * 16, b"AB"),  # query longer than target, word multiple
        (b"AB", b"ABABAB" * 40),
        (b"A" * 64, b"A" * 64),
        (b"A" * 64, b"B"),      # Q % 64 == 0: -1 must NOT appear
        (b"A" * 63, b"B"),      # Q % 64 != 0: -1 appears if best == Q
    ]
    for q, t in cases:
        for task in TASKS:
            assert_same(q, t, mode, task)


def test_equalities_parity():
    eqs = [("R", "A"), ("R", "G"), ("N", "A"), ("N", "C"), ("N", "T"),
           ("N", "G")]
    rng = np.random.RandomState(99)
    for _ in range(10):
        qlen = 1 + rng.randint(80)
        tlen = 1 + rng.randint(400)
        query = bytes(rng.choice(list(b"ACGTRN"), qlen).tolist())
        target = bytes(rng.choice(list(b"ACGT"), tlen).tolist())
        for mode in MODES:
            for task in TASKS:
                assert_same(query, target, mode, task, eqs=eqs)


def test_large_path_hirschberg_parity():
    """Window big enough to push the reference into Hirschberg
    (alignmentDataSize >= 1MB, edlib.cpp:1186-1211) — our dispatch must make
    the same choice and produce the same path."""
    rng = np.random.RandomState(5)
    qlen, tlen = 3000, 20000
    base = rng.randint(65, 69, tlen, dtype=np.uint8)
    query = base[2000:2000 + qlen].copy()
    # ~10% mutations
    muts = rng.rand(qlen) < 0.1
    query[muts] = rng.randint(65, 69, muts.sum(), dtype=np.uint8)
    assert_same(bytes(query), bytes(base), "HW", "path")
    assert_same(bytes(query), bytes(base[:4000]), "NW", "path")


def test_large_nearsquare_parity():
    """Round-2 fast paths only activate on LARGE near-square pairs: the NW
    upper-bound probe (qlen >= 4096, tlen <= 1.5*qlen), the hamming ladder
    cap, the threaded Hirschberg, and the inline no-stream semiglobal
    search.  Randomized differential vs the compiled reference across
    substitution-heavy, indel-heavy, and random pairs in that regime."""
    rng = np.random.RandomState(23)
    shapes = [(4096, 4096), (5000, 4400), (6000, 8000), (9000, 9001),
              (4200, 4096)]
    for trial, (qlen, tlen) in enumerate(shapes):
        base = rng.randint(65, 69, max(qlen, tlen), dtype=np.uint8)
        kind = trial % 3
        if kind == 0:      # substitution-heavy (hamming cap ~ exact)
            q = base[:qlen].copy()
            muts = rng.rand(qlen) < 0.08
            q[muts] = rng.randint(65, 69, muts.sum(), dtype=np.uint8)
        elif kind == 1:    # indel-heavy (cap useless; ladder path)
            q = np.concatenate([base[:qlen // 3],
                                base[qlen // 3 + 170:qlen + 170]])[:qlen]
        else:              # unrelated
            q = rng.randint(65, 69, qlen, dtype=np.uint8)
        t = bytes(base[:tlen])
        qb = bytes(q[:qlen])
        for mode in ("NW", "SHW", "HW"):
            for task in ("distance", "locations", "path"):
                assert_same(qb, t, mode, task)
        # bounded-k regimes around the true distance
        import edlib_tpu
        d = edlib_tpu.align(qb, t, mode="HW")["editDistance"]
        for mode in ("NW", "HW"):
            for k in (max(0, d - 1), d, d + 7):
                assert_same(qb, t, mode, "path", k=k)
