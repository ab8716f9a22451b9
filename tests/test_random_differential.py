"""Randomized differential suites vs the brute-force oracle.

Mirrors runRandomTests (test/runTests.cpp:86-213): fixed seed, suites per
{HW, NW, SHW} x {DISTANCE, PATH}, checking
  * score equality vs oracle,
  * locations empty iff score is -1,
  * number and order of end locations,
  * k-sweep: for k in {score-1, score, score+1} result is -1 iff score > k,
  * alignment validity invariants (checkAlignment, runTests.cpp:592-641),
  * start-location consistency (getAlignmentStart, runTests.cpp:649-661).

Sizes match the reference's distribution (Q 50-349, T 500-10499) at 100
tests per suite (the reference's count, runTests.cpp:33-39; the byte-exact
differential suite against the compiled reference adds thousands more).
"""

import numpy as np
import pytest

from edlib_tpu import align
from edlib_tpu.cigar import cigar_to_alignment
from edlib_tpu.oracle import edit_distance_simple
from edlib_tpu.types import (
    EDOP_DELETE,
    EDOP_INSERT,
    EDOP_MATCH,
    EDOP_MISMATCH,
    AlignMode,
)

NUM_TESTS = 100
ALPHABET = b"0123456789"


def expected_positions(oracle_positions, mode, score, qlen):
    """Oracle end positions plus the reference's -1 end-location candidate
    (query entirely before the target; exists iff Q %% 64 != 0 with score
    exactly Q — edlib.cpp:237-249, emulated in align.py)."""
    if (mode != "NW" and score == qlen and qlen % 64 != 0
            and score >= 0):
        return [-1] + oracle_positions
    return oracle_positions


def check_alignment(query, target, score, end, mode, ops):
    """Alignment validity invariant (runTests.cpp:592-641)."""
    align_score = 0
    q_idx = len(query) - 1
    t_idx = end
    for op in ops[::-1]:
        if op == EDOP_MATCH:
            assert query[q_idx] == target[t_idx], "match is a mismatch"
            q_idx -= 1
            t_idx -= 1
        elif op == EDOP_MISMATCH:
            assert query[q_idx] != target[t_idx], "mismatch is a match"
            align_score += 1
            q_idx -= 1
            t_idx -= 1
        elif op == EDOP_INSERT:
            align_score += 1
            q_idx -= 1
        elif op == EDOP_DELETE:
            if not (mode == "HW" and q_idx == -1):
                align_score += 1
            t_idx -= 1
        assert t_idx >= -1 and q_idx >= -1, "alignment left the matrix"
    assert q_idx == -1, "alignment did not consume the whole query"
    assert align_score == score, "alignment score mismatch"
    if len(ops) > 0 and ops[0] == EDOP_INSERT and t_idx >= 0:
        raise AssertionError(
            "alignment starts with insertion while it could start with "
            "a mismatch")


def get_alignment_start(ops, end):
    """Start implied by the ops (runTests.cpp:649-661)."""
    start = end + 1
    for op in ops:
        if op != EDOP_INSERT:
            start -= 1
    return -1 if start > end else start


def run_suite(mode, task, num_tests=NUM_TESTS, seed=42):
    rng = np.random.RandomState(seed)
    for _ in range(num_tests):
        # Reference size distribution (runTests.cpp:95-100).
        qlen = 50 + rng.randint(300)
        tlen = 500 + rng.randint(10000)
        query = bytes(rng.choice(list(ALPHABET), qlen).tolist())
        target = bytes(rng.choice(list(ALPHABET), tlen).tolist())
        res = align(query, target, mode=mode, task=task)

        q_ids = np.frombuffer(query, np.uint8)
        t_ids = np.frombuffer(target, np.uint8)
        score, positions = edit_distance_simple(q_ids, t_ids,
                                                AlignMode.parse(mode))
        assert res["editDistance"] == score
        ends = [loc[1] for loc in res["locations"]]
        assert ends == expected_positions(positions, mode, score, qlen), \
            f"end locations differ for {mode}"

        if task == "path":
            ops = cigar_to_alignment(res["cigar"])
            # cigar '=' vs 'X' distinction is validated by check_alignment.
            check_alignment(query, target, score, ends[0], mode, ops)
            start = get_alignment_start(ops, ends[0])
            assert res["locations"][0][0] == start

        # k-sweep (runTests.cpp:167-193).
        for k in range(max(score - 1, 0), score + 2):
            expected = -1 if score > k else score
            res_k = align(query, target, mode=mode, task=task, k=k)
            assert res_k["editDistance"] == expected
            if task == "path" and res_k["cigar"]:
                ops = cigar_to_alignment(res_k["cigar"])
                end_k = res_k["locations"][0][1]
                check_alignment(query, target, expected, end_k, mode, ops)
                assert res_k["locations"][0][0] == get_alignment_start(
                    ops, end_k)


@pytest.mark.parametrize("mode", ["HW", "NW", "SHW"])
def test_random_distance(mode):
    run_suite(mode, "distance")


@pytest.mark.parametrize("mode", ["HW", "NW", "SHW"])
def test_random_path(mode):
    run_suite(mode, "path")


@pytest.mark.parametrize("mode", ["HW", "NW", "SHW"])
def test_random_with_equalities(mode):
    """Extension beyond the reference suites: equalities in random tests."""
    rng = np.random.RandomState(7)
    eq_pairs = [("a", "b"), ("c", "d")]
    for _ in range(8):
        qlen = 10 + rng.randint(60)
        tlen = 50 + rng.randint(400)
        query = bytes(rng.choice(list(b"abcdef"), qlen).tolist())
        target = bytes(rng.choice(list(b"abcdef"), tlen).tolist())
        res = align(query, target, mode=mode, task="distance",
                    additionalEqualities=eq_pairs)

        # Oracle with the matching equality matrix.
        from edlib_tpu import encode
        qb, tb, eqs = encode.map_to_bytes(query, target, eq_pairs)
        q_ids, t_ids, alphabet = encode.transform_sequences(qb, tb)
        eq = encode.build_equality_matrix(alphabet, eqs)
        score, positions = edit_distance_simple(q_ids, t_ids,
                                                AlignMode.parse(mode), eq=eq)
        assert res["editDistance"] == score
        assert [loc[1] for loc in res["locations"]] == expected_positions(
            positions, mode, score, qlen)
