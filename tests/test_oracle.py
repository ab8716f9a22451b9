"""Oracle self-consistency and known-value tests."""

import numpy as np
import pytest

from edlib_tpu.oracle import edit_distance_simple, full_dp_matrix
from edlib_tpu.types import AlignMode


def ids(s):
    return np.frombuffer(s.encode() if isinstance(s, str) else s, np.uint8)


@pytest.mark.parametrize("mode", [AlignMode.NW, AlignMode.SHW, AlignMode.HW])
def test_identical(mode):
    score, pos = edit_distance_simple(ids("ACGT"), ids("ACGT"), mode)
    assert score == 0
    assert pos == [3]


def test_known_values():
    assert edit_distance_simple(ids("telephone"), ids("elephant"),
                                AlignMode.NW)[0] == 3
    # HW: "ACT" in "CGACTGAC" -> 0
    assert edit_distance_simple(ids("ACT"), ids("CGACTGAC"),
                                AlignMode.HW)[0] == 0
    # SHW: "AACT" vs "AACTGGC" -> 0 (gap after query free)
    assert edit_distance_simple(ids("AACT"), ids("AACTGGC"),
                                AlignMode.SHW)[0] == 0


def test_empty_conventions():
    assert edit_distance_simple(ids(""), ids("abc"), AlignMode.NW) == (3, [2])
    assert edit_distance_simple(ids("abc"), ids(""), AlignMode.NW) == (3, [-1])
    assert edit_distance_simple(ids(""), ids("abc"), AlignMode.HW) == (0, [-1])
    assert edit_distance_simple(ids("abc"), ids(""), AlignMode.SHW) == (3, [-1])


def test_all_minimal_positions_ascending():
    # Repeated pattern gives multiple optimal end positions in HW.
    score, pos = edit_distance_simple(ids("AB"), ids("ABxABxAB"), AlignMode.HW)
    assert score == 0
    assert pos == [1, 4, 7]


@pytest.mark.parametrize("mode", [AlignMode.NW, AlignMode.SHW, AlignMode.HW])
def test_matches_full_matrix(mode, rng):
    for _ in range(20):
        q = rng.randint(0, 5, size=rng.randint(1, 40)).astype(np.uint8)
        t = rng.randint(0, 5, size=rng.randint(1, 80)).astype(np.uint8)
        D = full_dp_matrix(q, t, mode)
        score, pos = edit_distance_simple(q, t, mode)
        if mode == AlignMode.NW:
            assert score == D[-1, -1]
            assert pos == [len(t) - 1]
        else:
            last = D[-1, 1:]
            assert score == last.min()
            assert pos == list(np.nonzero(last == last.min())[0])


def test_equalities():
    eq = np.eye(3, dtype=bool)
    eq[0, 1] = eq[1, 0] = True
    q = np.array([0, 2], np.uint8)
    t = np.array([1, 2], np.uint8)
    score, _ = edit_distance_simple(q, t, AlignMode.NW, eq=eq)
    assert score == 0
