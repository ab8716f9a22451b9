"""Regression tests mirroring the reference suite.

Covers the reference's specific tests test1..test16, testCigar,
testCustomEqualityRelation, testEmptySequences (test/runTests.cpp:269-570)
and the Python binding tests (bindings/python/test.py), with expected values
checked against the brute-force oracle and the published expectations.
"""

import numpy as np
import pytest

import edlib_tpu
from edlib_tpu import align, getNiceAlignment
from edlib_tpu.cigar import alignment_to_cigar
from edlib_tpu.oracle import edit_distance_simple
from edlib_tpu.types import AlignMode, CigarFormat

MODES = ["HW", "NW", "SHW"]


def oracle_check(query: bytes, target: bytes, mode: str):
    """Run align() and verify score + all end locations against the oracle
    (the executeTest scheme, runTests.cpp:216-267)."""
    res = align(query, target, mode=mode, task="path")
    q = np.frombuffer(query, np.uint8)
    t = np.frombuffer(target, np.uint8)
    score, positions = edit_distance_simple(q, t, AlignMode.parse(mode))
    assert res["editDistance"] == score
    ends = [loc[1] for loc in res["locations"]]
    assert ends == positions
    return res


# --- reference test1..test11 sequences (byte-value alphabets) ---

CASES = [
    (bytes([0, 1, 2, 3]), bytes([0, 1, 2, 3])),                       # test1
    (bytes([0, 1, 2, 3, 4]), bytes([8, 5, 0, 1, 3, 4, 6, 7, 5])),     # test2
    (bytes([0, 1, 2, 3, 4]), bytes([1, 2, 0, 1, 2, 3, 4, 5, 4])),     # test3
    (bytes(200), bytes([1] + [0] * 199)),                              # test4
    (bytes(64), bytes([1] + [0] * 63)),                                # test5 (word boundary)
    (bytes([1, 3, 0, 1, 1, 1, 3, 0, 1, 3, 1, 3, 3]),
     bytes([0, 1, 1, 1, 0, 1, 3, 0, 1, 3, 3, 3, 1, 3, 2, 2, 3, 2, 3, 3, 1]
           * 20)),                                                     # test6
    (bytes([2, 3, 0]), bytes([0, 1, 2, 2, 0])),                        # test7
    (bytes([2, 3, 0]), bytes([2, 2, 0])),                              # test8
    (bytes([0, 1, 2]), bytes([1, 1, 1])),                              # test10
    (bytes([128, 255, 127, 0, 0, 0, 0, 0]),
     bytes([128, 0, 127, 0, 0, 0, 0, 0])),                             # test11 char range
]


@pytest.mark.parametrize("qt", CASES, ids=range(len(CASES)))
@pytest.mark.parametrize("mode", MODES)
def test_reference_cases(qt, mode):
    oracle_check(qt[0], qt[1], mode)


@pytest.mark.parametrize("mode", MODES)
def test9_random_alphabet10(mode, rng):
    q = bytes(rng.randint(0, 10, 64, dtype=np.uint8))
    t = bytes(rng.randint(0, 10, 393, dtype=np.uint8))
    oracle_check(q, t, mode)


def test12_degenerate_nucleotides():
    eqs = [("R", "A"), ("R", "G"), ("M", "A"), ("M", "C"), ("W", "A"),
           ("W", "T"), ("S", "C"), ("S", "G"), ("Y", "C"), ("Y", "T"),
           ("K", "G"), ("K", "T"), ("V", "A"), ("V", "C"), ("V", "G"),
           ("H", "A"), ("H", "C"), ("H", "T"), ("D", "A"), ("D", "G"),
           ("D", "T"), ("B", "C"), ("B", "G"), ("B", "T")]
    target = ("TAACAAGGTTTCCGTAGGTGAACCTGCGGAAGGATCATTATCGAATAAACTTGATGGGTT"
              "GTCGCTGGCTTCTAGGAGCATGTGCACATCCGTCATTTTTATCCATCCACCTGTGCACCT"
              "TTTGTAGTCTTTGGAGGTAATAAGCGTGAATCTATCGAGGTCCTCTGGTCCTCGGAAAGA"
              "GGTGTTTGCCATATGGCTCGCCTTTGATACTCGCGAGTTACTCTAAGACTATGTCCTTTC"
              "ATATACTACGAATGTAATAGAATGTATTCATTGGGCCTCAGTGCCTATAAAACATATACA"
              "ACTTTCAGCAACGGATCTCTTGGCTCTCGCATCGATGAAGAACGCAGCGAAATGCGATAA"
              "GTAATGTGAATTGCAGAATTCAGTGAATCATCGAATCTTTGAACGCACCTTGCGCTCCTT"
              "GGTATTCCGAGGAGCATGCCTGTTTGAGTGTCATTAAATTCTCAACCCCTTCCGGTTTTT"
              "TGACTGGCTTTGGGGCTTGGATGTGGGGGATTCATTTGCGGGCCTCTGTAGAGGTCGGCT"
              "CCCCTGAAATGCATTAGTGGAACCGTTTGCGGTTACCGTCGCTGGTGTGATAACTATCTA"
              "TGCCAAAGACAAACTGCTCTCTGATAGTTCTGCTTCTAACCGTCCATTTATTGGACAACA"
              "TTATTATGAACACTTGACCTCAAATCAGGTAGGACTACCCGCTGAACTTAAGCATATCAA"
              "TAAGCGGAGGA")
    res = align("GCATATCAATAAGCGGAGGA", target, mode="HW", task="locations",
                additionalEqualities=eqs)
    assert res["editDistance"] == 0


def test13_14_negative_end_location():
    # "AA" vs "B": one optimal solution ends at -1 (query before target),
    # runTests.cpp:444-476; end locations are [-1, 0] with edlib's 64-bit
    # padding behavior.
    for mode in ("HW", "SHW"):
        res = align("AA", "B", mode=mode, task="path")
        assert res["editDistance"] == 2
        ends = [loc[1] for loc in res["locations"]]
        assert ends == [-1, 0]


def test15_16_overlap():
    res = align("AAABBB", "BBBC", mode="HW", task="locations")
    assert res["editDistance"] == 3
    res = align("BBBAAA", "CBBB", mode="HW", task="locations")
    assert res["editDistance"] == 3


def test_cigar_encoding():
    ops = [0, 0, 1, 1, 1, 2, 1, 1, 3, 0, 0]
    assert alignment_to_cigar(ops, CigarFormat.EXTENDED) == "2=3I1D2I1X2="
    assert alignment_to_cigar(ops, CigarFormat.STANDARD) == "2M3I1D2I3M"
    with pytest.raises(ValueError):
        alignment_to_cigar([0, 5], CigarFormat.EXTENDED)


def test_custom_equality_relation():
    eqs = [("R", "A"), ("R", "G"), ("N", "A"), ("N", "C"), ("N", "T"),
           ("N", "G")]
    res = align("GTGNRTCARCGAANCTTTN",
                "GTGAGTCATCGAATCTTTGAACGCACCTTGCGCTCCTTGGT",
                mode="HW", task="path", additionalEqualities=eqs)
    assert res["editDistance"] == 1


def test_wildcard_equalities():
    res = align("ACTG", "CACTRT", mode="HW", task="path",
                additionalEqualities=[("R", "A"), ("R", "G")])
    assert res["editDistance"] == 0


# --- Python binding tests (bindings/python/test.py) ---

def test_binding_str_and_bytes():
    assert align("telephone", "elephant")["editDistance"] == 3
    assert align(b"telephone", b"elephant")["editDistance"] == 3


def test_binding_nice_alignment():
    q, t = "TAAGGATGGTCCCATTC", "AAGGGGTCTCATATC"
    for mode in ("NW", "HW", "SHW"):
        res = align(q, t, mode=mode, task="path")
        nice = getNiceAlignment(res, q, t)
        assert nice["query_aligned"] == "TAAGGATGGTCCCAT-TC"
        assert nice["matched_aligned"] == "-||||--||||.|||-||"
        assert nice["target_aligned"] == "-AAGG--GGTCTCATATC"


def test_binding_distance_task_has_no_cigar():
    res = align("TAAGGATGGTCCCATTC", "AAGGGGTCTCATATC", mode="NW",
                task="distance")
    assert res["cigar"] is None


def test_binding_empty_sequences():
    assert align("", "elephant")["editDistance"] == 8
    assert align("telephone", "")["editDistance"] == 9
    assert align("", "elephant", mode="HW")["editDistance"] == 0
    assert align("telephone", "", mode="HW")["editDistance"] == 9
    assert align("", "elephant", mode="SHW")["editDistance"] == 0
    assert align("telephone", "", mode="SHW")["editDistance"] == 9


def test_binding_unicode():
    res = align("ты милая", "ты гений")
    assert res["editDistance"] == 5
    assert res["alphabetLength"] == 12


def test_binding_long_alphabet():
    long_alphabet = "".join(chr(i) for i in range(1, 257))
    seq1 = long_alphabet * 3
    seq2 = long_alphabet + long_alphabet[::-1] + long_alphabet
    assert align(seq1, seq2)["editDistance"] == 256


def test_alphabet_too_large():
    s1 = [chr(i) for i in range(300)]
    with pytest.raises(ValueError):
        align(s1, "abc")


def test_hashable_iterables():
    # Any iterable of hashables is accepted (edlib.pyx:22-53).
    res = align([1, 2, 3], (1, 2, 4))
    assert res["editDistance"] == 1


def test_empty_sequences_full_conventions():
    # NW empty: end location T-1 / -1; HW/SHW: -1 (edlib.cpp:166-184).
    res = align("", "abc")
    assert res["locations"] == [(None, 2)]
    res = align("abc", "")
    assert res["locations"] == [(None, -1)]
    res = align("", "abc", mode="HW", task="path")
    assert res["locations"] == [(None, -1)]
    assert res["cigar"] is None  # early return: no path for empty inputs


def test_k_parameter():
    assert align("telephone", "elephant", k=2)["editDistance"] == -1
    assert align("telephone", "elephant", k=3)["editDistance"] == 3
    res = align("telephone", "elephant", k=2)
    assert res["locations"] == []


def test_default_config_helpers():
    cfg = edlib_tpu.default_align_config()
    assert cfg.k == -1
    assert cfg.mode == edlib_tpu.AlignMode.NW
    assert cfg.task == edlib_tpu.AlignTask.DISTANCE
