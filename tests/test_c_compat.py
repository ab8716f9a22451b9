"""Differential tests for the drop-in C ABI (native/edlib_compat.cpp).

Loads the reference edlib (compiled from its read-only mount) and our
libedlib_tpu_native.so side by side via ctypes and compares the five
public entry points' observable behavior field by field — status,
editDistance, alphabetLength, ordered end/start location lists, raw
alignment op bytes, and CIGAR strings in both formats.

Reference contracts exercised: edlibAlign orchestration edlib.cpp:146-301,
empty-sequence shortcut :166-184, unknown-mode semantics, the -1
end-location edge :237-249, edlibAlignmentToCigar :303-350, config helpers
edlib.h:146-156.
"""

import ctypes
import random

import pytest

from edlib_tpu import native_loader
from tests.reference_oracle import (_AlignConfig, _AlignResult,
                                    _EqualityPair, MODE, TASK,
                                    get_reference_lib)


def _bind_compat(lib):
    lib.edlibAlign.restype = _AlignResult
    lib.edlibAlign.argtypes = [ctypes.c_char_p, ctypes.c_int,
                               ctypes.c_char_p, ctypes.c_int, _AlignConfig]
    lib.edlibAlignmentToCigar.restype = ctypes.c_void_p
    lib.edlibAlignmentToCigar.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int]
    lib.edlibFreeAlignResult.argtypes = [_AlignResult]
    lib.edlibNewAlignConfig.restype = _AlignConfig
    lib.edlibNewAlignConfig.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(_EqualityPair), ctypes.c_int]
    lib.edlibDefaultAlignConfig.restype = _AlignConfig
    lib.edlibDefaultAlignConfig.argtypes = []
    return lib


@pytest.fixture(scope="module")
def libs():
    ref = get_reference_lib()
    ours = native_loader.get_lib()
    if ref is None or ours is None:
        pytest.skip("reference or native library unavailable")
    if not hasattr(ours, "edlibAlign"):
        pytest.skip("compat symbols missing from native library")
    return _bind_compat(ref), _bind_compat(ours)


def _full_align(lib, query: bytes, target: bytes, mode, task, k=-1,
                equalities=None) -> dict:
    """Everything observable from one edlibAlign call, as plain Python."""
    n_eq = len(equalities) if equalities else 0
    eq_arr = (_EqualityPair * n_eq)() if n_eq else None
    for i, (a, b) in enumerate(equalities or []):
        eq_arr[i].first = bytes([a]) if isinstance(a, int) else a
        eq_arr[i].second = bytes([b]) if isinstance(b, int) else b
    cfg = _AlignConfig(k=k, mode=mode if isinstance(mode, int) else MODE[mode],
                       task=TASK[task], additionalEqualities=eq_arr,
                       additionalEqualitiesLength=n_eq)
    res = lib.edlibAlign(query, len(query), target, len(target), cfg)
    try:
        out = {
            "status": res.status,
            "editDistance": res.editDistance,
            "alphabetLength": res.alphabetLength,
            "numLocations": res.numLocations,
            "hasEnd": bool(res.endLocations),
            "hasStart": bool(res.startLocations),
            "ends": [res.endLocations[i] for i in range(res.numLocations)]
                    if res.endLocations else [],
            "starts": [res.startLocations[i] for i in range(res.numLocations)]
                      if res.startLocations else [],
            "alignmentLength": res.alignmentLength,
            "ops": bytes(
                ctypes.string_at(res.alignment, res.alignmentLength))
                if res.alignment and res.alignmentLength > 0 else None,
            "cigars": [],
        }
        if res.alignment:
            for fmt in (0, 1):  # STANDARD, EXTENDED
                ptr = lib.edlibAlignmentToCigar(res.alignment,
                                                res.alignmentLength, fmt)
                out["cigars"].append(
                    ctypes.string_at(ptr).decode() if ptr else None)
                if ptr:
                    ctypes.CDLL(None).free(ctypes.c_void_p(ptr))
        return out
    finally:
        lib.edlibFreeAlignResult(res)


def _check(libs, query, target, mode, task, k=-1, equalities=None):
    ref, ours = libs
    a = _full_align(ref, query, target, mode, task, k, equalities)
    b = _full_align(ours, query, target, mode, task, k, equalities)
    assert a == b, (f"mode={mode} task={task} k={k} q={query!r} "
                    f"t={target!r}\nref={a}\nours={b}")
    return a


MODES = ["NW", "SHW", "HW"]
TASKS = ["distance", "locations", "path"]


def test_hirschberg_dispatch_crossing(libs):
    # Window big enough that obtainAlignment's 1MB estimate routes PATH to
    # Hirschberg on both sides (edlib.cpp:1186-1211); CIGARs must stay
    # byte-identical through the recursion.
    rng = random.Random(5)
    q = bytes(rng.choice(b"ACGT") for _ in range(2000))
    t = bytearray(rng.choice(b"ACGT") for _ in range(6000))
    t[1500:1500 + 2000] = q
    for i in range(1500, 3500, 37):
        t[i] = rng.choice(b"ACGT")
    t = bytes(t)
    for mode in MODES:
        _check(libs, q, t, mode, "path")


def test_fuzz_differential(libs):
    rng = random.Random(421)
    for trial in range(400):
        sigma = rng.choice([2, 4, 10, 26])
        letters = bytes(range(65, 65 + sigma))
        qlen = rng.randint(1, 120)
        tlen = rng.randint(1, 300)
        q = bytes(rng.choice(letters) for _ in range(qlen))
        if rng.random() < 0.5:
            # mutated substring of t: realistic similar pairs
            pos = rng.randint(0, max(0, tlen - qlen))
            t = bytearray(rng.choice(letters) for _ in range(tlen))
            for i, c in enumerate(q):
                if pos + i < tlen and rng.random() < 0.8:
                    t[pos + i] = c
            t = bytes(t)
        else:
            t = bytes(rng.choice(letters) for _ in range(tlen))
        equalities = None
        if rng.random() < 0.3:
            equalities = [(rng.choice(letters), rng.choice(letters))
                          for _ in range(rng.randint(1, 4))]
        mode = rng.choice(MODES)
        task = rng.choice(TASKS)
        r = _check(libs, q, t, mode, task, -1, equalities)
        # k-sweep around the exact distance (runTests.cpp:167-193 analogue)
        d = r["editDistance"]
        for k in (d - 1, d, d + 1):
            _check(libs, q, t, mode, task, k, equalities)


def test_empty_sequences(libs):
    for mode in MODES:
        for task in TASKS:
            for q, t in ((b"", b"ACGT"), (b"ACGT", b""), (b"", b"")):
                _check(libs, q, t, mode, task)
                _check(libs, q, t, mode, task, k=0)


def test_unknown_mode_value(libs):
    # Non-empty: any non-SHW/HW mode computes as NW but reports NO
    # locations (edlib.cpp:221-225 only fires for mode NW proper); empty:
    # status error (edlib.cpp:166-184).  task=path with an unknown mode is
    # UB in the reference (NULL end-location deref), so it is only checked
    # for crash-freedom on our side.
    _check(libs, b"ACGT", b"AGT", 3, "distance")
    _check(libs, b"ACGT", b"AGT", 3, "locations")
    _check(libs, b"", b"AGT", 3, "distance")
    _ref, ours = libs
    r = _full_align(ours, b"ACGT", b"AGT", 3, "path")
    assert r["editDistance"] == 1 and r["numLocations"] == 0
    assert r["ops"] is None


def test_minus_one_end_location(libs):
    # Query can align entirely before the target (edlib.cpp:237-249);
    # reference regression cases test13/test14 (runTests.cpp:444-476).
    _check(libs, b"AA", b"B", "HW", "path")
    _check(libs, b"AA", b"B", "HW", "locations")
    _check(libs, b"AAB", b"BBC", "HW", "path")


def test_cigar_formats_and_invalid_ops(libs):
    ref, ours = libs
    ops = (ctypes.c_ubyte * 7)(0, 0, 3, 1, 2, 2, 0)
    for fmt in (0, 1):
        pr = ref.edlibAlignmentToCigar(ops, 7, fmt)
        po = ours.edlibAlignmentToCigar(ops, 7, fmt)
        assert ctypes.string_at(pr) == ctypes.string_at(po)
        ctypes.CDLL(None).free(ctypes.c_void_p(pr))
        ctypes.CDLL(None).free(ctypes.c_void_p(po))
    bad = (ctypes.c_ubyte * 3)(0, 7, 1)
    assert ref.edlibAlignmentToCigar(bad, 3, 1) is None
    assert ours.edlibAlignmentToCigar(bad, 3, 1) is None
    # unknown format code
    assert ref.edlibAlignmentToCigar(ops, 7, 9) is None
    assert ours.edlibAlignmentToCigar(ops, 7, 9) is None


def test_config_helpers(libs):
    ref, ours = libs
    for lib in (ref, ours):
        c = lib.edlibDefaultAlignConfig()
        assert (c.k, c.mode, c.task) == (-1, 0, 0)
        assert not c.additionalEqualities
        assert c.additionalEqualitiesLength == 0
        c = lib.edlibNewAlignConfig(7, 2, 1, None, 0)
        assert (c.k, c.mode, c.task) == (7, 2, 1)


def test_large_alphabet(libs):
    rng = random.Random(7)
    # 255 and the full 256 distinct byte values stay byte-exact (the 256th
    # symbol forces the runtime's uint16 wildcard-id path).
    for n_sym in (255, 256):
        letters = bytes(range(n_sym))
        q = bytes(rng.choice(letters) for _ in range(80))
        t = letters + bytes(rng.choice(letters) for _ in range(200))
        for mode in MODES:
            for task in TASKS:
                _check(libs, q, t, mode, task)
    # sigma == 256 with the -1 end-location candidate (Q % 64 != 0) and
    # HW start-location re-runs on a long minimal-position list
    q = bytes(range(256))
    t = bytes(reversed(range(256)))
    for mode in MODES:
        _check(libs, q, t, mode, "path")


def test_word_boundary_and_identical(libs):
    rng = random.Random(99)
    for qlen in (63, 64, 65, 128):
        q = bytes(rng.choice(b"ACGT") for _ in range(qlen))
        for mode in MODES:
            for task in TASKS:
                _check(libs, q, q, mode, task)      # identical (test1)
                _check(libs, q, q + b"TTTT", mode, task)
