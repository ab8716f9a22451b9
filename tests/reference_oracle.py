"""ctypes bridge to the reference edlib, compiled on demand for testing.

The reference C++ sources (read-only at /root/reference) are compiled to a
shared library under /tmp and used purely as a differential test oracle —
no reference code enters this repository.  Tests that use it skip when the
toolchain or sources are unavailable.
"""

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional, Tuple

_REF_DIR = os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference")
REFERENCE_SRC = os.path.join(_REF_DIR, "edlib/src/edlib.cpp")
REFERENCE_INC = os.path.join(_REF_DIR, "edlib/include")
_LIB_PATH = os.path.join(tempfile.gettempdir(), "libedlib_ref_oracle.so")

_lib = None


class _EqualityPair(ctypes.Structure):
    _fields_ = [("first", ctypes.c_char), ("second", ctypes.c_char)]


class _AlignConfig(ctypes.Structure):
    _fields_ = [
        ("k", ctypes.c_int),
        ("mode", ctypes.c_int),
        ("task", ctypes.c_int),
        ("additionalEqualities", ctypes.POINTER(_EqualityPair)),
        ("additionalEqualitiesLength", ctypes.c_int),
    ]


class _AlignResult(ctypes.Structure):
    _fields_ = [
        ("status", ctypes.c_int),
        ("editDistance", ctypes.c_int),
        ("endLocations", ctypes.POINTER(ctypes.c_int)),
        ("startLocations", ctypes.POINTER(ctypes.c_int)),
        ("numLocations", ctypes.c_int),
        ("alignment", ctypes.POINTER(ctypes.c_ubyte)),
        ("alignmentLength", ctypes.c_int),
        ("alphabetLength", ctypes.c_int),
    ]


MODE = {"NW": 0, "SHW": 1, "HW": 2}
TASK = {"distance": 0, "locations": 1, "path": 2}


def get_reference_lib():
    """Compile (once) and load the reference library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(REFERENCE_SRC):
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++14", "-shared", "-fPIC",
                 "-I", REFERENCE_INC, REFERENCE_SRC, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=300)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.edlibAlign.restype = _AlignResult
    lib.edlibAlign.argtypes = [ctypes.c_char_p, ctypes.c_int,
                               ctypes.c_char_p, ctypes.c_int, _AlignConfig]
    lib.edlibAlignmentToCigar.restype = ctypes.c_void_p
    lib.edlibAlignmentToCigar.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int]
    lib.edlibFreeAlignResult.argtypes = [_AlignResult]
    _lib = lib
    return _lib


def reference_align(query: bytes, target: bytes, mode="NW", task="distance",
                    k=-1, additionalEqualities=None) -> dict:
    """Run the reference edlibAlign; result dict shaped like edlib.pyx."""
    lib = get_reference_lib()
    assert lib is not None
    eq_arr = None
    n_eq = 0
    if additionalEqualities:
        n_eq = len(additionalEqualities)
        eq_arr = (_EqualityPair * n_eq)()
        for i, (a, b) in enumerate(additionalEqualities):
            eq_arr[i].first = a if isinstance(a, bytes) else bytes([a]) \
                if isinstance(a, int) else a.encode()[0:1]
            eq_arr[i].second = b if isinstance(b, bytes) else bytes([b]) \
                if isinstance(b, int) else b.encode()[0:1]
    cfg = _AlignConfig(k=k, mode=MODE[mode], task=TASK[task],
                       additionalEqualities=eq_arr,
                       additionalEqualitiesLength=n_eq)
    res = lib.edlibAlign(query, len(query), target, len(target), cfg)
    try:
        out = {
            "status": res.status,
            "editDistance": res.editDistance,
            "alphabetLength": res.alphabetLength,
            "locations": [],
            "cigar": None,
        }
        for i in range(res.numLocations):
            start = res.startLocations[i] if res.startLocations else None
            end = res.endLocations[i] if res.endLocations else None
            out["locations"].append((start, end))
        if res.alignment:
            ptr = lib.edlibAlignmentToCigar(res.alignment,
                                            res.alignmentLength, 1)
            out["cigar"] = ctypes.string_at(ptr).decode()
            ctypes.CDLL(None).free(ctypes.c_void_p(ptr))
        return out
    finally:
        lib.edlibFreeAlignResult(res)
