"""Loader for the native C++ runtime (native/edlib_tpu_native.cpp).

Builds the shared library on first use (g++, a few hundred ms) and binds it
via ctypes — no pybind11 dependency.  Every entry point has a pure-Python
fallback; ``available()`` gates usage so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

def _find_native_dir() -> str:
    """Native C++ sources: repo layout (<root>/native) or installed layout
    (edlib_tpu/_native_src, copied in by setup.py's build hook)."""
    pkg = os.path.dirname(os.path.abspath(__file__))
    for cand in (os.path.join(os.path.dirname(pkg), "native"),
                 os.path.join(pkg, "_native_src")):
        if os.path.isdir(cand):
            return cand
    return os.path.join(os.path.dirname(pkg), "native")


def _build_dir() -> str:
    """Where compiled artifacts go: next to the sources when writable
    (repo layout — keeps mtime-based rebuilds simple), else a user cache
    (installed site-packages may be read-only)."""
    d = _find_native_dir()
    if os.access(d, os.W_OK):
        return d
    cache = os.path.join(os.path.expanduser("~"), ".cache", "edlib_tpu")
    os.makedirs(cache, exist_ok=True)
    return cache


_NATIVE_DIR = _find_native_dir()
_LIB_NAME = "libedlib_tpu_native.so"

_lock = threading.Lock()
_lib = None
_tried = False
_ext = None
_ext_tried = False


def _prebuilt_path(name: str, sources) -> Optional[str]:
    """A shared object shipped next to the sources (compiled into the wheel
    by setup.py) — used when its PREBUILT.json source hashes still match,
    so installed wheels import without a toolchain.  Content hashes, not
    mtimes: installers rewrite file times.  Repo layouts keep working too:
    without a manifest, a locally-built .so in native/ counts as prebuilt
    when at least as new as the sources.  EDLIB_TPU_REBUILD_NATIVE forces a
    local rebuild (e.g. for -march=native tuning)."""
    if os.environ.get("EDLIB_TPU_REBUILD_NATIVE"):
        return None
    cand = os.path.join(_NATIVE_DIR, name)
    if not os.path.exists(cand):
        return None
    manifest_path = os.path.join(_NATIVE_DIR, "PREBUILT.json")
    if os.path.exists(manifest_path):
        import hashlib
        import json
        try:
            with open(manifest_path) as f:
                want = json.load(f).get(name)
            if not want:
                return None
            for base, digest in want.items():
                with open(os.path.join(_NATIVE_DIR, base), "rb") as f:
                    if hashlib.sha256(f.read()).hexdigest() != digest:
                        return None
            return cand
        except (OSError, ValueError):
            return None
    try:
        newest_src = max(os.path.getmtime(s) for s in sources)
        if os.path.getmtime(cand) >= newest_src:
            return cand
    except OSError:
        pass
    return None


def _build_and_load_ext():
    """CPython extension for the hot single-pair call (~0.5us FFI vs ~10us
    ctypes); optional — everything works without it."""
    import sysconfig
    src = os.path.join(_NATIVE_DIR, "pyext.cpp")
    core = os.path.join(_NATIVE_DIR, "edlib_tpu_native.cpp")
    if not (os.path.exists(src) and os.path.exists(core)):
        return None
    pre = _prebuilt_path("_edlib_tpu_native_ext.so", (src, core))
    if pre is not None:
        mod = _load_ext_module(pre)
        if mod is not None:
            return mod
    ext_path = os.path.join(_build_dir(), "_edlib_tpu_native_ext.so")
    newest_src = max(os.path.getmtime(src), os.path.getmtime(core))
    if (not os.path.exists(ext_path)
            or os.path.getmtime(ext_path) < newest_src):
        inc = sysconfig.get_paths()["include"]
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-march=native", "-pthread",
                 "-shared", "-I", inc, src, core, "-o", ext_path],
                check=True, capture_output=True, timeout=300)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            return None
    return _load_ext_module(ext_path)


def _load_ext_module(ext_path: str):
    import importlib.util
    spec = importlib.util.spec_from_file_location("_edlib_tpu_native_ext",
                                                  ext_path)
    try:
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module
    except Exception:
        return None


def get_ext():
    global _ext, _ext_tried
    with _lock:
        if not _ext_tried:
            _ext_tried = True
            if not os.environ.get("EDLIB_TPU_NO_NATIVE"):
                _ext = _build_and_load_ext()
        return _ext


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_NATIVE_DIR, "edlib_tpu_native.cpp")
    compat = os.path.join(_NATIVE_DIR, "edlib_compat.cpp")
    if not os.path.exists(src):
        return None
    srcs = [src] + ([compat] if os.path.exists(compat) else [])
    lib = None
    pre = _prebuilt_path(_LIB_NAME, srcs)
    if pre is not None:
        try:
            lib = ctypes.CDLL(pre)
        except OSError:
            lib = None
    if lib is None:
        lib_path = os.path.join(_build_dir(), _LIB_NAME)
        newest = max(os.path.getmtime(s) for s in srcs)
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < newest):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-fPIC", "-march=native",
                     "-pthread", "-shared", "-o", lib_path] + srcs,
                    check=True, capture_output=True, timeout=300)
            except (subprocess.SubprocessError, FileNotFoundError, OSError):
                return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError:
            return None

    c_i64 = ctypes.c_int64
    lib.etn_fasta_stat.restype = ctypes.c_int
    lib.etn_fasta_stat.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(c_i64),
                                   ctypes.POINTER(c_i64)]
    lib.etn_fasta_read.restype = ctypes.c_int
    lib.etn_fasta_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_void_p, c_i64, c_i64]
    lib.etn_cigar_encode.restype = c_i64
    lib.etn_cigar_encode.argtypes = [ctypes.c_void_p, c_i64, ctypes.c_int,
                                     ctypes.c_void_p]
    lib.etn_sweep_scores.restype = None
    lib.etn_sweep_scores.argtypes = [ctypes.c_void_p, c_i64, ctypes.c_void_p,
                                     c_i64, ctypes.c_int, ctypes.c_void_p]
    lib.etn_build_peq.restype = None
    lib.etn_build_peq.argtypes = [ctypes.c_void_p, c_i64, ctypes.c_void_p,
                                  ctypes.c_int, ctypes.c_void_p]
    lib.etn_nw_path.restype = c_i64
    lib.etn_nw_path.argtypes = [ctypes.c_void_p, c_i64, ctypes.c_void_p,
                                c_i64, ctypes.c_void_p, ctypes.c_int,
                                ctypes.c_int32, ctypes.c_void_p]
    lib.etn_nw_cells_at.restype = None
    lib.etn_nw_cells_at.argtypes = [ctypes.c_void_p, c_i64, c_i64,
                                    ctypes.c_void_p, c_i64, ctypes.c_void_p]
    lib.etn_nw_cells_at_banded.restype = None
    lib.etn_nw_cells_at_banded.argtypes = [
        ctypes.c_void_p, c_i64, c_i64, ctypes.c_void_p, c_i64, c_i64,
        c_i64, ctypes.c_void_p]
    lib.etn_sweep_scores_banded.restype = c_i64
    lib.etn_sweep_scores_banded.argtypes = [
        ctypes.c_void_p, c_i64, ctypes.c_void_p, c_i64, ctypes.c_int,
        c_i64, ctypes.c_void_p]
    lib.etn_semiglobal_best.restype = c_i64
    lib.etn_semiglobal_best.argtypes = [
        ctypes.c_void_p, c_i64, ctypes.c_void_p, c_i64, c_i64, c_i64,
        c_i64, ctypes.c_int, c_i64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_void_p]
    lib.etn_transform.restype = c_i64
    lib.etn_transform.argtypes = [
        ctypes.c_char_p, c_i64, ctypes.c_char_p, c_i64, c_i64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.etn_nw_distance_banded.restype = ctypes.c_int32
    lib.etn_nw_distance_banded.argtypes = [
        ctypes.c_void_p, c_i64, ctypes.c_void_p, c_i64, c_i64, c_i64]
    lib.etn_obtain_alignment.restype = c_i64
    lib.etn_obtain_alignment.argtypes = [
        ctypes.c_void_p, c_i64, ctypes.c_void_p, c_i64, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int]
    lib.etn_align.restype = ctypes.c_int
    lib.etn_align.argtypes = [
        ctypes.c_char_p, c_i64, ctypes.c_char_p, c_i64,
        ctypes.c_int, ctypes.c_int, c_i64,
        ctypes.c_void_p, ctypes.c_void_p, c_i64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_void_p, ctypes.POINTER(c_i64), ctypes.c_void_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            if os.environ.get("EDLIB_TPU_NO_NATIVE"):
                _lib = None
            else:
                _lib = _build_and_load()
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------

def read_fasta(path: str) -> List[bytes]:
    """All sequences in a FASTA file (headerless-tolerant)."""
    lib = get_lib()
    if lib is None:
        return _read_fasta_py(path)
    n = ctypes.c_int64()
    total = ctypes.c_int64()
    if lib.etn_fasta_stat(path.encode(), ctypes.byref(n),
                          ctypes.byref(total)):
        raise FileNotFoundError(path)
    data = np.empty(total.value, dtype=np.uint8)
    offsets = np.empty(n.value + 1, dtype=np.int64)
    if lib.etn_fasta_read(path.encode(), data.ctypes.data,
                          offsets.ctypes.data, total.value, n.value):
        raise FileNotFoundError(path)
    return [data[offsets[i]:offsets[i + 1]].tobytes()
            for i in range(n.value)]


def _read_fasta_py(path: str) -> List[bytes]:
    """Pure-Python fallback with the reference reader's acceptance rules
    (aligner.cpp:290-328): headerless tolerated, '\\r'/'\\n' skipped."""
    seqs: List[bytearray] = []
    in_seq = False
    with open(path, "rb") as f:
        for raw in f:
            line = raw.rstrip(b"\r\n")
            if line.startswith(b">"):
                in_seq = False
                continue
            if not line:
                continue
            if not in_seq:
                seqs.append(bytearray())
                in_seq = True
            seqs[-1].extend(line)
    return [bytes(s) for s in seqs]


def cigar_encode_native(ops: np.ndarray, extended: bool) -> Optional[str]:
    lib = get_lib()
    if lib is None:
        return None
    ops = np.ascontiguousarray(ops, dtype=np.uint8)
    out = ctypes.create_string_buffer(12 * max(1, len(ops)) + 1)
    n = lib.etn_cigar_encode(ops.ctypes.data, len(ops), int(extended), out)
    if n < 0:
        raise ValueError("alignment contains invalid op codes (must be 0..3)")
    return out.value.decode()


def sweep_scores_native(peq64: np.ndarray, target_ext: np.ndarray,
                        hin0: int) -> Optional[np.ndarray]:
    """peq64: uint64 (sigma+1, n_words); target_ext: uint8 wildcard-extended
    symbols.  Returns int32 padded-bottom score per column."""
    lib = get_lib()
    if lib is None:
        return None
    peq64 = np.ascontiguousarray(peq64, dtype=np.uint64)
    target_ext = np.ascontiguousarray(target_ext, dtype=np.uint8)
    out = np.empty(len(target_ext), dtype=np.int32)
    lib.etn_sweep_scores(peq64.ctypes.data, peq64.shape[1],
                         target_ext.ctypes.data, len(target_ext), hin0,
                         out.ctypes.data)
    return out


SCORE_INF = 0x3FFFFFFF  # banded sweeps: "provably > k" marker

_MODE_CODE = {"NW": 0, "SHW": 1, "HW": 2}


def align_native(query: bytes, target: bytes, mode: str, want_starts: bool,
                 k: int, eq_pairs) -> Optional[dict]:
    """Full single-pair DISTANCE/LOC orchestration in C.

    Returns {editDistance, alphabetLength, endLocations, startLocations}
    with numpy arrays, or None when unavailable (no lib).  Handles the
    full 256-symbol alphabet range.  Empty sequences must be handled by
    the caller.
    """
    ext = get_ext()
    if ext is not None:
        eq_a = eq_b = None
        if eq_pairs:
            eq_a = bytes(p[0] for p in eq_pairs)
            eq_b = bytes(p[1] for p in eq_pairs)
        out = ext.align(query, target, _MODE_CODE[mode], int(want_starts),
                        int(k), eq_a, eq_b)
        if out is None:
            return None
        dist, alpha, ends, starts = out
        return {
            "editDistance": dist,
            "alphabetLength": alpha,
            "endLocations": np.asarray(ends, dtype=np.int64),
            "startLocations": (np.asarray(starts, dtype=np.int64)
                               if want_starts else None),
        }
    lib = get_lib()
    if lib is None:
        return None
    tlen = len(target)
    n_eq = 0
    eq_a = eq_b = None
    if eq_pairs:
        n_eq = len(eq_pairs)
        eq_a = np.array([p[0] for p in eq_pairs], dtype=np.uint8)
        eq_b = np.array([p[1] for p in eq_pairs], dtype=np.uint8)
    dist = ctypes.c_int32()
    alpha = ctypes.c_int32()
    n_locs = ctypes.c_int64()
    ends = np.empty(tlen + 1, dtype=np.int32)
    starts = np.empty(tlen + 1, dtype=np.int32)
    rc = lib.etn_align(
        query, len(query), target, tlen,
        _MODE_CODE[mode], int(want_starts), int(k),
        eq_a.ctypes.data if eq_a is not None else None,
        eq_b.ctypes.data if eq_b is not None else None, n_eq,
        ctypes.byref(dist), ctypes.byref(alpha),
        ends.ctypes.data, ctypes.byref(n_locs), starts.ctypes.data)
    if rc != 0:
        return None
    n = n_locs.value
    return {
        "editDistance": dist.value,
        "alphabetLength": alpha.value,
        "endLocations": ends[:n].astype(np.int64),
        "startLocations": starts[:n].astype(np.int64) if want_starts else None,
    }


def sweep_scores_banded_native(peq64: np.ndarray, target_ext: np.ndarray,
                               hin0: int, k: int) -> Optional[np.ndarray]:
    """Ukkonen-banded sweep; entries are exact where <= k, SCORE_INF where
    the band proves the score > k."""
    lib = get_lib()
    if lib is None:
        return None
    peq64 = np.ascontiguousarray(peq64, dtype=np.uint64)
    target_ext = np.ascontiguousarray(target_ext, dtype=np.uint8)
    out = np.empty(len(target_ext), dtype=np.int32)
    n = lib.etn_sweep_scores_banded(peq64.ctypes.data, peq64.shape[1],
                                    target_ext.ctypes.data, len(target_ext),
                                    hin0, int(k), out.ctypes.data)
    out[n:] = SCORE_INF  # band vanished: remaining columns are > k
    return out


def semiglobal_best_native(peq64: np.ndarray, target_ext: np.ndarray,
                           w_pad: int, qlen: int, tlen: int, hin0: int,
                           k: int):
    """(best, minimal end positions) in one native call — no score stream
    is materialised (etn_semiglobal_best).  k < 0 runs the reference's
    dynamic-k doubling loop in C.  Returns None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    peq64 = np.ascontiguousarray(peq64, dtype=np.uint64)
    target_ext = np.ascontiguousarray(target_ext, dtype=np.uint8)
    locs = np.empty(tlen + 1, dtype=np.int32)
    best = ctypes.c_int32(-1)
    n = lib.etn_semiglobal_best(peq64.ctypes.data, peq64.shape[1],
                                target_ext.ctypes.data, len(target_ext),
                                int(w_pad), int(qlen), int(tlen), hin0,
                                int(k), ctypes.byref(best), locs.ctypes.data)
    return int(best.value), locs[:n]


def transform_native(query: bytes, target: bytes):
    """(q_ids, t_ids, alphabet) via the branchless C table passes — the
    numpy unique+argsort transform costs ~20ms/Mbp; this is memcpy-speed.
    Returns None without the native lib; raises ValueError above 256
    symbols (parity with transform_sequences)."""
    lib = get_lib()
    if lib is None:
        return None
    q_ids = np.empty(max(len(query), 1), dtype=np.uint8)
    t_ids = np.empty(max(len(target), 1), dtype=np.uint8)
    alphabet = np.empty(256, dtype=np.uint8)
    sigma = lib.etn_transform(query, len(query), target, len(target), 256,
                              q_ids.ctypes.data, t_ids.ctypes.data,
                              alphabet.ctypes.data)
    if sigma < 0:
        raise ValueError(
            "query and target combined have more than 256 unique values, "
            "this is not supported.")
    return (q_ids[:len(query)], t_ids[:len(target)],
            alphabet[:sigma].tobytes())


def build_peq64_native(q_ids: np.ndarray, eq: np.ndarray
                       ) -> Optional[np.ndarray]:
    """64-bit query profile built in C (the numpy bit-packing path costs
    ~0.5s at Mbp scale; the C loop is ~10ms).  Returns uint64
    (sigma+1, n_words) with wildcard padding rows, like build_peq_words."""
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q_ids, dtype=np.uint8)
    sigma = eq.shape[0]
    eqm = np.ascontiguousarray(eq, dtype=np.uint8)
    n_words = max(1, (len(q) + 63) // 64)
    out = np.empty((sigma + 1, n_words), dtype=np.uint64)
    lib.etn_build_peq(q.ctypes.data, len(q), eqm.ctypes.data, sigma,
                      out.ctypes.data)
    return out


def nw_distance_banded_native(peq64: np.ndarray, t_ids: np.ndarray,
                              qlen: int, k: int) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    peq64 = np.ascontiguousarray(peq64, dtype=np.uint64)
    t = np.ascontiguousarray(t_ids, dtype=np.uint8)
    return int(lib.etn_nw_distance_banded(peq64.ctypes.data, peq64.shape[1],
                                          t.ctypes.data, len(t), qlen,
                                          int(k)))


def nw_cells_at_native(peq64: np.ndarray, qlen: int, t_ids: np.ndarray,
                       stop: int, k: Optional[int] = None
                       ) -> Optional[np.ndarray]:
    """Cell values of NW column `stop` (the Hirschberg half-sweep).

    With k given, runs the bestScore-banded sweep; out-of-band cells come
    back as SCORE_INF (provably > k)."""
    lib = get_lib()
    if lib is None:
        return None
    peq64 = np.ascontiguousarray(peq64, dtype=np.uint64)
    t = np.ascontiguousarray(t_ids, dtype=np.uint8)
    out = np.empty(qlen, dtype=np.int32)
    if k is None:
        lib.etn_nw_cells_at(peq64.ctypes.data, peq64.shape[1], qlen,
                            t.ctypes.data, stop, out.ctypes.data)
    else:
        lib.etn_nw_cells_at_banded(peq64.ctypes.data, peq64.shape[1], qlen,
                                   t.ctypes.data, len(t), stop, int(k),
                                   out.ctypes.data)
    return out


def obtain_alignment_native(q_ids: np.ndarray, t_ids: np.ndarray,
                            eq: np.ndarray, best_score: int,
                            use_threads: int = -1
                            ) -> Optional[np.ndarray]:
    """Full PATH reconstruction (dispatch + Hirschberg + traceback) in C.

    use_threads: 1 fork inside the recursion (single-call latency), 0
    sequential (callers pooling many alignments), -1 env default."""
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q_ids, dtype=np.uint8)
    t = np.ascontiguousarray(t_ids, dtype=np.uint8)
    eqb = np.ascontiguousarray(eq, dtype=np.uint8)
    ops = np.empty(len(q) + len(t) or 1, dtype=np.uint8)
    n = lib.etn_obtain_alignment(q.ctypes.data, len(q), t.ctypes.data,
                                 len(t), eqb.ctypes.data, eq.shape[0],
                                 best_score, ops.ctypes.data,
                                 int(use_threads))
    if n < 0:
        raise RuntimeError("native path reconstruction inconsistent with "
                           "best_score")
    return ops[:n]


def nw_path_native(q_ids: np.ndarray, t_ids: np.ndarray, eq: np.ndarray,
                   best_score: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q_ids, dtype=np.uint8)
    t = np.ascontiguousarray(t_ids, dtype=np.uint8)
    eqb = np.ascontiguousarray(eq, dtype=np.uint8)
    ops = np.empty(len(q) + len(t) or 1, dtype=np.uint8)
    n = lib.etn_nw_path(q.ctypes.data, len(q), t.ctypes.data, len(t),
                        eqb.ctypes.data, eq.shape[0], best_score,
                        ops.ctypes.data)
    if n < 0:
        raise RuntimeError("native traceback inconsistent with best_score")
    return ops[:n]
