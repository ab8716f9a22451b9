"""Alignment dispatch + Hirschberg divide & conquer (O(Q+T) space PATH).

Re-design of the reference components
  * C11 obtainAlignment dispatch      (edlib.cpp:1161-1213)
  * C12 obtainAlignmentHirschberg     (edlib.cpp:1231-1396)

The decision threshold and crossing-row search order replicate the reference
byte-for-byte (including its 64-bit-word memory-estimate formula, so method
choice — and therefore the emitted path — is identical for every input).
Half-sweeps use the host big-int engine's stop-column primitive
(`nw_run(stop=...)`, the analogue of targetStopPosition, edlib.cpp:896-908);
the crossing-row search is vectorised numpy instead of a scalar scan.
"""

from __future__ import annotations

import os
import threading

import numpy as np

from edlib_tpu.encode import build_peq_bigint
from edlib_tpu.ops.host import HostColumnProvider, decode_cells, nw_run
from edlib_tpu.path.traceback import traceback
from edlib_tpu.types import EDOP_DELETE, EDOP_INSERT

# Reference dispatch threshold: estimated traceback memory < 1MB
# (edlib.cpp:1186-1190).  Computed with the reference's 64-bit Word so the
# traceback-vs-Hirschberg choice matches exactly.
_REF_WORD_BYTES = 8
_TRACEBACK_MEM_LIMIT = 1024 * 1024

# Device-side PATH: the Hirschberg half-sweeps (the FLOP-heavy part of
# reconstruction, edlib.cpp:1252-1260) run as wavefront column captures on
# TPU.  Every recursion node costs a device round-trip, so the routing is
# dispatch-RTT-aware (utils/hw.py): auto-enabled on big pairs when the chip
# answers within _DEVICE_PATH_MAX_RTT_MS (directly attached), off through a
# slow tunnel.  EDLIB_TPU_DEVICE_PATH overrides: "1" forces on (any RTT),
# "0" forces off, "interpret" runs the kernels on CPU for tests.
_DEVICE_PATH_MIN_CELLS = 10_000_000_000
_DEVICE_PATH_MAX_RTT_MS = 2.0

# Pool workers mark their thread so every obtain_alignment reached through
# the per-pair call chain stays single-threaded (pool supplies the cores).
PATH_POOL_CTX = threading.local()


def _device_path_enabled(qlen: int, tlen: int, sigma: int) -> bool:
    dev = os.environ.get("EDLIB_TPU_DEVICE_PATH", "")
    if dev in ("0", "off"):
        return False
    from edlib_tpu.ops.wavefront import MAX_SIGMA_WAVEFRONT
    if sigma >= MAX_SIGMA_WAVEFRONT:
        return False
    if dev == "interpret":
        return True
    if qlen * tlen < _DEVICE_PATH_MIN_CELLS:
        return False
    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        return False
    # Bounded subprocess probe BEFORE any in-process jax init (a wedged
    # tunneled backend blocks indefinitely inside jax.default_backend()).
    from edlib_tpu.utils import hw
    rtt = hw.dispatch_rtt_ms()
    if rtt is None:
        return False
    if not dev and rtt > _DEVICE_PATH_MAX_RTT_MS:
        # Auto: only when the chip answers fast enough that per-node
        # round-trips are a small cost (directly attached, not tunneled);
        # "1" is an explicit opt-in with no RTT gate.
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _traceback_mem_estimate(qlen: int, tlen: int) -> int:
    max_blocks64 = -(-qlen // 64)
    return ((2 * _REF_WORD_BYTES + 4) * max_blocks64 * tlen + 2 * 4 * tlen)


def obtain_alignment(q_ids: np.ndarray, t_ids: np.ndarray,
                     eq: np.ndarray, best_score: int,
                     parallel: bool = True) -> np.ndarray:
    """Ops (uint8 EDOP codes) for the NW alignment of query vs window.

    parallel=False keeps the native recursion single-threaded — for
    callers fanning MANY alignments across a pool (nested forking
    thrashes the cores).  Pool workers that reach here through deep call
    chains (align()) set the thread-local flag instead.
    """
    if getattr(PATH_POOL_CTX, "sequential", False):
        parallel = False
    qlen, tlen = len(q_ids), len(t_ids)
    if qlen == 0 or tlen == 0:
        # Empty-sequence base case (edlib.cpp:1167-1175).
        op = EDOP_DELETE if qlen == 0 else EDOP_INSERT
        return np.full(qlen + tlen, op, dtype=np.uint8)

    if (_traceback_mem_estimate(qlen, tlen) >= _TRACEBACK_MEM_LIMIT
            and _device_path_enabled(qlen, tlen, eq.shape[0])):
        # Device-side PATH: Hirschberg with the half-sweeps on TPU;
        # small nodes fall back to native via the recursive dispatch.
        return _hirschberg(q_ids, t_ids, eq, best_score)

    if eq.shape[0] <= 255:
        # Full native reconstruction (dispatch + Hirschberg + traceback):
        # the Python recursion spends most of its time rebuilding profiles.
        from edlib_tpu import native_loader
        if native_loader.available():
            ops = native_loader.obtain_alignment_native(
                q_ids, t_ids, eq, best_score,
                use_threads=-1 if parallel else 0)
            if ops is not None:
                return ops

    if _traceback_mem_estimate(qlen, tlen) < _TRACEBACK_MEM_LIMIT:
        if eq.shape[0] <= 255:
            from edlib_tpu import native_loader
            ops = native_loader.nw_path_native(q_ids, t_ids, eq, best_score)
            if ops is not None:
                return ops
        peq = build_peq_bigint(q_ids, eq)
        provider = HostColumnProvider(peq, t_ids, qlen)
        return traceback(provider, qlen, tlen, best_score)
    return _hirschberg(q_ids, t_ids, eq, best_score)


def _hirschberg(q_ids: np.ndarray, t_ids: np.ndarray,
                eq: np.ndarray, best_score: int) -> np.ndarray:
    qlen, tlen = len(q_ids), len(t_ids)
    rq = q_ids[::-1].copy()
    rt = t_ids[::-1].copy()

    left_w = tlen // 2
    right_w = tlen - left_w

    # Forward sweep stopped at the last column of the left half, reverse
    # sweep stopped at the last column of the (reversed) right half
    # (edlib.cpp:1250-1260).
    left = rev = None
    if _device_path_enabled(qlen, tlen, eq.shape[0]):
        # TPU half-sweeps: the wavefront run over target[:stop+1] leaves
        # every word's state at exactly the stop column (no wildcard
        # extension), decoded to cells on host.  Forward and reverse are
        # two resumable kernel runs.
        from edlib_tpu.ops.wavefront import Wavefront
        dev = os.environ.get("EDLIB_TPU_DEVICE_PATH", "")
        wf = Wavefront(interpret=(dev == "interpret"))
        sigma = eq.shape[0]
        left = wf.column_cells(q_ids, t_ids, sigma, left_w - 1, eq=eq)
        rev = wf.column_cells(rq, rt, sigma, right_w - 1, eq=eq)
    if left is None and eq.shape[0] <= 255:
        from edlib_tpu import native_loader
        if native_loader.available():
            from edlib_tpu.encode import build_peq_words, num_words
            nw64 = num_words(qlen, 64)
            peq64 = build_peq_words(q_ids, eq, word_size=64, n_words=nw64)
            rpeq64 = build_peq_words(rq, eq, word_size=64, n_words=nw64)
            left = native_loader.nw_cells_at_native(peq64, qlen, t_ids,
                                                    left_w - 1,
                                                    k=best_score)
            rev = native_loader.nw_cells_at_native(rpeq64, qlen, rt,
                                                   right_w - 1,
                                                   k=best_score)
    if left is None:
        peq = build_peq_bigint(q_ids, eq)
        rpeq = build_peq_bigint(rq, eq)
        lstate, _, _ = nw_run(peq, t_ids, qlen, stop=left_w - 1)
        rstate, _, _ = nw_run(rpeq, rt, qlen, stop=right_w - 1)
        # left[r] = cost(query[:r+1], target[:left_w])
        left = decode_cells(lstate.Pv, lstate.Mv, qlen, boundary=left_w)
        # rev[j]  = cost(rq[:j+1], rt[:right_w]); suffix cost for original
        # row i is rev[qlen-1-i] (readBlockReverse, edlib.cpp:1290-1309).
        rev = decode_cells(rstate.Pv, rstate.Mv, qlen, boundary=right_w)
    left = np.asarray(left, dtype=np.int64)
    rev = np.asarray(rev, dtype=np.int64)
    right_suffix = rev[::-1]  # right_suffix[i] = cost(query[i:], target[left_w:])

    # Find the crossing row: first r in 0..Q-2 with
    # left[r] + right_suffix[r+1] == best, then the -1 / Q-1 boundary rows —
    # same search order as edlib.cpp:1327-1353 so ties break identically.
    row = None
    hits = np.nonzero(left[:-1] + right_suffix[1:] == best_score)[0]
    if hits.size:
        row = int(hits[0])
        l_score = int(left[row])
        r_score = int(right_suffix[row + 1])
    elif left_w + int(right_suffix[0]) == best_score:
        row = -1
        l_score = left_w
        r_score = int(right_suffix[0])
    elif int(left[qlen - 1]) + right_w == best_score:
        row = qlen - 1
        l_score = int(left[qlen - 1])
        r_score = right_w
    else:
        raise RuntimeError(
            "Hirschberg: no crossing row — bestScore is inconsistent")

    ul = obtain_alignment(q_ids[:row + 1], t_ids[:left_w], eq, l_score)
    lr = obtain_alignment(q_ids[row + 1:], t_ids[left_w:], eq, r_score)
    return np.concatenate([ul, lr])
