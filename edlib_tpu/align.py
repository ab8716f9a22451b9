"""Top-level alignment orchestration (C13, edlibAlign, edlib.cpp:146-301).

Pipeline: map inputs to bytes → alphabet transform → empty-sequence
shortcuts → query profile → mode engine sweep → location post-processing →
(optionally) start locations via reversed-SHW re-runs → (optionally) PATH via
traceback/Hirschberg.

Engine-neutral by design: the sweeps come from the host big-int engine
(latency path, always available) or the batched JAX/Pallas engines
(throughput path).  All engines are full-sweep: the reference's Ukkonen
banding / dynamic-k doubling (edlib.cpp:199-217, 601-642, 796-870) are pure
pruning optimisations whose observable outputs are identical, so here k only
post-filters results; banded device kernels are a performance layer.

One reference quirk is emulated exactly: edlib can report end location -1
(query aligned entirely before the target, edlib.cpp:237-249).  With 64-bit
words that candidate exists iff W64 = 64*ceil(Q/64) - Q >= 1, i.e. iff
Q % 64 != 0, and its score is exactly Q (it survives filtering only when the
overall best equals Q).  We reproduce that rule word-size-independently.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

from edlib_tpu import encode, native_loader
from edlib_tpu.ops import host as host_engine
from edlib_tpu.path.hirschberg import obtain_alignment
from edlib_tpu.types import (
    STATUS_OK,
    AlignMode,
    AlignResult,
    AlignTask,
)

_INF = float("inf")


def _neg1_candidate_exists(qlen: int) -> bool:
    """edlib-64 parity: the -1 end-location candidate (score == Q) exists iff
    the reference's last 64-bit block has padding (Q % 64 != 0)."""
    return qlen % 64 != 0


def _filter_locations(col_scores: np.ndarray, qlen: int, k_eff: float
                      ) -> Tuple[int, List[int]]:
    """All minimal end positions from per-column bottom-row scores.

    Equivalent to the incremental record/clear/tighten of
    myersCalcEditDistanceSemiGlobal (edlib.cpp:657-693) on a full sweep.
    """
    candidates_scores = [int(col_scores.min())] if col_scores.size else []
    best = min(candidates_scores) if candidates_scores else _INF
    if _neg1_candidate_exists(qlen):
        best = min(best, qlen)
    if best > k_eff or best is _INF:
        return -1, []
    positions: List[int] = []
    if _neg1_candidate_exists(qlen) and qlen == best:
        positions.append(-1)
    positions.extend(int(p) for p in np.nonzero(col_scores == best)[0])
    return int(best), positions


def _native_ctx(q_ids, t_ids, eq):
    """(peq64, t_ext, w64) for the native 64-bit engines, or None."""
    from edlib_tpu import native_loader
    sigma = eq.shape[0]
    if sigma > 255 or not native_loader.available():
        return None
    qlen = len(q_ids)
    nw64 = encode.num_words(qlen, 64)
    w64 = nw64 * 64 - qlen
    peq64 = native_loader.build_peq64_native(q_ids, eq)
    if peq64 is None:
        peq64 = encode.build_peq_words(q_ids, eq, word_size=64,
                                       n_words=nw64)
    t_ext = np.concatenate([np.asarray(t_ids, np.uint8),
                            np.full(w64, sigma, np.uint8)])
    return peq64, t_ext, w64


def _semiglobal_best_positions(q_ids, t_ids, eq, mode, k_eff
                               ) -> Tuple[int, List[int]]:
    """Best score + all minimal end positions for HW/SHW.

    Native path uses the Ukkonen-banded sweep; unbounded k runs the
    reference's dynamic-k doubling loop (k=64, 128, ... — edlib.cpp:199-217)
    since banding needs a finite k.  Banded entries are exact wherever
    <= the k in force, so filtering is unchanged.
    """
    mode = AlignMode.parse(mode)
    qlen = len(q_ids)
    hin0 = 0 if mode == AlignMode.HW else 1
    ctx = _native_ctx(q_ids, t_ids, eq)
    if ctx is not None:
        from edlib_tpu import native_loader
        peq64, t_ext, w64 = ctx
        # Inline native search: no score stream, dynamic-k doubling in C
        # (etn_semiglobal_best; semiglobal best never exceeds qlen so the
        # band caps there, edlib.cpp:566-568).
        k = -1 if (k_eff is _INF or k_eff >= (1 << 40)) else int(k_eff)
        out = native_loader.semiglobal_best_native(
            peq64, t_ext, w64, qlen, len(t_ids), hin0, k)
        if out is not None:
            best, positions = out
            if best < 0:
                return -1, []
            return best, [int(p) for p in positions]
    peq = encode.build_peq_bigint(q_ids, eq)
    scores = host_engine.semiglobal_scores(peq, t_ids, qlen, mode)
    return _filter_locations(scores, qlen, k_eff)


# Huge-pair NW distances route to the banded wavefront TPU kernel above a
# break-even DP-cell count (one long pair spread across the whole VPU beats
# the single-core banded CPU loop there; below it, dispatch latency
# dominates).  The break-even scales with the measured device dispatch RTT
# (utils/hw.py): ~10 Gcells on an attached chip, Mbp-square pairs through
# this host's ~25ms tunnel (docs/PERF.md).  EDLIB_TPU_WAVEFRONT_MIN_CELLS
# overrides (None here = derive from RTT); _WAVEFRONT_MIN_CELLS is also the
# test monkeypatch point.
_env_wf = os.environ.get("EDLIB_TPU_WAVEFRONT_MIN_CELLS")
_WAVEFRONT_MIN_CELLS = int(_env_wf) if _env_wf else None
_WAVEFRONT_FLOOR_CELLS = 8_000_000_000        # attached-chip break-even
_WAVEFRONT_CEIL_CELLS = 400_000_000_000       # ~25ms-tunnel break-even
_WAVEFRONT_CELLS_PER_MS = 16_000_000_000      # floor/0.5ms == ceil/25ms


def _wavefront_threshold() -> int:
    if _WAVEFRONT_MIN_CELLS is not None:
        return _WAVEFRONT_MIN_CELLS
    from edlib_tpu.utils import hw
    return hw.scaled_min_cells(hw.dispatch_rtt_ms(), _WAVEFRONT_CELLS_PER_MS,
                               _WAVEFRONT_FLOOR_CELLS, _WAVEFRONT_CEIL_CELLS)


def _wavefront_gate() -> int:
    """Cheap integer pre-gate (no RTT probe, no jax import) shared by the
    device-routing call sites — one definition so they cannot drift."""
    return (_WAVEFRONT_MIN_CELLS if _WAVEFRONT_MIN_CELLS is not None
            else _WAVEFRONT_FLOOR_CELLS)


def _nw_wavefront_enabled(qlen: int, tlen: int, sigma: int,
                          cells: Optional[int] = None) -> bool:
    # Size gate first: it is a pure integer compare and excludes ~all calls
    # (the sigma-cap import below would pull in jax; the env lookups cost
    # more than the whole small-N fast path).  The RTT probe only runs for
    # pairs above the attached-chip floor — already tens of CPU-seconds of
    # work, so the one-time subprocess probe is noise.
    # cells: similarity-aware effective DP-cell estimate (see
    # _nw_effective_cells); raw qlen*tlen when the caller has no bound.
    if cells is None:
        cells = qlen * tlen
    if cells < _wavefront_gate():
        return False
    from edlib_tpu.ops.wavefront import MAX_SIGMA_WAVEFRONT
    if sigma >= MAX_SIGMA_WAVEFRONT:
        return False
    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        return False
    forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
    if forced:
        return cells >= _wavefront_threshold()
    # Bounded subprocess probe BEFORE any in-process jax call: initialising
    # a wedged tunneled backend blocks indefinitely (utils/hw.device_ready).
    from edlib_tpu.utils import hw
    if not hw.device_ready():
        return False
    if cells < _wavefront_threshold():
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _nw_effective_cells(q_ids, t_ids, eq, k_eff,
                        d_ub: Optional[int] = None) -> int:
    """Similarity-aware DP cost estimate for NW routing.

    The native banded engine visits ~2*(d+1)*max_len cells once the
    doubling ladder lands (its Ukkonen band is the value+position edge,
    like edlib.cpp:753-755), while the wavefront kernel's cost is the raw
    qlen*tlen regardless of similarity — so for SIMILAR Mbp pairs the CPU
    engine beats the device (measured round 3: 2.07s native vs 3.55s
    wavefront on the 97% 1Mbp pair) and raw-cell routing picks wrong.
    Estimate the banded cost from the O(n) substitution upper bound
    (hamming + length difference, equality-aware; pass d_ub to reuse a
    bound already computed); a finite user k caps it too (the band never
    exceeds k).  Conservative for indel-shifted pairs (hamming >> d),
    where the estimate stays near raw cells and the wavefront keeps the
    job."""
    qlen, tlen = len(q_ids), len(t_ids)
    if d_ub is None:
        d_ub = encode.nw_upper_bound(q_ids, t_ids, eq)
    if not (k_eff is _INF or k_eff >= (1 << 40)):
        d_ub = min(d_ub, int(k_eff) + 1)
    return min(qlen * tlen, 2 * (d_ub + 1) * max(qlen, tlen))


def _nw_wavefront_run(q_ids, t_ids, eq, k_eff) -> int:
    """One NW distance on the banded wavefront device kernel."""
    from edlib_tpu.ops.wavefront import BandedWavefront
    forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
    wfb = BandedWavefront(interpret=(forced == "interpret"))
    k = -1 if (k_eff is _INF or k_eff >= (1 << 40)) else int(k_eff)
    return wfb.nw_distance(np.asarray(q_ids, np.uint8),
                           np.asarray(t_ids, np.uint8),
                           eq.shape[0], k=k, eq=eq)


# Host-vs-device race budget: the native side's k ladder is capped at
# raw_cells / (_RACE_BUDGET_FACTOR * max_len), sized so its CPU spend is
# comparable to the device sweep's wall time (measured rates on the 1Mbp
# pair: native banded ~30 GCUPS-at-band vs wavefront ~280 GCUPS raw).
_RACE_BUDGET_FACTOR = 16
# Base device-wedge deadline (compile + dispatch allowance); tests shrink.
_RACE_BASE_DEADLINE_S = 120.0


def _nw_race(q_ids, t_ids, eq, k_eff, d_ub: Optional[int] = None) -> int:
    """NW distance for big pairs: device wavefront and budget-capped
    native ladder run CONCURRENTLY; first definitive answer wins.

    The hamming-based routing estimate (_nw_effective_cells) cannot see
    indel-shifted similarity — the common real-genome case (97% 1Mbp
    mutant: hamming ~760k but d = 31.5k, native 2.1s vs wavefront 3.6s) —
    so instead of guessing, spend the otherwise-idle host CPU: the native
    side ladders k up to a budget (where its cost would exceed the device
    sweep) while the device sweeps the full band.  Similar pairs return at
    native speed, dissimilar ones at device speed; both routes are exact,
    so the winner's answer is THE answer.  EDLIB_TPU_NW_RACE=0 and forced
    interpret mode use the plain device path (deterministic for tests)."""
    import threading

    from edlib_tpu import native_loader

    qlen, tlen = len(q_ids), len(t_ids)
    if d_ub is None:
        d_ub = encode.nw_upper_bound(q_ids, t_ids, eq)
    bound = max(1, min(max(qlen, tlen), d_ub))
    k_user = (None if (k_eff is _INF or k_eff >= (1 << 40))
              else int(k_eff))
    k_budget = max(1024, (qlen * tlen)
                   // (_RACE_BUDGET_FACTOR * max(qlen, tlen)))
    definitive_cap = bound if k_user is None else min(bound, k_user)
    cap = min(k_budget, definitive_cap)

    done = threading.Event()
    state = {}

    def native_side():
        try:
            ctx = _native_ctx(q_ids, t_ids, eq)
            if ctx is None:
                state["native"] = ("gaveup", None)
                return
            peq64, _, _ = ctx
            k = 64
            while True:
                kk = min(k, cap)
                d = native_loader.nw_distance_banded_native(
                    peq64, t_ids, qlen, kk)
                if d >= 0:
                    state["native"] = ("done", d)
                    return
                if kk >= cap:
                    if cap >= definitive_cap:
                        # proven d > k_user (or > bound, impossible)
                        state["native"] = ("done", -1)
                    else:
                        state["native"] = ("gaveup", None)
                    return
                k *= 2
        except Exception:
            state["native"] = ("gaveup", None)
        finally:
            done.set()

    def device_side():
        try:
            state["device"] = ("done",
                               _nw_wavefront_run(q_ids, t_ids, eq, k_eff))
        except Exception as e:
            state["device"] = ("error", e)
        finally:
            done.set()

    tn = threading.Thread(target=native_side, daemon=True)
    td = threading.Thread(target=device_side, daemon=True)
    tn.start()
    td.start()
    # Deadline: a tunneled device can wedge MID-RUN (after the bounded
    # device_ready probe passed).  Give the device generous compile +
    # sweep time scaled to the problem, then stop waiting on it — the
    # daemon thread is abandoned and the uncapped native engine answers.
    deadline = (time.monotonic() + _RACE_BASE_DEADLINE_S
                + (qlen * tlen) / 50e9)  # ~50 GCUPS worst-case device rate
    extended = False
    while True:
        done.wait(timeout=max(0.1, deadline - time.monotonic()))
        done.clear()
        n = state.get("native")
        d = state.get("device")
        if n and n[0] == "done":
            return n[1]
        if d and d[0] == "done":
            return d[1]
        if d and d[0] == "error" and n:  # both ran out of road
            break
        if n and d:  # native gave up, device errored (ordering races)
            break
        if time.monotonic() >= deadline and n:
            # Healthy-but-slow is indistinguishable from wedged by wall
            # clock alone, and abandoning a live device here hands the pair
            # to the UNCAPPED native ladder — the engine that was too slow
            # to finish inside its race budget.  A cold Mosaic compile over
            # a tunneled backend can alone exceed the base deadline, so give
            # a still-running device thread one doubled grace period before
            # declaring it wedged.
            if not extended and td.is_alive():
                extended = True
                deadline = (time.monotonic() + _RACE_BASE_DEADLINE_S
                            + (qlen * tlen) / 25e9)
                continue
            break  # device wedged mid-run
    # Device unusable.  Resume the native ladder where the race side
    # stopped (d > cap is already proven) instead of restarting at 64.
    n = state.get("native")
    d = state.get("device")
    ctx = _native_ctx(q_ids, t_ids, eq)
    if ctx is None:
        if d and d[0] == "error" and d[1] is not None:
            # No fast host engine either: surface the device failure
            # rather than grinding the O(q*t) bigint engine for hours.
            raise d[1]
        return _nw_score_host(q_ids, t_ids, eq, k_eff, allow_device=False)
    peq64, _, _ = ctx
    k = cap * 2 if (n and n[0] == "gaveup") else 64
    while True:
        kk = min(k, definitive_cap)
        dist = native_loader.nw_distance_banded_native(
            peq64, t_ids, qlen, kk)
        if dist >= 0:
            return dist
        if kk >= definitive_cap:
            return -1  # proven d > k_eff (unreachable for unbounded k)
        k *= 2


def _nw_score_host(q_ids, t_ids, eq, k_eff, allow_device: bool = True) -> int:
    """NW distance, or -1 if above k_eff.  Banded native path with the
    dynamic-k doubling loop for unbounded k; multi-Gcell pairs go to the
    banded wavefront kernel when a TPU is attached (allow_device) — the
    PATH pipeline keeps the distance native, where it is a small fraction
    of the Hirschberg work and device dispatch would only add latency."""
    qlen, tlen = len(q_ids), len(t_ids)
    eff_cells = d_ub = None
    if allow_device and qlen * tlen >= _wavefront_gate():
        # O(n) bound only for device candidates; computed once and shared
        # with the race's native ladder cap.
        d_ub = encode.nw_upper_bound(q_ids, t_ids, eq)
        eff_cells = _nw_effective_cells(q_ids, t_ids, eq, k_eff, d_ub)
    if allow_device and _nw_wavefront_enabled(qlen, tlen, eq.shape[0],
                                              eff_cells):
        forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
        if forced or os.environ.get("EDLIB_TPU_NW_RACE", "") in ("0",
                                                                 "off"):
            return _nw_wavefront_run(q_ids, t_ids, eq, k_eff)
        return _nw_race(q_ids, t_ids, eq, k_eff, d_ub)
    ctx = _native_ctx(q_ids, t_ids, eq)
    if ctx is not None:
        from edlib_tpu import native_loader
        peq64, _, _ = ctx
        # Substitution-only cap (same cap in etn_align, encode docstring).
        bound = max(1, min(max(qlen, tlen),
                           encode.nw_upper_bound(q_ids, t_ids, eq)))
        if k_eff is _INF or k_eff >= (1 << 40):
            k = 64
            while True:
                d = native_loader.nw_distance_banded_native(
                    peq64, t_ids, qlen, min(k, bound))
                if d >= 0:
                    return d
                if k >= bound:
                    return -1  # unreachable: d <= hb == bound
                k *= 2
        return native_loader.nw_distance_banded_native(
            peq64, t_ids, qlen, int(min(k_eff, bound)))
    peq = encode.build_peq_bigint(q_ids, eq)
    state, _, _ = host_engine.nw_run(peq, t_ids, qlen)
    score = int(state.score)
    return score if score <= k_eff else -1


def _hw_start_locations(q_ids, t_ids, eq, edit_distance: int,
                        end_locations: Sequence[int]) -> List[int]:
    """HW start locations: reversed-SHW per end location (edlib.cpp:230-266).

    Takes the LAST minimal SHW position so alignments do not start with
    insertions when they could start with mismatches (edlib.cpp:258-260).
    """
    qlen = len(q_ids)
    rq = q_ids[::-1].copy()
    starts = []
    for e in end_locations:
        if e == -1:
            # Open edge case acknowledged by the reference (edlib.cpp:237-249).
            starts.append(0)
            continue
        # Minimal reversed-SHW positions never exceed qlen-1+edit_distance
        # (cell value >= position - (qlen-1)): truncating bounds the O(e)
        # prefix copy, matching the band-death exit (edlib.cpp:644-654).
        lim = qlen + edit_distance
        rt_prefix = t_ids[max(0, e + 1 - lim):e + 1][::-1].copy()
        _, positions = _semiglobal_best_positions(rq, rt_prefix, eq,
                                                  AlignMode.SHW,
                                                  edit_distance)
        starts.append(e - positions[-1])
    return starts


def align_ids(q_ids: np.ndarray, t_ids: np.ndarray, eq: np.ndarray,
              k: int, mode: AlignMode, task: AlignTask,
              alphabet_length: int) -> AlignResult:
    """Core alignment over transformed symbol ids (everything after the
    alphabet transform in edlibAlign)."""
    result = AlignResult(status=STATUS_OK, alphabet_length=alphabet_length)
    qlen, tlen = len(q_ids), len(t_ids)

    # Empty-sequence special case — returns early with end locations only,
    # no start locations or alignment even for LOC/PATH (edlib.cpp:166-184).
    if qlen == 0 or tlen == 0:
        if mode == AlignMode.NW:
            result.edit_distance = max(qlen, tlen)
            result.end_locations = np.array([tlen - 1], dtype=np.int64)
        else:
            result.edit_distance = qlen
            result.end_locations = np.array([-1], dtype=np.int64)
        result.num_locations = 1
        return result

    k_eff = _INF if k < 0 else k

    if mode in (AlignMode.HW, AlignMode.SHW):
        best, positions = _semiglobal_best_positions(q_ids, t_ids, eq, mode,
                                                     k_eff)
        result.edit_distance = best
        if best >= 0:
            result.end_locations = np.array(positions, dtype=np.int64)
            result.num_locations = len(positions)
    else:  # NW
        score = _nw_score_host(q_ids, t_ids, eq, k_eff,
                               allow_device=(task != AlignTask.PATH))
        if score >= 0:
            result.edit_distance = score
            result.end_locations = np.array([tlen - 1], dtype=np.int64)
            result.num_locations = 1

    if result.edit_distance < 0:
        return result

    if task in (AlignTask.LOC, AlignTask.PATH):
        if mode == AlignMode.HW:
            result.start_locations = np.array(
                _hw_start_locations(q_ids, t_ids, eq, result.edit_distance,
                                    result.end_locations),
                dtype=np.int64)
        else:
            result.start_locations = np.zeros(result.num_locations,
                                              dtype=np.int64)

    if task == AlignTask.PATH:
        # Alignment only for the first location pair (edlib.cpp:274-289).
        start0 = int(result.start_locations[0])
        end0 = int(result.end_locations[0])
        window = t_ids[start0:end0 + 1]
        result.alignment = obtain_alignment(q_ids, window, eq,
                                            result.edit_distance)
        result.alignment_length = len(result.alignment)

    return result


# Exact-spelling fast lookups for the hot align() prologue (the generic
# enum parses cost ~1us/call at N=30 scale); any other spelling falls back
# to the full parser.
_MODE_LUT = {"NW": AlignMode.NW, "SHW": AlignMode.SHW, "HW": AlignMode.HW,
             AlignMode.NW: AlignMode.NW, AlignMode.SHW: AlignMode.SHW,
             AlignMode.HW: AlignMode.HW}
_TASK_LUT = {"distance": AlignTask.DISTANCE, "locations": AlignTask.LOC,
             "path": AlignTask.PATH, AlignTask.DISTANCE: AlignTask.DISTANCE,
             AlignTask.LOC: AlignTask.LOC, AlignTask.PATH: AlignTask.PATH}
_EXT = None
_EXT_TRIED = False


def align(query, target, mode="NW", task="distance", k=-1,
          additionalEqualities=None) -> dict:
    """Align query with target using edit distance.

    Signature and result-dict parity with the reference Python binding
    (edlib.pyx:56-155): returns {editDistance, alphabetLength,
    locations: [(start|None, end)], cigar (extended) | None}.
    """
    m = _MODE_LUT.get(mode)
    mode = AlignMode.parse(mode) if m is None else m
    tk = _TASK_LUT.get(task)
    task = AlignTask.parse(task) if tk is None else tk
    if k is None:
        k = -1
    qb, tb, eq_pairs = encode.map_to_bytes(query, target, additionalEqualities)

    # Latency fast path: full DISTANCE/LOC orchestration in one native call
    # through the CPython extension (no numpy in the loop).  PATH, empty
    # sequences, and huge NW pairs (wavefront TPU kernel) take the general
    # route.
    nw_huge = (mode == AlignMode.NW
               and _nw_wavefront_enabled(len(qb), len(tb), 0))
    if task != AlignTask.PATH and len(qb) and len(tb) and not nw_huge:
        global _EXT, _EXT_TRIED
        if not _EXT_TRIED:
            _EXT = native_loader.get_ext()
            _EXT_TRIED = True
        ext = _EXT
        if ext is not None:
            eq_a = eq_b = None
            if eq_pairs:
                eq_a = bytes(p[0] for p in eq_pairs)
                eq_b = bytes(p[1] for p in eq_pairs)
            out = ext.align(qb, tb, int(mode), int(task == AlignTask.LOC),
                            int(k), eq_a, eq_b)
            if out is not None:
                dist, alpha, ends, starts = out
                if starts is None:
                    locations = [(None, e) for e in ends]
                else:
                    locations = list(zip(starts, ends))
                return {
                    "editDistance": dist,
                    "alphabetLength": alpha,
                    "locations": locations,
                    "cigar": None,
                }
        res = native_loader.align_native(qb, tb, mode.name,
                                         task == AlignTask.LOC, k, eq_pairs)
        if res is not None:
            locations = []
            starts = res["startLocations"]
            for i, e in enumerate(res["endLocations"]):
                s = int(starts[i]) if starts is not None else None
                locations.append((s, int(e)))
            if res["editDistance"] < 0:
                locations = []
            return {
                "editDistance": int(res["editDistance"]),
                "alphabetLength": int(res["alphabetLength"]),
                "locations": locations,
                "cigar": None,
            }

    q_ids, t_ids, alphabet = encode.transform_sequences(qb, tb)
    eq = encode.build_equality_matrix(alphabet, eq_pairs)
    result = align_ids(q_ids, t_ids, eq, k, mode, task, len(alphabet))
    return result.to_dict()


def align_batch(queries, targets, mode="NW", task="distance", k=-1,
                additionalEqualities=None, backend: str = "auto",
                mesh=None) -> List[dict]:
    """Batched alignment — the TPU throughput path.

    queries/targets: sequences of str/bytes; pair i aligns queries[i] vs
    targets[i] (if a single target is given it is broadcast to all queries).
    Results match per-pair ``align`` exactly.

    backend: "auto" | "jax" | "host".  The device path buckets by shape,
    packs the batch, and runs the batched Myers sweep on TPU.  "auto"
    uses the device path only when a device is attached (or forced via
    EDLIB_TPU_FORCE_PALLAS); otherwise the native host engines run the
    batch — "jax" forces the device driver regardless.

    mesh: optional ``jax.sharding.Mesh`` with axes ("dp", "sp") — shards the
    work across devices with the location merge done ON device (pmin/pmax
    collectives + packed hit bitmasks; parallel/dist.py): shared-target HW
    buckets are sequence-parallel over "sp" with halo slices, everything
    else data-parallel over the whole mesh.  Results are identical to the
    single-device path.
    """
    if isinstance(targets, (str, bytes, bytearray)):
        targets = [targets] * len(queries)
    if len(queries) != len(targets):
        raise ValueError("queries and targets must have equal length")
    use_host = backend == "host"
    if backend == "auto" and mesh is None:
        # No device (and none forced): the batched XLA scan engine on CPU
        # is latency-pathological (~20x the native loop) — route to the
        # native host engines.  backend="jax" still forces the device
        # driver (tests/debugging).  Tiny batches skip the probe entirely:
        # device dispatch never wins at this size, and _pallas_mode()
        # initialises the jax backend (seconds the host loop never pays).
        if len(queries) <= 8 and "EDLIB_TPU_FORCE_PALLAS" not in os.environ:
            use_host = True
        else:
            from edlib_tpu.batch import _pallas_mode
            use_host = not _pallas_mode()
    if use_host and mesh is None:
        one = lambda qt: align(qt[0], qt[1], mode=mode, task=task, k=k,
                               additionalEqualities=additionalEqualities)
        pairs = list(zip(queries, targets))
        # PATH batches scale across cores: pairs are independent and the
        # native engines release the GIL.  distance/locations calls are
        # usually too short to amortise pool dispatch.
        if (AlignTask.parse(task) == AlignTask.PATH and len(pairs) >= 4
                and native_loader.available()
                and os.environ.get("EDLIB_TPU_THREADS", "") not in
                ("0", "1")):
            from concurrent.futures import ThreadPoolExecutor
            from edlib_tpu.path.hirschberg import PATH_POOL_CTX

            def one_seq(qt):
                # pool supplies the parallelism; keep the per-pair
                # recursion single-threaded (nested forking thrashes)
                PATH_POOL_CTX.sequential = True
                return one(qt)

            with ThreadPoolExecutor(
                    max_workers=min(len(pairs), os.cpu_count() or 1)) as p:
                return list(p.map(one_seq, pairs))
        return [one(qt) for qt in pairs]
    from edlib_tpu.batch import align_batch_device
    return align_batch_device(queries, targets, mode=mode, task=task, k=k,
                              additionalEqualities=additionalEqualities,
                              mesh=mesh)
