"""Long single-pair alignment helpers (wavefront-accelerated).

``nw_distance_long`` computes the global edit distance of ONE long pair,
using the banded wavefront TPU kernel when a TPU is present and the native
banded CPU engine otherwise.  Results are exactly edlib-compatible NW
distances (the -1-above-k convention applies when k >= 0).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from edlib_tpu import encode


def _max_sigma_wf() -> int:
    from edlib_tpu.ops.wavefront import MAX_SIGMA_WAVEFRONT
    return MAX_SIGMA_WAVEFRONT


def _device_ready() -> bool:
    # Bounded subprocess probe before any in-process jax init (a wedged
    # tunneled backend blocks indefinitely inside jax.default_backend()).
    from edlib_tpu.utils import hw
    return hw.device_ready()


def _wf_min_cells() -> int:
    # Effective break-even (env override or dispatch-RTT-scaled, align.py).
    from edlib_tpu.align import _wavefront_threshold
    return _wavefront_threshold()


def _to_ids(query, target):
    qb = query.encode() if isinstance(query, str) else bytes(query)
    tb = target.encode() if isinstance(target, str) else bytes(target)
    q_ids, t_ids, alphabet = encode.transform_sequences(qb, tb)
    return q_ids, t_ids, len(alphabet)


def nw_distance_long(query, target, k: int = -1,
                     backend: str = "auto") -> int:
    """NW edit distance of one (possibly multi-Mbp) pair.

    backend: "auto" (wavefront on TPU, native otherwise), "wavefront",
    "native".  Returns -1 when k >= 0 and the distance exceeds k.
    """
    q_ids, t_ids, sigma = _to_ids(query, target)
    qlen, tlen = len(q_ids), len(t_ids)
    if qlen == 0 or tlen == 0:
        d = max(qlen, tlen)
        return d if k < 0 or d <= k else -1

    use_wavefront = backend == "wavefront"
    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        use_wavefront = False

    if use_wavefront:
        from edlib_tpu.ops.wavefront import BandedWavefront
        forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
        wfb = BandedWavefront(interpret=(forced == "interpret"))
        return wfb.nw_distance(q_ids.astype(np.uint8), t_ids.astype(np.uint8),
                               sigma, k=k)

    # "auto" shares align()'s routing wholesale: similarity-aware effective
    # cells, then the host-vs-device race for big device-worthy pairs
    # (align._nw_race); "native" pins the host engine.
    from edlib_tpu.align import _nw_score_host, _INF
    eq = np.eye(sigma, dtype=bool)
    return _nw_score_host(q_ids, t_ids, eq, _INF if k < 0 else k,
                          allow_device=(backend == "auto"))


def shw_best_long(query, target, k: int = -1,
                  backend: str = "auto"):
    """SHW (prefix) best score and FIRST best end location for one long
    pair: ``(editDistance, endLocation)``; ``(-1, -1)`` when k >= 0 and
    the best exceeds k.

    The first location matches the head of edlib's endLocations list,
    including the -1 "query ends before the target" padding artifact
    (edlib.cpp:550-704; see align._filter_locations).  backend as in
    :func:`nw_distance_long`.
    """
    q_ids, t_ids, sigma = _to_ids(query, target)
    qlen, tlen = len(q_ids), len(t_ids)
    if qlen == 0 or tlen == 0:
        # edlib's empty-sequence early return (edlib.cpp:166-184).
        return (qlen, -1) if k < 0 or qlen <= k else (-1, -1)

    use_wavefront = backend == "wavefront"
    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        use_wavefront = False
    elif backend == "auto":
        forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
        try:
            import jax
            use_wavefront = sigma < _max_sigma_wf() \
                and qlen * tlen >= _wf_min_cells() \
                and (bool(forced) or (_device_ready()
                                      and jax.default_backend() == "tpu"))
        except Exception:
            use_wavefront = False

    if use_wavefront:
        from edlib_tpu.ops.wavefront import BandedWavefront
        forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
        wfb = BandedWavefront(interpret=(forced == "interpret"))
        best, pos = wfb.shw_best(q_ids.astype(np.uint8),
                                 t_ids.astype(np.uint8), sigma, k=k)
    else:
        from edlib_tpu.align import _semiglobal_best_positions, _INF
        eq = np.eye(sigma, dtype=bool)
        best, positions = _semiglobal_best_positions(
            q_ids, t_ids, eq, "SHW", _INF if k < 0 else k)
        return (best, positions[0]) if best >= 0 else (-1, -1)

    if best < 0:
        return (-1, -1)
    if best == qlen and qlen % 64 != 0:
        return best, -1   # the 64-bit padding artifact precedes column 0
    return best, pos


def semiglobal_locations_long(query, target, mode: str = "HW", k: int = -1,
                              backend: str = "auto"):
    """ALL minimal end locations of one long semiglobal pair:
    ``(editDistance, [endLocations])`` — the list identical to
    edlib's order (edlib.cpp:657-693), ``(-1, [])`` above ``k``.

    On TPU the stream-emitting unbanded wavefront produces the full
    bottom-row score stream on device (full sweep + host filter is
    output-equivalent to the reference's banded engine); otherwise the
    native banded sweep runs.  backend as in :func:`nw_distance_long`.
    """
    q_ids, t_ids, sigma = _to_ids(query, target)
    qlen, tlen = len(q_ids), len(t_ids)
    if qlen == 0 or tlen == 0:
        # edlib's empty-sequence early return (edlib.cpp:166-184).
        return (qlen, [-1]) if k < 0 or qlen <= k else (-1, [])
    mode = mode.upper()
    if mode not in ("HW", "SHW"):
        raise ValueError("mode must be HW or SHW")

    use_wavefront = backend == "wavefront"
    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        use_wavefront = False
    elif backend == "auto":
        forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
        try:
            import jax
            use_wavefront = sigma < _max_sigma_wf() \
                and qlen * tlen >= _wf_min_cells() \
                and (bool(forced) or (_device_ready()
                                      and jax.default_backend() == "tpu"))
        except Exception:
            use_wavefront = False

    from edlib_tpu.align import _filter_locations, \
        _semiglobal_best_positions, _INF
    k_eff = _INF if k < 0 else k
    if use_wavefront:
        forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
        if mode == "SHW":
            # Banded full-stream search: sliding window to the pin, then
            # the stream-emitting tail over the only columns that can
            # hold values <= k (~8-30x less work on similar pairs).
            from edlib_tpu.ops.wavefront import BandedWavefront
            wfb = BandedWavefront(interpret=(forced == "interpret"))
            return wfb.shw_locations(q_ids.astype(np.uint8),
                                     t_ids.astype(np.uint8), sigma,
                                     k=-1 if k_eff is _INF else int(k_eff))
        # HW has no static band (free start per column); the unbanded
        # stream wavefront + host filter is output-equivalent.
        from edlib_tpu.ops.wavefront import Wavefront
        wf = Wavefront(interpret=(forced == "interpret"))
        scores = wf.semiglobal_scores(q_ids.astype(np.uint8),
                                      t_ids.astype(np.uint8), sigma,
                                      mode_is_hw=True)
        return _filter_locations(scores, qlen, k_eff)
    eq = np.eye(sigma, dtype=bool)
    return _semiglobal_best_positions(q_ids, t_ids, eq, mode, k_eff)
