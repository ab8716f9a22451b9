"""Hardware-aware routing: measured device dispatch latency.

The CPU-vs-device routing thresholds depend on how far away the chip is: a
directly-attached TPU answers a scalar round-trip in well under a
millisecond, while a tunneled/remote one (this development host) takes tens
of milliseconds — a 1000x swing in the break-even problem size.  Instead of
baking one host's constant into the library, the dispatch RTT is measured
ONCE per process (in a subprocess, so a wedged device can never hang the
caller) and the thresholds in align.py / path/hirschberg.py scale from it.

Env overrides win everywhere: EDLIB_TPU_WAVEFRONT_MIN_CELLS /
EDLIB_TPU_DEVICE_PATH skip the measurement entirely, and
EDLIB_TPU_DISPATCH_RTT_MS pins the measured value (useful for tests and
for hosts where the probe cost is unwanted).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from typing import Optional

# Measured value cache: one probe per process; cross-process via a /tmp
# file so short-lived CLI invocations don't re-pay the probe.
_CACHE_TTL_S = 900.0
_cached: Optional[float] = None
_measured = False

_PROBE_CODE = r"""
import json, sys, time
import jax, jax.numpy as jnp
if jax.default_backend() != "tpu":
    sys.exit(3)
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((), jnp.int32)
int(f(x))  # compile + warm (fetch forces true completion)
ts = []
for _ in range(7):
    t0 = time.perf_counter()
    int(f(x))
    ts.append((time.perf_counter() - t0) * 1e3)
print(json.dumps({"rtt_ms": sorted(ts)[len(ts) // 2]}))
"""


def _cache_path() -> str:
    return os.path.join(tempfile.gettempdir(), "edlib_tpu_rtt.json")


def _read_file_cache():
    """('hit', rtt_ms_or_None) for a fresh cache entry — a cached FAILED
    probe is a hit too (fresh processes must not re-pay the probe timeout
    on a wedged device) — or None when there is no usable entry."""
    try:
        with open(_cache_path()) as f:
            data = json.load(f)
        v = data["rtt_ms"]
        # Failed probes age out faster: a recovering device should be
        # rediscovered within minutes, not the full healthy-cache TTL.
        ttl = _CACHE_TTL_S if v is not None else 300.0
        if time.time() - float(data["ts"]) <= ttl:
            return ("hit", None if v is None else float(v))
    except (OSError, ValueError, KeyError, TypeError):
        pass
    return None


def _write_file_cache(rtt_ms: Optional[float]) -> None:
    try:
        tmp = _cache_path() + ".tmp.%d" % os.getpid()
        with open(tmp, "w") as f:
            json.dump({"ts": time.time(), "rtt_ms": rtt_ms}, f)
        os.replace(tmp, _cache_path())
    except OSError:
        pass


def dispatch_rtt_ms(timeout_s: float = 30.0) -> Optional[float]:
    """Median device scalar round-trip in ms, or None when no healthy TPU
    answered (no platform, probe failure, or timeout — callers should fall
    back to their most conservative routing).

    Measured at most once per process; a fresh (< 15 min) /tmp cache is
    reused across processes so CLI runs don't re-probe.
    """
    global _cached, _measured
    env = os.environ.get("EDLIB_TPU_DISPATCH_RTT_MS")
    if env:
        try:
            return float(env)
        except ValueError:
            pass
    if _measured:
        return _cached
    hit = _read_file_cache()
    if hit is not None:
        _cached, _measured = hit[1], True
        return _cached
    _cached, _measured = _measure(timeout_s), True
    _write_file_cache(_cached)
    return _cached


def _measure(timeout_s: float) -> Optional[float]:
    child_env = {k: v for k, v in os.environ.items()
                 if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        proc = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                              capture_output=True, timeout=timeout_s,
                              env=child_env)
    except (subprocess.TimeoutExpired, OSError):
        return None
    if proc.returncode != 0:
        return None
    try:
        return float(json.loads(
            proc.stdout.decode().strip().splitlines()[-1])["rtt_ms"])
    except (ValueError, KeyError, IndexError):
        return None


def device_ready() -> bool:
    """True iff a TPU answered the bounded subprocess probe recently.

    Routing gates MUST call this before any in-process jax backend check:
    on this class of host, initialising a wedged tunneled backend blocks
    INDEFINITELY inside jax.default_backend() — the subprocess probe is the
    only bounded way to ask.  (A freshly-cached healthy probe can still
    race a new wedge, but that window is the cache TTL, not forever.)
    """
    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        return False
    return dispatch_rtt_ms() is not None


def scaled_min_cells(rtt_ms: Optional[float], cells_per_ms: float,
                     floor: int, ceil: int) -> int:
    """Break-even problem size for a device detour: the dispatch overhead
    (rtt) must be a small fraction of the work, so the threshold scales
    linearly with RTT between a floor (attached chip) and a conservative
    ceiling (unknown/unreachable device)."""
    if rtt_ms is None:
        return ceil
    return int(min(max(cells_per_ms * rtt_ms, floor), ceil))
