"""Device timing: banded vs full reversed-SHW re-runs in batched HW
start locations.

Run:  timeout 420 python scripts/hw_banded_revshw.py 8      # banded (default)
      timeout 420 python scripts/hw_banded_revshw.py 9999   # banding off

Workload: 24 reads x 8kbp (nw=256 words) vs a 200kbp target, ~3%
mutations, mode=HW task=locations k=-1 — every pair triggers a
reversed-SHW re-run per end location, each a ONE-SHOT banded sweep
(its best IS the pair's edit distance; batch.py:269-290).  The arg is
EDLIB_TPU_BAND_MIN_WORDS: buckets with fewer words run the full-sweep
kernels, so a huge value disables banding for the same workload.

Prints one JSON line (min-of-3 end-to-end align_batch walltime; results
cross-checked against the host backend before timing is accepted).
Each invocation is one subprocess so a wedged tunnel can't take the
session down (docs/PERF.md "Measurement traps").
"""

import json
import os
import sys
import time

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)

if len(sys.argv) > 1:
    os.environ["EDLIB_TPU_BAND_MIN_WORDS"] = sys.argv[1]

import numpy as np

B = 24
QLEN = 8192
TARGET_LEN = 200_000
# Noise level is the banding lever: at 3% the k-feasible band is narrow
# (banding should win); at 10% the frontier is wide (the docs/PERF.md
# "HW-banded low value" claim predicts little gain) — EDLIB_TPU_HWB_MUT
# sets it so one sweep records the measured ratio at both points.
MUT = float(os.environ.get("EDLIB_TPU_HWB_MUT", "0.03"))


def main():
    global B, QLEN, TARGET_LEN
    import jax
    if jax.default_backend() != "tpu":  # CPU smoke: tiny shapes
        B, QLEN, TARGET_LEN = 6, 512, 8_000
    from edlib_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()  # shared persistent cache (~/.cache/edlib_tpu)
    from edlib_tpu import align_batch

    smoke = jax.default_backend() != "tpu"
    rng = np.random.RandomState(7)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    target = alpha[rng.randint(0, 4, TARGET_LEN)].tobytes()
    reads = []
    for _ in range(B):
        s = rng.randint(0, TARGET_LEN - QLEN)
        r = np.frombuffer(target[s:s + QLEN], np.uint8).copy()
        m = rng.rand(QLEN) < MUT
        r[m] = alpha[rng.randint(0, 4, int(m.sum()))]
        reads.append(r.tobytes())

    dev = align_batch(reads, target, mode="HW", task="locations", k=-1,
                      backend="jax" if not smoke else "auto")
    host = align_batch(reads, target, mode="HW", task="locations", k=-1,
                       backend="host")
    for i, (d, h) in enumerate(zip(dev, host)):
        assert d == h, (i, d["editDistance"], h["editDistance"])

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        align_batch(reads, target, mode="HW", task="locations", k=-1,
                    backend="jax" if not smoke else "auto")
        best = min(best, time.time() - t0)
    print(json.dumps({
        "band_min_words": os.environ.get("EDLIB_TPU_BAND_MIN_WORDS",
                                         "default"),
        "seconds": round(best, 3),
        "backend": jax.default_backend(),
        "pairs": B, "qlen": QLEN, "tlen": TARGET_LEN,
    }))


if __name__ == "__main__":
    main()
