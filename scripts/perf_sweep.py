"""Performance sweeps, mirroring the reference's perf harnesses.

* pairs mode  — the published-table workload (bindings/python/README-tmpl.rst
  :188-216): single NW `align()` on ~90%-similar pairs of equal length,
  lengths 30..50000.  Compares against the compiled reference library when
  available (tests/reference_oracle.py).
* reads mode  — the perf_tests2.sh-style sweep: batches of reads of length
  50..10000 HW-mapped against a genome region; reports reads/s and GCUPS
  through `align_batch` (device path when a TPU is present).

Run: python scripts/perf_sweep.py [pairs|reads|all] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import edlib_tpu
from edlib_tpu.utils.profiling import gcups


def mutate(rng, seq: np.ndarray, rate: float) -> np.ndarray:
    out = seq.copy()
    muts = rng.rand(len(seq)) < rate
    out[muts] = rng.choice(list(b"ACGT"), muts.sum())
    return out


def run_pairs(results):
    rng = np.random.RandomState(0)
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from reference_oracle import get_reference_lib, reference_align
        have_ref = get_reference_lib() is not None
    except Exception:
        have_ref = False
    print(f"{'N':>7} {'ours':>12} {'reference':>12} {'ratio':>7}  distance")
    for n in (30, 100, 1000, 10000, 50000):
        base = rng.choice(list(b"ACGT"), n).astype(np.uint8)
        other = mutate(rng, base, 0.10)
        q, t = base.tobytes(), other.tobytes()
        reps = max(1, 20000 // n)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = edlib_tpu.align(q, t)
        ours = (time.perf_counter() - t0) / reps
        ref_s = float("nan")
        if have_ref:
            t0 = time.perf_counter()
            for _ in range(reps):
                ref = reference_align(q, t)
            ref_s = (time.perf_counter() - t0) / reps
            assert ref["editDistance"] == res["editDistance"]
        ratio = ours / ref_s if ref_s == ref_s else float("nan")
        print(f"{n:>7} {ours*1e6:>10.1f}us {ref_s*1e6:>10.1f}us "
              f"{ratio:>6.2f}x  {res['editDistance']}")
        results.append({"suite": "pairs", "n": n, "ours_s": ours,
                        "reference_s": ref_s,
                        "editDistance": res["editDistance"]})


def run_reads(results):
    rng = np.random.RandomState(1)
    target = rng.choice(list(b"ACGT"), 100_000).astype(np.uint8).tobytes()
    print(f"{'read_len':>8} {'batch':>6} {'time':>9} {'reads/s':>10} "
          f"{'GCUPS':>8}")
    for read_len, batch in ((50, 512), (100, 512), (250, 256), (500, 128),
                            (10000, 16)):
        reads = []
        for _ in range(batch):
            s = rng.randint(0, len(target) - read_len)
            r = np.frombuffer(target[s:s + read_len], np.uint8)
            reads.append(mutate(rng, r, 0.05).tobytes())
        edlib_tpu.align_batch(reads[:4], target, mode="HW")  # warm/compile
        t0 = time.perf_counter()
        edlib_tpu.align_batch(reads, target, mode="HW")
        dt = time.perf_counter() - t0
        g = gcups(read_len, len(target), batch, dt)
        print(f"{read_len:>8} {batch:>6} {dt:>8.2f}s {batch/dt:>10.1f} "
              f"{g:>8.2f}")
        results.append({"suite": "reads", "read_len": read_len,
                        "batch": batch, "seconds": dt, "gcups": g})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", nargs="?", default="all",
                   choices=["pairs", "reads", "all"])
    p.add_argument("--json", default=None)
    args = p.parse_args()
    results = []
    if args.mode in ("pairs", "all"):
        run_pairs(results)
    if args.mode in ("reads", "all"):
        run_reads(results)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
