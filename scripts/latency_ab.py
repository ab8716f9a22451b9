"""A/B single-pair latency vs the compiled reference — captured artifact.

Measures every row of docs/PERF.md's "Single-pair latency" section with
the methodology those tables quote: both sides driven through the same
ctypes-level Python wrappers, A/B interleaved, min-of-R blocks.  Prints
ONE JSON line (list of rows) for scripts/capture_perf_hw.py to ingest.

CPU-only (host native engine vs reference .so) — no TPU required.

Workloads (reference counterparts cited in docs/PERF.md):
  pairs    — the published-table sweep (bindings/python/README-tmpl.rst
             :188-216): NW align(), ~90%-similar pairs, N=30..50000.
  genomes  — 94.5kbp phage vs 97% mutant: NW/HW PATH + NW distance
             (reference meson smoke data); 1Mbp chromosome NW PATH
             (BASELINE config 3); 300bp read vs 1Mbp HW/SHW locations.

Run: python scripts/latency_ab.py [pairs|genomes|all] [--reps R]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import edlib_tpu

_TD = os.path.join(
    os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference"), "test_data")


def _ref():
    from reference_oracle import get_reference_lib, reference_align
    if get_reference_lib() is None:
        raise RuntimeError("reference oracle unavailable")
    return reference_align


def ab_time(ours_fn, ref_fn, reps):
    """Interleaved min-of-`reps` blocks: (ours_s, ref_s)."""
    best_a = best_b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        ra = ours_fn()
        best_a = min(best_a, time.perf_counter() - t0)
        t0 = time.perf_counter()
        rb = ref_fn()
        best_b = min(best_b, time.perf_counter() - t0)
    assert ra["editDistance"] == rb["editDistance"], (
        ra["editDistance"], rb["editDistance"])
    return best_a, best_b


def _row(rows, metric, ours_s, ref_s, workload):
    rows.append({"metric": metric, "value": round(ours_s, 6), "unit": "s",
                 "ref_value": round(ref_s, 6),
                 "ratio": round(ours_s / ref_s, 3), "workload": workload})
    print(f"  {metric}: {ours_s*1e3:.3f}ms vs ref {ref_s*1e3:.3f}ms "
          f"= {ours_s/ref_s:.2f}x", file=sys.stderr)


def run_pairs(rows, reps):
    reference_align = _ref()
    rng = np.random.RandomState(0)
    for n in (30, 100, 1000, 10000, 50000):
        base = rng.choice(list(b"ACGT"), n).astype(np.uint8)
        other = base.copy()
        muts = rng.rand(n) < 0.10
        other[muts] = rng.choice(list(b"ACGT"), muts.sum())
        q, t = base.tobytes(), other.tobytes()
        inner = max(1, 20000 // n)  # amortise the us-scale calls

        def many(fn):
            def go():
                for _ in range(inner - 1):
                    fn(q, t)
                return fn(q, t)
            return go

        a, b = ab_time(many(edlib_tpu.align), many(reference_align), reps)
        _row(rows, f"latency_nw_pair_n{n}", a / inner, b / inner,
             f"NW k=-1 ~90% similar N={n} (x{inner} inner)")


def _fasta(*parts):
    from edlib_tpu.io.fasta import read_fasta_bytes
    return bytes(read_fasta_bytes(os.path.join(_TD, *parts))[0])


def run_genomes(rows, reps):
    reference_align = _ref()
    phage = _fasta("Enterobacteria_Phage_1", "Enterobacteria_phage_1.fasta")
    mut97 = _fasta("Enterobacteria_Phage_1", "mutated_97_perc.fasta")
    for mode, task, tag in (("NW", "path", "nw_path"),
                            ("HW", "path", "hw_path"),
                            ("NW", "distance", "nw_distance"),
                            ("SHW", "locations", "shw_locations")):
        a, b = ab_time(
            lambda: edlib_tpu.align(phage, mut97, mode=mode, task=task),
            lambda: reference_align(phage, mut97, mode=mode, task=task),
            reps)
        _row(rows, f"latency_phage97_{tag}", a, b,
             f"94.5kbp phage vs 97% mutant {mode} {task}")

    chrom = _fasta("Chromosome_2890043_3890042_0",
                   "Chromosome_2890043_3890042_0.fasta")
    cmut = _fasta("Chromosome_2890043_3890042_0", "mutated_97_perc.fasta")
    a, b = ab_time(
        lambda: edlib_tpu.align(chrom, cmut, mode="NW", task="path"),
        lambda: reference_align(chrom, cmut, mode="NW", task="path"),
        max(2, reps - 2))  # ~3s+5s per block
    _row(rows, "latency_chrom1mbp_nw_path", a, b,
         "1Mbp chromosome vs 97% mutant NW path (BASELINE config 3)")

    read = chrom[500000:500300]
    for mode, task, tag in (("HW", "locations", "hw_locations"),
                            ("HW", "path", "hw_path"),
                            ("SHW", "locations", "shw_locations")):
        a, b = ab_time(
            lambda: edlib_tpu.align(read, chrom, mode=mode, task=task),
            lambda: reference_align(read, chrom, mode=mode, task=task),
            reps)
        _row(rows, f"latency_read300_1mbp_{tag}", a, b,
             f"300bp read vs 1Mbp chromosome {mode} {task}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="all",
                    choices=["pairs", "genomes", "all"])
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args(argv)
    rows = []
    if args.what in ("pairs", "all"):
        run_pairs(rows, args.reps)
    if args.what in ("genomes", "all"):
        run_genomes(rows, args.reps)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
