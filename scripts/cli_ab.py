"""CLI A/B: the compiled edlib-tpu-aligner vs the reference edlib-aligner.

Generates a deterministic read set from the real 1Mbp chromosome, runs
both binaries with identical flags, byte-diffs the output (minus the
"Cpu time" lines) and compares wall time.  Prints one JSON line.

Both sides are native binaries, so process wall time is a fair comparison
(no interpreter startup asymmetry — docs/PERF.md CLI trap).

Run: python scripts/cli_ab.py [--reads N] [--qlen L] [--flags "-p"]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_SRC = os.path.join(
    os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference"))
CHROM = os.path.join(REF_SRC, "test_data", "Chromosome_2890043_3890042_0",
                     "Chromosome_2890043_3890042_0.fasta")
OURS = os.path.join(REPO, "native", "edlib-tpu-aligner")
REF_BIN = "/tmp/ref-aligner"


def ensure_binaries():
    if not os.path.exists(OURS):
        subprocess.run(["make", "-C", os.path.join(REPO, "native"),
                        "edlib-tpu-aligner"], check=True,
                       capture_output=True)
    if not os.path.exists(REF_BIN):
        subprocess.run(
            ["g++", "-O2", "-std=c++14",
             "-I", os.path.join(REF_SRC, "edlib", "include"),
             os.path.join(REF_SRC, "edlib", "src", "edlib.cpp"),
             os.path.join(REF_SRC, "apps", "aligner", "aligner.cpp"),
             "-o", REF_BIN], check=True, capture_output=True)


def gen_queries(path, target_path, n, qlen):
    from edlib_tpu.io.fasta import read_fasta_bytes
    g = np.frombuffer(bytes(read_fasta_bytes(target_path)[0]), np.uint8)
    rng = np.random.RandomState(11)
    with open(path, "w") as f:
        for i in range(n):
            s = int(rng.randint(0, len(g) - qlen))
            r = g[s:s + qlen].copy()
            muts = rng.rand(qlen) < 0.05
            r[muts] = rng.choice(list(b"ACGT"), muts.sum())
            f.write(f">read{i}\n{r.tobytes().decode()}\n")


def run_one(binary, flags, queries, target, reps=3):
    """(best wall seconds, canonical output) — min over reps."""
    best = None
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        p = subprocess.run([binary] + flags + [queries, target],
                           capture_output=True, text=True, check=True)
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
        out = re.sub(r"(?m)^Cpu time.*\n?", "", p.stdout)
    return best, out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1000)
    ap.add_argument("--qlen", type=int, default=300)
    ap.add_argument("--flags", default="")
    ap.add_argument("--target", default=CHROM)
    args = ap.parse_args(argv)
    flags = args.flags.split() if args.flags else []

    ensure_binaries()
    with tempfile.TemporaryDirectory() as td:
        queries = os.path.join(td, "queries.fasta")
        gen_queries(queries, args.target, args.reads, args.qlen)
        ours_s, ours_out = run_one(OURS, flags, queries, args.target)
        ref_s, ref_out = run_one(REF_BIN, flags, queries, args.target)
    identical = ours_out == ref_out
    print(json.dumps({
        "reads": args.reads, "qlen": args.qlen,
        "flags": " ".join(flags) or "(default HW distance)",
        "ours_s": round(ours_s, 3), "ref_s": round(ref_s, 3),
        "ratio": round(ours_s / ref_s, 3),
        "output_identical": identical,
    }))
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
