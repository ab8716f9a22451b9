"""Randomized CLI byte-diff vs the compiled reference aligner.

Builds the reference binary into /tmp (never touching /root/reference),
generates random FASTA workloads (mixed alphabets, headerless files,
varied target sizes), draws random flag combinations across
mode/-p/-l/-k/-n/-f/-r/-s, and byte-compares full outputs (minus the Cpu
time line).  This drive caught the round-5 Mosaic lowering crash in the
shared-target banded kernels and the batched-progress parity gap —
neither reachable from interpret-mode unit tests.

Run: python scripts/cli_diff_fuzz.py [--trials N] [--seed S]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference")
REF_BIN = "/tmp/ref-aligner-fuzz"


def build_reference():
    if os.path.exists(REF_BIN):
        return True
    r = subprocess.run(
        ["g++", "-O2", "-std=c++14", "-I",
         os.path.join(REF_SRC, "edlib/include"),
         os.path.join(REF_SRC, "edlib/src/edlib.cpp"),
         os.path.join(REF_SRC, "apps/aligner/aligner.cpp"),
         "-o", REF_BIN], capture_output=True)
    return r.returncode == 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=16)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args(argv)
    if not build_reference():
        print(json.dumps({"error": "reference build failed"}))
        return 1
    rng = np.random.RandomState(args.seed)

    def write_fasta(path, seqs, headerless=False):
        with open(path, "w") as f:
            for i, s in enumerate(seqs):
                if not headerless:
                    f.write(">s%d\n" % i)
                f.write(s + "\n")

    def gen(n, lo, hi, alpha):
        return ["".join(rng.choice(list(alpha), rng.randint(lo, hi)))
                for _ in range(n)]

    fails = 0
    for trial in range(args.trials):
        headerless = trial % 5 == 4
        alpha = ["ACGT", "ACGTN", "ABCDEFGHIJ"][trial % 3]
        tlen = int(rng.choice([500, 3000, 20000]))
        target = gen(1, tlen, tlen + 1, alpha)
        queries = gen(int(rng.choice([3, 17, 60])), 20, 200, alpha)
        qf, tf = "/tmp/fz_q.fa", "/tmp/fz_t.fa"
        write_fasta(qf, queries, headerless)
        write_fasta(tf, target, headerless)
        flags = ["-m", ["HW", "NW", "SHW"][trial % 3]]
        r = rng.rand()
        if r < 0.4:
            flags.append("-p")
        elif r < 0.7:
            flags.append("-l")
        if rng.rand() < 0.4:
            flags += ["-k", str(int(rng.choice([0, 5, 30])))]
        if rng.rand() < 0.3 and "-p" not in flags:
            flags += ["-n", str(int(rng.choice([1, 5])))]
        if rng.rand() < 0.25:
            flags += ["-f", str(rng.choice(["CIG_STD", "CIG_EXT"]))]
        if rng.rand() < 0.2:
            flags += ["-r", "2"]
        if rng.rand() < 0.2:
            flags.append("-s")
        ref = subprocess.run([REF_BIN] + flags + [qf, tf],
                             capture_output=True, text=True, timeout=300)
        ours = subprocess.run(
            [sys.executable, "-m", "edlib_tpu.cli"] + flags + [qf, tf],
            capture_output=True, text=True, timeout=600, cwd=REPO)

        def strip(s):
            return "\n".join(line for line in s.splitlines()
                             if "Cpu time" not in line)

        if (ref.returncode != ours.returncode
                or strip(ref.stdout) != strip(ours.stdout)):
            fails += 1
            print("MISMATCH:", flags,
                  "headerless" if headerless else "", alpha,
                  file=sys.stderr)
    print(json.dumps({"trials": args.trials, "mismatches": fails,
                      "seed": args.seed}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
