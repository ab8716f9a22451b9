"""Read-mapping demo: map mutated reads against a genome region.

Run on a TPU host for the on-chip fast path; falls back to the host engine
elsewhere.  Uses the reference repo's test data when available.
"""

import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import edlib_tpu
from edlib_tpu.io.fasta import read_fasta_bytes

GENOME = ("/root/reference/test_data/Chromosome_2890043_3890042_0/"
          "Chromosome_2890043_3890042_0.fasta")


def main():
    try:
        genome = read_fasta_bytes(GENOME)[0][:200_000]
    except (FileNotFoundError, OSError):
        rng = np.random.RandomState(0)
        genome = rng.choice(list(b"ACGT"), 200_000).astype(np.uint8).tobytes()
    rng = np.random.RandomState(1)
    g = np.frombuffer(genome, np.uint8)
    reads = []
    for _ in range(2048):
        s = rng.randint(0, len(g) - 100)
        r = g[s:s + 100].copy()
        muts = rng.rand(100) < 0.05
        r[muts] = rng.choice(list(b"ACGT"), muts.sum())
        reads.append(r.tobytes())

    t0 = time.time()
    best, pos = edlib_tpu.map_reads(reads, genome, mode="HW", k=20)
    dt = time.time() - t0
    mapped = (best >= 0).sum()
    print(f"mapped {mapped}/{len(reads)} reads in {dt:.2f}s "
          f"({len(reads)/dt:.0f} reads/s)")
    print("first hits:", list(zip(best[:5], pos[:5])))

    # Full parity API for one read (all locations + CIGAR):
    res = edlib_tpu.align(reads[0], genome, mode="HW", task="path")
    print("read 0:", res["editDistance"], res["locations"][:2],
          res["cigar"][:40], "...")


if __name__ == "__main__":
    main()
