"""End-to-end read-mapping throughput: map_reads() wall time incl. host
encode, Peq build, transfers, and the on-device sweep+reduce.

The docs/PERF.md headline row "10240 reads x 100bp vs 1Mbp" as a
machine-captured number: prints one JSON line.  Best-of-3 calls (first
call additionally pays compile; it is reported separately as cold_s).

Run: python scripts/e2e_map.py [--reads N] [--qlen L] [--tlen T]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GENOME = os.path.join(
    os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference"), "test_data",
    "Chromosome_2890043_3890042_0", "Chromosome_2890043_3890042_0.fasta")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=10240)
    ap.add_argument("--qlen", type=int, default=100)
    ap.add_argument("--tlen", type=int, default=1_000_000)
    args = ap.parse_args(argv)

    import jax
    from edlib_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()  # shared persistent cache (~/.cache/edlib_tpu)
    import edlib_tpu

    rng = np.random.RandomState(1)
    try:
        from edlib_tpu.io.fasta import read_fasta_bytes
        g = np.frombuffer(bytes(read_fasta_bytes(GENOME)[0]), np.uint8)
        if len(g) < args.tlen:
            g = np.tile(g, -(-args.tlen // len(g)))
    except (FileNotFoundError, OSError):
        g = rng.choice(list(b"ACGT"), args.tlen).astype(np.uint8)
    g = g[:args.tlen]
    reads = []
    for _ in range(args.reads):
        s = rng.randint(0, len(g) - args.qlen)
        r = g[s:s + args.qlen].copy()
        muts = rng.rand(args.qlen) < 0.05
        r[muts] = rng.choice(list(b"ACGT"), muts.sum())
        reads.append(r.tobytes())
    target = g.tobytes()

    t0 = time.time()
    best, pos = edlib_tpu.map_reads(reads, target, mode="HW")
    cold = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        best, pos = edlib_tpu.map_reads(reads, target, mode="HW")
        times.append(time.time() - t0)
    dt = min(times)

    # Spot parity vs the single-pair API (host native engine).
    for i in (0, args.reads // 2, args.reads - 1):
        want = edlib_tpu.align(reads[i], target, mode="HW",
                               task="locations")
        assert best[i] == want["editDistance"], (i, best[i])
        assert pos[i] == want["locations"][0][1], (i, pos[i])

    cells = float(args.reads) * args.qlen * len(target)
    print(json.dumps({
        "reads": args.reads, "qlen": args.qlen, "tlen": len(target),
        "seconds": round(dt, 4), "cold_s": round(cold, 2),
        "reads_per_s": round(args.reads / dt, 1),
        "gcups": round(cells / dt / 1e9, 1),
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
