"""SHW map_reads prefix-slice pruning vs the full sweep at 1 Mbp.

SHW spans are target prefixes, so the pruned path sweeps only the first
qmax + r columns (doubling r for unresolved reads) — the anchored-prefix
counterpart of the HW q-gram filter.  A/B on the real chromosome:
pruned (default) vs EDLIB_TPU_SHW_PRUNE=0 (full sweep), parity asserted
per read against align().

Prints one JSON line: {"backend", "reads", "qlen", "tlen",
"pruned_s", "full_s", "speedup", "reads_per_s", "exact": true}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("EDLIB_TPU_DISPATCH_RTT_MS", "25")

READS = int(os.environ.get("READS", "10240"))
QLEN = int(os.environ.get("QLEN", "100"))
TLEN = int(os.environ.get("TLEN", "1000000"))

GENOME = os.path.join(
    os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference"), "test_data",
    "Chromosome_2890043_3890042_0", "Chromosome_2890043_3890042_0.fasta")


def main():
    import numpy as np
    import jax
    from edlib_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()
    import edlib_tpu
    from edlib_tpu import mapping

    rng = np.random.RandomState(3)
    try:
        raw = open(GENOME, "rb").read()
        g = np.frombuffer(b"".join(
            l for l in raw.split(b"\n") if not l.startswith(b">")),
            np.uint8)
        g = np.tile(g, -(-TLEN // len(g)))[:TLEN]
    except OSError:
        g = rng.choice(list(b"ACGT"), TLEN).astype(np.uint8)
    reads = []
    for _ in range(READS):
        s = rng.randint(0, len(g) - QLEN)
        r = g[s:s + QLEN].copy()
        muts = rng.rand(QLEN) < 0.05
        r[muts] = rng.choice(list(b"ACGT"), muts.sum())
        # prefix-shift: SHW mapping queries are prefix-anchored reads;
        # half the batch gets the true prefix so bests are small, half
        # stays mid-genome (high best -> exercises the ladder).
        reads.append((g[:QLEN].copy() if _ % 2 == 0 else r).tobytes())
    target = g.tobytes()

    def run():
        return edlib_tpu.map_reads(reads, target, mode="SHW")

    b1, p1 = run()  # warm (compile)
    ts = []
    for _ in range(3):
        t0 = time.time()
        b1, p1 = run()
        ts.append(time.time() - t0)
    pruned_s = min(ts)

    os.environ["EDLIB_TPU_SHW_PRUNE"] = "0"
    b0, p0 = run()  # warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        b0, p0 = run()
        ts.append(time.time() - t0)
    full_s = min(ts)
    del os.environ["EDLIB_TPU_SHW_PRUNE"]

    exact = bool(np.array_equal(b0, b1) and np.array_equal(p0, p1))
    for i in (0, 1, READS // 2, READS - 1):
        want = edlib_tpu.align(reads[i], target, mode="SHW",
                               task="locations")
        exact &= b1[i] == want["editDistance"]
        exact &= p1[i] == want["locations"][0][1]

    print(json.dumps({
        "backend": jax.default_backend(), "reads": READS, "qlen": QLEN,
        "tlen": TLEN, "pruned_s": round(pruned_s, 4),
        "full_s": round(full_s, 4),
        "speedup": round(full_s / pruned_s, 2),
        "reads_per_s": round(READS / pruned_s, 1),
        "exact": bool(exact),
    }))


if __name__ == "__main__":
    main()
