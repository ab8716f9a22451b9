"""Single-pair 1Mbp NW distance on the TPU wavefront kernel vs native CPU.

The README row "single pair 1Mbp NW (wavefront TPU) vs native CPU" as a
captured artifact.  Exactness asserted (device distance == native
distance) before timings are printed.  Prints one JSON line.

Run: python scripts/hw_wavefront_1mbp.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHROM_DIR = os.path.join(
    os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference"), "test_data",
    "Chromosome_2890043_3890042_0")


def main():
    import jax
    from edlib_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()  # shared persistent cache (~/.cache/edlib_tpu)
    from edlib_tpu.io.fasta import read_fasta_bytes
    from edlib_tpu.longpair import nw_distance_long

    q = bytes(read_fasta_bytes(os.path.join(
        CHROM_DIR, "Chromosome_2890043_3890042_0.fasta"))[0])
    t = bytes(read_fasta_bytes(os.path.join(
        CHROM_DIR, "mutated_97_perc.fasta"))[0])

    t0 = time.time()
    d_native = nw_distance_long(q, t, backend="native")
    native_s = time.time() - t0

    t0 = time.time()
    d_dev = nw_distance_long(q, t, backend="wavefront")
    cold_s = time.time() - t0
    assert d_dev == d_native, (d_dev, d_native)
    times = []
    for _ in range(2):
        t0 = time.time()
        d_dev = nw_distance_long(q, t, backend="wavefront")
        times.append(time.time() - t0)
    assert d_dev == d_native

    print(json.dumps({
        "qlen": len(q), "tlen": len(t), "distance": int(d_native),
        "wavefront_s": round(min(times), 2), "cold_s": round(cold_s, 2),
        "native_s": round(native_s, 2),
        "ratio": round(min(times) / native_s, 3),
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
