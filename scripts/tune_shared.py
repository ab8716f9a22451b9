"""Chunk/rep tuning sweep for the shared-target mapping kernel on hardware.

Run:  timeout 420 python scripts/tune_shared.py [chunk [reps]]   (one point)
      for c in 256 512 1024 2048; do timeout 420 python scripts/tune_shared.py $c; done

Each invocation measures ONE (chunk,) point of the bench.py headline
workload (4096 reads x 120bp vs 64kbp, sigma=4) with the chained-reps +
scalar-fetch protocol, and prints one JSON line.  Separate processes per
point so a wedged tunnel can't take down a sweep (docs/PERF.md
"Measurement traps"); the persistent compile cache makes repeat points
cheap.  Purpose: the roofline analysis (docs/PERF.md) puts this shape's
ceiling at ~6000 GCUPS; grid overhead shrinks with chunk while VMEM
pressure grows — find the knee on the real chip.
"""

import json
import sys
import time

import numpy as np

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)

B = 4096
QLEN = 120
TARGET_LEN = 65536
SIGMA = 4


def main(chunk: int, reps: int):
    global B, TARGET_LEN
    import jax
    smoke = jax.default_backend() != "tpu"
    if smoke:  # CPU smoke test: tiny shapes, interpret-mode kernel
        B, TARGET_LEN, reps = 1024, 4 * chunk, 2
    from edlib_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()  # shared persistent cache (~/.cache/edlib_tpu)
    import jax.numpy as jnp

    from edlib_tpu import encode
    from edlib_tpu.ops.pallas_kernel import (
        build_peq_device, pack_tiles_device, sweep_best_pallas_shared)

    nw = encode.num_words(QLEN)
    w = nw * 32 - QLEN
    t_scan = TARGET_LEN + w
    n_chunks = -(-t_scan // chunk)

    @jax.jit
    def make_inputs(key):
        k1, k2 = jax.random.split(key)
        target = jax.random.randint(k1, (TARGET_LEN,), 0, SIGMA, jnp.int32)
        k2a, k2b, k2c = jax.random.split(k2, 3)
        starts = jax.random.randint(k2a, (B,), 0, TARGET_LEN - QLEN)
        idx = starts[:, None] + jnp.arange(QLEN)[None, :]
        reads = target[idx]
        muts = jax.random.uniform(k2b, (B, QLEN)) < 0.05
        rand_sym = jax.random.randint(k2c, (B, QLEN), 0, SIGMA, jnp.int32)
        reads = jnp.where(muts, rand_sym, reads)
        qlens = jnp.full((B,), QLEN, jnp.int32)
        peq = build_peq_device(reads, qlens, SIGMA, nw)
        tiles = pack_tiles_device(peq)
        tg = jnp.full((n_chunks * chunk,), SIGMA, jnp.int32)
        tg = tg.at[:TARGET_LEN].set(target)
        return tiles, tg.reshape(n_chunks, 1, chunk)

    tiles, tg_chunks = make_inputs(jax.random.key(0))
    jax.block_until_ready((tiles, tg_chunks))

    @jax.jit
    def many(tiles, tg_chunks):
        def body(i, acc):
            tg2 = tg_chunks.at[0, 0, 0].set(i % SIGMA)
            bb, _ = sweep_best_pallas_shared(
                tiles, tg2, hin0=0, col_lo=w, col_hi=w + TARGET_LEN,
                chunk=chunk, interpret=smoke)
            return acc + bb.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    many(tiles, tg_chunks).block_until_ready()  # compile + warm
    # Best-of-3: the FIRST invocation of a fresh executable can absorb
    # ~0.5-0.7s of lazy finalization (program load / persistent-cache
    # write) that block_until_ready on the tunneled backend does not
    # flush — a single-call timing under-reports by ~6x (docs/PERF.md
    # "Measurement traps").
    times = []
    for _ in range(3):
        t0 = time.time()
        int(many(tiles, tg_chunks))  # scalar fetch = completion barrier
        times.append(time.time() - t0)
    dt = min(times)
    cells = float(B) * QLEN * TARGET_LEN * reps
    print(json.dumps({
        "chunk": chunk, "reps": reps,
        "gcups": round(cells / dt / 1e9, 1),
        "seconds": round(dt, 3),
        "times": [round(t, 3) for t in times],
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
         int(sys.argv[2]) if len(sys.argv) > 2 else 20)
