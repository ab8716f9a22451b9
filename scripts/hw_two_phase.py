"""On-hardware validation + throughput for the two-phase batched kernels.

Run:  timeout 420 python scripts/hw_two_phase.py [probe|exact|bench_reduce|bench_hits|bench_shared]

Each step is invoked separately so a wedged TPU tunnel can't take down the
session (see docs/PERF.md "Measurement traps").
"""

import sys
import time

import numpy as np

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def probe():
    import jax
    import jax.numpy as jnp
    x = jnp.ones((128, 128))
    t0 = time.time()
    v = float((x @ x).sum())
    print(f"probe ok backend={jax.default_backend()} {time.time()-t0:.2f}s "
          f"v={v}")


def _truth_streams(peq_flat_b, targets, w_arr, tlens, hin0):
    """Per-pair real-position score streams via the host big-int engine."""
    from edlib_tpu.ops import host as host_engine
    outs = []
    for b in range(len(targets)):
        outs.append(host_engine.semiglobal_scores(
            peq_flat_b[b], targets[b], int(tlens[b]),
            "HW" if hin0 == 0 else "SHW"))
    return outs


def exact():
    from edlib_tpu import encode
    from edlib_tpu.ops import host as host_engine
    from edlib_tpu.ops.pallas_kernel import PallasSweeper

    rng = np.random.RandomState(5)
    sigma = 4
    eq = np.eye(sigma, dtype=bool)
    B, qlen, tlen = 24, 45, 300
    nw = encode.num_words(qlen)
    w = nw * 32 - qlen
    qs = [rng.randint(0, sigma, qlen).astype(np.uint8) for _ in range(B)]
    ts = [rng.randint(0, sigma, tlen).astype(np.uint8) for _ in range(B)]
    t_shared = ts[0]
    peq = np.stack([encode.build_peq_words(q, eq, n_words=nw) for q in qs])
    lo = np.full(B, w, np.int64)
    hi = np.full(B, w + tlen, np.int64)

    for shared in (False, True):
        t_scan = 1 << (tlen + w - 1).bit_length()
        if shared:
            targets = t_shared.astype(np.int32)
        else:
            targets = np.full((B, t_scan), sigma, np.int32)
            for b in range(B):
                targets[b, :tlen] = ts[b]
        for hin0 in (0, 1):
            sweeper = PallasSweeper(chunk=64)
            best, pf, pl_, last = sweeper.reduce(peq, targets, lo, hi, hin0,
                                                 shared=shared)
            hits = sweeper.hits(peq, targets, lo, hi, best, hin0,
                                shared=shared)
            for b in range(B):
                t_ids = t_shared if shared else ts[b]
                bp = encode.build_peq_bigint(qs[b], eq)
                stream = host_engine.semiglobal_scores(
                    bp, t_ids, qlen, "HW" if hin0 == 0 else "SHW")
                tb = int(stream.min())
                pos = np.nonzero(stream == tb)[0]
                assert best[b] == tb, (shared, hin0, b, best[b], tb)
                assert pf[b] - w == pos[0], (shared, hin0, b)
                assert pl_[b] - w == pos[-1], (shared, hin0, b)
                assert last[b] == stream[-1], (shared, hin0, b)
                assert np.array_equal(hits[b] - w, pos), (shared, hin0, b)
        print(f"exact ok shared={shared} (B={B}, both hin0)")


def bench_reduce(shared=False):
    """VERDICT workload: B pairs, QLEN-bp reads vs per-pair TLEN targets."""
    import os
    import jax
    import jax.numpy as jnp
    from edlib_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()  # shared persistent cache (~/.cache/edlib_tpu)
    from edlib_tpu.ops import pallas_kernel as pk

    B = int(os.environ.get("B", 2048))
    QLEN = int(os.environ.get("QLEN", 120))
    TLEN = int(os.environ.get("TLEN", 4000))
    SIGMA, CHUNK = 4, int(os.environ.get("CHUNK", 256))
    nw = -(-QLEN // 32)
    w = nw * 32 - QLEN
    t_scan = -(-(TLEN + w) // CHUNK) * CHUNK
    n_tiles = B // pk.B_TILE
    n_chunks = t_scan // CHUNK

    @jax.jit
    def make(key):
        k1, k2 = jax.random.split(key)
        tg = jax.random.randint(k1, (n_tiles, n_chunks, CHUNK, 8, 128), 0,
                                SIGMA, jnp.int32)
        reads = jax.random.randint(k2, (B, QLEN), 0, SIGMA, jnp.int32)
        peq = pk.build_peq_device(reads, jnp.full((B,), QLEN, jnp.int32),
                                  SIGMA, nw)
        tiles = pk.pack_tiles_device(peq)
        return tiles, tg

    tiles, tg = make(jax.random.key(0))
    jax.block_until_ready((tiles, tg))
    lo = jnp.full((n_tiles, 8, 128), w, jnp.int32)
    hi = jnp.full((n_tiles, 8, 128), w + TLEN, jnp.int32)

    if shared:
        tg = jnp.reshape(tg[0, :, :, 0, 0], (n_chunks, 1, CHUNK))

    b0 = pk.sweep_reduce_pallas(tiles, tg, lo, hi, hin0=0, chunk=CHUNK,
                                shared=shared)
    jax.block_until_ready(b0)
    print("warm:", int(np.asarray(b0[0]).min()), int(np.asarray(b0[0]).max()))

    REPS = int(os.environ.get("REPS", 20))

    @jax.jit
    def many(tiles, tg):
        def body(i, acc):
            if shared:
                tg2 = tg.at[0, 0, 0].set(i % SIGMA)
            else:
                tg2 = tg.at[0, 0, 0, 0, 0].set(i % SIGMA)
            bb, _, _, _ = pk.sweep_reduce_pallas(tiles, tg2, lo, hi, hin0=0,
                                                 chunk=CHUNK, shared=shared)
            return acc + bb.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    many(tiles, tg).block_until_ready()
    # Best-of-3: the first invocation of a fresh executable can absorb
    # ~0.5-0.7s of lazy finalization that block_until_ready on the
    # tunneled backend does not flush (docs/PERF.md "Measurement traps").
    times = []
    for _ in range(3):
        t0 = time.time()
        int(many(tiles, tg))
        times.append(time.time() - t0)
    dt = min(times)
    gcups = B * QLEN * TLEN * REPS / dt / 1e9
    tag = "shared" if shared else "general"
    print(f"bench_reduce[{tag}]: {dt:.3f}s for {REPS} reps -> "
          f"{gcups:.0f} GCUPS; times={['%.3f' % t for t in times]}")


def bench_hits():
    """Phase-2 cost on the same workload (single calls, wall incl. fetch)."""
    import jax
    import jax.numpy as jnp
    from edlib_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()  # shared persistent cache (~/.cache/edlib_tpu)
    from edlib_tpu.ops import pallas_kernel as pk

    B, QLEN, TLEN, SIGMA, CHUNK = 2048, 120, 4000, 4, 256
    nw = 4
    w = nw * 32 - QLEN
    t_scan = -(-(TLEN + w) // CHUNK) * CHUNK
    n_tiles = B // pk.B_TILE
    n_chunks = t_scan // CHUNK
    key = jax.random.key(0)
    tg = jax.random.randint(key, (n_tiles, n_chunks, CHUNK, 8, 128), 0,
                            SIGMA, jnp.int32)
    reads = jax.random.randint(key, (B, QLEN), 0, SIGMA, jnp.int32)
    peq = pk.pack_tiles_device(pk.build_peq_device(
        reads, jnp.full((B,), QLEN, jnp.int32), SIGMA, nw))
    lo = jnp.full((n_tiles, 8, 128), w, jnp.int32)
    hi = jnp.full((n_tiles, 8, 128), w + TLEN, jnp.int32)
    best = jnp.full((n_tiles, 8, 128), 40, jnp.int32)
    out = pk.sweep_hits_pallas(peq, tg, lo, hi, best, hin0=0, chunk=CHUNK)
    _ = np.asarray(out).sum()  # warm + completion
    times = []
    for i in range(5):
        tg = tg.at[0, 0, 0, 0, 0].set(i % SIGMA)
        t0 = time.time()
        out = pk.sweep_hits_pallas(peq, tg, lo, hi, best, hin0=0,
                                   chunk=CHUNK)
        _ = np.asarray(out).sum()
        times.append(time.time() - t0)
    dt = min(times)
    gcups = B * QLEN * TLEN / dt / 1e9
    print(f"bench_hits: min {dt*1000:.1f}ms/call incl. fetch -> "
          f"{gcups:.0f} GCUPS equiv; times={['%.3f' % t for t in times]}")


def bench_banded():
    """Banded batched NW vs the full-sweep reduce kernel.

    2048 pairs of 2048bp ~95%-identical sequences (substitution mutants so
    the distance stays ~100): full kernel sweeps 64 words/column, the
    banded kernel ~8-12.  Exactness is asserted lane-by-lane against the
    full kernel before timing.
    """
    import os
    import jax
    import jax.numpy as jnp
    from edlib_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()  # shared persistent cache (~/.cache/edlib_tpu)
    from edlib_tpu.ops import pallas_kernel as pk

    B = int(os.environ.get("B", 2048))
    N = int(os.environ.get("N", 2048))  # qlen == tlen
    K = int(os.environ.get("K", 256))
    SIGMA, CHUNK = 4, 256
    nw = N // 32
    n_tiles = B // pk.B_TILE
    n_chunks = N // CHUNK

    @jax.jit
    def make(key):
        k1, k2, k3 = jax.random.split(key, 3)
        q = jax.random.randint(k1, (B, N), 0, SIGMA, jnp.int32)
        mut = jax.random.uniform(k2, (B, N)) < 0.05
        t = jnp.where(mut, jax.random.randint(k3, (B, N), 0, SIGMA,
                                              jnp.int32), q)
        peq = pk.pack_tiles_device(pk.build_peq_device(
            q, jnp.full((B,), N, jnp.int32), SIGMA, nw))
        tg = jnp.transpose(t.reshape(n_tiles, pk.SUBLANES, pk.LANES,
                                     n_chunks, CHUNK), (0, 3, 4, 1, 2))
        return peq, tg

    peq, tg = make(jax.random.key(0))
    jax.block_until_ready((peq, tg))
    hi = jnp.full((n_tiles, 8, 128), N, jnp.int32)
    lo = jnp.maximum(hi - 1, 0)
    woff, n_win = pk.nw_band_schedule(nw, n_chunks, CHUNK, -(K // 2), K // 2)
    print(f"band window {n_win} of {nw} words")

    full = pk.sweep_reduce_pallas(peq, tg, lo, hi, hin0=1, chunk=CHUNK)[3]
    band = pk.sweep_nw_banded_pallas(peq, tg, jnp.asarray(woff), hi, n_win,
                                     chunk=CHUNK)
    full_np, band_np = np.asarray(full), np.asarray(band)
    ok = band_np[full_np <= K] == full_np[full_np <= K]
    print(f"exact: {ok.all()} (n={ok.size}, dist range "
          f"{full_np.min()}..{full_np.max()})")
    assert ok.all()

    REPS = int(os.environ.get("REPS", 500))

    def time_fn(fn):
        # Rep-chaining protocol: perturb a SMALL input with an unfoldable
        # zero (i >> 30) so XLA cannot hoist the loop-invariant kernel call,
        # and use enough reps that the ~25-30ms tunnel RTT of the final
        # scalar fetch is amortised (it dominates any <=10-rep timing).
        @jax.jit
        def many(peq, tg, hi):
            def body(i, acc):
                hi2 = hi.at[0, 0, 0].add(i >> 30)
                return acc + fn(tg, hi2).sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))
        many(peq, tg, hi).block_until_ready()
        # Best-of-3 (docs/PERF.md "Measurement traps": first invocation
        # of a fresh executable absorbs lazy finalization).
        times = []
        for _ in range(3):
            t0 = time.time()
            int(many(peq, tg, hi))
            times.append(time.time() - t0)
        return min(times)

    dt_f = time_fn(lambda tg2, hi2: pk.sweep_reduce_pallas(
        peq, tg2, lo, hi2, hin0=1, chunk=CHUNK)[3])
    dt_b = time_fn(lambda tg2, hi2: pk.sweep_nw_banded_pallas(
        peq, tg2, jnp.asarray(woff), hi2, n_win, chunk=CHUNK))
    g = B * N * N * REPS / 1e9
    print(f"bench_banded[K={K}]: full {dt_f:.3f}s = {g/dt_f:.0f} GCUPS; "
          f"banded[{n_win}/{nw}w] {dt_b:.3f}s = {g/dt_b:.0f} GCUPS-equiv "
          f"({dt_f/dt_b:.2f}x)")


if __name__ == "__main__":
    step = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if step == "probe":
        probe()
    elif step == "exact":
        exact()
    elif step == "bench_reduce":
        bench_reduce(shared=False)
    elif step == "bench_shared":
        bench_reduce(shared=True)
    elif step == "bench_hits":
        bench_hits()
    elif step == "banded":
        bench_banded()
