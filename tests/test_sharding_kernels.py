"""Mesh-sharded Pallas kernel engine == XLA scan engine (virtual mesh).

On a TPU mesh every shard of parallel/dist runs the same register-resident
reduce/hits kernels as the single-chip hot path (the XLA scan engine is
latency-pathological on TPU); on CPU the scan engine stays the default.
These tests pin the two engines to identical outputs on the 8-virtual-
device mesh, driving the kernels through shard_map via the Pallas
interpreter (engine="interpret").
"""

import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.parallel import dist


@pytest.fixture(scope="module")
def mesh8():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return dist.make_alignment_mesh(8, dp=2, sp=4)


@pytest.mark.slow
def test_sharded_reduce_dp_engines_match(mesh8):
    rng = np.random.RandomState(9)
    sigma = 4
    eq = np.eye(sigma, dtype=bool)
    B, nw = 16, 2
    qlens = [40 + i for i in range(B)]
    peq = np.stack([encode.build_peq_words(
        rng.randint(0, sigma, ql).astype(np.int32), eq, n_words=nw)
        for ql in qlens])
    T = 160
    targets = np.full((B, T), sigma, np.int32)
    lo = np.zeros(B, np.int64)
    hi = np.zeros(B, np.int64)
    for b in range(B):
        t = rng.randint(0, sigma, 100 + b)
        targets[b, :len(t)] = t
        w = nw * 32 - qlens[b]
        lo[b] = w
        hi[b] = w + len(t)
    outs = {}
    for eng in ("xla", "interpret"):
        r = dist.sharded_reduce_dp(mesh8, peq, targets, lo, hi, 0,
                                   want_hits=True, engine=eng)
        outs[eng] = tuple(np.asarray(x) for x in r)
    for i in range(5):  # incl. the hit bitmask, shape-identical
        assert np.array_equal(outs["xla"][i], outs["interpret"][i]), i


@pytest.mark.slow
def test_sharded_hw_locations_engines_match(mesh8):
    rng = np.random.RandomState(13)
    sigma = 4
    eq = np.eye(sigma, dtype=bool)
    B, nw = 8, 2
    qlens = [40 + 2 * i for i in range(B)]
    peq = np.zeros((B, sigma + 2, nw), np.uint32)
    w_lanes = np.zeros(B, np.int32)
    qs = [rng.randint(0, sigma, ql).astype(np.int32) for ql in qlens]
    for b in range(B):
        peq[b, :sigma + 1] = encode.build_peq_words(qs[b], eq, n_words=nw)
        peq[b, sigma + 1] = 0  # NULL row (halo padding)
        w_lanes[b] = nw * 32 - qlens[b]
    t_ids = rng.randint(0, sigma, 1000).astype(np.int32)
    for b in range(0, B, 2):  # plant matches so minima are non-trivial
        s = rng.randint(0, 900)
        t_ids[s:s + qlens[b]] = qs[b]
    qmax, w_max = max(qlens), int(w_lanes.max())
    halo = 2 * qmax - 1
    halo += (-(halo + w_max)) % 32  # word-align the core start
    slices, C = dist.shard_target_slices(t_ids, sigma, 4, halo, w_max,
                                         c_multiple=32)
    outs = {}
    for eng in ("xla", "interpret"):
        r = dist.sharded_hw_locations(mesh8, peq, slices, halo, w_max,
                                      len(t_ids), w_lanes=w_lanes,
                                      want_hits=True, engine=eng)
        outs[eng] = tuple(np.asarray(x) for x in r)
    for i in range(4):
        assert np.array_equal(outs["xla"][i], outs["interpret"][i]), i


@pytest.mark.slow
def test_sharded_reduce_pipeline_engines_match_truth(mesh8):
    """Sequential carry pipeline (ppermute) with per-shard reductions ==
    the single-device stream reduce, for BOTH engines, with per-lane
    windows ending mid-shard and minima straddling shard boundaries."""
    from edlib_tpu.ops import jax_engine

    rng = np.random.RandomState(21)
    sigma = 4
    eq = np.eye(sigma, dtype=bool)
    B, nw, qlen = 8, 2, 50
    qs = [rng.randint(0, sigma, qlen).astype(np.int32) for _ in range(B)]
    peq = np.stack([encode.build_peq_words(q, eq, n_words=nw) for q in qs])
    T = 700
    t_ids = rng.randint(0, sigma, T).astype(np.int32)
    for b in range(0, B, 2):  # plant matches near shard boundaries
        s = min(170 * (b // 2 + 1) - qlen // 2, T - qlen)
        t_ids[s:s + qlen] = qs[b]
    w = nw * 32 - qlen
    lo = np.full(B, w, np.int64)
    hi = np.array([w + T - 37 * b for b in range(B)], np.int64)
    tg = np.full((B, T + w), sigma, np.int32)
    tg[:, :T] = t_ids
    stream = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=1))

    def truth(b):
        win = stream[b, lo[b]:hi[b]]
        best = int(win.min())
        hits = np.nonzero(win == best)[0] + lo[b]
        return best, int(hits[0]), int(hits[-1]), int(stream[b, hi[b] - 1])

    import edlib_tpu.parallel.dist as dist_mod
    for eng, chunk in (("xla", 256), ("interpret", 32)):
        r = dist_mod.sharded_reduce_pipeline(mesh8, peq, t_ids, qlen, lo,
                                             hi, hin0=1, engine=eng,
                                             chunk=chunk)
        r = tuple(np.asarray(x) for x in r)
        for b in range(B):
            assert tuple(int(x[b]) for x in r) == truth(b), (eng, b)


@pytest.mark.slow
def test_nw_banded_flat_device_shard_parity(mesh8):
    """Banded-NW flat device entry: dp-sharded shard_map == unsharded ==
    exact NW distances (band covers them) — the dryrun_multichip banded
    assertion as a pytest."""
    import jax.numpy as jnp
    from edlib_tpu.parallel.dist import shard_map
    from jax.sharding import PartitionSpec as P

    from edlib_tpu.ops import pallas_kernel as pk
    from edlib_tpu.oracle import edit_distance_simple
    from edlib_tpu.types import AlignMode

    rng = np.random.RandomState(33)
    sigma = 4
    eq = np.eye(sigma, dtype=bool)
    B, qlen = 16, 70
    nw = encode.num_words(qlen)
    w = nw * 32 - qlen
    k_band = 16
    qs, peq = [], np.zeros((B, sigma + 1, nw), np.uint32)
    tg = np.full((B, qlen + w + 8), sigma, np.int32)
    hi = np.zeros(B, np.int32)
    d_lo = d_hi = 0
    for b in range(B):
        qv = rng.randint(0, sigma, qlen).astype(np.int32)
        qs.append(qv)
        peq[b] = encode.build_peq_words(qv, eq, n_words=nw)
        t = qv.copy()
        muts = rng.rand(len(t)) < 0.06
        t[muts] = rng.randint(0, sigma, muts.sum())
        t = t[:len(t) - (b % 4)]
        tg[b, :len(t)] = t
        hi[b] = w + len(t)
        D = qlen - len(t)
        d_lo = min(d_lo, -((k_band - D) // 2))
        d_hi = max(d_hi, (D + k_band) // 2)

    def banded(pq, tg_, hi_):
        return pk.nw_banded_flat_device(pq, tg_, hi_, d_lo, d_hi, chunk=32,
                                        interpret=True)

    single = np.asarray(banded(jnp.asarray(peq), jnp.asarray(tg),
                               jnp.asarray(hi)))
    f = shard_map(banded, mesh=mesh8,
                  in_specs=(P(("dp", "sp")), P(("dp", "sp")),
                            P(("dp", "sp"))),
                  out_specs=P(("dp", "sp")), check_vma=False)
    shards = np.asarray(f(jnp.asarray(peq), jnp.asarray(tg),
                          jnp.asarray(hi)))
    np.testing.assert_array_equal(shards, single)
    for b in range(B):
        t = tg[b, :hi[b] - w]
        want = edit_distance_simple(qs[b], t, AlignMode.NW)[0]
        assert want <= k_band and single[b] == want, (b, single[b], want)
