"""Bit-plane kernels: in-kernel Eq reconstruction for any alphabet size.

The round-4 eq-stream engine covered sigma > 64 by streaming pre-gathered
Eq words from HBM (measured 8x below the select-chain kernels).  The
bit-plane engine keeps each lane's query-symbol ids as packed bit planes
in VMEM and rebuilds Eq per column with the XNOR-AND trick
(pallas_kernel._bitplane_eq) — the reference's full sigma <= 256
(edlib.cpp:1417-1462) with no alphabet cliff.  These tests pin kernel
parity against the oracle (interpret mode on CPU; chip coverage via
scripts/hw_eqstream.py), the additionalEqualities alternative-id planes,
the universal-row pad mask, and the batch.py routing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from edlib_tpu import encode
from edlib_tpu.align import align
from edlib_tpu.batch import _bigalpha_plan, _bigalpha_route, \
    align_batch_device
from edlib_tpu.oracle import edit_distance_simple
from edlib_tpu.ops import pallas_kernel as pk


def _identity_inputs(rng, B, qlen, tlen, sigma, nw):
    """(q_alts, pad_words, targets, lo, hi, qs, ts) for identity equality."""
    R = nw * 32
    w = R - qlen
    t_scan = -(-(tlen + w) // 32) * 32
    nb = pk.bitplane_nb(sigma)
    sent = (1 << nb) - 1
    q_alts = np.full((B, 1, R), sent, np.int32)
    pad_words = np.zeros((B, nw), np.uint32)
    for r in range(qlen, R):
        pad_words[:, r // 32] |= np.uint32(1 << (r % 32))
    targets = np.full((B, t_scan), sigma, np.int32)
    qs, ts = [], []
    for b in range(B):
        q = rng.randint(0, sigma, qlen).astype(np.int32)
        t = rng.randint(0, sigma, tlen).astype(np.int32)
        qs.append(q)
        ts.append(t)
        q_alts[b, 0, :qlen] = q
        targets[b, :tlen] = t
    lo = np.full(B, w, np.int32)
    hi = np.full(B, w + tlen, np.int32)
    return q_alts, pad_words, targets, lo, hi, qs, ts, w


@pytest.mark.parametrize("sigma,hin0", [(70, 0), (200, 1), (256, 0)])
def test_bitplane_reduce_matches_oracle(rng, sigma, hin0):
    B, qlen, tlen, nw = 7, 45, 100, 2
    q_alts, pad_words, targets, lo, hi, qs, ts, w = _identity_inputs(
        rng, B, qlen, tlen, sigma, nw)
    outs = pk.reduce_flat_device_bitplane(
        jnp.asarray(q_alts), jnp.asarray(pad_words), jnp.asarray(targets),
        jnp.asarray(lo), jnp.asarray(hi), hin0=hin0, sigma=sigma, chunk=32,
        want_hits=True, interpret=True)
    best, pf, pl_, last, hits = (np.asarray(o) for o in outs)
    mode = "HW" if hin0 == 0 else "SHW"
    for b in range(B):
        score, positions = edit_distance_simple(qs[b], ts[b], mode)
        assert int(best[b]) == score, b
        real = [p for p in positions if p >= 0]
        if real:
            assert int(pf[b]) - w == real[0], b
            assert int(pl_[b]) - w == real[-1], b
            bits = np.nonzero((hits[b][:, None] >> np.arange(32)) & 1)
            cols = np.sort(bits[0] * 32 + bits[1]) - w
            assert list(cols) == real, b
        if hin0 == 1:
            nw_score = edit_distance_simple(qs[b], ts[b], "NW")[0]
            assert int(last[b]) == nw_score, b


def test_bitplane_equalities_and_universal_rows(rng):
    """additionalEqualities ride as alternative-id planes; rows matching
    every symbol (dense equality rows) ride the packed pad mask."""
    sigma, qlen, tlen, B = 70, 30, 80, 5
    nw = encode.num_words(qlen)
    R = nw * 32
    w = R - qlen
    t_scan = -(-(tlen + w) // 32) * 32
    # Equality matrices are symmetric by contract (the reference
    # symmetrises additionalEqualities, edlib.cpp:63-94).
    eq = np.eye(sigma, dtype=bool)
    eq[3, 9] = eq[9, 3] = True
    eq[11, 20] = eq[20, 11] = True
    eq[7, :] = eq[:, 7] = True  # symbol 7 matches everything
    plan = _bigalpha_plan(sigma, eq)
    assert plan is not None
    altset, universal, n_alts = plan
    assert n_alts == 3 and universal[7]
    nb = pk.bitplane_nb(sigma)
    sent = (1 << nb) - 1
    q_alts = np.full((B, n_alts, R), sent, np.int32)
    pad_words = np.zeros((B, nw), np.uint32)
    targets = np.full((B, t_scan), sigma, np.int32)
    qs, ts = [], []
    for b in range(B):
        q = rng.randint(0, sigma, qlen).astype(np.int64)
        t = rng.randint(0, sigma, tlen).astype(np.int64)
        qs.append(q)
        ts.append(t)
        alts = altset[q].T
        q_alts[b, :, :qlen] = np.where(alts >= 0, alts, sent)
        for r in range(R):
            if r >= qlen or universal[q[r]]:
                pad_words[b, r // 32] |= np.uint32(1 << (r % 32))
        targets[b, :tlen] = t
    lo = np.full(B, w, np.int32)
    hi = np.full(B, w + tlen, np.int32)
    outs = pk.reduce_flat_device_bitplane(
        jnp.asarray(q_alts), jnp.asarray(pad_words), jnp.asarray(targets),
        jnp.asarray(lo), jnp.asarray(hi), hin0=0, sigma=sigma, chunk=32,
        interpret=True)
    best = np.asarray(outs[0])
    from edlib_tpu.ops import host as host_engine
    for b in range(B):
        hp = encode.build_peq_bigint(qs[b], eq)
        hs = host_engine.semiglobal_scores(hp, ts[b], qlen, "HW")
        assert int(best[b]) == int(hs.min()), b


def test_bigalpha_routing():
    """Sparse equality matrices route to bitplane; dense ones (a
    non-universal row matching more than the alt cap) fall to the legacy
    eq-stream; EDLIB_TPU_BITPLANE=0 disables the fast path."""
    sigma = 100
    eq = np.eye(sigma, dtype=bool)
    route, plan = _bigalpha_route("tpu", sigma, eq, 16, 4, 1024)
    assert route == "bitplane" and plan[2] == 1

    eq2 = np.eye(sigma, dtype=bool)
    eq2[5, 10:20] = True  # 11 alternatives, not universal
    route2, _ = _bigalpha_route("tpu", sigma, eq2, 16, 4, 1024)
    assert route2 == "eqstream"


def test_bitplane_disabled_falls_back(rng, monkeypatch):
    """With EDLIB_TPU_BITPLANE=0 the legacy eq-stream still carries
    big-alphabet distinct-target batches, results unchanged."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_BITPLANE", "0")
    sigma = 96
    queries, targets = [], []
    for _ in range(4):
        queries.append(bytes(rng.randint(0, sigma, rng.randint(8, 40),
                                         dtype=np.uint8)))
        targets.append(bytes(rng.randint(0, sigma, rng.randint(30, 90),
                                         dtype=np.uint8)))
    got = align_batch_device(queries, targets, mode="HW", task="locations")
    for i, (q, t) in enumerate(zip(queries, targets)):
        want = align(q, t, mode="HW", task="locations")
        assert got[i]["editDistance"] == want["editDistance"], i
        assert got[i]["locations"] == want["locations"], i


def test_align_batch_equalities_big_alphabet(rng, monkeypatch):
    """Custom equality pairs on a big alphabet run the bitplane path via
    align_batch_device and match per-pair align()."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    sigma = 80
    pairs = [(bytes([3]), bytes([9])), (bytes([11]), bytes([20]))]
    queries, targets = [], []
    for _ in range(4):
        queries.append(bytes(rng.randint(0, sigma, rng.randint(10, 30),
                                         dtype=np.uint8)))
        targets.append(bytes(rng.randint(0, sigma, rng.randint(40, 80),
                                         dtype=np.uint8)))
    got = align_batch_device(queries, targets, mode="HW", task="locations",
                             additionalEqualities=pairs)
    for i, (q, t) in enumerate(zip(queries, targets)):
        want = align(q, t, mode="HW", task="locations",
                     additionalEqualities=pairs)
        assert got[i]["editDistance"] == want["editDistance"], i
        assert got[i]["locations"] == want["locations"], i


def test_mid_sigma_routes_to_bitplane(rng, monkeypatch):
    """Per-lane-target buckets with 32 <= sigma <= 64 (inside the select
    cap) route to the bit-plane kernels — measured faster there — and
    match per-pair align()."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    from edlib_tpu import batch as batch_mod
    calls = []
    orig = batch_mod._run_bucket_bitplane

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(batch_mod, "_run_bucket_bitplane", spy)
    sigma = 40
    queries, targets = [], []
    for _ in range(5):
        queries.append(bytes(rng.randint(0, sigma, rng.randint(10, 50),
                                         dtype=np.uint8)))
        targets.append(bytes(rng.randint(0, sigma, rng.randint(40, 120),
                                         dtype=np.uint8)))
    got = align_batch_device(queries, targets, mode="HW", task="locations")
    assert calls, "mid-sigma bucket did not route to bitplane"
    for i, (q, t) in enumerate(zip(queries, targets)):
        want = align(q, t, mode="HW", task="locations")
        assert got[i]["editDistance"] == want["editDistance"], i
        assert got[i]["locations"] == want["locations"], i
