"""Eq-stream kernels: per-lane-target batches past the select-chain cap.

The reference supports sigma <= 256 everywhere (transformSequences,
edlib.cpp:1417-1462); the general Pallas kernels cap the S1-way select at
max_sigma1.  The eq-stream path gathers Eq rows with exact MXU one-hot
matmuls and streams them through select-free kernel variants — these tests
pin the gather's bit-exactness and end-to-end parity at sigma 25/64/200/256
for distinct-target batches (interpret mode on CPU; chip coverage via
scripts/capture_perf_hw.py eqstream rows).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from edlib_tpu import encode
from edlib_tpu.align import align
from edlib_tpu.batch import align_batch_device
from edlib_tpu.oracle import edit_distance_simple
from edlib_tpu.ops import pallas_kernel as pk


@pytest.mark.parametrize("sigma", [25, 64, 200, 256])
def test_eqstream_gather_bit_exact(rng, sigma):
    B, NW, T = 9, 3, 70
    peq = rng.randint(0, 1 << 32, size=(B, sigma + 1, NW)).astype(np.uint32)
    targets = rng.randint(0, sigma + 1, size=(B, T)).astype(np.int32)
    got = np.asarray(pk.eqstream_gather(jnp.asarray(peq),
                                        jnp.asarray(targets)))
    want = peq[np.arange(B)[:, None], targets, :]
    assert np.array_equal(got, want)


@pytest.mark.parametrize("sigma,hin0", [(70, 0), (200, 1), (256, 0)])
def test_eqstream_reduce_matches_oracle(rng, sigma, hin0):
    B, qlen, tlen, nw = 11, 45, 130, 2
    eq = np.eye(sigma, dtype=bool)
    w = nw * 32 - qlen
    t_scan = 224  # >= w + tlen, multiple of 32
    peq = np.zeros((B, sigma + 1, nw), np.uint32)
    targets = np.full((B, t_scan), sigma, np.int32)
    lo = np.full(B, w, np.int32)
    hi = np.full(B, w + tlen, np.int32)
    qs, ts = [], []
    for b in range(B):
        q = rng.randint(0, sigma, qlen).astype(np.int32)
        t = rng.randint(0, sigma, tlen).astype(np.int32)
        qs.append(q)
        ts.append(t)
        peq[b] = encode.build_peq_words(q, eq, n_words=nw)
        targets[b, :tlen] = t
    outs = pk.reduce_flat_device_eqstream(
        jnp.asarray(peq), jnp.asarray(targets), jnp.asarray(lo),
        jnp.asarray(hi), hin0=hin0, chunk=32, want_hits=True,
        interpret=True)
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


def test_align_batch_big_alphabet_distinct_targets(rng, monkeypatch):
    """Distinct-target batches with sigma > 64 stay on the device engines
    (eq-stream) and match per-pair align() — including locations."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    sigma = 96
    queries, targets = [], []
    for _ in range(6):
        queries.append(bytes(rng.randint(0, sigma, rng.randint(8, 60),
                                         dtype=np.uint8)))
        targets.append(bytes(rng.randint(0, sigma, rng.randint(30, 150),
                                         dtype=np.uint8)))
    for mode in ("HW", "NW", "SHW"):
        got = align_batch_device(queries, targets, mode=mode,
                                 task="locations")
        for i, (q, t) in enumerate(zip(queries, targets)):
            want = align(q, t, mode=mode, task="locations")
            assert got[i]["editDistance"] == want["editDistance"], (mode, i)
            assert got[i]["locations"] == want["locations"], (mode, i)
