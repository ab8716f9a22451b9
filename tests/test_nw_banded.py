"""Banded batched NW kernel (interpret mode): exactness + pruning contract.

The static diagonal band mirrors the reference's banded NW semantics
(edlib.cpp:796-870): results are exact whenever the true distance is <= k,
and are treated as "not found" otherwise (k-doubling retries).  Truth comes
from per-pair align() / the host engines.
"""

import numpy as np
import pytest

from edlib_tpu import align, encode
from edlib_tpu.batch import _run_bucketed_nw_banded
from edlib_tpu.ops import pallas_kernel


def _mutate(rng, seq, rate, sigma):
    out = []
    for ch in seq:
        r = rng.rand()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append(int(rng.randint(sigma)))  # substitution
        elif r < rate:
            out.extend([int(ch), int(rng.randint(sigma))])  # insertion
        else:
            out.append(int(ch))
    return np.array(out, dtype=np.int32)


def _nw_dist(q_ids, t_ids, sigma):
    al = "".join("ACGTN"[i] for i in range(sigma))
    q = bytes("".join(al[i] for i in q_ids), "ascii")
    t = bytes("".join(al[i] for i in t_ids), "ascii")
    return align(q, t, mode="NW", task="distance")["editDistance"]


@pytest.mark.parametrize("shared", [False, True])
def test_banded_kernel_exact_within_k(monkeypatch, shared):
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    rng = np.random.RandomState(17)
    sigma = 4
    eq = np.eye(sigma, dtype=bool)
    qlen, B = 250, 6
    nw_b = 16  # _pow2_at_least(num_words(250)); mutations keep nw the same
    t_shared = _mutate(rng, rng.randint(0, sigma, qlen), 0.08, sigma)
    qs, ts, truth = [], [], []
    for _ in range(B):
        q = rng.randint(0, sigma, qlen).astype(np.int32)
        t = t_shared if shared else _mutate(rng, q, 0.08, sigma)
        # make some pairs similar so small k succeeds for them
        if not shared and len(qs) % 2 == 0:
            q = _mutate(rng, t, 0.05, sigma)
        qs.append(q)
        ts.append(t)
        truth.append(_nw_dist(q, t, sigma))
    ws = np.array([nw_b * 32 - len(q) for q in qs], np.int64)
    t_scan = 1 << int(np.max([len(t) + w for t, w in zip(ts, ws)])
                      - 1).bit_length()
    peq = np.stack([encode.build_peq_words(q, eq, n_words=nw_b)
                    for q in qs])
    hi = np.array([w + len(t) for t, w in zip(ts, ws)], np.int64)
    D = np.array([len(q) - len(t) for q, t in zip(qs, ts)], np.int64)
    if shared:
        targets = ts[0]
    else:
        targets = np.full((B, t_scan), sigma, np.int32)
        for b in range(B):
            targets[b, :len(ts[b])] = ts[b]

    sweeper = pallas_kernel.PallasSweeper(chunk=32, interpret=True)
    for k in (16, 40, 120, 400):
        feas = np.abs(D) <= k
        if not feas.any():
            continue
        d_lo = int(np.min(-((k - D[feas]) // 2)))
        d_hi = int(np.max((D[feas] + k) // 2))
        rl = sweeper.reduce_nw_banded(peq, targets, hi, d_lo, d_hi,
                                      shared=shared)
        for b in range(B):
            if feas[b] and truth[b] <= k:
                assert rl[b] == truth[b], (k, b, rl[b], truth[b])
            elif rl[b] <= k and feas[b]:
                # a <=k banded result must always be exact
                assert rl[b] == truth[b], (k, b)


def test_banded_driver_k_doubling(monkeypatch):
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    rng = np.random.RandomState(23)
    sigma = 4
    eq = np.eye(sigma, dtype=bool)
    pairs, truth = [], []
    for i in range(5):
        q = rng.randint(0, sigma, 230 + 3 * i).astype(np.int32)
        t = _mutate(rng, q, 0.05 if i % 2 else 0.4, sigma)
        pairs.append((q, t))
        truth.append(_nw_dist(q, t, sigma))
    got = _run_bucketed_nw_banded(pairs, sigma, eq, -1)
    assert got.tolist() == truth
    got_k = _run_bucketed_nw_banded(pairs, sigma, eq, 30)
    want_k = [d if d <= 30 else -1 for d in truth]
    assert got_k.tolist() == want_k
    got_k0 = _run_bucketed_nw_banded(pairs, sigma, eq, 0)
    want_k0 = [d if d <= 0 else -1 for d in truth]
    assert got_k0.tolist() == want_k0


def test_align_batch_nw_banded_parity(monkeypatch):
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    from edlib_tpu.batch import align_batch_device
    rng = np.random.RandomState(31)
    base = bytes(rng.choice(list(b"ACGT"), 240).tolist())
    queries = []
    for i in range(4):
        arr = np.frombuffer(base, np.uint8).copy()
        n_mut = 4 * (i + 1)
        pos = rng.choice(len(arr), n_mut, replace=False)
        arr[pos] = [b"ACGT"[j] for j in rng.randint(0, 4, n_mut)]
        queries.append(arr.tobytes())
    targets = [base] * len(queries)
    for task in ("distance", "path"):
        for k in (-1, 10, 25):
            batch = align_batch_device(queries, targets, mode="NW",
                                       task=task, k=k)
            for q, got in zip(queries, batch):
                assert got == align(q, base, mode="NW", task=task, k=k)
