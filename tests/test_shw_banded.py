"""Banded batched SHW kernels (interpret mode): exactness + pruning contract.

The sliding diagonal window mirrors the reference's banded SHW semantics
(edlib.cpp:58-78 doubling + 154-160 boundaries): every SHW cell of value
<= k lies on scan diagonals in [-k, k] (lane-independently — no per-lane W
shift on scan columns), so (best, first-pos, last-pos) and the hit
bitmask are exact whenever the true best is <= the banding k, and are
retried at doubled k otherwise.

Truth comes from the XLA stream engine / per-pair align() — NOT from the
full-sweep reduce/hits kernels, whose statically-unrolled column groups
are minutes-slow to compile under the Pallas interpreter at 8-word
shapes.  The end-to-end HW test shrinks to 2-word buckets via
EDLIB_TPU_BAND_MIN_WORDS for the same reason; the banded kernels
themselves keep the loop rolled in interpret mode and are exercised at
full 8-word sliding shapes in the kernel-level test.
"""

import numpy as np
import pytest

from edlib_tpu import align, encode
from edlib_tpu.ops import jax_engine, pallas_kernel


def _mutate(rng, seq, rate, sigma):
    out = []
    for ch in seq:
        r = rng.rand()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append(int(rng.randint(sigma)))
        elif r < rate:
            out.extend([int(ch), int(rng.randint(sigma))])
        else:
            out.append(int(ch))
    return np.array(out, dtype=np.int32)


def _stream_truth(q_ids, t_ids, sigma, eq, nw_b):
    """(best, pfirst, plast, positions) in scan-column space via the XLA
    stream engine (tested byte-exact elsewhere)."""
    w = nw_b * 32 - len(q_ids)
    peq = encode.build_peq_words(q_ids, eq, n_words=nw_b)[None]
    tg = np.full((1, len(t_ids) + w), sigma, np.int32)
    tg[0, :len(t_ids)] = t_ids
    stream = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=1))
    window = stream[0, w:w + len(t_ids)]
    best = int(window.min())
    hits = np.nonzero(window == best)[0].astype(np.int64) + w
    return best, int(hits[0]), int(hits[-1]), hits


@pytest.mark.parametrize("shared", [False, True])
def test_shw_banded_matches_stream(monkeypatch, shared):
    rng = np.random.RandomState(41)
    sigma = 4
    eq = np.eye(sigma, dtype=bool)
    nw_b = 8
    B = 6
    qs, ts = [], []
    t_shared = None
    for b in range(B):
        qlen = 230 + rng.randint(0, 16)  # all in the 8-word bucket
        q = rng.randint(0, sigma, qlen).astype(np.int32)
        if shared:
            if t_shared is None:
                t_shared = _mutate(rng, rng.randint(0, sigma, 300),
                                   0.06, sigma)
            t = t_shared
        else:
            # prefix-similar targets (SHW regime) with varied tails
            t = np.concatenate([
                _mutate(rng, q, 0.04 if b % 2 else 0.3, sigma),
                rng.randint(0, sigma,
                            rng.randint(0, 60)).astype(np.int32)])
        qs.append(q)
        ts.append(t)
    ws = np.array([nw_b * 32 - len(q) for q in qs], np.int64)
    t_scan = 1 << int(np.max([len(t) + w for t, w in zip(ts, ws)])
                      - 1).bit_length()
    peq = np.stack([encode.build_peq_words(q, eq, n_words=nw_b) for q in qs])
    lo = ws.copy()
    hi = np.array([w + len(t) for t, w in zip(ts, ws)], np.int64)
    if shared:
        targets = ts[0]
    else:
        targets = np.full((B, t_scan), sigma, np.int32)
        for b in range(B):
            targets[b, :len(ts[b])] = ts[b]

    truth = [_stream_truth(q, t, sigma, eq, nw_b) for q, t in zip(qs, ts)]
    fb = np.array([tr[0] for tr in truth], np.int64)

    sweeper = pallas_kernel.PallasSweeper(chunk=32, interpret=True)
    for k in (8, 96, 400):  # k=8 gives n_win=4 < 8: real window sliding
        bb, bpf, bpl = sweeper.reduce_shw_banded(peq, targets, lo, hi, k,
                                                 shared=shared)
        bhits = sweeper.hits_shw_banded(peq, targets, lo, hi, fb, k,
                                        shared=shared)
        for b in range(B):
            tbest, tpf, tpl, thits = truth[b]
            if tbest <= k:
                assert (bb[b], bpf[b], bpl[b]) == (tbest, tpf, tpl), (k, b)
                assert bhits[b].tolist() == thits.tolist(), (k, b)
            else:
                # pruning-only: a <=k banded best would have to be exact
                assert bb[b] > k, (k, b, bb[b], tbest)


def test_align_batch_shw_banded_parity(monkeypatch):
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    from edlib_tpu.batch import align_batch_device
    rng = np.random.RandomState(43)

    def to_ascii(ids):
        return bytes(b"ACGT"[int(i)] for i in ids)

    queries, targets = [], []
    for i in range(5):
        qlen = 230 + 4 * i  # nw_b = 8 >= _NW_BAND_MIN_WORDS
        q_ids = rng.randint(0, 4, qlen).astype(np.int32)
        t_ids = np.concatenate([
            _mutate(rng, q_ids, 0.05 if i % 2 else 0.35, 4),
            rng.randint(0, 4, 100).astype(np.int32)])
        queries.append(to_ascii(q_ids))
        targets.append(to_ascii(t_ids))
    for task in ("distance", "locations"):
        for k in (-1, 20, 6, 0):
            batch = align_batch_device(queries, targets, mode="SHW",
                                       task=task, k=k)
            for q, t, got in zip(queries, targets, batch):
                assert got == align(q, t, mode="SHW", task=task, k=k), \
                    (task, k)


def test_align_batch_hw_start_locations_banded(monkeypatch):
    """HW start locations route through the banded one-shot reversed-SHW.

    Tiny 2-word buckets (via EDLIB_TPU_BAND_MIN_WORDS) keep the HW main
    sweep's full reduce/hits interpreter compiles cheap; the banded
    sliding behaviour itself is covered at 8 words above.
    """
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    monkeypatch.setenv("EDLIB_TPU_BAND_MIN_WORDS", "2")
    from edlib_tpu.batch import align_batch_device
    rng = np.random.RandomState(47)
    tlen = 400
    target = bytes(rng.choice(list(b"ACGT"), tlen).tolist())
    queries = []
    for i in range(4):
        s = rng.randint(0, tlen - 80)
        q = np.frombuffer(target[s:s + 40 + 8 * i], np.uint8).copy()
        n_mut = i + 1
        pos = rng.choice(len(q), n_mut, replace=False)
        q[pos] = [b"ACGT"[j] for j in rng.randint(0, 4, n_mut)]
        queries.append(q.tobytes())
    for task in ("locations", "path"):
        batch = align_batch_device(queries, [target] * len(queries),
                                   mode="HW", task=task)
        for q, got in zip(queries, batch):
            assert got == align(q, target, mode="HW", task=task)


def test_shw_banded_protein_alphabet(monkeypatch):
    """General-variant banded kernels at sigma=26 (S1-way select chain)."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    monkeypatch.setenv("EDLIB_TPU_BAND_MIN_WORDS", "2")
    from edlib_tpu.batch import align_batch_device
    AA = b"ACDEFGHIKLMNPQRSTVWYBZXJUO"
    rng = np.random.RandomState(53)
    queries, targets = [], []
    for i in range(3):
        q_ids = rng.randint(0, 26, 60 + 4 * i)
        t_ids = np.concatenate([_mutate(rng, q_ids, 0.08, 26),
                                rng.randint(0, 26, 40)])
        queries.append(bytes(AA[c] for c in q_ids))
        targets.append(bytes(AA[c] for c in t_ids))
    for k in (-1, 8):
        batch = align_batch_device(queries, targets, mode="SHW",
                                   task="locations", k=k)
        for q, t, got in zip(queries, targets, batch):
            assert got == align(q, t, mode="SHW", task="locations", k=k), k
