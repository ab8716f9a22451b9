"""Two-phase Pallas path (reduce + hit-bitmask kernels), interpret mode.

Drives `_run_bucketed_summary`'s Pallas branch (general AND shared-target
variants) on CPU via the Pallas interpreter and checks the summaries — and
the full align_batch results built from them — against the XLA stream
engine / per-pair align().  Shapes are kept to a couple of buckets so the
interpreter compiles stay cheap; real-chip validation lives in the
tpu-marked suite.
"""

import numpy as np
import pytest

from edlib_tpu import align, encode
from edlib_tpu.batch import _run_bucketed_summary, _summarize_stream
from edlib_tpu.ops import jax_engine


def _stream_summary(pairs, sigma, eq, hin0):
    """Ground truth summaries via the XLA stream engine."""
    out = []
    for q_ids, t_ids in pairs:
        nw = encode.num_words(len(q_ids))
        w = nw * 32 - len(q_ids)
        peq = encode.build_peq_words(q_ids, eq, n_words=nw)[None]
        tg = np.full((1, len(t_ids) + w), sigma, np.int32)
        tg[0, :len(t_ids)] = t_ids
        stream = np.asarray(jax_engine.sweep_scores(peq, tg, hin0=hin0))
        out.append(_summarize_stream(stream[0, w:w + len(t_ids)], True))
    return out


def _make(rng, n, qlen, tlen, sigma=4, shared=False):
    t_shared = rng.randint(0, sigma, tlen).astype(np.int32)
    pairs = []
    for _ in range(n):
        q = rng.randint(0, sigma, qlen).astype(np.int32)
        t = t_shared if shared else rng.randint(0, sigma,
                                                tlen).astype(np.int32)
        pairs.append((q, t))
    return pairs


@pytest.mark.parametrize("shared", [False, True])
@pytest.mark.parametrize("hin0", [0, 1])
def test_two_phase_summaries(monkeypatch, shared, hin0):
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    rng = np.random.RandomState(3 + hin0)
    sigma = 4
    eq = np.eye(sigma, dtype=bool)
    # One bucket: qlen 40 (nw=2, w=24), tlen 100 -> t_scan pow2 = 128.
    pairs = _make(rng, 9, qlen=40, tlen=100, sigma=sigma, shared=shared)
    got = _run_bucketed_summary(pairs, sigma, eq, hin0, want_hits=True)
    want = _stream_summary(pairs, sigma, eq, hin0)
    for g, w_ in zip(got, want):
        assert g.best == w_.best
        assert g.pos_first == w_.pos_first
        assert g.pos_last == w_.pos_last
        assert g.last_score == w_.last_score
        assert np.array_equal(g.positions, w_.positions)


def test_two_phase_align_batch_parity(monkeypatch):
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_PALLAS_CHUNK", "32")
    from edlib_tpu.batch import align_batch_device
    rng = np.random.RandomState(11)
    tgt = bytes(rng.choice(list(b"ACGT"), 90).tolist())
    queries = [bytes(rng.choice(list(b"ACGT"), 33).tolist())
               for _ in range(5)]
    queries.append(tgt[10:43])  # an exact-ish hit
    for mode in ("NW", "HW", "SHW"):
        for task in ("distance", "locations", "path"):
            batch = align_batch_device(queries, [tgt] * len(queries),
                                       mode=mode, task=task)
            for q, got in zip(queries, batch):
                assert got == align(q, tgt, mode=mode, task=task), (mode,
                                                                    task, q)
