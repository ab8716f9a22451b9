"""MXU q-gram prefilter (ops/qfilter.py) — exactness and routing.

The filter may only ever REMOVE provably-dead windows; every test here
checks the combined filter+verify result against the host bit-parallel
engine (ops/host.py), the same oracle the kernels test against.  Runs in
interpret mode on CPU (the kernels themselves have on-chip coverage in
test_hw_tpu.py / bench.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import host as host_engine
from edlib_tpu.ops import qfilter as qf

SIGMA = 4


def _truth(read, target, qlen):
    eq = np.eye(SIGMA, dtype=bool)
    hp = encode.build_peq_bigint(read.astype(np.uint8), eq)
    hs = host_engine.semiglobal_scores(hp, np.asarray(target), qlen, "HW")
    return int(hs.min()), int(np.argmin(hs))


def _run(q_arr, qlens, target, k, maxc=4, chunk=64):
    qmax = q_arr.shape[1]
    nw = encode.num_words(qmax)
    geom = qf.window_geometry(len(target), qmax, k)
    assert geom is not None
    L, stride, n_win = geom
    q = qf.choose_q(SIGMA, int(qlens.min()), k, L)
    assert q is not None
    return qf.filter_verify_map(
        jnp.asarray(q_arr), jnp.asarray(qlens), jnp.asarray(target),
        sigma=SIGMA, q=q, L=L, stride=stride, n_win=n_win, k=k, maxc=maxc,
        nw=nw, chunk=chunk, interpret=True)


def _check_batch(reads, qlens, target, k, gbest, gpos, resolved):
    """resolved reads must be exact; unresolved ones are allowed (caller
    falls back) but never wrong when claiming a hit."""
    for b in range(len(reads)):
        tb, tp = _truth(reads[b][:qlens[b]], target, int(qlens[b]))
        if not resolved[b]:
            continue
        if tb <= k:
            assert int(gbest[b]) == tb, (b, int(gbest[b]), tb)
            assert int(gpos[b]) == tp, (b, int(gpos[b]), tp)
        else:
            assert int(gbest[b]) > k, (b, int(gbest[b]), tb)


def test_mutated_windows_exact(rng):
    tlen, qlen, B, k = 5000, 120, 16, 12
    target = rng.randint(0, SIGMA, tlen).astype(np.int32)
    reads = []
    for b in range(B):
        if b % 4 == 3:
            r = rng.randint(0, SIGMA, qlen)       # random: likely no hit
        else:
            start = rng.randint(0, tlen - qlen)
            r = target[start:start + qlen].copy()
            muts = rng.rand(qlen) < 0.05
            r[muts] = rng.randint(0, SIGMA, muts.sum())
            for _ in range(rng.randint(0, 3)):    # indels
                r = np.delete(r, rng.randint(1, len(r)))
            r = np.concatenate([r, rng.randint(0, SIGMA, qlen - len(r))])
        reads.append(r.astype(np.int32))
    q_arr = np.stack(reads)
    qlens = np.full(B, qlen, np.int32)
    gbest, gpos, resolved = map(np.asarray, _run(q_arr, qlens, target, k))
    _check_batch(reads, qlens, target, k, gbest, gpos, resolved)
    assert resolved.mean() > 0.5  # the filter resolves typical reads


def test_boundary_hits_exact(rng):
    """Hits at the target's first and last possible spans (window-edge and
    wildcard-flush coverage)."""
    tlen, qlen, k = 4096, 100, 10
    target = rng.randint(0, SIGMA, tlen).astype(np.int32)
    reads = np.stack([
        target[:qlen], target[tlen - qlen:],       # exact ends
        np.concatenate([target[tlen - qlen + 3:], [1, 2, 3]]),  # near-end
    ]).astype(np.int32)
    qlens = np.full(3, qlen, np.int32)
    gbest, gpos, resolved = map(np.asarray, _run(reads, qlens, target, k))
    _check_batch(reads, qlens, target, k, gbest, gpos, resolved)
    assert resolved.all()
    assert int(gbest[0]) == 0 and int(gpos[0]) == qlen - 1
    assert int(gbest[1]) == 0 and int(gpos[1]) == tlen - 1


def test_low_complexity_unresolved_not_wrong(rng):
    """A homopolymer read against a homopolymer-rich target: many windows
    pass -> unresolved is acceptable, a wrong resolved answer is not."""
    tlen, qlen, k = 4096, 120, 12
    target = np.zeros(tlen, np.int32)
    target[::7] = rng.randint(0, SIGMA, len(target[::7]))
    reads = np.stack([np.zeros(qlen, np.int32),
                      target[100:100 + qlen]]).astype(np.int32)
    qlens = np.full(2, qlen, np.int32)
    gbest, gpos, resolved = map(np.asarray, _run(reads, qlens, target, k))
    _check_batch(reads, qlens, target, k, gbest, gpos, resolved)


def test_mixed_lengths(rng):
    tlen, k = 4096, 8
    target = rng.randint(0, SIGMA, tlen).astype(np.int32)
    lens = [96, 120, 128, 100]
    qmax = max(lens)
    q_arr = np.zeros((len(lens), qmax), np.int32)
    for i, ln in enumerate(lens):
        start = rng.randint(0, tlen - ln)
        r = target[start:start + ln].copy()
        muts = rng.rand(ln) < 0.03
        r[muts] = rng.randint(0, SIGMA, muts.sum())
        q_arr[i, :ln] = r
    qlens = np.asarray(lens, np.int32)
    gbest, gpos, resolved = map(np.asarray, _run(q_arr, qlens, target, k))
    reads = [q_arr[i] for i in range(len(lens))]
    _check_batch(reads, qlens, target, k, gbest, gpos, resolved)
    assert resolved.all() and (np.asarray(gbest) <= k).all()


def test_first_position_ties(rng):
    """A read with two equal-score hits must report the FIRST end position
    (edlib's ascending location order)."""
    qlen, k = 64, 6
    motif = rng.randint(0, SIGMA, qlen).astype(np.int32)
    filler = rng.randint(0, SIGMA, 1200).astype(np.int32)
    target = np.concatenate([filler[:600], motif, filler[600:], motif,
                             filler[:333]]).astype(np.int32)
    reads = motif[None, :]
    qlens = np.asarray([qlen], np.int32)
    gbest, gpos, resolved = map(np.asarray, _run(reads, qlens, target, k))
    tb, tp = _truth(motif, target, qlen)
    assert tb == 0 and resolved[0]
    assert int(gbest[0]) == 0 and int(gpos[0]) == tp == 600 + qlen - 1


def test_choose_q_soundness_bounds():
    # tau >= 1 must hold for returned q: (qlen-q+1) - k*q >= 1
    for sigma, qlen, k in [(4, 120, 12), (4, 100, 8), (20, 64, 4)]:
        qv = qf.choose_q(sigma, qlen, k, 384)
        if qv is not None:
            assert (qlen - qv + 1) - k * qv >= 1
            assert sigma ** qv <= qf.MAX_VOCAB
    # k too large for the read: no sound q exists
    assert qf.choose_q(4, 30, 20, 384) is None
    # degenerate alphabets
    assert qf.choose_q(1, 120, 5, 384) is None


def test_window_geometry_covers_all_spans():
    for tlen, qmax, k in [(4096, 120, 12), (65536, 300, 30),
                          (10000, 64, 6)]:
        geom = qf.window_geometry(tlen, qmax, k)
        if geom is None:
            continue
        L, stride, n_win = geom
        P = qmax + k
        assert stride <= L - P + 1            # every span inside >= 1 window
        assert (n_win - 1) * stride + L >= tlen   # windows reach the end
    assert qf.window_geometry(500, 300, 30) is None  # too short: sweep


def test_map_reads_filter_path_matches_host(rng, monkeypatch):
    """End-to-end: map_reads with the filter path forced on (interpret
    kernels on CPU) equals the per-read host truth, including fallback of
    unresolved / over-rung reads."""
    from edlib_tpu import mapping
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_AUTO_MESH", "0")
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "1")
    tlen, qlen, B = 3000, 96, 12
    target = rng.randint(0, SIGMA, tlen).astype(np.uint8)
    reads = []
    for b in range(B):
        if b % 5 == 4:
            r = rng.randint(0, SIGMA, qlen).astype(np.uint8)
        else:
            start = rng.randint(0, tlen - qlen)
            r = target[start:start + qlen].copy()
            muts = rng.rand(qlen) < 0.04
            r[muts] = rng.randint(0, SIGMA, muts.sum())
        reads.append(bytes(r))
    tb = bytes(target)
    best, pos = mapping.map_reads(reads, tb, mode="HW", k=-1)
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "0")
    best0, pos0 = mapping.map_reads(reads, tb, mode="HW", k=-1)
    np.testing.assert_array_equal(best, best0)
    np.testing.assert_array_equal(pos, pos0)
    # and with a k cap
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "1")
    bestk, posk = mapping.map_reads(reads, tb, mode="HW", k=10)
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "0")
    bestk0, posk0 = mapping.map_reads(reads, tb, mode="HW", k=10)
    np.testing.assert_array_equal(bestk, bestk0)
    np.testing.assert_array_equal(posk, posk0)


def test_map_reads_filter_mesh_matches_single(rng, monkeypatch):
    """Sharded filter (reads over all 8 virtual devices, replicated index,
    zero collectives) == unsharded filter == plain path."""
    import jax
    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs 8 virtual devices")
    from edlib_tpu import mapping
    from edlib_tpu.parallel import make_alignment_mesh
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "1")
    tlen, qlen, B = 3000, 96, 19       # B % 8 != 0: pad lanes exercised
    target = rng.randint(0, SIGMA, tlen).astype(np.uint8)
    reads = []
    for b in range(B):
        if b % 5 == 4:
            r = rng.randint(0, SIGMA, qlen).astype(np.uint8)
        else:
            s = rng.randint(0, tlen - qlen)
            r = target[s:s + qlen].copy()
            muts = rng.rand(qlen) < 0.04
            r[muts] = rng.randint(0, SIGMA, muts.sum())
        reads.append(bytes(r))
    tb = bytes(target)
    mesh = make_alignment_mesh(8, dp=2, sp=4)
    best_m, pos_m = mapping.map_reads(reads, tb, mode="HW", k=-1, mesh=mesh)
    monkeypatch.setenv("EDLIB_TPU_AUTO_MESH", "0")
    best_s, pos_s = mapping.map_reads(reads, tb, mode="HW", k=-1)
    np.testing.assert_array_equal(best_m, best_s)
    np.testing.assert_array_equal(pos_m, pos_s)


def _adversarial_targets(rng, tlen=40000):
    """Repeat-rich target classes: tandem repeats, homopolymer runs, and
    a shuffled-composition control."""
    unit = rng.randint(0, 4, 200).astype(np.int32)
    tandem = np.tile(unit, -(-tlen // len(unit)))[:tlen]
    homo = np.concatenate([
        np.full(rng.randint(50, 400), rng.randint(0, 4), np.int32)
        for _ in range(tlen // 100)])[:tlen]
    if len(homo) < tlen:
        homo = np.tile(homo, 2)[:tlen]
    shuffled = rng.randint(0, 4, tlen).astype(np.int32)
    return {"tandem": tandem, "homopolymer": homo, "shuffled": shuffled}


def test_auto_tune_disables_on_tandem_repeats(rng):
    """On a tandem-repeat target every window shares most grams: the
    index-derived tuner must refuse to enable the filter (no sound q
    bounds the tail) instead of letting every read pay a fallback."""
    t = _adversarial_targets(rng)["tandem"]
    qlen, k = 100, 10
    geom = qf.window_geometry(len(t), qlen, k)
    assert geom is not None
    L, stride, n_win = geom
    q0 = qf.choose_q(4, qlen, k, L)
    Lv = qf.verify_cols(L, encode.num_words(qlen), 256)

    def builder(qq):
        return qf.build_target_index(jnp.asarray(t), 4, qq, L, stride,
                                     n_win, Lv)

    q, maxc, _, _, pred = qf.auto_tune(t, 4, q0, k, qlen, L, stride,
                                       n_win, Lv, builder)
    assert q is None, (q, maxc, pred)


def test_auto_tune_bounds_fallback_on_real_classes(rng):
    """Where the tuner enables the filter, its chosen maxc must keep the
    unresolved fraction bounded (<= 10%) on probe reads drawn from the
    target — asserted per adversarial class that stays enabled, plus
    end-to-end exactness of map_reads on every class."""
    targets = _adversarial_targets(rng, tlen=40000)
    qlen, k = 100, 10
    for name, t in targets.items():
        geom = qf.window_geometry(len(t), qlen, k)
        L, stride, n_win = geom
        q0 = qf.choose_q(4, qlen, k, L)
        Lv = qf.verify_cols(L, encode.num_words(qlen), 256)

        def builder(qq):
            return qf.build_target_index(jnp.asarray(t), 4, qq, L,
                                         stride, n_win, Lv)

        q, maxc, win_pres, _, pred = qf.auto_tune(
            t, 4, q0, k, qlen, L, stride, n_win, Lv, builder)
        if q is not None:
            assert pred >= 0.9, (name, q, maxc, pred)
            # measured (not just predicted) bound on fresh probes
            rng2 = np.random.RandomState(7)
            starts = rng2.randint(0, len(t) - qlen, 64)
            probes = np.stack([t[s:s + qlen] for s in starts])
            n_pass = np.asarray(qf.sample_pass_counts(
                jnp.asarray(probes.astype(np.int32)),
                jnp.full((64,), qlen, jnp.int32), win_pres, 4, q, k))
            assert (n_pass <= maxc).mean() >= 0.9, (name, q, maxc)


def test_map_reads_exact_on_adversarial_targets(rng, monkeypatch):
    """map_reads stays exact on every adversarial class whether the
    filter engages, escalates q, or disables itself."""
    from edlib_tpu.mapping import map_reads
    from edlib_tpu.align import align

    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "1")
    monkeypatch.delenv("EDLIB_TPU_QFILTER_MAXC", raising=False)
    targets = _adversarial_targets(rng, tlen=4000)
    for name, t in targets.items():
        tb = bytes(bytearray(int(x) + 65 for x in t))
        reads = []
        for _ in range(6):
            s = rng.randint(0, len(t) - 80)
            r = t[s:s + 80].copy()
            muts = rng.rand(80) < 0.06
            r[muts] = rng.randint(0, 4, muts.sum())
            reads.append(bytes(bytearray(int(x) + 65 for x in r)))
        best, pos = map_reads(reads, tb, mode="HW")
        for i, r in enumerate(reads):
            want = align(r, tb, mode="HW", task="locations")
            assert best[i] == want["editDistance"], (name, i)
            assert pos[i] == want["locations"][0][1], (name, i)


def test_filter_bitplane_verify_big_sigma(rng):
    """Above sigma=32 the filter's verification runs the bit-plane
    kernels (no select chain, no compile blowup) — exactness unchanged
    vs the host oracle, mixed lengths and wildcard boundary windows
    included."""
    sigma, tlen, qlen, B, k = 48, 6000, 100, 12, 10
    target = rng.randint(0, sigma, tlen).astype(np.int32)
    reads, qlens = [], np.zeros(B, np.int32)
    q_arr = np.zeros((B, qlen), np.int32)
    for b in range(B):
        ql = qlen if b % 3 else qlen - 7
        if b % 4 == 3:
            r = rng.randint(0, sigma, ql)
        else:
            start = rng.randint(0, tlen - ql)
            r = target[start:start + ql].copy()
            muts = rng.rand(ql) < 0.05
            r[muts] = rng.randint(0, sigma, muts.sum())
        q_arr[b, :ql] = r
        qlens[b] = ql
        reads.append(q_arr[b])
    nw = encode.num_words(qlen)
    geom = qf.window_geometry(tlen, qlen, k)
    L, stride, n_win = geom
    q = qf.choose_q(sigma, int(qlens.min()), k, L)
    assert q is not None
    gbest, gpos, resolved = map(np.asarray, qf.filter_verify_map(
        jnp.asarray(q_arr), jnp.asarray(qlens), jnp.asarray(target),
        sigma=sigma, q=q, L=L, stride=stride, n_win=n_win, k=k, maxc=8,
        nw=nw, chunk=64, interpret=True))
    eq = np.eye(sigma, dtype=bool)
    for b in range(B):
        if not resolved[b]:
            continue
        hp = encode.build_peq_bigint(reads[b][:qlens[b]].astype(np.int64),
                                     eq)
        hs = host_engine.semiglobal_scores(hp, target, int(qlens[b]), "HW")
        tb, tp = int(hs.min()), int(np.argmin(hs))
        if tb <= k:
            assert int(gbest[b]) == tb, (b, int(gbest[b]), tb)
            assert int(gpos[b]) == tp, (b, int(gpos[b]), tp)
        else:
            assert int(gbest[b]) > k, b
    assert resolved.any()
