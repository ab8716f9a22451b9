"""Wavefront (anti-diagonal) single-pair kernel vs the host engine."""

import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import host as host_engine
from edlib_tpu.ops.wavefront import BandedWavefront, Wavefront


@pytest.fixture(scope="module")
def wf():
    return Wavefront(chunk=64, interpret=True)


@pytest.mark.parametrize("qlen,tlen", [(1, 1), (5, 3), (40, 120), (64, 64),
                                       (100, 333), (129, 64), (300, 500)])
def test_wavefront_nw(qlen, tlen, wf, rng):
    sigma = 4
    q = rng.randint(0, sigma, qlen).astype(np.uint8)
    t = rng.randint(0, sigma, tlen).astype(np.uint8)
    hpeq = encode.build_peq_bigint(q, np.eye(sigma, dtype=bool))
    state, _, _ = host_engine.nw_run(hpeq, t, qlen)
    assert wf.nw_distance(q, t, sigma) == state.score


@pytest.mark.parametrize("mode_is_hw", [True, False])
def test_wavefront_semiglobal_best(mode_is_hw, wf, rng):
    sigma = 4
    for _ in range(6):
        qlen = rng.randint(1, 200)
        tlen = rng.randint(1, 400)
        q = rng.randint(0, sigma, qlen).astype(np.uint8)
        t = rng.randint(0, sigma, tlen).astype(np.uint8)
        hpeq = encode.build_peq_bigint(q, np.eye(sigma, dtype=bool))
        hs = host_engine.semiglobal_scores(
            hpeq, t, qlen, "HW" if mode_is_hw else "SHW")
        gb, gp = wf.semiglobal_best(q, t, sigma, mode_is_hw=mode_is_hw)
        assert gb == hs.min()
        assert gp == int(np.argmin(hs))


def test_wavefront_multi_segment_resume(rng):
    """Segmented execution (state carried between pallas calls) must be
    bit-identical to a single-segment run."""
    sigma = 4
    q = rng.randint(0, sigma, 150).astype(np.uint8)
    t = rng.randint(0, sigma, 400).astype(np.uint8)
    one = Wavefront(chunk=32, interpret=True, seg_chunks=1024)
    many = Wavefront(chunk=32, interpret=True, seg_chunks=2)
    assert one.nw_distance(q, t, sigma) == many.nw_distance(q, t, sigma)
    assert (one.semiglobal_best(q, t, sigma, True)
            == many.semiglobal_best(q, t, sigma, True))


@pytest.mark.slow
def test_banded_wavefront_exact(rng):
    wfb = BandedWavefront(seg_steps=256, interpret=True)
    for qlen, tlen, mut in ((40, 120, 0.1), (200, 300, 0.1), (300, 280, 0.3),
                            (500, 500, 0.05)):
        t = rng.randint(0, 4, tlen).astype(np.uint8)
        q = t[:min(qlen, tlen)].copy()
        if len(q) < qlen:
            q = np.concatenate([q, rng.randint(0, 4, qlen - len(q))
                                .astype(np.uint8)])
        m = rng.rand(qlen) < mut
        q[m] = rng.randint(0, 4, m.sum())
        hpeq = encode.build_peq_bigint(q, np.eye(4, dtype=bool))
        state, _, _ = host_engine.nw_run(hpeq, t, qlen)
        truth = int(state.score)
        assert wfb.nw_distance(q, t, 4) == truth
        assert wfb.nw_distance(q, t, 4, k=truth) == truth
        if truth > 0:
            assert wfb.nw_distance(q, t, 4, k=truth - 1) == -1


def test_banded_wavefront_sliding_window(rng):
    """Force window slides: r_min=1 gives a 128-word window against a
    157-word query; the band must track the diagonal through ~30 slides."""
    wfb = BandedWavefront(seg_steps=512, interpret=True, r_min=1)
    qlen, tlen = 5000, 5200
    t = rng.randint(0, 4, tlen).astype(np.uint8)
    q = t[:qlen].copy()
    m = rng.rand(qlen) < 0.05
    q[m] = rng.randint(0, 4, m.sum())
    from edlib_tpu import native_loader
    nw64 = encode.num_words(qlen, 64)
    peq64 = encode.build_peq_words(q, np.eye(4, dtype=bool), word_size=64,
                                   n_words=nw64)
    truth = native_loader.nw_distance_banded_native(peq64, t, qlen,
                                                    max(qlen, tlen))
    assert wfb.nw_distance(q, t, 4) == truth


@pytest.mark.slow
def test_banded_wavefront_shw(rng):
    """Banded SHW (best, first best end) vs the host full sweep."""
    wfb = BandedWavefront(seg_steps=256, interpret=True)
    for qlen, tlen, mut in ((40, 120, 0.1), (200, 300, 0.1),
                            (120, 80, 0.2), (300, 290, 0.3),
                            (64, 500, 0.05), (500, 450, 0.05)):
        t = rng.randint(0, 4, tlen).astype(np.uint8)
        q = t[:min(qlen, tlen)].copy()
        if len(q) < qlen:
            q = np.concatenate([q, rng.randint(0, 4, qlen - len(q))
                                .astype(np.uint8)])
        m = rng.rand(qlen) < mut
        q[m] = rng.randint(0, 4, m.sum())
        hpeq = encode.build_peq_bigint(q, np.eye(4, dtype=bool))
        hs = host_engine.semiglobal_scores(hpeq, t, qlen, "SHW")
        best, pos = int(hs.min()), int(np.argmin(hs))
        assert wfb.shw_best(q, t, 4) == (best, pos)
        assert wfb.shw_best(q, t, 4, k=best) == (best, pos)
        if best > 0:
            assert wfb.shw_best(q, t, 4, k=best - 1) == (-1, -1)


def test_banded_wavefront_shw_sliding_window(rng):
    """r_min=1 forces ~30 window slides over a 5000bp query; banded SHW
    must match the host sweep through every slide."""
    wfb = BandedWavefront(seg_steps=512, interpret=True, r_min=1)
    qlen, tlen = 5000, 5300
    t = rng.randint(0, 4, tlen).astype(np.uint8)
    q = t[100:100 + qlen].copy()   # best end ~ qlen+100, off-corner
    m = rng.rand(qlen) < 0.05
    q[m] = rng.randint(0, 4, m.sum())
    hpeq = encode.build_peq_bigint(q, np.eye(4, dtype=bool))
    hs = host_engine.semiglobal_scores(hpeq, t, qlen, "SHW")
    assert wfb.shw_best(q, t, 4) == (int(hs.min()), int(np.argmin(hs)))


@pytest.mark.slow
def test_banded_wavefront_shw_locations(rng):
    """Banded full-stream SHW: all minimal end positions via the
    pinned-tail stream phase, vs the host full sweep — including
    slide-forcing shapes (r_min=1) and every k regime."""
    from edlib_tpu.align import _filter_locations, _INF
    for r_min, seg, qlen, tlen, mut in (
            (1, 512, 1200, 1400, 0.05),   # ~9 slides then tail
            (1, 512, 2300, 2100, 0.10),
            (8, 256, 300, 500, 0.10),     # full window from step 0
            (1, 64, 900, 900, 0.30)):     # wide band, tiny segments
        wfb = BandedWavefront(seg_steps=seg, interpret=True, r_min=r_min)
        t = rng.randint(0, 4, tlen).astype(np.uint8)
        q = t[:min(qlen, tlen)].copy()
        if len(q) < qlen:
            q = np.concatenate([q, rng.randint(0, 4, qlen - len(q))
                                .astype(np.uint8)])
        m = rng.rand(qlen) < mut
        q[m] = rng.randint(0, 4, m.sum())
        hpeq = encode.build_peq_bigint(q, np.eye(4, dtype=bool))
        hs = host_engine.semiglobal_scores(hpeq, t, qlen, "SHW")
        want = _filter_locations(hs, qlen, _INF)
        got = wfb.shw_locations(q, t, 4)
        assert (got[0], list(got[1])) == (want[0], list(want[1]))
        # bounded-k regimes: exact at k=best, empty below
        assert wfb.shw_locations(q, t, 4, k=want[0])[0] == want[0]
        if want[0] > 0:
            assert wfb.shw_locations(q, t, 4, k=want[0] - 1) == (-1, [])


def test_wavefront_similar_pair(wf, rng):
    # The headline shape: one long ~90%-similar pair, exact NW distance.
    sigma = 4
    t = rng.randint(0, sigma, 800).astype(np.uint8)
    q = t[:700].copy()
    muts = rng.rand(700) < 0.1
    q[muts] = rng.randint(0, sigma, muts.sum())
    hpeq = encode.build_peq_bigint(q, np.eye(sigma, dtype=bool))
    state, _, _ = host_engine.nw_run(hpeq, t, 700)
    assert wf.nw_distance(q, t, sigma) == state.score


def test_nw_distance_long_api(rng, monkeypatch):
    import edlib_tpu
    q = bytes(rng.choice(list(b"ACGT"), 300).tolist())
    t = bytes(rng.choice(list(b"ACGT"), 400).tolist())
    want = edlib_tpu.align(q, t)["editDistance"]
    assert edlib_tpu.nw_distance_long(q, t) == want          # native path
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    got = edlib_tpu.nw_distance_long(q, t, backend="wavefront")
    assert got == want
    assert edlib_tpu.nw_distance_long(q, t, k=want - 1) == -1
    assert edlib_tpu.nw_distance_long(b"", t) == 400


@pytest.mark.parametrize("mode_is_hw", [True, False])
def test_wavefront_full_streams(mode_is_hw, rng):
    """Stream-emitting wavefront: full bottom-row score stream equals the
    host engine sweep, across segments and word-row boundaries."""
    wf = Wavefront(chunk=64, interpret=True, seg_chunks=2)
    for qlen, tlen in ((1, 1), (40, 120), (64, 64), (200, 333), (129, 64),
                       (4200, 600)):
        q = rng.randint(0, 4, qlen).astype(np.uint8)
        t = rng.randint(0, 4, tlen).astype(np.uint8)
        hpeq = encode.build_peq_bigint(q, np.eye(4, dtype=bool))
        hs = host_engine.semiglobal_scores(
            hpeq, t, qlen, "HW" if mode_is_hw else "SHW")
        got = wf.semiglobal_scores(q, t, 4, mode_is_hw=mode_is_hw)
        assert np.array_equal(got, hs), (qlen, tlen)


@pytest.mark.slow
def test_semiglobal_locations_long_api(rng, monkeypatch):
    import edlib_tpu
    t = bytes(rng.choice(list(b"ACGT"), 700).tolist())
    q = bytearray(t[200:500])
    for i in rng.choice(300, 15, replace=False):
        q[i] = rng.choice(list(b"ACGT"))
    q = bytes(q)
    for mode in ("HW", "SHW"):
        ref = edlib_tpu.align(q, t, mode=mode)
        want = (ref["editDistance"], [e for _, e in ref["locations"]])
        got = edlib_tpu.semiglobal_locations_long(q, t, mode=mode)
        assert got == want, (mode, got, want)
        monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
        got_wf = edlib_tpu.semiglobal_locations_long(q, t, mode=mode,
                                                     backend="wavefront")
        assert got_wf == want, mode
        assert edlib_tpu.semiglobal_locations_long(
            q, t, mode=mode, k=want[0] - 1, backend="wavefront") == (-1, [])
        monkeypatch.delenv("EDLIB_TPU_FORCE_PALLAS")
    # -1 artifact head: unmatched 33bp query, best == Q (Q % 64 != 0)
    q2 = b"Z" * 33
    ref2 = edlib_tpu.align(q2, t, mode="HW")
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    got2 = edlib_tpu.semiglobal_locations_long(q2, t, mode="HW",
                                               backend="wavefront")
    assert got2 == (ref2["editDistance"], [e for _, e in ref2["locations"]])
    assert edlib_tpu.semiglobal_locations_long(b"", t) == (0, [-1])


def test_nw_routing_similarity_aware(rng, monkeypatch):
    """NW device routing uses the effective (banded) cell estimate:
    similar pairs stay on the native engine even above the raw-cell
    threshold (measured: native banded beats the wavefront's full sweep
    there), dissimilar pairs of the same size go to the wavefront."""
    import edlib_tpu
    import importlib
    align_mod = importlib.import_module("edlib_tpu.align")
    from edlib_tpu.ops import wavefront as wf_mod

    # Raw cells = 1M for both pairs; threshold between the similar pair's
    # effective cells (~42k at d_ub~20) and raw.
    monkeypatch.setattr(align_mod, "_WAVEFRONT_MIN_CELLS", 500_000)
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    calls = []
    orig = wf_mod.BandedWavefront.nw_distance

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(wf_mod.BandedWavefront, "nw_distance", spy)

    t = bytes(rng.choice(list(b"ACGT"), 1000).tolist())
    sim = bytearray(t)
    for i in rng.choice(1000, 20, replace=False):
        sim[i] = rng.choice(list(b"ACGT"))
    want = edlib_tpu.align(bytes(sim), t)
    assert not calls, "similar pair must stay native"
    dis = bytes(rng.choice(list(b"ACGT"), 1000).tolist())
    got = edlib_tpu.align(dis, t)
    assert calls, "dissimilar pair must ride the wavefront"
    # Both answers match the oracle regardless of route.
    from edlib_tpu.oracle import edit_distance_simple
    assert want["editDistance"] == edit_distance_simple(
        np.frombuffer(bytes(sim), np.uint8), np.frombuffer(t, np.uint8),
        "NW")[0]
    assert got["editDistance"] == edit_distance_simple(
        np.frombuffer(dis, np.uint8), np.frombuffer(t, np.uint8), "NW")[0]


def test_nw_race_paths(rng, monkeypatch):
    """_nw_race: native wins on similar pairs; a hung device falls back
    to the uncapped native engine after the deadline; a device win is
    returned when the native side's budget cap makes it give up."""
    import importlib
    import time as _time

    align_mod = importlib.import_module("edlib_tpu.align")
    from edlib_tpu.oracle import edit_distance_simple

    t = bytes(rng.choice(list(b"ACGT"), 4000).tolist())
    sim = bytearray(t)
    for i in rng.choice(4000, 40, replace=False):
        sim[i] = rng.choice(list(b"ACGT"))
    sim = bytes(sim)
    dis = bytes(rng.choice(list(b"ACGT"), 4000).tolist())
    eq = np.eye(4, dtype=bool)

    def ids(s):
        lut = {65: 0, 67: 1, 71: 2, 84: 3}
        return np.array([lut[c] for c in s], np.uint8)

    want_sim = edit_distance_simple(
        np.frombuffer(sim, np.uint8), np.frombuffer(t, np.uint8), "NW")[0]
    want_dis = edit_distance_simple(
        np.frombuffer(dis, np.uint8), np.frombuffer(t, np.uint8), "NW")[0]

    # 1) Similar pair: native side is definitive before any device answer.
    monkeypatch.setattr(align_mod, "_nw_wavefront_run",
                        lambda *a, **kw: (_time.sleep(30), 0)[1])
    monkeypatch.setattr(align_mod, "_RACE_BASE_DEADLINE_S", 25.0)
    assert align_mod._nw_race(ids(sim), ids(t), eq,
                              align_mod._INF) == want_sim

    # 2) Dissimilar pair (native budget cap < distance -> gives up),
    #    device hung: the deadline fires and the uncapped native fallback
    #    still answers exactly.
    monkeypatch.setattr(align_mod, "_RACE_BASE_DEADLINE_S", 1.0)
    t0 = _time.monotonic()
    assert align_mod._nw_race(ids(dis), ids(t), eq,
                              align_mod._INF) == want_dis
    assert _time.monotonic() - t0 < 20  # did not wait out the sleep(30)

    # 3) Device answers while the native side has given up.
    monkeypatch.setattr(align_mod, "_nw_wavefront_run",
                        lambda *a, **kw: want_dis)
    monkeypatch.setattr(align_mod, "_RACE_BASE_DEADLINE_S", 60.0)
    assert align_mod._nw_race(ids(dis), ids(t), eq,
                              align_mod._INF) == want_dis


def test_align_nw_wavefront_route(rng, monkeypatch):
    """align() routes huge NW pairs to the banded wavefront; with the
    threshold lowered the two routes must agree exactly (incl. k and
    additionalEqualities)."""
    import edlib_tpu
    import importlib
    align_mod = importlib.import_module("edlib_tpu.align")
    t = bytes(rng.choice(list(b"ACGT"), 900).tolist())
    q = bytearray(t[:800])
    for i in rng.choice(800, 40, replace=False):
        q[i] = rng.choice(list(b"ACGTN"))
    q = bytes(q)
    eqs = [("N", "A"), ("N", "C"), ("N", "G"), ("N", "T")]
    want = edlib_tpu.align(q, t, additionalEqualities=eqs)
    want_k = edlib_tpu.align(q, t, k=want["editDistance"] - 1,
                             additionalEqualities=eqs)
    monkeypatch.setattr(align_mod, "_WAVEFRONT_MIN_CELLS", 1)
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    calls = []
    from edlib_tpu.ops import wavefront as wf_mod
    orig = wf_mod.BandedWavefront.nw_distance

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(wf_mod.BandedWavefront, "nw_distance", spy)
    got = edlib_tpu.align(q, t, additionalEqualities=eqs)
    assert got == want and calls
    got_k = edlib_tpu.align(q, t, k=want["editDistance"] - 1,
                            additionalEqualities=eqs)
    assert got_k == want_k
    # PATH must stay native: the distance is a small fraction of the
    # Hirschberg work and device dispatch only adds latency there.
    calls.clear()
    ref_path = edlib_tpu.align(q, t, task="path", additionalEqualities=eqs)
    assert not calls and ref_path["cigar"]


def test_shw_best_long_api(rng, monkeypatch):
    import edlib_tpu
    t = bytes(rng.choice(list(b"ACGT"), 600).tolist())
    q = bytearray(t[:300])
    for i in rng.choice(300, 20, replace=False):
        q[i] = rng.choice(list(b"ACGT"))
    q = bytes(q)
    ref = edlib_tpu.align(q, t, mode="SHW")
    want = (ref["editDistance"], ref["locations"][0][1])
    assert edlib_tpu.shw_best_long(q, t) == want            # native path
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    assert edlib_tpu.shw_best_long(q, t, backend="wavefront") == want
    assert edlib_tpu.shw_best_long(q, t, k=want[0] - 1) == (-1, -1)
    assert edlib_tpu.shw_best_long(b"", t) == (0, -1)
    # -1 padding-artifact head of the locations list (Q % 64 != 0, best==Q)
    q2, t2 = b"AAA", b"CCCCCC"
    ref2 = edlib_tpu.align(q2, t2, mode="SHW")
    want2 = (ref2["editDistance"], ref2["locations"][0][1])
    assert edlib_tpu.shw_best_long(q2, t2, backend="wavefront") == want2


def test_wavefront_column_cells(rng):
    """Device Hirschberg half-sweep: wavefront over target[:stop+1] with
    no wildcard extension leaves every word's state at the stop column —
    cells must equal the host engine's decode."""
    from edlib_tpu.ops.host import decode_cells, nw_run
    wf = Wavefront(chunk=32, interpret=True)
    for qlen, tlen in ((40, 100), (64, 64), (200, 333), (129, 257)):
        sigma = 4
        q = rng.randint(0, sigma, qlen).astype(np.uint8)
        t = rng.randint(0, sigma, tlen).astype(np.uint8)
        stop = tlen // 2 - 1
        hpeq = encode.build_peq_bigint(q, np.eye(sigma, dtype=bool))
        st, _, _ = nw_run(hpeq, t, qlen, stop=stop)
        want = decode_cells(st.Pv, st.Mv, qlen, boundary=stop + 1)
        got = wf.column_cells(q, t, sigma, stop)
        np.testing.assert_array_equal(got, np.asarray(want))


def test_device_path_hirschberg(rng, monkeypatch):
    """EDLIB_TPU_DEVICE_PATH=interpret: PATH through the device
    half-sweeps is byte-identical to the default native pipeline."""
    import edlib_tpu
    t = bytes(rng.choice(list(b"ACGT"), 2800).tolist())
    q = bytearray(t[:2600])
    for i in rng.choice(2600, 200, replace=False):
        q[i] = rng.choice(list(b"ACGT"))
    q = bytes(q)
    want = edlib_tpu.align(q, t, mode="NW", task="path")
    monkeypatch.setenv("EDLIB_TPU_DEVICE_PATH", "interpret")
    got = edlib_tpu.align(q, t, mode="NW", task="path")
    assert got == want


def test_banded_stream_handoff_geometry():
    """Property test of the phase-1 landing math across thousands of
    geometries: the greedy bucket walk must end at a step d with the
    window FULLY slid (base_of(d-1) == base_cap — the slide for step d
    happens at d's start, which phase 2 never executes) and d <= d_emit
    (no emission column missed)."""
    rng = np.random.RandomState(0)
    wfb = BandedWavefront()
    for _ in range(4000):
        qlen = int(rng.randint(64, 2_000_000))
        k = int(min(rng.choice([64, 128, 1000, 10_000, 100_000]), qlen))
        tlen_eff = min(int(qlen * rng.uniform(0.7, 1.5)), qlen + k)
        if qlen - k > tlen_eff:
            continue
        n_words = encode.num_words(qlen)
        band_words = (2 * k + 31) // 33 + 3
        R = wfb.r_min
        while R * 128 < band_words:
            R *= 2
        rows_all_q = -(-n_words // 128)
        R_full = max(SUB_MIN_ := 8, -(-rows_all_q // 8) * 8)
        R = min(R, R_full)
        WINW = R * 128
        w_pad = n_words * 32 - qlen
        t_scan = tlen_eff + w_pad
        n_steps_total = t_scan + n_words - 1
        base_cap = max(0, n_words - WINW)
        d_pin = 0 if base_cap == 0 else 33 * base_cap + 31 + k + 1
        c_emit = w_pad + max(0, qlen - 1 - k)
        d_emit = (n_words - 1) + c_emit
        if d_pin > d_emit:
            continue  # code path resets to the full window

        def base_of(d):
            return min(max((d + (-k) - 31) // 33, 0), base_cap)

        buckets = tuple(b for b in wfb._TAIL_BUCKETS
                        if b <= wfb.seg_steps) or (wfb.seg_steps,)
        d = 0
        steps = 0
        while d < d_pin:
            limit = min(d_emit, n_steps_total)
            b = next((b for b in buckets if d + b <= limit), None)
            if b is None:
                b = min(d_pin - d, wfb.seg_steps, max(1, limit - d))
            assert b >= 1
            d += b
            steps += 1
            assert steps < 10_000, "walk does not terminate"
        assert d <= d_emit, (qlen, k, d, d_emit)
        assert base_of(d - 1) == base_cap, (qlen, k, d, d_pin)
