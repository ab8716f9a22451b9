"""map_reads fast path vs the full align() contract."""

import numpy as np
import pytest

from edlib_tpu import align
from edlib_tpu.mapping import map_reads


def reference_first(read, target, mode, k):
    res = align(read, target, mode=mode, k=k)
    if res["editDistance"] < 0:
        return -1, -1
    return res["editDistance"], res["locations"][0][1]


@pytest.mark.parametrize("mode", ["HW", "SHW"])
def test_map_reads_matches_align(mode, rng):
    target = bytes(rng.choice(list(b"ACGT"), 800).tolist())
    reads = []
    for _ in range(20):
        qlen = rng.randint(10, 120)
        s = rng.randint(0, 800 - qlen)
        r = np.frombuffer(target[s:s + qlen], np.uint8).copy()
        muts = rng.rand(qlen) < 0.1
        r[muts] = rng.choice(list(b"ACGT"), muts.sum())
        reads.append(r.tobytes())
    reads.append(b"Z" * 30)  # matches nothing: best == qlen, pos == -1
    for k in (-1, 5):
        best, pos = map_reads(reads, target, mode=mode, k=k)
        for i, r in enumerate(reads):
            want = reference_first(r, target, mode, k)
            assert (best[i], pos[i]) == want, (i, r[:20], k)


def test_map_reads_device_path_interpret(rng, monkeypatch):
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    target = bytes(rng.choice(list(b"ACGT"), 200).tolist())
    reads = [target[20:80], target[100:164], b"T" * 33]
    best, pos = map_reads(reads, target, mode="HW")
    for i, r in enumerate(reads):
        want = reference_first(r, target, "HW", -1)
        assert (best[i], pos[i]) == want, i


def test_map_reads_auto_mesh(rng, monkeypatch):
    """With multiple devices and no explicit mesh, map_reads auto-builds
    the ("dp","sp") mesh (EDLIB_TPU_AUTO_MESH=1 lifts the TPU-only gate
    so the virtual 8-device CPU mesh exercises it) — results equal the
    explicit-mesh and host paths."""
    import edlib_tpu.mapping as mapping_mod
    from edlib_tpu.parallel import make_alignment_mesh

    monkeypatch.setenv("EDLIB_TPU_AUTO_MESH", "1")
    monkeypatch.setenv("EDLIB_TPU_AUTO_MESH_MIN_CELLS", "1")
    target = bytes(rng.choice(list(b"ACGT"), 20000).tolist())
    reads = []
    for _ in range(16):
        s = rng.randint(0, 20000 - 100)
        r = np.frombuffer(target[s:s + 100], np.uint8).copy()
        muts = rng.rand(100) < 0.05
        r[muts] = rng.choice(list(b"ACGT"), muts.sum())
        reads.append(r.tobytes())

    built = []
    orig = mapping_mod._map_reads_sharded

    def spy(read_ids, t_ids, sigma, mesh):
        built.append(tuple(mesh.devices.shape))
        return orig(read_ids, t_ids, sigma, mesh)

    monkeypatch.setattr(mapping_mod, "_map_reads_sharded", spy)
    best, pos = map_reads(reads, target, mode="HW")
    assert built and np.prod(built[0]) > 1, "auto mesh did not engage"
    want_b, want_p = map_reads(reads, target, mode="HW",
                               mesh=make_alignment_mesh())
    assert np.array_equal(best, want_b) and np.array_equal(pos, want_p)
    for i, r in enumerate(reads):
        assert (best[i], pos[i]) == reference_first(r, target, "HW", -1), i
    # "0" disables entirely.
    built.clear()
    monkeypatch.setenv("EDLIB_TPU_AUTO_MESH", "0")
    map_reads(reads, target, mode="HW")
    assert not built


def test_map_reads_edges():
    best, pos = map_reads([], b"ACGT")
    assert best.shape == (0,)
    best, pos = map_reads([b"AC"], b"")
    assert best[0] == 2 and pos[0] == -1
    with pytest.raises(ValueError):
        map_reads([b"AC"], b"ACGT", mode="NW")


def test_map_reads_fused_fallback(rng, monkeypatch):
    """Stragglers the q-gram filter cannot resolve route through the
    IN-JIT segmented fallback of the fused path (mapping._fused_filter_fn)
    and stay exact — starving maxc forces unresolved reads, so wrong
    results here would mean the fallback never ran."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "1")       # force the filter on
    monkeypatch.setenv("EDLIB_TPU_QFILTER_MAXC", "1")  # starve candidates
    tlen = 6000
    target = bytes(rng.choice(list(b"ACGT"), tlen).tolist())
    tb = np.frombuffer(target, np.uint8)
    reads = []
    for _ in range(12):
        s = rng.randint(0, tlen - 80)
        r = tb[s:s + 80].copy()
        muts = rng.rand(80) < 0.08
        r[muts] = rng.choice(list(b"ACGT"), muts.sum())
        reads.append(r.tobytes())
    reads.append(b"ACGT" * 20)   # repetitive: many passing windows
    from edlib_tpu import mapping as mp
    calls = []
    orig = mp._map_reads_fused

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(mp, "_map_reads_fused", spy)
    best, pos = map_reads(reads, target, mode="HW")
    assert calls, "fused filter path was not exercised"
    for i, r in enumerate(reads):
        want = reference_first(r, target, "HW", -1)
        assert (best[i], pos[i]) == want, i


def test_map_reads_fused_overflow_to_shared_sweep(rng, monkeypatch):
    """More unresolved reads than the in-jit fallback's fixed width route
    through the host-side shared sweep — exactness preserved."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "1")
    monkeypatch.setenv("EDLIB_TPU_QFILTER_MAXC", "1")
    from edlib_tpu import mapping as mp
    monkeypatch.setattr(mp, "_SEG_FB_B", 2)  # overflow with 3+ stragglers
    tlen = 6000
    target = bytes(rng.choice(list(b"ACGT"), tlen).tolist())
    tb = np.frombuffer(target, np.uint8)
    reads = []
    for _ in range(6):
        s = rng.randint(0, tlen - 80)
        r = tb[s:s + 80].copy()
        muts = rng.rand(80) < 0.08
        r[muts] = rng.choice(list(b"ACGT"), muts.sum())
        reads.append(r.tobytes())
    for _ in range(4):           # repetitive: many passing windows each
        reads.append(b"ACGT" * 20)
        reads.append(b"AAAA" * 20)
    best, pos = map_reads(reads, target, mode="HW")
    for i, r in enumerate(reads):
        want = reference_first(r, target, "HW", -1)
        assert (best[i], pos[i]) == want, i


def test_map_reads_shw_pruned_ladder(rng, monkeypatch):
    """SHW prefix-slice pruning (mapping._map_reads_shw_pruned): resolved
    reads come from the first qmax+r columns; unresolved reads climb the
    doubling ladder; results match the per-read reference, k semantics
    included."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    tlen = 4000
    target = bytes(rng.choice(list(b"ACGT"), tlen).tolist())
    tb = np.frombuffer(target, np.uint8)
    reads = []
    for i in range(8):
        r = tb[:70].copy()                 # prefix-anchored (low best)
        muts = rng.rand(70) < 0.06
        r[muts] = rng.choice(list(b"ACGT"), muts.sum())
        reads.append(r.tobytes())
    for _ in range(4):                     # random (high best -> ladder)
        reads.append(bytes(rng.choice(list(b"ACGT"), 70).tolist()))
    from edlib_tpu import mapping as mp
    calls = []
    orig = mp._map_reads_shw_pruned

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(mp, "_map_reads_shw_pruned", spy)
    for k in (-1, 8, 0):
        best, pos = map_reads(reads, target, mode="SHW", k=k)
        for i, r in enumerate(reads):
            want = reference_first(r, target, "SHW", k)
            assert (best[i], pos[i]) == want, (k, i)
    assert calls, "SHW pruned path was not exercised"


def test_map_reads_target_caches_reused(rng, monkeypatch):
    """Repeated map_reads calls against ONE target reuse the cached
    alphabet transform, q-gram index, and tuner verdict (real mapping
    streams many read batches against one reference) — and fresh batches
    stay exact."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "1")
    from edlib_tpu import mapping as mp
    from edlib_tpu.ops import qfilter as qf
    builds = []
    orig = qf.build_target_index

    def spy(*a, **kw):
        builds.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(qf, "build_target_index", spy)
    mp._INDEX_CACHE.clear()
    mp._TMAP_CACHE.clear()
    tlen = 4000
    target = bytes(rng.choice(list(b"ACGT"), tlen).tolist())
    tb = np.frombuffer(target, np.uint8)

    def batch():
        reads = []
        for _ in range(8):
            s = rng.randint(0, tlen - 80)
            r = tb[s:s + 80].copy()
            muts = rng.rand(80) < 0.05
            r[muts] = rng.choice(list(b"ACGT"), muts.sum())
            reads.append(r.tobytes())
        return reads

    r1 = batch()
    map_reads(r1, target, mode="HW")
    n_first = len(builds)
    assert n_first >= 1
    r2 = batch()
    best, pos = map_reads(r2, target, mode="HW")
    assert len(builds) == n_first, "target index was rebuilt on call 2"
    for i, r in enumerate(r2):
        want = reference_first(r, target, "HW", -1)
        assert (best[i], pos[i]) == want, i


def test_map_reads_fused_big_sigma(rng, monkeypatch):
    """Alphabets past the select cap (sigma > 62) take the fused
    single-dispatch filter path too (bit-plane verify + bit-plane in-jit
    fallback) — exact vs the per-read reference."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    monkeypatch.setenv("EDLIB_TPU_QFILTER", "1")
    sigma, tlen = 100, 5000
    t = rng.randint(0, sigma, tlen).astype(np.int32)
    target = bytes(bytearray(int(c) for c in t))
    reads = []
    for i in range(10):
        if i % 4 == 3:
            r = rng.randint(0, sigma, 60)
        else:
            s = rng.randint(0, tlen - 60)
            r = t[s:s + 60].copy()
            muts = rng.rand(60) < 0.05
            r[muts] = rng.randint(0, sigma, muts.sum())
        reads.append(bytes(bytearray(int(c) for c in r)))
    from edlib_tpu import mapping as mp
    calls = []
    orig = mp._map_reads_fused

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(mp, "_map_reads_fused", spy)
    best, pos = map_reads(reads, target, mode="HW")
    assert calls, "big-sigma batch did not take the fused path"
    for i, r in enumerate(reads):
        want = reference_first(r, target, "HW", -1)
        assert (best[i], pos[i]) == want, i
