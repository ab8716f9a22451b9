"""Mesh-wired public APIs on the 8-device virtual CPU mesh.

VERDICT r1 items 3 & 5: align_batch(mesh=)/map_reads(mesh=) must equal the
single-device path exactly (location lists included), with the merge done
on device; the pipelined (Pv, Mv, score) carry hand-off across "sp" must
reproduce the single-device resumable sweep.
"""

import jax
import numpy as np
import pytest

from edlib_tpu import align, align_batch, encode, map_reads
from edlib_tpu.ops import jax_engine
from edlib_tpu.parallel import (
    make_alignment_mesh,
    pipelined_sweep_summaries,
    split_target_segments,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _mutate(rng, s, rate=0.1):
    out = bytearray()
    for c in s:
        r = rng.rand()
        if r < rate * 0.4:
            continue
        out.append(rng.choice(list(b"ACGT")) if r < rate * 0.7 else c)
    return bytes(out)


@pytest.fixture(scope="module")
def workload():
    rng = np.random.RandomState(9)
    target = bytes(rng.choice(list(b"ACGT"), 700).tolist())
    reads = []
    for i in range(12):
        start = rng.randint(0, 600)
        reads.append(_mutate(rng, target[start:start + 40 + rng.randint(20)]))
    reads.append(bytes(rng.choice(list(b"ACGT"), 50).tolist()))  # random
    return reads, target


@pytest.mark.parametrize("task", ["distance", "locations", "path"])
def test_align_batch_mesh_hw_shared(workload, task):
    """Shared-target HW: sp-halo sharding + device location merge == the
    single-device path, including full end-location lists and starts."""
    reads, target = workload
    mesh = make_alignment_mesh(8, dp=2, sp=4)
    got = align_batch(reads, target, mode="HW", task=task, mesh=mesh)
    for q, r in zip(reads, got):
        assert r == align(q, target, mode="HW", task=task)


@pytest.mark.parametrize("mode", ["NW", "SHW", "HW"])
def test_align_batch_mesh_dp(workload, mode):
    """Per-pair targets: dp sharding over the whole mesh, all modes."""
    rng = np.random.RandomState(3)
    reads, _ = workload
    targets = [bytes(rng.choice(list(b"ACGT"), 300).tolist())
               for _ in reads]
    mesh = make_alignment_mesh(8, dp=4, sp=2)
    got = align_batch(reads, targets, mode=mode, task="locations", mesh=mesh)
    for q, t, r in zip(reads, targets, got):
        assert r == align(q, t, mode=mode, task="locations")


def test_align_batch_auto_mesh(workload, monkeypatch):
    """With multiple devices and no explicit mesh, semiglobal align_batch
    auto-shards (EDLIB_TPU_AUTO_MESH=1 lifts the TPU-only gate on the
    virtual CPU mesh); results equal the single-device path and NW stays
    on the banded kernel (no mesh built)."""
    import edlib_tpu.mapping as mapping_mod

    monkeypatch.setenv("EDLIB_TPU_AUTO_MESH", "1")
    monkeypatch.setenv("EDLIB_TPU_AUTO_MESH_MIN_CELLS", "1")
    # Reach the device driver on CPU (the auto backend routes small
    # CPU-only batches to the host engines before the auto-mesh hook).
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    reads, target = workload
    built = []
    orig = mapping_mod._auto_mesh

    def spy(cells):
        m = orig(cells)
        built.append(m)
        return m

    monkeypatch.setattr(mapping_mod, "_auto_mesh", spy)
    import edlib_tpu.batch as batch_mod
    got = align_batch(reads, target, mode="HW", task="locations")
    assert built and built[0] is not None, "auto mesh did not engage"
    for q, r in zip(reads, got):
        assert r == align(q, target, mode="HW", task="locations")
    built.clear()
    align_batch(reads, [target[:300]] * len(reads), mode="NW",
                task="distance")
    assert not built, "NW must not auto-mesh (banded kernel wins)"


@pytest.mark.slow
def test_align_batch_mesh_with_k(workload):
    reads, target = workload
    mesh = make_alignment_mesh(8, dp=2, sp=4)
    for k in (0, 5, 17):
        got = align_batch(reads, target, mode="HW", task="locations", k=k,
                          mesh=mesh)
        for q, r in zip(reads, got):
            assert r == align(q, target, mode="HW", task="locations", k=k)


def test_map_reads_mesh(workload):
    reads, target = workload
    mesh = make_alignment_mesh(8, dp=2, sp=4)
    best_m, pos_m = map_reads(reads, target, mode="HW", mesh=mesh)
    best_s, pos_s = map_reads(reads, target, mode="HW")
    np.testing.assert_array_equal(best_m, best_s)
    np.testing.assert_array_equal(pos_m, pos_s)


@pytest.mark.parametrize("hin0", [0, 1])
def test_pipelined_carry_handoff(hin0):
    """Sequential (Pv, Mv, score) shard hand-off over "sp" == the
    single-device sweep, including the in-carry reductions."""
    rng = np.random.RandomState(4)
    sigma, B = 4, 4
    eq = np.eye(sigma, dtype=bool)
    qlens = [30, 32, 45, 64]
    nw = encode.num_words(max(qlens))
    T = 530
    target = rng.randint(0, sigma, T).astype(np.int32)
    peq = np.zeros((2, B, sigma + 1, nw), np.uint32)
    lo = np.zeros((2, B), np.int32)
    hi = np.zeros((2, B), np.int32)
    queries = []
    for m in range(2):
        for b in range(B):
            q = rng.randint(0, sigma, qlens[b]).astype(np.uint8)
            queries.append(q)
            peq[m, b] = encode.build_peq_words(q, eq, n_words=nw)
            lo[m, b] = nw * 32 - qlens[b]
            hi[m, b] = lo[m, b] + T
    w_max = int(lo.max())
    mesh = make_alignment_mesh(8, dp=1, sp=8)
    segs, Lseg = split_target_segments(target, sigma, 8, w_max)
    out = pipelined_sweep_summaries(mesh, peq, segs, lo, hi, hin0=hin0)
    for m in range(2):
        for b in range(B):
            w = int(lo[m, b])
            tg = np.full((1, T + w), sigma, np.int32)
            tg[0, :T] = target
            stream = np.asarray(jax_engine.sweep_scores(
                peq[m, b][None], tg, hin0=hin0))[0, w:]
            pos = np.nonzero(stream == stream.min())[0]
            assert out[m, b, 0] == stream.min()
            assert out[m, b, 1] - w == pos[0]
            assert out[m, b, 2] - w == pos[-1]
            assert out[m, b, 3] == stream[-1]


@pytest.mark.slow
def test_mesh_scaling_harness_dryrun(capsys):
    """scripts/mesh_scaling.py runs end-to-end on the virtual 8-device mesh
    (the command that produces the scaling table on real hardware),
    emitting one valid JSON row per shape with exact results."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import mesh_scaling

    rc = mesh_scaling.main(["--platform", "cpu", "--reads-per-dev", "8",
                            "--qlen", "32", "--tlen-per-dev", "1024",
                            "--trials", "1", "--shapes", "1x1,2x1,1x2",
                            "--verify"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert rows[0].get("plain")          # mesh-tax reference row first
    rows = rows[1:]
    assert [(r["dp"], r["sp"]) for r in rows] == [(1, 1), (2, 1), (1, 2)]
    assert "mesh_tax" in rows[0]
    for r in rows:
        assert r["reads_per_s"] > 0
        assert "scaling_efficiency" in r
