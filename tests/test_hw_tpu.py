"""On-hardware TPU regression tests.

The pytest process is pinned to CPU (conftest), so every hardware check
runs in a SUBPROCESS that gets the real TPU backend — which also means a
wedged TPU tunnel (a known failure mode of this environment) times the
child out and the test SKIPS instead of hanging the suite.  A session probe
auto-skips the whole module when no healthy chip is reachable.

These are the automated counterparts of the ad-hoc hardware validations in
docs/PERF.md: each child computes on the chip and prints JSON; the parent
recomputes truth with the host engines (reference semantics,
edlib.cpp:550-928) and compares exactly.

Set EDLIB_TPU_SKIP_HW_TESTS=1 to disable (e.g. CI without a TPU).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD_PRELUDE = r"""
import json, sys
import numpy as np
import jax
from edlib_tpu.utils.jaxcache import ensure_compile_cache
ensure_compile_cache()  # shared persistent cache (~/.cache/edlib_tpu)
assert jax.default_backend() == "tpu", jax.default_backend()
"""


def _run_child(code: str, timeout: float) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "EDLIB_TPU_FORCE_PALLAS",
                        "EDLIB_TPU_DISABLE_DEVICE")}
    # Prepend (not overwrite): the ambient PYTHONPATH carries the TPU
    # plugin's sitecustomize in this environment.
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-c", _CHILD_PRELUDE + code],
                          cwd=_REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)


def _child_json(code: str, timeout: float):
    """Run a TPU child; skip on tunnel trouble, fail on wrong output."""
    try:
        r = _run_child(code, timeout)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU child timed out (tunnel wedged?)")
    if r.returncode != 0:
        pytest.fail(f"TPU child failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="session")
def tpu_ok():
    if os.environ.get("EDLIB_TPU_SKIP_HW_TESTS"):
        pytest.skip("hardware tests disabled via EDLIB_TPU_SKIP_HW_TESTS")
    probe = 'x = jax.numpy.ones((128, 128)); print(json.dumps({"s": float((x @ x).sum())}))'
    # Two short probes (like bench.py's): a wedged tunnel costs the CPU-only
    # suite 2 minutes, not 7 — wedges last hours, so waiting longer here
    # never converts a skip into a pass.
    last_err = "timed out"
    for _ in range(2):
        try:
            r = _run_child(probe, timeout=60)
        except subprocess.TimeoutExpired:
            continue
        if r.returncode == 0:
            assert (json.loads(r.stdout.strip().splitlines()[-1])["s"]
                    == 128.0 * 128 * 128)
            return
        last_err = r.stderr[-400:]
    pytest.skip(f"TPU probe failed — no healthy chip: {last_err}")


def _gen_pairs(seed=7, n=48):
    """Deterministic mixed workload (regenerated identically in the child)."""
    rng = np.random.RandomState(seed)
    queries, targets = [], []
    for i in range(n):
        qlen = int(rng.randint(20, 90))
        tlen = int(rng.randint(40, 400))
        q = rng.randint(0, 4, qlen)
        if i % 3 == 0:
            t = np.concatenate([rng.randint(0, 4, 17), q,
                                rng.randint(0, 4, max(tlen - qlen - 17, 1))])
        else:
            t = rng.randint(0, 4, tlen)
        queries.append(bytes(bytearray(b"ACGT"[c] for c in q)))
        targets.append(bytes(bytearray(b"ACGT"[c] for c in t)))
    return queries, targets


def test_hw_align_batch_parity(tpu_ok):
    """Batched Pallas kernels (reduce, hit-bitmask, banded NW) on the chip
    vs per-pair host truth — all modes, distance+locations, several k."""
    code = r"""
from tests.test_hw_tpu import _gen_pairs
from edlib_tpu.batch import align_batch_device
queries, targets = _gen_pairs()
out = []
for mode in ("NW", "HW", "SHW"):
    for task in ("distance", "locations"):
        for k in (-1, 8):
            out.append(align_batch_device(queries, targets, mode=mode,
                                          task=task, k=k))
print(json.dumps(out))
"""
    got = _child_json(code, timeout=900)
    from edlib_tpu import align
    queries, targets = _gen_pairs()
    i = 0
    for mode in ("NW", "HW", "SHW"):
        for task in ("distance", "locations"):
            for k in (-1, 8):
                want = [align(q, t, mode=mode, task=task, k=k)
                        for q, t in zip(queries, targets)]
                # JSON round-trip: tuples become lists
                want = [{**w, "locations": [list(p) for p in w["locations"]]}
                        for w in want]
                assert got[i] == want, (mode, task, k)
                i += 1


def test_hw_map_reads_shared_target(tpu_ok):
    """Shared-target in-kernel reduction on the chip vs host best/first."""
    code = r"""
from edlib_tpu.mapping import map_reads
rng = np.random.RandomState(11)
target = bytes(bytearray(b"ACGT"[c] for c in rng.randint(0, 4, 4096)))
reads = []
for _ in range(64):
    s = int(rng.randint(0, 4096 - 120))
    arr = bytearray(target[s:s + 120])
    for p in rng.choice(120, 6, replace=False):
        arr[p] = b"ACGT"[int(rng.randint(4))]
    reads.append(bytes(arr))
best, pos = map_reads(reads, target, mode="HW")
print(json.dumps([best.tolist(), pos.tolist()]))
"""
    got = _child_json(code, timeout=900)
    from edlib_tpu import align
    rng = np.random.RandomState(11)
    target = bytes(bytearray(b"ACGT"[c] for c in rng.randint(0, 4, 4096)))
    for i in range(64):
        s = int(rng.randint(0, 4096 - 120))
        arr = bytearray(target[s:s + 120])
        for p in rng.choice(120, 6, replace=False):
            arr[p] = b"ACGT"[int(rng.randint(4))]
        want = align(bytes(arr), target, mode="HW", task="locations")
        assert got[0][i] == want["editDistance"], i
        assert got[1][i] == want["locations"][0][1], i


def test_hw_wavefront_long_pair(tpu_ok):
    """Single-pair wavefront kernels (unbanded + banded + SHW best) on the
    chip vs the host/native engines."""
    code = r"""
from edlib_tpu.ops.wavefront import BandedWavefront, Wavefront
rng = np.random.RandomState(13)
q = rng.randint(0, 4, 3000).astype(np.uint8)
mut = rng.uniform(size=3000) < 0.06
t = np.where(mut, rng.randint(0, 4, 3000), q).astype(np.uint8)
wf = Wavefront()
wfb = BandedWavefront()
d_unb = wf.nw_distance(q, t, 4)
d_band = wfb.nw_distance(q, t, 4, k=-1)
b, p = wfb.shw_best(q, t[:2500], 4, k=-1)
print(json.dumps({"unb": int(d_unb), "band": int(d_band),
                  "shw": [int(b), int(p)]}))
"""
    got = _child_json(code, timeout=900)
    from edlib_tpu import align
    rng = np.random.RandomState(13)
    q = rng.randint(0, 4, 3000).astype(np.uint8)
    mut = rng.uniform(size=3000) < 0.06
    t = np.where(mut, rng.randint(0, 4, 3000), q).astype(np.uint8)
    qb = bytes(bytearray(b"ACGT"[c] for c in q))
    tb = bytes(bytearray(b"ACGT"[c] for c in t))
    want_nw = align(qb, tb, mode="NW")["editDistance"]
    want_shw = align(qb, tb[:2500], mode="SHW", task="locations")
    assert got["unb"] == want_nw
    assert got["band"] == want_nw
    assert got["shw"][0] == want_shw["editDistance"]
    assert got["shw"][1] == want_shw["locations"][0][1]


def test_hw_banded_stream_and_column_cells(tpu_ok):
    """Round-2 kernels on the chip: banded SHW all-locations (pinned-tail
    stream) and the Hirschberg column capture — vs host truth."""
    code = r"""
from edlib_tpu.ops.wavefront import BandedWavefront, Wavefront
rng = np.random.RandomState(17)
q = rng.randint(0, 4, 2600).astype(np.uint8)
mut = rng.uniform(size=2600) < 0.05
t0 = np.where(mut, rng.randint(0, 4, 2600), q).astype(np.uint8)
t = np.concatenate([t0, rng.randint(0, 4, 300).astype(np.uint8)])
wfb = BandedWavefront()
best, locs = wfb.shw_locations(q, t, 4, k=-1)
wf = Wavefront()
cells = wf.column_cells(q, t, 4, stop=1400)
print(json.dumps({"best": int(best), "locs": [int(x) for x in locs],
                  "cells": [int(c) for c in cells[::97]]}))
"""
    got = _child_json(code, timeout=900)
    from edlib_tpu import encode
    from edlib_tpu.align import _filter_locations, _INF
    from edlib_tpu.ops import host as host_engine
    from edlib_tpu.ops.host import decode_cells, nw_run
    rng = np.random.RandomState(17)
    q = rng.randint(0, 4, 2600).astype(np.uint8)
    mut = rng.uniform(size=2600) < 0.05
    t0 = np.where(mut, rng.randint(0, 4, 2600), q).astype(np.uint8)
    t = np.concatenate([t0, rng.randint(0, 4, 300).astype(np.uint8)])
    hpeq = encode.build_peq_bigint(q, np.eye(4, dtype=bool))
    hs = host_engine.semiglobal_scores(hpeq, t, 2600, "SHW")
    want_best, want_locs = _filter_locations(hs, 2600, _INF)
    assert got["best"] == want_best
    assert got["locs"] == [int(x) for x in want_locs]
    st, _, _ = nw_run(hpeq, t, 2600, stop=1400)
    want_cells = np.asarray(decode_cells(st.Pv, st.Mv, 2600, boundary=1401))
    np.testing.assert_array_equal(np.asarray(got["cells"]),
                                  want_cells[::97])


def test_hw_large_alphabet_shared(tpu_ok):
    """Protein-alphabet (sigma=26) shared-target mapping on the chip —
    the scalar-indexed Eq rows have no select chain."""
    code = r"""
from edlib_tpu.mapping import map_reads
AA = b"ACDEFGHIKLMNPQRSTVWYBZXJUO"
rng = np.random.RandomState(19)
target = bytes(AA[c] for c in rng.randint(0, 26, 4096))
reads = []
for _ in range(32):
    s = int(rng.randint(0, 4096 - 100))
    arr = bytearray(target[s:s + 100])
    for p in rng.choice(100, 5, replace=False):
        arr[p] = AA[int(rng.randint(26))]
    reads.append(bytes(arr))
best, pos = map_reads(reads, target, mode="HW")
print(json.dumps([best.tolist(), pos.tolist()]))
"""
    got = _child_json(code, timeout=900)
    from edlib_tpu import align
    AA = b"ACDEFGHIKLMNPQRSTVWYBZXJUO"
    rng = np.random.RandomState(19)
    target = bytes(AA[c] for c in rng.randint(0, 26, 4096))
    for i in range(32):
        s = int(rng.randint(0, 4096 - 100))
        arr = bytearray(target[s:s + 100])
        for p in rng.choice(100, 5, replace=False):
            arr[p] = AA[int(rng.randint(26))]
        want = align(bytes(arr), target, mode="HW", task="locations")
        assert got[0][i] == want["editDistance"], i
        assert got[1][i] == want["locations"][0][1], i


def _gen_shw_pairs():
    """Multi-word SHW workload: 2kbp queries vs prefix-similar targets
    (banded ladder + banded hits + banded reversed-SHW start locations)."""
    rng = np.random.RandomState(23)
    queries, targets = [], []
    for i in range(12):
        q = rng.randint(0, 4, 2000 + 16 * i)
        keep = rng.uniform(size=len(q)) >= 0.02
        t_core = np.where(rng.uniform(size=len(q)) < 0.03,
                          rng.randint(0, 4, len(q)), q)[keep]
        t = np.concatenate([t_core, rng.randint(0, 4, 300)])
        queries.append(bytes(bytearray(b"ACGT"[c] for c in q)))
        targets.append(bytes(bytearray(b"ACGT"[c] for c in t)))
    return queries, targets


def test_hw_shw_banded_batch(tpu_ok):
    """Banded SHW reduce/hits + banded reversed-SHW start locations on the
    chip (sliding word window, n_win < n_words) vs per-pair host truth."""
    code = r"""
from tests.test_hw_tpu import _gen_shw_pairs
from edlib_tpu.batch import align_batch_device
queries, targets = _gen_shw_pairs()
out = [align_batch_device(queries, targets, mode="SHW", task="locations",
                          k=-1),
       align_batch_device(queries, targets, mode="HW", task="locations",
                          k=-1)]
print(json.dumps(out))
"""
    got = _child_json(code, timeout=900)
    from edlib_tpu import align
    queries, targets = _gen_shw_pairs()
    for m, mode in enumerate(("SHW", "HW")):
        want = [align(q, t, mode=mode, task="locations")
                for q, t in zip(queries, targets)]
        want = [{**w, "locations": [list(p) for p in w["locations"]]}
                for w in want]
        assert got[m] == want, mode


def test_hw_mesh_kernel_engine(tpu_ok):
    """Pallas kernels under shard_map on the real chip: a 1-device mesh
    resolves engine='pallas' (all-TPU), so align_batch(mesh=) exercises
    Mosaic inside the manual mesh context — vs per-pair host truth."""
    code = r"""
from edlib_tpu import align_batch
from edlib_tpu.parallel import make_alignment_mesh
from tests.test_hw_tpu import _gen_pairs
queries, targets = _gen_pairs(seed=29, n=16)
mesh = make_alignment_mesh(1, dp=1, sp=1)
out = [align_batch(queries, targets, mode=m, task="locations", mesh=mesh)
       for m in ("NW", "HW", "SHW")]
print(json.dumps(out))
"""
    got = _child_json(code, timeout=900)
    from edlib_tpu import align
    queries, targets = _gen_pairs(seed=29, n=16)
    for m, mode in enumerate(("NW", "HW", "SHW")):
        want = [align(q, t, mode=mode, task="locations")
                for q, t in zip(queries, targets)]
        want = [{**w, "locations": [list(p) for p in w["locations"]]}
                for w in want]
        assert got[m] == want, mode


def test_hw_shared_target_banded_kernels(tpu_ok):
    """SHARED-target banded kernels must LOWER and run on the chip: the
    shared branch of _fetch_eq_win once did a dynamic_slice on a loaded
    value, which Mosaic cannot lower — interpret-mode tests (CPU) never
    exercise lowering, and the crash only surfaced in the CLI byte-diff
    drive (NW/SHW over one shared target, nw_b >= band threshold)."""
    code = r"""
from tests.test_hw_tpu import _gen_shared_banded
from edlib_tpu.batch import align_batch_device
queries, target = _gen_shared_banded()
targets = [target] * len(queries)           # SAME object: shared bucket
out = [align_batch_device(queries, targets, mode="NW", task="distance"),
       align_batch_device(queries, targets, mode="SHW", task="locations")]
print(json.dumps(out))
"""
    got = _child_json(code, timeout=900)
    from edlib_tpu import align
    queries, target = _gen_shared_banded()
    for m, (mode, task) in enumerate((("NW", "distance"),
                                      ("SHW", "locations"))):
        want = [align(q, target, mode=mode, task=task) for q in queries]
        want = [{**w, "locations": [list(p) for p in w["locations"]]}
                for w in want]
        assert got[m] == want, mode


def _gen_shared_banded():
    """8 queries of ~300bp (nw_b = 16 >= band threshold) vs ONE shared
    2kbp target — routes through the shared-target banded kernels."""
    rng = np.random.RandomState(17)
    t = rng.choice(list(b"ACGT"), 2000).astype(np.uint8)
    queries = []
    for i in range(8):
        s = rng.randint(0, len(t) - 300)
        q = t[s:s + 300].copy()
        muts = rng.rand(300) < 0.05
        q[muts] = rng.choice(list(b"ACGT"), muts.sum())
        queries.append(q.tobytes())
    return queries, t.tobytes()


def test_hw_kernel_variant_lowering(tpu_ok):
    """Kernel variants that no other on-chip path exercises must LOWER
    and run exactly on the real device (the shared-banded Mosaic crash
    showed interpret-only coverage hides lowering gaps): the resumable
    reduce (multi-chip carry pipelines), bitplane want_hits, and the
    legacy eq-stream want_hits."""
    code = open(os.path.join(_REPO, "tests", "data_hw_variant_probe.py")
                ).read()
    got = _child_json(code, timeout=900)
    assert got == {"resumable": True, "bitplane_hits": True,
                   "eqstream_hits": True}, got
