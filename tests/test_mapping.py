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


def test_map_reads_edges():
    best, pos = map_reads([], b"ACGT")
    assert best.shape == (0,)
    best, pos = map_reads([b"AC"], b"")
    assert best[0] == 2 and pos[0] == -1
    with pytest.raises(ValueError):
        map_reads([b"AC"], b"ACGT", mode="NW")
