"""Value-adaptive banded HW reduce kernel (interpret mode).

Contract (reference band rules, edlib.cpp:601-642, 657-674, at G-column
granularity): for every lane whose true best score is <= k the kernel's
(best, first-pos, last-pos) are exact; lanes whose best exceeds k may emit
any value > k (the host ladder retries).  k is a DYNAMIC scalar — one
compiled kernel serves the whole k-doubling ladder.

Truth comes from the host bigint engine (tested byte-exact elsewhere).
"""

import numpy as np
import pytest

from edlib_tpu import encode
from edlib_tpu.ops import host as host_engine
from edlib_tpu.ops.pallas_kernel import PallasSweeper, adaptive_classes

SIGMA = 4


def _planted_reads(rng, target, qlen, n, rate):
    reads = []
    for _ in range(n):
        start = rng.randint(0, len(target) - qlen)
        r = target[start:start + qlen].copy()
        muts = rng.rand(qlen) < rate
        r[muts] = rng.randint(0, SIGMA, muts.sum())
        reads.append(r.astype(np.uint8))
    return reads


def test_adaptive_classes_shape():
    assert adaptive_classes(1) == [1]
    assert adaptive_classes(4) == [1, 2, 3, 4]
    cs = adaptive_classes(16)
    assert cs[0] == 1 and cs[-1] == 16 and cs == sorted(set(cs))


@pytest.mark.parametrize("qlen,tlen,chunk,strong", [
    (100, 700, 64, 4),    # 4 words, strong reduce active
    (120, 1000, 64, 0),   # strong reduce disabled: cheap rules only
    (40, 700, 32, 2),     # 2 words, small chunk
])
def test_adaptive_hw_reduce_exact(rng, qlen, tlen, chunk, strong):
    B = 5
    target = rng.randint(0, SIGMA, tlen).astype(np.int32)
    nw = encode.num_words(qlen)
    W = nw * 32 - qlen
    eq = np.eye(SIGMA, dtype=bool)
    reads = _planted_reads(rng, target, qlen, B, 0.06)
    peq = np.stack([encode.build_peq_words(r, eq, n_words=nw)
                    for r in reads])
    t_scan = np.concatenate([target, np.full(W, SIGMA, np.int32)])
    lo = np.full(B, W, np.int32)
    hi = np.full(B, W + tlen, np.int32)
    sw = PallasSweeper(chunk=chunk, interpret=True)
    for k in (6, 12, 200):
        best, pf, pl = sw.reduce_hw_adaptive(
            peq, t_scan, lo, hi, k, hin0=0, group=8,
            strong_every=strong, shared=True)
        for b in range(B):
            hp = encode.build_peq_bigint(reads[b], eq)
            hs = host_engine.semiglobal_scores(hp, target, qlen, "HW")
            tb = int(hs.min())
            if tb <= k:
                assert best[b] == tb, (k, b, int(best[b]), tb)
                assert pf[b] - W == int(np.argmin(hs)), (k, b)
                assert pl[b] - W == int(np.where(hs == tb)[0][-1]), (k, b)
            else:
                assert best[b] > k, (k, b, int(best[b]), tb)
