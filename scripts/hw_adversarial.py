"""Filter behavior per target class: real chromosome, tiled chromosome,
tandem repeats, homopolymer runs, shuffled-composition control.

For each class: the index-derived auto-tune verdict (q, maxc, enabled),
the MEASURED resolved rate on mutated reads through filter_verify_batch,
and end-to-end map_reads throughput (which routes through the tuner —
disabled classes pay the honest full sweep instead of thrashing).

Prints one JSON line: {"backend", "classes": {name: {...}}}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("EDLIB_TPU_DISPATCH_RTT_MS", "25")

READS = int(os.environ.get("READS", "4096"))
QLEN = int(os.environ.get("QLEN", "100"))
TLEN = int(os.environ.get("TLEN", "1000000"))

GENOME = os.path.join(
    os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference"), "test_data",
    "Chromosome_2890043_3890042_0", "Chromosome_2890043_3890042_0.fasta")


def targets(rng):
    out = {}
    try:
        raw = open(GENOME, "rb").read()
        g = np.frombuffer(b"".join(
            l for l in raw.split(b"\n") if not l.startswith(b">")),
            np.uint8)
        lut = np.full(256, 0, np.int32)
        for i, c in enumerate(b"ACGT"):
            lut[c] = i
        gi = lut[g].astype(np.int32)
        out["chromosome"] = np.tile(gi, -(-TLEN // len(gi)))[:TLEN]
        sh = gi.copy()
        rng.shuffle(sh)
        out["shuffled_chromosome"] = np.tile(sh, -(-TLEN // len(sh)))[:TLEN]
    except OSError:
        pass
    unit = rng.randint(0, 4, 200).astype(np.int32)
    out["tandem_200bp"] = np.tile(unit, -(-TLEN // len(unit)))[:TLEN]
    homo = np.concatenate([
        np.full(rng.randint(50, 400), rng.randint(0, 4), np.int32)
        for _ in range(TLEN // 100)])[:TLEN]
    out["homopolymer"] = (np.tile(homo, 2)[:TLEN] if len(homo) < TLEN
                          else homo)
    return out


def main():
    global np
    import numpy as np
    import jax
    import jax.numpy as jnp
    from edlib_tpu.utils.jaxcache import ensure_compile_cache
    ensure_compile_cache()
    import edlib_tpu
    from edlib_tpu import encode, mapping
    from edlib_tpu.ops import qfilter as qf

    rng = np.random.RandomState(5)
    res = {}
    for name, t in targets(rng).items():
        row = {}
        geom = qf.window_geometry(len(t), QLEN, max(8, QLEN // 10))
        rung = max(8, QLEN // 10)
        L, stride, n_win = geom
        q0 = qf.choose_q(4, QLEN, rung, L)
        Lv = qf.verify_cols(L, encode.num_words(QLEN), 256)
        tj = jnp.asarray(t)

        def builder(qq):
            return qf.build_target_index(tj, 4, qq, L, stride, n_win, Lv)

        t0 = time.time()
        q, maxc, win_pres, win_syms, pred = qf.auto_tune(
            t, 4, q0, rung, QLEN, L, stride, n_win, Lv, builder)
        row.update(tune_s=round(time.time() - t0, 3),
                   q=q, maxc=maxc, pred_resolved=round(pred, 4),
                   enabled=q is not None)

        # mutated-read resolved rate through the real filter
        reads = np.empty((READS, QLEN), np.int32)
        for i in range(READS):
            s = rng.randint(0, len(t) - QLEN)
            r = t[s:s + QLEN].copy()
            muts = rng.rand(QLEN) < 0.05
            r[muts] = rng.randint(0, 4, muts.sum())
            reads[i] = r
        if q is not None:
            gb, gp, rs = qf.filter_verify_batch(
                jnp.asarray(reads), jnp.full((READS,), QLEN, jnp.int32),
                win_pres, win_syms, sigma=4, q=q, L=L, stride=stride,
                tlen=len(t), k=rung, maxc=maxc,
                nw=encode.num_words(QLEN), chunk=256)
            row["resolved_rate"] = round(float(np.asarray(rs).mean()), 4)

        # e2e map_reads (routes through the tuner itself)
        tb = bytes(bytearray(int(x) + 65 for x in t))
        rb = [bytes(bytearray(int(x) + 65 for x in r)) for r in reads]
        b1, p1 = edlib_tpu.map_reads(rb, tb, mode="HW")  # warm
        ts = []
        for _ in range(2):
            t0 = time.time()
            b1, p1 = edlib_tpu.map_reads(rb, tb, mode="HW")
            ts.append(time.time() - t0)
        row["map_reads_per_s"] = round(READS / min(ts), 1)
        # exactness spot check vs the single-pair engine
        for i in (0, READS // 2, READS - 1):
            want = edlib_tpu.align(rb[i], tb, mode="HW",
                                   task="locations")
            assert b1[i] == want["editDistance"], (name, i)
            assert p1[i] == want["locations"][0][1], (name, i)
        res[name] = row
    print(json.dumps({"backend": jax.default_backend(), "reads": READS,
                      "qlen": QLEN, "tlen": TLEN, "classes": res}))


if __name__ == "__main__":
    main()
