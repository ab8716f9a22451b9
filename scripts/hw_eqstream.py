"""On-chip big-alphabet engines: per-lane-target batches past the select cap.

Measures the bit-plane engine (in-kernel XNOR-AND Eq reconstruction — the
library default for sigma > 64 distinct-target batches, see
batch._bigalpha_route) on a protein-style batch (sigma 200, distinct
targets per lane) and cross-checks a sample against the host big-int
engine.  Also times the legacy eq-stream engine (MXU one-hot gather +
HBM-streamed Eq words — kept for dense equality matrices) and the
select-chain kernel at sigma 25 on the same shapes, so both ratios are
captured numbers, not arguments.

Prints one JSON line:
  {"backend", "B", "qlen", "tlen", "sigma", "eqstream_gcups" (bit-plane,
   the default engine), "legacy_stream_gcups", "select25_gcups",
   "bitplane_vs_select25", "exact": true}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "4096"))
QLEN = int(os.environ.get("QLEN", "120"))
TLEN = int(os.environ.get("TLEN", "2048"))
SIGMA = int(os.environ.get("SIGMA", "200"))
REPS = int(os.environ.get("REPS", "50"))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from edlib_tpu import encode
    from edlib_tpu.ops import host as host_engine
    from edlib_tpu.ops import pallas_kernel as pk

    rng = np.random.default_rng(5)
    backend = jax.default_backend()

    def build(sigma):
        nw = (QLEN + 31) // 32
        nw = 1 << (nw - 1).bit_length()
        w = nw * 32 - QLEN
        t_scan = -(-(TLEN + w) // 32) * 32
        eq = np.eye(sigma, dtype=bool)
        peq = np.zeros((B, sigma + 1, nw), np.uint32)
        targets = np.full((B, t_scan), sigma, np.int32)
        qs = rng.integers(0, sigma, (B, QLEN), dtype=np.int64)
        ts = rng.integers(0, sigma, (B, TLEN), dtype=np.int64)
        for b in range(B):
            peq[b] = encode.build_peq_words(qs[b], eq, n_words=nw)
        targets[:, :TLEN] = ts
        lo = np.full(B, w, np.int32)
        hi = np.full(B, w + TLEN, np.int32)
        return peq, targets, lo, hi, qs, ts, eq, nw

    def timed(step, warm_out_idx=0):
        o = step()
        _ = np.asarray(o[warm_out_idx])
        t0 = time.time()
        for _ in range(REPS):
            o = step()
        _ = np.asarray(o[warm_out_idx])
        return (time.time() - t0) / REPS, o

    cells = B * QLEN * TLEN

    # --- bit-plane engine at SIGMA (the library default path) ---------------
    peq, targets, lo, hi, qs, ts, eq, nw = build(SIGMA)
    R = nw * 32
    w = R - QLEN
    q_alts, pad_words = pk.bitplane_identity_operands(
        jnp.asarray(qs.astype(np.int32)),
        jnp.full((B,), QLEN, jnp.int32), SIGMA, nw)
    args_bp = (q_alts, pad_words,
               jnp.asarray(targets), jnp.asarray(lo), jnp.asarray(hi))
    dt, outs = timed(lambda: pk.reduce_flat_device_bitplane(
        *args_bp, hin0=0, sigma=SIGMA))
    bitplane_gcups = cells / dt / 1e9
    best = np.asarray(outs[0])

    exact = True
    for b in rng.choice(B, 8, replace=False):
        hp = encode.build_peq_bigint(qs[b].astype(np.int64), eq)
        hs = host_engine.semiglobal_scores(hp, ts[b], QLEN, "HW")
        exact &= int(best[b]) == int(hs.min())

    # --- legacy eq-stream engine on the same inputs -------------------------
    chunk = pk.eqstream_chunk(nw)
    args_es = (jnp.asarray(peq), jnp.asarray(targets), jnp.asarray(lo),
               jnp.asarray(hi))
    dt_es, outs_es = timed(lambda: pk.reduce_flat_device_eqstream(
        *args_es, hin0=0, chunk=chunk))
    legacy_gcups = cells / dt_es / 1e9
    exact &= bool((np.asarray(outs_es[0]) == best).all())

    # --- select-chain reference at sigma 25 on the same shapes --------------
    peq25, targets25, lo25, hi25 = build(25)[:4]
    jitted25 = jax.jit(lambda *a: pk.reduce_flat_device(*a, hin0=0))
    a25 = (jnp.asarray(peq25), jnp.asarray(targets25), jnp.asarray(lo25),
           jnp.asarray(hi25))
    dt25, _ = timed(lambda: jitted25(*a25))
    select25_gcups = cells / dt25 / 1e9

    print(json.dumps({
        "backend": backend, "B": B, "qlen": QLEN, "tlen": TLEN,
        "sigma": SIGMA, "eqstream_gcups": round(bitplane_gcups, 1),
        "legacy_stream_gcups": round(legacy_gcups, 1),
        "select25_gcups": round(select25_gcups, 1),
        "bitplane_vs_select25": round(bitplane_gcups / select25_gcups, 3),
        "bitplane_vs_legacy": round(bitplane_gcups / legacy_gcups, 3),
        "exact": bool(exact),
    }))


if __name__ == "__main__":
    main()
