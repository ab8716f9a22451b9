"""Sequential (Pv, Mv, score) carry hand-off across "sp" shards.

SHW and NW sweeps are prefix-anchored: unlike HW (free restart per column,
halo-sliceable — dist.py), their DP state at a column depends on the whole
target prefix, so a target longer than one device's memory must be swept
*through* the shards: shard d holds target segment d and receives the
carried state (Pv, Mv, bottom score) from shard d-1 — the multi-chip
analogue of the reference's targetStopPosition resume (edlib.cpp:896-908)
and of jax_engine.sweep_scores_resumable, with the hand-off riding ICI via
``ppermute``.

One pair would leave D-1 shards idle, so micro-batches pipeline through:
at step s shard d sweeps micro-batch s-d; after M + D - 1 steps every
micro-batch has flowed through every segment.  The running reduction
(best, first/last minimal position, final-column score) travels WITH the
carry, so only O(mb) scalars per micro-batch ever leave the last shard —
the same PairSummary quadruple the single-chip reduce kernel produces.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from edlib_tpu.ops import jax_engine

try:  # jax >= 0.6 moved shard_map to the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

_BIG = 0x3FFFFFFF


def split_target_segments(target_ids: np.ndarray, sigma: int, n_shards: int,
                          w_max: int) -> Tuple[np.ndarray, int]:
    """Plain (halo-free) split of the wildcard-extended scan target.

    Returns (segments int32 (n_shards, Lseg), Lseg) where the concatenation
    is target + wildcard fill; Lseg covers T + w_max so every lane's final
    column (w_lane + T - 1) lands inside the last shard for w_max < Lseg.
    """
    T = len(target_ids)
    Lseg = -(-(T + w_max) // n_shards)
    scan = np.full(n_shards * Lseg, sigma, dtype=np.int32)
    scan[:T] = target_ids
    return scan.reshape(n_shards, Lseg), Lseg


def pipelined_sweep_summaries(mesh: Mesh, peq: np.ndarray,
                              segments: np.ndarray, lo: np.ndarray,
                              hi: np.ndarray, hin0: int):
    """Pipelined batched sweep of M micro-batches over an sp-sharded target.

    peq:      uint32 (M, mb, S2, NW) — micro-batches of query profiles (mb
              divisible by the dp size when the mesh has a dp axis).
    segments: int32 (D_sp, Lseg) from split_target_segments.
    lo/hi:    int32 (M, mb) per-lane scan-column windows [lo, hi): lo =
              W_lane, hi = W_lane + tlen (hi <= D_sp * Lseg).
    hin0:     1 for SHW/NW, 0 for HW (HW is better served by dist.py's
              halo sharding, but the hand-off is exact for it too).

    Returns int32 (M, mb, 4): [best, pos_first, pos_last, last_score] per
    lane, positions in scan-column space (caller subtracts W).
    """
    M, mb, S2, NW = peq.shape
    D, Lseg = segments.shape
    axes = mesh.axis_names
    dp_axis = "dp" if "dp" in axes else None

    def local(peq_l, lo_l, hi_l, seg_l):
        d = jax.lax.axis_index("sp")
        seg = seg_l[0]  # (Lseg,)
        mbl = peq_l.shape[1]

        # Derive inits from BOTH inputs so their varying-manual-axes types
        # match the loop-carried values under shard_map (constants are
        # unvarying and would fail the fori_loop carry type check).
        zero = (peq_l[0, :, 0, 0] & 0).astype(jnp.int32)[0] \
            + (seg[0] & 0)  # varying scalar 0
        zero_mb = zero + jnp.zeros((mbl,), jnp.int32)
        init_pv = (zero_mb.astype(jnp.uint32)[None, :]
                   + jnp.uint32(0xFFFFFFFF)) \
            * jnp.ones((NW, 1), jnp.uint32)
        init_mv = jnp.zeros((NW, 1), jnp.uint32) \
            * zero_mb.astype(jnp.uint32)[None, :]
        init_sc = zero_mb + NW * 32
        init_red = (zero_mb + _BIG, zero_mb + _BIG, zero_mb - 1,
                    zero_mb + _BIG)

        peq_t = jnp.transpose(peq_l, (0, 2, 3, 1))  # (M, S2, NW, mbl)

        def segment_sweep(carry, m):
            """Sweep this shard's segment for micro-batch m's state."""
            pv, mv, sc, rb, rpf, rpl, rl = carry
            peq_m = peq_t[m]                      # (S2, NW, mbl)
            lo_m = lo_l[m]
            hi_m = hi_l[m]
            base = d * Lseg

            def col_step(c, st):
                pv, mv, sc, rb, rpf, rpl, rl = st
                sym = seg[c]
                idx = jnp.broadcast_to(sym[None, None, None],
                                       (1, NW, mbl)).astype(jnp.int32)
                eqc = jnp.take_along_axis(peq_m, idx, axis=0)[0]
                pv, mv, hout = jax_engine._column_update(pv, mv, eqc, hin0)
                sc = sc + hout
                col = base + c
                in_win = (col >= lo_m) & (col < hi_m)
                upd = (sc < rb) & in_win
                rpf = jnp.where(upd, col, rpf)
                rpl = jnp.where((sc <= rb) & in_win, col, rpl)
                rb = jnp.where(upd, sc, rb)
                rl = jnp.where(col == hi_m - 1, sc, rl)
                return pv, mv, sc, rb, rpf, rpl, rl

            return jax.lax.fori_loop(
                0, Lseg, col_step, (pv, mv, sc, rb, rpf, rpl, rl))

        def step(s, st):
            carry, results = st
            m = s - d
            active = (m >= 0) & (m < M)
            m_c = jnp.clip(m, 0, M - 1)
            # Shard 0 starts every micro-batch fresh; others continue the
            # carry received from the left neighbour last step.
            fresh = d == 0
            pv = jnp.where(fresh, init_pv, carry[0])
            mv = jnp.where(fresh, init_mv, carry[1])
            sc = jnp.where(fresh, init_sc, carry[2])
            red = tuple(jnp.where(fresh, i, c)
                        for i, c in zip(init_red, carry[3:]))
            out = segment_sweep((pv, mv, sc) + red, m_c)
            # Freeze the carry on inactive steps so pipeline bubbles don't
            # corrupt in-flight state.
            out = tuple(jnp.where(active, o, c)
                        for o, c in zip(out, carry))
            # Last shard finished micro-batch m: record its summary.
            done = active & (d == D - 1)
            summary = jnp.stack([out[3], out[4], out[5], out[6]], axis=-1)
            upd = jax.lax.dynamic_update_slice(results, summary[None],
                                               (m_c, 0, 0))
            results = jnp.where(done, upd, results)
            # Hand the carry to the right neighbour (ring; the wraparound
            # entry reaching shard 0 is ignored — shard 0 always starts
            # fresh).
            perm = [(i, (i + 1) % D) for i in range(D)]
            carry = tuple(jax.lax.ppermute(o, "sp", perm) for o in out)
            return carry, results

        results0 = zero + jnp.zeros((M, mbl, 4), jnp.int32)
        carry0 = (init_pv, init_mv, init_sc) + init_red
        _, results = jax.lax.fori_loop(0, M + D - 1, step,
                                       (carry0, results0))
        # Only the last shard's records are real; psum the rest away.
        results = jnp.where(d == D - 1, results, 0)
        return jax.lax.psum(results, "sp")

    peq_spec = P(None, dp_axis)
    lane_spec = P(None, dp_axis)
    out = shard_map(
        local, mesh=mesh,
        in_specs=(peq_spec, lane_spec, lane_spec, P("sp")),
        out_specs=P(None, dp_axis),
    )(peq, lo, hi, segments)
    return np.asarray(out)
