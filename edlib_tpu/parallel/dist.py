"""Multi-chip alignment: mesh sharding + collectives.

The reference is single-threaded (SURVEY.md §2.3: no distributed backend).
The TPU-native scaling axes built here:

* **dp (data parallel)** — the batch of alignments is sharded over mesh
  axis "dp"; pairs are independent, no collectives needed.
* **sp (sequence parallel)** — one long *shared* target is sharded over
  mesh axis "sp" for HW (infix) search.  Each device gets a target slice
  with a left halo of (Q_max + k_eff - 1) columns: an HW alignment of cost
  <= k spans at most Q + k target chars, and HW restarts freely at every
  column (top boundary 0), so every core-column score <= k computed from the
  sliced sweep equals the full-target score.  Slices before the target
  start are filled with a NULL symbol (matches nothing): paths through null
  columns are dominated by the free HW restart, preserving exactness.
  Per-shard minima are merged with ``lax.pmin`` over "sp".

Alphabet convention for sharded sweeps: Peq carries sigma real rows, row
sigma = WILDCARD (all ones, used for the W-extension), row sigma+1 = NULL
(all zeros, used for halo padding before the target start).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from edlib_tpu.ops import jax_engine

try:  # jax >= 0.6 moved shard_map to the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_alignment_mesh(n_devices: Optional[int] = None,
                        dp: Optional[int] = None,
                        sp: Optional[int] = None,
                        devices=None) -> Mesh:
    """2D device mesh ("dp", "sp").

    Defaults: all devices, sp gets the larger factor (long targets are the
    scarcer resource; batch is easy to grow).
    """
    if devices is None:
        devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if dp is None and sp is None:
        dp = 1
        while dp * dp * 4 <= n:
            dp *= 2
        sp = n // dp
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"dp*sp must equal device count ({dp}*{sp} != {n})"
    return jax.make_mesh((dp, sp), ("dp", "sp"), devices=devices[:n])


def sharded_sweep_dp(mesh: Mesh, peq: np.ndarray, targets: np.ndarray,
                     hin0: int) -> jax.Array:
    """Data-parallel batched sweep: batch axis sharded over every mesh axis.

    peq (B, S1, NW) uint32, targets (B, T) int32; B must divide by the mesh
    size.  Returns (B, T) scores with the same sharding.
    """
    axes = mesh.axis_names
    sharding = NamedSharding(mesh, P(axes))
    peq_d = jax.device_put(peq, sharding)
    tg_d = jax.device_put(targets, sharding)
    fn = jax.jit(functools.partial(jax_engine.sweep_scores, hin0=hin0),
                 in_shardings=(sharding, sharding),
                 out_shardings=sharding)
    return fn(peq_d, tg_d)


def shard_target_slices(target_ids: np.ndarray, sigma: int, n_shards: int,
                        halo: int, w_pad: int) -> Tuple[np.ndarray, int]:
    """Cut a shared target into halo-extended shard slices (host-side).

    Returns (slices int32 (n_shards, halo + C + w_pad), C) where C is the
    core width.  Layout per shard d:
      [ halo cols: target[d*C-halo : d*C] (NULL-filled before col 0) |
        core cols: target[d*C : (d+1)*C] (WILDCARD-filled past the end) |
        w_pad wildcard cols ]
    """
    T = len(target_ids)
    C = -(-T // n_shards)
    null_sym = sigma + 1
    wild_sym = sigma
    L = halo + C + w_pad
    slices = np.full((n_shards, L), wild_sym, dtype=np.int32)
    padded = np.concatenate([
        np.full(halo, null_sym, dtype=np.int32),
        np.asarray(target_ids, dtype=np.int32),
        np.full(n_shards * C - T, wild_sym, dtype=np.int32),
    ])
    for d in range(n_shards):
        slices[d, :halo + C] = padded[d * C:d * C + halo + C]
    return slices, C


def sharded_hw_search(mesh: Mesh, peq: np.ndarray, slices: np.ndarray,
                      halo: int, w_pad: int, qlen: int
                      ) -> Tuple[jax.Array, jax.Array]:
    """HW search of a batch of queries against an sp-sharded shared target.

    peq:    uint32 (B, S2, NW) — rows sigma=wildcard, sigma+1=null; B
            divisible by the dp size.
    slices: int32 (D_sp, L) from shard_target_slices.
    Returns (best (B,) int32 — global per-query minimum, merged over "sp"
    via lax.pmin; core_scores (D_sp, B, C) int32 — per-shard core score
    streams, position p = d*C + (col - halo - w_pad) ... i.e. core col j
    maps to global end position d*C + j - w_pad + ... see align_sharded).

    Scores above the halo budget may differ from the full-target sweep;
    only values <= k_eff (halo = qlen + k_eff - 1) are exact — the same
    contract as the reference's banded pruning.
    """
    D, L = slices.shape
    B = peq.shape[0]
    C = L - halo - w_pad

    def local(peq_l, slices_l):
        tg = jnp.broadcast_to(slices_l[0][None, :],
                              (peq_l.shape[0], L))
        scores = jax_engine.sweep_scores(peq_l, tg, hin0=0)  # HW
        core = scores[:, halo + w_pad:]  # (B/dp, C): positions d*C + j
        local_best = jnp.min(core, axis=1)
        best = jax.lax.pmin(local_best, "sp")
        return best, core[None]

    best, cores = shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P("sp")),
        out_specs=(P("dp"), P("sp", "dp")),
    )(peq, slices)
    return best, cores
