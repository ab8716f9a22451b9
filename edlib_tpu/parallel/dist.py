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
                        halo: int, w_pad: int, c_multiple: int = 1
                        ) -> Tuple[np.ndarray, int]:
    """Cut a shared target into halo-extended shard slices (host-side).

    Returns (slices int32 (n_shards, halo + C + w_pad), C) where C is the
    core width.  Layout per shard d:
      [ halo cols: target[d*C-halo : d*C] (NULL-filled before col 0) |
        core cols: target[d*C : (d+1)*C] |
        w_pad cols: target continues (drain room for per-lane wildcard
        pads W < w_pad — a wildcard fill here would copy scores diagonally
        into those lanes' last core columns); WILDCARD-filled only past the
        true target end, where validity masks apply ]
    """
    T = len(target_ids)
    C = -(-T // n_shards)
    C = -(-C // c_multiple) * c_multiple
    null_sym = sigma + 1
    wild_sym = sigma
    L = halo + C + w_pad
    padded = np.concatenate([
        np.full(halo, null_sym, dtype=np.int32),
        np.asarray(target_ids, dtype=np.int32),
        np.full(n_shards * C - T + w_pad, wild_sym, dtype=np.int32),
    ])
    slices = np.empty((n_shards, L), dtype=np.int32)
    for d in range(n_shards):
        slices[d] = padded[d * C:d * C + L]
    return slices, C


_BIG = 0x3FFFFFFF


def sharded_hw_locations(mesh: Mesh, peq: np.ndarray, slices: np.ndarray,
                         halo: int, w_pad: int, tlen: int,
                         w_lanes: Optional[np.ndarray] = None,
                         want_hits: bool = True, engine: str = "auto"):
    """HW search with the location merge ON DEVICE (SURVEY §2.3 target).

    peq:     uint32 (B, S2, NW) — rows sigma=wildcard, sigma+1=null; B
             divisible by the dp size.
    slices:  int32 (D_sp, L) from shard_target_slices; core width C = L -
             halo - w_pad must be a multiple of 32 when want_hits.
    tlen:    true target length (core columns past it are masked out).
    w_lanes: int32 (B,) per-lane wildcard pads for mixed-length batches
             (w_pad must be their max); omitted = uniform w_pad.

    Returns (best (B,) int32, pos_first (B,) int32, pos_last (B,) int32,
    hits (B, D_sp*C//32) uint32 | None).  best/pos are merged with
    pmin/pmax collectives over "sp" — nothing but O(B) scalars plus the
    packed hit bitmask (32x smaller than a score stream) ever leaves the
    devices.  Hit bit j of word g for lane b = end position 32g + j +
    (w_pad - w_lanes[b]) has score == best (the per-lane windows tile the
    position axis without gaps or overlaps across shards).

    Exactness: halo = qlen + k_eff - 1 makes every core score <= k_eff
    equal the full-target score; with k_eff >= qlen (HW scores never
    exceed qlen, edlib.cpp:566-568) every *minimal* score is exact, so the
    merged locations are exact for any k.
    """
    D, L = slices.shape
    C = L - halo - w_pad
    B = peq.shape[0]
    eng = _resolve_engine(mesh, engine)
    if want_hits and C % 32:
        raise ValueError("core width must be a multiple of 32 for hits")
    if want_hits and eng != "xla" and (halo + w_pad) % 32:
        raise ValueError("halo + w_pad must be a multiple of 32 for the "
                         "kernel engine's hit bitmasks (round the halo up "
                         "— a larger halo is still exact)")
    if w_lanes is None:
        w_lanes = np.full(B, w_pad, np.int32)
    delta = (w_pad - np.asarray(w_lanes)).astype(np.int32)  # (B,) >= 0
    null_sym = peq.shape[1] - 1  # sharded convention: last row = NULL

    fn = _hw_locations_fn(mesh, halo, w_pad, C, L, null_sym, want_hits,
                          eng)
    import contextlib
    ctx = jax.set_mesh(mesh) if eng != "xla" else contextlib.nullcontext()
    with ctx:
        out = fn(peq, delta, slices, jnp.int32(tlen))
    if want_hits:
        return out
    return out + (None,)


@functools.lru_cache(maxsize=None)
def _hw_locations_fn(mesh: Mesh, halo: int, w_pad: int, C: int, L: int,
                     null_sym: int, want_hits: bool, eng: str):
    """Build + jit the sharded HW-locations program ONCE per static
    config.  The closure must have a stable identity: a fresh function
    per call defeats jax's compile cache and re-pays the full Mosaic
    compile (~40s for 1024 lanes x 64k columns) on EVERY invocation —
    round 3 measured 43s/call vs 7ms/call after caching.  tlen is a
    traced scalar so target length never forces a recompile."""
    from edlib_tpu.ops import pallas_kernel

    def local_kernel(peq_l, delta_l, slices_l, tlen_a):
        """Per-shard scalar-symbol reduce kernel + collective merge."""
        Bl = peq_l.shape[0]
        d = jax.lax.axis_index("sp")
        # Valid core columns j < tlen - d*C - delta_l (per lane) — as a
        # scan-column window for the in-kernel reduction.
        lo_scan = jnp.full((Bl,), halo + w_pad, jnp.int32)
        n_valid = jnp.clip(tlen_a - d * C - delta_l, 0, C).astype(jnp.int32)
        hi_scan = lo_scan + n_valid
        interp = eng == "interpret"
        best_s, pf_s, pl_s, _ = pallas_kernel.reduce_flat_device_shared(
            peq_l, slices_l[0], lo_scan, hi_scan, hin0=0,
            fill_sym=null_sym, interpret=interp)
        best = jax.lax.pmin(best_s, "sp")
        base = d * C - (halo + w_pad) + delta_l  # gpos = scan col + base
        pos_f = jnp.where((best_s == best) & (pf_s >= 0), pf_s + base, _BIG)
        pos_f = jax.lax.pmin(pos_f, "sp")
        pos_l = jnp.where((best_s == best) & (pl_s >= 0), pl_s + base, -1)
        pos_l = jax.lax.pmax(pos_l, "sp")
        if want_hits:
            masks = pallas_kernel.hits_flat_device_shared(
                peq_l, slices_l[0], lo_scan, hi_scan, best, hin0=0,
                fill_sym=null_sym, interpret=interp)
            hits = masks[:, (halo + w_pad) // 32:
                         (halo + w_pad) // 32 + C // 32]
            return best, pos_f, pos_l, hits
        return best, pos_f, pos_l

    def local(peq_l, delta_l, slices_l, tlen_a):
        if eng != "xla":
            return local_kernel(peq_l, delta_l, slices_l, tlen_a)
        tg = jnp.broadcast_to(slices_l[0][None, :], (peq_l.shape[0], L))
        scores = jax_engine.sweep_scores(peq_l, tg, hin0=0)
        core = scores[:, halo + w_pad:]          # (Bl, C)
        d = jax.lax.axis_index("sp")
        gpos = d * C + jnp.arange(C, dtype=jnp.int32)[None, :] \
            + delta_l[:, None]                   # (Bl, C)
        valid = gpos < tlen_a
        core = jnp.where(valid, core, _BIG)
        best = jax.lax.pmin(jnp.min(core, axis=1), "sp")         # (Bl,)
        at_best = core == best[:, None]
        pos_f = jnp.min(jnp.where(at_best, gpos, _BIG), axis=1)
        pos_f = jax.lax.pmin(pos_f, "sp")
        pos_l = jnp.max(jnp.where(at_best, gpos, -1), axis=1)
        pos_l = jax.lax.pmax(pos_l, "sp")
        if want_hits:
            bits = at_best.reshape(core.shape[0], C // 32, 32)
            weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
            hits = jnp.sum(bits.astype(jnp.uint32) * weights[None, None, :],
                           axis=2, dtype=jnp.uint32)
            return best, pos_f, pos_l, hits
        return best, pos_f, pos_l

    out_specs = (P("dp"), P("dp"), P("dp"))
    if want_hits:
        out_specs = out_specs + (P("dp", "sp"),)
    return jax.jit(shard_map(local, mesh=mesh,
                             in_specs=(P("dp"), P("dp"), P("sp"), P()),
                             out_specs=out_specs,
                             check_vma=(eng == "xla")))


def _resolve_engine(mesh: Mesh, engine: str) -> str:
    """'pallas' on an all-TPU mesh, 'xla' otherwise (CPU virtual meshes:
    the scan engine compiles fast and is exact; 'interpret' forces the
    Pallas interpreter for kernel-path tests).  Every dispatch site
    treats anything != 'xla' as the kernel engine, so unknown strings
    must be rejected here."""
    if engine not in ("auto", "xla", "pallas", "interpret"):
        raise ValueError(f"unknown engine {engine!r} "
                         "(auto | xla | pallas | interpret)")
    if engine != "auto":
        return engine
    return "pallas" if all(d.platform == "tpu"
                           for d in mesh.devices.flat) else "xla"


def sharded_reduce_dp(mesh: Mesh, peq: np.ndarray, targets: np.ndarray,
                      lo: np.ndarray, hi: np.ndarray, hin0: int,
                      want_hits: bool = False, engine: str = "auto"):
    """Data-parallel batched sweep with the reduction ON each device.

    Batch axis sharded over every mesh axis (pairs are independent — no
    collectives).  peq (B, S1, NW) uint32, targets (B, T) int32, lo/hi
    (B,) int32 scan-column windows.  Returns (best, pos_first, pos_last,
    last_score) each (B,) int32 — and, when want_hits, a packed uint32
    bitmask (B, ceil(T/32)) of window columns with score == best (bit j
    of word g = scan column 32g + j; caller shifts by per-lane W) — so
    host transfer is O(B) / O(B*T/32), never the O(B*T) stream.

    engine: on a TPU mesh each shard runs the register-resident Pallas
    reduce/hits kernels (the single-chip hot path); the XLA scan engine
    is the CPU/virtual-mesh fallback.
    """
    eng = _resolve_engine(mesh, engine)
    fn = _reduce_dp_fn(mesh, hin0, want_hits, eng)
    # Kernel engine: pallas_call out_shapes carry no vma annotations
    # (jax 0.9) so the vma check must be off — sound here, the map is
    # purely data-parallel (no collectives) — and the interpreter's
    # gathers need the mesh entered as context.
    import contextlib
    ctx = jax.set_mesh(mesh) if eng != "xla" else contextlib.nullcontext()
    with ctx:
        out = fn(peq, targets, lo.astype(np.int32), hi.astype(np.int32))
    if want_hits:
        return out
    return out + (None,)


@functools.lru_cache(maxsize=None)
def _reduce_dp_fn(mesh: Mesh, hin0: int, want_hits: bool, eng: str):
    """Stable-identity jitted program for sharded_reduce_dp (a fresh
    closure per call would re-pay the full compile every invocation)."""
    from edlib_tpu.ops import pallas_kernel

    axes = mesh.axis_names

    def local(peq_l, tg_l, lo_l, hi_l):
        if eng != "xla":
            return pallas_kernel.reduce_flat_device(
                peq_l, tg_l, lo_l, hi_l, hin0=hin0, want_hits=want_hits,
                interpret=(eng == "interpret"))
        T = tg_l.shape[1]
        T32 = -(-T // 32)
        scores = jax_engine.sweep_scores(peq_l, tg_l, hin0=hin0)  # (Bl, T)
        cols = jnp.arange(T, dtype=jnp.int32)[None, :]
        in_win = (cols >= lo_l[:, None]) & (cols < hi_l[:, None])
        sc = jnp.where(in_win, scores, _BIG)
        best = jnp.min(sc, axis=1)
        at_best = sc == best[:, None]
        pos_f = jnp.min(jnp.where(at_best, cols, _BIG), axis=1)
        pos_l = jnp.max(jnp.where(at_best, cols, -1), axis=1)
        last_idx = jnp.clip(hi_l - 1, 0, T - 1)
        last = jnp.take_along_axis(scores, last_idx[:, None], axis=1)[:, 0]
        if want_hits:
            pad = T32 * 32 - T
            hb = jnp.pad(at_best, ((0, 0), (0, pad)))
            bits = hb.reshape(hb.shape[0], T32, 32)
            weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
            hits = jnp.sum(bits.astype(jnp.uint32) * weights[None, None, :],
                           axis=2, dtype=jnp.uint32)
            return best, pos_f, pos_l, last, hits
        return best, pos_f, pos_l, last

    n_out = 5 if want_hits else 4
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(axes), P(axes), P(axes), P(axes)),
        out_specs=tuple(P(axes) for _ in range(n_out)),
        check_vma=(eng == "xla")))


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
    best, cores = _hw_search_fn(mesh, halo + w_pad)(peq, slices)
    return best, cores


@functools.lru_cache(maxsize=None)
def _hw_search_fn(mesh: Mesh, skip: int):
    """Stable-identity jitted program for sharded_hw_search."""

    def local(peq_l, slices_l):
        L = slices_l.shape[1]
        tg = jnp.broadcast_to(slices_l[0][None, :],
                              (peq_l.shape[0], L))
        scores = jax_engine.sweep_scores(peq_l, tg, hin0=0)  # HW
        core = scores[:, skip:]  # (B/dp, C): positions d*C + j
        local_best = jnp.min(core, axis=1)
        best = jax.lax.pmin(local_best, "sp")
        return best, core[None]

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P("sp")),
        out_specs=(P("dp"), P("sp", "dp"))))


def sharded_reduce_pipeline(mesh: Mesh, peq: np.ndarray,
                            target_ids: np.ndarray, qlen: int,
                            lo: np.ndarray, hi: np.ndarray,
                            hin0: int = 1, engine: str = "auto",
                            chunk: int = 256):
    """Sequential multi-shard REDUCE: one long scan streamed through "sp"
    (ppermute carry hand-off, like sharded_nw_pipeline) but with the
    per-shard reduction done in place of score streams — O(B) leaves the
    mesh instead of O(B*T).  On an all-TPU mesh each round runs the
    carry-I/O Pallas reduce kernel; the resumable XLA scan engine is the
    CPU/virtual-mesh fallback.

    peq (B, S1, NW) uint32 with the wildcard row at sigma; target_ids
    (T,) int32; lo/hi (B,) int64 GLOBAL scan-column windows (per-lane
    wildcard pads W .. W + tlen, exactly as the single-device reduce).
    Returns (best, pos_first, pos_last, last_score) each (B,) int32 in
    global scan-column space — bit-identical to the single-device
    two-phase reduce.
    """
    eng = _resolve_engine(mesh, engine)
    sp = mesh.shape["sp"]
    B, S1, NW = peq.shape
    sigma = S1 - 1
    w_pad = NW * 32 - qlen
    T = len(target_ids)
    t_scan = T + w_pad
    # Shard width must be a chunk multiple for the kernel engine: the
    # flat wrapper pads each call's scan to whole chunks and SWEEPS the
    # padding, which would corrupt the carry mid-pipeline otherwise.
    # Trailing wildcard columns on the LAST shard are harmless (nothing
    # past hi is ever read).
    step = chunk if eng != "xla" else 32
    C = -(-t_scan // (sp * step)) * step
    padded = np.full(sp * C, sigma, dtype=np.int32)
    padded[:T] = target_ids
    slices = padded.reshape(sp, C)
    lo32 = np.asarray(lo, np.int32)
    hi32 = np.asarray(hi, np.int32)

    fn = _reduce_pipeline_fn(mesh, hin0, eng, chunk)
    import contextlib
    ctx = jax.set_mesh(mesh) if eng != "xla" else contextlib.nullcontext()
    with ctx:
        return fn(np.ascontiguousarray(peq), lo32, hi32, slices)


@functools.lru_cache(maxsize=None)
def _reduce_pipeline_fn(mesh: Mesh, hin0: int, eng: str, chunk: int):
    """Stable-identity jitted program for sharded_reduce_pipeline."""
    from edlib_tpu.ops import pallas_kernel

    sp = mesh.shape["sp"]

    def local(peq_l, lo_l, hi_l, slices_l):
        Bl, _, NW = peq_l.shape
        C = slices_l.shape[1]
        idx = jax.lax.axis_index("sp")
        tg1 = slices_l[0]  # (C,) this shard's columns
        lo_loc = jnp.clip(lo_l - idx * C, 0, C)
        hi_loc = jnp.clip(hi_l - idx * C, 0, C)
        base = idx * C
        acc = (jnp.full((Bl,), _BIG, jnp.int32),
               jnp.full((Bl,), -1, jnp.int32),
               jnp.full((Bl,), -1, jnp.int32),
               jnp.full((Bl,), _BIG, jnp.int32))
        if eng != "xla":
            carry = (jnp.full((Bl, NW), 0xFFFFFFFF, jnp.uint32),
                     jnp.zeros((Bl, NW), jnp.uint32),
                     jnp.full((Bl,), NW * 32, jnp.int32))
        else:
            carry = (jnp.full((NW, Bl), 0xFFFFFFFF, jnp.uint32),
                     jnp.zeros((NW, Bl), jnp.uint32),
                     jnp.full((Bl,), NW * 32, jnp.int32))
        perm = [(i, i + 1) for i in range(sp - 1)]
        for r in range(sp):
            if eng != "xla":
                outs = pallas_kernel.reduce_resumable_flat_device(
                    peq_l, tg1, lo_loc, hi_loc,
                    carry[0], carry[1], carry[2], hin0=hin0, chunk=chunk,
                    interpret=(eng == "interpret"))
                red, new = outs[:4], outs[4:]
            else:
                tg = jnp.broadcast_to(tg1[None, :], (Bl, C))
                scores, new = jax_engine.sweep_scores_resumable(
                    peq_l, tg, carry, hin0=hin0)
                cols = jnp.arange(C, dtype=jnp.int32)[None, :]
                in_win = (cols >= lo_loc[:, None]) & (cols < hi_loc[:, None])
                sc = jnp.where(in_win, scores, _BIG)
                b = jnp.min(sc, axis=1)
                at_b = sc == b[:, None]
                pf = jnp.min(jnp.where(at_b, cols, _BIG), axis=1)
                pl_ = jnp.max(jnp.where(at_b, cols, -1), axis=1)
                li = jnp.clip(hi_loc - 1, 0, C - 1)
                ls = jnp.take_along_axis(scores, li[:, None], axis=1)[:, 0]
                red = (b, pf, pl_, ls)
            mine = idx == r
            acc = tuple(jnp.where(mine, n.astype(jnp.int32), a)
                        for n, a in zip(red, acc))
            out_carry = jax.tree.map(
                lambda n, c: jnp.where(mine, n, c), tuple(new), carry)
            if r < sp - 1:
                carry = jax.lax.ppermute(out_carry, "sp", perm)
        best_s, pf_s, pl_s, rl_s = acc
        best = jax.lax.pmin(best_s, "sp")
        pf_g = jnp.where((best_s == best) & (pf_s >= 0), pf_s + base, _BIG)
        pf = jax.lax.pmin(pf_g, "sp")
        pl_g = jnp.where((best_s == best) & (pl_s >= 0), pl_s + base, -1)
        pl_ = jax.lax.pmax(pl_g, "sp")
        # Only the shard truly containing hi-1 holds the final-column
        # score (middle shards read their own last column at hi_loc=C).
        has_last = (hi_l > base) & (hi_l <= base + C)
        last = jax.lax.pmin(jnp.where(has_last, rl_s, _BIG), "sp")
        return best, pf, pl_, last

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("sp")),
        out_specs=tuple(P("dp") for _ in range(4)),
        check_vma=False))


def sharded_nw_pipeline(mesh: Mesh, peq: np.ndarray, target_ids: np.ndarray,
                        qlen: int, hin0: int = 1):
    """Sequential (Pv, Mv, score) carry hand-off across "sp": one long NW
    target streamed through the mesh (SURVEY §5 long-context: a target too
    large for one device's memory lives shard-resident; only the O(NW*B)
    carry ever crosses ICI).

    The column recurrence is sequential, so shard s can only run after
    shard s-1: round r, every device sweeps its own slice with its current
    carry, device r's result is the real one, and ``lax.ppermute`` hands
    its exit state to device r+1 for the next round.  The batch axis is
    sharded over "dp" (those pipelines run concurrently).

    peq: uint32 (B, S1, NW) with the wildcard row at sigma;
    target_ids (T,) int32 — padded here to sp*C with wildcards so the
    padded-bottom stream covers the NW corner (wildcard-extension trick).
    Returns (core_scores (sp, B, C) int32 — scan column s*C + j,
    C).  The NW distance of lane b is core_scores at scan column
    tlen + w_pad - 1; values are bit-identical to the single-device
    resumable chain (tested on the virtual 8-device mesh).
    """
    sp = mesh.shape["sp"]
    B, S1, NW = peq.shape
    sigma = S1 - 1  # wildcard row convention
    w_pad = NW * 32 - qlen
    T = len(target_ids)
    t_scan = T + w_pad
    C = -(-t_scan // sp)
    padded = np.full(sp * C, sigma, dtype=np.int32)
    padded[:T] = target_ids
    slices = padded.reshape(sp, C)
    cores = _nw_pipeline_fn(mesh, hin0)(np.ascontiguousarray(peq), slices)
    return cores, C


@functools.lru_cache(maxsize=None)
def _nw_pipeline_fn(mesh: Mesh, hin0: int):
    """Stable-identity jitted program for sharded_nw_pipeline."""
    sp = mesh.shape["sp"]

    def local(peq_l, slices_l):
        Bl, _, NW = peq_l.shape
        C = slices_l.shape[1]
        idx = jax.lax.axis_index("sp")
        tg = jnp.broadcast_to(slices_l[0][None, :], (Bl, C))
        # Initial carry derived from BOTH shard_map inputs so its varying
        # manual axes are (dp, sp) like the scan outputs' (a narrower
        # type is rejected: "carry types differ").
        zv = tg[0, 0].astype(jnp.uint32) * 0  # varies over sp
        zero_nb = peq_l[:, 0, :].T * 0 + zv   # (NW, Bl), varies dp+sp
        carry = (jnp.full((NW, Bl), 0xFFFFFFFF, jnp.uint32) | zero_nb,
                 zero_nb,
                 jnp.full((Bl,), NW * 32, jnp.int32)
                 + peq_l[:, 0, 0].astype(jnp.int32) * 0
                 + zv.astype(jnp.int32))
        perm = [(i, i + 1) for i in range(sp - 1)]
        keep = jnp.zeros((Bl, C), jnp.int32)
        for r in range(sp):
            scores_r, new = jax_engine.sweep_scores_resumable(
                peq_l, tg, carry, hin0=hin0)
            mine = idx == r
            keep = jnp.where(mine, scores_r, keep)
            out_carry = jax.tree.map(
                lambda n, c: jnp.where(mine, n, c), tuple(new), carry)
            if r < sp - 1:
                carry = jax.lax.ppermute(out_carry, "sp", perm)
        return keep[None]

    return jax.jit(shard_map(local, mesh=mesh,
                             in_specs=(P("dp"), P("sp")),
                             out_specs=P("sp", "dp")))
