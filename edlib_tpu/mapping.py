"""map_reads — the TPU-native read-mapping fast path.

A purpose-built API for the headline workload (thousands of reads vs one
reference sequence, HW mode): returns per-read (best edit distance, end
position of the first best hit) — the reduction happens ON CHIP, so HBM
traffic and host transfer are O(batch), not O(batch x target).

This intentionally returns less than ``align_batch`` (which reports ALL
minimal end locations for edlib parity): when you only need the best hit
per read — the common mapping case — this path is orders of magnitude
lighter.  Results agree with ``align(...)['locations'][0][1]``-style firsts:
best == editDistance and pos == endLocations[0] whenever the best hit's
first position is wanted (ties resolve to the smallest end position, like
the first entry of the reference's ascending location list).

Routing (large HW jobs, any alphabet <= 256): the MXU q-gram prefilter
with index-derived auto-tuning (ops/qfilter.py) runs as ONE fused device
dispatch — filter, windowed verification, an in-jit segmented fallback
for the first unresolved stragglers, and the merge (RTT discipline: one
packed upload, one packed download; the same body runs per shard under a
mesh).  SHW jobs prune via prefix slices with a doubling ladder (spans
start at column 0).  Small jobs, repeat-rich targets the tuner rejects,
and device-less hosts fall through to the segmented / shared-sweep /
native engines — results identical everywhere, only speed differs.

Queries may have mixed lengths up to a bucket maximum; each read's
wildcard padding is handled per-lane, and the -1 end-location candidate
plus user-k filtering are applied in one vectorised host post-pass.
"""

from __future__ import annotations

import functools as _functools
from typing import Sequence, Tuple

import numpy as np

from edlib_tpu import encode
from edlib_tpu.types import AlignMode

_INF = float("inf")


def _first_appearance_map(arr: np.ndarray, glob_idx: np.ndarray,
                          seen: int) -> int:
    """Extend glob_idx with arr's unmapped byte values in first-appearance
    order (chunked: np.unique's full sort costs ~50 ms on Mbp inputs, but
    genomic alphabets close after the first chunk).  Returns new seen."""
    n_vals = int((np.bincount(arr, minlength=256)
                  [np.nonzero(glob_idx < 0)[0]] > 0).sum()) + seen
    for ofs in range(0, len(arr), 1 << 16):
        chunk = arr[ofs:ofs + (1 << 16)]
        vals, first = np.unique(chunk, return_index=True)
        for v in vals[np.argsort(first)]:
            if glob_idx[v] < 0:
                glob_idx[v] = seen
                seen += 1
        if seen == n_vals:
            break
    return seen


_TMAP_CACHE: dict = {}
_TMAP_CACHE_MAX = 8


def _prep(reads: Sequence[bytes], target: bytes):
    """Vectorised alphabet transform (reference first-appearance order,
    target first then reads in call order): one pass over the concatenated
    bytes instead of a per-read python loop — at 10k+ reads the encode is
    otherwise the e2e bottleneck.

    Returns (read_ids list, t_ids, sigma, flat) where flat = (ids_2d,
    qlen) when every read has the same length (the mapping fast path
    packs that 2-D array straight onto the device) else None.  The
    target-side transform is cached by content digest — real mapping
    streams many read batches against one reference, and reads only ever
    EXTEND the map (target symbols come first), so the cached target ids
    stay valid."""
    import hashlib

    t_arr = np.frombuffer(target, dtype=np.uint8)
    t_key = hashlib.blake2b(target, digest_size=16).digest()
    hit = _TMAP_CACHE.pop(t_key, None)
    if hit is None:
        glob_idx = np.full(256, -1, dtype=np.int32)
        seen = _first_appearance_map(t_arr, glob_idx, 0)
        t_ids = glob_idx[t_arr].astype(np.int32)
        hit = (glob_idx, seen, t_ids)
    _TMAP_CACHE[t_key] = hit
    while len(_TMAP_CACHE) > _TMAP_CACHE_MAX:
        _TMAP_CACHE.pop(next(iter(_TMAP_CACHE)))
    glob_idx0, seen0, t_ids = hit

    lens = [len(r) for r in reads]
    cat = (np.frombuffer(b"".join(reads), dtype=np.uint8)
           if reads else np.empty(0, np.uint8))
    if (glob_idx0[cat] < 0).any():
        glob_idx = glob_idx0.copy()
        seen = _first_appearance_map(cat, glob_idx, seen0)
    else:
        glob_idx, seen = glob_idx0, seen0
    ids = glob_idx[cat].astype(np.int32)
    flat = None
    if reads and lens.count(lens[0]) == len(lens) and lens[0] > 0:
        ids2d = ids.reshape(len(reads), lens[0])
        read_ids = list(ids2d)
        flat = (ids2d, lens[0])
    else:
        read_ids = (np.split(ids, np.cumsum(lens)[:-1]) if reads else [])
    return read_ids, t_ids, seen, flat


def map_reads(reads: Sequence, target, mode="HW", k: int = -1, mesh=None
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Best-hit mapping of reads against one shared target.

    Returns (best int64 (B,), end_pos int64 (B,)): best = minimal edit
    distance of read vs any target window (HW) / prefix end (SHW); end_pos
    = smallest end position achieving it.  best > k (when k >= 0) is
    reported as -1 with end_pos -1.

    mesh: optional ``jax.sharding.Mesh`` ("dp", "sp") — reads shard over
    "dp", the target shards over "sp" with halo slices (HW), and the
    (best, first-pos) merge happens on device via pmin collectives.
    """
    mode = AlignMode.parse(mode)
    if mode == AlignMode.NW:
        raise ValueError("map_reads is for semiglobal modes (HW/SHW)")
    if isinstance(target, str):
        target = target.encode()
    reads_b = [r.encode() if isinstance(r, str) else bytes(r) for r in reads]
    read_ids, t_ids, sigma, flat = _prep(reads_b, bytes(target))
    B = len(reads_b)
    best = np.full(B, -1, dtype=np.int64)
    pos = np.full(B, -1, dtype=np.int64)
    if B == 0 or len(t_ids) == 0:
        if B and len(t_ids) == 0:
            # Empty target: best = read length at position -1 (edlib
            # empty-sequence convention).
            for i, r in enumerate(read_ids):
                if k < 0 or len(r) <= k:
                    best[i] = len(r)
        return best, pos

    hin0 = 0 if mode == AlignMode.HW else 1
    dev = None
    import os as _os
    if mesh is None and mode == AlignMode.HW:
        # Raw DP cells, the same metric batch.py passes (sum qlen*tlen) —
        # EDLIB_TPU_AUTO_MESH_MIN_CELLS must mean one thing at both sites.
        mesh = _auto_mesh(sum(len(r) for r in read_ids) * len(t_ids))
    if mesh is not None and mode == AlignMode.HW:
        forced = _os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
        if forced or all(d.platform == "tpu" for d in mesh.devices.flat):
            # Pruned path first: the sharded filter weak-scales with zero
            # collectives; the full sharded sweep is the fallback.
            dev = _map_reads_filtered(read_ids, t_ids, sigma, k, forced,
                                      mesh=mesh, flat=flat)
        if dev is None:
            dev = _map_reads_sharded(read_ids, t_ids, sigma, mesh)
    if dev is None and mode == AlignMode.SHW:
        # SHW spans are target PREFIXES: any alignment with score <= r
        # ends within the first qmax + r columns (score at end e is
        # >= e+1-qlen), so one sweep of that slice resolves every read
        # whose best is <= r, ties and first-position included — the
        # anchored-prefix counterpart of the HW q-gram pruning.  A
        # doubling ladder (the reference's dynamic-k pattern,
        # edlib.cpp:199-217) covers unresolved reads.
        dev = _map_reads_shw_pruned(read_ids, t_ids, sigma, k)
    if (dev is None
            and mode == AlignMode.HW and B <= 64 and len(t_ids) >= 50_000
            and not _os.environ.get("EDLIB_TPU_DISABLE_DEVICE")):
        # Few reads vs a huge target: lanes would sit idle in the batched
        # kernel — segment the target instead (ops/segmented.py).
        dev = _map_reads_segmented(read_ids, t_ids, sigma)
    if dev is None:
        dev = _map_reads_device(read_ids, t_ids, sigma, hin0, k, flat=flat)
    if dev is None:
        # Host path: per-read native align() already applies the -1
        # candidate and k filtering — its results are final.
        return _map_reads_host(reads_b, target, mode, k)
    raw_best, raw_pos = dev
    b = np.asarray(raw_best, dtype=np.int64)
    p = np.asarray(raw_pos, dtype=np.int64)
    qlens = np.fromiter((len(r) for r in read_ids), np.int64, B)
    # The -1 end-location candidate (score exactly qlen; edlib 64-bit
    # padding emulation) sorts before any real position.
    cap = (qlens % 64 != 0) & (qlens <= b)
    b = np.where(cap, qlens, b)
    p = np.where(cap, -1, p)
    ok = (b <= k) if k >= 0 else np.ones(B, bool)
    best[ok] = b[ok]
    pos[ok] = p[ok]
    return best, pos


def _auto_mesh(cells: int):
    """Use every attached chip without being asked: a multi-device all-TPU
    process auto-builds the ("dp", "sp") alignment mesh for slice-worthy
    workloads given their raw DP-cell count (the reference has no
    multi-device story to mirror; a user on a slice should not leave N-1
    chips idle).

    EDLIB_TPU_AUTO_MESH: unset/"" = TPU-only auto (default); "0" = never;
    "1" = any multi-device platform (virtual CPU meshes — tests).
    EDLIB_TPU_AUTO_MESH_MIN_CELLS overrides the workload floor (default
    1e9 raw cells — splitting smaller jobs across chips just multiplies
    dispatch overhead)."""
    import os as _os
    flag = _os.environ.get("EDLIB_TPU_AUTO_MESH", "")
    if flag == "0" or _os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        return None
    floor = int(_os.environ.get("EDLIB_TPU_AUTO_MESH_MIN_CELLS",
                                "1000000000"))
    if cells < floor:  # not slice-worthy; stay off jax entirely
        return None
    try:
        from edlib_tpu.utils import hw
        if flag != "1" and not hw.device_ready():
            return None
        import jax
        devs = jax.devices()
        if len(devs) < 2:
            return None
        if flag != "1" and not all(d.platform == "tpu" for d in devs):
            return None
        from edlib_tpu.parallel import make_alignment_mesh
        return make_alignment_mesh()
    except Exception:
        return None


def _map_reads_sharded(read_ids, t_ids, sigma, mesh):
    """dp x sp sharded HW best-hit: device-side pmin merge of (best, pos).

    The first-best position comes straight from the collective merge — no
    core streams ship to host (parallel/dist.sharded_hw_locations)."""
    from edlib_tpu import encode
    from edlib_tpu.parallel import dist

    eq = np.eye(sigma, dtype=bool)
    B = len(read_ids)
    n_dev = mesh.devices.size
    sp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("sp", 1)
    dp = n_dev // sp
    B_pad = -(-B // dp) * dp
    nw = encode.num_words(max(len(r) for r in read_ids))
    qmax = max(len(r) for r in read_ids)
    w_max = nw * 32 - min(len(r) for r in read_ids)
    halo = 2 * qmax - 1
    peq = np.zeros((B_pad, sigma + 2, nw), np.uint32)
    peq[:, :sigma + 1] = 0xFFFFFFFF
    w_lanes = np.full(B_pad, w_max, np.int32)
    for b, r in enumerate(read_ids):
        peq[b, :sigma + 1] = encode.build_peq_words(
            r.astype(np.uint8), eq, n_words=nw)
        peq[b, sigma + 1] = 0
        w_lanes[b] = nw * 32 - len(r)
    slices, C = dist.shard_target_slices(np.asarray(t_ids), sigma, sp,
                                         halo, w_max, c_multiple=32)
    b_, pf, _, _ = dist.sharded_hw_locations(
        mesh, peq, slices, halo, w_max, len(t_ids), w_lanes=w_lanes,
        want_hits=False)
    return np.asarray(b_)[:B].astype(np.int64), \
        np.asarray(pf)[:B].astype(np.int64)


def _map_reads_shw_pruned(read_ids, t_ids, sigma, k):
    """SHW best-hit mapping via prefix-slice sweeps (see map_reads).

    Soundness: for read length m, the SHW score at prefix end e is at
    least e + 1 - m (every extra target symbol past the query costs a
    deletion), so a best score b <= r has ALL ends of score <= b inside
    [0, m + r) — the slice sweep's (best, first-pos) equals the
    full-target answer whenever best <= r.  With a user k the single
    r = k pass is complete (best > k reads are reported > k and the
    caller -1s them); with k < 0 unresolved reads double r until the
    slice covers the target.  None when the device path is unavailable
    (caller falls through to the host engines)."""
    import os

    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE") \
            or os.environ.get("EDLIB_TPU_SHW_PRUNE", "") == "0":
        return None
    forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
    B = len(read_ids)
    tlen = len(t_ids)
    qmax = max(len(r) for r in read_ids)
    cells = sum(len(r) for r in read_ids) * tlen
    if not forced and (cells < 50_000_000 or B < 128):
        return None  # pruning exists to make BIG jobs cheap; host is fine
    try:
        import jax
    except Exception:
        return None
    if not forced:
        from edlib_tpu.utils import hw
        if not hw.device_ready() or jax.default_backend() != "tpu":
            return None
    rung = k if k >= 0 else max(64, qmax // 4)
    best = np.full(B, -1, np.int64)
    pos = np.full(B, -1, np.int64)
    todo = list(range(B))
    while todo:
        P = min(qmax + rung, tlen)
        sub = [read_ids[i] for i in todo]
        res = _sweep_reads_shared(sub, t_ids[:P], sigma, 1, forced)
        if res is None:
            return None
        b_s, p_s = res
        if P >= tlen or k >= 0:
            for row, i in enumerate(todo):
                best[i], pos[i] = b_s[row], p_s[row]
            break
        resolved = b_s <= rung
        for row, i in enumerate(todo):
            if resolved[row]:
                best[i], pos[i] = b_s[row], p_s[row]
        todo = [i for row, i in enumerate(todo) if not resolved[row]]
        rung *= 4
    return best, pos


def _map_reads_segmented(read_ids, t_ids, sigma):
    """HW best/pos for few reads vs one long target via target segmentation.

    One kernel dispatch for the whole read set; the (best, first-pos)
    reduction happens on device, so only O(B x n_seg) scalars ship to host
    (ops/segmented.hw_best_segmented) — never O(tlen) streams."""
    from edlib_tpu.ops.segmented import hw_best_segmented
    return hw_best_segmented([r.astype(np.uint8) for r in read_ids],
                             t_ids, sigma)


def _map_reads_host(reads_b, target, mode, k):
    """Per-read single-pair alignment on the host (native banded engine via
    align()); returns FINAL (best, pos) including -1/k conventions."""
    from edlib_tpu.align import align
    B = len(reads_b)
    best = np.full(B, -1, dtype=np.int64)
    pos = np.full(B, -1, dtype=np.int64)
    for i, r in enumerate(reads_b):
        res = align(r, target, mode=mode, k=k)
        if res["editDistance"] >= 0:
            best[i] = res["editDistance"]
            pos[i] = res["locations"][0][1]
    return best, pos


def _map_reads_device(read_ids, t_ids, sigma, hin0, k: int = -1, flat=None):
    """Shared-target Pallas reduction kernel; None when not applicable."""
    import os

    if os.environ.get("EDLIB_TPU_DISABLE_DEVICE"):
        return None
    forced = os.environ.get("EDLIB_TPU_FORCE_PALLAS", "")
    # Tiny workloads are faster on the host (and must not block on a sick
    # accelerator): require enough cells to amortise compile/dispatch.
    cells = sum(len(r) for r in read_ids) * len(t_ids)
    if not forced and cells < 50_000_000:
        return None
    try:
        import jax
    except Exception:
        return None
    if not forced:
        # Bounded subprocess probe before any in-process jax init (a wedged
        # tunneled backend blocks indefinitely in jax.default_backend()).
        from edlib_tpu.utils import hw
        if not hw.device_ready() or jax.default_backend() != "tpu":
            return None
    if hin0 == 0:
        res = _map_reads_filtered(read_ids, t_ids, sigma, k, forced,
                                  flat=flat)
        if res is not None:
            return res
    return _sweep_reads_shared(read_ids, t_ids, sigma, hin0, forced)


def _map_reads_filtered(read_ids, t_ids, sigma, k, forced, mesh=None,
                        flat=None):
    """MXU q-gram prefilter + windowed verification (ops/qfilter.py) — the
    batched-TPU equivalent of the reference's Ukkonen pruning
    (edlib.cpp:601-642): candidate elimination before the DP instead of a
    per-read adaptive band.  Exact: reads the filter cannot resolve (low
    complexity, best above the rung when k < 0) fall back to the full
    sweep.  None when the filter does not apply (geometry/vocab/size).

    mesh: shard reads over every mesh axis (the per-target index is
    replicated; reads are independent, so the sharded filter needs ZERO
    collectives — weak scaling is embarrassingly parallel)."""
    import os

    from edlib_tpu.ops import qfilter as qf

    flag = os.environ.get("EDLIB_TPU_QFILTER", "")
    if flag == "0":
        return None
    B = len(read_ids)
    tlen = len(t_ids)
    if flag != "1" and (B < 128 or tlen < 32768):
        return None  # filter overhead beats the plain sweep only at size
    qmax = max(len(r) for r in read_ids)
    qmin = min(len(r) for r in read_ids)
    # k < 0 (report every read's true best): run the filter at a rung that
    # resolves typical mapping reads; the rest fall back to the full sweep.
    # qmax//10 keeps tau = (qlen-q+1) - rung*q well above the shared-gram
    # counts of real-genome windows (correlated oligo usage gives them a
    # much fatter tail than the random-sequence noise model; measured on
    # the 1 Mbp chromosome: rung=qlen/10 resolves 99.7%+, rung=qlen/8
    # collapses to ~50%).
    rung = k if k >= 0 else max(8, qmax // 10)
    geom = qf.window_geometry(tlen, qmax, rung)
    if geom is None:
        return None
    L, stride, n_win = geom
    # Presence-table HBM budget: (n_win + B) rows of vocab+1 bf16 entries
    # must fit comfortably; passing the bound INTO choose_q makes an
    # over-ambitious q-bump degrade to the un-bumped q instead of
    # disabling the filter outright.
    vocab_cap = (6 << 30) // (2 * (n_win + B)) - 1
    import jax.numpy as jnp
    n_words = encode.num_words(qmax)
    chunk = 256
    Lv = qf.verify_cols(L, n_words, chunk)
    env_maxc = os.environ.get("EDLIB_TPU_QFILTER_MAXC")
    # The auto-tuner starts at the model's MINIMAL q (bump=False) and
    # escalates on probe evidence — the filter matmul is FLOP-bound at
    # vocab = sigma**q, so the static one-order safety bump costs
    # sigma x the FLOPs; the env-override path keeps the bump (no
    # measurement backs it up there).
    q = qf.choose_q(sigma, qmin, rung, L, max_vocab=vocab_cap,
                    bump=env_maxc is not None)
    if q is None:
        return None
    if env_maxc is not None:
        # Explicit override: trust the caller's candidate budget.
        maxc = min(int(env_maxc), n_win)
        win_pres, win_syms = _target_index_cached(t_ids, sigma, q, L,
                                                  stride, n_win, Lv)
    else:
        # Derive (q, maxc) from the target index itself (qf.auto_tune):
        # probe reads sampled from the target run the filter's first
        # stage, the p99 pass count picks maxc, q escalates while the
        # tail stays unbounded, and repeat-rich targets where candidate
        # elimination cannot work disable the filter outright instead of
        # paying a fallback sweep per read.  Cached per target+geometry.
        tuned = _auto_tune_cached(t_ids, sigma, q, rung, qmin, L, stride,
                                  n_win, Lv, vocab_cap)
        if tuned is None:
            return None
        q, maxc, win_pres, win_syms = tuned
    from edlib_tpu.ops import pallas_kernel as pk
    if sigma <= 255 and (
            sigma + 2 <= pk.max_sigma1(n_words, shared=False)
            or pk.bitplane_ok(n_words, sigma, 1)):
        # Fused single-dispatch path: filter + top-FB straggler fallback
        # (segmented full-target sweep) + on-device merge in ONE jitted
        # program, ONE packed upload and ONE packed download — the
        # tunneled device pays ~25 ms RTT per buffer, which otherwise
        # dominates genome-scale mapping calls (docs/PERF.md round 5).
        # Under a mesh the same body runs per shard (reads shard, index
        # replicated, zero collectives).
        return _map_reads_fused(read_ids, t_ids, sigma, k, rung, forced,
                                flat, qmax, qmin, n_words, chunk, maxc, q,
                                L, stride, win_pres, win_syms, mesh=mesh)
    dt = np.int32 if sigma > 255 else np.uint8   # reads ship 4x smaller
    if qmin == qmax:
        q_arr = np.ascontiguousarray(np.stack(read_ids), dtype=dt)
        qlens = np.full(B, qmax, np.int32)
    else:
        q_arr = np.zeros((B, qmax), dt)
        qlens = np.zeros(B, np.int32)
        for i, r in enumerate(read_ids):
            q_arr[i, :len(r)] = r
            qlens[i] = len(r)
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        B_pad = -(-B // n_dev) * n_dev
        if B_pad != B:   # pad lanes: full-length null reads, sliced away
            q_arr = np.vstack([q_arr,
                               np.zeros((B_pad - B, qmax), q_arr.dtype)])
            qlens = np.concatenate([qlens,
                                    np.full(B_pad - B, qmax, np.int32)])
        f = _filtered_mesh_fn(mesh, sigma, q, L, stride, tlen, rung, maxc,
                              n_words, chunk, forced == "interpret")
        gbest, gpos, resolved = f(q_arr, qlens, win_pres, win_syms)
    else:
        gbest, gpos, resolved = qf.filter_verify_batch(
            jnp.asarray(q_arr), jnp.asarray(qlens), win_pres, win_syms,
            sigma=sigma, q=q, L=L, stride=stride, tlen=tlen, k=rung,
            maxc=maxc, nw=n_words, chunk=chunk,
            interpret=(forced == "interpret"))
    gbest = np.asarray(gbest)[:B].astype(np.int64)
    gpos = np.asarray(gpos)[:B].astype(np.int64)
    resolved = np.asarray(resolved)[:B]
    # resolved & gbest > rung == k proves best > k (caller reports -1);
    # with no user cap every such read needs its true best -> full sweep.
    need = ~resolved if k >= 0 else (~resolved | (gbest > rung))
    if need.any():
        idxs = np.nonzero(need)[0]
        sub = [read_ids[i] for i in idxs]
        fb = None
        if len(sub) <= _SEG_FB_B and mesh is None:
            # Few stragglers: fan each over cached target segments (64x64
            # lanes) instead of padding the shared sweep to a full kernel
            # tile — ~50x less DP work, and the padded target stays
            # device-resident across calls.
            fb = _segmented_fallback(sub, t_ids, sigma, forced)
        if fb is None:
            # Shared sweep: its device target chunks are cached too.
            fb = _sweep_reads_shared(sub, t_ids, sigma, 0, forced)
        if fb is None:
            return None
        gbest[idxs], gpos[idxs] = fb
    return gbest, gpos


_SEG_FB_B = 64
_QF_BIG = 1 << 30


@_functools.lru_cache(maxsize=None)
def _fused_filter_fn(sigma, q, L, stride, tlen, rung, maxc, nw, chunk,
                     n_seg, core, seg_L, halo, k_is_user, interpret,
                     mesh=None, pack2=0):
    """Jitted fused program: q-gram filter + verification + a fixed-width
    segmented full-target sweep for the first _SEG_FB_B unresolved reads
    + on-device merge.  Built once per static geometry; takes ONE packed
    read buffer and returns ONE packed (3, B) int32 result — over a
    tunneled backend every extra buffer costs an RTT.

    mesh: shard reads over every mesh axis (indexes replicated) — each
    shard runs the identical fused body, stragglers fall back WITHIN
    their shard (zero collectives, embarrassingly-parallel weak
    scaling)."""
    import jax
    import jax.numpy as jnp

    from edlib_tpu.ops import pallas_kernel as pk
    from edlib_tpu.ops import qfilter as qf

    seg_cols = np.minimum(core, tlen - core * np.arange(n_seg)).astype(
        np.int32)

    def f(q_buf, win_pres, win_syms, seg_padded):
        B = q_buf.shape[0]
        if pack2:
            # sigma <= 4 reads ship 4 bases/byte (2-bit packed): the
            # tunnel upload is the next-largest e2e cost after compute.
            nb4 = q_buf.shape[1] - 2
            qmax = pack2
            sh2 = jnp.arange(4, dtype=jnp.uint8) * 2
            qa = ((q_buf[:, :nb4, None] >> sh2) & 3).astype(
                jnp.int32).reshape(B, nb4 * 4)[:, :qmax]
            qlens = (q_buf[:, nb4].astype(jnp.int32)
                     + (q_buf[:, nb4 + 1].astype(jnp.int32) << 8))
        else:
            # uint8 symbols (the fused gate requires sigma <= 255) +
            # little-endian uint16 qlen in the two trailing bytes.
            qmax = q_buf.shape[1] - 2
            qa = q_buf[:, :qmax].astype(jnp.int32)
            qlens = (q_buf[:, qmax].astype(jnp.int32)
                     + (q_buf[:, qmax + 1].astype(jnp.int32) << 8))
        gb, gp, rs = qf.filter_verify_batch(
            qa, qlens, win_pres, win_syms, sigma=sigma, q=q, L=L,
            stride=stride, tlen=tlen, k=rung, maxc=maxc, nw=nw,
            chunk=chunk, interpret=interpret)
        # resolved & gb > rung == k proves best > k (the caller reports
        # -1); with no user cap every such read needs its true best.
        # qlen == 0 marks mesh pad lanes: never fallback, results sliced
        # away by the caller.
        need = (~rs if k_is_user else ((~rs) | (gb > rung))) & (qlens > 0)
        FB = min(_SEG_FB_B, B)
        rank = jnp.cumsum(need.astype(jnp.int32)) - 1
        granted = need & (rank < FB)
        ar = jnp.arange(B, dtype=jnp.int32)
        order = jnp.argsort(jnp.where(need, ar, B + ar))[:FB]

        def run_fb(_):
            w_fb = nw * 32 - qlens[order]                     # (FB,)
            idx = (core * jnp.arange(n_seg, dtype=jnp.int32)[:, None]
                   + jnp.arange(seg_L, dtype=jnp.int32)[None, :])
            slices = seg_padded[idx]                          # (n_seg, L)
            tg = jnp.broadcast_to(
                slices[None], (FB, n_seg, seg_L)).reshape(FB * n_seg,
                                                          seg_L)
            lo = jnp.broadcast_to((halo + w_fb)[:, None], (FB, n_seg))
            hi = (halo + w_fb)[:, None] + jnp.asarray(seg_cols)[None, :]
            if sigma > 32:
                # Bit-plane sweep (identity equality; the segmented NULL
                # halo symbol sigma+1 matches no READ symbol and is not
                # the wildcard, so real rows mismatch it exactly like the
                # zeroed null Peq row).  PAD rows do match nulls here
                # (unlike the zero row) — unobservable: a bottom-row path
                # takes exactly w pad steps, all at columns AFTER its
                # real span's end >= halo, so pad-null contact never
                # reaches the readout window [halo+w, ...).  No select
                # chain, no alphabet cap.
                q_alts, pad_words = pk.bitplane_identity_operands(
                    qa[order], qlens[order], sigma, nw)
                fb_best, fb_pf, _, _ = pk.reduce_flat_device_bitplane(
                    jnp.repeat(q_alts, n_seg, axis=0),
                    jnp.repeat(pad_words, n_seg, axis=0), tg,
                    lo.reshape(-1), hi.reshape(-1), hin0=0, sigma=sigma,
                    interpret=interpret)
            else:
                peq = pk.build_peq_device(qa, qlens, sigma, nw)
                peq_fb = jnp.concatenate(
                    [peq[order], jnp.zeros((FB, 1, nw), jnp.uint32)],
                    axis=1)
                peq_rep = jnp.broadcast_to(
                    peq_fb[:, None], (FB, n_seg, sigma + 2, nw)).reshape(
                    FB * n_seg, sigma + 2, nw)
                fb_best, fb_pf, _, _ = pk.reduce_flat_device(
                    peq_rep, tg, lo.reshape(-1), hi.reshape(-1), hin0=0,
                    interpret=interpret)
            fb_best = fb_best.reshape(FB, n_seg)
            fb_pf = fb_pf.reshape(FB, n_seg)
            bmin = fb_best.min(1)
            gpos_seg = (core * jnp.arange(n_seg, dtype=jnp.int32))[None, :] \
                + fb_pf - halo - w_fb[:, None]
            pmin = jnp.where(fb_best == bmin[:, None], gpos_seg,
                             _QF_BIG).min(1)
            return bmin.astype(jnp.int32), pmin.astype(jnp.int32)

        def no_fb(_):
            return (jnp.full((FB,), _QF_BIG, jnp.int32),
                    jnp.full((FB,), _QF_BIG, jnp.int32))

        fb_b, fb_p = jax.lax.cond(need.any(), run_fb, no_fb, None)
        g_at = granted[order]
        gb2 = gb.at[order].set(
            jnp.where(g_at, fb_b, gb[order].astype(jnp.int32)))
        gp2 = gp.at[order].set(
            jnp.where(g_at, fb_p, gp[order].astype(jnp.int32)))
        unhandled = need & ~granted
        return jnp.stack([gb2.astype(jnp.int32), gp2.astype(jnp.int32),
                          unhandled.astype(jnp.int32)], axis=0)

    if mesh is None:
        return jax.jit(f)
    from jax.sharding import PartitionSpec as P

    from edlib_tpu.parallel.dist import shard_map

    axes = tuple(mesh.axis_names)
    return jax.jit(shard_map(f, mesh=mesh,
                             in_specs=(P(axes), P(), P(), P()),
                             out_specs=P(None, axes), check_vma=False))


def _map_reads_fused(read_ids, t_ids, sigma, k, rung, forced, flat, qmax,
                     qmin, n_words, chunk, maxc, q, L, stride, win_pres,
                     win_syms, mesh=None):
    """Single-dispatch filtered mapping (see _fused_filter_fn)."""
    import jax.numpy as jnp

    from edlib_tpu.ops.segmented import plan_segments

    B = len(read_ids)
    B_pad = B if mesh is None else \
        -(-B // int(mesh.devices.size)) * int(mesh.devices.size)
    tlen = len(t_ids)
    FB = min(_SEG_FB_B, B)
    w_max = n_words * 32 - qmin
    halo = 2 * qmax - 1
    n_seg, core = plan_segments(tlen, halo, w_max,
                                max_lanes=max(1, 4096 // FB))
    seg_L = halo + core + w_max
    seg_padded = _seg_padded_cached(t_ids, sigma, halo, n_seg, core, w_max)
    pack2 = 0
    if flat is not None and sigma <= 4:
        # DNA ships 4 bases/byte: the read upload is the next-largest
        # e2e cost after compute on the tunneled backend.
        ids2d, qlen0 = flat
        pack2 = qmax
        nb4 = -(-qmax // 4)
        pad4 = np.zeros((B, nb4 * 4), np.uint8)
        pad4[:, :qmax] = ids2d
        q_buf = np.zeros((B_pad, nb4 + 2), np.uint8)  # pad lanes: qlen=0
        q_buf[:B, :nb4] = (pad4[:, 0::4] | (pad4[:, 1::4] << 2)
                           | (pad4[:, 2::4] << 4) | (pad4[:, 3::4] << 6))
        q_buf[:B, nb4] = qlen0 & 0xFF
        q_buf[:B, nb4 + 1] = qlen0 >> 8
    elif flat is not None and sigma <= 255:
        ids2d, qlen0 = flat
        q_buf = np.zeros((B_pad, qmax + 2), np.uint8)
        q_buf[:B, :qmax] = ids2d
        q_buf[:B, qmax] = qlen0 & 0xFF
        q_buf[:B, qmax + 1] = qlen0 >> 8
    else:
        q_buf = np.zeros((B_pad, qmax + 2), np.uint8)  # pad lanes: qlen=0
        for i, r in enumerate(read_ids):
            q_buf[i, :len(r)] = r
            q_buf[i, qmax] = len(r) & 0xFF
            q_buf[i, qmax + 1] = len(r) >> 8
    fn = _fused_filter_fn(sigma, q, L, stride, tlen, rung, maxc, n_words,
                          chunk, n_seg, core, seg_L, halo, k >= 0,
                          forced == "interpret", mesh=mesh, pack2=pack2)
    packed = np.asarray(fn(jnp.asarray(q_buf), win_pres, win_syms,
                           seg_padded))[:, :B]
    gbest = packed[0].astype(np.int64)
    gpos = packed[1].astype(np.int64)
    unhandled = packed[2].astype(bool)
    if unhandled.any():
        # More than FB stragglers (rare — resolved rates run 99.5%+ on
        # real genomes): the rest take the cached shared sweep.
        idxs = np.nonzero(unhandled)[0]
        fb = _sweep_reads_shared([read_ids[i] for i in idxs], t_ids,
                                 sigma, 0, forced)
        if fb is None:
            return None
        gbest[idxs], gpos[idxs] = fb
    return gbest, gpos


def _seg_padded_cached(t_ids, sigma, halo, n_seg, core, w_max):
    """Device-resident segmented-sweep target (halo of NULLs, wildcard
    tail), cached by content digest + geometry (see _INDEX_CACHE)."""
    import hashlib

    import jax.numpy as jnp

    t_np = np.ascontiguousarray(np.asarray(t_ids, np.int32))
    tlen = len(t_np)
    null_sym, wild = sigma + 1, sigma
    key = (hashlib.blake2b(t_np.tobytes(), digest_size=16).digest(),
           "segfb", sigma, halo, n_seg, core, w_max)
    padded = _INDEX_CACHE.pop(key, None)
    if padded is None:
        padded = jnp.concatenate([
            jnp.full((halo,), null_sym, jnp.int32), jnp.asarray(t_np),
            jnp.full((n_seg * core - tlen + w_max,), wild, jnp.int32)])
    _INDEX_CACHE[key] = padded
    while len(_INDEX_CACHE) > _INDEX_CACHE_MAX:
        _INDEX_CACHE.pop(next(iter(_INDEX_CACHE)))
    return padded


@_functools.lru_cache(maxsize=None)
def _seg_fb_fn(sigma, n_words, n_seg, core, L, interpret):
    """Jitted segmented-fallback program, built once per static geometry
    (eager reduce_flat_device would pay one tunnel RTT per jnp op)."""
    import jax
    import jax.numpy as jnp

    from edlib_tpu.ops import pallas_kernel as pk

    def f(padded, peq, lo, hi):
        idx = (core * jnp.arange(n_seg, dtype=jnp.int32)[:, None]
               + jnp.arange(L, dtype=jnp.int32)[None, :])
        slices = padded[idx]                                 # (n_seg, L)
        B = peq.shape[0]
        tg = jnp.broadcast_to(slices[None], (B, n_seg, L)).reshape(
            B * n_seg, L)
        peq_rep = jnp.broadcast_to(
            peq[:, None], (B, n_seg, sigma + 2, n_words)).reshape(
            B * n_seg, sigma + 2, n_words)
        return pk.reduce_flat_device(peq_rep, tg, lo.reshape(-1),
                                     hi.reshape(-1), hin0=0,
                                     interpret=interpret)[:2]

    return jax.jit(f)


def _segmented_fallback(read_ids, t_ids, sigma, forced):
    """(best, pos) for <= _SEG_FB_B reads vs the full target via the
    segmented HW invariant (ops/segmented.py), with a FIXED 64-read plan so
    the compiled program and the device-resident padded target are reused
    across calls regardless of how many stragglers each batch produces."""
    import jax.numpy as jnp

    from edlib_tpu.ops import pallas_kernel as pk
    from edlib_tpu.ops.segmented import plan_segments

    B = len(read_ids)
    tlen = len(t_ids)
    qmax = max(len(r) for r in read_ids)
    n_words = encode.num_words(qmax)
    if sigma + 2 > pk.max_sigma1(n_words, shared=False):
        return None
    qmin = min(len(r) for r in read_ids)
    w_max = n_words * 32 - qmin
    halo = 2 * qmax - 1
    n_seg, core = plan_segments(tlen, halo, w_max,
                                max_lanes=max(1, 4096 // _SEG_FB_B))
    L = halo + core + w_max
    padded = _seg_padded_cached(t_ids, sigma, halo, n_seg, core, w_max)

    eq = np.eye(sigma, dtype=bool)
    peq = np.zeros((_SEG_FB_B, sigma + 2, n_words), np.uint32)
    lo = np.zeros((_SEG_FB_B, n_seg), np.int32)   # pad lanes: empty window
    hi = np.zeros((_SEG_FB_B, n_seg), np.int32)
    seg_cols = np.minimum(core, tlen - core * np.arange(n_seg))
    for i, r in enumerate(read_ids):
        peq[i, :sigma + 1] = encode.build_peq_words(
            np.asarray(r, np.uint8), eq, n_words=n_words)
        peq[i, sigma + 1] = 0
        w_i = n_words * 32 - len(r)
        lo[i] = halo + w_i
        hi[i] = halo + w_i + seg_cols
    fn = _seg_fb_fn(sigma, n_words, n_seg, core, L,
                    forced == "interpret")
    best, pfirst = fn(padded, jnp.asarray(peq), jnp.asarray(lo),
                      jnp.asarray(hi))
    best = np.asarray(best).reshape(_SEG_FB_B, n_seg).astype(np.int64)
    pfirst = np.asarray(pfirst).reshape(_SEG_FB_B, n_seg).astype(np.int64)
    out_best = np.empty(B, np.int64)
    out_pos = np.empty(B, np.int64)
    seg_base = core * np.arange(n_seg)
    for i, r in enumerate(read_ids):
        w_i = n_words * 32 - len(r)
        b = best[i].min()
        gpos = seg_base + (pfirst[i] - halo - w_i)
        out_best[i] = b
        out_pos[i] = gpos[best[i] == b].min()
    return out_best, out_pos


_INDEX_CACHE: dict = {}          # geometry+digest -> device index arrays
_INDEX_CACHE_MAX = 8


@_functools.lru_cache(maxsize=None)
def _filtered_mesh_fn(mesh, sigma, q, L, stride, tlen, rung, maxc, nw,
                      chunk, interpret):
    """Build + jit the mesh-sharded filter program ONCE per static config
    (a fresh closure per call would defeat jax's compile cache — see
    parallel/dist._hw_locations_fn).  Reads shard over every axis; the
    target index rides in as replicated ARGUMENTS (closing over the
    arrays would bake them into the executable per target)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from edlib_tpu.ops import qfilter as qf
    from edlib_tpu.parallel.dist import shard_map

    axes = tuple(mesh.axis_names)

    def local(qa, ql, wp, ws):
        return qf.filter_verify_batch(
            qa, ql, wp, ws, sigma=sigma, q=q, L=L, stride=stride,
            tlen=tlen, k=rung, maxc=maxc, nw=nw, chunk=chunk,
            interpret=interpret)

    return jax.jit(shard_map(local, mesh=mesh,
                             in_specs=(P(axes), P(axes), P(), P()),
                             out_specs=(P(axes), P(axes), P(axes)),
                             check_vma=False))


def _auto_tune_cached(t_ids, sigma, q0, rung, qmin, L, stride, n_win, Lv,
                      vocab_cap):
    """Cached qf.auto_tune verdict for one target+geometry: (q, maxc,
    win_pres, win_syms), or None when the filter cannot bound the
    target's shared-gram tail (repeat-rich: route to the full sweep)."""
    import hashlib

    from edlib_tpu.ops import qfilter as qf

    t_np = np.ascontiguousarray(np.asarray(t_ids, np.int32))
    key = (hashlib.blake2b(t_np.tobytes(), digest_size=16).digest(),
           "tune", sigma, rung, qmin, L, stride, n_win, Lv)
    hit = _INDEX_CACHE.pop(key, None)
    if hit is None:
        q, maxc, _, _, pred = qf.auto_tune(
            t_np, sigma, q0, rung, qmin, L, stride, n_win, Lv,
            index_builder=lambda qq: _target_index_cached(
                t_ids, sigma, qq, L, stride, n_win, Lv),
            max_vocab=vocab_cap)
        hit = (q, maxc, pred)
    _INDEX_CACHE[key] = hit
    while len(_INDEX_CACHE) > _INDEX_CACHE_MAX:
        _INDEX_CACHE.pop(next(iter(_INDEX_CACHE)))
    q, maxc, pred = hit
    if q is None:
        return None
    if sigma ** q > vocab_cap:
        # The cached verdict was tuned under a DIFFERENT call's HBM
        # budget (vocab_cap depends on batch size); this call's read
        # presence table would blow it — honest fallback to the sweep
        # rather than an on-device OOM.
        return None
    win_pres, win_syms = _target_index_cached(t_ids, sigma, q, L, stride,
                                              n_win, Lv)
    return q, maxc, win_pres, win_syms


def _target_index_cached(t_ids, sigma, q, L, stride, n_win, Lv):
    """Device-resident per-target q-gram index, cached across map_reads
    calls: real mapping streams many read batches against one reference,
    and over a tunneled backend the 4 MB+ target transfer plus the index
    rebuild would otherwise dominate each call.  Keyed by content digest
    (cheap vs the transfer it saves) + geometry."""
    import hashlib

    import jax.numpy as jnp

    from edlib_tpu.ops import qfilter as qf

    t_np = np.ascontiguousarray(np.asarray(t_ids, np.int32))
    key = (hashlib.blake2b(t_np.tobytes(), digest_size=16).digest(),
           sigma, q, L, stride, n_win, Lv)
    hit = _INDEX_CACHE.pop(key, None)
    if hit is None:
        hit = qf.build_target_index(jnp.asarray(t_np), sigma, q, L, stride,
                                    n_win, Lv)
    _INDEX_CACHE[key] = hit                      # re-insert: LRU order
    while len(_INDEX_CACHE) > _INDEX_CACHE_MAX:
        _INDEX_CACHE.pop(next(iter(_INDEX_CACHE)))
    return hit


def _target_chunks_cached(t_ids, sigma, w, chunk):
    """Device-resident padded target chunks for the shared sweep, cached by
    content digest + pad geometry: repeated map_reads calls against the
    same reference (and the filter path's fallback sweeps) skip the
    multi-MB host->device target transfer."""
    import hashlib

    import jax.numpy as jnp

    t_np = np.ascontiguousarray(np.asarray(t_ids, np.int32))
    tlen = len(t_np)
    n_chunks = -(-(tlen + w) // chunk)
    key = (hashlib.blake2b(t_np.tobytes(), digest_size=16).digest(),
           sigma, w, chunk)
    hit = _INDEX_CACHE.pop(key, None)
    if hit is None:
        src = t_np.astype(np.uint8) if sigma <= 255 else t_np
        tg = jnp.full((n_chunks * chunk,), sigma, jnp.int32)
        hit = tg.at[:tlen].set(jnp.asarray(src).astype(jnp.int32)).reshape(
            n_chunks, 1, chunk)
    _INDEX_CACHE[key] = hit
    while len(_INDEX_CACHE) > _INDEX_CACHE_MAX:
        _INDEX_CACHE.pop(next(iter(_INDEX_CACHE)))
    return hit


def _sweep_reads_shared(read_ids, t_ids, sigma, hin0, forced):
    """Full shared-target sweep (no pruning); None when not applicable."""
    from edlib_tpu.ops import pallas_kernel as pk

    import jax.numpy as jnp

    B = len(read_ids)
    qmax = max(len(r) for r in read_ids)
    n_words = encode.num_words(qmax)
    # Shared-target kernels have no select chain: cap is VMEM-residency.
    if sigma + 1 > pk.max_sigma1(n_words, shared=True):
        return None
    # Uniform word count requirement: the kernel's column->position mapping
    # uses one W per call; group lanes by per-read W on host afterwards.
    # Simplest exact scheme: pad every read's PROFILE to n_words with
    # wildcards and shift its own W; the kernel reduces over columns
    # [w_min, w_min + tlen) ... to stay exact per read we run per distinct W
    # when mixed.  Mixed-length batches are uncommon for mapping; group:
    groups = {}
    for i, r in enumerate(read_ids):
        w = n_words * 32 - len(r)
        groups.setdefault(w, []).append(i)

    chunk = 256
    tlen = len(t_ids)
    best = np.empty(B, np.int64)
    pos = np.empty(B, np.int64)
    for w, idxs in groups.items():
        tg_chunks = _target_chunks_cached(t_ids, sigma, w, chunk)
        Bg = len(idxs)
        B_pad = -(-Bg // pk.B_TILE) * pk.B_TILE
        q_arr = np.full((B_pad, qmax), 0, np.int32)
        qlens = np.zeros(B_pad, np.int32)
        for row, i in enumerate(idxs):
            q_arr[row, :len(read_ids[i])] = read_ids[i]
            qlens[row] = len(read_ids[i])
        peq = pk.build_peq_device(jnp.asarray(q_arr), jnp.asarray(qlens),
                                  sigma, n_words)
        tiles = pk.pack_tiles_device(peq)
        b, p = pk.sweep_best_pallas_shared(
            tiles, tg_chunks, hin0=hin0, col_lo=w,
            col_hi=w + tlen, chunk=chunk,
            interpret=(forced == "interpret"))
        b = np.asarray(b).reshape(-1)[:Bg]
        p = np.asarray(p).reshape(-1)[:Bg] - w
        for row, i in enumerate(idxs):
            best[i] = b[row]
            pos[i] = p[row]
    return best, pos
