"""Benchmark: batched HW alignment throughput (GCUPS) on one chip.

Prints ONE JSON line on stdout (always — see Guarantees):
  {"metric": "batched_hw_gcups", "value": N, "unit": "GCUPS",
   "vs_baseline": N / 80, "note": "..."}

Baseline: the reference's implied naive-cell rate at Q=T=50000 is ~80 GCUPS
on one 2017 CPU core (BASELINE.md).  GCUPS counts query_len * target_len *
batch cells per second — the accounting the baseline figure implies.

Workload: the reference's read-mapping use case on REAL genome data —
the reference's own perf scripts all run on real sequences
(test_data/perf_tests2.sh:80-140).  Batches of reads HW-aligned against
one shared genome-scale target, returning per-read (best score, first
best end position).  The headline attempt is the library's default pruned
path: MXU q-gram prefilter + windowed Pallas verification
(ops/qfilter.py) at LIBRARY-DEFAULT settings (maxc=16, rung=qlen//10)
on test_data/Chromosome_2890043_3890042_0 (1 Mbp E. coli chromosome
slice) tiled to 4 Mbp — a repeat-heavy input (4 exact genome copies)
with the real-genome correlated-oligo tail, NOT a flattering uniform-
random target.  Reads are drawn from the tiled chromosome with 5%
mutations; each rep maps a FRESH read batch against the amortised
per-target index — exactness gated on-chip against the full sweep
(whole batch) and the host bigint engine (sampled reads).  GCUPS counts naive cells (B*Q*T/t), the
same accounting the 80-GCUPS baseline implies for the reference's
Ukkonen-banded implementation; the note carries the raw full-sweep GCUPS
side by side.  Everything is generated, packed, swept, and reduced ON
DEVICE (this host reaches its TPU through a slow, sometimes-wedged tunnel;
only ~KB of results transfer).  Backends run in subprocesses with timeouts
so a wedged accelerator cannot hang the benchmark.

Guarantees (the round-2 failure was rc=124 with NO output):
  1. A native-CPU fallback number is captured FIRST (seconds), so a result
     exists before any device work starts.
  2. Every phase is budgeted against one wall-clock deadline read at start
     (default 840s, env EDLIB_TPU_BENCH_DEADLINE) — probes are 60s x2, and
     at most two pallas attempts are sized to the remaining budget.
  3. SIGTERM/SIGINT/SIGALRM handlers print the best result so far and exit
     0 — if an outer driver timeout fires early, the JSON line still lands.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_GCUPS = 80.0
START = time.time()
DEADLINE = START + float(os.environ.get("EDLIB_TPU_BENCH_DEADLINE", "840"))

B = 8192          # reads per batch (8 kernel tiles; the filter's fixed
                  # per-batch costs — top-k latency, dispatch — amortize
                  # to ~nothing here, +67% GCUPS over 4096, while 16384
                  # adds only ~6% more for twice the memory)
QLEN = 120        # read length (nw=4 words)
TARGET_LEN = 65536
SIGMA = 4
CHUNK = 512
# q-gram-filtered attempt: genome-scale target — the reference's real
# 1 Mbp chromosome tiled to 4 Mbp.  rung K_F = QLEN // 10 = 12 is the
# library's own default rung (mapping.py); (q, maxc) come from the same
# index-derived auto-tuner the library uses (qf.auto_tune), with MAXC_F
# only as the never-taken fallback.  GCUPS accounting stays
# naive-cell-equivalent (B*QLEN*T / t) — the SAME accounting the
# 80-GCUPS baseline implies for the reference's Ukkonen-banded
# implementation, which also skips most cells.
TARGET_LEN_F = 4_194_304
K_F = 12
MAXC_F = 16
GENOME_FASTA = os.path.join(
    os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference"), "test_data",
    "Chromosome_2890043_3890042_0", "Chromosome_2890043_3890042_0.fasta")

_best = None      # dict(gcups=..., note=...) — best result captured so far
_printed = False


def _remaining() -> float:
    return DEADLINE - time.time()


def _log(msg: str) -> None:
    sys.stderr.write("[bench %6.1fs] %s\n" % (time.time() - START, msg))
    sys.stderr.flush()


def print_and_exit(rc: int = 0) -> None:
    """Print the one JSON line (exactly once) and hard-exit.

    Called from the normal path AND from signal handlers; os._exit avoids
    any chance of hanging in child-process cleanup on the way out.
    """
    global _printed
    if _printed:
        os._exit(rc)
    _printed = True
    if _best is None:
        line = {"metric": "batched_hw_gcups", "value": 0.0, "unit": "GCUPS",
                "vs_baseline": 0.0, "note": "all backends failed"}
        rc = 1
    else:
        gcups = _best["gcups"]
        line = {"metric": "batched_hw_gcups", "value": round(gcups, 3),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 4),
                "note": _best["note"]}
    sys.stdout.write(json.dumps(line) + "\n")
    sys.stdout.flush()
    os._exit(rc)


def _on_signal(signum, frame):
    _log("signal %d -> emitting best-so-far result" % signum)
    print_and_exit(0)


_CHILD_CODE = r"""
import json, os, sys, time
import numpy as np
backend = sys.argv[1]
out_path = sys.argv[2]
sys.path.insert(0, sys.argv[3])
B, QLEN, TARGET_LEN, SIGMA, CHUNK, TARGET_LEN_F, K_F, MAXC_F = map(
    int, sys.argv[4:12])
GENOME_FASTA = sys.argv[12]


def load_genome_ids(tlen):
    # Real-chromosome target ids (A,C,G,T -> 0..3, first-appearance order
    # of the reference transform for this file), tiled to tlen; falls back
    # to uniform-random ids (flagged in the note) when the file is absent.
    try:
        raw = open(GENOME_FASTA, "rb").read()
    except OSError:
        rng = np.random.RandomState(7)
        return rng.randint(0, SIGMA, tlen).astype(np.int32), "random-fallback"
    seq = b"".join(l for l in raw.split(b"\n") if not l.startswith(b">"))
    arr = np.frombuffer(seq, np.uint8)
    lut = np.full(256, -1, np.int32)
    order = arr[np.sort(np.unique(arr, return_index=True)[1])]
    for i, c in enumerate(order[:SIGMA]):
        lut[c] = i
    ids = lut[arr]
    ids = ids[ids >= 0].astype(np.int32)
    ids = np.tile(ids, -(-tlen // len(ids)))[:tlen]
    return ids, "Chromosome_2890043_3890042_0 tiled"

from edlib_tpu import encode

def report(seconds, note, reps, tlen=None):
    cells = float(B) * QLEN * (TARGET_LEN if tlen is None else tlen) * reps
    with open(out_path, "w") as f:
        json.dump({"gcups": cells / seconds / 1e9, "seconds": seconds,
                   "note": note}, f)

if backend == "native":
    # ctypes releases the GIL during the C sweep, so threads scale.
    from multiprocessing.dummy import Pool

    from edlib_tpu import native_loader
    assert native_loader.available()
    rng = np.random.RandomState(0)
    target = rng.randint(0, SIGMA, TARGET_LEN).astype(np.int32)
    eq = np.eye(SIGMA, dtype=bool)
    nw64 = encode.num_words(QLEN, 64)
    w64 = nw64 * 64 - QLEN
    t_ext = np.concatenate([target.astype(np.uint8),
                            np.full(w64, SIGMA, np.uint8)])
    n_reads = 512  # sample; native is the fallback path
    reads = [rng.randint(0, SIGMA, QLEN).astype(np.uint8)
             for _ in range(n_reads)]

    def chunk_work(chunk_reads):
        for r in chunk_reads:
            p = encode.build_peq_words(r, eq, word_size=64, n_words=nw64)
            native_loader.sweep_scores_native(p, t_ext, 0)
        return len(chunk_reads)

    n_proc = min(4, os.cpu_count() or 1)
    best_dt = float("inf")
    with Pool(n_proc) as pool:
        for _ in range(3):  # best-of-3: the host runs other work
            t0 = time.time()
            pool.map(chunk_work,
                     [reads[i::n_proc] for i in range(n_proc)])
            best_dt = min(best_dt, time.time() - t0)
    dt = best_dt * (B / n_reads)
    report(dt, f"native-cpu-x{n_proc}", 1)
    sys.exit(0)

import jax
# Persistent compilation cache: repeat benchmark runs skip the (slow,
# sometimes minutes over a tunneled TPU) cold compile.
from edlib_tpu.utils.jaxcache import ensure_compile_cache
ensure_compile_cache()  # shared persistent cache (~/.cache/edlib_tpu)
import jax.numpy as jnp
from edlib_tpu.ops.pallas_kernel import (
    B_TILE, build_peq_device, pack_tiles_device, sweep_best_pallas_shared)

if backend == "qfilter":
    # Read-mapping at genome scale on REAL data: MXU q-gram prefilter +
    # windowed Pallas verification (ops/qfilter.py) over the reference's
    # 1 Mbp chromosome tiled to 4 Mbp, per-target index amortised across
    # batches (each rep maps a FRESH batch of reads).  Exactness is gated
    # on-chip: the full sweep must agree on every resolved read, and the
    # host bigint engine must agree with the sweep on sampled reads.
    from edlib_tpu.ops import qfilter as qfmod
    TF = TARGET_LEN_F
    target_ids, target_src = load_genome_ids(TF)
    nw = encode.num_words(QLEN)
    w = nw * 32 - QLEN
    n_chunks = -(-(TF + w) // CHUNK)
    geom = qfmod.window_geometry(TF, QLEN, K_F)
    assert geom is not None
    L, stride, n_win = geom
    q0 = qfmod.choose_q(SIGMA, QLEN, K_F, L, bump=False)
    assert q0 is not None
    CH_V = 256
    Lv = qfmod.verify_cols(L, nw, CH_V)

    target = jnp.asarray(target_ids)
    qlens = jnp.full((B,), QLEN, jnp.int32)

    @jax.jit
    def make_reads(key, target):
        k2a, k2b, k2c = jax.random.split(key, 3)
        starts = jax.random.randint(k2a, (B,), 0, TF - QLEN)
        idx = starts[:, None] + jnp.arange(QLEN)[None, :]
        reads = target[idx]
        muts = jax.random.uniform(k2b, (B, QLEN)) < 0.05
        rand_sym = jax.random.randint(k2c, (B, QLEN), 0, SIGMA, jnp.int32)
        return jnp.where(muts, rand_sym, reads)

    # Library-default tuning: derive (q, maxc) from the target index
    # itself, exactly like mapping._map_reads_filtered (qf.auto_tune).
    # MAXC_F is only the fallback if the tuner declines (it never does on
    # this target — tuned values land in the note).
    def _builder(qq):
        return qfmod.build_target_index(target, SIGMA, qq, L, stride,
                                        n_win, Lv)

    q, maxc, win_pres, win_syms, _pred = qfmod.auto_tune(
        np.asarray(target_ids), SIGMA, q0, K_F, QLEN, L, stride, n_win,
        Lv, _builder)
    if q is None:
        q, maxc = q0, MAXC_F
        win_pres, win_syms = _builder(q)

    def run(reads, win_pres, win_syms):
        return qfmod.filter_verify_batch(
            reads, qlens, win_pres, win_syms, sigma=SIGMA, q=q, L=L,
            stride=stride, tlen=TF, k=K_F, maxc=maxc, nw=nw, chunk=CH_V)
    reads = make_reads(jax.random.key(0), target)
    gbest, gpos, resolved = run(reads, win_pres, win_syms)
    jax.block_until_ready(gbest)

    # Correctness gate 1: full sweep over the whole batch (raw-GCUPS
    # side-by-side number comes from the second, warm call).
    peq = build_peq_device(reads, qlens, SIGMA, nw)
    tiles = pack_tiles_device(peq)
    tg = jnp.full((n_chunks * CHUNK,), SIGMA, jnp.int32).at[:TF].set(target)
    tg_chunks = tg.reshape(n_chunks, 1, CHUNK)

    def full_sweep():
        return sweep_best_pallas_shared(tiles, tg_chunks, hin0=0, col_lo=w,
                                        col_hi=w + TF, chunk=CHUNK)
    best_s, pos_s = full_sweep()
    np.asarray(best_s)  # warm; the FETCH is the true completion barrier
    t0 = time.time()    # (block_until_ready acks early over the tunnel)
    best_s, pos_s = full_sweep()
    bs = np.asarray(best_s).reshape(-1)[:B]
    raw_gcups = float(B) * QLEN * TF / (time.time() - t0) / 1e9
    ps = np.asarray(pos_s).reshape(-1)[:B] - w
    gb, gp, rs = map(np.asarray, (gbest, gpos, resolved))
    assert rs.mean() >= 0.99, ("filter mistuned", rs.mean())
    inb = rs & (bs <= K_F)
    assert not (inb & ((gb != bs) | (gp != ps))).any(), "filter mismatch"
    assert not (rs & (bs > K_F) & (gb <= K_F)).any(), "false resolve"

    # Correctness gate 2: host bigint engine vs the sweep on sampled reads.
    reads_h = np.asarray(reads)
    target_h = np.asarray(target)
    from edlib_tpu.ops import host as host_engine
    eq = np.eye(SIGMA, dtype=bool)
    for b in (0, B - 1):
        hp = encode.build_peq_bigint(reads_h[b].astype(np.uint8), eq)
        hs = host_engine.semiglobal_scores(hp, target_h, QLEN, "HW")
        assert bs[b] == hs.min(), (b, bs[b], int(hs.min()))
        assert ps[b] == int(np.argmin(hs)), (b, ps[b])

    REPS = 5

    @jax.jit
    def many(target, win_pres, win_syms):
        def body(i, acc):
            r = make_reads(jax.random.fold_in(jax.random.key(2), i), target)
            gb2, gp2, _ = run(r, win_pres, win_syms)
            return acc + gb2.sum() + gp2.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    many(target, win_pres, win_syms).block_until_ready()
    dt = None
    for _ in range(3):
        t0 = time.time()
        int(many(target, win_pres, win_syms))
        dt = min(dt, time.time() - t0) if dt is not None else \
            time.time() - t0
    note = ("qfilter-%s %s T=%d k=%d q=%d maxc=%d (auto-tuned, library "
            "default) exact (resolved=%.4f, 0 mismatch vs full sweep; "
            "raw sweep %.0f GCUPS); naive-cell-equiv accounting, same as "
            "the banded reference baseline" %
            (jax.default_backend(), target_src, TF, K_F, q, maxc,
             rs.mean(), raw_gcups))
    report(dt, note, REPS, tlen=TF)
    sys.exit(0)

nw = encode.num_words(QLEN)
w = nw * 32 - QLEN
t_scan = TARGET_LEN + w
n_chunks = -(-t_scan // CHUNK)

@jax.jit
def make_inputs(key):
    k1, k2 = jax.random.split(key)
    target = jax.random.randint(k1, (TARGET_LEN,), 0, SIGMA, jnp.int32)
    # Reads: random windows of the target with ~5% mutations.
    k2a, k2b, k2c = jax.random.split(k2, 3)
    starts = jax.random.randint(k2a, (B,), 0, TARGET_LEN - QLEN)
    idx = starts[:, None] + jnp.arange(QLEN)[None, :]
    reads = target[idx]
    muts = jax.random.uniform(k2b, (B, QLEN)) < 0.05
    rand_sym = jax.random.randint(k2c, (B, QLEN), 0, SIGMA, jnp.int32)
    reads = jnp.where(muts, rand_sym, reads)
    qlens = jnp.full((B,), QLEN, jnp.int32)
    peq = build_peq_device(reads, qlens, SIGMA, nw)
    tiles = pack_tiles_device(peq)
    tg = jnp.full((n_chunks * CHUNK,), SIGMA, jnp.int32)
    tg = tg.at[:TARGET_LEN].set(target)
    return tiles, tg.reshape(n_chunks, 1, CHUNK), reads, target

tiles, tg_chunks, reads, target = make_inputs(jax.random.key(0))
jax.block_until_ready((tiles, tg_chunks))

def step():
    return sweep_best_pallas_shared(tiles, tg_chunks, hin0=0,
                                    col_lo=w, col_hi=w + TARGET_LEN,
                                    chunk=CHUNK)

best, pos = step()  # compile + warm

# Correctness gate: cross-check reads against the host engine.  The fetch
# also forces true completion (the tunneled backend acks async work early).
best_h = np.asarray(best).reshape(-1)
pos_h = np.asarray(pos).reshape(-1)
reads_h = np.asarray(reads)
target_h = np.asarray(target)
from edlib_tpu.ops import host as host_engine
eq = np.eye(SIGMA, dtype=bool)
for b in (0, B // 2, B - 1):
    hp = encode.build_peq_bigint(reads_h[b].astype(np.uint8), eq)
    hs = host_engine.semiglobal_scores(hp, target_h, QLEN, "HW")
    assert best_h[b] == hs.min(), (b, best_h[b], int(hs.min()))
    assert pos_h[b] - w == int(np.argmin(hs)), (b, pos_h[b] - w)

# Timing: N sweeps chained inside one jit (each rep's input is perturbed so
# the loop body cannot be hoisted), final scalar fetch forces completion.
REPS = 20

@jax.jit
def many(tiles, tg_chunks):
    def body(i, acc):
        tg2 = tg_chunks.at[0, 0, 0].set(i % SIGMA)
        bb, _ = sweep_best_pallas_shared(tiles, tg2, hin0=0, col_lo=w,
                                         col_hi=w + TARGET_LEN, chunk=CHUNK)
        return acc + bb.sum()
    return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

many(tiles, tg_chunks).block_until_ready()  # compile
# Best-of-3: the first invocation of a fresh executable can absorb
# ~0.5-0.7s of lazy finalization (program load / persistent-cache write)
# that block_until_ready on the tunneled backend does not flush; a
# single-call timing under-reports by up to 6x (docs/PERF.md
# "Measurement traps").  ~0.15s per extra call — negligible vs DEADLINE.
dt = None
for _ in range(3):
    t0 = time.time()
    int(many(tiles, tg_chunks))  # scalar fetch = completion barrier
    dt = min(dt, time.time() - t0) if dt is not None else time.time() - t0
report(dt, "pallas-" + jax.default_backend(), REPS)
"""


def try_backend(backend: str, timeout: float):
    timeout = max(5.0, timeout)
    _log("attempt backend=%s timeout=%.0fs" % (backend, timeout))
    with tempfile.NamedTemporaryFile(mode="r", suffix=".json",
                                     delete=False) as tf:
        out_path = tf.name
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD_CODE, backend, out_path, REPO,
             str(B), str(QLEN), str(TARGET_LEN), str(SIGMA), str(CHUNK),
             str(TARGET_LEN_F), str(K_F), str(MAXC_F), GENOME_FASTA],
            capture_output=True, timeout=timeout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr.decode()[-2000:] + "\n")
            return None
        with open(out_path) as f:
            return json.load(f)
    except (subprocess.TimeoutExpired, OSError, ValueError):
        _log("attempt backend=%s did not produce a result" % backend)
        return None
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


_PROBE_CODE = r"""
import sys
import jax, jax.numpy as jnp
if jax.default_backend() != "tpu":
    sys.exit(3)  # no TPU platform at all (jax fell back to CPU)
x = jnp.ones((128, 128))
s = float((x @ x).sum())
sys.exit(0 if s == 128.0 * 128 * 128 else 1)
"""


def probe_device(max_wait_s: float) -> bool:
    """Cheap matmul probes (60s each) until the tunneled device answers or
    the probe budget runs out.  Wedges have been observed to last hours, so
    the default budget is two probes — burning the whole deadline waiting
    would trade a guaranteed fallback number for nothing."""
    start = time.time()
    while True:
        budget = min(60.0, _remaining() - 30.0,
                     max_wait_s - (time.time() - start) + 60.0)
        if budget < 10.0:
            return False
        try:
            proc = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                                  capture_output=True, timeout=budget)
            if proc.returncode == 0:
                return True
            if proc.returncode == 3:
                return False  # no TPU platform registered; waiting is moot
        except (subprocess.TimeoutExpired, OSError):
            pass
        if time.time() - start >= max_wait_s or _remaining() < 90.0:
            return False
        time.sleep(5)


def main():
    global _best
    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, _on_signal)
    # Last-resort alarm: even if the main loop miscounts its budget, the
    # JSON line goes out 10s before the deadline.
    signal.alarm(max(15, int(DEADLINE - START) - 10))

    # Phase 1: capture the native-CPU fallback FIRST — a result now exists
    # no matter what the tunneled device does.
    r = try_backend("native", min(150.0, _remaining() - 30.0))
    if r is not None:
        _best = {"gcups": r["gcups"],
                 "note": r["note"] + " (device unreachable)"}
        _log("fallback captured: %.1f GCUPS" % r["gcups"])

    # Phase 2: probe the device (60s x2 default; EDLIB_TPU_BENCH_WAIT
    # extends it for manual healthy-window hunting).
    wait = float(os.environ.get("EDLIB_TPU_BENCH_WAIT", "120"))
    alive = probe_device(min(wait, _remaining() - 120.0))
    _log("device probe: %s" % ("alive" if alive else "unreachable"))

    # Phase 3: the q-gram-filtered genome-scale attempt first (the headline
    # path: map_reads' default pruning), then at most two plain-sweep
    # attempts as fallback.
    if alive:
        budget = _remaining() - 30.0
        if budget >= 150.0:
            r = try_backend("qfilter", min(420.0, budget))
            if r is not None:
                _best = {"gcups": r["gcups"], "note": r["note"]}
    if alive and (_best is None or "qfilter" not in _best["note"]):
        for _ in range(2):
            budget = _remaining() - 30.0
            if budget < 120.0:
                break
            r = try_backend("pallas", min(420.0, budget))
            if r is not None:
                _best = {"gcups": r["gcups"], "note": r["note"]}
                break
            if _remaining() > 240.0:
                time.sleep(60)  # cool-down; transient wedges sometimes clear

    print_and_exit(0)


if __name__ == "__main__":
    main()
