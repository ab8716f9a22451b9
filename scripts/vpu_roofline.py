"""Empirical VPU speed-of-light probe for the roofline analysis in
docs/PERF.md.

Two register-resident Pallas kernels with tiny outputs (safe to time over
this host's TPU tunnel):
  1. peak: 8 independent uint32 accumulator chains x 4 ALU ops each —
     the machine's measurable elementwise int32 ceiling.
  2. advance: the actual `_advance_word` Myers chain (4 words, exactly the
     shared mapping kernel's inner loop) — its compute-only ceiling.
The ratio shows whether the Myers op mix (add/and/or/xor/shift with a
carry dependence) pays any penalty vs pure independent ALU work; 2026-08-17
on the v5e chip it does not (ratio 1.01: the 4-word ILP hides the
carry-chain latency).  `run(...)` chains reps in a fori_loop — fine here
because the outputs are small (see docs/PERF.md "Measurement traps").

Usage: python scripts/vpu_roofline.py   (on a machine with a TPU;
VPU_PEAK_INTERPRET=1 runs the kernels in interpreter mode for testing).
"""
import os, time, functools, sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from edlib_tpu.ops.pallas_kernel import _advance_word

N_ITER = 131072
UNROLL = 16


def _peak_kernel(seed_ref, out_ref):
    # 8 independent accumulator chains; body = 4 ops each (xor,add,or,and)
    accs = [seed_ref[...] + jnp.uint32(i) for i in range(8)]
    c1 = seed_ref[...] ^ jnp.uint32(0x9E3779B9)

    def body(i, accs):
        new = []
        for a in accs:
            a = (a ^ c1) + a
            a = (a | c1) & (a + c1)
            new.append(a)
        return tuple(new)

    def outer(i, accs):
        for _ in range(UNROLL):
            accs = body(i, accs)
        return accs

    accs = jax.lax.fori_loop(0, N_ITER // UNROLL, outer, tuple(accs))
    out_ref[...] = functools.reduce(lambda x, y: x ^ y, accs)


def _advance_kernel(seed_ref, out_ref, *, n_words):
    pvs = [seed_ref[...] + jnp.uint32(w) for w in range(n_words)]
    mvs = [seed_ref[...] ^ jnp.uint32(w * 7 + 1) for w in range(n_words)]
    eq = seed_ref[...] ^ jnp.uint32(0xDEADBEEF)

    def body(i, carry):
        pvs, mvs = carry
        hn = jnp.zeros((8, 128), jnp.uint32)
        hp = jnp.zeros((8, 128), jnp.uint32)
        np_, nm = [], []
        for w in range(n_words):
            p, m, hn, hp = _advance_word(pvs[w], mvs[w], eq, hn, hp)
            np_.append(p)
            nm.append(m)
        return tuple(np_), tuple(nm)

    def outer(i, carry):
        for _ in range(UNROLL):
            carry = body(i, carry)
        return carry

    pvs, mvs = jax.lax.fori_loop(0, N_ITER // UNROLL, outer,
                                 (tuple(pvs), tuple(mvs)))
    out_ref[...] = functools.reduce(lambda x, y: x ^ y, pvs + mvs)


def run(kernel, label, ops_per_iter, reps=512):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        interpret=os.environ.get("VPU_PEAK_INTERPRET") == "1",
    )

    @jax.jit
    def many(seed):
        def body(i, acc):
            s2 = seed + i.astype(jnp.uint32)
            return acc ^ f(s2)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((8, 128), jnp.uint32))

    seed = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    r = many(seed)
    int(r[0, 0])  # warm + completion
    t0 = time.time()
    r = many(seed)
    int(r[0, 0])
    dt = time.time() - t0
    total_ops = float(reps) * N_ITER * ops_per_iter
    print(f"{label}: {total_ops/dt/1e9:.1f} G (8,128)-vector-ops/s "
          f"({total_ops*1024/dt/1e12:.2f} T elem-ops/s)  [{dt*1e3:.0f}ms]")
    return total_ops / dt


peak = run(_peak_kernel, "pure-ALU peak (8 indep chains x 4 ops)", 8 * 4)
adv = run(functools.partial(_advance_kernel, n_words=4),
          "advance chain (4 words x ~20 ops)", 4 * 20)
print(f"advance/peak ratio: {adv/peak:.2f}")
