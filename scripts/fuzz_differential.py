#!/usr/bin/env python
"""Randomized differential fuzz vs the compiled reference edlib.

Reusable harness behind the fuzz records in README.md: random pairs across
the regimes that activate each fast path (near-square substitution/indel
mixes, prefix-similar SHW pairs, planted infixes, reads vs long targets,
word-boundary lengths, sigma 2..256, additional equalities), checked
field-for-field — editDistance, locations incl. start locations and order,
extended CIGAR, alphabetLength — against the reference library compiled
from its read-only mount (tests/reference_oracle.py).

    python scripts/fuzz_differential.py --minutes 10 --jobs 4
    python scripts/fuzz_differential.py --minutes 5 --batch   # align_batch too

Each worker process prints one JSON line; the parent aggregates.  Any
mismatch dumps a reproducer (seed + shapes) and exits nonzero.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_pair(rng):
    """One random (query, target, eqs) in a randomly drawn regime."""
    regime = rng.randint(7)
    sigma = int(rng.choice([2, 4, 4, 4, 10, 26, 96, 200, 256]))

    def seq(n):
        return bytes(rng.randint(0, sigma, max(n, 0), dtype=np.uint8).tobytes())

    def mutate(s, sub, indel):
        out = bytearray()
        for ch in s:
            r = rng.rand()
            if r < indel / 2:
                continue
            if r < indel:
                out.append(ch)
                out.append(int(rng.randint(sigma)))
                continue
            if r < indel + sub:
                out.append(int(rng.randint(sigma)))
            else:
                out.append(ch)
        return bytes(out)

    if regime == 0:      # near-square, substitution-dominated
        n = 1 + rng.randint(4000)
        q = seq(n)
        t = mutate(q, rng.uniform(0.0, 0.3), 0.0)
    elif regime == 1:    # near-square, indel mix
        n = 1 + rng.randint(4000)
        q = seq(n)
        t = mutate(q, rng.uniform(0, 0.1), rng.uniform(0, 0.15))
    elif regime == 2:    # prefix-similar (SHW regime): mutated q + tail
        n = 1 + rng.randint(3000)
        q = seq(n)
        t = mutate(q, rng.uniform(0, 0.12), rng.uniform(0, 0.06)) \
            + seq(rng.randint(2000))
    elif regime == 3:    # planted infix (HW regime)
        n = 30 + rng.randint(400)
        q = seq(n)
        t = seq(rng.randint(3000)) + mutate(q, 0.05, 0.03) \
            + seq(rng.randint(3000))
    elif regime == 4:    # read vs long target
        q = seq(30 + rng.randint(300))
        t = seq(2000 + rng.randint(60000))
    elif regime == 5:    # word-boundary lengths
        qlen = int(rng.choice([1, 31, 32, 33, 63, 64, 65, 127, 128, 192]))
        q = seq(qlen)
        t = seq(1 + rng.randint(300))
    else:                # small general, incl. empties
        q = seq(rng.randint(120))
        t = seq(rng.randint(400))
    eqs = None
    if sigma >= 4 and rng.rand() < 0.2:
        eqs = [(bytes([rng.randint(sigma)]), bytes([rng.randint(sigma)]))
               for _ in range(1 + rng.randint(3))]
    return q, t, eqs


def check_pair(align, reference_align, q, t, eqs, rng, batch_fn=None):
    """All modes x a random task x a k-regime sweep; returns checks done."""
    checks = 0
    for mode in ("NW", "SHW", "HW"):
        task = ("distance", "locations", "path")[rng.randint(3)]
        ref0 = reference_align(q, t, mode=mode, task=task,
                               additionalEqualities=eqs)
        ks = [-1]
        d = ref0["editDistance"]
        if rng.rand() < 0.5:
            ks += [max(0, d - 1), d, d + 1 + rng.randint(5)]
        for k in ks:
            ours = align(q, t, mode=mode, task=task, k=k,
                         additionalEqualities=eqs)
            ref = ref0 if k == -1 else reference_align(
                q, t, mode=mode, task=task, k=k, additionalEqualities=eqs)
            for field in ("editDistance", "alphabetLength", "locations",
                          "cigar"):
                if ours[field] != ref[field]:
                    raise AssertionError(
                        f"MISMATCH {field} mode={mode} task={task} k={k} "
                        f"qlen={len(q)} tlen={len(t)} eqs={eqs} "
                        f"ours={ours[field]!r} ref={ref[field]!r}")
                checks += 1
            # Bound the XLA compile universe: the batched scan engine
            # compiles per (sigma, word, scan-length) bucket and XLA:CPU
            # retains every executable — unbounded shapes ran a 3-worker
            # fuzz out of memory (LLVM 'Cannot allocate memory').
            small = len(q) <= 500 and len(t) <= 1000
            if batch_fn is not None and small and rng.rand() < 0.15:
                got = batch_fn([q], [t], mode=mode, task=task, k=k,
                               additionalEqualities=eqs)[0]
                for field in ("editDistance", "alphabetLength",
                              "locations", "cigar"):
                    if got[field] != ref[field]:
                        raise AssertionError(
                            f"BATCH MISMATCH {field} mode={mode} "
                            f"task={task} k={k} qlen={len(q)} tlen={len(t)}")
                    checks += 1
    return checks


def worker(seed: int, deadline: float, use_batch: bool,
           device: bool = False) -> dict:
    # Pin CPU: this sandbox force-registers a flaky tunneled-TPU backend
    # in every process; the fuzz targets host semantics (device kernels
    # have their own interpret-mode and on-chip suites).  --device mode
    # instead drives the Pallas drivers through the interpreter at
    # bounded shapes (<=4-word buckets: the full kernels' unrolled
    # column groups are minutes-slow XLA:CPU compiles beyond that).
    if device:
        os.environ["EDLIB_TPU_FORCE_PALLAS"] = "interpret"
        os.environ["EDLIB_TPU_PALLAS_CHUNK"] = "32"
        os.environ["EDLIB_TPU_BAND_MIN_WORDS"] = "2"
    else:
        os.environ.setdefault("EDLIB_TPU_DISABLE_DEVICE", "1")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from edlib_tpu import align
    from edlib_tpu.batch import align_batch_device
    from tests.reference_oracle import reference_align
    rng = np.random.RandomState(seed)
    trials = checks = 0
    batch_fn = align_batch_device if (use_batch or device) else None
    while time.time() < deadline:
        q, t, eqs = make_pair(rng)
        if device:
            # Bound the interpret-compile universe: small shapes AND a
            # collapsed alphabet (the full kernels' unrolled column
            # groups scale compile time with sigma x words).
            q = bytes(b % 4 for b in q[:120])
            t = bytes(b % 4 for b in t[:400])
        checks += check_pair(align, reference_align, q, t, eqs, rng,
                             batch_fn=batch_fn)
        trials += 1
        if trials % 500 == 0:
            # Progress line (the parent keeps the LAST line, so a crashed
            # worker still reports its completed work) + cache hygiene
            # (XLA:CPU retains every compiled shape).
            print(json.dumps({"seed": seed, "trials": trials,
                              "checks": checks}), flush=True)
            if use_batch and not device:
                import jax
                jax.clear_caches()  # device mode keeps warm interp kernels
    return {"seed": seed, "trials": trials, "checks": checks}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--jobs", type=int, default=max(1, (os.cpu_count() or 2) - 1))
    ap.add_argument("--seed", type=int, default=int(time.time()) & 0xFFFF)
    ap.add_argument("--batch", action="store_true",
                    help="also differential-check align_batch_device")
    ap.add_argument("--device", action="store_true",
                    help="drive the Pallas drivers (interpreter) at "
                         "bounded shapes instead of the host engines")
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--deadline", type=float, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        print(json.dumps(worker(args.worker, args.deadline, args.batch,
                                device=args.device)))
        return 0

    deadline = time.time() + args.minutes * 60
    procs = []
    for j in range(args.jobs):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", str(args.seed + j * 7919),
               "--deadline", str(deadline)]
        if args.batch:
            cmd.append("--batch")
        if args.device:
            cmd.append("--device")
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    total = {"trials": 0, "checks": 0, "failures": 0}
    for p in procs:
        out, err = p.communicate()
        if p.returncode != 0:
            total["failures"] += 1
            sys.stderr.write(err[-4000:] + "\n")
        # Take the worker's last progress line even if it crashed later.
        for line in reversed(out.strip().splitlines()):
            try:
                r = json.loads(line)
            except ValueError:
                continue
            total["trials"] += r["trials"]
            total["checks"] += r["checks"]
            break
    total["minutes"] = args.minutes
    total["jobs"] = args.jobs
    total["seed"] = args.seed
    total["batch"] = bool(args.batch)
    print(json.dumps(total))
    return 1 if total["failures"] else 0


if __name__ == "__main__":
    sys.exit(main())
