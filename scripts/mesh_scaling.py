"""Multi-chip weak-scaling harness for the read-mapping workload.

One command produces the scaling table whenever hardware appears:

    python scripts/mesh_scaling.py                      # all shapes that fit
    python scripts/mesh_scaling.py --shapes 1x1,2x1,2x4 --trials 3

Weak scaling: the per-device workload is held constant — each data-parallel
("dp") row adds its own batch of reads, each sequence-parallel ("sp")
column adds its own stretch of target — so ideal scaling keeps per-shape
wall time flat and reads/s grows linearly with dp.  Efficiency is measured
against the 1x1 per-device rate; BASELINE.md's target is >= 80% at 8
devices.

Runs on anything: a real TPU slice (Pallas kernels per shard), this
sandbox's single tunneled chip (1x1 only), or virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8 — the dryrun mode the
tests pin; engine resolution is automatic, parallel/dist._resolve_engine).

Output: a human table on stderr + one JSON line per shape on stdout
(machine-readable, ready for PERF_HW.json).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_shapes(text):
    shapes = []
    for part in text.split(","):
        dp, sp = part.lower().split("x")
        shapes.append((int(dp), int(sp)))
    return shapes


def default_shapes(n_devices):
    """dp-major ladder plus an sp split at the top (weak scaling shows both
    axes): 1x1, 2x1, 4x1, ..., Nx1, (N/2)x2."""
    shapes = []
    d = 1
    while d <= n_devices:
        shapes.append((d, 1))
        d *= 2
    if n_devices >= 2 and n_devices % 2 == 0:
        shapes.append((n_devices // 2, 2))
    return shapes


def build_workload(rng, dp, sp, reads_per_dev, qlen, tlen_per_dev, sigma=4):
    """Mutated-window reads vs a target sized to the mesh (weak scaling)."""
    tlen = tlen_per_dev * sp
    target = rng.randint(0, sigma, tlen).astype(np.uint8)
    B = reads_per_dev * dp
    reads = []
    for _ in range(B):
        s = int(rng.randint(0, tlen - qlen))
        w = target[s:s + qlen].copy()
        for p in rng.choice(qlen, max(1, qlen // 20), replace=False):
            w[p] = rng.randint(0, sigma)
        reads.append(bytes(bytearray(b"ACGT"[c] for c in w)))
    target_b = bytes(bytearray(b"ACGT"[c] for c in target))
    return reads, target_b


def run_shape(dp, sp, args, rng, verify=False, mesh=True):
    from edlib_tpu.mapping import map_reads
    from edlib_tpu.parallel import make_alignment_mesh

    reads, target = build_workload(rng, dp, sp, args.reads_per_dev,
                                   args.qlen, args.tlen_per_dev)
    mesh = make_alignment_mesh(dp * sp, dp=dp, sp=sp) if mesh else None
    best = pos = None
    times = []
    for _ in range(max(1, args.trials)):
        t0 = time.perf_counter()
        best, pos = map_reads(reads, target, mode="HW", mesh=mesh)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    if verify:
        from edlib_tpu import align
        for i in (0, len(reads) // 2, len(reads) - 1):
            want = align(reads[i], target, mode="HW", task="locations")
            assert best[i] == want["editDistance"], (dp, sp, i)
            assert pos[i] == want["locations"][0][1], (dp, sp, i)
    cells = float(len(reads)) * args.qlen * len(target)
    return {"dp": dp, "sp": sp, "devices": dp * sp, "reads": len(reads),
            "tlen": len(target), "seconds": round(dt, 4),
            "reads_per_s": round(len(reads) / dt, 2),
            "gcups": round(cells / dt / 1e9, 3)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--shapes", default=None,
                   help="comma list of DPxSP meshes (default: all that fit)")
    p.add_argument("--reads-per-dev", type=int, default=10240)
    p.add_argument("--qlen", type=int, default=100)
    p.add_argument("--tlen-per-dev", type=int, default=1_000_000)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                   help="cpu pins the virtual-device backend (tests)")
    p.add_argument("--verify", action="store_true",
                   help="cross-check sampled reads against align()")
    args = p.parse_args(argv)

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    n_devices = len(jax.devices())
    shapes = (parse_shapes(args.shapes) if args.shapes
              else default_shapes(n_devices))
    shapes = [(dp, sp) for dp, sp in shapes if dp * sp <= n_devices]
    if not shapes:
        print(f"no mesh shape fits {n_devices} device(s)", file=sys.stderr)
        return 1

    rng = np.random.RandomState(0)
    rows = []
    base_per_dev = None
    plain_rate = None
    if (1, 1) in shapes:
        # Mesh-tax reference: the SAME 1x1 workload through the plain
        # (no-mesh) path — the weak-scaling base must stay within ~1.2x
        # of it or every efficiency number downstream is flattered.
        os.environ["EDLIB_TPU_AUTO_MESH"] = "0"
        try:
            row = run_shape(1, 1, args, np.random.RandomState(0),
                            verify=args.verify, mesh=False)
        finally:
            os.environ.pop("EDLIB_TPU_AUTO_MESH", None)
        row["plain"] = True
        plain_rate = row["reads_per_s"]
        rows.append(row)
        print(json.dumps(row))
        sys.stdout.flush()
    for dp, sp in shapes:
        row = run_shape(dp, sp, args, rng, verify=args.verify)
        per_dev = row["reads_per_s"] / row["devices"]
        if base_per_dev is None:
            base_per_dev = per_dev
            if plain_rate:
                row["mesh_tax"] = round(plain_rate / row["reads_per_s"], 4)
        row["scaling_efficiency"] = round(per_dev / base_per_dev, 4)
        rows.append(row)
        print(json.dumps(row))
        sys.stdout.flush()

    hdr = (f"{'mesh':>7} {'devs':>4} {'reads':>7} {'tlen':>9} "
           f"{'sec':>8} {'reads/s':>10} {'GCUPS':>8} {'eff':>6}")
    print("\n" + hdr, file=sys.stderr)
    for r in rows:
        tag = "plain" if r.get("plain") else f"{r['dp']}x{r['sp']}"
        eff = r.get("scaling_efficiency")
        print(f"{tag:>7} {r['devices']:>4} {r['reads']:>7} "
              f"{r['tlen']:>9} {r['seconds']:>8.3f} {r['reads_per_s']:>10.1f} "
              f"{r['gcups']:>8.2f} {eff if eff is None else format(eff, '6.2f')}",
              file=sys.stderr)
    target_eff = 0.80  # BASELINE.md multi-chip goal
    worst = min((r["scaling_efficiency"] for r in rows
                 if not r.get("plain")), default=1.0)
    print(f"\nweak-scaling efficiency (worst shape): {worst:.2f} "
          f"(target >= {target_eff})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
