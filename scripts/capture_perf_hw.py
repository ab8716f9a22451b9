"""One-command hardware perf capture -> PERF_HW.json.

Runs the standing hardware-validation queue in a healthy TPU window and
writes every number as a machine-readable row {metric, value, unit, ts,
sha, source} — the captured-artifact counterpart of docs/PERF.md's prose
tables (VERDICT r2: every quoted number needs a JSON row with a sha).

    python scripts/capture_perf_hw.py              # full queue (~30-45 min)
    python scripts/capture_perf_hw.py --quick      # headline numbers only

Every step is a subprocess under its own timeout (a wedged tunnel skips
the step, never hangs the capture); whatever succeeded is written at the
end, plus a "skipped" list so partial captures are honest.
"""

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "PERF_HW.json")


def sha() -> str:
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              cwd=REPO, capture_output=True, text=True,
                              timeout=10).stdout.strip()
    except Exception:
        return "unknown"


def run(cmd, timeout, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    try:
        p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=timeout, env=e)
        return p.returncode, p.stdout, p.stderr
    except subprocess.TimeoutExpired:
        return -1, "", "timeout"


def last_json(stdout):
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{") or line.startswith("["):
            try:
                return json.loads(line)
            except ValueError:
                continue
    return None


class Capture:
    def __init__(self):
        self.rows = []
        self.skipped = []
        self.sha = sha()

    def row(self, metric, value, unit, source, **extra):
        self.rows.append({"metric": metric, "value": value, "unit": unit,
                          "ts": datetime.datetime.now(
                              datetime.timezone.utc).isoformat(
                              timespec="seconds"),
                          "sha": self.sha, "source": source, **extra})
        print(f"  + {metric} = {value} {unit}")

    def skip(self, name, why):
        self.skipped.append({"step": name, "why": why[:300]})
        print(f"  - SKIP {name}: {why[:120]}")


def probe(timeout=60):
    code = ("import jax, jax.numpy as jnp\n"
            "assert jax.default_backend() == 'tpu'\n"
            "x = jnp.ones((128,128))\n"
            "assert float((x@x).sum()) == 128.0**3\n")
    rc, _, err = run([sys.executable, "-c", code], timeout)
    return rc == 0, err


def step_bench(cap):
    rc, out, err = run([sys.executable, "bench.py"], 900,
                       env={"EDLIB_TPU_BENCH_DEADLINE": "780"})
    j = last_json(out)
    # Accept any device-backed headline (the note names the engine:
    # "qfilter"/"pallas"); reject only native-CPU fallbacks and failures.
    note = str(j.get("note", "")) if j else ""
    if j and j.get("value", 0) > 0 and ("pallas" in note
                                        or "qfilter" in note):
        cap.row("batched_hw_gcups", j["value"], "GCUPS", "bench.py",
                vs_baseline=j.get("vs_baseline"), note=j.get("note"))
    else:
        cap.skip("bench.py", f"rc={rc} out={out[-120:]} err={err[-120:]}")


def step_two_phase(cap):
    # Per-rep work on the default (2048 x 120bp vs 4kbp) workload is
    # ~0.16ms on chip, so REPS must be high enough to amortise the
    # ~25-30ms tunnel RTT of the final scalar fetch (docs/PERF.md
    # "measurement trap"): 2000 reps ~= 0.3-0.5s of kernel time.
    for tag, arg in (("two_phase_general", "bench_reduce"),
                     ("two_phase_shared", "bench_shared")):
        rc, out, err = run([sys.executable, "scripts/hw_two_phase.py", arg],
                           420, env={"REPS": "2000"})
        m = re.search(r"->\s*([\d.]+)\s*GCUPS", out)
        if rc == 0 and m:
            cap.row(tag + "_gcups", float(m.group(1)), "GCUPS",
                    f"hw_two_phase.py {arg} REPS=2000")
        else:
            cap.skip(tag, f"rc={rc} {err[-120:]}")


def step_banded_nw(cap):
    """Banded sliding-window NW vs the full sweep (docs/PERF.md headline
    rows: 6184 GCUPS full, 19-26k GCUPS-equiv banded at k=256/k=64)."""
    pat = re.compile(r"full [\d.]+s = ([\d.]+) GCUPS; "
                     r"banded\[(\d+)/(\d+)w\] [\d.]+s = ([\d.]+) "
                     r"GCUPS-equiv \(([\d.]+)x\)")
    for k in ("256", "64"):
        rc, out, err = run([sys.executable, "scripts/hw_two_phase.py",
                            "banded"], 560, env={"K": k})
        m = pat.search(out)
        if rc == 0 and m:
            cap.row(f"nw_full_sweep_gcups_k{k}", float(m.group(1)), "GCUPS",
                    f"hw_two_phase.py banded K={k}")
            cap.row(f"nw_banded_gcups_equiv_k{k}", float(m.group(4)),
                    "GCUPS-equiv", f"hw_two_phase.py banded K={k}",
                    window=f"{m.group(2)}/{m.group(3)}w",
                    speedup_x=float(m.group(5)))
        else:
            cap.skip(f"banded_nw k={k}", f"rc={rc} {out[-150:]} {err[-120:]}")


def step_chunk_sweep(cap, chunks=(256, 512, 1024)):
    best = None
    for c in chunks:
        rc, out, err = run([sys.executable, "scripts/tune_shared.py",
                            str(c)], 420)
        j = last_json(out)
        if rc == 0 and j and j.get("backend") == "tpu":
            cap.row(f"shared_kernel_chunk{c}_gcups", j["gcups"], "GCUPS",
                    "tune_shared.py", seconds=j["seconds"])
            if best is None or j["gcups"] > best[1]:
                best = (c, j["gcups"])
        else:
            cap.skip(f"tune_shared {c}", f"rc={rc} {err[-120:]}")
    if best:
        cap.row("shared_kernel_best_chunk", best[0], "chunk",
                "tune_shared.py sweep", gcups=best[1])


def step_roofline(cap):
    rc, out, err = run([sys.executable, "scripts/vpu_roofline.py"], 420)
    mp = re.search(r"pure-ALU peak.*?([\d.]+)\s*G ", out)
    ma = re.search(r"advance chain.*?([\d.]+)\s*G ", out)
    mr = re.search(r"advance/peak ratio:\s*([\d.]+)", out)
    if rc == 0 and mp and ma and mr:
        cap.row("vpu_alu_peak", float(mp.group(1)), "G(8,128)ops/s",
                "vpu_roofline.py")
        cap.row("vpu_advance_chain", float(ma.group(1)), "G(8,128)ops/s",
                "vpu_roofline.py")
        cap.row("vpu_advance_peak_ratio", float(mr.group(1)), "ratio",
                "vpu_roofline.py")
    else:
        cap.skip("vpu_roofline", f"rc={rc} {err[-120:]}")


def step_e2e(cap):
    """End-to-end map_reads wall (host encode + transfers + device sweep):
    the docs/PERF.md '10240 reads x 100bp vs 1Mbp' headline row."""
    rc, out, err = run([sys.executable, "scripts/e2e_map.py"], 900)
    j = last_json(out)
    if rc == 0 and j and j.get("backend") == "tpu":
        cap.row("map_reads_e2e_reads_per_s", j["reads_per_s"], "reads/s",
                "e2e_map.py", gcups=j["gcups"], seconds=j["seconds"],
                cold_s=j["cold_s"], reads=j["reads"], qlen=j["qlen"],
                tlen=j["tlen"])
    else:
        cap.skip("e2e_map", f"rc={rc} {err[-150:]}")


def step_scaling(cap):
    """Weak-scaling harness rows (1x1 on this sandbox's single chip; the
    full ladder whenever a real slice appears)."""
    rc, out, err = run([sys.executable, "scripts/mesh_scaling.py",
                        "--trials", "4"], 900)
    got = False
    for line in out.strip().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            j = json.loads(line)
        except ValueError:
            continue
        if j.get("plain"):
            cap.row("map_reads_plain_reads_per_s", j["reads_per_s"],
                    "reads/s", "mesh_scaling.py", gcups=j["gcups"],
                    reads=j["reads"], tlen=j["tlen"])
            got = True
            continue
        tag = f"{j['dp']}x{j['sp']}"
        cap.row(f"map_reads_mesh{tag}_reads_per_s", j["reads_per_s"],
                "reads/s", "mesh_scaling.py", gcups=j["gcups"],
                reads=j["reads"], tlen=j["tlen"],
                scaling_efficiency=j.get("scaling_efficiency"),
                mesh_tax=j.get("mesh_tax"))
        got = True
    if not got:
        cap.skip("mesh_scaling", f"rc={rc} {err[-150:]}")


def step_wavefront_1mbp(cap):
    """Single-pair 1Mbp NW on the device wavefront vs the native CPU
    engine (the align() race covers both; exactness asserted in-script)."""
    rc, out, err = run([sys.executable, "scripts/hw_wavefront_1mbp.py"],
                       900)
    j = last_json(out)
    if rc == 0 and j and j.get("backend") == "tpu":
        cap.row("wavefront_1mbp_nw_s", j["wavefront_s"], "s",
                "hw_wavefront_1mbp.py", native_s=j["native_s"],
                cold_s=j["cold_s"], ratio_vs_native=j["ratio"],
                distance=j["distance"])
    else:
        cap.skip("wavefront_1mbp", f"rc={rc} {err[-150:]}")


def step_cli(cap):
    """Compiled CLI vs the reference aligner binary (CPU-only): wall-time
    ratio with byte-identical output asserted by the harness."""
    for tag, extra in (("hw_distance", []),
                       ("hw_path", ["--reads", "100", "--qlen", "200",
                                    "--flags=-p -s"]),
                       ("hw_locations", ["--reads", "200", "--qlen", "150",
                                         "--flags=-l"])):
        rc, out, err = run([sys.executable, "scripts/cli_ab.py"] + extra,
                           1200)
        j = last_json(out)
        if rc == 0 and j and j.get("output_identical"):
            cap.row(f"cli_{tag}_ratio", j["ratio"], "x vs reference",
                    "cli_ab.py", ours_s=j["ours_s"], ref_s=j["ref_s"],
                    reads=j["reads"], qlen=j["qlen"], flags=j["flags"])
        else:
            cap.skip(f"cli {tag}", f"rc={rc} {err[-150:]}")


def step_latency(cap):
    """CPU A/B latency vs the compiled reference (no TPU needed):
    the docs/PERF.md single-pair tables as machine rows."""
    rc, out, err = run([sys.executable, "scripts/latency_ab.py", "all"],
                       1200)
    j = last_json(out)
    if rc == 0 and isinstance(j, list):
        for r in j:
            cap.row(r["metric"], r["value"], r["unit"], "latency_ab.py",
                    ref_value=r["ref_value"], ratio=r["ratio"],
                    workload=r["workload"])
    else:
        cap.skip("latency_ab", f"rc={rc} {err[-150:]}")


def step_batched_path(cap):
    """Batched device PATH vs the pooled native walkers on identical
    windows (VERDICT r3 #3): byte-identical CIGARs asserted in-harness."""
    rc, out, err = run([sys.executable, "scripts/hw_batched_path.py"], 2400)
    j = last_json(out)
    if rc == 0 and j and j.get("identical") and j.get("backend") == "tpu":
        cap.row("batched_path_paths_per_s", j["stage_device_paths_per_s"],
                "paths/s", "hw_batched_path.py", windows=j["windows"],
                qlen=j["qlen"], stage_device_s=j["stage_device_s"],
                stage_native_s=j["stage_native_s"],
                stage_speedup=j["stage_speedup"],
                e2e_speedup=j["e2e_speedup"])
    else:
        cap.skip("batched_path", f"rc={rc} {out[-150:]} {err[-120:]}")


def step_shw_map(cap):
    """SHW map_reads prefix-slice pruning vs the full sweep at 1 Mbp."""
    rc, out, err = run([sys.executable, "scripts/hw_shw_map.py"], 1200)
    j = last_json(out)
    if rc == 0 and j and j.get("exact") and j.get("backend") == "tpu":
        cap.row("shw_map_pruned_speedup", j["speedup"], "x",
                "hw_shw_map.py", reads=j["reads"], qlen=j["qlen"],
                tlen=j["tlen"], pruned_s=j["pruned_s"],
                full_s=j["full_s"], reads_per_s=j["reads_per_s"])
    else:
        cap.skip("shw_map", f"rc={rc} {out[-150:]} {err[-120:]}")


def step_adversarial(cap):
    """Filter auto-tune verdict + resolved rate per target class."""
    rc, out, err = run([sys.executable, "scripts/hw_adversarial.py"], 1200)
    j = last_json(out)
    if rc == 0 and j and j.get("backend") == "tpu":
        for name, row in j["classes"].items():
            cap.row(f"qfilter_{name}_reads_per_s", row["map_reads_per_s"],
                    "reads/s", "hw_adversarial.py", **{
                        k: row[k] for k in ("q", "maxc", "enabled",
                                            "pred_resolved",
                                            "resolved_rate")
                        if k in row})
    else:
        cap.skip("adversarial", f"rc={rc} {out[-150:]} {err[-120:]}")


def step_eqstream(cap):
    """Big-alphabet engine (sigma past the select cap) GCUPS + exactness.

    Since round 5 the value is the bit-plane engine (the default route for
    sigma > 64 distinct-target batches); the legacy eq-stream and the
    select-chain at sigma 25 ride along as captured ratios."""
    rc, out, err = run([sys.executable, "scripts/hw_eqstream.py"], 1200)
    j = last_json(out)
    if rc == 0 and j and j.get("exact") and j.get("backend") == "tpu":
        cap.row("eqstream_sigma200_gcups", j["eqstream_gcups"], "GCUPS",
                "hw_eqstream.py", B=j["B"], qlen=j["qlen"], tlen=j["tlen"],
                select25_gcups=j["select25_gcups"],
                legacy_stream_gcups=j["legacy_stream_gcups"],
                bitplane_vs_select25=j["bitplane_vs_select25"],
                bitplane_vs_legacy=j["bitplane_vs_legacy"])
    else:
        cap.skip("eqstream", f"rc={rc} {out[-150:]} {err[-120:]}")


def step_hw_tests(cap):
    rc, out, err = run([sys.executable, "-m", "pytest",
                        "tests/test_hw_tpu.py", "-q"], 3600)
    m = re.search(r"(\d+) passed", out)
    s = re.search(r"(\d+) skipped", out)
    if m:
        cap.row("hw_tpu_tests_passed", int(m.group(1)), "tests",
                "pytest tests/test_hw_tpu.py",
                skipped=int(s.group(1)) if s else 0, rc=rc)
    else:
        cap.skip("test_hw_tpu", f"rc={rc} {out[-150:]} {err[-120:]}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="bench + two-phase + banded-NW only")
    ap.add_argument("--steps", default=None,
                    help="comma list: bench,two_phase,banded_nw,chunks,"
                         "roofline,shw_map,adversarial,tests")
    ap.add_argument("--merge", action="store_true", default=True,
                    help="keep existing PERF_HW.json rows whose metric is "
                         "not re-captured this run (DEFAULT — a partial "
                         "run, e.g. CPU-only after a failed TPU probe, "
                         "must never destroy captured device rows)")
    ap.add_argument("--fresh", dest="merge", action="store_false",
                    help="discard all prior rows and write only this "
                         "run's captures")
    args = ap.parse_args(argv)

    cap = Capture()
    steps = {"bench": step_bench, "two_phase": step_two_phase,
             "banded_nw": step_banded_nw, "chunks": step_chunk_sweep,
             "roofline": step_roofline,
             "e2e": step_e2e, "scaling": step_scaling,
             "wavefront": step_wavefront_1mbp, "cli": step_cli,
             "latency": step_latency, "tests": step_hw_tests,
             "batched_path": step_batched_path, "eqstream": step_eqstream,
             "shw_map": step_shw_map, "adversarial": step_adversarial}
    cpu_only = {"latency", "cli"}
    if args.steps:
        order = [s.strip() for s in args.steps.split(",")]
    elif args.quick:
        order = ["bench", "two_phase", "banded_nw"]
    else:
        order = ["bench", "two_phase", "banded_nw", "chunks", "roofline",
                 "e2e", "scaling", "batched_path", "eqstream",
                 "shw_map", "adversarial", "wavefront", "cli", "latency",
                 "tests"]

    if set(order) - cpu_only:  # any step that needs the chip?
        ok, err = probe()
        if not ok:
            tpu_steps = [s for s in order if s not in cpu_only]
            print(f"no healthy TPU (probe failed: {err[-200:]}); "
                  f"skipping device steps {tpu_steps}")
            for s in tpu_steps:
                cap.skip(s, "tpu probe failed")
            order = [s for s in order if s in cpu_only]
            if not order:
                return 1
        else:
            print("TPU healthy — capturing...")
    t0 = time.time()
    for name in order:
        print(f"[{time.time()-t0:6.0f}s] step: {name}")
        try:
            steps[name](cap)
        except Exception as e:  # a step bug must not lose prior rows
            cap.skip(name, repr(e))

    rows, skipped = cap.rows, cap.skipped
    if args.merge and os.path.exists(OUT):
        try:
            with open(OUT) as f:
                prev = json.load(f)
            new_metrics = {r["metric"] for r in rows}
            kept = [r for r in prev.get("rows", [])
                    if r["metric"] not in new_metrics]
            rows = kept + rows
            # prior skipped entries are dropped: each row is stamped with
            # its own ts+sha, and this run's skipped list stands on its own
            print(f"merged {len(kept)} prior rows")
        except Exception as e:
            print(f"merge failed ({e!r}); writing fresh")
    doc = {"captured_at": datetime.datetime.now(
               datetime.timezone.utc).isoformat(timespec="seconds"),
           "sha": cap.sha, "rows": rows, "skipped": skipped}
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"\nwrote {OUT}: {len(cap.rows)} rows, "
          f"{len(cap.skipped)} skipped")
    return 0 if cap.rows else 1


if __name__ == "__main__":
    sys.exit(main())
