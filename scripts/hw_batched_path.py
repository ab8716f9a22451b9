"""On-chip batched device PATH vs the pooled native reconstruction.

The VERDICT r3 #3 'done' bar: align_batch(task='path') on ~10k read-size
windows beats the pooled-native wall time with byte-identical CIGARs.  The
location stages are identical either way, so the A/B times the PATH stage
itself on identical windows: the device capture+decode+walk pipeline
(path/batched.py) vs the thread-pooled native reconstruction — then also
reports the full align_batch(task='path') wall both ways.

Prints one JSON line:
  {"backend", "reads", "qlen", "stage_device_s", "stage_native_s",
   "stage_speedup", "e2e_device_s", "e2e_native_s", "identical": true}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This harness only runs against a live chip: pin the routing RTT so a
# transient probe failure (e.g. racing another harness's tunnel session)
# cannot cache a device-down verdict and silently reroute to the XLA
# engine (whose O(B*T) score stream would OOM at this scale anyway).
os.environ.setdefault("EDLIB_TPU_DISPATCH_RTT_MS", "25")

READS = int(os.environ.get("READS", "10240"))
QLEN = int(os.environ.get("QLEN", "120"))
TLEN = int(os.environ.get("TLEN", "100000"))
MUT = float(os.environ.get("MUT", "0.06"))


def make_workload(rng):
    import numpy as np
    target = rng.integers(0, 4, TLEN, dtype=np.int64)
    reads = []
    for _ in range(READS):
        p = int(rng.integers(0, TLEN - QLEN))
        r = target[p:p + QLEN].copy()
        n_mut = rng.binomial(QLEN, MUT)
        pos = rng.choice(QLEN, size=n_mut, replace=False)
        r[pos] = (r[pos] + rng.integers(1, 4, n_mut)) % 4
        reads.append(bytes((r + 65).astype(np.uint8)))
    return bytes((target + 65).astype(np.uint8)), reads


def main():
    import numpy as np

    from edlib_tpu import encode
    from edlib_tpu.batch import GlobalAlphabet, align_batch_device
    from edlib_tpu.path import batched as bp
    from edlib_tpu.path.hirschberg import obtain_alignment

    rng = np.random.default_rng(11)
    target, reads = make_workload(rng)

    import jax
    backend = jax.default_backend()

    # Locations once (identical stage for both PATH variants).
    loc = align_batch_device(reads, [target] * READS, mode="HW",
                             task="locations")

    glob = GlobalAlphabet()
    t_ids = glob.encode(target)
    windows, dists, owners = [], [], []
    for i, (r, res) in enumerate(zip(reads, loc)):
        if res["editDistance"] < 0 or not res["locations"]:
            continue
        s0, e0 = res["locations"][0]
        s0 = 0 if s0 is None else s0
        if e0 is None or e0 < s0:
            continue
        windows.append((glob.encode(r), t_ids[s0:e0 + 1]))
        dists.append(res["editDistance"])
        owners.append(i)
    sigma = glob.sigma
    eq = encode.build_equality_matrix(bytes(glob.alphabet), None)

    # --- PATH stage A/B on identical windows --------------------------------
    # Warm with the full set: the slab shapes (and so the compiled
    # programs) must match the timed run exactly.
    bp.batched_windows_path(windows, dists, sigma, eq, "tpu")
    t0 = time.time()
    dev_ops = bp.batched_windows_path(windows, dists, sigma, eq, "tpu")
    stage_device_s = time.time() - t0

    def native_stage():
        out = []
        from concurrent.futures import ThreadPoolExecutor

        def one(j):
            q_ids, w_ids = windows[j]
            return obtain_alignment(q_ids.astype(np.uint8),
                                    w_ids.astype(np.uint8), eq, dists[j],
                                    parallel=False)
        with ThreadPoolExecutor(max_workers=os.cpu_count() or 1) as pool:
            out = list(pool.map(one, range(len(windows))))
        return out

    native_stage()  # warm the pool/loader
    t0 = time.time()
    nat_ops = native_stage()
    stage_native_s = time.time() - t0

    identical = all(np.array_equal(a, b) for a, b in zip(dev_ops, nat_ops))

    # --- full align_batch(task='path') wall both ways -----------------------
    os.environ["EDLIB_TPU_BATCHED_PATH"] = "1"
    t0 = time.time()
    dev_res = align_batch_device(reads, [target] * READS, mode="HW",
                                 task="path")
    e2e_device_s = time.time() - t0
    os.environ["EDLIB_TPU_BATCHED_PATH"] = "0"
    t0 = time.time()
    nat_res = align_batch_device(reads, [target] * READS, mode="HW",
                                 task="path")
    e2e_native_s = time.time() - t0
    identical = identical and all(
        a["cigar"] == b["cigar"] and a["editDistance"] == b["editDistance"]
        for a, b in zip(dev_res, nat_res))

    print(json.dumps({
        "backend": backend, "reads": READS, "qlen": QLEN, "tlen": TLEN,
        "windows": len(windows),
        "stage_device_s": round(stage_device_s, 3),
        "stage_native_s": round(stage_native_s, 3),
        "stage_speedup": round(stage_native_s / stage_device_s, 3),
        "stage_device_paths_per_s": round(len(windows) / stage_device_s, 1),
        "e2e_device_s": round(e2e_device_s, 3),
        "e2e_native_s": round(e2e_native_s, 3),
        "e2e_speedup": round(e2e_native_s / e2e_device_s, 3),
        "identical": identical,
    }))


if __name__ == "__main__":
    main()
