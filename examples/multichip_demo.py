"""Multi-chip alignment demo: shard a read batch + one shared target over a
("dp", "sp") device mesh.

Runs anywhere: on a TPU slice the mesh spans the real chips; without one,
launch with

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/multichip_demo.py

and the same code runs on 8 virtual CPU devices (results are identical to
the single-device path either way — the location merges happen on device
via pmin/pmax collectives and packed hit bitmasks; parallel/dist.py).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    # Environments that force-register a TPU plugin via sitecustomize can
    # override the env var; re-assert it programmatically BEFORE any
    # backend initialisation (same workaround as tests/conftest.py).
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import edlib_tpu
from edlib_tpu.parallel import make_alignment_mesh


def main():
    import jax
    print(f"devices: {len(jax.devices())} x {jax.default_backend()}")

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    target = alphabet[rng.integers(0, 4, 200_000)].tobytes()
    reads = []
    for _ in range(64):
        pos = int(rng.integers(0, len(target) - 150))
        read = np.frombuffer(target[pos:pos + 150], np.uint8).copy()
        errs = rng.choice(150, 7, replace=False)
        read[errs] = alphabet[rng.integers(0, 4, 7)]
        reads.append(read.tobytes())

    mesh = make_alignment_mesh()  # ("dp", "sp") over all devices
    print(f"mesh: {dict(mesh.shape)}")

    sharded = edlib_tpu.align_batch(reads, target, mode="HW",
                                    task="locations", mesh=mesh)
    single = edlib_tpu.align_batch(reads, target, mode="HW",
                                   task="locations")
    assert sharded == single, "mesh path must equal the single-device path"
    hits = sum(1 for r in sharded if r["editDistance"] >= 0)
    best = min(r["editDistance"] for r in sharded)
    print(f"{hits}/{len(reads)} reads mapped; best distance {best}; "
          f"first: {sharded[0]['editDistance']} @ {sharded[0]['locations']}")
    print("sharded == single-device: OK")


if __name__ == "__main__":
    main()
