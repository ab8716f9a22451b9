"""Default persistent XLA/Mosaic compilation cache.

A cold Mosaic compile of the batched kernels costs tens of seconds (the
reference's C++ has no analogous cost — edlib.cpp compiles once at build
time), so a fresh process per mapping job would pay it every run.  The
persistent compilation cache makes that a one-time cost per (kernel,
shape, toolchain) on each machine.

Called lazily from the device compute modules (ops/jax_engine,
ops/pallas_kernel) at import.  User configuration always wins:

* ``EDLIB_TPU_NO_COMPILE_CACHE=1`` disables this default entirely;
* an explicit ``JAX_COMPILATION_CACHE_DIR`` env or a prior
  ``jax.config.update("jax_compilation_cache_dir", ...)`` is left alone.

Cache location: ``$XDG_CACHE_HOME/edlib_tpu/jax_cache`` (default
``~/.cache/edlib_tpu/jax_cache``).
"""

from __future__ import annotations

import os

_done = False


def ensure_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("EDLIB_TPU_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:  # user already set one
            return
        base = os.environ.get("XDG_CACHE_HOME",
                              os.path.join(os.path.expanduser("~"),
                                           ".cache"))
        path = os.path.join(base, "edlib_tpu", "jax_cache")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Anything that takes >=0.5s to compile is worth persisting (the
        # jax default of 1s skips mid-size kernels) — unless the user
        # pinned the knob themselves.
        if not os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"):
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
    except Exception:  # never let cache setup break compute
        pass
