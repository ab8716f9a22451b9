"""Drop-in replacement for the reference ``edlib`` Python module.

    import edlib_tpu.edlib_compat as edlib
    edlib.align("ACT", "CGACTGAC", mode="HW", task="path")
    edlib.getNiceAlignment(result, query, target)

Same two public functions, signatures, and result dicts as the reference
binding (bindings/python/edlib.pyx:56-238); byte-exact outputs (see
tests/test_reference_parity.py).
"""

from edlib_tpu.align import align
from edlib_tpu.nice import getNiceAlignment

__all__ = ["align", "getNiceAlignment"]
