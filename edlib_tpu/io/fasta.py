"""FASTA reading.

Counterpart of the reference CLI's streaming reader
(apps/aligner/aligner.cpp:290-328): '>' header lines skipped, CR/LF ignored
inside sequences, headerless files tolerated (data before any '>' forms the
first record).  Backed by the native C++ reader when available (mmap-free
two-pass, ~GB/s); pure-Python fallback otherwise.
"""

from __future__ import annotations

from typing import List

from edlib_tpu import native_loader


def read_fasta_bytes(path: str) -> List[bytes]:
    return native_loader.read_fasta(path)


def read_fasta_strings(path: str) -> List[str]:
    return [s.decode("latin-1") for s in native_loader.read_fasta(path)]
