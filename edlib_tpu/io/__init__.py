"""IO: FASTA reading (native-accelerated)."""

from edlib_tpu.io.fasta import read_fasta_bytes, read_fasta_strings

__all__ = ["read_fasta_bytes", "read_fasta_strings"]
