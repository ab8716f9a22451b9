"""Real-genome parity regression vs the compiled reference.

The reference exercises its aligner on real FASTA inside the build itself
(meson.build:73-86: hello_world + aligner runs on Enterobacteria phage
data) and perf-sweeps genomes (test_data/perf_tests.sh).  These tests are
the pytest counterpart: byte-exact differential checks against the
compiled reference library on the same genomes.  Slow-marked (whole-genome
DP); auto-skip when the read-only reference checkout or its test data are
absent.
"""

import os

import numpy as np
import pytest

from edlib_tpu import align, align_batch
from edlib_tpu.io.fasta import read_fasta_bytes

from .reference_oracle import get_reference_lib, reference_align

pytestmark = pytest.mark.slow

_TD = os.path.join(
    os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference"), "test_data")
_PHAGE = os.path.join(_TD, "Enterobacteria_Phage_1")
_CHROM = os.path.join(_TD, "Chromosome_2890043_3890042_0")
_READS = os.path.join(_TD, "E_coli_DH1", "mason_illumina_reads")


def _need(path):
    if not os.path.exists(path):
        pytest.skip(f"reference test data missing: {path}")
    if get_reference_lib() is None:
        pytest.skip("reference oracle unavailable")


def _assert_same(ours: dict, ref: dict, ctx):
    assert ours == {k: ref[k] for k in ours}, ctx


def test_phage_path_cigar_byte_exact():
    """94.5kbp phage vs its 97%-similar mutant: NW + HW task=path — the
    full result dict (distance, locations, CIGAR) byte-equal."""
    _need(_PHAGE)
    q = bytes(read_fasta_bytes(
        os.path.join(_PHAGE, "Enterobacteria_phage_1.fasta"))[0])
    t = bytes(read_fasta_bytes(
        os.path.join(_PHAGE, "mutated_97_perc.fasta"))[0])
    for mode in ("NW", "HW"):
        ours = align(q, t, mode=mode, task="path")
        ref = reference_align(q, t, mode=mode, task="path")
        _assert_same(ours, ref, mode)


def test_chromosome_1mbp_nw_distance():
    """1Mbp E. coli chromosome region vs its 97%-similar mutant: NW
    distance (+ end location) equal to the reference."""
    _need(_CHROM)
    q = bytes(read_fasta_bytes(
        os.path.join(_CHROM, "Chromosome_2890043_3890042_0.fasta"))[0])
    t = bytes(read_fasta_bytes(
        os.path.join(_CHROM, "mutated_97_perc.fasta"))[0])
    for task in ("distance", "locations"):
        ours = align(q, t, mode="NW", task=task)
        ref = reference_align(q, t, mode="NW", task=task)
        _assert_same(ours, ref, task)


def test_reads_vs_chromosome_hw_locations():
    """100 real Illumina reads HW-mapped against the 1Mbp chromosome via
    align_batch — per-read result dicts equal to the reference."""
    _need(_CHROM)
    _need(_READS)
    chrom = bytes(read_fasta_bytes(
        os.path.join(_CHROM, "Chromosome_2890043_3890042_0.fasta"))[0])
    reads = [bytes(r) for r in read_fasta_bytes(os.path.join(
        _READS, "100bp", "e_coli_DH1_illumina_1x100.fasta"))[:100]]
    got = align_batch(reads, [chrom] * len(reads), mode="HW",
                      task="locations")
    for i, (ours, rd) in enumerate(zip(got, reads)):
        ref = reference_align(rd, chrom, mode="HW", task="locations")
        _assert_same(ours, ref, i)


def test_prefix_reads_shw():
    """Real 500bp prefix reads vs the phage in SHW mode (the reference's
    prefix-alignment use case), distance + locations."""
    _need(_PHAGE)
    prefixes = os.path.join(_TD, "E_coli_DH1", "prefixes", "500bp")
    _need(prefixes)
    fasta = [os.path.join(prefixes, f) for f in sorted(os.listdir(prefixes))
             if f.endswith((".fasta", ".fa"))]
    if not fasta:
        pytest.skip("no prefix fasta found")
    reads = [bytes(r) for r in read_fasta_bytes(fasta[0])[:20]]
    t = bytes(read_fasta_bytes(
        os.path.join(_PHAGE, "Enterobacteria_phage_1.fasta"))[0])
    for rd in reads:
        for task in ("distance", "locations"):
            ours = align(rd, t, mode="SHW", task=task)
            ref = reference_align(rd, t, mode="SHW", task=task)
            _assert_same(ours, ref, task)
