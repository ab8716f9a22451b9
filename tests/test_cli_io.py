"""CLI and FASTA IO tests (C16 parity)."""

import io
import os
import sys

import numpy as np
import pytest

from edlib_tpu.io.fasta import read_fasta_bytes
from edlib_tpu.native_loader import _read_fasta_py


def write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_fasta_basic(tmp_path):
    p = write(tmp_path, "a.fa", ">s1\nACGT\nACGT\n>s2 desc\nTTTT\n")
    assert read_fasta_bytes(p) == [b"ACGTACGT", b"TTTT"]


def test_fasta_headerless_and_crlf(tmp_path):
    p = write(tmp_path, "b.fa", "ACGT\r\nAC\n>s2\nGG\n")
    assert read_fasta_bytes(p) == [b"ACGTAC", b"GG"]


def test_fasta_python_fallback_matches_native(tmp_path):
    content = ">x\nAC\nGT\n\n>y\n\n>z\nTT\nheaderless"
    p = write(tmp_path, "c.fa", content)
    native = read_fasta_bytes(p)
    assert native == _read_fasta_py(p)


def test_fasta_missing_file():
    with pytest.raises((FileNotFoundError, OSError)):
        read_fasta_bytes("/nonexistent/file.fa")


def run_cli(args, capsys):
    from edlib_tpu.cli import main
    rc = main(args)
    out = capsys.readouterr().out
    return rc, out


def test_cli_distance(tmp_path, capsys):
    q = write(tmp_path, "q.fa", ">q1\nACT\n>q2\nTTTT\n")
    t = write(tmp_path, "t.fa", ">t\nCGACTGAC\n")
    rc, out = run_cli(["-m", "HW", q, t], capsys)
    assert rc == 0
    assert "#0: 0" in out
    assert "Using HW alignment mode." in out


def test_cli_path_nice(tmp_path, capsys):
    q = write(tmp_path, "q.fa", ">q1\nelephant\n")
    t = write(tmp_path, "t.fa", ">t\ntelephone\n")
    rc, out = run_cli(["-p", q, t], capsys)
    assert rc == 0
    assert "score = 3" in out
    assert "T: " in out and "Q: " in out


def test_cli_cigar_format(tmp_path, capsys):
    q = write(tmp_path, "q.fa", ">q1\nAAAA\n")
    t = write(tmp_path, "t.fa", ">t\nAAAA\n")
    rc, out = run_cli(["-p", "-f", "CIG_EXT", q, t], capsys)
    assert "4=" in out
    rc, out = run_cli(["-p", "-f", "CIG_STD", q, t], capsys)
    assert "4M" in out


def test_cli_best_n_and_k(tmp_path, capsys):
    q = write(tmp_path, "q.fa",
              ">a\nAAAA\n>b\nAAAT\n>c\nTTTT\n>d\nAATT\n")
    t = write(tmp_path, "t.fa", ">t\nAAAA\n")
    rc, out = run_cli(["-n", "2", q, t], capsys)
    assert rc == 0
    # The two best (0 and 1 edits) survive; worse ones are pruned.
    assert "#0: 0" in out
    assert "#1: 1" in out
    assert "#2:" not in out
    rc, out = run_cli(["-k", "0", q, t], capsys)
    assert "#0: 0" in out and "#1:" not in out


def test_cli_batch_backend_matches_host(tmp_path, capsys):
    rngl = np.random.RandomState(3)
    qs = "".join(f">q{i}\n" + "".join(
        rngl.choice(list("ACGT"), 30)) + "\n" for i in range(8))
    q = write(tmp_path, "q.fa", qs)
    t = write(tmp_path, "t.fa", ">t\n" + "".join(
        rngl.choice(list("ACGT"), 300)) + "\n")
    rc1, out1 = run_cli(["-m", "HW", "--backend", "host", q, t], capsys)
    rc2, out2 = run_cli(["-m", "HW", "--backend", "jax", q, t], capsys)

    def scores(o):
        return [l for l in o.splitlines() if l.startswith("#")]
    assert scores(out1) == scores(out2)


def test_cli_missing_file(tmp_path, capsys):
    t = write(tmp_path, "t.fa", ">t\nAAAA\n")
    rc, out = run_cli(["/nope.fa", t], capsys)
    assert rc == 1
    assert "no file" in out
