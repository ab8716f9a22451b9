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


def test_cli_locations_path_backend_matches_host(tmp_path, capsys,
                                                 monkeypatch):
    """-l and -p through the device batch backend print byte-identical
    output to the sequential host loop (modulo the Cpu-time line)."""
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    rngl = np.random.RandomState(7)
    target = "".join(rngl.choice(list("ACGT"), 400))
    qs = ""
    for i in range(10):
        s = rngl.randint(0, 360)
        w = list(target[s:s + 40])
        for p_ in rngl.choice(40, 3, replace=False):
            w[p_] = rngl.choice(list("ACGT"))
        qs += f">q{i}\n" + "".join(w) + "\n"
    q = write(tmp_path, "q.fa", qs)
    t = write(tmp_path, "t.fa", ">t\n" + target + "\n")

    def body(o):
        # Ignore the timing line and the \r-progress counter (transient
        # terminal output; the batch backend prints it once, the
        # sequential loop per query).
        import re
        return [l for l in o.splitlines()
                if not l.startswith("Cpu time")
                and not re.fullmatch(r"\d+/\d+", l)]

    for extra in (["-l"], ["-p"], ["-p", "-f", "CIG_EXT"], ["-l", "-k", "4"]):
        rc1, out1 = run_cli(["-m", "HW", "--backend", "host", *extra, q, t],
                            capsys)
        rc2, out2 = run_cli(["-m", "HW", "--backend", "jax", *extra, q, t],
                            capsys)
        assert rc1 == rc2 == 0
        assert body(out1) == body(out2), extra


def test_cli_auto_routes_device_for_all_tasks(tmp_path, monkeypatch, capsys):
    """backend=auto picks the device batch for -l/-p too (>= 256 queries
    with a usable device) — the round-2 distance-only asymmetry is gone."""
    import edlib_tpu.cli as cli_mod
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    calls = []
    import edlib_tpu.batch as batch_mod
    monkeypatch.setattr(batch_mod, "_pallas_mode", lambda: "interpret")
    orig = cli_mod.align_batch

    def spy(*a, **kw):
        calls.append(kw.get("backend"))
        return orig(*a, **kw)

    monkeypatch.setattr(cli_mod, "align_batch", spy)
    rngl = np.random.RandomState(11)
    qs = "".join(f">q{i}\n" + "".join(rngl.choice(list("ACGT"), 12)) + "\n"
                 for i in range(256))
    q = write(tmp_path, "q.fa", qs)
    t = write(tmp_path, "t.fa", ">t\n" + "".join(
        rngl.choice(list("ACGT"), 60)) + "\n")
    rc, _ = run_cli(["-m", "HW", "-l", "-s", q, t], capsys)
    assert rc == 0
    assert "jax" in calls


def test_cli_progress_counter_byte_parity(tmp_path, capsys, monkeypatch):
    """The reference prints "\\rI/N" after EVERY query when alignments are
    not printed (aligner.cpp:198); batched backends must emit the same
    byte sequence post-hoc so redirected output stays byte-exact."""
    import numpy as np
    rng = np.random.RandomState(0)
    seqs = "".join(">q%d\n%s\n" % (i, "".join(
        "ACGT"[c] for c in rng.randint(0, 4, 40))) for i in range(6))
    q = write(tmp_path, "q.fa", seqs)
    t = write(tmp_path, "t.fa", ">t\n" + "".join(
        "ACGT"[c] for c in rng.randint(0, 4, 4000)) + "\n")
    expect = "0/6" + "".join("\r%d/6" % (i + 1) for i in range(6))
    # host sequential loop
    rc, out = run_cli(["-m", "HW", "-l", q, t], capsys)
    assert rc == 0 and expect in out
    # pooled/batched branches must match byte-for-byte too
    monkeypatch.setenv("EDLIB_TPU_FORCE_PALLAS", "interpret")
    rc, out2 = run_cli(["-m", "HW", "-l", "--backend", "jax", q, t], capsys)
    assert rc == 0 and expect in out2
