"""Byte-diff tests for the compiled native CLI (native/aligner_main.cpp).

Builds the reference aligner binary (apps/aligner/aligner.cpp) and our
`edlib-tpu-aligner` and compares full stdout (minus the CPU-time line)
across a flag matrix on randomized and edge-case FASTA inputs; also pins
the Python CLI (edlib_tpu.cli) to the same bytes.
"""

import io
import os
import random
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REF_DIR = os.environ.get("EDLIB_REFERENCE_DIR", "/root/reference")
REF_BIN = "/tmp/edlib_ref_aligner_test"
OUR_BIN = os.path.join(REPO, "native", "edlib-tpu-aligner")


def _build_binaries():
    ref_srcs = [os.path.join(_REF_DIR, "edlib/src/edlib.cpp"),
                os.path.join(_REF_DIR, "apps/aligner/aligner.cpp")]
    if not all(os.path.exists(s) for s in ref_srcs):
        return False
    try:
        if not os.path.exists(REF_BIN):
            subprocess.run(
                ["g++", "-O2", "-std=c++14",
                 "-I", os.path.join(_REF_DIR, "edlib/include")]
                + ref_srcs + ["-o", REF_BIN],
                check=True, capture_output=True, timeout=300)
        subprocess.run(["make", "-C", os.path.join(REPO, "native"),
                        "aligner"],
                       check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, FileNotFoundError):
        return False
    return os.path.exists(REF_BIN) and os.path.exists(OUR_BIN)


@pytest.fixture(scope="module")
def binaries():
    if not _build_binaries():
        pytest.skip("toolchain or reference sources unavailable")
    return REF_BIN, OUR_BIN


@pytest.fixture(scope="module")
def fasta(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_fa")
    rng = random.Random(1234)
    t = "".join(rng.choice("ACGT") for _ in range(5000))
    (d / "t.fa").write_text(">t\n" + t + "\n")
    with open(d / "q.fa", "w") as f:
        for i in range(60):
            if i % 7 == 0:
                q = "".join(rng.choice("ACGT")
                            for _ in range(rng.randint(1, 400)))
            else:  # mutated substring: exercises the best-N heap
                pos = rng.randint(0, 4600)
                q = list(t[pos:pos + rng.randint(20, 300)])
                for j in range(len(q)):
                    if rng.random() < 0.1:
                        q[j] = rng.choice("ACGT-")
                q = "".join(c for c in q if c != "-")
            f.write(f">q{i}\n{q}\n")
    # headerless first record, -1 end-location case, 64-word boundary
    (d / "edge_q.fa").write_text("AA\n>q2\n" + "A" * 64 + "\n>q3\nB\n"
                                 + ">q4\n" + "C" * 63 + "\n")
    (d / "edge_t.fa").write_text("B\n")
    return d


def _run(binary, flags, q, t):
    out = subprocess.run([binary] + flags + [str(q), str(t)],
                         capture_output=True, timeout=600).stdout
    return b"\n".join(l for l in out.splitlines()
                      if not l.startswith(b"Cpu time"))


FLAG_MATRIX = [
    ["-m", "NW"], ["-m", "HW"], ["-m", "SHW"],
    ["-m", "HW", "-l"], ["-m", "SHW", "-l"],
    ["-m", "NW", "-p"], ["-m", "HW", "-p"], ["-m", "SHW", "-p"],
    ["-m", "HW", "-p", "-f", "CIG_STD"],
    ["-m", "NW", "-p", "-f", "CIG_EXT"],
    ["-m", "HW", "-s"], ["-m", "NW", "-k", "10"],
    ["-m", "HW", "-n", "5"], ["-m", "HW", "-n", "5", "-l"],
    ["-m", "NW", "-n", "3", "-p", "-f", "CIG_EXT"],
    ["-m", "NW", "-r", "3"],
]


@pytest.mark.parametrize("flags", FLAG_MATRIX,
                         ids=lambda f: " ".join(f))
def test_native_cli_matches_reference(binaries, fasta, flags):
    ref, ours = binaries
    a = _run(ref, flags, fasta / "q.fa", fasta / "t.fa")
    b = _run(ours, flags, fasta / "q.fa", fasta / "t.fa")
    assert a == b


@pytest.mark.parametrize("flags", [["-m", "HW"], ["-m", "HW", "-l"],
                                   ["-m", "SHW", "-p"], ["-m", "NW", "-p"]],
                         ids=lambda f: " ".join(f))
def test_native_cli_edge_cases(binaries, fasta, flags):
    ref, ours = binaries
    a = _run(ref, flags, fasta / "edge_q.fa", fasta / "edge_t.fa")
    b = _run(ours, flags, fasta / "edge_q.fa", fasta / "edge_t.fa")
    assert a == b


@pytest.mark.parametrize("flags", [["-m", "HW", "-n", "5"],
                                   ["-m", "NW", "-p"]],
                         ids=lambda f: " ".join(f))
def test_python_cli_matches_native_cli(binaries, fasta, flags):
    _ref, ours = binaries
    native = _run(ours, flags, fasta / "q.fa", fasta / "t.fa")
    from edlib_tpu import cli
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        rc = cli.main(flags + ["--backend", "host",
                               str(fasta / "q.fa"), str(fasta / "t.fa")])
    finally:
        sys.stdout = old
    assert rc == 0
    py = b"\n".join(l for l in buf.getvalue().encode().splitlines()
                    if not l.startswith(b"Cpu time"))
    assert py == native
