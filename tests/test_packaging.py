"""Wheel packaging: build, install to a clean target, import from outside
the repo, and confirm the native fast path ships (SURVEY §1 build layer;
round-1 ADVICE: installed wheels must not silently lose the native
engines).  Skips when pip/wheel tooling is unavailable."""

import os
import subprocess
import sys
import tempfile

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_wheel_builds_installs_and_keeps_native():
    probe = subprocess.run([sys.executable, "-m", "pip", "--version"],
                           capture_output=True, text=True, timeout=60)
    if probe.returncode != 0:
        pytest.skip("pip unavailable")  # only missing TOOLING skips
    tmp = tempfile.mkdtemp(prefix="edlib_tpu_wheel_")
    build = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", _REPO, "--no-deps",
         "--no-build-isolation", "-w", tmp],
        capture_output=True, text=True, timeout=300)
    # A failing BUILD is the regression this test exists to catch.
    assert build.returncode == 0, build.stderr[-800:]
    wheels = [f for f in os.listdir(tmp) if f.endswith(".whl")]
    assert wheels, build.stdout[-500:]
    site = os.path.join(tmp, "site")
    inst = subprocess.run(
        [sys.executable, "-m", "pip", "install", "-q", "--no-deps",
         "--target", site, os.path.join(tmp, wheels[0])],
        capture_output=True, text=True, timeout=300)
    assert inst.returncode == 0, inst.stderr[-500:]

    # The wheel ships PREBUILT native objects (setup.py's build hook): the
    # installed package must reach the native fast path with NO compiler
    # available — simulated by a PATH without g++/cc.
    nocc = os.path.join(tmp, "nocc-bin")
    os.makedirs(nocc, exist_ok=True)
    for tool in ("sh",):  # subprocess plumbing only; no compilers
        src_tool = "/bin/" + tool
        if os.path.exists(src_tool):
            os.symlink(src_tool, os.path.join(nocc, tool))
    code = (
        "import shutil\n"
        "assert shutil.which('g++') is None, 'compiler leaked into PATH'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import os, edlib_tpu\n"
        "assert os.path.dirname(edlib_tpu.__file__).startswith(%r), \\\n"
        "    edlib_tpu.__file__\n"
        "r = edlib_tpu.align('ACT','CGACTGAC',mode='HW',task='path')\n"
        "assert (r['editDistance'], r['cigar']) == (0, '3='), r\n"
        "from edlib_tpu import native_loader\n"
        "assert native_loader.available()\n"
        "assert native_loader.get_ext() is not None\n"
        "print('WHEEL_OK')\n" % site)
    env = dict(os.environ, PYTHONPATH=site, PATH=nocc,
               HOME=os.path.join(tmp, "home"))  # empty ~/.cache too
    env.pop("EDLIB_TPU_FORCE_PALLAS", None)
    run = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300, cwd=tmp, env=env)
    assert run.returncode == 0 and "WHEEL_OK" in run.stdout, \
        run.stdout[-800:] + run.stderr[-800:]
