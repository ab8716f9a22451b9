"""Build hook: ship the native C++ runtime inside the wheel — PREBUILT.

The top-level ``native/`` directory is the canonical home of the C++
runtime (repo layout), but wheels only package ``edlib_tpu*`` — so at
build time the sources are copied into ``edlib_tpu/_native_src/`` where
``native_loader`` finds them in installed layouts (ADVICE r1: installed
wheels must not silently lose the native fast path).

The hook also COMPILES the two shared objects into the same directory
(the reference ships prebuilt wheels via cibuildwheel,
bindings/python/Makefile "wheels" target): installed wheels then import
without a toolchain.  Compilation is best-effort — without g++ the wheel
still works, compiling from the shipped sources at first import.  The
prebuilt objects use portable -O3 (no -march=native): a host that wants
native tuning can delete them or set EDLIB_TPU_REBUILD_NATIVE=1 to force
a local rebuild into the user cache.
"""

import glob
import hashlib
import json
import os
import shutil
import subprocess
import sys
import sysconfig

from setuptools import setup
from setuptools.command.build_py import build_py

_PORTABLE_FLAGS = ["-O3", "-std=c++17", "-fPIC", "-pthread", "-shared"]


class BuildPyWithNativeSrc(build_py):
    def run(self):
        super().run()
        root = os.path.dirname(os.path.abspath(__file__))
        src_dir = os.path.join(root, "native")
        dst_dir = os.path.join(self.build_lib, "edlib_tpu", "_native_src")
        if not os.path.isdir(src_dir):
            return
        os.makedirs(dst_dir, exist_ok=True)
        for pat in ("*.cpp", "*.h", "Makefile", "CMakeLists.txt"):
            for f in glob.glob(os.path.join(src_dir, pat)):
                shutil.copy2(f, dst_dir)
        self._prebuild(dst_dir)

    def _prebuild(self, dst_dir):
        core = os.path.join(dst_dir, "edlib_tpu_native.cpp")
        compat = os.path.join(dst_dir, "edlib_compat.cpp")
        pyext = os.path.join(dst_dir, "pyext.cpp")
        jobs = [(["g++", *_PORTABLE_FLAGS,
                  "-o", os.path.join(dst_dir, "libedlib_tpu_native.so"),
                  core] + ([compat] if os.path.exists(compat) else []),
                 "libedlib_tpu_native.so")]
        if os.path.exists(pyext):
            inc = sysconfig.get_paths()["include"]
            jobs.append((["g++", *_PORTABLE_FLAGS, "-I", inc,
                          pyext, core,
                          "-o", os.path.join(dst_dir,
                                             "_edlib_tpu_native_ext.so")],
                         "_edlib_tpu_native_ext.so"))
        manifest = {}
        for cmd, name in jobs:
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=600)
                print(f"prebuilt {name}")
            except (subprocess.SubprocessError, FileNotFoundError,
                    OSError) as e:
                print(f"WARNING: could not prebuild {name} ({e}); the "
                      "wheel will compile from source at first import",
                      file=sys.stderr)
                continue
            # Freshness manifest: installers rewrite mtimes, so the loader
            # validates prebuilt objects by source content hash instead.
            srcs = [a for a in cmd if a.endswith(".cpp")]
            manifest[name] = {
                os.path.basename(s): hashlib.sha256(
                    open(s, "rb").read()).hexdigest()
                for s in srcs}
        if manifest:
            with open(os.path.join(dst_dir, "PREBUILT.json"), "w") as f:
                json.dump(manifest, f, indent=1)


setup(cmdclass={"build_py": BuildPyWithNativeSrc})
