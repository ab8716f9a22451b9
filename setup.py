"""Build hook: ship the native C++ runtime sources inside the wheel.

The top-level ``native/`` directory is the canonical home of the C++
runtime (repo layout), but wheels only package ``edlib_tpu*`` — so at
build time the sources are copied into ``edlib_tpu/_native_src/`` where
``native_loader`` finds them in installed layouts (ADVICE r1: installed
wheels must not silently lose the native fast path).
"""

import glob
import os
import shutil

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithNativeSrc(build_py):
    def run(self):
        super().run()
        root = os.path.dirname(os.path.abspath(__file__))
        src_dir = os.path.join(root, "native")
        dst_dir = os.path.join(self.build_lib, "edlib_tpu", "_native_src")
        if os.path.isdir(src_dir):
            os.makedirs(dst_dir, exist_ok=True)
            for pat in ("*.cpp", "*.h", "Makefile", "CMakeLists.txt"):
                for f in glob.glob(os.path.join(src_dir, pat)):
                    shutil.copy2(f, dst_dir)


setup(cmdclass={"build_py": BuildPyWithNativeSrc})
