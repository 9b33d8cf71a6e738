"""Build hook: compile the C++ host-DSP library before packaging.

All metadata lives in pyproject.toml; this file exists only to run
`make -C native` (producing vcvits_tpu/native/libvcvits_native.so) during
the build when a C++ toolchain is available. The library is optional —
every native function has a NumPy fallback (vcvits_tpu/native/__init__.py),
so a failed native build degrades, loudly, to pure-Python DSP.
"""

from __future__ import annotations

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self) -> None:
        root = os.path.dirname(os.path.abspath(__file__))
        makefile = os.path.join(root, "native", "Makefile")
        cxx = os.environ.get("CXX", "g++")
        if os.path.exists(makefile) and shutil.which(cxx) and shutil.which("make"):
            try:
                subprocess.run(["make", "-C", os.path.join(root, "native")],
                               check=True)
            except subprocess.CalledProcessError as e:
                print(f"WARNING: native DSP build failed ({e}); "
                      "packaging with NumPy fallbacks only")
        else:
            print("NOTE: no C++ toolchain found; packaging with the "
                  "prebuilt .so if present, NumPy fallbacks otherwise")
        super().run()


setup(cmdclass={"build_py": build_py_with_native})
