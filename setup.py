"""Build hooks: metadata lives in pyproject.toml; this file only compiles
the native novelty kernel (tpu_diffusion/native/novelty.cpp) into the built
package so installed wheels ship libnovelty.so ready-made. Source checkouts
still work without it — protein/novelty.py falls back to a g++-at-import
build and then to pure numpy.

Parity target: the reference's `amortised diffusion/setup.py:4-17`, which
wires its Cython novelty extension into the install.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        super().run()
        src = os.path.join(self.build_lib, "tpu_diffusion", "native",
                           "novelty.cpp")
        out = os.path.join(os.path.dirname(src), "libnovelty.so")
        if not os.path.exists(src):
            return
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", out], check=True)
            print(f"[setup] built native novelty kernel -> {out}")
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"[setup] native kernel build skipped ({e}); the numpy "
                  "fallback in protein/novelty.py will be used")


setup(cmdclass={"build_py": build_py_with_native})
