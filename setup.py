"""Build hook: compile the native C++ decoder during install.

The decoder is a plain ctypes shared library (no pybind11), so it is
built with the Makefile rather than as a Python extension; qec/native.py
locates it relative to the repo/package root at import time and degrades
gracefully (pure-JAX decoders) when absent.
"""
import shutil
import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = Path(__file__).parent
        native = root / "native"
        if native.exists():
            try:
                subprocess.run(["make", "-C", str(native)], check=True)
                # ship inside the package so package-data installs it to
                # noisyquantumsimulator_tpu/native/ (not a bare top-level dir)
                dest = root / "noisyquantumsimulator_tpu" / "native"
                dest.mkdir(exist_ok=True)
                shutil.copy2(native / "libufdecode.so",
                             dest / "libufdecode.so")
            except Exception as e:  # native decoder is optional
                print(f"warning: native decoder build failed ({e}); "
                      "falling back to pure-JAX decoders", file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
