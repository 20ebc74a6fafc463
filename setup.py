"""Build script: packages the Python library and compiles the native
runtime shared library (ctypes-loaded; replaces the reference's
scikit-build + pybind11 + cibuildwheel pipeline,
/root/reference/python-bindings/setup.py).

The native library is optional — the package falls back to pure-Python
implementations when no compiler is available (the reference instead
probes /proc/cpuinfo to pick -march flags; on TPU the compute path is
XLA-compiled, so the native lib only covers host-side runtime pieces).
"""

import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        try:
            subprocess.run(
                ["bash", "flatnav_tpu/native/build_native.sh"],
                check=True,
                timeout=300,
            )
        except Exception as e:  # noqa: BLE001
            print(f"warning: native library build skipped: {e}")
        super().run()


setup(
    cmdclass={"build_py": BuildWithNative},
    package_data={"flatnav_tpu.native": ["*.so", "*.cpp", "*.sh"]},
)
