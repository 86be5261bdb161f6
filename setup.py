"""Build hook: compile the native Vamana builder (C-ABI shared library,
loaded via ctypes — pybind11 is deliberately not a dependency) into the
package as ``annlite_tpu/_native/libvamana.so``.

Mirrors the reference's native build role (`/root/reference/setup.py:57-78`
builds pybind11 + Cython extensions); here there is a single C++17 file and
no Python C API surface, so a plain ``g++ -shared`` is sufficient and keeps
the wheel ABI-independent of the CPython version.
"""
import os
import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = Path(__file__).resolve().parent


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = ROOT / 'native' / 'vamana.cpp'
        if not src.exists():  # building from an sdist that ships the copy
            src = ROOT / 'annlite_tpu' / '_native' / 'vamana.cpp'
        outdir = Path(self.build_lib) / 'annlite_tpu' / '_native'
        outdir.mkdir(parents=True, exist_ok=True)
        out = outdir / 'libvamana.so'
        cxx = shutil.which('g++') or shutil.which('c++')
        if cxx is None:
            print('warning: no C++ compiler found — libvamana.so will be '
                  'built on demand at import time if a compiler is present')
            return
        # wheels can travel to other machines: default to the portable
        # x86-64-v2 baseline (a -march=native .so SIGILLs on an older CPU
        # with no rebuild trigger, since the .so exists); local installs
        # can opt back in with ANNLITE_TPU_MARCH=native
        march = os.environ.get('ANNLITE_TPU_MARCH', 'x86-64-v2')
        cmd = [cxx, '-O3', f'-march={march}', '-std=c++17', '-fPIC',
               '-pthread', '-shared', str(src), '-o', str(out)]
        print('building native lib:', ' '.join(cmd))
        subprocess.run(cmd, check=True)
        # ship the source too so the on-demand fallback can rebuild on a
        # machine with a different -march
        shutil.copy2(src, outdir / 'vamana.cpp')


setup(cmdclass={'build_py': BuildWithNative})
