"""ctypes bindings for the native Vamana graph builder
(`native/vamana.cpp`).

Library resolution order:
1. ``$ANNLITE_TPU_VAMANA_LIB`` (explicit override);
2. ``annlite_tpu/_native/libvamana.so`` — compiled into the wheel by
   ``setup.py`` (``pip install .``), with an on-demand ``g++`` rebuild from
   the shipped source if only ``vamana.cpp`` is present;
3. the repo-checkout ``native/`` directory, built on demand via ``make``.
"""
import ctypes
import os
import shutil
import subprocess
from pathlib import Path

_PKG_NATIVE_DIR = Path(__file__).resolve().parents[1] / '_native'
_REPO_NATIVE_DIR = Path(__file__).resolve().parents[2] / 'native'
_lib = None


def _resolve_lib_path() -> Path:
    env = os.environ.get('ANNLITE_TPU_VAMANA_LIB')
    if env:
        return Path(env)
    pkg_so = _PKG_NATIVE_DIR / 'libvamana.so'
    if pkg_so.exists():
        return pkg_so
    pkg_src = _PKG_NATIVE_DIR / 'vamana.cpp'
    if pkg_src.exists():  # installed wheel without a prebuilt .so
        cxx = shutil.which('g++') or shutil.which('c++')
        if cxx:
            # site-packages may be read-only; fall back to a per-user cache
            # keyed by source mtime so a source update triggers a rebuild
            targets = [pkg_so]
            cache = Path(os.environ.get(
                'XDG_CACHE_HOME', Path.home() / '.cache')) / 'annlite_tpu'
            targets.append(
                cache / f'libvamana_{int(pkg_src.stat().st_mtime)}.so')
            for target in targets:
                if target.exists():
                    return target
                try:
                    target.parent.mkdir(parents=True, exist_ok=True)
                    subprocess.run(
                        [cxx, '-O3', '-march=native', '-std=c++17', '-fPIC',
                         '-pthread', '-shared', str(pkg_src),
                         '-o', str(target)],
                        check=True, capture_output=True,
                    )
                    return target
                except (OSError, subprocess.CalledProcessError):
                    continue  # unwritable location — try the next one
    repo_so = _REPO_NATIVE_DIR / 'libvamana.so'
    if not repo_so.exists():
        subprocess.run(['make', '-C', str(_REPO_NATIVE_DIR)], check=True,
                       capture_output=True)
    return repo_so


def load_lib():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(_resolve_lib_path()))
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int32_p = ctypes.POINTER(ctypes.c_int32)
    lib.vamana_create.restype = ctypes.c_void_p
    lib.vamana_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
    ]
    lib.vamana_destroy.argtypes = [ctypes.c_void_p]
    lib.vamana_size.argtypes = [ctypes.c_void_p]
    lib.vamana_size.restype = ctypes.c_int
    lib.vamana_medoid.argtypes = [ctypes.c_void_p]
    lib.vamana_medoid.restype = ctypes.c_int
    lib.vamana_add.argtypes = [ctypes.c_void_p, c_float_p, ctypes.c_int, ctypes.c_int]
    lib.vamana_get_adjacency.argtypes = [ctypes.c_void_p, c_int32_p]
    lib.vamana_load.argtypes = [ctypes.c_void_p, c_float_p, c_int32_p, ctypes.c_int]
    lib.vamana_update.argtypes = [ctypes.c_void_p, c_int32_p, c_float_p, ctypes.c_int]
    lib.vamana_search.argtypes = [
        ctypes.c_void_p, c_float_p, ctypes.c_int, ctypes.c_int, c_int32_p, c_float_p,
    ]
    _lib = lib
    return lib


class VamanaGraph:
    """Thin RAII wrapper over the C graph handle."""

    def __init__(self, dim: int, max_degree: int = 32, alpha: float = 1.2,
                 metric_ip: bool = False, l_build: int = 64):
        import numpy as np

        self._np = np
        self.lib = load_lib()
        self.dim = dim
        self.max_degree = max_degree
        self.alpha = alpha
        self.metric_ip = metric_ip
        self.l_build = l_build
        self._h = self.lib.vamana_create(
            dim, max_degree, ctypes.c_float(alpha), 1 if metric_ip else 0, l_build
        )

    def __del__(self):
        try:
            if getattr(self, '_h', None):
                self.lib.vamana_destroy(self._h)
        except Exception:
            pass

    @property
    def size(self) -> int:
        return self.lib.vamana_size(self._h)

    @property
    def medoid(self) -> int:
        return self.lib.vamana_medoid(self._h)

    def add(self, x, n_threads: int = 0):
        np = self._np
        x = np.ascontiguousarray(x, dtype=np.float32)
        assert x.ndim == 2 and x.shape[1] == self.dim
        self.lib.vamana_add(
            self._h,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.shape[0],
            n_threads,
        )

    def update(self, ids, x):
        """In-place vector update + rewire (hnswlib `updatePoint` parity):
        overwrite stored vectors at ``ids``, then re-insert each point."""
        np = self._np
        ids = np.ascontiguousarray(ids, dtype=np.int32).reshape(-1)
        x = np.ascontiguousarray(x, dtype=np.float32)
        assert x.shape == (len(ids), self.dim)
        assert len(ids) == 0 or (ids.min() >= 0 and ids.max() < self.size)
        if len(ids):
            self.lib.vamana_update(
                self._h,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(ids),
            )

    def adjacency(self):
        np = self._np
        n = self.size
        out = np.empty((n, self.max_degree), dtype=np.int32)
        if n:
            self.lib.vamana_get_adjacency(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            )
        return out

    def load(self, x, adjacency):
        np = self._np
        x = np.ascontiguousarray(x, dtype=np.float32)
        adjacency = np.ascontiguousarray(adjacency, dtype=np.int32)
        assert adjacency.shape == (x.shape[0], self.max_degree)
        self.lib.vamana_load(
            self._h,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            adjacency.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            x.shape[0],
        )

    def search(self, q, k: int = 10, L: int = 64):
        """Host-side reference search (parity checks only)."""
        np = self._np
        q = np.ascontiguousarray(q, dtype=np.float32).reshape(-1)
        ids = np.empty(k, dtype=np.int32)
        ds = np.empty(k, dtype=np.float32)
        self.lib.vamana_search(
            self._h,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            k,
            L,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return ds, ids
