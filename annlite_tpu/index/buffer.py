"""DeviceBuffer — growable host array with an incrementally-synced device
mirror.

The reference mutates C++ heap memory in place (`hnswalg.h:45-51` flat
level-0 buffer, `resizeIndex` realloc `hnswalg.h:680-706`).  On TPU, device
arrays are immutable, so CRUD becomes: numpy host buffer (append/scatter) +
chunk-level dirty tracking + a jitted donated ``dynamic_update_slice`` flush,
giving in-place HBM updates without re-uploading the whole corpus on every
insert batch.
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import ExpandMode


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(jax.jit, donate_argnums=(0,))
def _write_chunk_axis0(arr, vals, start):
    return jax.lax.dynamic_update_slice(arr, vals, (start,) + (0,) * (arr.ndim - 1))


@partial(jax.jit, donate_argnums=(0,))
def _write_chunk_axis1(arr, vals, start):
    return jax.lax.dynamic_update_slice(arr, vals, (0, start))


class DeviceBuffer:
    """Host-resident growable array + device mirror.

    ``grow_axis`` is the row axis (0 for ``[N, D]`` vectors, 1 for ``[M, N]``
    transposed codes).  Rows are written host-side immediately; device sync
    happens lazily per dirty chunk on :meth:`device_view`.
    """

    def __init__(
        self,
        fixed_shape: Tuple[int, ...],
        dtype,
        grow_axis: int = 0,
        chunk: int = 65536,
        initial_capacity: int = 0,
        expand_mode: 'ExpandMode' = None,
        expand_step: int = 10240,
    ):
        assert grow_axis in (0, 1)
        self.fixed_shape = tuple(fixed_shape)  # shape of non-growing axes
        self.dtype = np.dtype(dtype)
        self.grow_axis = grow_axis
        self.chunk = chunk
        self.expand_mode = (
            expand_mode if expand_mode is not None else ExpandMode.ADAPTIVE
        )
        self.expand_step = int(expand_step)
        # STEP/DOUBLE honor an explicit initial capacity exactly (reference
        # base.py:23 `initial_size or expand_step_size`); ADAPTIVE keeps
        # chunk-quantized shapes so jit programs bucket
        if self.expand_mode is ExpandMode.ADAPTIVE:
            self.capacity = max(initial_capacity, chunk)
        else:
            self.capacity = max(initial_capacity or self.expand_step, 1)
        self.size = 0
        self._host = np.zeros(self._shape(self.capacity), dtype=self.dtype)
        self._device: Optional[jax.Array] = None
        self._device_cap = 0
        self._dirty = set()

    def _shape(self, n: int) -> Tuple[int, ...]:
        if self.grow_axis == 0:
            return (n,) + self.fixed_shape
        return self.fixed_shape + (n,)

    # ----- host writes -----

    def ensure_capacity(self, n: int):
        if n <= self.capacity:
            return
        if self.expand_mode is ExpandMode.STEP:
            # reference flat_index.py:52-58: capacity grows by fixed
            # expand_step_size blocks (predictable memory, more reallocs —
            # and on TPU more compiled program shapes)
            new_cap = self.capacity + _round_up(
                n - self.capacity, self.expand_step)
        elif self.expand_mode is ExpandMode.DOUBLE:
            new_cap = max(self.capacity, 1)
            while new_cap < n:
                new_cap *= 2
        else:  # ADAPTIVE (default): double, chunk-quantized — amortized
            # O(1) copies AND O(log n) distinct jit shapes
            new_cap = _round_up(max(n, self.capacity * 2), self.chunk)
        new = np.zeros(self._shape(new_cap), dtype=self.dtype)
        if self.grow_axis == 0:
            new[: self.capacity] = self._host
        else:
            new[..., : self.capacity] = self._host
        self._host = new
        self.capacity = new_cap

    def append(self, values: np.ndarray) -> np.ndarray:
        """Append rows; returns their positions."""
        n = values.shape[self.grow_axis if self.grow_axis == 0 else -1]
        if self.grow_axis == 1:
            n = values.shape[-1]
        rows = np.arange(self.size, self.size + n)
        self.write(rows, values)
        return rows

    def write(self, rows: np.ndarray, values: np.ndarray):
        """Scatter rows (host) and mark their chunks dirty."""
        rows = np.asarray(rows)
        if rows.size == 0:
            return
        hi = int(rows.max()) + 1
        self.ensure_capacity(hi)
        if self.grow_axis == 0:
            self._host[rows] = values
        else:
            self._host[..., rows] = values
        self.size = max(self.size, hi)
        for c in np.unique(rows // self.chunk):
            self._dirty.add(int(c))

    def host_view(self) -> np.ndarray:
        if self.grow_axis == 0:
            return self._host[: self.size]
        return self._host[..., : self.size]

    # ----- device sync -----

    @property
    def device_capacity(self) -> int:
        return self._device_cap

    def device_view(self) -> jax.Array:
        """Return the device mirror (padded to chunk multiple), flushing any
        dirty chunks via donated in-place updates."""
        need_cap = _round_up(max(self.size, self.chunk), self.chunk)
        if self._device is None or self._device_cap < need_cap:
            # full (re)upload on growth — amortized by doubling host capacity
            self._device = jnp.zeros(self._shape(need_cap), dtype=self.dtype)
            self._device_cap = need_cap
            self._dirty = set(range(need_cap // self.chunk))
        writer = _write_chunk_axis0 if self.grow_axis == 0 else _write_chunk_axis1
        for c in sorted(self._dirty):
            start = c * self.chunk
            if start >= self._device_cap:
                continue
            if self.grow_axis == 0:
                vals = self._host[start : start + self.chunk]
            else:
                vals = self._host[..., start : start + self.chunk]
            self._device = writer(self._device, jnp.asarray(vals), start)
        self._dirty.clear()
        return self._device

    def reset(self):
        self.size = 0
        self._host[:] = 0
        self._device = None
        self._device_cap = 0
        self._dirty.clear()
