"""PCA projector codec (dimensionality reduction).

Parity with reference `annlite/core/codec/projector.py` (fit=PCA /
partial_fit=IncrementalPCA `projector.py:60-107`, encode=transform /
decode=inverse_transform `projector.py:109-130`, exposed stats
`projector.py:132-156`), built on streaming second moments + `jnp.linalg.eigh`
instead of sklearn.  The streaming formulation makes ``partial_fit`` *exact*
(same result as full-batch fit over the concatenated stream), unlike
IncrementalPCA's approximation.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseCodec


@partial(jax.jit, static_argnums=(3,))
def _finalize(n, s1, s2, n_components):
    """Moments -> (mean, components[n_components, D], explained_var, total_var)."""
    mean = s1 / n
    cov = s2 / (n - 1.0) - (n / (n - 1.0)) * jnp.outer(mean, mean)
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    eigvals = eigvals[::-1]
    eigvecs = eigvecs[:, ::-1]
    comps = eigvecs[:, :n_components].T  # [C, D]
    # deterministic sign: largest-|.| entry of each component is positive
    idx = jnp.argmax(jnp.abs(comps), axis=1)
    signs = jnp.sign(comps[jnp.arange(comps.shape[0]), idx])
    comps = comps * signs[:, None]
    ev = jnp.maximum(eigvals[:n_components], 0.0)
    total_var = jnp.sum(jnp.maximum(eigvals, 0.0))
    return mean, comps, ev, total_var


@jax.jit
def _accumulate(s1, s2, x):
    return s1 + jnp.sum(x, axis=0), s2 + jnp.dot(
        x.T, x, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


class ProjectorCodec(BaseCodec):
    def __init__(
        self,
        dim: int,
        n_components: int = 128,
        whiten: bool = False,
        seed: int = 0,
    ):
        super().__init__(require_train=True)
        if n_components > dim:
            raise ValueError('n_components must be <= dim')
        self.dim = dim
        self.n_components = n_components
        self.whiten = whiten
        self.seed = seed
        self._n = 0.0
        self._s1 = np.zeros((dim,), dtype=np.float64)
        self._s2 = np.zeros((dim, dim), dtype=np.float64)
        self._mean: Optional[np.ndarray] = None
        self._components: Optional[np.ndarray] = None
        self._explained_variance: Optional[np.ndarray] = None
        self._total_var: float = 0.0

    def __hash__(self):
        return hash(
            (self.__class__.__name__, self.dim, self.n_components, self.whiten)
        )

    def fit(self, x: np.ndarray):
        self._n = 0.0
        self._s1[:] = 0
        self._s2[:] = 0
        return self.partial_fit(x)

    def partial_fit(self, x: np.ndarray):
        x = np.asarray(x, dtype=np.float32)
        if x.ndim != 2 or x.shape[1] != self.dim:
            raise ValueError(f'expected [n, {self.dim}] input')
        s1, s2 = _accumulate(
            jnp.asarray(self._s1, dtype=jnp.float32),
            jnp.asarray(self._s2, dtype=jnp.float32),
            jnp.asarray(x),
        )
        self._s1 = np.asarray(s1, dtype=np.float64)
        self._s2 = np.asarray(s2, dtype=np.float64)
        self._n += x.shape[0]
        if self._n >= 2:
            self._finalize()
        return self

    def _finalize(self):
        mean, comps, ev, tv = _finalize(
            jnp.float32(self._n),
            jnp.asarray(self._s1, dtype=jnp.float32),
            jnp.asarray(self._s2, dtype=jnp.float32),
            self.n_components,
        )
        self._mean = np.asarray(mean)
        self._components = np.asarray(comps)
        self._explained_variance = np.asarray(ev)
        self._total_var = float(tv)
        self._is_trained = True

    def encode(self, x: np.ndarray) -> np.ndarray:
        self._check_trained()
        x = np.asarray(x, dtype=np.float32)
        y = (x - self._mean) @ self._components.T
        if self.whiten:
            y = y / np.sqrt(np.maximum(self._explained_variance, 1e-12))
        return y.astype(np.float32)

    def decode(self, y: np.ndarray) -> np.ndarray:
        self._check_trained()
        y = np.asarray(y, dtype=np.float32)
        if self.whiten:
            y = y * np.sqrt(np.maximum(self._explained_variance, 1e-12))
        return (y @ self._components + self._mean).astype(np.float32)

    # ----- stats (reference `projector.py:132-156`) -----

    @property
    def components(self) -> np.ndarray:
        self._check_trained()
        return self._components

    @property
    def mean(self) -> np.ndarray:
        self._check_trained()
        return self._mean

    @property
    def explained_variance(self) -> np.ndarray:
        self._check_trained()
        return self._explained_variance

    @property
    def explained_variance_ratio(self) -> np.ndarray:
        self._check_trained()
        return self._explained_variance / max(self._total_var, 1e-12)

    @property
    def var(self) -> np.ndarray:
        self._check_trained()
        n = max(self._n, 2.0)
        return (self._s2.diagonal() / (n - 1.0) - (n / (n - 1.0)) * self._mean**2).astype(
            np.float32
        )

    # ----- serde -----

    def _state(self):
        return {
            'params': {
                'dim': self.dim,
                'n_components': self.n_components,
                'whiten': self.whiten,
                'seed': self.seed,
                'is_trained': self._is_trained,
                'n': self._n,
                'total_var': self._total_var,
            },
            'arrays': {
                's1': self._s1,
                's2': self._s2,
                'mean': self._mean if self._mean is not None else np.zeros(0),
                'components': self._components
                if self._components is not None
                else np.zeros((0, 0)),
                'explained_variance': self._explained_variance
                if self._explained_variance is not None
                else np.zeros(0),
            },
        }

    def _restore(self, params, arrays):
        self.__init__(
            dim=params['dim'],
            n_components=params['n_components'],
            whiten=params['whiten'],
            seed=params['seed'],
        )
        self._n = params['n']
        self._total_var = params['total_var']
        self._s1 = arrays['s1']
        self._s2 = arrays['s2']
        if arrays['mean'].size:
            self._mean = arrays['mean']
            self._components = arrays['components']
            self._explained_variance = arrays['explained_variance']
        self._is_trained = params['is_trained']
