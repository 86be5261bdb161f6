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
        cb, _ = kmeans_fit(key, x, self.n_clusters, iters=self.iter, n_init=self.n_init)
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
        self._codebook = np.asarray(self._mb_state.centroids)
        self._is_trained = True
        return self

    def encode(self, x: np.ndarray) -> np.ndarray:
        """Nearest-centroid cell assignment [n] (reference `vq.py:75-82`)."""
        self._check_trained()
        x = self._prep(x)
        return np.asarray(assign(x, jnp.asarray(self._codebook)))

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
