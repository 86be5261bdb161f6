"""OPQ — Optimized Product Quantization (Ge et al., CVPR'13).

Goes beyond the reference (which has plain PQ only): a learned orthogonal
rotation ``R`` is applied before PQ so the subspace split aligns with the
data's principal structure, cutting quantization error at the same code
budget.  Training alternates:

1. fit PQ codebooks on ``x @ R`` (jitted vmapped k-means),
2. update ``R`` by orthogonal Procrustes: ``R = U V^T`` from the SVD of
   ``x^T x̂`` (data vs decoded reconstruction).

Everything downstream (ADC kernels, indexes) is unchanged — an
``OPQCodec`` is a drop-in `PQCodec` whose encode/get_dist_mat first rotate
the input, so the rotated-space L2 geometry equals the original (R is
orthogonal).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..math import l2_normalize
from .pq import PQCodec


@jax.jit
def _procrustes_update(x, recon_rot):
    """R = argmin_R ||x R - recon_rot||_F  s.t.  R^T R = I."""
    m = jnp.dot(
        x.T, recon_rot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    return jnp.dot(u, vt, precision=jax.lax.Precision.HIGHEST)


class OPQCodec(PQCodec):
    """PQ with a learned orthogonal pre-rotation."""

    def __init__(self, *args, opq_iters: int = 5, **kwargs):
        super().__init__(*args, **kwargs)
        self.opq_iters = opq_iters
        self._rotation = np.eye(self.dim, dtype=np.float32)

    @property
    def rotation(self) -> np.ndarray:
        return self._rotation

    def _rotate(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(
            jnp.dot(
                jnp.asarray(x, dtype=jnp.float32),
                jnp.asarray(self._rotation),
                precision=jax.lax.Precision.HIGHEST,
            )
        )

    def fit(self, x: np.ndarray, iter: int = 25):
        x = np.asarray(x, dtype=np.float32)
        if self.normalize_input:
            x = np.asarray(l2_normalize(x))
        self._rotation = np.eye(self.dim, dtype=np.float32)
        for it in range(self.opq_iters):
            xr = self._rotate(x)
            # (re)fit codebooks in the rotated space — use the parent's
            # k-means but skip its normalization (already applied)
            saved, self.normalize_input = self.normalize_input, False
            try:
                super().fit(xr, iter=iter)
                codes = super().encode(xr)
                recon = super().decode(codes)
            finally:
                self.normalize_input = saved
            if it < self.opq_iters - 1:
                self._rotation = np.asarray(
                    _procrustes_update(jnp.asarray(x), jnp.asarray(recon))
                )
        self._is_trained = True
        return self

    # ----- inference: rotate, then delegate -----

    def _prep(self, x):
        x = np.asarray(x, dtype=np.float32)
        if x.ndim != 2:
            raise ValueError('expected [n, dim] input')
        if self.normalize_input:
            x = np.asarray(l2_normalize(x))
        return jnp.asarray(self._rotate(x))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """Decode to the ORIGINAL space (un-rotate)."""
        recon_rot = super().decode(codes)
        return np.asarray(
            jnp.dot(
                jnp.asarray(recon_rot),
                jnp.asarray(self._rotation).T,
                precision=jax.lax.Precision.HIGHEST,
            )
        )

    # ----- serde -----

    def _state(self):
        st = super()._state()
        st['params']['opq_iters'] = self.opq_iters
        st['arrays']['rotation'] = self._rotation
        return st

    def _restore(self, params, arrays):
        opq_iters = params.pop('opq_iters', 5)
        super()._restore(params, arrays)
        self.opq_iters = opq_iters
        self._rotation = arrays.get(
            'rotation', np.eye(self.dim, dtype=np.float32)
        )
