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


def _eigenvalue_allocation(x: np.ndarray, m: int) -> np.ndarray:
    """Parametric OPQ init (Ge et al. §4 'eigenvalue allocation'): rotate
    onto the PCA basis, then permute principal directions into the M
    subspaces so each subspace's quantization difficulty is balanced —
    greedy assignment of descending eigenvalues to the least-loaded bucket.

    Balance the VARIANCE (sum of eigenvalues), not the paper's log-product:
    product balancing assumes a smoothly decaying spectrum; on bimodal
    spectra (low intrinsic dim + a noise floor, e.g. normalized text
    embeddings with ~32 signal dims over a 4e-6 floor) the log of the near-
    zero eigenvalues dominates and the greedy stacks ALL the signal into a
    few buckets — measured per-bucket variance min/max of 2e-5/0.41 vs
    0.02/0.04 under identity, collapsing raw-ADC recall 0.38 → 0.15.
    Sum-balancing equalizes each codebook's error budget on both spectrum
    shapes (quantizer MSE at fixed K scales with bucket variance)."""
    d = x.shape[1]
    ds = d // m
    cov = np.cov(x.astype(np.float64).T)
    w, v = np.linalg.eigh(cov)           # ascending
    w, v = w[::-1], v[:, ::-1]           # descending eigenvalues
    buckets = [[] for _ in range(m)]
    load = np.zeros(m)
    for i in range(d):
        free = [b for b in range(m) if len(buckets[b]) < ds]
        b = min(free, key=lambda j: load[j])
        buckets[b].append(i)
        load[b] += float(w[i])
    perm = [i for b in buckets for i in b]
    return np.ascontiguousarray(v[:, perm], dtype=np.float32)


class OPQCodec(PQCodec):
    """PQ with a learned orthogonal pre-rotation."""

    def __init__(self, *args, opq_iters: int = 8, opq_init: str = 'eigen',
                 **kwargs):
        super().__init__(*args, **kwargs)
        if opq_init not in ('eigen', 'identity'):
            raise ValueError(f'unknown opq_init {opq_init!r}')
        self.opq_iters = opq_iters
        self.opq_init = opq_init
        self._rotation = np.eye(self.dim, dtype=np.float32)
        self.fit_trace: list = []  # per-sweep reconstruction MSE

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
        """Non-parametric OPQ alternation (Ge et al. §3), eigen-allocated
        init (§4) and warm-started codebooks: sweep 0 runs the full k-means
        in the initialized rotation; later sweeps REFINE the previous
        codebooks for a few Lloyd iterations after each Procrustes rotation
        update (a cold refit per sweep de-couples the alternation — the
        r4 diagnosis for OPQ ≈ PQ on anisotropic data).  ``fit_trace``
        records per-sweep reconstruction MSE so convergence is checkable.
        """
        x = np.asarray(x, dtype=np.float32)
        if self.normalize_input:
            x = np.asarray(l2_normalize(x))
        self._rotation = (
            _eigenvalue_allocation(x, self.n_subvectors)
            if self.opq_init == 'eigen'
            else np.eye(self.dim, dtype=np.float32)
        )
        self.fit_trace = []
        xj = jnp.asarray(x)
        rot = self._rotation
        # the parent's fit/encode/decode dispatch back into THIS class's
        # _prep/decode, which apply the rotation — neutralize it while
        # operating on pre-rotated data, else every inner call compounds
        # an extra R (the r4 bug: codebooks trained on x·R² while
        # inference encoded x·R → OPQ measured ≈ plain PQ)
        saved, self.normalize_input = self.normalize_input, False
        eye = np.eye(self.dim, dtype=np.float32)
        try:
            for it in range(self.opq_iters):
                xr = np.asarray(jnp.dot(
                    xj, jnp.asarray(rot),
                    precision=jax.lax.Precision.HIGHEST))
                self._rotation = eye
                super().fit(xr, iter=iter if it == 0 else max(iter // 4, 4),
                            warm_start=it > 0)
                codes = super().encode(xr)
                recon = super().decode(codes)
                self._rotation = rot
                self.fit_trace.append(float(np.mean((xr - recon) ** 2)))
                if it < self.opq_iters - 1:
                    rot = np.asarray(
                        _procrustes_update(xj, jnp.asarray(recon))
                    )
        finally:
            self.normalize_input = saved
            self._rotation = rot
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
        st['params']['opq_init'] = self.opq_init
        st['arrays']['rotation'] = self._rotation
        return st

    def _restore(self, params, arrays):
        opq_iters = params.pop('opq_iters', 5)
        opq_init = params.pop('opq_init', 'eigen')
        super()._restore(params, arrays)
        self.opq_iters = opq_iters
        self.opq_init = opq_init
        self._rotation = arrays.get(
            'rotation', np.eye(self.dim, dtype=np.float32)
        )
