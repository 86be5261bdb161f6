"""annlite_tpu — TPU-native filterable ANN search (JAX/XLA/Pallas/pjit).

A from-scratch re-expression of the capabilities of jina-ai/annlite
(reference mounted at /root/reference) designed for TPU hardware: quantized
scoring on the MXU, Pallas ADC kernels, mesh-sharded segments, and exact
predicate-bitmask filtering fused into the scoring path.
"""

__version__ = '0.1.0'

from .enums import ExpandMode, Metric
from .filter import Filter

__all__ = ['Metric', 'ExpandMode', 'Filter', 'AnnLite', 'DocumentArray',
           '__version__']


def __getattr__(name):
    # lazy import to keep `import annlite_tpu` light (no jax warm-up)
    if name == 'AnnLite':
        from .index_api import AnnLite

        return AnnLite
    if name == 'DocumentArray':
        from .docarray_compat import DocumentArray

        return DocumentArray
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
