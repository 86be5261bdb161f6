"""Graph-index example: TPU-built Vamana graph + batched device beam search.

Run: python examples/graph_search.py
(CPU works too: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/graph_search.py)
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from annlite_tpu import AnnLite
from annlite_tpu.doc import Doc

rng = np.random.default_rng(0)
N, D = 20_000, 128
centers = rng.standard_normal((32, D)).astype(np.float32) * 3
X = (centers[rng.integers(0, 32, N)] + rng.standard_normal((N, D))).astype(np.float32)

ann = AnnLite(
    n_dim=D,
    metric='cosine',
    index_type='graph',
    graph_build_mode='device',   # construct the graph on the TPU
    max_degree=32,
    ef_search=64,
    columns=[('category', int)],
    data_path=tempfile.mkdtemp(),
)

print(f'indexing {N} docs (device-built Vamana graph)...')
ann.index([
    Doc(id=f'doc{i}', embedding=X[i], tags={'category': int(i % 10)})
    for i in range(N)
])

# plain search
results = ann.search([Doc(id='q', embedding=X[42])], limit=5)
print('top-5 for doc42:', [m.id for m in results[0].matches])

# filtered search: every match satisfies the predicate
out = ann.search_by_vectors(
    X[:3], filter={'category': {'$in': [1, 2]}}, limit=5, include_metadata=True
)
for qi, matches in enumerate(out):
    cats = [m.tags['category'] for m in matches]
    print(f'query {qi} filtered categories: {cats}')
    assert all(c in (1, 2) for c in cats)

# device-resident serving loop (no per-call host round-trips)
import jax.numpy as jnp

searcher = ann._container.vec_index.device_searcher(limit=10)  # GraphIndex
d, ids = searcher(jnp.asarray(X[:64]))
print('jitted searcher batch-64 ok:', ids.shape)
