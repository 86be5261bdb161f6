"""Quick start: train, index, filtered search, CRUD, persistence.

Run:  python examples/quickstart.py
"""
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from annlite_tpu import AnnLite
from annlite_tpu.doc import Doc

# start from a clean workspace so the example is re-runnable (the later
# reopen demonstrates persistence within THIS run)
shutil.rmtree('/tmp/annlite_quickstart', ignore_errors=True)

N, D = 10_000, 128

rng = np.random.default_rng(0)
centers = rng.standard_normal((64, D)).astype(np.float32) * 2
x = (centers[rng.integers(0, 64, N)] + rng.standard_normal((N, D))).astype(np.float32)

ann = AnnLite(
    n_dim=D,
    metric='cosine',
    n_subvectors=16,      # PQ16 compression; drop for exact flat search
    rerank=100,           # ADC shortlist -> exact rerank (recall ~1.0)
    columns=[('price', float), ('category', str)],
    data_path='/tmp/annlite_quickstart',
)

print('training codebooks...')
ann.train(x[:5000])

print('indexing...')
ann.index(
    [
        Doc(
            id=f'doc{i}',
            embedding=x[i],
            tags={'price': float(i % 100), 'category': f'cat{i % 5}'},
        )
        for i in range(N)
    ]
)
print('stat:', ann.stat)

print('\nfiltered search: price < 25 AND category == cat1')
results = ann.search_by_vectors(
    x[:2],
    filter={'$and': [{'price': {'$lt': 25}}, {'category': 'cat1'}]},
    limit=5,
    include_metadata=True,
)
for qi, matches in enumerate(results):
    print(f'  query {qi}:')
    for m in matches:
        print(f'    {m.id:>8}  score={m.score:.4f}  tags={m.tags}')

print('\nCRUD: delete doc0, update doc1')
ann.delete(['doc0'])
ann.update([Doc(id='doc1', embedding=-x[2], tags={'price': 1.0, 'category': 'new'})])

print('snapshot + reopen')
ann.dump()
ann.close()
ann = AnnLite(
    n_dim=D, metric='cosine', n_subvectors=16, rerank=100,
    columns=[('price', float), ('category', str)],
    data_path='/tmp/annlite_quickstart',
)
print('reopened:', ann.stat['index_size'], 'docs')
ann.close()
