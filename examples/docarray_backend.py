"""DocumentArray storage-backend demo (reference `DocumentArray(storage=
'annlite')` facet — see annlite_tpu/docarray_compat.py).

Run:  python examples/docarray_backend.py
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from annlite_tpu import DocumentArray
from annlite_tpu.doc import Doc

rng = np.random.default_rng(0)
X = rng.standard_normal((5_000, 64)).astype(np.float32)

da = DocumentArray(
    storage='annlite_tpu',
    config={'n_dim': 64, 'metric': 'euclidean',
            'data_path': tempfile.mkdtemp(prefix='da_demo_')},
)

with da:  # batched write block (reference semantics)
    da.extend([Doc(id=f'r{i}', embedding=X[i]) for i in range(len(X))])
print(f'indexed {len(da)} docs')

matches = da.find(X[42], limit=5)
print('top-5 for r42:', [(m.id, round(m.score, 4)) for m in matches])

print('field selection r7 embedding[:4]:', da['r7', 'embedding'][:4])
del da[['r0', 'r1']]
print(f'after delete: {len(da)} docs, offset 0 is {da[0].id}')

da.close()
