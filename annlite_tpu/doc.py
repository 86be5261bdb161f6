"""Document model — replaces docarray's ``Document`` (not available here).

The reference stores docarray Documents serialized into RocksDB
(`annlite/storage/kv.py:53-62`).  We define a minimal, msgpack-serialized
``Doc`` with the fields AnnLite actually uses: id, embedding, tags, and (on
search results) score + matches.
"""
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import msgpack
import numpy as np


def _np_default(obj):
    """msgpack fallback: numpy scalars in tags (np.int64 bucket ids etc.)
    serialize as their Python equivalents instead of raising."""
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.bool_):
        return bool(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    raise TypeError(f'cannot serialize {type(obj)!r} in Doc tags')


@dataclass
class Doc:
    id: str
    embedding: Optional[np.ndarray] = None
    tags: Dict[str, Any] = field(default_factory=dict)
    # populated on search results
    score: Optional[float] = None
    matches: List['Doc'] = field(default_factory=list)

    def to_bytes(self) -> bytes:
        payload = {'id': self.id, 'tags': self.tags}
        if self.embedding is not None:
            emb = np.ascontiguousarray(self.embedding)
            payload['emb'] = emb.tobytes()
            payload['emb_dtype'] = str(emb.dtype)
            payload['emb_shape'] = list(emb.shape)
        return msgpack.packb(payload, use_bin_type=True, default=_np_default)

    @classmethod
    def from_bytes(cls, data: bytes) -> 'Doc':
        payload = msgpack.unpackb(data, raw=False)
        emb = None
        if 'emb' in payload:
            emb = np.frombuffer(
                payload['emb'], dtype=np.dtype(payload['emb_dtype'])
            ).reshape(payload['emb_shape'])
        return cls(id=payload['id'], embedding=emb, tags=payload.get('tags', {}))

    def copy_without_embedding(self) -> 'Doc':
        return Doc(id=self.id, tags=dict(self.tags))


def docs_to_embeddings(docs: List[Doc]) -> np.ndarray:
    """Stack doc embeddings into [n, dim] float32 (errors on missing)."""
    embs = []
    for d in docs:
        if d.embedding is None:
            raise ValueError(f'doc {d.id} has no embedding')
        embs.append(np.asarray(d.embedding, dtype=np.float32).reshape(-1))
    return np.stack(embs)
