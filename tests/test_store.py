import numpy as np
import pytest

from annlite_tpu.doc import Doc
from annlite_tpu.storage.kv import DocStorage


@pytest.fixture
def store(tmp_path):
    return DocStorage(tmp_path / 'docs')


def _docs(n, dim=8):
    rng = np.random.default_rng(0)
    return [
        Doc(id=f'doc{i}', embedding=rng.standard_normal(dim).astype(np.float32), tags={'i': i})
        for i in range(n)
    ]


def test_crud(store):
    docs = _docs(5)
    store.insert(docs)
    assert store.size == 5
    got = store.get(['doc0', 'doc3'])
    assert [d.id for d in got] == ['doc0', 'doc3']
    np.testing.assert_allclose(got[0].embedding, docs[0].embedding)
    assert got[0].tags == {'i': 0}

    d = docs[1]
    d.tags['updated'] = True
    store.update([d])
    assert store.get('doc1')[0].tags['updated'] is True

    store.delete(['doc0'])
    assert store.size == 4
    assert store.get('doc0') == []
    assert 'doc1' in store and 'doc0' not in store


def test_transaction_id_monotone(store):
    assert store.last_transaction_id == 0
    store.insert(_docs(3))
    t1 = store.last_transaction_id
    store.delete(['doc0'])
    assert store.last_transaction_id > t1


def test_batched_iterator(store):
    store.insert(_docs(25))
    batches = list(store.batched_iterator(batch_size=10))
    assert [len(b) for b in batches] == [10, 10, 5]
    ids = [d.id for b in batches for d in b]
    assert len(set(ids)) == 25


def test_clear(store):
    store.insert(_docs(3))
    store.clear()
    assert store.size == 0
    assert store.last_transaction_id == 0


def test_persistence_across_reopen(tmp_path):
    s1 = DocStorage(tmp_path / 'docs')
    s1.insert(_docs(4))
    s1.close()
    s2 = DocStorage(tmp_path / 'docs')
    assert s2.size == 4
    assert s2.get('doc2')[0].tags == {'i': 2}


def test_doc_serde_roundtrip():
    d = Doc(id='x', embedding=np.arange(6, dtype=np.float32), tags={'a': 1, 'b': 'txt', 'c': 2.5})
    d2 = Doc.from_bytes(d.to_bytes())
    assert d2.id == 'x'
    np.testing.assert_array_equal(d2.embedding, d.embedding)
    assert d2.tags == d.tags
    # no embedding
    d3 = Doc.from_bytes(Doc(id='y').to_bytes())
    assert d3.embedding is None
