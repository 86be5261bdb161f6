"""Integration tests on the AnnLite facade (mirrors reference
`tests/test_index.py` invariants: sorted distances, filter consistency,
CRUD, dump/reload parity — SURVEY.md §4)."""
import numpy as np
import pytest

from annlite_tpu import AnnLite
from annlite_tpu.doc import Doc

D = 32
N = 300


@pytest.fixture
def docs(rng):
    x = rng.standard_normal((N, D)).astype(np.float32)
    return [
        Doc(
            id=f'doc{i}',
            embedding=x[i],
            tags={'price': float(i % 50), 'brand': f'b{i % 3}', 'idx': i},
        )
        for i in range(N)
    ]


@pytest.fixture
def ann(tmp_index_path, docs):
    a = AnnLite(
        n_dim=D,
        metric='cosine',
        columns=[('price', float), ('brand', str), ('idx', int)],
        data_path=tmp_index_path,
    )
    a.index(docs)
    return a


def test_search_sorted_and_self_match(ann, docs):
    res = ann.search([Doc(id='q0', embedding=docs[5].embedding)], limit=10)
    matches = res[0].matches
    assert len(matches) == 10
    scores = [m.score for m in matches]
    assert scores == sorted(scores)
    assert matches[0].id == 'doc5'
    assert matches[0].score < 1e-5


@pytest.mark.parametrize(
    'flt,pred',
    [
        ({'price': {'$lt': 10}}, lambda t: t['price'] < 10),
        ({'price': {'$gte': 10, '$lte': 20}}, lambda t: 10 <= t['price'] <= 20),
        ({'brand': {'$eq': 'b1'}}, lambda t: t['brand'] == 'b1'),
        ({'brand': {'$in': ['b0', 'b2']}}, lambda t: t['brand'] in ('b0', 'b2')),
        (
            {'$or': [{'price': {'$gt': 45}}, {'brand': 'b2'}]},
            lambda t: t['price'] > 45 or t['brand'] == 'b2',
        ),
    ],
)
def test_filtered_search_consistency(ann, docs, rng, flt, pred):
    q = rng.standard_normal((2, D)).astype(np.float32)
    results = ann.search_by_vectors(q, filter=flt, limit=15, include_metadata=True)
    by_id = {d.id: d for d in docs}
    for matches in results:
        assert len(matches) > 0
        for m in matches:
            assert pred(by_id[m.id].tags), f'{m.id} violates filter {flt}'


def test_filter_endpoint_pagination(ann):
    out = ann.filter(filter={'price': {'$lt': 5}}, limit=100)
    assert all(d.tags['price'] < 5 for d in out)
    ordered = ann.filter(limit=5, order_by='idx', ascending=False)
    idxs = [d.tags['idx'] for d in ordered]
    assert idxs == sorted(idxs, reverse=True)
    page2 = ann.filter(limit=5, offset=5, order_by='idx', ascending=False)
    assert [d.tags['idx'] for d in page2] == [i - 5 for i in idxs]


def test_delete_removes_from_search(ann, docs):
    ann.delete(['doc5'])
    res = ann.search([Doc(id='q', embedding=docs[5].embedding)], limit=5)
    assert all(m.id != 'doc5' for m in res[0].matches)
    assert ann.index_size == N - 1
    assert ann.total_docs == N - 1
    with pytest.raises(ValueError):
        ann.delete(['doc5'], raise_errors_on_not_found=True)


def test_update_moves_doc(ann, docs, rng):
    new_emb = docs[7].embedding * -1.0
    ann.update([Doc(id='doc3', embedding=new_emb, tags={'price': 999.0, 'brand': 'new', 'idx': 3})])
    assert ann.index_size == N  # still N alive docs
    res = ann.search([Doc(id='q', embedding=new_emb)], limit=3)
    assert res[0].matches[0].id == 'doc3'
    got = ann.get_doc_by_id('doc3')
    assert got.tags['price'] == 999.0
    # filter sees the new tags
    out = ann.filter(filter={'price': {'$eq': 999.0}})
    assert [d.id for d in out] == ['doc3']


def test_update_insert_if_not_found(ann, rng):
    emb = rng.standard_normal(D).astype(np.float32)
    ann.update([Doc(id='newdoc', embedding=emb, tags={'price': 1.0, 'brand': 'x', 'idx': 0})])
    assert ann.get_doc_by_id('newdoc') is not None
    with pytest.raises(ValueError):
        ann.update(
            [Doc(id='ghost', embedding=emb)],
            insert_if_not_found=False,
            raise_errors_on_not_found=True,
        )


def test_get_doc_and_stat(ann):
    d = ann.get_doc_by_id('doc10')
    assert d.id == 'doc10' and d.embedding is not None
    s = ann.stat
    assert s['total_docs'] == N and s['index_size'] == N
    assert s['is_trained'] is True
    assert len(ann) == N


def test_search_numpy_matches_exact(ann, docs, rng):
    from annlite_tpu.enums import Metric
    from annlite_tpu.math import cdist

    q = rng.standard_normal((3, D)).astype(np.float32)
    dists, ids = ann.search_numpy(q, limit=5)
    x = np.stack([d.embedding for d in docs])
    exact = np.asarray(cdist(q, x, Metric.COSINE))
    for qi in range(3):
        want = np.argsort(exact[qi])[:5]
        got = [int(i[3:]) for i in ids[qi]]
        assert got == want.tolist()
        np.testing.assert_allclose(dists[qi], np.sort(exact[qi])[:5], atol=1e-4)


def test_dump_reload_identical_top10(tmp_index_path, docs):
    """Reference `tests/test_dump.py:24-40`: dump → reopen → identical
    top-10."""
    a = AnnLite(n_dim=D, columns=[('price', float), ('brand', str), ('idx', int)], data_path=tmp_index_path)
    a.index(docs)
    q = docs[0].embedding[None, :]
    _, ids_before = a.search_numpy(q, limit=10)
    a.dump()
    a.close()

    b = AnnLite(n_dim=D, columns=[('price', float), ('brand', str), ('idx', int)], data_path=tmp_index_path)
    assert b.index_size == N
    _, ids_after = b.search_numpy(q, limit=10)
    assert ids_before == ids_after
    b.close()


def test_rebuild_without_snapshot(tmp_index_path, docs):
    """No snapshot → rebuild from the durable doc store
    (reference `index.py:779-794`)."""
    a = AnnLite(n_dim=D, data_path=tmp_index_path)
    a.index(docs)
    q = docs[1].embedding[None, :]
    _, ids_before = a.search_numpy(q, limit=5)
    a.close()  # no dump()

    b = AnnLite(n_dim=D, data_path=tmp_index_path)
    assert b.index_size == N
    _, ids_after = b.search_numpy(q, limit=5)
    assert ids_before == ids_after
    b.close()


def test_backup_restore_doc_count_parity(tmp_index_path, tmp_path, docs):
    """Reference `tests/test_index.py:284-299`."""
    a = AnnLite(n_dim=D, data_path=tmp_index_path)
    a.index(docs)
    a.backup('snap1')
    a.close()

    b = AnnLite(n_dim=D, data_path=tmp_index_path)
    b.clear()
    assert b.total_docs == 0
    b.restore('snap1')
    assert b.total_docs == N
    assert b.index_size == N
    b.close()


def test_read_only_blocks_writes(tmp_index_path, docs):
    a = AnnLite(n_dim=D, data_path=tmp_index_path, read_only=True)
    with pytest.raises(RuntimeError):
        a.index(docs[:1])


def test_wrong_dim_raises(ann, rng):
    with pytest.raises(AssertionError):
        ann.search_numpy(rng.standard_normal((1, D + 1)).astype(np.float32))


def test_clear(ann):
    ann.clear()
    assert ann.total_docs == 0
    assert ann.index_size == 0


def test_compact_reclaims_dead_rows(tmp_index_path, docs):
    a = AnnLite(n_dim=D, columns=[('price', float), ('brand', str), ('idx', int)],
                data_path=tmp_index_path)
    a.index(docs)
    for i in range(0, 100):
        a.delete([f'doc{i}'])
    # dead rows linger in the buffers until compaction
    assert a._container.cell_table.n_rows == N
    assert a.index_size == N - 100
    q = docs[150].embedding[None, :]
    _, ids_before = a.search_numpy(q, limit=5)
    a.compact()
    assert a._container.cell_table.n_rows == N - 100  # holes reclaimed
    assert a.index_size == N - 100
    assert a.total_docs == N - 100
    _, ids_after = a.search_numpy(q, limit=5)
    assert ids_before == ids_after
    # still writable after compaction
    a.index([Doc(id='fresh', embedding=docs[0].embedding, tags={'idx': -1})])
    assert a.index_size == N - 99
    a.close()


def test_bulk_crud_20k(tmp_index_path, rng):
    """Bulk contract at scale (reference exercises 20k-doc bulk adds via the
    DocArray backend, `tests/docarray/`): 20k insert, duplicate-id
    IntegrityError, bulk update, bulk delete, filtered search — all through
    the facade."""
    import sqlite3

    D, N = 32, 20_000
    x = rng.standard_normal((N, D)).astype(np.float32)
    ann = AnnLite(n_dim=D, metric='cosine', columns=[('bucket', int)],
                  data_path=tmp_index_path + '/bulk')
    docs = [
        Doc(id=f'd{i}', embedding=x[i], tags={'bucket': i % 10})
        for i in range(N)
    ]
    for s in range(0, N, 5000):
        ann.index(docs[s:s + 5000])
    st = ann.stat
    assert int(st['total_docs']) == N

    # conflict ids raise (same contract as the reference's sqlite UNIQUE)
    with pytest.raises(sqlite3.IntegrityError):
        ann.index([Doc(id='d7', embedding=x[7])])

    # self-match across the whole range
    probe = rng.integers(0, N, 20)
    _, ids = ann.search_numpy(x[probe], limit=3)
    assert sum(ids[i][0] == f'd{probe[i]}' for i in range(20)) >= 19

    # bulk update: move 1k docs to new embeddings; they must follow
    upd = rng.integers(0, N, 1000)
    x2 = rng.standard_normal((1000, D)).astype(np.float32)
    ann.update([
        Doc(id=f'd{j}', embedding=x2[i], tags={'bucket': j % 10})
        for i, j in enumerate(upd[:1000])
    ])
    _, ids = ann.search_numpy(x2[:10], limit=1)
    assert sum(ids[i][0] == f'd{upd[i]}' for i in range(10)) >= 9

    # bulk delete 2k; none may surface again
    dead = [f'd{i}' for i in range(0, N, 10)]
    ann.delete(dead)
    assert int(ann.stat['total_docs']) == N - len(dead)
    _, ids = ann.search_numpy(x[0:1], limit=10)
    assert 'd0' not in ids[0]

    # filtered search at scale honors the predicate
    r = ann.search_by_vectors(x[:4], filter={'bucket': {'$eq': 3}}, limit=5,
                              include_metadata=True)
    assert all(m.tags['bucket'] == 3 for row in r for m in row)
    ann.close()


def test_snapshot_name_keyed_by_data_state(tmp_index_path, rng):
    """Snapshot dirs are named from the latest table commit + doc-store
    transaction id (reference `annlite/index.py:601-616`): dumping twice
    with no writes in between reuses the SAME name; a write changes it."""
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    x = rng.standard_normal((30, 8)).astype(np.float32)
    ann = AnnLite(n_dim=8, metric='euclidean', data_path=tmp_index_path + '/s')
    ann.index([Doc(id=f'd{i}', embedding=x[i]) for i in range(20)])
    s1 = ann.dump_index()
    s2 = ann.dump_index()
    assert s1.name == s2.name, 'same data state must map to the same snapshot'
    ann.index([Doc(id=f'e{i}', embedding=x[20 + i]) for i in range(5)])
    s3 = ann.dump_index()
    assert s3.name != s1.name
    # latest-snapshot resolution restores the newest state
    ann.close()
    ann2 = AnnLite(n_dim=8, metric='euclidean', data_path=tmp_index_path + '/s')
    assert ann2.total_docs == 25
    ann2.close()


def test_device_searcher_masks_deleted(tmp_index_path, rng):
    """The device serving path must not surface deleted docs: the facade
    fuses the container's alive bitmap into the flat index's captured mask
    (graph indexes track deletes internally via delete_rows)."""
    from annlite_tpu.doc import Doc

    x = rng.standard_normal((500, D)).astype(np.float32)
    ann = AnnLite(n_dim=D, metric='euclidean', data_path=tmp_index_path)
    ann.index([Doc(id=f'd{i}', embedding=x[i]) for i in range(len(x))])
    s = ann.serving_searcher(limit=5)
    _, ids = s(x[:3])
    assert [ids[i][0] for i in range(3)] == ['d0', 'd1', 'd2']
    ann.delete(['d1'])
    s = ann.serving_searcher(limit=5)   # rebuild captures the new mask
    _, ids = s(x[1:2])
    assert 'd1' not in ids[0]
    # a user-supplied mask is ANDed with alive, not replaced
    import jax.numpy as jnp

    run = ann.device_searcher(limit=5, mask=np.ones(len(x), dtype=bool))
    _, rows = run(jnp.asarray(x[1:2]))
    assert 1 not in np.asarray(rows)[0]
    ann.close()


@pytest.mark.parametrize('index_type', ['flat', 'graph'])
def test_update_inplace_no_dead_rows(tmp_path, index_type):
    """AnnLite.update keeps rows IN PLACE for indexes that support it
    (reference updatePoint semantics): the table does not grow, the new
    embedding + tags serve immediately, filtered search sees new tags."""
    rng = np.random.default_rng(2)
    d, n = 16, 400
    x = rng.standard_normal((n, d)).astype(np.float32)
    ann = AnnLite(n_dim=d, metric='euclidean', index_type=index_type,
                  data_path=str(tmp_path / 'u'), columns=[('grp', int)])
    ann.index([Doc(id=f'd{i}', embedding=x[i], tags={'grp': 0})
               for i in range(n)])
    tbl = ann._container.cell_table
    rows_before = tbl.query_all(f'SELECT COUNT(*) FROM {tbl.name}')[0][0]

    # move 5 docs to a far location with a new tag
    newv = (x[100:105] + 50.0).astype(np.float32)
    ann.update([Doc(id=f'd{i + 100}', embedding=newv[i], tags={'grp': 7})
                for i in range(5)])

    rows_after = tbl.query_all(f'SELECT COUNT(*) FROM {tbl.name}')[0][0]
    assert rows_after == rows_before          # no dead-mark + append growth
    assert ann.total_docs == n

    _, ids = ann.search_numpy(newv, limit=3)
    assert [r[0] for r in ids] == [f'd{i + 100}' for i in range(5)]
    _, fids = ann.search_numpy(newv[:1], limit=5,
                               filter={'grp': {'$eq': 7}})
    assert set(fids[0]) <= {f'd{i + 100}' for i in range(5)}
    got = ann.get_doc_by_id('d100')
    assert got.tags['grp'] == 7
    np.testing.assert_allclose(got.embedding, newv[0], rtol=1e-6)
    ann.close()


def test_update_cell_move_falls_back_to_append(tmp_path):
    """When a doc's embedding moves to a different VQ cell, update must
    dead-mark + append (the reference's move semantics,
    `annlite/container.py:323-386`) — the in-place fast path only covers
    same-cell updates."""
    rng = np.random.default_rng(6)
    d = 16
    a = rng.standard_normal((200, d)).astype(np.float32) + 10
    b = rng.standard_normal((200, d)).astype(np.float32) - 10
    x = np.concatenate([a, b])
    ann = AnnLite(n_dim=d, metric='euclidean', n_cells=2, index_type='flat',
                  data_path=str(tmp_path / 'c'))
    ann.train(x)
    ann.index([Doc(id=f'd{i}', embedding=x[i]) for i in range(400)])
    tbl = ann._container.cell_table
    rows_before = tbl.query_all(f'SELECT COUNT(*) FROM {tbl.name}')[0][0]
    old_cell = int(ann._container._cells[tbl.get_row_by_docid('d0')])

    # move d0 (cluster A) to cluster B -> different VQ cell
    newv = (b[0] + 0.01).astype(np.float32)
    ann.update([Doc(id='d0', embedding=newv)])
    new_row = tbl.get_row_by_docid('d0')
    new_cell = int(ann._container._cells[new_row])
    assert new_cell != old_cell
    rows_after = tbl.query_all(f'SELECT COUNT(*) FROM {tbl.name}')[0][0]
    assert rows_after == rows_before + 1   # dead row + appended row

    _, ids = ann.search_numpy(newv[None], limit=3)
    assert ids[0][0] == 'd0'
    # same-cell update stays in place (no further growth)
    ann.update([Doc(id='d0', embedding=(newv + 0.001).astype(np.float32))])
    assert tbl.query_all(f'SELECT COUNT(*) FROM {tbl.name}')[0][0] == rows_after
    ann.close()


def test_create_if_missing_false(tmp_path):
    """Reference ctor parity (`annlite/index.py:73,106-109`):
    create_if_missing=False on a fresh path must refuse instead of
    silently creating the workspace."""
    with pytest.raises(FileNotFoundError):
        AnnLite(n_dim=8, data_path=str(tmp_path / 'nope'),
                create_if_missing=False)
    # existing path opens fine
    (tmp_path / 'yes').mkdir()
    ann = AnnLite(n_dim=8, data_path=str(tmp_path / 'yes'),
                  create_if_missing=False)
    ann.close()
