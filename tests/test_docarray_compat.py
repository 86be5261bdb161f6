"""DocumentArray storage-backend contract (mirrors the reference's
`tests/docarray/` suite: test_add, test_del, test_get, test_find,
test_save_load)."""
import sqlite3

import numpy as np
import pytest

from annlite_tpu.doc import Doc
from annlite_tpu.docarray_compat import DocumentArray


def _mk(tmp_path, n_dim=3, **cfg):
    cfg = {'n_dim': n_dim, 'data_path': str(tmp_path / 'da'), **cfg}
    return DocumentArray(storage='annlite_tpu', config=cfg)


def _docs(n, n_dim=3):
    return [Doc(id=f'r{i}', embedding=np.ones(n_dim, np.float32) * i)
            for i in range(n)]


def test_add(tmp_path):
    da = _mk(tmp_path, n_dim=4)
    da.extend(_docs(6, 4))
    assert len(da) == len(da[:, 'embedding']) == 6


def test_add_conflict_id(tmp_path):
    da = _mk(tmp_path, n_dim=4)
    da.extend(_docs(6, 4))
    with pytest.raises(sqlite3.IntegrityError):
        da.extend(_docs(3, 4))  # same ids again
    assert len(da._load_ids()) == 6  # no partial extension of alive rows


@pytest.mark.parametrize('deleted', [[0, 1], ['r0', 'r1']])
def test_delete_success(tmp_path, deleted):
    da = _mk(tmp_path)
    with da:
        da.extend(_docs(8))
    with da:
        del da[deleted]
    assert len(da._offset2ids.ids) == 6
    assert len(da[:, 'embedding']) == 6
    for doc_id in ['r2', 'r3', 'r4', 'r5', 'r6', 'r7']:
        assert da[doc_id].id == doc_id


def test_delete_not_found(tmp_path):
    da = _mk(tmp_path)
    with da:
        da.extend(_docs(2))
    with pytest.raises(ValueError):
        del da['r5']


@pytest.mark.parametrize('nrof_docs', [10, 1000, 10_000])
def test_get_bulk_data(tmp_path, nrof_docs):
    da = _mk(tmp_path)
    with da:
        da.extend(_docs(nrof_docs))
    assert len(da[:, 'id']) == nrof_docs


def test_get_bulk_id_not_exist(tmp_path):
    da = _mk(tmp_path)
    with da:
        da.extend(_docs(10))
    with pytest.raises(KeyError):
        da[['r1', 'r11', 'r21'], 'id']


def test_getitem_shapes(tmp_path):
    da = _mk(tmp_path)
    da.extend(_docs(10))
    assert da[0].id == 'r0'
    assert da[-1].id == 'r9'
    assert [d.id for d in da[2:4]] == ['r2', 'r3']
    assert da['r7'].id == 'r7'
    np.testing.assert_allclose(da['r7', 'embedding'], np.ones(3) * 7)
    assert [d.id for d in da] [:3] == ['r0', 'r1', 'r2']


def test_find(tmp_path):
    da = _mk(tmp_path, metric='euclidean')  # i*ones are collinear → cosine ties
    with da:
        da.extend(_docs(1000))
    matches = da.find(np.array([2, 1, 3], np.float32), limit=10,
                      num_candidates=100)
    assert len(matches) == 10
    scores = [m.score for m in matches]
    assert scores == sorted(scores)
    # nearest row to [2,1,3] under L2-ish metrics is r2
    assert matches[0].id == 'r2'


def test_save_load(tmp_path):
    N = 100
    rng = np.random.default_rng(0)
    da = _mk(tmp_path, n_dim=8)
    for i in range(N):
        da.append(Doc(id=str(i), embedding=rng.random(8, np.float32)))
    da._annlite.close()

    da2 = _mk(tmp_path, n_dim=8)
    assert len(da2) == N
    # a reopen without a snapshot rebuilds from the doc store, so offsets
    # follow store order; the id SET must round-trip exactly
    assert set(da2._offset2ids.ids) == {str(i) for i in range(N)}
    for i in range(N, N + N):
        da2.append(Doc(id=str(i), embedding=rng.random(8, np.float32)))
    assert len(da2) == N + N
    da2.close()


def test_save_load_with_snapshot_keeps_offsets(tmp_path):
    """With a snapshot (`dump()`), reopen restores the cell table verbatim,
    so offset order survives exactly (the store-rebuild path above only
    guarantees the id set)."""
    N = 50
    rng = np.random.default_rng(1)
    da = _mk(tmp_path, n_dim=8)
    for i in range(N):
        da.append(Doc(id=str(i), embedding=rng.random(8, np.float32)))
    da._annlite.dump()
    da._annlite.close()

    da2 = _mk(tmp_path, n_dim=8)
    assert da2._offset2ids.ids == [str(i) for i in range(N)]
    assert da2[0].id == '0' and da2[-1].id == str(N - 1)
    da2.close()


def test_delete_partial_batch_resyncs_offsets(tmp_path):
    """A batch delete containing a missing id raises, but earlier ids in
    the batch may already be gone — the offset map must resync with the
    table instead of keeping the pre-delete snapshot."""
    da = _mk(tmp_path)
    with da:
        da.extend(_docs(6))
    with pytest.raises(ValueError):
        del da[['r0', 'r1', 'nope']]
    # offset map matches the table exactly (whatever the table now holds)
    assert da._offset2ids.ids == da._load_ids()
    assert len(da) == len(da[:, 'embedding'])


def test_find_num_candidates_widens_then_truncates(tmp_path):
    da = _mk(tmp_path, n_dim=4, metric='euclidean')
    da.extend(_docs(30, 4))
    seen = {}
    orig = da._annlite.search

    def spy(docs, filter=None, limit=10, **kw):
        seen['limit'] = limit
        return orig(docs, filter=filter, limit=limit, **kw)

    da._annlite.search = spy
    out = da.find(np.ones(4, np.float32) * 3, limit=5, num_candidates=20)
    assert seen['limit'] == 20       # widened internal pool
    assert len(out) == 5             # truncated back to limit
    assert out[0].id == 'r3'
