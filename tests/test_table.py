import numpy as np
import pytest
import sqlite3

from annlite_tpu.storage.table import CellTable, MetaTable


@pytest.fixture
def table():
    return CellTable('cells', columns=[('price', float), ('brand', str), ('n', int)])


def test_insert_returns_rows(table):
    rows = table.insert(
        ['a', 'b', 'c'],
        [0, 1, 0],
        [{'price': 1.0, 'brand': 'x', 'n': 1}, {'price': 2.0, 'brand': 'y', 'n': 2}, {'price': 3.0, 'brand': 'x', 'n': 3}],
    )
    assert rows == [0, 1, 2]
    rows2 = table.insert(['d'], [2], [{'price': 4.0, 'brand': 'z', 'n': 4}])
    assert rows2 == [3]
    assert table.size == 4
    assert table.n_rows == 4


def test_duplicate_id_raises(table):
    table.insert(['a'], [0], [{}])
    with pytest.raises(sqlite3.IntegrityError):
        table.insert(['a'], [0], [{}])


def test_query_offsets(table):
    table.insert(
        ['a', 'b', 'c', 'd'],
        [0, 0, 1, 1],
        [{'price': p, 'brand': b, 'n': i} for i, (p, b) in enumerate([(1, 'x'), (2, 'y'), (3, 'x'), (4, 'y')])],
    )
    assert table.query('price > ?', [2]) == [2, 3]
    assert table.query('brand = ?', ['x']) == [0, 2]
    assert table.query(cells=[1]) == [2, 3]
    assert table.query('price > ?', [1], cells=[0]) == [1]
    # pagination + order_by
    assert table.query(order_by='price', ascending=False, limit=2, offset=1) == [2, 1]


def test_delete_soft(table):
    table.insert(['a', 'b'], [0, 0], [{}, {}])
    rows = table.delete(['a'])
    assert rows == [0]
    assert table.size == 1
    assert table.query() == [1]
    assert not table.exist('a')
    assert table.exist('b')
    # double delete returns nothing
    assert table.delete(['a']) == []


def test_docid_row_roundtrip(table):
    table.insert(['a', 'b'], [0, 1], [{}, {}])
    assert table.get_docid_by_row(0) == 'a'
    assert table.get_row_by_docid('b') == 1
    assert table.get_docids_by_rows([1, 0]) == ['b', 'a']
    assert table.get_docid_by_row(99) is None


def test_columns_arrays(table):
    table.insert(
        ['a', 'b', 'c'],
        [0, 1, 0],
        [{'price': 1.5, 'brand': 'x', 'n': 7}, {'price': 2.5, 'brand': 'y', 'n': 8}, {}],
    )
    table.delete(['b'])
    cols = table.columns_arrays()
    np.testing.assert_allclose(cols['price'], [1.5, 2.5, 0.0])
    assert cols['brand'].tolist() == ['x', 'y', '']
    assert cols['_alive'].tolist() == [True, False, True]
    assert cols['_cell'].tolist() == [0, 1, 0]


def test_reserved_column_name():
    with pytest.raises(ValueError):
        CellTable('x', columns=[('_cell', int)])


def test_dump_load(table, tmp_path):
    table.insert(['a', 'b'], [0, 1], [{'price': 1.0}, {'price': 2.0}])
    table.dump(tmp_path / 'cells.db')
    t2 = CellTable('cells', columns=[('price', float), ('brand', str), ('n', int)])
    t2.load(tmp_path / 'cells.db')
    assert t2.size == 2
    assert t2.get_docid_by_row(1) == 'b'


def test_meta_table_addresses():
    m = MetaTable()
    m.bulk_add_address(['a', 'b'], [0, 1], [0, 1])
    assert m.get_address('a') == (0, 0)
    assert m.get_address('b') == (1, 1)
    m.add_address('a', 2, 5)
    assert m.get_address('a') == (2, 5)
    m.delete_address('a')
    assert m.get_address('a') is None
    assert list(m.iter_addresses()) == [('b', 1, 1)]
    latest = m.get_latest_commit()
    assert latest[0] == 'b'


def test_get_docids_by_rows_batched():
    """Batched IN-query lookup: order preserved, duplicates resolved,
    missing rows -> None, >900 keys span multiple chunks."""
    t = CellTable('m')
    n = 1100
    t.insert([f'd{i}' for i in range(n)], [0] * n, [{} for _ in range(n)])
    rows = list(range(n)) + [5, 5, n + 50]  # dups + missing
    ids = t.get_docids_by_rows(rows)
    assert ids[:n] == [f'd{i}' for i in range(n)]
    assert ids[n] == 'd5' and ids[n + 1] == 'd5'
    assert ids[n + 2] is None


def test_undelete(table):
    table.insert(['a', 'b'], [0, 0], [{}, {}])
    table.delete(['a'])
    assert table.size == 1
    rows = table.undelete(['a', 'b', 'zzz'])
    assert rows == [0]  # only the dead row restores; live/missing skipped
    assert table.size == 2
    # re-delete then reinsert under the same id: undelete must refuse while
    # a live row exists (one-alive-per-id invariant)
    table.delete(['a'])
    table.insert(['a'], [1], [{}])
    assert table.undelete(['a']) == []


def test_docids_array_cache_matches_sql():
    """The materialized row→doc-id cache (serving hot path) must agree with
    the SQL path across inserts, soft deletes, undeletes, and raw-SQL
    mutations (which drop it)."""
    t = CellTable('dc', columns=[('n', int)])
    ids = [f'd{i}' for i in range(50)]
    t.insert(ids, [0] * 50, [{'n': i} for i in range(50)])

    probe = [0, 7, 49, 50, -1, 12]
    sql_out = t.get_docids_by_rows(probe)
    arr = t.docids_array()
    assert len(arr) == 50
    cached_out = t.get_docids_by_rows(probe)  # now served from the cache
    assert cached_out == sql_out

    # insert appends to the live cache
    t.insert(['x1', 'x2'], [0, 0], [{}, {}])
    assert t._docids_cache is not None and len(t._docids_cache) == 52
    assert t.get_docids_by_rows([50, 51]) == ['x1', 'x2']

    # soft delete / undelete keep the mapping (rows keep their doc id)
    t.delete(['d7'])
    assert t._docids_cache is not None
    assert t.get_docids_by_rows([7]) == ['d7']
    t.undelete(['d7'])
    assert t.get_docids_by_rows([7]) == ['d7']

    # a raw execute (compaction-style) drops the cache; rebuild agrees
    t.execute(f'DELETE FROM {t.name}')
    t.execute(f"DELETE FROM sqlite_sequence WHERE name='{t.name}'")
    assert t._docids_cache is None
    t.insert(['z'], [0], [{}])
    assert t.get_docids_by_rows([0, 1]) == ['z', None]
    assert list(t.docids_array()) == ['z']


def test_executemany_drops_docid_cache():
    """Raw executemany mutations must invalidate the row→doc-id cache just
    like execute()/load() do (asymmetric invalidation would silently serve
    stale doc ids)."""
    t = CellTable('dcm', columns=[('n', int)])
    t.insert(['a', 'b'], [0, 0], [{'n': 1}, {'n': 2}])
    assert list(t.docids_array()) == ['a', 'b']
    t.executemany(
        f'UPDATE {t.name} SET _doc_id = ? WHERE _doc_id = ?',
        [('a2', 'a'), ('b2', 'b')],
    )
    assert t._docids_cache is None
    assert list(t.docids_array()) == ['a2', 'b2']
