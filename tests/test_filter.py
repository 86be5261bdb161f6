import numpy as np
import pytest

from annlite_tpu.filter import Filter


def test_simple_eq_sql():
    where, params = Filter({'price': {'$eq': 5}}).parse_where_clause()
    assert where == '(price = ?)'
    assert params == [5]


def test_bare_value_is_eq():
    where, params = Filter({'brand': 'nike'}).parse_where_clause()
    assert where == '(brand = ?)'
    assert params == ['nike']


def test_relational_ops_sql():
    for op, sym in [('$lt', '<'), ('$gt', '>'), ('$lte', '<='), ('$gte', '>='),
                    ('$neq', '!='), ('$ne', '!=')]:
        where, params = Filter({'x': {op: 3}}).parse_where_clause()
        assert where == f'(x {sym} ?)'
        assert params == [3]


def test_membership_sql():
    where, params = Filter({'c': {'$in': ['a', 'b']}}).parse_where_clause()
    assert where == '(c IN (?, ?))'
    assert params == ['a', 'b']
    where, params = Filter({'c': {'$nin': [1, 2, 3]}}).parse_where_clause()
    assert where == '(c NOT IN (?, ?, ?))'


def test_and_or_nested_sql():
    f = Filter(
        {
            '$and': [
                {'price': {'$lt': 100}},
                {'$or': [{'brand': {'$eq': 'a'}}, {'brand': {'$eq': 'b'}}]},
            ]
        }
    )
    where, params = f.parse_where_clause()
    assert where == '((price < ?) AND ((brand = ?) OR (brand = ?)))'
    assert params == [100, 'a', 'b']


def test_implicit_and_across_keys():
    where, params = Filter({'a': {'$gt': 1}, 'b': {'$lt': 2}}).parse_where_clause()
    assert where == '(a > ?) AND (b < ?)'
    assert params == [1, 2]


def test_unknown_operator_raises():
    with pytest.raises(ValueError):
        Filter({'x': {'$foo': 1}}).parse_where_clause()
    with pytest.raises(ValueError):
        Filter({'$not': [{'x': 1}]}).parse_where_clause()


def test_logical_requires_list():
    with pytest.raises(ValueError):
        Filter({'$and': {'x': 1}}).parse_where_clause()


def test_empty_filter():
    where, params = Filter({}).parse_where_clause()
    assert where == '' and params == []
    assert Filter().empty


# ----- columnar predicate backend -----

COLS = {
    'price': np.array([1.0, 5.0, 10.0, 50.0]),
    'brand': np.array(['a', 'b', 'a', 'c']),
}


def test_predicate_eq():
    mask = Filter({'brand': {'$eq': 'a'}})(COLS)
    assert mask.tolist() == [True, False, True, False]


def test_predicate_relational():
    mask = Filter({'price': {'$gte': 5, '$lt': 50}})(COLS)
    assert mask.tolist() == [False, True, True, False]


def test_predicate_and_or():
    f = Filter(
        {
            '$or': [
                {'price': {'$lt': 2}},
                {'$and': [{'brand': 'a'}, {'price': {'$gt': 5}}]},
            ]
        }
    )
    mask = f(COLS)
    assert mask.tolist() == [True, False, True, False]


def test_predicate_membership():
    assert Filter({'brand': {'$in': ['b', 'c']}})(COLS).tolist() == [False, True, False, True]
    assert Filter({'brand': {'$nin': ['b', 'c']}})(COLS).tolist() == [True, False, True, False]


def test_predicate_matches_sql_semantics():
    # same filter through both backends must agree (invariant-style test,
    # mirrors reference test philosophy SURVEY.md §4)
    import sqlite3

    conn = sqlite3.connect(':memory:')
    conn.execute('CREATE TABLE t (price FLOAT, brand TEXT)')
    rows = list(zip(COLS['price'].tolist(), COLS['brand'].tolist()))
    conn.executemany('INSERT INTO t VALUES (?, ?)', rows)
    f = Filter({'$or': [{'price': {'$lte': 5}}, {'brand': {'$neq': 'a'}}]})
    where, params = f.parse_where_clause()
    got_sql = {
        r[0]
        for r in conn.execute(f'SELECT rowid - 1 FROM t WHERE {where}', params)
    }
    got_pred = set(np.nonzero(f(COLS))[0].tolist())
    assert got_sql == got_pred


def test_unknown_column_predicate_raises():
    with pytest.raises(ValueError):
        Filter({'nope': 1})(COLS)
