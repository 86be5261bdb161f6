"""Block-gathered IVF scan tests (CPU reference path + store semantics)."""
import numpy as np
import pytest

from annlite_tpu.ops.adc import BIG, adc_scores_ref
from annlite_tpu.ops.ivf import BlockedCodes, ivf_scan_topk


@pytest.fixture
def store(rng):
    m, bs = 8, 128
    bc = BlockedCodes(n_subvectors=m, block_size=bs)
    n = 1000
    codes = rng.integers(0, 16, (n, m)).astype(np.uint8)
    cells = rng.integers(0, 4, n)
    rows = np.arange(n)
    bc.append(codes, cells, rows)
    return bc, codes, cells


def test_blocked_layout(store):
    bc, codes, cells = store
    # every alive slot maps back to its original code
    for b in range(bc.n_blocks):
        for s in range(bc.bs):
            row = bc.row_map[b, s]
            if row >= 0:
                np.testing.assert_array_equal(bc.codes[b, :, s], codes[row])
                assert cells[row] == bc.block_cell[b]
    # alive count matches
    assert int(bc.mask.sum()) == 1000


def test_select_blocks(store):
    bc, codes, cells = store
    sel = bc.select_blocks([1, 3])
    assert set(bc.block_cell[sel]) == {1, 3}
    # all rows of cells 1,3 live in selected blocks
    rows_in_sel = bc.row_map[sel][bc.mask[sel] > 0]
    want = set(np.nonzero(np.isin(cells, [1, 3]))[0].tolist())
    assert set(rows_in_sel.tolist()) == want


def test_ivf_scan_matches_dense(store, rng):
    bc, codes, cells = store
    q, m, k = 3, 8, 16
    dtable = rng.uniform(0, 10, (q, m, k)).astype(np.float32)
    probed = [0, 2]
    sel = bc.select_blocks(probed)
    cb, mb, rm = bc.device_arrays()
    d, rows = ivf_scan_topk(
        np.asarray(sel), dtable, cb, mb, rm, 10, use_pallas=False, exact=True
    )
    d, rows = np.asarray(d), np.asarray(rows)
    # dense reference restricted to probed cells
    dense = np.array(adc_scores_ref(dtable, codes.T))
    dense[:, ~np.isin(cells, probed)] = BIG
    want_d = np.sort(dense, axis=1)[:, :10]
    np.testing.assert_allclose(d, want_d, atol=1e-4)
    for qi in range(q):
        np.testing.assert_allclose(np.sort(dense[qi][rows[qi]]), want_d[qi], atol=1e-4)
    assert np.isin(cells[rows], probed).all()


def test_ivf_scan_with_filter_and_delete(store, rng):
    bc, codes, cells = store
    q, m, k = 2, 8, 16
    dtable = rng.uniform(0, 10, (q, m, k)).astype(np.float32)
    bc.delete_rows([0, 1, 2])
    flt = rng.random(1000) < 0.5
    mask_blocks = bc.set_filter_mask(flt)
    sel = bc.select_blocks([0, 1, 2, 3])
    cb, _, rm = bc.device_arrays()
    d, rows = ivf_scan_topk(
        np.asarray(sel), dtable, cb, np.asarray(mask_blocks), rm, 20,
        use_pallas=False, exact=True,
    )
    rows = np.asarray(rows)
    valid = np.asarray(d) < BIG / 2
    assert valid.any()
    assert flt[rows[valid]].all()
    assert not np.isin(rows[valid], [0, 1, 2]).any()


def test_padded_block_ids(store, rng):
    bc, codes, cells = store
    dtable = rng.uniform(0, 10, (1, 8, 16)).astype(np.float32)
    sel = np.concatenate([bc.select_blocks([1]), np.full(3, -1, np.int32)])
    cb, mb, rm = bc.device_arrays()
    d, rows = ivf_scan_topk(sel, dtable, cb, mb, rm, 5, use_pallas=False, exact=True)
    valid = np.asarray(d)[0] < BIG / 2
    assert np.isin(cells[np.asarray(rows)[0][valid]], [1]).all()


def test_ivf_pq_index_via_facade(tmp_index_path, rng):
    """n_cells>1 + PQ auto-selects IVFPQIndex; results restricted to probed
    cells remain correct and filtered."""
    import shutil
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc
    from annlite_tpu.index.ivf_pq import IVFPQIndex

    D, N = 32, 2000
    centers = rng.standard_normal((8, D)).astype(np.float32) * 4
    x = (centers[rng.integers(0, 8, N)] + rng.standard_normal((N, D))).astype(np.float32)
    ann = AnnLite(
        n_dim=D, metric='euclidean', n_cells=8, n_probe=8, n_subvectors=8,
        columns=[('i', int)], data_path=tmp_index_path, exact_topk=True,
        rerank=50,
    )
    ann.train(x)
    assert isinstance(ann._container.index, IVFPQIndex)
    ann.index([Doc(id=f'doc{i}', embedding=x[i], tags={'i': i}) for i in range(N)])

    # full probe == exact-over-PQ with rerank: self-match expected
    _, ids = ann.search_numpy(x[:10], limit=10)
    assert all(ids[i][0] == f'doc{i}' for i in range(10))

    # low n_probe still finds the self-match (it lives in the top cell)
    ann.n_probe = 1
    _, ids = ann.search_numpy(x[:10], limit=10)
    hits = sum(ids[i][0] == f'doc{i}' for i in range(10))
    assert hits >= 8, f'only {hits}/10 self-matches at n_probe=1'

    # filtered search consistency
    ann.n_probe = 8
    res = ann.search_by_vectors(x[:3], filter={'i': {'$lt': 100}}, limit=5,
                                include_metadata=True)
    for matches in res:
        assert len(matches) > 0
        assert all(m.tags['i'] < 100 for m in matches)

    # delete + update flow through the blocked store
    ann.delete(['doc0'])
    _, ids = ann.search_numpy(x[:1], limit=5)
    assert 'doc0' not in ids[0]
    ann.update([Doc(id='doc1', embedding=-x[5], tags={'i': 1})])
    _, ids = ann.search_numpy(-x[5:6], limit=3)
    assert ids[0][0] == 'doc1'

    # snapshot round-trip
    ann.dump()
    ann.close()
    b = AnnLite(
        n_dim=D, metric='euclidean', n_cells=8, n_probe=8, n_subvectors=8,
        columns=[('i', int)], data_path=tmp_index_path, exact_topk=True,
        rerank=50,
    )
    assert b.index_size == N - 1
    _, ids = b.search_numpy(-x[5:6], limit=3)
    assert ids[0][0] == 'doc1'
    b.close()


def test_ivf_deep_select_matches_standard(rng):
    """The in-kernel deep-select path (n_sel >= 16, TPU) must return the
    same top-k rows as the standard scan+reduce path.  On CPU this
    exercises only the standard path (deep requires the Pallas kernel)."""
    import jax
    import jax.numpy as jnp

    m, bs, k = 8, 128 * 8, 50
    bc = BlockedCodes(n_subvectors=m, block_size=bs)
    n = 40_000
    codes = rng.integers(0, 16, (n, m)).astype(np.uint8)
    cells = rng.integers(0, 32, n)
    bc.append(codes, cells, np.arange(n))
    sel = bc.select_blocks(np.arange(20))  # >= 16 blocks -> deep on TPU
    q = 6
    dtable = rng.uniform(0, 10, (q, m, 16)).astype(np.float32)
    cb, mb, rm = (jnp.asarray(bc.codes), jnp.asarray(bc.mask),
                  jnp.asarray(bc.row_map))
    d_auto, r_auto = ivf_scan_topk(
        jnp.asarray(sel), jnp.asarray(dtable), cb, mb, rm, k)
    d_ref, r_ref = ivf_scan_topk(
        jnp.asarray(sel), jnp.asarray(dtable), cb, mb, rm, k,
        use_pallas=False, exact=True)
    d_auto, r_auto = np.asarray(d_auto), np.asarray(r_auto)
    d_ref, r_ref = np.asarray(d_ref), np.asarray(r_ref)
    np.testing.assert_allclose(d_auto, d_ref, rtol=1e-2, atol=1e-2)
    for i in range(q):
        # row sets agree wherever scores are strictly below the tie tail
        cut = np.searchsorted(d_ref[i], d_ref[i][-1] - 1e-3)
        assert set(r_auto[i][:cut]) <= set(r_ref[i].tolist())


def test_facade_n_probe_clamps_down(tmp_index_path, rng):
    """Regression (VERDICT r1 #4): the reference clamps n_probe UP to
    n_cells (`annlite/index.py:94`), which disables IVF pruning through the
    facade.  We clamp DOWN: n_probe=4 of 16 cells must really probe 4 cells
    per query (and still find the self-match on clustered data)."""
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    D, N = 32, 2000
    centers = rng.standard_normal((16, D)).astype(np.float32) * 4
    x = (centers[rng.integers(0, 16, N)]
         + 0.2 * rng.standard_normal((N, D))).astype(np.float32)
    ann = AnnLite(
        n_dim=D, metric='euclidean', n_cells=16, n_probe=4, n_subvectors=8,
        data_path=tmp_index_path, exact_topk=True, rerank=50,
    )
    ann.train(x)
    assert ann.n_probe == 4  # NOT clamped up to 16
    ann.index([Doc(id=f'doc{i}', embedding=x[i]) for i in range(N)])

    # per-query cell selection yields exactly n_probe cells
    sel = ann._cell_selection(x[:7])
    assert sel.shape == (7, 4)

    # pruned probing actually reaches the blocked store: fewer blocks than
    # a full scan (16 well-separated cells, union of 10 queries' 4 probes)
    store = ann._container.index._store
    probed = store.select_blocks(np.unique(sel))
    assert 0 < len(probed) < store.n_blocks

    _, ids = ann.search_numpy(x[:10], limit=10)
    hits = sum(ids[i][0] == f'doc{i}' for i in range(10))
    assert hits >= 9, f'only {hits}/10 self-matches at n_probe=4'
    ann.close()


def test_slot_mask_device_matches_host(store, rng):
    """Device-side predicate AND (upload only the [N] predicate, gather via
    resident row_map) must equal the host set_filter_mask rebuild."""
    import jax.numpy as jnp

    from annlite_tpu.ops.ivf import slot_mask_device

    bc, codes, cells = store
    n = codes.shape[0]
    flt = rng.random(n) < 0.3
    want = bc.set_filter_mask(flt)
    cb, mb, rm = bc.device_arrays()
    got = np.asarray(slot_mask_device(mb, rm, jnp.asarray(flt.astype(np.int8))))
    np.testing.assert_array_equal(got, want)


def test_delete_updates_device_mask_incrementally(store):
    """delete_rows after device placement scatters ONLY the mask — the
    cached device codes/row_map objects must be reused (no O(N) re-upload)."""
    bc, codes, cells = store
    cb0, mb0, rm0 = bc.device_arrays()
    victim_rows = [int(r) for r in bc.row_map[bc.mask > 0][:5]]
    bc.delete_rows(victim_rows)
    cb1, mb1, rm1 = bc.device_arrays()
    assert cb1 is cb0 and rm1 is rm0, 'delete re-uploaded untouched arrays'
    assert not bc._dirty
    # deleted slots are masked out on device and host alike
    np.testing.assert_array_equal(np.asarray(mb1), bc.mask)
    # a later append still takes the full re-sync path
    bc.append(codes[:3], cells[:3], np.arange(10_000, 10_003))
    assert bc._dirty


def test_soft_assignment_store_and_dedup(rng):
    """Soft assignment (VERDICT r4 #3): a row stored in two cells is found
    when EITHER cell is probed, appears once in results, and delete removes
    every copy."""
    from annlite_tpu.codecs import PQCodec
    from annlite_tpu.index.ivf_pq import IVFPQIndex

    D, N, M = 16, 600, 8
    x = rng.standard_normal((N, D)).astype(np.float32)
    pq = PQCodec(dim=D, n_subvectors=M, n_clusters=16, n_init=1,
                 metric='euclidean')
    pq.fit(x, iter=8)
    idx = IVFPQIndex(dim=D, pq_codec=pq, rerank=50, block_size=64)
    cells = np.stack([rng.integers(0, 4, N),
                      rng.integers(0, 4, N)], axis=1).astype(np.int32)
    cells[:, 1] = np.where(rng.random(N) < 0.5, cells[:, 1], -1)  # pads
    # make the two assignments distinct where both present
    both = cells[:, 1] >= 0
    cells[both, 1] = (cells[both, 0] + 1 + cells[both, 1]) % 4
    idx.add_with_ids(x, np.arange(N), cells=cells)
    assert idx._store.multi

    # probing ONLY the secondary cell still finds the duplicated row
    r = int(np.nonzero(both)[0][0])
    d, rows = idx.search(x[r:r + 1], limit=10,
                         cells=np.asarray([cells[r, 1]]))
    assert r in rows[0]
    # probing both cells returns the row ONCE
    d, rows = idx.search(x[r:r + 1], limit=50, cells=cells[r])
    assert (np.asarray(rows[0]) == r).sum() == 1
    # and no duplicates anywhere in a full-probe search
    d, rows = idx.search(x[:8], limit=50)
    for q in range(8):
        alive = rows[q][rows[q] >= 0]
        assert len(alive) == len(np.unique(alive))

    # delete removes every copy
    idx.delete_rows([r])
    d, rows = idx.search(x[r:r + 1], limit=50, cells=cells[r])
    assert r not in rows[0]

    # state round-trip preserves multi addressing (delete still full)
    st = idx.state_arrays()
    idx2 = IVFPQIndex(dim=D, pq_codec=pq, rerank=50, block_size=64)
    idx2.load_state_arrays(st)
    assert idx2._store.multi
    r2 = int(np.nonzero(both)[0][1])
    idx2.delete_rows([r2])
    d, rows = idx2.search(x[r2:r2 + 1], limit=50, cells=cells[r2])
    assert r2 not in rows[0]


def test_facade_soft_assignment(tmp_index_path, rng):
    """n_assign=2 through the public facade: ingest works, search dedups,
    self-hits preserved at reduced probes."""
    from annlite_tpu import AnnLite
    from annlite_tpu.doc import Doc

    D, N = 32, 1500
    centers = rng.standard_normal((16, D)).astype(np.float32) * 3
    x = (centers[rng.integers(0, 16, N)]
         + rng.standard_normal((N, D))).astype(np.float32)
    ann = AnnLite(n_dim=D, metric='euclidean', n_cells=16, n_probe=4,
                  n_subvectors=8, data_path=tmp_index_path, rerank=50,
                  n_assign=2, assign_margin=0.3)
    ann.train(x)
    ann.index([Doc(id=f'd{i}', embedding=x[i]) for i in range(N)])
    assert ann._container.index._store.multi
    _, ids = ann.search_numpy(x[:16], limit=10)
    hits = sum(ids[i][0] == f'd{i}' for i in range(16))
    assert hits >= 15, hits
    for i in range(16):  # dedup: no id twice in one result list
        assert len(ids[i]) == len(set(ids[i]))
    ann.close()
