import numpy as np
import pytest

from annlite_tpu.codecs import PQCodec, ProjectorCodec, VQCodec
from annlite_tpu.enums import Metric


@pytest.fixture
def data(rng):
    # clustered data so k-means has structure to find
    centers = rng.standard_normal((8, 32)).astype(np.float32) * 5
    x = (
        centers[rng.integers(0, 8, size=500)]
        + rng.standard_normal((500, 32)).astype(np.float32)
    )
    return x.astype(np.float32)


# ---------- VQ ----------

def test_vq_fit_encode(data):
    vq = VQCodec(n_clusters=8, iter=20, n_init=2)
    vq.fit(data)
    codes = vq.encode(data)
    assert codes.shape == (500,)
    assert codes.min() >= 0 and codes.max() < 8
    assert vq.codebook.shape == (8, 32)
    # encode is nearest centroid
    d = ((data[:, None, :] - vq.codebook[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(codes, d.argmin(1))


def test_vq_partial_fit(data):
    vq = VQCodec(n_clusters=8)
    with pytest.raises(RuntimeError):
        vq.encode(data)
    for i in range(0, 500, 100):
        vq.partial_fit(data[i : i + 100])
    vq.build_codebook()
    codes = vq.encode(data)
    assert len(np.unique(codes)) > 1


def test_vq_dump_load(data, tmp_path):
    vq = VQCodec(n_clusters=8, iter=10, n_init=1).fit(data)
    p = tmp_path / 'vq.npz'
    vq.dump(p)
    vq2 = VQCodec.load(p)
    np.testing.assert_array_equal(vq.codebook, vq2.codebook)
    np.testing.assert_array_equal(vq.encode(data), vq2.encode(data))


# ---------- PQ ----------

def test_pq_shapes_and_dtype(data):
    pq = PQCodec(dim=32, n_subvectors=4, n_clusters=16, n_init=1)
    pq.fit(data, iter=15)
    codes = pq.encode(data)
    assert codes.shape == (500, 4)
    assert codes.dtype == np.uint8
    recon = pq.decode(codes)
    assert recon.shape == (500, 32)
    # quantization actually reduces error vs random codebook
    err = np.linalg.norm(recon - data) / np.linalg.norm(data)
    assert err < 0.5


def test_pq_code_dtype_scaling():
    assert PQCodec(dim=8, n_subvectors=2, n_clusters=256).code_dtype == np.uint8
    assert PQCodec(dim=8, n_subvectors=2, n_clusters=257).code_dtype == np.uint16
    assert PQCodec(dim=8, n_subvectors=2, n_clusters=70000).code_dtype == np.uint32


def test_pq_dim_divisibility():
    with pytest.raises(ValueError):
        PQCodec(dim=30, n_subvectors=4)


def test_pq_adc_table_matches_numpy(data):
    """Parity with reference test `tests/test_pq_bind.py:35-75` (ADC table
    equivalence to brute-force numpy within 1e-5)."""
    pq = PQCodec(dim=32, n_subvectors=4, n_clusters=16, n_init=1).fit(data, iter=15)
    q = data[:7]
    dmat = pq.get_dist_mat(q)
    assert dmat.shape == (7, 4, 16)
    # numpy reference
    qs = q.reshape(7, 4, 1, 8)
    want = ((qs - pq.codebooks[None]) ** 2).sum(-1)
    np.testing.assert_allclose(dmat, want, atol=1e-4)


def test_pq_adc_table_ip(data):
    pq = PQCodec(
        dim=32, n_subvectors=4, n_clusters=16, metric=Metric.INNER_PRODUCT, n_init=1
    ).fit(data, iter=15)
    q = data[:5]
    dmat = pq.get_dist_mat(q)
    qs = q.reshape(5, 4, 1, 8)
    want = 1.0 / 16 - (qs * pq.codebooks[None]).sum(-1)
    np.testing.assert_allclose(dmat, want, atol=1e-4)


def test_pq_adist_consistent_with_decode(data):
    pq = PQCodec(dim=32, n_subvectors=4, n_clusters=16, n_init=1).fit(data, iter=15)
    codes = pq.encode(data[:50])
    dt = pq.precompute_adc(data[0])
    adists = dt.adist(codes)
    recon = pq.decode(codes)
    want = ((data[0][None] - recon) ** 2).sum(-1)
    np.testing.assert_allclose(adists, want, rtol=1e-3, atol=1e-3)


def test_pq_partial_fit_shape_parity(data):
    """Mirror of reference `tests/test_codec.py:64-70`."""
    pq = PQCodec(dim=32, n_subvectors=4, n_clusters=16, n_init=1)
    for i in range(0, 500, 100):
        pq.partial_fit(data[i : i + 100])
    pq.build_codebook()
    assert pq.codebooks.shape == (4, 16, 8)
    codes = pq.encode(data)
    assert codes.shape == (500, 4)


def test_pq_cosine_normalizes(data):
    pq = PQCodec(dim=32, n_subvectors=4, n_clusters=16, metric=Metric.COSINE, n_init=1)
    pq.fit(data, iter=10)
    # codebook learned on normalized vectors: centroids should have norm <= ~1
    norms = np.linalg.norm(pq.codebooks.reshape(-1, 8), axis=1)
    assert norms.max() < 1.5


def test_pq_dump_load(data, tmp_path):
    pq = PQCodec(dim=32, n_subvectors=4, n_clusters=16, n_init=1).fit(data, iter=10)
    p = tmp_path / 'pq.npz'
    pq.dump(p)
    pq2 = PQCodec.load(p)
    np.testing.assert_array_equal(pq.codebooks, pq2.codebooks)
    np.testing.assert_array_equal(pq.encode(data), pq2.encode(data))
    assert pq2.metric == pq.metric


# ---------- Projector ----------

def test_projector_encode_decode_shapes(data):
    p = ProjectorCodec(dim=32, n_components=8).fit(data)
    y = p.encode(data)
    assert y.shape == (500, 8)
    x2 = p.decode(y)
    assert x2.shape == (500, 32)


def test_projector_matches_sklearn(data):
    from sklearn.decomposition import PCA

    p = ProjectorCodec(dim=32, n_components=8).fit(data)
    sk = PCA(n_components=8).fit(data)
    # explained variance should match closely
    np.testing.assert_allclose(
        p.explained_variance, sk.explained_variance_, rtol=1e-2
    )
    np.testing.assert_allclose(
        p.explained_variance_ratio, sk.explained_variance_ratio_, rtol=1e-2
    )
    # components match up to sign
    dots = np.abs((p.components * sk.components_).sum(axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-2)


def test_projector_partial_fit_is_exact(data):
    full = ProjectorCodec(dim=32, n_components=8).fit(data)
    inc = ProjectorCodec(dim=32, n_components=8)
    for i in range(0, 500, 100):
        inc.partial_fit(data[i : i + 100])
    np.testing.assert_allclose(full.mean, inc.mean, atol=1e-4)
    np.testing.assert_allclose(
        full.explained_variance, inc.explained_variance, rtol=1e-2
    )


def test_projector_whiten_roundtrip(data):
    p = ProjectorCodec(dim=32, n_components=16, whiten=True).fit(data)
    y = p.encode(data)
    # whitened components have ~unit variance
    np.testing.assert_allclose(y.std(axis=0), 1.0, atol=0.2)
    x2 = p.decode(y)
    assert np.isfinite(x2).all()


def test_projector_dump_load(data, tmp_path):
    """Mirror of reference `tests/test_projector.py:37-67` round-trip parity."""
    p = ProjectorCodec(dim=32, n_components=8).fit(data)
    path = tmp_path / 'proj.npz'
    p.dump(path)
    p2 = ProjectorCodec.load(path)
    np.testing.assert_allclose(p.encode(data), p2.encode(data), atol=1e-6)


# ---------- OPQ ----------

def test_opq_beats_pq_reconstruction(rng):
    """OPQ's learned rotation must cut quantization error vs plain PQ on
    correlated data (the whole point of the rotation)."""
    from annlite_tpu.codecs import OPQCodec

    # anisotropic correlated data: random linear map of a low-ish rank core
    core = rng.standard_normal((600, 32)).astype(np.float32)
    mix = rng.standard_normal((32, 32)).astype(np.float32) * np.linspace(2, 0.1, 32)[None, :]
    x = (core @ mix).astype(np.float32)

    pq = PQCodec(dim=32, n_subvectors=8, n_clusters=16, metric='euclidean', n_init=1).fit(x, iter=15)
    opq = OPQCodec(dim=32, n_subvectors=8, n_clusters=16, metric='euclidean', n_init=1, opq_iters=4).fit(x, iter=15)

    err_pq = np.linalg.norm(pq.decode(pq.encode(x)) - x)
    err_opq = np.linalg.norm(opq.decode(opq.encode(x)) - x)
    assert err_opq < err_pq, f'OPQ {err_opq:.1f} !< PQ {err_pq:.1f}'
    # rotation is orthogonal
    r = opq.rotation
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-4)


def test_opq_dist_mat_consistency(rng):
    """ADC distances through OPQ tables equal decoded-vector distances in
    the ORIGINAL space (R orthogonal => L2-preserving)."""
    from annlite_tpu.codecs import OPQCodec

    x = rng.standard_normal((400, 16)).astype(np.float32)
    opq = OPQCodec(dim=16, n_subvectors=4, n_clusters=16, metric='euclidean', n_init=1, opq_iters=3).fit(x, iter=10)
    codes = opq.encode(x[:50])
    q = x[:3]
    dmat = opq.get_dist_mat(q)
    ad = np.zeros((3, 50), np.float32)
    for qi in range(3):
        ad[qi] = dmat[qi][np.arange(4)[None, :], codes.astype(int)].sum(1)
    recon = opq.decode(codes)  # original space
    want = ((q[:, None, :] - recon[None]) ** 2).sum(-1)
    np.testing.assert_allclose(ad, want, rtol=1e-2, atol=1e-2)


def test_opq_dump_load(rng, tmp_path):
    from annlite_tpu.codecs import OPQCodec

    x = rng.standard_normal((300, 16)).astype(np.float32)
    opq = OPQCodec(dim=16, n_subvectors=4, n_clusters=8, n_init=1, opq_iters=2).fit(x, iter=10)
    opq.dump(tmp_path / 'opq.npz')
    o2 = OPQCodec.load(tmp_path / 'opq.npz')
    np.testing.assert_array_equal(opq.rotation, o2.rotation)
    np.testing.assert_array_equal(opq.encode(x), o2.encode(x))


def test_opq_converges_and_eigen_init_helps(rng):
    """VERDICT r4 #4 regression: (a) the alternation must be monotone —
    the old super().encode path dispatched back into OPQ._prep and
    compounded an extra rotation per sweep (codebooks trained on x·R² but
    inference encoding x·R, so OPQ measured ≈ plain PQ); (b) the
    eigenvalue-allocation init (Ge et al. §4) must beat identity init on
    anisotropic data."""
    from annlite_tpu.codecs import OPQCodec

    core = rng.standard_normal((600, 32)).astype(np.float32)
    mix = rng.standard_normal((32, 32)).astype(np.float32) \
        * np.linspace(2, 0.1, 32)[None]
    x = core @ mix

    opq = OPQCodec(dim=32, n_subvectors=8, n_clusters=16,
                   metric='euclidean', n_init=1, opq_iters=6).fit(x, iter=15)
    tr = opq.fit_trace
    assert len(tr) == 6
    # monotone within noise (each sweep may only improve the objective)
    assert all(tr[i + 1] <= tr[i] * 1.02 for i in range(5)), tr
    assert tr[-1] < tr[0] * 1.01

    ident = OPQCodec(dim=32, n_subvectors=8, n_clusters=16,
                     metric='euclidean', n_init=1, opq_iters=6,
                     opq_init='identity').fit(x, iter=15)
    assert tr[-1] < ident.fit_trace[-1] * 0.9, (
        tr[-1], ident.fit_trace[-1])
