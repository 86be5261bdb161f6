import numpy as np
import pytest
import scipy.spatial.distance as scipy_dist

from annlite_tpu.enums import Metric
from annlite_tpu.math import cdist, l2_normalize, top_k


def test_l2_normalize(rng):
    x = rng.standard_normal((32, 17)).astype(np.float32)
    y = np.asarray(l2_normalize(x))
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, atol=1e-5)
    # zero rows stay finite
    x[0] = 0
    y = np.asarray(l2_normalize(x))
    assert np.isfinite(y).all()


@pytest.mark.parametrize('metric', [Metric.EUCLIDEAN, Metric.COSINE, Metric.INNER_PRODUCT])
def test_cdist_matches_scipy(rng, metric):
    x = rng.standard_normal((10, 24)).astype(np.float32)
    y = rng.standard_normal((20, 24)).astype(np.float32)
    got = np.asarray(cdist(x, y, metric))
    if metric == Metric.EUCLIDEAN:
        want = scipy_dist.cdist(x, y, 'sqeuclidean')
    elif metric == Metric.COSINE:
        want = scipy_dist.cdist(x, y, 'cosine')
    else:
        want = 1.0 - x @ y.T
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_top_k_sorted_and_correct(rng):
    d = rng.standard_normal((7, 100)).astype(np.float32)
    dists, idx = top_k(d, 10)
    dists, idx = np.asarray(dists), np.asarray(idx)
    assert dists.shape == (7, 10) and idx.shape == (7, 10)
    # sorted ascending
    assert (np.diff(dists, axis=1) >= -1e-6).all()
    # matches numpy argsort
    want = np.sort(d, axis=1)[:, :10]
    np.testing.assert_allclose(dists, want, atol=1e-6)


def test_top_k_clamps_k(rng):
    d = rng.standard_normal((3, 5)).astype(np.float32)
    dists, idx = top_k(d, 50)
    assert dists.shape == (3, 5)
