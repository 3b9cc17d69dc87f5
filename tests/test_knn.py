"""KNN ops vs numpy brute force."""

import numpy as np
import jax.numpy as jnp

from reduced3dgs_tpu.ops import knn


def _np_knn(points, k):
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_brute_knn_exact():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (500, 3)).astype(np.float32)
    d2, idx = knn.knn(jnp.asarray(pts), 5)
    nd2, _ = _np_knn(pts, 5)
    np.testing.assert_allclose(np.sort(d2, axis=1), np.sort(nd2, axis=1),
                               rtol=1e-4, atol=1e-6)


def test_mean_knn_dist2_matches_reference_semantics():
    rng = np.random.default_rng(1)
    pts = rng.normal(0, 1, (300, 3)).astype(np.float32)
    got = np.asarray(knn.mean_knn_dist2(jnp.asarray(pts)))
    nd2, _ = _np_knn(pts, 3)
    np.testing.assert_allclose(got, nd2.mean(1), rtol=1e-4, atol=1e-6)


def test_window_knn_recall():
    # smooth distribution: morton-window should find nearly all true NNs
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1, (4096, 3)).astype(np.float32)
    _, idx_w = knn.knn(jnp.asarray(pts), 8, window=96, exact=False)
    _, idx_t = _np_knn(pts, 8)
    recall = np.mean([
        len(set(a) & set(b)) / 8 for a, b in zip(np.asarray(idx_w), idx_t)
    ])
    assert recall > 0.85, recall
