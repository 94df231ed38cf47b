import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.ops.knn import knn, knn_exact, mean_knn_dist_sq, morton_codes


def test_morton_codes_locality():
    pts = jnp.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1, 1]])
    codes = np.asarray(morton_codes(pts))
    assert abs(int(codes[0]) - int(codes[1])) < abs(int(codes[0]) - int(codes[2]))


def test_knn_matches_exact_small():
    pts = jax.random.normal(jax.random.PRNGKey(0), (300, 3))
    d_w, i_w = knn(pts, 5, window=128, n_orders=3)
    d_e, i_e = knn_exact(pts, 5)
    # Window KNN is approximate; with a generous window and 3 jittered
    # orderings on small N the recall should be very high.
    recall = np.mean([
        len(set(np.asarray(i_w[j]).tolist()) & set(np.asarray(i_e[j]).tolist())) / 5
        for j in range(300)])
    assert recall > 0.93, recall
    np.testing.assert_allclose(np.sort(np.asarray(d_w), axis=1).mean(),
                               np.sort(np.asarray(d_e), axis=1).mean(), rtol=0.02)


def test_knn_excludes_self():
    pts = jax.random.normal(jax.random.PRNGKey(1), (100, 3))
    _, idx = knn(pts, 4, window=32)
    self_idx = np.arange(100)[:, None]
    assert not (np.asarray(idx) == self_idx).any()


def test_knn_mask():
    pts = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    mask = jnp.arange(64) < 32
    _, idx = knn(pts, 3, window=32, mask=mask)
    # alive points must only have alive neighbours
    assert (np.asarray(idx)[:32] < 32).all()


def test_mean_knn_dist_includes_self():
    # 3 points on a line at 0, 1, 10: for the point at 0 the two nearest are
    # at 1 and 10 -> (0 + 1 + 81)/3 (self included per distCUDA2 semantics)
    pts = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [10.0, 0, 0]])
    d = np.asarray(mean_knn_dist_sq(pts, window=8))
    np.testing.assert_allclose(d[0], (1 + 100) / 3, rtol=1e-5)
    np.testing.assert_allclose(d[1], (1 + 81) / 3, rtol=1e-5)


def test_knn_duplicate_candidates_not_counted_twice():
    pts = jax.random.normal(jax.random.PRNGKey(3), (50, 3))
    d, idx = knn(pts, 8, window=50, n_orders=3)
    for j in range(50):
        row = np.asarray(idx[j])
        assert len(set(row.tolist())) == 8, row
