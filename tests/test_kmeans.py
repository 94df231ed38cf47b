import jax
import jax.numpy as jnp
import numpy as np

from reduced_3dgs_tpu.ops.kmeans import assign, kmeans


def _blobs(key, k=4, per=100, d=3, sep=10.0):
    ks = jax.random.split(key, k)
    centers = sep * jax.random.normal(jax.random.PRNGKey(42), (k, d))
    pts = jnp.concatenate([
        centers[i] + 0.1 * jax.random.normal(ks[i], (per, d))
        for i in range(k)])
    return pts, centers


def test_kmeans_recovers_blobs():
    pts, true_centers = _blobs(jax.random.PRNGKey(0))
    centers, ids = kmeans(pts, 4, max_iter=50)
    # each found center is close to one true center
    d = np.linalg.norm(np.asarray(centers)[:, None] -
                       np.asarray(true_centers)[None], axis=-1)
    assert (d.min(axis=1) < 0.5).all()
    # assignments are consistent
    ids = np.asarray(ids)
    for blob in range(4):
        seg = ids[blob * 100:(blob + 1) * 100]
        assert (seg == seg[0]).all()


def test_kmeans_single_cluster_is_mean():
    pts = jax.random.normal(jax.random.PRNGKey(1), (50, 2))
    centers, ids = kmeans(pts, 1)
    np.testing.assert_allclose(np.asarray(centers)[0],
                               np.asarray(pts.mean(0)), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), 0)


def test_kmeans_weights_exclude_rows():
    pts = jnp.concatenate([jnp.zeros((50, 2)),
                           jnp.full((50, 2), 100.0)])
    w = jnp.concatenate([jnp.ones(50), jnp.zeros(50)])
    centers, _ = kmeans(pts, 2, weights=w, max_iter=20)
    # no center lands on the ignored blob at 100
    assert np.abs(np.asarray(centers)).max() < 50.0


def test_kmeans_warm_start():
    pts, true_centers = _blobs(jax.random.PRNGKey(2))
    centers, _ = kmeans(pts, 4, init_centers=true_centers, max_iter=5)
    d = np.linalg.norm(np.asarray(centers)[:, None]
                       - np.asarray(true_centers)[None], axis=-1)
    assert (d.min(axis=1) < 0.3).all()


def test_assign_matches_argmin():
    pts = jax.random.normal(jax.random.PRNGKey(3), (200, 3))
    centers = jax.random.normal(jax.random.PRNGKey(4), (16, 3))
    ids = np.asarray(assign(pts, centers))
    d = np.linalg.norm(np.asarray(pts)[:, None] - np.asarray(centers)[None],
                       axis=-1)
    np.testing.assert_array_equal(ids, d.argmin(axis=1))
