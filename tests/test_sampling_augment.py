"""Negative sampling correctness + augmentation statistics."""

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.data.sampling import sample_negatives
from sslrec_tpu.models import augment
from sslrec_tpu.ops.sparse import build_edge_set, from_scipy


def test_sample_negatives_rejects_positives(tiny_ui):
    es = build_edge_set(tiny_ui)
    coo = tiny_ui.tocoo()
    users = jnp.asarray(coo.row, dtype=jnp.int32)
    negs = sample_negatives(jax.random.PRNGKey(0), users, es, tiny_ui.shape[1])
    dense = tiny_ui.toarray()
    u = np.asarray(users)
    n = np.asarray(negs)
    assert (n >= 0).all() and (n < tiny_ui.shape[1]).all()
    # no sampled negative is a train positive
    assert dense[u, n].sum() == 0


def test_sample_negatives_distribution(tiny_ui):
    es = build_edge_set(tiny_ui)
    users = jnp.zeros((20000,), jnp.int32)
    negs = np.asarray(sample_negatives(jax.random.PRNGKey(1), users, es,
                                       tiny_ui.shape[1]))
    pos0 = set(tiny_ui.tocsr()[0].indices)
    valid_items = [i for i in range(tiny_ui.shape[1]) if i not in pos0]
    counts = np.bincount(negs, minlength=tiny_ui.shape[1])
    # roughly uniform over non-positive items
    expected = 20000 / len(valid_items)
    assert abs(counts[valid_items].mean() - expected) < 1e-9
    assert counts[valid_items].std() < expected  # loose sanity


def test_edge_drop_mask_stats():
    key = jax.random.PRNGKey(0)
    m = augment.edge_drop_mask(key, 100000, keep_rate=0.5)
    frac = float(jnp.mean(m))
    assert abs(frac - 0.5) < 0.01
    m2 = augment.edge_drop_mask(key, 100000, keep_rate=0.5, resize_val=True)
    assert abs(float(jnp.mean(m2)) - 1.0) < 0.02  # rescaled to preserve expectation
    m3 = augment.edge_drop_mask(key, 10, keep_rate=1.0)
    np.testing.assert_array_equal(np.asarray(m3), np.ones(10))


def test_node_drop_and_perturb():
    key = jax.random.PRNGKey(0)
    e = jnp.ones((1000, 8))
    nd = augment.node_drop(key, e, 0.7)
    row_means = np.asarray(nd).mean(-1)
    assert set(np.unique(row_means)).issubset({0.0, 1.0})
    assert abs(row_means.mean() - 0.7) < 0.05
    pert = augment.embed_perturb(key, e, eps=0.1)
    delta = np.asarray(pert - e)
    # noise is sign-aligned (embeds are +1) and each row has L2 norm eps
    assert (delta >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(delta, axis=-1), 0.1, rtol=1e-4)


def test_kmeans_converges_on_blobs():
    key = jax.random.PRNGKey(0)
    c1 = jax.random.normal(key, (100, 4)) * 0.05 + 2.0
    c2 = jax.random.normal(jax.random.PRNGKey(1), (100, 4)) * 0.05 - 2.0
    x = jnp.concatenate([c1, c2])
    cents, idx, cnts = augment.kmeans(jax.random.PRNGKey(2), x, 2, iters=50)
    idx = np.asarray(idx)
    # the two blobs end up in distinct clusters
    assert len(set(idx[:100])) == 1 and len(set(idx[100:])) == 1
    assert idx[0] != idx[100]


def test_svd_decompose_low_rank(tiny_ui):
    g = from_scipy(tiny_ui)
    ut, vt, us, vs = augment.svd_decompose(jax.random.PRNGKey(0), g, q=8)
    dense = tiny_ui.toarray()
    # exact SVD truncation error as reference
    u_np, s_np, vt_np = np.linalg.svd(dense, full_matrices=False)
    best = (u_np[:, :8] * s_np[:8]) @ vt_np[:8]
    approx = np.asarray(us) @ np.asarray(vt)
    # randomized SVD should be close to the optimal rank-8 approximation
    assert np.linalg.norm(approx - dense) < 1.1 * np.linalg.norm(best - dense) + 1e-4


def test_adaptive_mask_row_normalised(tiny_ui):
    g = from_scipy(tiny_ui)
    h = jax.random.normal(jax.random.PRNGKey(0), (g.n_rows, 8))
    t = jax.random.normal(jax.random.PRNGKey(1), (g.n_cols, 8))
    vals = augment.adaptive_mask(g, h, t)
    sums = jax.ops.segment_sum(vals, g.rows, num_segments=g.n_rows)
    nz = np.asarray(sums)[np.asarray(sums) > 0]
    np.testing.assert_allclose(nz, 1.0, rtol=1e-5)
