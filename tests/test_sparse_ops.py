"""Kernel-parity tests: sparse containers, spmm, segment ops vs dense/scipy refs."""

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
import pytest

from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.ops.spmm import spmm, spmm_t, sddmm, spmm_dense_ref
from sslrec_tpu.ops.segment import segment_softmax, segment_mean, segment_normalize
from sslrec_tpu.ops.topk import masked_topk_indices, topk_indices


def test_from_scipy_roundtrip(tiny_ui):
    g = sparse_ops.from_scipy(tiny_ui)
    back = sparse_ops.to_scipy(g)
    assert (back != tiny_ui).nnz == 0
    # row-sorted
    rows = np.asarray(g.rows)
    assert (np.diff(rows) >= 0).all()


def test_normalize_adj_matches_reference_formula(tiny_ui):
    """D^-1/2 A D^-1/2 with eps=1e-10 (data_handler_general_cf.py:37-51)."""
    n_u, n_i = tiny_ui.shape
    bi = sparse_ops.make_bi_adj(tiny_ui, n_u, n_i)
    dense = np.zeros((n_u + n_i, n_u + n_i))
    d = tiny_ui.toarray()
    dense[:n_u, n_u:] = d
    dense[n_u:, :n_u] = d.T
    deg = dense.sum(-1) + 1e-10
    dinv = deg ** -0.5
    expected = dinv[:, None] * dense * dinv[None, :]
    np.testing.assert_allclose(bi.toarray(), expected, rtol=1e-6, atol=1e-9)


def test_spmm_matches_dense(tiny_ui):
    g = sparse_ops.from_scipy(sparse_ops.make_bi_adj(tiny_ui, *tiny_ui.shape))
    x = jax.random.normal(jax.random.PRNGKey(0), (g.n_cols, 16))
    np.testing.assert_allclose(spmm(g, x), spmm_dense_ref(g, x), rtol=1e-5, atol=1e-5)


def test_transpose_is_row_sorted(tiny_ui):
    g = sparse_ops.from_scipy(tiny_ui)
    gt = g.transpose()
    assert (np.diff(np.asarray(gt.rows)) >= 0).all()
    assert (sparse_ops.to_scipy(gt) != tiny_ui.T).nnz == 0


def test_spmm_t_matches_transpose(tiny_ui):
    g = sparse_ops.from_scipy(tiny_ui)
    x = jax.random.normal(jax.random.PRNGKey(1), (g.n_rows, 8))
    gt = g.transpose()
    np.testing.assert_allclose(spmm_t(g, x), spmm(gt, x), rtol=1e-5, atol=1e-5)


def test_spmm_edge_weight_drop(tiny_ui):
    g = sparse_ops.from_scipy(tiny_ui)
    x = jax.random.normal(jax.random.PRNGKey(2), (g.n_cols, 4))
    ew = jnp.zeros((g.nnz,))
    out = spmm(g, x, edge_weight=ew)
    np.testing.assert_allclose(out, np.zeros((g.n_rows, 4)), atol=1e-7)


def test_sddmm(tiny_ui):
    g = sparse_ops.from_scipy(tiny_ui)
    a = jax.random.normal(jax.random.PRNGKey(3), (g.n_rows, 8))
    b = jax.random.normal(jax.random.PRNGKey(4), (g.n_cols, 8))
    out = np.asarray(sddmm(g, a, b))
    full = np.asarray(a) @ np.asarray(b).T
    np.testing.assert_allclose(out, full[np.asarray(g.rows), np.asarray(g.cols)],
                               rtol=1e-5, atol=1e-5)


def test_segment_softmax_sums_to_one():
    ids = jnp.asarray([0, 0, 1, 1, 1, 3])
    logits = jnp.asarray([1.0, 2.0, -1.0, 0.5, 100.0, 3.0])
    out = segment_softmax(logits, ids, num_segments=4)
    sums = jax.ops.segment_sum(out, ids, num_segments=4)
    np.testing.assert_allclose(sums, [1.0, 1.0, 0.0, 1.0], atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


def test_segment_mean():
    ids = jnp.asarray([0, 0, 2])
    data = jnp.asarray([[2.0], [4.0], [5.0]])
    out = segment_mean(data, ids, 3)
    np.testing.assert_allclose(out, [[3.0], [0.0], [5.0]], atol=1e-6)


def test_segment_normalize():
    ids = jnp.asarray([0, 0, 1])
    data = jnp.asarray([1.0, 3.0, 2.0])
    out = segment_normalize(data, ids, 2)
    np.testing.assert_allclose(out, [0.25, 0.75, 1.0], rtol=1e-6)


def test_edge_set_membership(tiny_ui):
    es = sparse_ops.build_edge_set(tiny_ui)
    coo = tiny_ui.tocoo()
    r = jnp.asarray(coo.row[:10], dtype=jnp.int32)
    c = jnp.asarray(coo.col[:10], dtype=jnp.int32)
    assert bool(es.contains(r, c).all())
    dense = tiny_ui.toarray()
    # find a guaranteed non-edge
    ui = np.argwhere(dense == 0)[:10]
    r2 = jnp.asarray(ui[:, 0], dtype=jnp.int32)
    c2 = jnp.asarray(ui[:, 1], dtype=jnp.int32)
    assert not bool(es.contains(r2, c2).any())


def test_edge_set_csr_mode(tiny_ui):
    """Fallback path for shapes where row*n_cols+col would overflow int32:
    CSR binary search must agree with dense membership everywhere."""
    csr = tiny_ui.tocsr()
    csr.sort_indices()
    max_deg = int(np.diff(csr.indptr).max())
    es = sparse_ops.EdgeSet(
        codes=None,
        indptr=jnp.asarray(csr.indptr.astype(np.int32)),
        sorted_cols=jnp.asarray(csr.indices.astype(np.int32)),
        n_cols=tiny_ui.shape[1],
        search_depth=int(np.ceil(np.log2(max_deg + 1))))
    dense = tiny_ui.toarray() != 0
    rr, cc = np.meshgrid(np.arange(tiny_ui.shape[0]),
                         np.arange(tiny_ui.shape[1]), indexing="ij")
    got = np.asarray(es.contains(jnp.asarray(rr.ravel(), dtype=jnp.int32),
                                 jnp.asarray(cc.ravel(), dtype=jnp.int32)))
    np.testing.assert_array_equal(got, dense.ravel())


def test_spmm_layers_matches_loop(tiny_ui):
    """The scanned multi-hop helpers must equal the python-loop formulation."""
    from sslrec_tpu.ops.spmm import spmm_layers, spmm_views

    g = sparse_ops.from_scipy(sparse_ops.make_bi_adj(tiny_ui, *tiny_ui.shape))
    n = g.n_rows
    x0 = jax.random.normal(jax.random.PRNGKey(0), (n, 8))
    ew = jax.random.uniform(jax.random.PRNGKey(1), (3, g.nnz))

    # per-layer edge weights
    ys = spmm_layers(g, x0, 3, ew)
    x = x0
    for l in range(3):
        x = spmm(g, x, edge_weight=ew[l])
        np.testing.assert_allclose(np.asarray(ys[l]), np.asarray(x), rtol=1e-5)

    # shared edge weight + views batching
    ys1 = spmm_layers(g, x0, 2, ew[0])
    x = spmm(g, x0, edge_weight=ew[0])
    np.testing.assert_allclose(np.asarray(ys1[0]), np.asarray(x), rtol=1e-5)
    x = spmm(g, x, edge_weight=ew[0])
    np.testing.assert_allclose(np.asarray(ys1[1]), np.asarray(x), rtol=1e-5)

    x0s = jnp.stack([x0, 2.0 * x0])
    out = spmm_views(g, x0s, 2, jnp.stack([ew[0], ew[1]]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ys1), rtol=1e-5)
    ys2 = spmm_layers(g, 2.0 * x0, 2, ew[1])
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ys2), rtol=1e-5)

    # post-hook (SimGCL-style) threading: post sees one key per hop
    seen = []

    def post(k, x):
        seen.append(k.shape)
        return x + 1.0

    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    ysp = spmm_layers(g, x0, 2, post=post, keys=keys)
    xp = spmm(g, x0) + 1.0
    np.testing.assert_allclose(np.asarray(ysp[0]), np.asarray(xp), rtol=1e-5)


def test_edge_set_csr_mode_through_jit(tiny_ui):
    """A CSR-mode EdgeSet passed *as a jit argument* (MAERec's train_step path)
    must keep search_depth static — regression for the TracerIntegerConversion
    crash when NamedTuple int leaves were traced."""
    csr = tiny_ui.tocsr()
    csr.sort_indices()
    max_deg = int(np.diff(csr.indptr).max())
    es = sparse_ops.EdgeSet(
        codes=None,
        indptr=jnp.asarray(csr.indptr.astype(np.int32)),
        sorted_cols=jnp.asarray(csr.indices.astype(np.int32)),
        n_cols=tiny_ui.shape[1],
        search_depth=int(np.ceil(np.log2(max_deg + 1))))

    @jax.jit
    def probe(edge_set, r, c):
        return edge_set.contains(r, c)

    coo = tiny_ui.tocoo()
    r = jnp.asarray(coo.row[:8], dtype=jnp.int32)
    c = jnp.asarray(coo.col[:8], dtype=jnp.int32)
    assert bool(probe(es, r, c).all())

    from sslrec_tpu.data import sampling
    negs = sampling.sample_negatives(jax.random.PRNGKey(0), r, es,
                                     tiny_ui.shape[1])
    assert not bool(es.contains(r, negs).any())


def test_edge_set_csr_mode_via_builder():
    """A genuinely >2^31-cell shape routes through the CSR branch."""
    import scipy.sparse as sp
    n = 70000  # n*n > 2^31
    rng = np.random.default_rng(0)
    r = rng.integers(0, n, 500)
    c = rng.integers(0, n, 500)
    mat = sp.coo_matrix((np.ones(500, np.float32), (r, c)), shape=(n, n))
    es = sparse_ops.build_edge_set(mat)
    assert es.codes is None and es.indptr is not None
    assert bool(es.contains(jnp.asarray(r[:20], dtype=jnp.int32),
                            jnp.asarray(c[:20], dtype=jnp.int32)).all())
    # non-edges: shift columns by one (collision chance negligible at this density)
    coo = mat.tocoo()
    assert not bool(es.contains(jnp.asarray(coo.row[:20], dtype=jnp.int32),
                                jnp.asarray((coo.col[:20] + 1) % n,
                                            dtype=jnp.int32)).any())


def test_padded_rows(tiny_ui):
    pr = sparse_ops.build_padded_rows(tiny_ui)
    csr = tiny_ui.tocsr()
    for r in [0, 5, 17]:
        expect = sorted(csr.indices[csr.indptr[r]:csr.indptr[r + 1]])
        got = sorted(np.asarray(pr.cols[r])[np.asarray(pr.mask[r])])
        assert got == expect
        assert int(pr.lengths[r]) == len(expect)


def test_masked_topk():
    scores = jnp.asarray([[5.0, 4.0, 3.0, 2.0, 1.0],
                          [1.0, 2.0, 3.0, 4.0, 5.0]])
    mask_cols = jnp.asarray([[0, 1], [4, 0]], dtype=jnp.int32)
    mask_valid = jnp.asarray([[True, False], [True, True]])
    out = np.asarray(masked_topk_indices(scores, mask_cols, mask_valid, 2))
    # row 0: col 0 masked (col 1 padding → untouched) → top2 = [1, 2]
    np.testing.assert_array_equal(out[0], [1, 2])
    # row 1: cols 4 and 0 masked → top2 = [3, 2]
    np.testing.assert_array_equal(out[1], [3, 2])


def test_topk_plain():
    scores = jnp.asarray([[1.0, 9.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(topk_indices(scores, 2))[0], [1, 2])
