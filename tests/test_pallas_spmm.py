"""Pallas SpMM kernel parity (interpret mode on CPU) vs the XLA segment path."""

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.ops.pallas_spmm import (
    build_pallas_graph, make_blocked, pallas_spmm, _blocked_matvec, _contrib)
from sslrec_tpu.ops.spmm import spmm, spmm_dense_ref


def _graph(tiny_ui):
    bi = sparse_ops.make_bi_adj(tiny_ui, *tiny_ui.shape)
    return sparse_ops.from_scipy(bi)


def test_make_blocked_covers_all_edges(tiny_ui):
    g = _graph(tiny_ui)
    bg = make_blocked(np.asarray(g.rows), np.asarray(g.cols), np.asarray(g.vals),
                      g.n_rows, r=16, m=32)
    # every original edge appears exactly once among non-padding slots
    live = np.asarray(bg.vals) != 0
    assert live.sum() == g.nnz
    # reconstruct (row, col, val) from the blocked layout
    owners = np.repeat(np.asarray(bg.owners), bg.m)
    lrows = np.asarray(bg.local_rows).reshape(-1)
    rows_rec = owners * bg.r + lrows
    got = sorted(zip(rows_rec[live], np.asarray(bg.cols)[live],
                     np.asarray(bg.vals)[live]))
    expect = sorted(zip(np.asarray(g.rows), np.asarray(g.cols), np.asarray(g.vals)))
    for a, b in zip(got, expect):
        assert a[0] == b[0] and a[1] == b[1] and abs(a[2] - b[2]) < 1e-6


def test_pallas_spmm_parity(tiny_ui):
    g = _graph(tiny_ui)
    pg = build_pallas_graph(g, r=16, m=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (g.n_cols, 8))
    ref = spmm_dense_ref(g, x)
    got = pallas_spmm(pg, x, None, True)  # interpret mode
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_spmm_edge_weight_and_grads(tiny_ui):
    g = _graph(tiny_ui)
    pg = build_pallas_graph(g, r=16, m=32)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (g.n_cols, 8))
    ew = jax.random.uniform(jax.random.PRNGKey(2), (g.nnz,))

    def f_pallas(x, ew):
        return jnp.sum(jnp.sin(pallas_spmm(pg, x, ew, True)))

    def f_ref(x, ew):
        return jnp.sum(jnp.sin(spmm(g, x, edge_weight=ew)))

    np.testing.assert_allclose(f_pallas(x, ew), f_ref(x, ew), rtol=1e-4)
    gp = jax.grad(f_pallas, argnums=(0, 1))(x, ew)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, ew)
    np.testing.assert_allclose(gp[0], gr[0], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(gp[1], gr[1], rtol=1e-3, atol=1e-4)


def test_pallas_transpose_direction(tiny_ui):
    g = sparse_ops.from_scipy(tiny_ui)  # rectangular, asymmetric
    pg = build_pallas_graph(g, r=16, m=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (g.n_rows, 4))
    got = _blocked_matvec(pg.bwd, _contrib(pg.bwd, x, None), True)
    ref = tiny_ui.toarray().T @ np.asarray(x)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dropout_padded_prf_consistency(tiny_ui):
    """dropout_padded: same original edge keeps/drops identically in the fwd
    and bwd layouts, and the keep statistic tracks keep_rate."""
    from sslrec_tpu.ops.pallas_spmm import dropout_padded, _prf_uniform

    g = _graph(tiny_ui)
    pg = build_pallas_graph(g, r=16, m=32)
    key = jax.random.PRNGKey(3)
    pw = dropout_padded(key, pg, keep_rate=0.5)
    # reference mask in original edge order via the same PRF
    ref = np.asarray(jnp.floor(
        _prf_uniform(key, jnp.arange(g.nnz, dtype=jnp.uint32), 0) + 0.5))
    for bg, got in ((pg.fwd, np.asarray(pw.fwd)), (pg.bwd, np.asarray(pw.bwd))):
        live = np.asarray(bg.vals) != 0
        eids = np.asarray(bg.edge_ids)[live]
        np.testing.assert_array_equal(got[live], ref[eids])
    # unbiased keep statistic on a larger draw
    big = _prf_uniform(key, jnp.arange(50_000, dtype=jnp.uint32), 0)
    keep = float(jnp.mean(jnp.floor(big + 0.7)))
    assert abs(keep - 0.7) < 0.02


def test_pallas_spmm_pv_matches_masked_spmm(tiny_ui):
    """The gather-free pv path == pallas_spmm with the equivalent original-order
    mask, for values and for dx (the mask cotangent is zero by construction)."""
    from sslrec_tpu.ops.pallas_spmm import (dropout_padded, pallas_spmm_pv,
                                            _prf_uniform)

    g = _graph(tiny_ui)
    pg = build_pallas_graph(g, r=16, m=32)
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(jax.random.PRNGKey(5), (g.n_cols, 8))
    pw = dropout_padded(key, pg, keep_rate=0.6, resize_val=True)
    mask = jnp.floor(_prf_uniform(key, jnp.arange(g.nnz, dtype=jnp.uint32), 0)
                     + 0.6) / 0.6

    def f_pv(x):
        return jnp.sum(jnp.sin(pallas_spmm_pv(pg, x, pw.fwd, pw.bwd, True)))

    def f_ref(x):
        return jnp.sum(jnp.sin(pallas_spmm(pg, x, mask, True)))

    np.testing.assert_allclose(f_pv(x), f_ref(x), rtol=1e-4)
    np.testing.assert_allclose(jax.grad(f_pv)(x), jax.grad(f_ref)(x),
                               rtol=1e-4, atol=1e-5)


def test_edge_drop_helper_dispatch(tiny_ui):
    """augment.edge_drop: PaddedEdgeWeight for PallasGraph, [nnz] mask for
    CooGraph, None when keep_rate >= 1; spmm consumes each form."""
    from sslrec_tpu.models import augment
    from sslrec_tpu.ops.pallas_spmm import PaddedEdgeWeight

    g = _graph(tiny_ui)
    pg = build_pallas_graph(g, r=16, m=32)
    key = jax.random.PRNGKey(6)
    assert augment.edge_drop(key, g, 1.0) is None
    m = augment.edge_drop(key, g, 0.5)
    assert m.shape == (g.nnz,)
    pw = augment.edge_drop(key, pg, 0.5)
    assert isinstance(pw, PaddedEdgeWeight)
    # per-salt stacks (random_walk / per-layer drops)
    pw2 = augment.edge_drop(key, pg, 0.5, salts=jnp.arange(3))
    assert pw2.fwd.shape[0] == 3 and pw2.ndim == 2
    m2 = augment.edge_drop(key, g, 0.5, salts=jnp.arange(3))
    assert m2.shape == (3, g.nnz)
