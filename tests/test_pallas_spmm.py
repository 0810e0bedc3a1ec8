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
