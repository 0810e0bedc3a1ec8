"""Sparse matrix × dense matrix products for graph propagation on TPU.

This replaces the reference's cuSPARSE paths (``torch.spmm`` in
``models/general_cf/lightgcn.py:28-29`` and ``torch_sparse.spmm`` users).

Formulation: edges sorted by destination row; ``out[r] = sum_e vals[e] * x[cols[e]]``
computed as a gather along rows of ``x`` followed by a *sorted* segment-sum, which
XLA lowers to efficient TPU gather + sorted-scatter.  Optionally supports an
edge-subset mask (for on-device edge dropout: masked edges contribute zero, shapes
stay static).

``spmm_dense_ref`` is the O(N²) dense reference used by parity tests only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.ops.sparse import CooGraph


def spmm(g, x: jnp.ndarray, edge_weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """``A @ x``; ``x`` is ``[n_cols, d]``.

    ``g`` is either a :class:`CooGraph` (XLA gather + sorted segment-sum path)
    or a :class:`~sslrec_tpu.ops.pallas_spmm.PallasGraph` (scatter-free MXU
    kernel).  ``edge_weight``: optional ``[nnz]`` multiplier on ``g.vals`` (0/1
    edge-dropout mask, or learned edge gates) indexed in the original row-sorted
    edge order.  Static shapes throughout.
    """
    from sslrec_tpu.ops.pallas_spmm import PallasGraph, pallas_spmm

    if isinstance(g, PallasGraph):
        return pallas_spmm(g, x, edge_weight)
    vals = g.vals if edge_weight is None else g.vals * edge_weight
    contrib = x[g.cols] * vals[:, None]
    return jax.ops.segment_sum(
        contrib, g.rows, num_segments=g.n_rows, indices_are_sorted=True
    )


def spmm_t(g, x: jnp.ndarray, edge_weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """``A.T @ x`` without materialising the transposed graph.

    Row indices of the transpose are ``g.cols`` (unsorted → sorted=False).
    """
    from sslrec_tpu.ops.pallas_spmm import PallasGraph, _blocked_matvec, _contrib

    if isinstance(g, PallasGraph):
        return _blocked_matvec(g.bwd, _contrib(g.bwd, x, edge_weight), False)
    vals = g.vals if edge_weight is None else g.vals * edge_weight
    contrib = x[g.rows] * vals[:, None]
    return jax.ops.segment_sum(
        contrib, g.cols, num_segments=g.n_cols, indices_are_sorted=False
    )


def sddmm(g: CooGraph, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sampled dense-dense matmul: per-edge ``<a[row], b[col]>`` → ``[nnz]``.

    The TPU replacement for dgl's edge-score pattern (u_dot_v); powers attention
    over edges (RGAT/AttnHGCN in the KG family).
    """
    return jnp.sum(a[g.rows] * b[g.cols], axis=-1)


def spmm_dense_ref(g: CooGraph, x: jnp.ndarray) -> jnp.ndarray:
    """Dense reference implementation (tests only)."""
    dense = jnp.zeros((g.n_rows, g.n_cols), x.dtype)
    dense = dense.at[g.rows, g.cols].add(g.vals.astype(x.dtype))
    return dense @ x
