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
    from sslrec_tpu.ops.pallas_spmm import (PaddedEdgeWeight, PallasGraph,
                                            pallas_spmm, pallas_spmm_pv)

    if isinstance(g, PallasGraph):
        if isinstance(edge_weight, PaddedEdgeWeight):
            # gather-free dropout path: multiplier already in each layout
            return pallas_spmm_pv(g, x, edge_weight.fwd, edge_weight.bwd)
        return pallas_spmm(g, x, edge_weight)
    vals = g.vals if edge_weight is None else g.vals * edge_weight
    contrib = x[g.cols] * vals[:, None]
    return jax.ops.segment_sum(
        contrib, g.rows, num_segments=g.n_rows, indices_are_sorted=True
    )


def spmm_layers(g, x0: jnp.ndarray, n_layers: int,
                edge_weight: jnp.ndarray | None = None,
                post=None, keys: jnp.ndarray | None = None) -> jnp.ndarray:
    """``n_layers`` repeated ``A @ x`` hops with ONE spmm call site.

    The python-loop formulation emits one spmm instance per hop, and on the
    Pallas path every instance is a separate Mosaic kernel compile (the round-1
    compile-scaling pathology: SGL's 12 instances > 30 min).  ``lax.scan``
    traces the hop once, so the whole stack shares a single kernel instance in
    both the forward and backward program.

    ``edge_weight``: None | ``[nnz]`` (same every hop) | ``[n_layers, nnz]``.
    ``post``: optional ``fn(key, x) -> x`` applied after each hop (SimGCL's
    per-layer noise), driven by ``keys [n_layers, ...]``.
    Returns the stacked per-hop outputs ``[n_layers, n_rows, d]``.
    """
    per_layer_ew = edge_weight is not None and edge_weight.ndim == 2
    # a PaddedEdgeWeight is a pytree: per-layer leading dims scan correctly

    def body(x, inp):
        inp = inp or {}
        ew = inp.get("ew", edge_weight if not per_layer_ew else None)
        y = spmm(g, x, edge_weight=ew)
        if post is not None:
            y = post(inp["key"], y)
        return y, y

    inputs = {}
    if per_layer_ew:
        inputs["ew"] = edge_weight
    if post is not None:
        inputs["key"] = keys
    if inputs:
        _, ys = jax.lax.scan(body, x0, inputs)
    else:
        _, ys = jax.lax.scan(body, x0, None, length=n_layers)
    return ys


def spmm_views(g, x0s: jnp.ndarray, n_layers: int,
               edge_weights: jnp.ndarray | None = None,
               post=None, keys: jnp.ndarray | None = None) -> jnp.ndarray:
    """``V`` independent propagation stacks sharing ONE spmm call site.

    ``x0s``: ``[V, N, d]``; ``edge_weights``: None | ``[V, nnz]`` |
    ``[V, n_layers, nnz]``; ``keys``: ``[V, n_layers, ...]`` when ``post`` set.
    Returns ``[V, n_layers, N, d]``.  Multi-view models (SGL's two augmented
    views, SimGCL's two perturbed views) collapse onto one kernel instance.
    """

    def view(_, inp):
        ys = spmm_layers(g, inp["x0"], n_layers, inp.get("ew"),
                         post, inp.get("key"))
        return None, ys

    inputs = {"x0": x0s}
    if edge_weights is not None:
        inputs["ew"] = edge_weights
    if keys is not None:
        inputs["key"] = keys
    _, out = jax.lax.scan(view, None, inputs)
    return out


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
