"""Sparse graph containers and host-side builders.

TPU-first design notes
----------------------
TPUs have no cuSPARSE; the reference leans on ``torch.sparse`` / ``torch_sparse`` /
``dgl`` for every graph propagation (e.g. ``models/general_cf/lightgcn.py:28-29``,
``data_utils/data_handler_general_cf.py:53-73``).  Here the on-device format is
**row-sorted COO** held as plain ``jnp`` int32/float32 arrays (a pytree), which XLA
consumes via gather + (sorted) segment-sum — the layout the TPU scatter/gather units
like.  Graph *construction* (normalisation, bidirectionalisation, motif algebra) is
host-side scipy executed once at load time, mirroring the reference's semantics
(``data_utils/data_handler_general_cf.py:37-73``) but producing device arrays.

Membership tests (negative-sampling rejection, metric label lookup) use a sorted
1-D array of edge codes ``row * n_cols + col`` searched with ``jnp.searchsorted`` —
the fixed-shape, device-side replacement for the reference's host-python dok-matrix
rejection loop (``data_utils/datasets_general_cf.py:13-20``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


class CooGraph(NamedTuple):
    """Row-sorted COO sparse matrix resident on device (a JAX pytree).

    ``rows``/``cols`` are int32 ``[nnz]``, ``vals`` float32 ``[nnz]``; ``n_rows`` /
    ``n_cols`` are static Python ints (NamedTuple leaves of non-array type are
    treated as auxiliary data by jit when closed over; we keep them as plain ints
    and never trace them).
    """

    rows: jnp.ndarray
    cols: jnp.ndarray
    vals: jnp.ndarray
    n_rows: int
    n_cols: int

    @property
    def nnz(self) -> int:
        return self.rows.shape[0]

    def transpose(self) -> "CooGraph":
        # lexsort: last key is primary → sort by old cols (the new rows)
        order = np.lexsort((np.asarray(self.rows), np.asarray(self.cols)))  # host-side
        return CooGraph(
            rows=jnp.asarray(np.asarray(self.cols)[order]),
            cols=jnp.asarray(np.asarray(self.rows)[order]),
            vals=jnp.asarray(np.asarray(self.vals)[order]),
            n_rows=self.n_cols,
            n_cols=self.n_rows,
        )


def from_scipy(mat: sp.spmatrix) -> CooGraph:
    """Convert any scipy sparse matrix to a row-sorted device CooGraph."""
    coo = mat.tocoo()
    order = np.lexsort((coo.col, coo.row))
    return CooGraph(
        rows=jnp.asarray(coo.row[order], dtype=jnp.int32),
        cols=jnp.asarray(coo.col[order], dtype=jnp.int32),
        vals=jnp.asarray(coo.data[order], dtype=jnp.float32),
        n_rows=int(coo.shape[0]),
        n_cols=int(coo.shape[1]),
    )


def to_scipy(g: CooGraph) -> sp.coo_matrix:
    return sp.coo_matrix(
        (np.asarray(g.vals), (np.asarray(g.rows), np.asarray(g.cols))),
        shape=(g.n_rows, g.n_cols),
    )


# ---------------------------------------------------------------------------
# Host-side graph algebra (behavioural parity with the reference's builders)
# ---------------------------------------------------------------------------

def normalize_adj_sym(mat: sp.spmatrix, eps: float = 1e-10) -> sp.coo_matrix:
    """Symmetric Laplacian normalisation D^-1/2 A D^-1/2.

    Matches ``data_utils/data_handler_general_cf.py:37-51`` including the degree
    epsilon and inf-zeroing (degrees computed over *rows*; for the symmetric
    bidirectional adjacency row/col degrees coincide).
    """
    mat = mat.tocoo()
    degree = np.asarray(mat.sum(axis=-1)).reshape(-1) + eps
    d_inv_sqrt = np.power(degree, -0.5)
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    d = sp.diags(d_inv_sqrt)
    return (d @ mat @ d).tocoo()


def normalize_adj_left(mat: sp.spmatrix, eps: float = 1e-10) -> sp.coo_matrix:
    """Row (random-walk) normalisation D^-1 A."""
    mat = mat.tocoo()
    degree = np.asarray(mat.sum(axis=-1)).reshape(-1) + eps
    d_inv = 1.0 / degree
    d_inv[np.isinf(d_inv)] = 0.0
    return (sp.diags(d_inv) @ mat).tocoo()


def make_bi_adj(ui_mat: sp.spmatrix, n_users: int, n_items: int,
                self_loop: bool = False) -> sp.coo_matrix:
    """Bidirectional [[0, R], [R^T, 0]] adjacency, binarised then sym-normalised.

    Parity with ``data_utils/data_handler_general_cf.py:53-73`` (no self loops by
    default — the reference's self-loop line is commented out).
    """
    a = sp.csr_matrix((n_users, n_users))
    b = sp.csr_matrix((n_items, n_items))
    mat = sp.vstack([sp.hstack([a, ui_mat]), sp.hstack([ui_mat.transpose(), b])])
    mat = (mat != 0) * 1.0
    if self_loop:
        mat = mat + sp.eye(mat.shape[0])
    return normalize_adj_sym(mat)


# ---------------------------------------------------------------------------
# Edge-code membership structures (device-side set lookups)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class EdgeSet:
    """Device-side set of (row, col) pairs with O(log nnz) membership tests.

    Primary mode packs ``row * n_cols + col`` into a sorted int32 code array
    (JAX default int width; exact while ``n_rows * n_cols < 2^31``).  For larger
    shapes (KG-scale entity/item spaces) it stores the CSR (indptr, sorted cols)
    and binary-searches each row segment with a static-depth lower-bound loop —
    O(nnz) memory instead of the O(n_rows × max_degree) padded layout, which
    for skewed graphs (e.g. MAERec's item-item transition graph) exploded to
    hundreds of MB of HLO constants and overflowed the remote-compile tunnel.

    Registered as a pytree with ``n_cols``/``search_depth`` as *static* aux data
    so an EdgeSet can be passed through ``jit``/``scan`` — the search-depth loop
    bound must stay a python int, not a tracer.
    """

    def __init__(self, codes, indptr, sorted_cols, n_cols, search_depth):
        self.codes = codes               # int32 [nnz] sorted, or None (CSR mode)
        self.indptr = indptr             # int32 [n_rows+1], CSR mode only
        self.sorted_cols = sorted_cols   # int32 [nnz], per-row sorted, CSR mode
        self.n_cols = n_cols
        self.search_depth = search_depth  # static binary-search iterations

    def tree_flatten(self):
        return ((self.codes, self.indptr, self.sorted_cols),
                (self.n_cols, self.search_depth))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def contains(self, rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
        """Vectorised membership test; any shape, returns bool of same shape."""
        if self.codes is not None:
            q = rows.astype(jnp.int32) * jnp.int32(self.n_cols) + cols.astype(jnp.int32)
            # method='sort' (one co-sort of codes+queries) is ~4x faster on TPU
            # than the default sequential binary-search scan (5.2 vs 23 ms for
            # Yelp-sized inputs) — the sort is parallel, the scan's log2(nnz)
            # dependent gathers are not
            idx = jnp.searchsorted(self.codes, q.ravel(), method="sort")
            idx = jnp.clip(idx, 0, self.codes.shape[0] - 1)
            return (self.codes[idx] == q.ravel()).reshape(q.shape)
        rows = rows.astype(jnp.int32)
        q = cols.astype(jnp.int32)
        lo = self.indptr[rows]
        end = self.indptr[rows + 1]
        hi = end
        nnz = self.sorted_cols.shape[0]
        # lower_bound over [lo, hi): static unrolled loop, depth ⌈log2(max_deg+1)⌉
        for _ in range(self.search_depth):
            mid = (lo + hi) // 2
            v = self.sorted_cols[jnp.minimum(mid, nnz - 1)]
            go_right = (v < q) & (mid < hi)
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        return (lo < end) & (self.sorted_cols[jnp.minimum(lo, nnz - 1)] == q)


def build_edge_set(mat: sp.spmatrix) -> "EdgeSet":
    coo = mat.tocoo()
    if int(coo.shape[0]) * int(coo.shape[1]) < 2**31:
        codes = np.sort(coo.row.astype(np.int64) * coo.shape[1]
                        + coo.col.astype(np.int64)).astype(np.int32)
        return EdgeSet(codes=jnp.asarray(codes), indptr=None, sorted_cols=None,
                       n_cols=int(coo.shape[1]), search_depth=0)
    csr = mat.tocsr()
    csr.sort_indices()
    max_deg = int(np.diff(csr.indptr).max(initial=0))
    depth = max(int(np.ceil(np.log2(max_deg + 1))), 1)
    return EdgeSet(codes=None,
                   indptr=jnp.asarray(csr.indptr.astype(np.int32)),
                   sorted_cols=jnp.asarray(csr.indices.astype(np.int32)),
                   n_cols=int(coo.shape[1]), search_depth=depth)


class PaddedRows(NamedTuple):
    """Per-row column lists padded to a fixed width (static-shape 'ragged' rows).

    Used for history masking in eval and ground-truth label lookup: the reference's
    variable-length ``user_pos_lists`` / ``user_history_lists``
    (``trainer/metrics.py:110-135``) become a dense ``[n_rows, width]`` int32 array
    with an accompanying validity mask and per-row lengths.
    """

    cols: jnp.ndarray    # int32 [n_rows, width], padded with 0
    mask: jnp.ndarray    # bool  [n_rows, width]
    lengths: jnp.ndarray  # int32 [n_rows]


def build_padded_rows(mat: sp.spmatrix, width: int | None = None) -> PaddedRows:
    from sslrec_tpu import native

    csr = mat.tocsr()
    lengths = np.diff(csr.indptr).astype(np.int32)
    if width is None:
        width = max(int(lengths.max(initial=0)), 1)
    cols, mask, lengths = native.padded_rows(csr.indptr, csr.indices, width)
    return PaddedRows(jnp.asarray(cols), jnp.asarray(mask), jnp.asarray(lengths))
