"""Graph/feature augmentations as pure functions of a PRNG key.

The reference implements these as stateful ``nn.Module``s that materialise new
sparse tensors with data-dependent nnz (``models/aug_utils.py``).  Under XLA that
is shape-hostile, so every augmentation here keeps **static shapes**: edge dropout
returns a 0/1 edge-weight vector instead of a smaller edge list, node dropout a
row mask, etc.  Functionally equivalent (dropped edges contribute exactly zero to
the propagation) and fully jittable/differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.ops.sparse import CooGraph
from sslrec_tpu.ops.segment import segment_sum


def edge_drop_mask(key: jax.Array, nnz: int, keep_rate: float,
                   resize_val: bool = False) -> jnp.ndarray:
    """Bernoulli(keep_rate) edge mask ``[nnz]``; multiply into ``g.vals``.

    Parity with ``aug_utils.EdgeDrop`` (``models/aug_utils.py:11-31``):
    ``floor(U + keep_rate)`` keeps each edge with prob ``keep_rate``; optional
    1/keep_rate value rescale.
    """
    if keep_rate >= 1.0:
        return jnp.ones((nnz,), jnp.float32)
    keep = jnp.floor(jax.random.uniform(key, (nnz,)) + keep_rate)
    return keep / keep_rate if resize_val else keep


def edge_drop(key: jax.Array, g, keep_rate: float, resize_val: bool = False,
              salts=0):
    """Graph-aware edge dropout multiplier for :func:`ops.spmm.spmm`.

    For a PallasGraph returns a :class:`PaddedEdgeWeight` — masks recomputed
    per layout via a PRF of the edge id (no scalar gathers, see
    ``ops/pallas_spmm.dropout_padded``).  For the XLA CooGraph path returns the
    original-order ``[nnz]`` mask (or ``[len(salts), nnz]``).  Returns ``None``
    when ``keep_rate >= 1`` (no-op).
    """
    from sslrec_tpu.ops.pallas_spmm import PallasGraph, dropout_padded

    if keep_rate >= 1.0:
        return None
    if isinstance(g, PallasGraph):
        return dropout_padded(key, g, keep_rate, salts=salts,
                              resize_val=resize_val)
    if jnp.ndim(salts) == 0:
        return edge_drop_mask(key, g.nnz, keep_rate, resize_val)
    keys = jax.random.split(key, int(jnp.shape(salts)[0]))
    return jnp.stack([edge_drop_mask(k, g.nnz, keep_rate, resize_val)
                      for k in keys])


def node_drop(key: jax.Array, embeds: jnp.ndarray, keep_rate: float) -> jnp.ndarray:
    """Zero whole node rows with prob 1-keep_rate (``aug_utils.py:33-50``)."""
    if keep_rate >= 1.0:
        return embeds
    mask = jnp.floor(jax.random.uniform(key, (embeds.shape[0], 1)) + keep_rate)
    return embeds * mask


def embed_dropout(key: jax.Array, embeds: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Standard inverted dropout on embeddings (``aug_utils.EmbedDrop``)."""
    if rate <= 0.0:
        return embeds
    keep = jax.random.bernoulli(key, 1.0 - rate, embeds.shape)
    return jnp.where(keep, embeds / (1.0 - rate), 0.0)


def embed_perturb(key: jax.Array, embeds: jnp.ndarray, eps: float) -> jnp.ndarray:
    """SimGCL sign-aligned noise (``aug_utils.py:118-132``).

    Noise = row-L2-normalised U[0,1) noise, aligned to sign(embeds), scaled eps.
    """
    noise = jax.random.uniform(key, embeds.shape)
    noise = noise / jnp.sqrt(jnp.sum(jnp.square(noise), axis=-1, keepdims=True) + 1e-12)
    return embeds + noise * jnp.sign(embeds) * eps


def adaptive_mask(g: CooGraph, head_embeds: jnp.ndarray,
                  tail_embeds: jnp.ndarray) -> jnp.ndarray:
    """DCCF learned edge re-weighting (``aug_utils.AdaptiveMask``, ``:52-80``).

    Per-edge alpha = (cos(head, tail)+1)/2, then row-normalised by the alpha-degree.
    Returns the new edge values ``[nnz]`` for the same static edge list (the
    reference builds a new torch_sparse tensor; we reuse ``g``'s indices).
    """
    hn = head_embeds / jnp.sqrt(jnp.sum(jnp.square(head_embeds), -1, keepdims=True) + 1e-12)
    tn = tail_embeds / jnp.sqrt(jnp.sum(jnp.square(tail_embeds), -1, keepdims=True) + 1e-12)
    alpha = (jnp.sum(hn[g.rows] * tn[g.cols], axis=-1) + 1.0) / 2.0
    deg = segment_sum(alpha, g.rows, g.n_rows)
    d_inv = jnp.where(deg > 0, 1.0 / deg, 0.0)
    return d_inv[g.rows] * alpha


def kmeans(key: jax.Array, embeds: jnp.ndarray, cluster_num: int,
           iters: int = 100):
    """Pure-JAX Lloyd's KMeans (NCL prototypes / ICLRec intents).

    Replaces both the reference's torch loop (``aug_utils.py:134-157``, 1000
    fixed iterations from random U[0,1) centroids) and faiss KMeans
    (``models/sequential/iclrec.py:79-137``).  Runs under jit via ``lax.fori_loop``
    with chunked distance computation.
    Returns (centroids [C, d], assignment [N], cluster_sizes [C, 1]).
    """
    # init from sampled data points (faiss-style), NOT U[0,1): encoder outputs
    # are zero-centred, so uniform-cube centroids capture no points — nearly
    # every cluster came up empty and collapsed to the origin, which made the
    # ICLRec/NCL prototype-CL terms noise (the round-1 quality gap on both).
    pick = jax.random.choice(key, embeds.shape[0], (cluster_num,),
                             replace=embeds.shape[0] < cluster_num)
    centroids0 = embeds[pick]

    def assign(cents):
        # ||x - c||² = ||x||² - 2 x·c + ||c||²; argmin over c (MXU-friendly).
        xc = embeds @ cents.T
        c_sq = jnp.sum(jnp.square(cents), axis=-1)
        return jnp.argmin(c_sq[None, :] - 2.0 * xc, axis=-1)

    def body(_, cents):
        idx = assign(cents)
        sums = jax.ops.segment_sum(embeds, idx, num_segments=cluster_num)
        cnts = jax.ops.segment_sum(jnp.ones((embeds.shape[0],), embeds.dtype), idx,
                                   num_segments=cluster_num)
        # empty clusters keep their previous centroid instead of drifting to 0
        return jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts[:, None], 1.0),
                         cents)

    centroids = jax.lax.fori_loop(0, iters, body, centroids0)
    idx = assign(centroids)
    cnts = jax.ops.segment_sum(jnp.ones((embeds.shape[0], 1), embeds.dtype), idx,
                               num_segments=cluster_num)
    return centroids, idx, cnts


def svd_decompose(key: jax.Array, g: CooGraph, q: int, n_iter: int = 4):
    """Randomised low-rank SVD of a sparse matrix (LightGCL's
    ``t.svd_lowrank`` replacement, ``aug_utils.py:82-98``).

    Halko-style subspace iteration using only spmm against the sparse operator —
    runs on device, one-shot at model init.
    Returns (ut [q, m], vt [q, n], u_mul_s [m, q], v_mul_s [n, q]).
    """
    from sslrec_tpu.ops.spmm import spmm, spmm_t

    m, n = g.n_rows, g.n_cols
    omega = jax.random.normal(key, (n, q + 8), jnp.float32)
    y = spmm(g, omega)
    for _ in range(n_iter):
        y, _ = jnp.linalg.qr(y)
        z = spmm_t(g, y)
        z, _ = jnp.linalg.qr(z)
        y = spmm(g, z)
    qmat, _ = jnp.linalg.qr(y)          # [m, q+8]
    b = spmm_t(g, qmat).T               # [q+8, n]
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = (qmat @ ub)[:, :q]
    s = s[:q]
    v = vt[:q, :].T
    return u.T, v.T, u * s[None, :], v * s[None, :]
