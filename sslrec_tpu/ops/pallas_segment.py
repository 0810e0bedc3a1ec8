"""Scatter-free segment ops on the blocked-matmul layout (core kernel #2).

``jax.ops.segment_sum``/``segment_max`` lower to scatter ops, which TPUs
execute (near-)serially — they dominate the KG family's RGAT step
(``torch_scatter.scatter_{softmax,sum}`` in the reference,
``models/kg/kgcl.py:67-70``, ``kgrec.py``, ``kgin.py``).  This module routes
segment reductions through the same chunked one-hot-matmul kernel as
``ops/pallas_spmm`` (sum → MXU matmul chain; max → a VPU masked-max variant),
and pairs them with a gather whose *backward* is the blocked reduction — so a
whole message-passing hop (gather endpoints → per-edge work → segment reduce)
carries no scatter in either direction:

    fwd:  take(bs, x) = x[ids]               bwd:  blocked one-hot reduction
    fwd:  seg_sum(bs, data) = blocked matmul  bwd:  g[ids] gather

Build one :class:`BlockedSegments` per constant index array (e.g. KG heads and
tails) at model-init time; all ops reuse it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.ops.pallas_spmm import (BlockedGraph, _blocked_matvec,
                                        _pl, make_blocked)

_R = 256
_M = 512


class BlockedSegments(NamedTuple):
    """Chunked layout for reductions over a constant ``segment_ids`` array.

    ``bg``: blocked layout with rows = sorted segment ids, cols = original
    positions (``bg.vals`` is the 0/1 live mask).
    ``segment_ids``: [n] original-order ids — drives the backward gathers.
    """

    bg: BlockedGraph
    segment_ids: jnp.ndarray
    num_segments: int
    n: int


def maybe_blocked_segments(segment_ids, num_segments: int,
                           use: bool | None = None,
                           r: int = _R, m: int = _M) -> BlockedSegments | None:
    """Build the blocked layout when the scatter-free path should be used.

    Defaults ON for the TPU backend (scatters there are the pathology this
    module exists to avoid); ``SSLREC_USE_PALLAS=0/1`` force-overrides, like
    ``pallas_spmm.maybe_pallas``.  Returns ``None`` when the caller should use
    the plain ``jax.ops.segment_*`` path (CPU tests etc.).
    """
    from sslrec_tpu.ops.pallas_spmm import resolve_use

    if not resolve_use(use, default=True):
        return None
    return build_blocked_segments(np.asarray(jax.device_get(segment_ids)),
                                  num_segments, r, m)


def build_blocked_segments(segment_ids: np.ndarray, num_segments: int,
                           r: int = _R, m: int = _M) -> BlockedSegments:
    """Host-side build (once per constant index array)."""
    segment_ids = np.asarray(segment_ids, np.int64)
    n = segment_ids.shape[0]
    order = np.argsort(segment_ids, kind="stable")
    bg = make_blocked(segment_ids[order], order.astype(np.int64),
                      np.ones(n, np.float32), num_segments, r, m)
    return BlockedSegments(bg=bg,
                           segment_ids=jnp.asarray(segment_ids, jnp.int32),
                           num_segments=int(num_segments), n=int(n))


# -- segment sum ------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def segment_sum_blocked(bs: BlockedSegments, data: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """``out[s] = Σ_{i: ids[i]=s} data[i]``; ``data`` is [n] or [n, d].

    Forward: chunked one-hot matmuls (no scatter).  Backward:
    ``d_data = g[ids]`` (a gather — the transpose of a segment sum).
    """
    squeeze = data.ndim == 1
    d2 = data[:, None] if squeeze else data
    contrib = d2[bs.bg.cols] * bs.bg.vals[:, None]
    out = _blocked_matvec(bs.bg, contrib, interpret)[: bs.num_segments]
    return out[:, 0] if squeeze else out


def _sum_fwd(bs, data, interpret):
    return segment_sum_blocked(bs, data, interpret), None


def _sum_bwd(bs, interpret, _, g):
    # transpose of a segment sum is a gather — shape-agnostic ([S]→[n] or
    # [S,d]→[n,d])
    return (g[bs.segment_ids],)


segment_sum_blocked.defvjp(_sum_fwd, _sum_bwd)


# -- gather with scatter-free backward --------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def take_blocked(bs: BlockedSegments, x: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """``x[ids]`` whose backward is the blocked segment sum instead of the
    scatter-add XLA derives for a plain gather.  ``x``: [num_segments, d]."""
    return x[bs.segment_ids]


def _take_fwd(bs, x, interpret):
    return x[bs.segment_ids], None


def _take_bwd(bs, interpret, _, g):
    return (segment_sum_blocked(bs, g, interpret),)


take_blocked.defvjp(_take_fwd, _take_bwd)


# -- segment max (stabilisation; non-differentiable by design) --------------


def _segmax_kernel(owners_ref, lrows_ref, vals_ref, out_hbm, acc_ref,
                   copy_sem):
    """Per-chunk masked max into a VMEM scratch accumulator; one DMA per
    owner (same rationale as ``pallas_spmm._spmm_kernel``: a data-dependent
    out BlockSpec round-trips the block through HBM every step)."""
    pl = _pl()
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    n = pl.num_programs(0)
    r = acc_ref.shape[0]
    m = lrows_ref.shape[-1]

    owner = owners_ref[i]
    is_first = jnp.logical_or(i == 0, owner != owners_ref[jnp.maximum(i - 1, 0)])
    is_last = jnp.logical_or(
        i == n - 1, owners_ref[jnp.minimum(i + 1, n - 1)] != owner)

    lrows = lrows_ref[0, 0, :]                                # [M]
    vals = vals_ref[0, 0, :]                                  # [M]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (r, m), 0)  # [R, M]
    masked = jnp.where(row_ids == lrows[None, :], vals[None, :],
                       jnp.float32(-jnp.inf))
    upd = jnp.max(masked, axis=1)                             # [R]
    upd = jnp.broadcast_to(upd[:, None], (r, 128))            # lane tile

    @pl.when(is_first)
    def _():
        acc_ref[...] = upd

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[...] = jnp.maximum(acc_ref[...], upd)

    @pl.when(is_last)
    def _():
        cp = pltpu.make_async_copy(
            acc_ref, out_hbm.at[pl.ds(owner * r, r)], copy_sem)
        cp.start()
        cp.wait()


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def segment_max_blocked(bs: BlockedSegments, data: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """``out[s] = max_i data[i]`` over each segment; empty segments → -inf.

    ``data``: [n] float32.  Gradient is defined as ZERO (a custom VJP, so
    autodiff never traces into the kernel): the op exists for softmax
    stabilisation, where treating the shift as constant is exact.
    """
    return _segment_max_impl(bs, data, interpret)


def _max_fwd(bs, data, interpret):
    return _segment_max_impl(bs, data, interpret), None


def _max_bwd(bs, interpret, _, g):
    return (jnp.zeros((bs.n,), jnp.float32),)


segment_max_blocked.defvjp(_max_fwd, _max_bwd)


def _segment_max_impl(bs: BlockedSegments, data: jnp.ndarray,
                      interpret: bool) -> jnp.ndarray:
    pl = _pl()
    from jax.experimental.pallas import tpu as pltpu

    bg = bs.bg
    vals = jnp.where(bg.vals > 0, data[bg.cols], -jnp.inf)
    vals = vals.reshape(bg.n_chunks, 1, bg.m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bg.n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, bg.m), lambda i, owners: (i, 0, 0)),
            pl.BlockSpec((1, 1, bg.m), lambda i, owners: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.VMEM((bg.r, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _segmax_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bg.n_rows_pad, 128), jnp.float32),
        interpret=interpret,
    )(bg.owners, bg.local_rows, vals)
    return jax.lax.stop_gradient(out[: bs.num_segments, 0])


# -- segment softmax --------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2))
def segment_softmax_blocked(bs: BlockedSegments, logits: jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """Numerically-stable softmax within segments, scatter-free both ways.

    Backward uses the closed form ``ds = s ⊙ (g − Σ_seg(g ⊙ s))`` so the
    only segment reduction is another blocked sum (no scatter from the
    denominator-gather transpose).
    """
    mx = segment_max_blocked(bs, logits, interpret)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)     # empty segments
    shifted = jnp.exp(logits - mx[bs.segment_ids])
    denom = segment_sum_blocked(bs, shifted, interpret)
    return shifted / (denom[bs.segment_ids] + 1e-16)


def _softmax_fwd(bs, logits, interpret):
    s = segment_softmax_blocked(bs, logits, interpret)
    return s, s


def _softmax_bwd(bs, interpret, s, g):
    dot = segment_sum_blocked(bs, s * g, interpret)
    return (s * (g - dot[bs.segment_ids]),)


segment_softmax_blocked.defvjp(_softmax_fwd, _softmax_bwd)


# -- fused attention aggregation --------------------------------------------


def attn_aggregate(bs: BlockedSegments, logits: jnp.ndarray,
                   values: jnp.ndarray, edge_mask: jnp.ndarray | None = None,
                   interpret: bool = False):
    """Softmax(logits within segments) · values, in ONE blocked reduction.

    Equivalent to ``segment_softmax(logits) * mask`` followed by a weighted
    segment sum of ``values``, but the numerator and denominator ride the same
    [n, d+1] reduction — saving the separate d=1 denominator pass and its
    per-edge gather.  Returns ``(aggregated [S, d], e [n])`` where ``e`` is the
    (masked, unnormalised) exp weights for callers that reuse them.
    """
    mx = segment_max_blocked(bs, logits, interpret)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    e = jnp.exp(logits - mx[bs.segment_ids])
    if edge_mask is not None:
        e = e * edge_mask
    stacked = jnp.concatenate([values * e[:, None], e[:, None]], axis=-1)
    num_den = segment_sum_blocked(bs, stacked, interpret)
    return num_den[:, :-1] / (num_den[:, -1:] + 1e-16), e


# -- small-vocab gather as one-hot matmul -----------------------------------


class OneHotTake:
    """``table[ids]`` for a SMALL vocab via a precomputed one-hot matmul.

    TPU gathers are per-row latency-bound (~10 ns/row: a 600k-edge relation
    gather costs ~6 ms); the same fetch as ``onehot [n, V] @ table [V, d]``
    is MXU/bandwidth-bound (~0.1 ms for V≈41).  One-hot entries are exact in
    f32, so values are bit-identical to the gather, and XLA transposes the
    matmul for the backward — the scatter-add a gather's VJP would emit
    becomes ``onehotᵀ @ g``.  Memory: n·V·4 bytes — only use for small V.
    """

    def __init__(self, ids, vocab: int, use: bool | None = None):
        from sslrec_tpu.ops.pallas_spmm import resolve_use

        self.ids = jnp.asarray(jax.device_get(ids), jnp.int32)
        self.onehot = None
        if resolve_use(use, default=True):
            self.onehot = jax.nn.one_hot(self.ids, vocab, dtype=jnp.float32)

    def take(self, table: jnp.ndarray) -> jnp.ndarray:
        if self.onehot is not None:
            # HIGHEST keeps the f32 table exact (one-hot rows are exact in any
            # precision; default MXU bf16 would round the values ~2^-8)
            return jax.lax.dot(self.onehot, table,
                               precision=jax.lax.Precision.HIGHEST)
        return table[self.ids]


# -- per-index-array op bundle ----------------------------------------------


class SegmentOps:
    """take/sum/softmax/mean bound to ONE constant index array.

    On TPU (default) these route through the blocked scatter-free kernels; on
    CPU (or ``SSLREC_USE_PALLAS=0``) they fall back to ``jax.ops.segment_*`` /
    plain gathers, so the same model code runs everywhere.  Use for the
    edge-endpoint gathers and segment reductions of message passing — the
    backward of each is the (de-scattered) transpose of the other.
    """

    def __init__(self, segment_ids, num_segments: int, use: bool | None = None):
        self.ids = jnp.asarray(jax.device_get(segment_ids), jnp.int32)
        self.num_segments = int(num_segments)
        self.bs = maybe_blocked_segments(self.ids, self.num_segments, use)

    def take(self, x: jnp.ndarray) -> jnp.ndarray:
        """``x[ids]`` with a blocked-reduction backward (no scatter)."""
        if self.bs is not None:
            return take_blocked(self.bs, x)
        return x[self.ids]

    def sum(self, data: jnp.ndarray) -> jnp.ndarray:
        if self.bs is not None:
            return segment_sum_blocked(self.bs, data)
        return jax.ops.segment_sum(data, self.ids,
                                   num_segments=self.num_segments)

    def softmax(self, logits: jnp.ndarray) -> jnp.ndarray:
        if self.bs is not None:
            return segment_softmax_blocked(self.bs, logits)
        from sslrec_tpu.ops.segment import segment_softmax
        return segment_softmax(logits, self.ids, self.num_segments)

    def mean(self, data: jnp.ndarray) -> jnp.ndarray:
        s = self.sum(data)
        ones = jnp.ones(data.shape[:1], dtype=data.dtype)
        cnt = self.sum(ones)
        return s / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (data.ndim - 1)]

    def attn(self, logits: jnp.ndarray, values: jnp.ndarray,
             edge_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """Segment-softmax-weighted aggregation of ``values`` (fused path)."""
        if self.bs is not None:
            out, _ = attn_aggregate(self.bs, logits, values, edge_mask)
            return out
        from sslrec_tpu.ops.segment import segment_softmax
        e = segment_softmax(logits, self.ids, self.num_segments)
        if edge_mask is not None:
            e = e * edge_mask
        return jax.ops.segment_sum(values * e[:, None], self.ids,
                                   num_segments=self.num_segments)
