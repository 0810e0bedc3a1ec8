"""Pallas TPU kernel for sparse-matrix × dense-matrix (core kernel #1, SURVEY §7).

Why not XLA scatter: ``jax.ops.segment_sum`` lowers to scatter-add, which TPUs
execute (near-)serially — measured ~23 ms/step for LightGCN/Yelp where the math
is sub-millisecond.  This kernel reformulates the sorted segment-sum as a chain
of small MXU matmuls with *no scatter anywhere*:

Host-side (once per graph), edges sorted by destination row are grouped into
row-blocks of ``R`` rows, and each row-block's edge list is padded to a multiple
of the chunk size ``M``; chunks therefore never straddle row-blocks.  On device:

    contrib[e] = vals[e] * x[cols[e]]                (XLA gather — fast on TPU)
    for each chunk c (sequential TPU grid):
        onehot[R, M] = (local_rows[c] == iota_R)     (VPU compare)
        out[owner[c]] (+)= onehot @ contrib[c]       (MXU matmul)

Consecutive chunks hit the same output block (edges sorted), so the accumulator
stays resident in VMEM; the block is zeroed on first visit (``owner`` changes).
``owner`` indices arrive via scalar prefetch and drive the output BlockSpec
index_map.  The backward pass is the same kernel on the transposed graph
(dx = Aᵀ·g) plus a gather-dot for edge-weight gradients — still scatter-free.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.ops.sparse import CooGraph

# Default tile sizes: R rows per output block, M edges per chunk.
_R = 256
_M = 512


class BlockedGraph(NamedTuple):
    """Host-precomputed chunked/padded edge layout for one propagation direction.

    ``cols``: [n_chunks*M] source node (0 for padding; padding vals are 0)
    ``vals``: [n_chunks*M] edge weight (0 for padding)
    ``edge_ids``: [n_chunks*M] original edge index (0 for padding) — lets a
        per-edge multiplier defined on the *original* edge order (dropout masks,
        learned gates) be gathered into the padded layout
    ``local_rows``: [n_chunks, M] destination row within its block (R ⇒ padding,
        matches nothing in the iota compare)
    ``owners``: [n_chunks] output row-block index of each chunk
    ``n_rows_pad``: padded row count (n_blocks * R)
    """

    cols: jnp.ndarray
    vals: jnp.ndarray
    edge_ids: jnp.ndarray
    local_rows: jnp.ndarray
    owners: jnp.ndarray
    n_rows: int
    n_rows_pad: int
    n_chunks: int
    r: int
    m: int


def make_blocked(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                 n_rows: int, r: int = _R, m: int = _M,
                 edge_id_map: np.ndarray | None = None) -> BlockedGraph:
    """Build the chunked layout from row-sorted COO arrays (host numpy, once).

    Fully vectorised: each edge's destination slot is computed from its position
    within its row-block's edge span, then scattered in one shot.
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    assert (np.diff(rows) >= 0).all(), "edges must be sorted by destination row"
    n_blocks = max(-(-n_rows // r), 1)
    block_of_edge = rows // r
    # within each destination row-block, order edges by SOURCE column: the
    # only consumer of edge order inside a block is the one-hot compare (any
    # order works), but the XLA-side x[cols] gather is HBM-latency-bound on
    # random row patterns — ascending cols within each chunk turn it into
    # near-sequential reads (measured 1.97 ms → sub-ms on the Yelp bi-adj)
    order = np.lexsort((cols, block_of_edge))
    rows, cols, vals = rows[order], cols[order], vals[order]
    if edge_id_map is None:
        edge_id_map = order
    else:
        edge_id_map = np.asarray(edge_id_map)[order]
    counts = np.bincount(block_of_edge, minlength=n_blocks)
    chunks_per_block = np.maximum(-(-counts // m), 1)
    n_chunks = int(chunks_per_block.sum())

    estart = np.concatenate([[0], np.cumsum(counts)])[:-1]          # per block
    chunk_base = np.concatenate([[0], np.cumsum(chunks_per_block)])[:-1]
    within = np.arange(rows.shape[0]) - estart[block_of_edge]
    dest = (chunk_base[block_of_edge] + within // m) * m + within % m

    p_cols = np.zeros((n_chunks * m,), np.int32)
    p_vals = np.zeros((n_chunks * m,), np.float32)
    p_eids = np.zeros((n_chunks * m,), np.int32)
    p_lrows = np.full((n_chunks * m,), r, np.int32)
    p_cols[dest] = cols
    p_vals[dest] = vals
    eids = np.arange(rows.shape[0], dtype=np.int32)
    if edge_id_map is not None:  # map positions back to an original edge order
        eids = np.asarray(edge_id_map, np.int32)[eids]
    p_eids[dest] = eids
    p_lrows[dest] = rows - block_of_edge * r
    owners = np.repeat(np.arange(n_blocks, dtype=np.int32), chunks_per_block)

    return BlockedGraph(
        cols=jnp.asarray(p_cols), vals=jnp.asarray(p_vals),
        edge_ids=jnp.asarray(p_eids),
        # [n_chunks, 1, M]: TPU-tileable block (1, 1, M)
        local_rows=jnp.asarray(p_lrows.reshape(n_chunks, 1, m)),
        owners=jnp.asarray(owners),
        n_rows=int(n_rows), n_rows_pad=n_blocks * r,
        n_chunks=n_chunks, r=r, m=m)


def _spmm_kernel(owners_ref, lrows_ref, contrib_ref, out_hbm, acc_ref,
                 copy_sem, *, d: int, r: int):
    """One chunk: acc (+)= onehot(local_rows) @ contrib; DMA acc→HBM on the
    owner's last chunk.

    Lane packing (pack = 128//d): a ``[*, d]`` f32 tile with d<128 wastes
    (128-d) lanes in every sublane, so un-packed layouts move 4x the useful
    bytes at d=32.  Both the contrib block (``[M/pack, pack*d]``, edge
    pack*e+k at lanes [k*d,(k+1)*d)) and the accumulator/output
    (``[R/pack, pack*d]``, node pack*q+g at lanes [g*d,(g+1)*d)) are packed;
    the matmul splits into pack x pack lane-sliced sub-matmuls.  The packed
    output is a row-major reinterpretation, so the caller's
    ``out.reshape(n_rows_pad, d)`` is layout-free.

    The accumulator lives in VMEM scratch and is written to HBM ONCE per
    owner: routing it through an out BlockSpec with a data-dependent
    index_map made Mosaic round-trip the block through HBM on every step
    (consecutive same-owner chunks serialize on that RAW dependency —
    measured as a flat ~1.7-2.9 ms kernel floor regardless of tile shape).
    """
    import jax.lax as lax

    pl = _pl()
    pltpu = _pltpu()
    i = pl.program_id(0)
    n = pl.num_programs(0)
    pack = lrows_ref.shape[1]
    mp = contrib_ref.shape[0]  # M // pack
    rq = r // pack             # packed accumulator sublanes

    owner = owners_ref[i]
    is_first = jnp.logical_or(i == 0, owner != owners_ref[jnp.maximum(i - 1, 0)])
    is_last = jnp.logical_or(
        i == n - 1, owners_ref[jnp.minimum(i + 1, n - 1)] != owner)

    base = pack * lax.broadcasted_iota(jnp.int32, (rq, mp), 0)  # pack*q
    # HIGHEST precision by default: exact f32 accumulate (default MXU bf16
    # 3-pass loses ~2^-8 relative on the gathered values).  The one-hot matrix
    # is exact in bf16, so SSLREC_PALLAS_PRECISION=default trades that mantissa
    # loss for fewer MXU passes when the matmul (not grid overhead) dominates.
    exact = (_mxu_precision() is jax.lax.Precision.HIGHEST
             and contrib_ref.dtype == jnp.float32)
    groups = []
    for g in range(pack):  # output lane group: nodes with local row % pack == g
        u = jnp.zeros((rq, d), jnp.float32)
        for k in range(pack):  # contrib lane group: edges pack*e + k
            lrows = lrows_ref[0, k, :]                    # [M/pack]
            c = contrib_ref[:, k * d:(k + 1) * d]
            if exact:
                # The one-hot matrix is EXACT in bf16, so f32 precision needs
                # only a 3-way mantissa split of the contrib side (3 one-pass
                # bf16 MXU matmuls recover all 24 mantissa bits, f32 accum)
                # instead of Precision.HIGHEST's 6-pass both-sides split.
                onehot = (base + g == lrows[None, :]).astype(jnp.bfloat16)
                c0 = c.astype(jnp.bfloat16)
                res1 = c - c0.astype(jnp.float32)
                c1 = res1.astype(jnp.bfloat16)
                c2 = (res1 - c1.astype(jnp.float32)).astype(jnp.bfloat16)
                for part in (c0, c1, c2):
                    u = u + jax.lax.dot(onehot, part,
                                        preferred_element_type=jnp.float32)
            else:
                onehot = (base + g == lrows[None, :]).astype(contrib_ref.dtype)
                u = u + jax.lax.dot(
                    onehot, c,
                    precision=_mxu_precision(),
                    preferred_element_type=jnp.float32)
        groups.append(u)
    if acc_ref.shape[-1] > pack * d:  # lane-alignment padding (see caller)
        groups.append(jnp.zeros((rq, acc_ref.shape[-1] - pack * d),
                                jnp.float32))
    update = groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=1)

    @pl.when(is_first)
    def _():
        acc_ref[...] = update

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[...] = acc_ref[...] + update

    @pl.when(is_last)
    def _():
        cp = pltpu.make_async_copy(
            acc_ref, out_hbm.at[pl.ds(owner * rq, rq)], copy_sem)
        cp.start()
        # wait before the next owner's first accumulation reuses the scratch
        cp.wait()


@functools.lru_cache(maxsize=1)
def _mxu_precision():
    import os
    mode = os.environ.get("SSLREC_PALLAS_PRECISION", "highest").lower()
    return (jax.lax.Precision.DEFAULT if mode == "default"
            else jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=1)
def _pl():
    from jax.experimental import pallas as pl
    return pl


@functools.lru_cache(maxsize=1)
def _pltpu():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu


def _blocked_matvec(bg: BlockedGraph, contrib: jnp.ndarray,
                    interpret: bool) -> jnp.ndarray:
    """Run the chunked reduction kernel; contrib is [n_chunks*M, d] padded."""
    pl = _pl()
    pltpu = _pltpu()
    d = contrib.shape[-1]
    pack = 128 // d if 128 % d == 0 else 1
    # Mosaic sublane alignment: block sublane dims (M/pack, R/pack) must stay
    # multiples of 8 — clamp (d=1 degree-sum reductions would want pack=128)
    while pack > 1 and not (bg.m % pack == 0 and bg.r % pack == 0
                            and (bg.m // pack) % 8 == 0
                            and (bg.r // pack) % 8 == 0):
        pack //= 2
    mp = bg.m // pack
    rq = bg.r // pack
    # lane-pack: [chunks*M, d] -> [chunks*M/pack, pack*d]; the reshape is a
    # relayout XLA fuses into the producer gather's write (measured free)
    contrib = contrib.reshape(bg.n_chunks * mp, pack * d)
    # Mosaic scratch/DMA lane alignment: pad odd widths (e.g. the fused
    # attention's d+1 stack) up to a 128 multiple; pack>1 is already 128.
    dk = pack * d
    d_pad = -(-dk // 128) * 128
    if d_pad != dk:
        contrib = jnp.pad(contrib, ((0, 0), (0, d_pad - dk)))
    # local rows regrouped so sub-matmul k sees edges pack*e+k: [chunks, pack, M/pack]
    lrows = bg.local_rows.reshape(bg.n_chunks, mp, pack).swapaxes(1, 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bg.n_chunks,),
        in_specs=[
            pl.BlockSpec((1, pack, mp), lambda i, owners: (i, 0, 0)),
            pl.BlockSpec((mp, d_pad), lambda i, owners: (i, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.VMEM((rq, d_pad), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, d=d, r=bg.r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bg.n_rows_pad // pack, d_pad),
                                       jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bg.n_chunks * bg.r * bg.m * d,
            bytes_accessed=contrib.size * contrib.dtype.itemsize
            + bg.n_rows_pad * d * 4,
            transcendentals=0),
    )(bg.owners, lrows, contrib)
    if d_pad != dk:  # drop the alignment padding lanes first
        out = out[:, :dk]
    # packed rows are a row-major reinterpretation: reshape is layout-free
    return out.reshape(bg.n_rows_pad, d)[: bg.n_rows]


class PallasGraph(NamedTuple):
    """Forward + transpose blocked layouts for a sparse operator."""

    fwd: BlockedGraph
    bwd: BlockedGraph  # transpose direction (dx = Aᵀ g)
    # original row-sorted edge arrays (for edge-weight gradients)
    rows: jnp.ndarray
    cols: jnp.ndarray
    vals: jnp.ndarray
    n_rows: int
    n_cols: int

    @property
    def nnz(self) -> int:
        return self.rows.shape[0]


def build_pallas_graph_host(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                            n_rows: int, n_cols: int,
                            r: int = _R, m: int = _M) -> PallasGraph:
    """Build from host numpy COO arrays (row-sorted). Never touches the device
    for layout computation — critical when the TPU is behind a slow tunnel
    (device→host fetches were measured at ~70s/MB)."""
    order0 = np.lexsort((cols, rows))
    rows, cols, vals = rows[order0], cols[order0], vals[order0]
    fwd = make_blocked(rows, cols, vals, n_rows, r, m)
    order = np.lexsort((rows, cols))
    bwd = make_blocked(cols[order], rows[order], vals[order], n_cols, r, m,
                       edge_id_map=order)
    return PallasGraph(fwd=fwd, bwd=bwd,
                       rows=jnp.asarray(rows, dtype=jnp.int32),
                       cols=jnp.asarray(cols, dtype=jnp.int32),
                       vals=jnp.asarray(vals, dtype=jnp.float32),
                       n_rows=int(n_rows), n_cols=int(n_cols))


def build_pallas_graph(g: CooGraph, r: int = _R, m: int = _M) -> PallasGraph:
    # one batched device→host fetch (avoid when host arrays are available —
    # use build_pallas_graph_host instead)
    rows, cols, vals = jax.device_get((g.rows, g.cols, g.vals))
    return build_pallas_graph_host(np.asarray(rows), np.asarray(cols),
                                   np.asarray(vals), g.n_rows, g.n_cols, r, m)


def maybe_pallas(mat, use: bool | None = None, r: int = _R, m: int = _M):
    """Build the scatter-free Pallas layout for ``mat`` (scipy sparse or
    CooGraph) when requested, else a CooGraph for the XLA segment-sum path.

    ``use=None`` defers to ``SSLREC_USE_PALLAS`` ('1' force on / '0' force
    off); the built-in default is OFF because each Pallas call site costs a
    separate Mosaic compile, and with this environment's remote-compile tunnel
    that scales pathologically for multi-propagation models (SGL's 12 kernel
    instances: >30 min vs ~3 min pure-XLA).  LightGCN-class models opt in via
    ``model.use_pallas`` — the kernel itself is ~2× faster at runtime.
    """
    return _maybe(mat, use, r, m)


def resolve_use(use: bool | None, default: bool) -> bool:
    """One place for the SSLREC_USE_PALLAS=0/1 override ladder: env forces,
    else the caller's ``use``, else ``default`` — and never on non-TPU."""
    import os

    mode = os.environ.get("SSLREC_USE_PALLAS", "")
    if mode == "0":
        use = False
    elif mode == "1":
        use = True
    elif use is None:
        use = default
    return bool(use) and jax.default_backend() == "tpu"


def _maybe(mat, use, r, m):
    import scipy.sparse as sp

    use = resolve_use(use, default=False)
    if sp.issparse(mat):
        if use:
            coo = mat.tocoo()
            return build_pallas_graph_host(
                coo.row.astype(np.int64), coo.col.astype(np.int64),
                coo.data.astype(np.float32), coo.shape[0], coo.shape[1], r, m)
        from sslrec_tpu.ops.sparse import from_scipy
        return from_scipy(mat)
    return build_pallas_graph(mat, r, m) if use else mat


def _contrib(bg: BlockedGraph, x: jnp.ndarray, edge_weight: jnp.ndarray | None):
    """Padded per-edge contributions vals*ew*x[col] (XLA gather + fuse).

    Under ``SSLREC_PALLAS_PRECISION=default`` the gather and kernel input run
    in bfloat16 (half the HBM traffic on the latency-bound gather, 1-pass MXU
    with f32 accumulate) — ~2e-3 relative error; the shipped default stays
    exact f32.
    """
    v = bg.vals
    if edge_weight is not None:
        v = v * edge_weight[bg.edge_ids]
    if _mxu_precision() is jax.lax.Precision.DEFAULT:
        return x.astype(jnp.bfloat16)[bg.cols] * v.astype(jnp.bfloat16)[:, None]
    return x[bg.cols] * v[:, None]


# ---------------------------------------------------------------------------
# Gather-free edge dropout: PRF-addressed masks in each padded layout
# ---------------------------------------------------------------------------
#
# ``edge_weight[bg.edge_ids]`` is a random-pattern scalar gather; on TPU those
# are per-element latency-bound (~7 ms for the bwd layout's 768k-edge
# permutation on Yelp — measured; the bwd edge order is the transpose
# permutation, i.e. effectively random).  A dropout mask doesn't need to be
# materialised in any one order though: it only needs to be a *function of the
# original edge id*, so each layout can recompute its own copy by hashing its
# (constant) ``edge_ids`` array — pure VPU work, no gathers, bit-identical
# mask for the same edge in the forward and transpose layouts.


def _rotl32(x, d):
    return (x << jnp.uint32(d)) | (x >> jnp.uint32(32 - d))


def _threefry2x32(k0, k1, c0, c1):
    """Threefry-2x32 (20 rounds), same schedule as jax.random's bit generator;
    evaluated at arbitrary counter arrays ``c0``/``c1``."""
    rots = ((13, 15, 26, 6), (17, 29, 16, 24))
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(0x1BD11BDA))
    x0 = c0 + ks[0]
    x1 = c1 + ks[1]
    for i in range(5):
        for r in rots[i % 2]:
            x0 = x0 + x1
            x1 = _rotl32(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def _prf_uniform(key, counts: jnp.ndarray, salt) -> jnp.ndarray:
    """Uniform [0,1) evaluated at uint32 ``counts`` (counter-mode threefry)."""
    if hasattr(key, "dtype") and jax.dtypes.issubdtype(key.dtype,
                                                       jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    else:
        kd = key  # legacy uint32 [2] key
    k0 = kd[0].astype(jnp.uint32)
    k1 = kd[1].astype(jnp.uint32)
    bits, _ = _threefry2x32(k0, k1, counts.astype(jnp.uint32),
                            jnp.uint32(salt) + jnp.zeros_like(counts, jnp.uint32))
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2**-24)


class PaddedEdgeWeight(NamedTuple):
    """A non-learned per-edge multiplier already laid out per direction.

    ``fwd``/``bwd``: [..., n_chunks*M] multipliers aligned with the respective
    ``BlockedGraph`` slot order (leading dims = views/layers).  Consumed by
    :func:`pallas_spmm_pv`, which treats the multiplier as a CONSTANT in the
    backward pass — correct for dropout masks (``floor`` has zero gradient
    anyway), wrong for learned gates (use :func:`pallas_spmm` for those).
    """

    fwd: jnp.ndarray
    bwd: jnp.ndarray

    @property
    def ndim(self):  # mask rank in "original-order" terms (for per-layer checks)
        return self.fwd.ndim


def dropout_padded(key, pg: PallasGraph, keep_rate: float,
                   salts=0, resize_val: bool = False) -> PaddedEdgeWeight:
    """Bernoulli(keep_rate) edge-drop multipliers in both padded layouts.

    Semantics parity with ``augment.edge_drop_mask`` (``aug_utils.py:11-31``:
    ``floor(U + keep_rate)``, optional 1/keep_rate rescale) but the uniform for
    edge ``e`` is ``PRF(key, e)``, so both layouts derive the identical mask
    from their constant ``edge_ids`` with zero gathers.  ``salts``: int or int
    array (one mask per salt → leading dim, for per-view/per-layer drops).
    """
    def one(bg):
        def mask(salt):
            u = _prf_uniform(key, bg.edge_ids, salt)
            keep = jnp.floor(u + jnp.float32(keep_rate))
            return keep / jnp.float32(keep_rate) if resize_val else keep

        if jnp.ndim(salts) == 0:
            return mask(salts)
        return jax.vmap(mask)(jnp.asarray(salts, jnp.uint32))

    return PaddedEdgeWeight(fwd=one(pg.fwd), bwd=one(pg.bwd))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def pallas_spmm_pv(pg: PallasGraph, x: jnp.ndarray, wf: jnp.ndarray,
                   wb: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """``(W∘A) @ x`` with a padded-layout constant multiplier ``W`` (dropout).

    ``wf``/``wb``: [n_chunks*M] multipliers for the fwd/bwd layouts (from
    :func:`dropout_padded`).  Differentiable wrt ``x`` only — the multiplier
    cotangent is declared zero, which is exact for masks produced through
    ``floor`` (their true gradient is zero) and avoids the dew gathers.
    """
    return _blocked_matvec(pg.fwd, _contrib_pv(pg.fwd, x, wf), interpret)


def _pv_fwd(pg, x, wf, wb, interpret):
    return pallas_spmm_pv(pg, x, wf, wb, interpret), (wf, wb)


def _contrib_pv(bg: BlockedGraph, x: jnp.ndarray, w: jnp.ndarray):
    """Padded-multiplier contributions (same bf16 fast path as _contrib)."""
    v = bg.vals * w
    if _mxu_precision() is jax.lax.Precision.DEFAULT:
        return x.astype(jnp.bfloat16)[bg.cols] * v.astype(jnp.bfloat16)[:, None]
    return x[bg.cols] * v[:, None]


def _pv_bwd(pg, interpret, res, g):
    wf, wb = res
    dx = _blocked_matvec(pg.bwd, _contrib_pv(pg.bwd, g, wb), interpret)
    return dx, jnp.zeros_like(wf), jnp.zeros_like(wb)


pallas_spmm_pv.defvjp(_pv_fwd, _pv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def pallas_spmm(pg: PallasGraph, x: jnp.ndarray,
                edge_weight: jnp.ndarray | None = None,
                interpret: bool = False) -> jnp.ndarray:
    """``A @ x`` with optional per-edge multiplier; scatter-free on TPU.

    ``x``: [n_cols, d] float32.  Differentiable wrt ``x`` and ``edge_weight``.
    """
    return _blocked_matvec(pg.fwd, _contrib(pg.fwd, x, edge_weight), interpret)


def _fwd(pg, x, edge_weight, interpret):
    out = pallas_spmm(pg, x, edge_weight, interpret)
    return out, (x, edge_weight)


def _bwd(pg, interpret, res, g):
    x, edge_weight = res
    # dx = Aᵀ (ew) @ g
    dx = _blocked_matvec(pg.bwd, _contrib(pg.bwd, g, edge_weight), interpret)
    if edge_weight is None:
        dew = None
    else:
        # d ew[e] = vals[e] * <g[row_e], x[col_e]> — pure gathers
        dew = pg.vals * jnp.sum(g[pg.rows] * x[pg.cols], axis=-1)
    return dx, dew


pallas_spmm.defvjp(_fwd, _bwd)
