"""Sharded LightGCN-family training step: TP (row-sharded tables + partitioned
graph) × DP (sharded interaction batch) under ``shard_map``.

Layout
------
User table padded to ``U_pad = P·U_loc`` rows and sharded over ``model``; item
table likewise.  Node space for propagation is ``[users_pad; items_pad]``
(``N_pad = U_pad + I_pad``).  Shard ``p`` owns user rows ``[p·U_loc, (p+1)·U_loc)``
and item rows ``[p·I_loc, (p+1)·I_loc)``; its local propagation state is
``[U_loc + I_loc, d]``.

Per layer: ``all_gather`` over ``model`` reassembles the full ``[N_pad, d]``
table (a reshape thanks to equal shard sizes), then each shard computes the
segment-sum for the edges whose *destination* rows it owns (host-partitioned,
padded to equal length; padding edges carry value 0).  Batch embedding lookup is
the ownership-masked gather + ``psum`` over ``model``.  The loss is averaged over
``data`` with ``pmean``; ``jax.grad`` differentiates through the whole
``shard_map`` (all_gather ⇄ reduce-scatter).

This is the parallelism the reference lacks entirely (SURVEY §2.5): embedding
model-parallelism + graph partition parallelism + data parallelism in one step.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from sslrec_tpu.models import losses
from sslrec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, pad_to_multiple
from sslrec_tpu.ops.sparse import CooGraph


class ShardedGraph(NamedTuple):
    """Destination-partitioned padded edge lists.

    ``local_rows[p]``: destination row in shard-local node coordinates
    (0..U_loc+I_loc); ``cols[p]``: source node in *global padded* coordinates;
    ``vals[p]``: edge weight (0 for padding); ``src_idx[p]``: the edge's index
    in the ORIGINAL (unpartitioned) edge list, -1 for padding slots — this is
    what lets per-view edge values computed in original edge order (e.g.
    KGCL's ``MaskableBiAdj.view_vals``) ride the partitioned layout via one
    gather (:func:`view_vals_partitioned`).  All ``[P, E_pad]``.
    """

    local_rows: jnp.ndarray
    cols: jnp.ndarray
    vals: jnp.ndarray
    src_idx: jnp.ndarray
    u_loc: int
    i_loc: int
    n_model: int

    @property
    def n_local(self) -> int:
        return self.u_loc + self.i_loc


def partition_graph(g: CooGraph, n_users: int, n_items: int, n_model: int) -> ShardedGraph:
    """Host-side: split the bidirectional adjacency by destination-row owner.

    ``g`` indexes nodes as [users; items] 0..U+I (unpadded).  Returns padded
    per-shard edge arrays in the padded global/local coordinate system.
    """
    u_loc = pad_to_multiple(n_users, n_model) // n_model
    i_loc = pad_to_multiple(n_items, n_model) // n_model
    u_pad = u_loc * n_model
    rows = np.asarray(g.rows)
    cols = np.asarray(g.cols)
    vals = np.asarray(g.vals)
    # remap unpadded node id -> padded node id
    def remap(x):
        return np.where(x < n_users, x, u_pad + (x - n_users))
    rows_p = remap(rows)
    cols_p = remap(cols)
    # owner + local index of each destination
    is_user = rows_p < u_pad
    owner = np.where(is_user, rows_p // u_loc, (rows_p - u_pad) // i_loc)
    local = np.where(is_user, rows_p % u_loc, u_loc + (rows_p - u_pad) % i_loc)
    e_max = max(int(np.max(np.bincount(owner, minlength=n_model))), 1)
    lr = np.zeros((n_model, e_max), np.int32)
    lc = np.zeros((n_model, e_max), np.int32)
    lv = np.zeros((n_model, e_max), np.float32)
    si = np.full((n_model, e_max), -1, np.int32)
    eids = np.arange(rows.shape[0], dtype=np.int32)
    for p in range(n_model):
        sel = owner == p
        k = int(sel.sum())
        order = np.argsort(local[sel], kind="stable")
        lr[p, :k] = local[sel][order]
        lc[p, :k] = cols_p[sel][order]
        lv[p, :k] = vals[sel][order]
        si[p, :k] = eids[sel][order]
    return ShardedGraph(jnp.asarray(lr), jnp.asarray(lc), jnp.asarray(lv),
                        jnp.asarray(si), u_loc, i_loc, n_model)


def _assemble_full(local_nodes: jnp.ndarray, u_loc: int, i_loc: int, axis: str):
    """all_gather shard-local [U_loc+I_loc, d] states → global padded [N_pad, d]."""
    gathered = lax.all_gather(local_nodes, axis)          # [P, U_loc+I_loc, d]
    users = gathered[:, :u_loc].reshape(-1, local_nodes.shape[-1])
    items = gathered[:, u_loc:].reshape(-1, local_nodes.shape[-1])
    return jnp.concatenate([users, items], axis=0)        # [U_pad+I_pad, d]


def _owned_lookup(table_local: jnp.ndarray, idx: jnp.ndarray, shard_size: int,
                  axis: str) -> jnp.ndarray:
    """Row-sharded table lookup: ownership-masked local gather + psum."""
    p = lax.axis_index(axis)
    off = p * shard_size
    local_idx = jnp.clip(idx - off, 0, shard_size - 1)
    owned = (idx >= off) & (idx < off + shard_size)
    vals = table_local[local_idx]
    return lax.psum(jnp.where(owned[:, None], vals, 0.0), axis)


def partitioned_spmm(u_loc: int, i_loc: int, x_local: jnp.ndarray,
                     e_rows: jnp.ndarray, e_cols: jnp.ndarray,
                     e_vals: jnp.ndarray, axis: str = MODEL_AXIS):
    """ONE graph-partitioned ``A @ x`` hop inside ``shard_map``.

    The REUSABLE primitive for any bipartite propagation under the mesh:
    ``x_local`` is this shard's ``[U_loc+I_loc, d]`` node state; ``e_*`` are
    its destination-partitioned padded edge slices (from
    :func:`partition_graph`).  all_gather reassembles the global node table
    over ``axis`` (rides ICI), then the shard reduces exactly the edges whose
    destination rows it owns — no scatter crosses shards.  Composable: call
    per hop/view with per-view ``e_vals`` (edge dropout, learned gates).
    """
    full = _assemble_full(x_local, u_loc, i_loc, axis)
    contrib = full[e_cols] * e_vals[:, None]
    return jax.ops.segment_sum(contrib, e_rows,
                               num_segments=u_loc + i_loc,
                               indices_are_sorted=True)


def partitioned_propagate(sg: ShardedGraph, u_local, i_local, e_rows, e_cols,
                          e_vals, layer_num: int, combine: str = "sum",
                          axis: str = MODEL_AXIS):
    """LightGCN-style multi-hop propagation from shard-local tables.

    ``combine``: 'sum' (x0 + Σ hops, LightGCN), 'mean' (layer mean, the
    KGCL/NCL convention) or 'last' (the final hop only — with ``layer_num=1``
    this is a plain one-hop ``A @ x``, the building block for towers that
    apply a nonlinearity between hops, e.g. KGRec's l2-normalised UI tower or
    CML's per-behavior sigmoid stacks).  Returns (user_local, item_local)."""
    u_loc, i_loc = sg.u_loc, sg.i_loc
    x = jnp.concatenate([u_local, i_local], axis=0)       # [U_loc+I_loc, d]
    acc = [x]
    for _ in range(layer_num):
        x = partitioned_spmm(u_loc, i_loc, x, e_rows, e_cols, e_vals, axis)
        acc.append(x)
    if combine == "sum":
        out = sum(acc)
    elif combine == "mean":
        out = sum(acc) / len(acc)
    else:  # 'last'
        out = x
    return out[:u_loc], out[u_loc:]


def view_vals_partitioned(sg: ShardedGraph, vals: jnp.ndarray) -> jnp.ndarray:
    """Map per-view edge values in ORIGINAL edge order → the partitioned
    ``[P, E_pad]`` layout (padding slots get 0).  One gather; jit-safe."""
    return jnp.where(sg.src_idx >= 0, vals[jnp.clip(sg.src_idx, 0)], 0.0)


def mesh_partitioned_propagate(mesh, sg: ShardedGraph, u_x: jnp.ndarray,
                               i_x: jnp.ndarray, vals_part: jnp.ndarray,
                               layer_num: int, combine: str = "sum"):
    """Graph-partitioned multi-hop propagation, callable from ANY jitted model
    step under ``train.mesh`` — the registry-reachable consumer entry of the
    partitioned layout (first deployed for KGCL's UI propagation; the demo
    sharded-LightGCN step in :func:`build_sharded_lightgcn_step` builds the
    same hops inline).

    ``u_x [U, d]`` / ``i_x [I, d]`` are unpadded node states (parameters or
    activations); ``vals_part [P, E_pad]`` per-view edge values from
    :func:`view_vals_partitioned`.  Pads both tables to the shard grid,
    reshards them row-wise over ``model`` (GSPMD inserts the collectives),
    runs the all_gather + owned-destination segment-sum hops inside
    ``shard_map``, and returns unpadded ``(u_out, i_out)``.
    """
    u_loc, i_loc, n_model = sg.u_loc, sg.i_loc, sg.n_model
    n_u, n_i = u_x.shape[0], i_x.shape[0]
    u = jnp.pad(u_x, ((0, u_loc * n_model - n_u), (0, 0)))
    i = jnp.pad(i_x, ((0, i_loc * n_model - n_i), (0, 0)))

    def f(u_l, i_l, e_rows, e_cols, e_vals):
        return partitioned_propagate(sg, u_l, i_l, e_rows[0], e_cols[0],
                                     e_vals[0], layer_num, combine=combine)

    specs = P(MODEL_AXIS, None)
    out = shard_map(f, mesh=mesh,
                    in_specs=(specs, specs, specs, specs, specs),
                    out_specs=(specs, specs), check_rep=False)(
        u, i, sg.local_rows, sg.cols, vals_part)
    return out[0][:n_u], out[1][:n_i]


def maybe_partition_bi(cfg, rows, cols, n_users: int, n_items: int,
                       vals=None):
    """Model-init helper for the KGCL deployment pattern (r4): under a
    config-driven mesh whose ``model`` axis is > 1, partition a bidirectional
    ``[users; items]``-indexed edge list by destination owner and return
    ``(mesh, ShardedGraph)``; otherwise ``(mesh, None)`` and the model keeps
    its replicated-edge single-device path.

    ``rows``/``cols`` index nodes as [users; items] 0..U+I.  ``vals`` default
    to ones — per-view/per-step values ride :func:`view_vals_partitioned`
    through ``src_idx`` either way; pass static normalised values here when
    the model propagates with fixed weights (e.g. DiffKG's adj_vals).
    """
    from sslrec_tpu.parallel.mesh import MODEL_AXIS, mesh_from_config
    mesh = mesh_from_config(cfg)
    if mesh is None or mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return mesh, None
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = (np.ones(rows.shape[0], np.float32) if vals is None
            else np.asarray(vals, np.float32))
    g = CooGraph(rows=rows, cols=cols, vals=vals,
                 n_rows=n_users + n_items, n_cols=n_users + n_items)
    return mesh, partition_graph(g, n_users, n_items,
                                 int(mesh.shape[MODEL_AXIS]))


def maybe_partition_rect_pair(cfg, a_graph, at_graph, n_users: int,
                              n_items: int):
    """Partition a *chained* rect propagation pair (A: users←items, then
    AT: items←users-new, e.g. the HMGCR/SMBRec ``GCNTower`` layer) into two
    direction-specific :class:`ShardedGraph` s.  One bidirectional hop cannot
    express the chain (AT consumes A's OUTPUT within the same layer), so each
    direction gets its own destination-partitioned graph; static normalised
    values live in ``sg.vals``.  Returns ``(mesh, (sg_a, sg_at))`` or
    ``(mesh, None)`` off-mesh."""
    from sslrec_tpu.parallel.mesh import MODEL_AXIS, mesh_from_config
    mesh = mesh_from_config(cfg)
    if mesh is None or mesh.shape.get(MODEL_AXIS, 1) <= 1:
        return mesh, None
    n_model = int(mesh.shape[MODEL_AXIS])

    def part(rows, cols, vals):
        g = CooGraph(rows=np.asarray(rows), cols=np.asarray(cols),
                     vals=np.asarray(vals, np.float32),
                     n_rows=n_users + n_items, n_cols=n_users + n_items)
        return partition_graph(g, n_users, n_items, n_model)

    ar = np.asarray(a_graph.rows, np.int64)
    ac = np.asarray(a_graph.cols, np.int64)
    av = np.asarray(a_graph.vals)
    tr = np.asarray(at_graph.rows, np.int64)
    tc = np.asarray(at_graph.cols, np.int64)
    tv = np.asarray(at_graph.vals)
    sg_a = part(ar, n_users + ac, av)            # users ← items
    sg_at = part(n_users + tr, tc, tv)           # items ← users
    return mesh, (sg_a, sg_at)


def build_sharded_lightgcn_step(mesh, sg: ShardedGraph, layer_num: int,
                                reg_weight: float, keep_rate: float,
                                optimizer):
    """Returns (init_shardings, train_step_fn).

    ``params`` = {'user_embeds': [U_pad, d] sharded P(model), 'item_embeds':
    [I_pad, d] sharded P(model)}; batch arrays sharded P(data).
    """
    u_loc, i_loc = sg.u_loc, sg.i_loc

    def propagate_local(u_local, i_local, e_rows, e_cols, e_vals):
        return partitioned_propagate(sg, u_local, i_local, e_rows, e_cols,
                                     e_vals, layer_num, combine="sum")

    def shard_loss(u_emb, i_emb, e_rows, e_cols, e_vals, users, poss, negs, key):
        # inside shard_map: u_emb [U_loc, d], e_* [1, E_pad] (model-sharded),
        # users/poss/negs [B_loc] (data-sharded), key replicated.
        e_rows, e_cols, ew = e_rows[0], e_cols[0], e_vals[0]
        if keep_rate < 1.0:
            # per-(data,model)-shard independent edge dropout
            k = jax.random.fold_in(key, lax.axis_index(MODEL_AXIS))
            k = jax.random.fold_in(k, lax.axis_index(DATA_AXIS))
            drop = jnp.floor(jax.random.uniform(k, ew.shape) + keep_rate)
            ew = ew * drop
        fin_u, fin_i = propagate_local(u_emb, i_emb, e_rows, e_cols, ew)
        anc = _owned_lookup(fin_u, users, u_loc, MODEL_AXIS)
        pos = _owned_lookup(fin_i, poss, i_loc, MODEL_AXIS)
        neg = _owned_lookup(fin_i, negs, i_loc, MODEL_AXIS)
        bpr = losses.bpr_loss(anc, pos, neg) / anc.shape[0]
        reg_local = jnp.sum(jnp.square(u_emb)) + jnp.sum(jnp.square(i_emb))
        reg = reg_weight * lax.psum(reg_local, MODEL_AXIS)
        loss = bpr + reg
        # replicate over model (identical already), average over data shards
        return lax.pmean(lax.pmean(loss, MODEL_AXIS), DATA_AXIS)

    in_specs = (
        P(MODEL_AXIS, None), P(MODEL_AXIS, None),          # tables
        P(MODEL_AXIS, None), P(MODEL_AXIS, None), P(MODEL_AXIS, None),  # edges
        P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),          # batch
        P(),                                               # key
    )
    smapped = shard_map(shard_loss, mesh=mesh, in_specs=in_specs, out_specs=P(),
                        check_rep=False)

    def loss_fn(params, batch, key):
        return smapped(params["user_embeds"], params["item_embeds"],
                       sg.local_rows, sg.cols, sg.vals,
                       batch["user"], batch["pos"], batch["neg"], key)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    shardings = {
        "user_embeds": NamedSharding(mesh, P(MODEL_AXIS, None)),
        "item_embeds": NamedSharding(mesh, P(MODEL_AXIS, None)),
    }
    return shardings, train_step
