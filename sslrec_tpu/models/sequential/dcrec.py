"""DCRec — debiased contrastive learning: transformer + GCNs over the item
transition graph and an item similarity graph, with conformity/interest
disentanglement weights.

Parity with ``models/sequential/dcrec_seq.py`` + the graph builders in
``data_utils/datasets_sequential.py:14-133``:

- adjacency graph: symmetric consecutive-pair co-occurrence counts, unit
  diagonal, D^-1/2 A D^-1/2 edge weights; per-user edge lists enable the
  per-batch augmentation that deletes the batch users' own transition edges.
- similarity graph: cosine similarity of item interaction columns, top-(k+1)
  per row, row-normalised.
- GCN: weightless 2-layer conv with edge weights (+self loops), mean over
  [x, l1, l2], layernorm(out + item_emb); random edge-weight dropout.
- loss: agreement weights from three cosine views over the augmented graph
  (sigmoid → min-max → mean-scaled; civil/foreign neighbour readouts use full
  masked means instead of the reference's 10-sample caps), KL to sorted
  N(weight_mean, 0.1) samples, vanilla-NCE contrasts weighted by
  mainstream/personalisation weights, attention-fused CE.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sslrec_tpu.models import layers
from sslrec_tpu.models.sequential.base_seq import SequentialModel
from sslrec_tpu.utils.initializers import linear_params, normal_init


def _l2rows(x, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), -1, keepdims=True) + eps)


def _build_graphs(seq_table, n_items1, sim_k):
    """Host: transition graph + per-pair edge ids; cosine top-k sim graph."""
    seqs = np.asarray(seq_table)
    a = seqs[:, 1:].reshape(-1)
    b = seqs[:, :-1].reshape(-1)
    live = (a > 0) & (b > 0)
    pa = np.concatenate([a[live], b[live]])
    pb = np.concatenate([b[live], a[live]])
    adj = sp.coo_matrix((np.ones(len(pa)), (pa, pb)),
                        shape=(n_items1, n_items1)).tocsr()  # sums duplicates
    adj = adj.tolil()
    adj.setdiag(1.0)
    adj = adj.tocsr()
    deg = np.asarray(adj.sum(1)).reshape(-1)
    dinv = np.power(np.maximum(deg, 1e-12), -0.5)
    dinv[np.isinf(dinv)] = 0.0
    norm = (sp.diags(dinv) @ adj @ sp.diags(dinv)).tocoo()
    order = np.lexsort((norm.col, norm.row))
    rows, cols, vals = norm.row[order], norm.col[order], norm.data[order]
    # edge-id lookup (row-major sorted codes)
    codes = rows.astype(np.int64) * n_items1 + cols
    # per-user edge ids (both directions of every consecutive pair)
    n_rows_seq = seqs.shape[0]
    ua = seqs[:, 1:]
    ub = seqs[:, :-1]
    pair_live = (ua > 0) & (ub > 0)
    width = 2 * (seqs.shape[1] - 1)
    user_eids = np.zeros((n_rows_seq, width), np.int32)
    user_emask = np.zeros((n_rows_seq, width), bool)
    flat_codes = np.concatenate(
        [ua.astype(np.int64) * n_items1 + ub, ub.astype(np.int64) * n_items1 + ua],
        axis=1)
    flat_live = np.concatenate([pair_live, pair_live], axis=1)
    idx = np.searchsorted(codes, flat_codes)
    idx = np.clip(idx, 0, len(codes) - 1)
    found = (codes[idx] == flat_codes) & flat_live
    user_eids[found] = idx[found]
    user_emask = found

    # similarity graph: cosine of item columns of the row-item incidence
    ur = np.repeat(np.arange(n_rows_seq), seqs.shape[1])
    ic = seqs.reshape(-1)
    live2 = ic > 0
    inc = sp.coo_matrix((np.ones(live2.sum()), (ur[live2], ic[live2])),
                        shape=(n_rows_seq, n_items1)).tocsc()
    inc.data[:] = 1.0
    col_norm = np.sqrt(np.asarray(inc.multiply(inc).sum(0))).reshape(-1)
    # co-occurrence stays sparse (a dense [n_items, n_items] would be tens of
    # GB on amazon-scale vocabularies); zero-similarity entries can never enter
    # the top-k with positive weight, so per-row top-k over nonzeros is exact
    simm = (inc.T @ inc).tocsr()
    nnz_rows = np.repeat(np.arange(n_items1), np.diff(simm.indptr))
    denom = col_norm[nnz_rows] * col_norm[simm.indices]
    simm.data = np.where(denom > 0, simm.data / np.maximum(denom, 1e-12), 0.0)
    k = min(sim_k + 1, n_items1)
    sim_rows_l, sim_cols_l, sim_vals_l = [], [], []
    indptr, indices, data = simm.indptr, simm.indices, simm.data
    for r in range(n_items1):
        lo, hi = indptr[r], indptr[r + 1]
        if lo == hi:
            continue
        d = data[lo:hi]
        if hi - lo > k:
            keep = np.argpartition(-d, k - 1)[:k]
        else:
            keep = np.arange(hi - lo)
        w = d[keep]
        w = w / max(w.sum(), 1e-12)
        sim_rows_l.append(np.full(len(keep), r, np.int32))
        sim_cols_l.append(indices[lo:hi][keep])
        sim_vals_l.append(w)
    sim_rows = np.concatenate(sim_rows_l) if sim_rows_l else np.zeros(0, np.int32)
    sim_cols = np.concatenate(sim_cols_l) if sim_cols_l else np.zeros(0, np.int32)
    sim_vals = (np.concatenate(sim_vals_l) if sim_vals_l
                else np.zeros(0)).astype(np.float32)
    return ((jnp.asarray(rows.astype(np.int32)), jnp.asarray(cols.astype(np.int32)),
             jnp.asarray(vals.astype(np.float32))),
            (jnp.asarray(user_eids), jnp.asarray(user_emask)),
            (jnp.asarray(sim_rows.astype(np.int32)),
             jnp.asarray(sim_cols.astype(np.int32)), jnp.asarray(sim_vals)))


class DCRec(SequentialModel):
    batch_fields = ("user", "seq", "pos")

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.weight_mean = float(m.weight_mean)
        self.kl_weight = float(m.kl_weight)
        self.cl_lambda = float(m.cl_lambda)
        self.cl_temp = float(m.cl_temp)
        self.graph_dropout = float(m.graph_dropout_prob)
        self.sim_k = int(m.sim_group_k)
        self.n_items1 = self.item_num + 1

        (self.adj, (self.user_eids, self.user_emask),
         self.sim) = _build_graphs(data.extras["user_seq_table"], self.n_items1,
                                   self.sim_k)
        self.uid_of_row = data.extras["user_seq_uids"]
        # map global uid → row in the seq table (last occurrence wins)
        n_rows = int(self.uid_of_row.shape[0])
        row_of_uid = np.zeros((self.user_num,), np.int32)
        row_of_uid[np.asarray(self.uid_of_row)] = np.arange(n_rows, dtype=np.int32)
        self.row_of_uid = jnp.asarray(row_of_uid)
        # test-time graphs from the test sequences (dcrec_seq.py full_predict)
        (self.adj_test, _, self.sim_test) = _build_graphs(
            data.extras["test_seqs"], self.n_items1, self.sim_k)
        # scatter-free segment ops per constant graph (TPU blocked kernels)
        from sslrec_tpu.ops.pallas_segment import SegmentOps

        def _graph_ops(g):
            return (SegmentOps(g[0], self.n_items1),
                    SegmentOps(g[1], self.n_items1))

        self.ops_adj = _graph_ops(self.adj)
        self.ops_sim = _graph_ops(self.sim)
        self.ops_adj_test = _graph_ops(self.adj_test)
        self.ops_sim_test = _graph_ops(self.sim_test)

    def init_params(self, key):
        ks = jax.random.split(key, 6)
        d = self.emb_size
        p = layers.init_transformer_tower(ks[0], self.n_items1, d,
                                          self.max_len, self.n_layers)
        p["cl_fc1"] = linear_params(ks[1], d, d)
        p["cl_fc2"] = linear_params(ks[2], d, d)
        p["attn_weights"] = normal_init(ks[3], (d, d), 0.02)
        p["attn"] = normal_init(ks[4], (1, d), 0.02)
        p["gcn_ln"] = layers.init_layer_norm(d)
        return p

    # -- GCN over an edge triple ----------------------------------------------
    def _gcn(self, params, key, graph, seg, edge_scale=None, deterministic=False):
        """Replicates ``dcrec_seq.GCN.forward`` exactly: ``dgl.add_self_loop``
        appends weight-1 loops on top of the pre-normalised values, and the
        dgl ``GraphConv(norm='both')`` then re-normalises by *structural* edge
        counts (so the augmented graph's removed edges also leave the
        degrees)."""
        rows, cols, vals = graph
        item_emb = params["emb"]["token"]
        if not deterministic:
            key, kd = jax.random.split(key)
            item_emb = layers.dropout(kd, item_emb, self.dropout_rate, False)
        w = vals
        live = jnp.ones_like(vals)
        if edge_scale is not None:
            w = w * edge_scale
            live = live * edge_scale
        seg_r, seg_c = seg
        deg_in = seg_r.sum(live) + 1.0
        deg_out = seg_c.sum(live) + 1.0
        dinv_in = deg_in ** -0.5
        dinv_out = deg_out ** -0.5
        we = w * dinv_out[cols] * dinv_in[rows]
        loop_w = dinv_out * dinv_in  # the added self-loop carries weight 1
        if not deterministic and self.graph_dropout > 0:
            key, kg, kl_ = jax.random.split(key, 3)
            keep = jax.random.bernoulli(kg, 1 - self.graph_dropout, we.shape)
            we = jnp.where(keep, we, 0.0)
            keepl = jax.random.bernoulli(kl_, 1 - self.graph_dropout,
                                         loop_w.shape)
            loop_w = jnp.where(keepl, loop_w, 0.0)
        x = item_emb
        embs = [x]
        for _ in range(2):
            x = seg_r.sum(seg_c.take(x) * we[:, None]) \
                + loop_w[:, None] * x
            embs.append(x)
        out = sum(embs) / 3.0
        # the residual uses the *dropped* table; eps matches the reference's
        # nn.LayerNorm(eps=1e-12) -- at std-0.02 embeddings the default 1e-5
        # would shift every row by ~1% (dcrec_seq.py:232,306-309)
        return layers.apply_layer_norm(params["gcn_ln"], out + item_emb,
                                       eps=1e-12)

    # -- contrastive helpers ----------------------------------------------------
    def _vanilla_nce(self, z1, z2):
        f = lambda x: jnp.exp(x / self.cl_temp)
        s = f(_l2rows(z1) @ _l2rows(z2).T)
        pos = jnp.diagonal(s)
        return -jnp.log(1e-8 + pos / jnp.sum(s, 1))

    def hparams(self):
        """Traced tune-grid scalars (cl_lambda, weight_mean ride lanes)."""
        return {"cl_lambda": jnp.float32(self.cl_lambda),
                "weight_mean": jnp.float32(self.weight_mean)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        cl_lambda = hp.get("cl_lambda", self.cl_lambda)
        weight_mean = hp.get("weight_mean", self.weight_mean)
        seqs = batch["seq"]
        uids = batch["user"]
        ks = jax.random.split(key, 8)
        last_items = seqs[:, -1]

        # augmented graph: delete the batch users' own transition edges
        srow = self.row_of_uid[uids]
        eids = self.user_eids[srow].reshape(-1)
        emask = self.user_emask[srow].reshape(-1)
        removed = jnp.zeros((self.adj[0].shape[0],)).at[eids].max(
            emask.astype(jnp.float32))
        aug_scale = 1.0 - removed

        adj_emb = self._gcn(params, ks[0], self.adj, self.ops_adj)
        sim_emb = self._gcn(params, ks[1], self.sim, self.ops_sim)
        aug_emb = self._gcn(params, ks[2], self.adj, self.ops_adj, edge_scale=aug_scale)
        adj_last = adj_emb[last_items]
        sim_last = sim_emb[last_items]

        h = layers.apply_transformer_tower(params, ks[3], seqs, self.n_heads,
                                           self.dropout_rate, False)[:, -1]
        h_aug = layers.apply_transformer_tower(params, ks[4], seqs, self.n_heads,
                                               self.dropout_rate, False)[:, -1]

        # neighbour readouts over the transition graph for the last items
        rows, cols, _ = self.adj
        own = jnp.zeros((self.n_items1,)).at[last_items].set(1.0)
        edge_sel = own[rows]
        civil_w = edge_sel * removed          # removed (own-sequence) edges
        foreign_w = edge_sel * (1.0 - removed)

        def readout(weights):
            seg_r, seg_c = self.ops_adj
            summed = seg_r.sum(seg_c.take(adj_emb) * weights[:, None])
            cnt = seg_r.sum(weights)
            return (summed / jnp.maximum(cnt, 1.0)[:, None])[last_items]

        civil_ro = readout(civil_w)
        foreign_ro = readout(foreign_w)
        aug_last = aug_emb[last_items]
        cos = lambda a, b: jnp.sum(_l2rows(a) * _l2rows(b), -1)
        agreement = (cos(adj_last, aug_last) + cos(adj_last, foreign_ro)
                     + cos(civil_ro, foreign_ro)) / 3.0
        agreement = jax.nn.sigmoid(agreement)
        agreement = (agreement - agreement.min()) \
            / (agreement.max() - agreement.min() + 1e-12)
        agreement = (weight_mean / (jnp.mean(agreement) + 1e-12)) * agreement
        seq_lens = jnp.sum(seqs > 0, 1)
        mainstream = jnp.where(seq_lens == 1, 0.5, agreement)

        expected = weight_mean + 0.1 * jax.random.normal(
            ks[5], mainstream.shape)
        tgt = jnp.log(jnp.maximum(jnp.sort(expected), 1e-8) + 1e-8)
        inp = jax.nn.log_softmax(jnp.sort(mainstream) + 1e-8, axis=0)
        # F.kl_div(input, target, log_target=True, reduction='batchmean')
        kl = self.kl_weight * jnp.sum(jnp.exp(tgt) * (tgt - inp)) \
            / mainstream.shape[0]

        personal = jnp.max(mainstream) - mainstream
        cl_adj = self._vanilla_nce(h_aug, adj_last)
        cl_a2s = self._vanilla_nce(adj_last, sim_last)
        cl = jnp.mean(cl_lambda * (mainstream * cl_adj
                                   + personal * cl_a2s))

        mixed = jnp.stack([h, adj_last, sim_last], 0)          # [3, B, d]
        weights = jnp.sum((mixed @ params["attn_weights"]) * params["attn"], -1)
        score = jax.nn.softmax(weights, axis=0)[:, :, None]
        fused = jnp.sum(mixed * score, 0)
        logits = fused @ params["emb"]["token"].T
        logp = jax.nn.log_softmax(logits + 1e-8, -1)
        ce = -jnp.mean(jnp.take_along_axis(logp, batch["pos"][:, None], 1)[:, 0])
        return ce + cl + kl, {"loss": ce, "cl_loss": cl, "kl_loss": kl}

    # -- eval -------------------------------------------------------------------
    def encode_for_predict(self, params, seqs):
        h = layers.apply_transformer_tower(params, jax.random.PRNGKey(0), seqs,
                                           self.n_heads, 0.0, True)[:, -1]
        adj_emb = self._gcn(params, jax.random.PRNGKey(0), self.adj_test,
                            self.ops_adj_test, deterministic=True)
        sim_emb = self._gcn(params, jax.random.PRNGKey(0), self.sim_test,
                            self.ops_sim_test, deterministic=True)
        last = seqs[:, -1]
        mixed = jnp.stack([h, adj_emb[last], sim_emb[last]], 0)
        weights = jnp.sum((mixed @ params["attn_weights"]) * params["attn"], -1)
        score = jax.nn.softmax(weights, axis=0)[:, :, None]
        return jnp.sum(mixed * score, 0)

    def item_logits_params(self, params):
        w = params["emb"]["token"]
        return w, jnp.zeros((w.shape[0],), w.dtype)
