"""KGRec — rationale-aware knowledge graph rec: attentive KG GNN with
attention-guided MAE edge masking and adaptive cross-view contrast.

Parity with ``models/kg/kgrec.py:319-574``:

- AttnHGCN ``shared_layer_agg``: 2-head edge attention q·(k⊙rel)/√d_k, segment
  softmax per head-node, attention-weighted tail sum; user side aggregates
  D^-1-weighted interacted entities; per-hop L2 norm + residual sum.
- Per step: per-relation 50% KG edge sampling, rationale scores from the
  (degree-renormalised) attention, Gumbel-noised top-``mae_msize`` +equal-size
  random mask → encoder graph; MAE dot-product decoder on masked pairs
  ⟨tail⊙rel, head⟩; adaptive CL between a UI aggregation over Gumbel-top-k
  sampled interactions and a KG aggregation over the top-attention edges,
  scored by the two-MLP contrast head.

TPU formulation: all variable-nnz subsets become 0/1 masks over static edge
lists (softmax logits −∞-masked; degree counts from live masks); without-
replacement multinomial uses the Gumbel-top-k equivalence; the MAE mask is the
concatenation of the top-k and random index sets (the reference's boolean
union deduplicates — overlapping picks here just double-weight a few edges).

No ``hparams()`` hook (tuner note, r5): the shipped tune grid is ENTIRELY
structural -- ``layer_num`` is ``context_hops``, the GNN hop loop count
(reference ``kgrec.py:332,358``; the Python hop loop here).  Each trial is
a different compiled program, so the tuner's serial structural-group
fallback is the only correct execution; no traced lane exists to vmap.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.sparse import normalize_adj_left
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


def _l2rows(x):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), -1, keepdims=True) + 1e-12)


class KGRec(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.n_relations = data.extras["relation_num"]
        self.n_entities = data.extras["entity_num"]
        self.n_nodes = data.extras["node_num"]
        self.decay = float(m.decay_weight)
        self.context_hops = int(m.layer_num)
        self.node_dropout_rate = float(m.node_dropout_rate)
        self.mess_dropout = bool(m.mess_dropout)
        self.mess_dropout_rate = float(m.mess_dropout_rate)
        self.mae_coef = float(m.mae_coef)
        self.mae_msize = int(m.mae_msize)
        self.cl_coef = float(m.cl_coef)
        self.tau = float(m.tau)
        self.cl_drop = float(m.cl_drop_ratio)
        self.n_heads = 2

        trip = data.extras["kg_triplets_full"]
        self.kg_heads = jnp.asarray(trip[:, 0].astype(np.int32))
        self.kg_rels = jnp.asarray(trip[:, 1].astype(np.int32))
        self.kg_tails = jnp.asarray(trip[:, 2].astype(np.int32))
        self.n_kg = int(len(trip))

        # D^-1-normalised rectangular interact edges (kgrec.py:389-397)
        ui = normalize_adj_left(data.extras["train_mat_scipy"]).tocoo()
        order = np.lexsort((ui.col, ui.row))
        self.ie_u = jnp.asarray(ui.row[order].astype(np.int32))
        self.ie_i = jnp.asarray(ui.col[order].astype(np.int32))
        self.ie_w = jnp.asarray(ui.data[order].astype(np.float32))
        self.n_ui = int(ui.nnz)

        # scatter-free segment ops (blocked kernels on TPU, XLA on CPU); the
        # ie_i array needs two contexts — reductions into item space and
        # takes whose backward reduces into entity space
        from sslrec_tpu.ops.pallas_segment import OneHotTake, SegmentOps
        # relations are 1-indexed in the triplet file; take on the shifted ids
        self.rel_take = OneHotTake(self.kg_rels - 1, self.n_relations - 1)
        self.seg_h = SegmentOps(self.kg_heads, self.n_entities)
        self.seg_t = SegmentOps(self.kg_tails, self.n_entities)
        self.seg_ieu = SegmentOps(self.ie_u, self.user_num)
        self.seg_iei = SegmentOps(self.ie_i, self.item_num)
        self.seg_ie_ent = SegmentOps(self.ie_i, self.n_entities)

        # Under train.mesh with a model axis, the UI tower runs
        # graph-partitioned (r4 KGCL pattern): a bidirectional [users; items]
        # edge list whose per-step rationale weights ``ui_w`` ride the
        # partitioned layout as concat([ui_w, ui_w]) via src_idx.
        from sslrec_tpu.parallel.dist_train import maybe_partition_bi
        ie_u_np = ui.row[order].astype(np.int64)
        ie_i_np = ui.col[order].astype(np.int64)
        self._mesh, self._sg_ui = maybe_partition_bi(
            cfg,
            np.concatenate([ie_u_np, self.user_num + ie_i_np]),
            np.concatenate([self.user_num + ie_i_np, ie_u_np]),
            self.user_num, self.item_num)

    def init_params(self, key):
        ks = jax.random.split(key, 7)
        d = self.embedding_size
        return {
            "all_embed": xavier_uniform(ks[0], (self.n_nodes, d)),
            "relation_emb": xavier_uniform(ks[1], (self.n_relations - 1, d)),
            "w_q": xavier_uniform(ks[2], (d, d)),
            "cl_mlp1": [linear_params(ks[3], d, d), linear_params(ks[4], d, d)],
            "cl_mlp2": [linear_params(ks[5], d, d), linear_params(ks[6], d, d)],
        }

    # -- attention machinery -------------------------------------------------
    def _attn_logits(self, params, entity_emb):
        d = self.embedding_size
        dk = d // self.n_heads
        q = (self.seg_h.take(entity_emb) @ params["w_q"]).reshape(
            -1, self.n_heads, dk)
        k = (self.seg_t.take(entity_emb) @ params["w_q"]).reshape(
            -1, self.n_heads, dk)
        k = k * self.rel_take.take(params["relation_emb"]).reshape(-1, self.n_heads, dk)
        return jnp.sum(q * k, -1) / jnp.sqrt(dk)        # [n_kg, heads]

    def _norm_attn(self, params, entity_emb, live):
        """(kgrec.py:169-191) mean-head logits → masked segment softmax → scaled
        by live head-degree."""
        logits = jnp.mean(self._attn_logits(params, entity_emb), -1)
        logits = jax.lax.stop_gradient(logits)
        masked = jnp.where(live > 0, logits, -1e9)
        score = self.seg_h.softmax(masked) * live
        norm = self.seg_h.sum(live)[self.kg_heads]
        return score * norm, logits

    def _shared_agg(self, params, user_emb, entity_emb, kg_mask, ie_mask):
        d = self.embedding_size
        dk = d // self.n_heads
        logits = self._attn_logits(params, entity_emb)
        logits = jnp.where((kg_mask > 0)[:, None], logits, -1e9)
        value = (self.seg_t.take(entity_emb) * self.rel_take.take(params["relation_emb"])) \
            .reshape(-1, self.n_heads, dk)
        # fused per-head softmax+aggregate (kg_mask zeroes both num and den)
        entity_agg = jnp.concatenate([
            self.seg_h.attn(logits[:, i], value[:, i, :], kg_mask)
            for i in range(self.n_heads)], axis=-1)
        w = self.ie_w * ie_mask / (1 - self.node_dropout_rate)
        item_agg = w[:, None] * self.seg_ie_ent.take(entity_emb)
        user_agg = self.seg_ieu.sum(item_agg)
        return entity_agg, user_agg

    def _gcn(self, params, key, kg_mask, ie_mask, training):
        user_emb = params["all_embed"][: self.user_num]
        entity_emb = params["all_embed"][self.user_num:]
        ent_res, usr_res = entity_emb, user_emb
        for _ in range(self.context_hops):
            entity_emb, user_emb = self._shared_agg(params, user_emb, entity_emb,
                                                    kg_mask, ie_mask)
            if training and self.mess_dropout:
                key, k1, k2 = jax.random.split(key, 3)
                ke = jax.random.bernoulli(k1, 1 - self.mess_dropout_rate,
                                          entity_emb.shape)
                entity_emb = jnp.where(ke, entity_emb / (1 - self.mess_dropout_rate), 0.0)
                ku = jax.random.bernoulli(k2, 1 - self.mess_dropout_rate,
                                          user_emb.shape)
                user_emb = jnp.where(ku, user_emb / (1 - self.mess_dropout_rate), 0.0)
            entity_emb = _l2rows(entity_emb)
            user_emb = _l2rows(user_emb)
            ent_res = ent_res + entity_emb
            usr_res = usr_res + user_emb
        return ent_res, usr_res

    # -- auxiliary towers ----------------------------------------------------
    def _forward_ui(self, params, ui_w):
        user_emb = params["all_embed"][: self.user_num]
        item_emb = params["all_embed"][self.user_num: self.user_num + self.item_num]
        item_res = item_emb
        if self._sg_ui is not None:
            from sslrec_tpu.parallel.dist_train import (
                mesh_partitioned_propagate, view_vals_partitioned)
            pv = view_vals_partitioned(self._sg_ui,
                                       jnp.concatenate([ui_w, ui_w]))
            for _ in range(self.context_hops):
                u_agg, i_agg = mesh_partitioned_propagate(
                    self._mesh, self._sg_ui, user_emb, item_emb, pv, 1,
                    combine="last")
                user_emb, item_emb = _l2rows(u_agg), _l2rows(i_agg)
                item_res = item_res + item_emb
            return item_res
        for _ in range(self.context_hops):
            u_agg = self.seg_ieu.sum(ui_w[:, None] * self.seg_iei.take(item_emb))
            i_agg = self.seg_iei.sum(ui_w[:, None] * self.seg_ieu.take(user_emb))
            user_emb, item_emb = _l2rows(u_agg), _l2rows(i_agg)
            item_res = item_res + item_emb
        return item_res

    def _forward_kg(self, params, kg_mask):
        entity_emb = params["all_embed"][self.user_num:]
        res = entity_emb
        for _ in range(self.context_hops):
            contrib = (self.seg_t.take(entity_emb)
                       * self.rel_take.take(params["relation_emb"])
                       * kg_mask[:, None])
            cnt = self.seg_h.sum(kg_mask)
            agg = self.seg_h.sum(contrib) / jnp.maximum(cnt, 1.0)[:, None]
            entity_emb = _l2rows(agg)
            res = res + entity_emb
        return res[: self.item_num]

    def _contrast(self, params, key, z1, z2):
        def mlp(ps, x):
            return (jax.nn.relu(x @ ps[0]["w"] + ps[0]["b"])) @ ps[1]["w"] + ps[1]["b"]

        h1 = _l2rows(mlp(params["cl_mlp1"], z1))
        h2 = _l2rows(mlp(params["cl_mlp2"], z2))
        f = lambda x: jnp.exp(x / self.tau)
        between = f(jnp.sum(h1 * h2, -1))
        perm = jax.random.permutation(key, z1.shape[0])
        neg = f(jnp.sum(h1 * h2[perm], -1)) + f(jnp.sum(h2 * h1[perm], -1))
        return jnp.mean(-jnp.log(between / (2 * between + neg) + 1e-12))

    # -- loss ----------------------------------------------------------------
    def loss(self, params, batch, key):
        user, pos, neg = batch["user"], batch["pos"], batch["neg"]
        ks = jax.random.split(key, 8)
        item_emb_0 = params["all_embed"][self.user_num:]

        # 1. graph sparsification (per-relation ≈ uniform bernoulli keep)
        live = jax.random.bernoulli(ks[0], 1 - self.node_dropout_rate,
                                    (self.n_kg,)).astype(jnp.float32)
        # 2. rationale scores
        attn_score, _ = self._norm_attn(params, item_emb_0, live)
        # per-item mean attention (head/tail) for UI-side sampling
        am1 = self.seg_h.sum(attn_score) / jnp.maximum(self.seg_h.sum(live), 1.0)
        am2 = self.seg_t.sum(attn_score) / jnp.maximum(self.seg_t.sum(live), 1.0)
        am1 = jnp.where(am1 == 0.0, 1.0, am1)
        am2 = jnp.where(am2 == 0.0, 1.0, am2)
        item_attn_mean = (0.5 * am1 + 0.5 * am2)[: self.item_num]

        # 3. MAE mask: gumbel top-k among live + equal random set
        gum = -jnp.log(-jnp.log(jax.random.uniform(ks[1], (self.n_kg,)) + 1e-12))
        noisy = jnp.where(live > 0, attn_score + gum, -jnp.inf)
        _, top_ids = jax.lax.top_k(noisy, self.mae_msize)
        rand_ids = jax.random.randint(ks[2], (self.mae_msize,), 0, self.n_kg)
        mae_ids = jnp.concatenate([top_ids, rand_ids])
        mae_mask = jnp.zeros((self.n_kg,)).at[mae_ids].set(1.0)
        enc_mask = live * (1.0 - mae_mask)

        ie_mask = jax.random.bernoulli(ks[3], 1 - self.node_dropout_rate,
                                       (self.n_ui,)).astype(jnp.float32)

        ent_emb, usr_emb = self._gcn(params, ks[4], enc_mask, ie_mask, True)
        u_e, p_e, n_e = usr_emb[user], ent_emb[pos], ent_emb[neg]
        mf = -jnp.mean(jax.nn.log_sigmoid(jnp.sum(u_e * p_e, 1)
                                          - jnp.sum(u_e * n_e, 1)))
        reg = self.decay * (jnp.sum(u_e**2) + jnp.sum(p_e**2)
                            + jnp.sum(n_e**2)) / 2.0 / u_e.shape[0]

        # MAE reconstruction on the masked edges
        mh, mt = self.kg_heads[mae_ids], self.kg_tails[mae_ids]
        mrel = params["relation_emb"][self.kg_rels[mae_ids] - 1]
        mae = self.mae_coef * jnp.mean(-jnp.log(jax.nn.sigmoid(
            jnp.sum(ent_emb[mt] * mrel * ent_emb[mh], 1)) + 1e-12))

        # CL: top-attention KG view vs gumbel-top-k UI view
        k_keep = int((1 - self.cl_drop) * self.n_kg)
        thresh = jnp.sort(jnp.where(live > 0, attn_score, -jnp.inf))[-k_keep]
        cl_kg_mask = ((attn_score >= thresh) & (live > 0)).astype(jnp.float32)
        ui_logits = item_attn_mean[self.ie_i] - jnp.log(
            -jnp.log(jax.random.uniform(ks[5], (self.n_ui,)) + 1e-12))
        k_ui = int((1 - self.cl_drop) * self.n_ui)
        ui_th = jnp.sort(ui_logits)[-k_ui]
        cl_ui_mask = (ui_logits >= ui_th).astype(jnp.float32)
        ui_w = self.ie_w * ie_mask / (1 - self.node_dropout_rate)
        ui_w = ui_w * cl_ui_mask / (1 - self.cl_drop)
        item_ui = self._forward_ui(params, ui_w)
        item_kg = self._forward_kg(params, cl_kg_mask)
        cl = self.cl_coef * self._contrast(params, ks[6], item_ui, item_kg)

        return mf + reg + mae + cl, {"rec_loss": mf, "mae_loss": mae,
                                     "cl_loss": cl}

    def generate(self, params):
        ent, usr = self._gcn(params, jax.random.PRNGKey(0),
                             jnp.ones((self.n_kg,), jnp.float32),
                             jnp.ones((self.n_ui,), jnp.float32)
                             * (1 - self.node_dropout_rate), False)
        return usr, ent[: self.item_num]
