"""KGCL — knowledge-graph contrastive learning with KG-stability-guided
UI-graph augmentation.

Parity with ``models/kg/kgcl.py:87-386``:

- RGAT over (head, relation, tail) edges: per-edge logit
  ``⟨fc([h;t]), rel⟩`` → leaky-relu → per-head segment softmax → weighted
  tail aggregation, L2-normalised per hop, *last hop returned* (``:74-85``).
- Per-epoch augmentation (``get_aug_views`` ``:230-247``): two 50% KG edge
  samples → entity stability (cosine) → per-item keep weights (exp, min-max,
  floors at 0.3 / cap 0.95, mean-scaled by μ) → two Bernoulli UI-edge views.
- Loss: BPR (+decay·½L2/B), and InfoNCE over the two full-view forwards.
- Optional TransE objective over full triplets (``cal_kg_loss`` ``:323-349``)
  with its own Adam (``KGCLTrainer``, reference ``trainer/trainer.py:495-575``)
  — exposed via the model's ``kg_loss`` / ``kg_batch`` hooks.

TPU-native formulation: every variable-nnz structure is a static edge list + a
0/1 mask.  KG edge sampling masks attention logits to −∞ (excluded from the
segment softmax); UI view adjacencies reuse one square structure whose
normalised values are recomputed on device from the rect-edge mask
(``MaskableBiAdj``); node dropout on the UI graph is a value mask with
1/(1−rate) rescale.  The whole epoch-level view generation is a single jitted
function (``epoch_state``), not a host rebuild.

No ``hparams()`` hook (tuner note, r5): the shipped tune grid is ENTIRELY
structural -- ``layer_num`` sizes the UI propagation loop (reference
``kgcl.py:103,295``; the Python hop loop here).  Each trial is a different
compiled program, so the tuner's serial structural-group fallback is the
only correct execution; no traced lane exists to vmap.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.utils.initializers import normal_init, xavier_uniform


def _l2norm_rows(x):
    # sqrt(sum+eps) keeps the gradient finite at exactly-zero rows (which occur
    # for fully-masked / isolated nodes); jnp.linalg.norm's grad NaNs at 0.
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True) + 1e-12)


class KGCL(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.n_relations = data.extras["relation_num"]
        self.n_entities = data.extras["entity_num"]
        self.n_nodes = data.extras["node_num"]
        self.heads = data.extras["kg_heads"]
        self.rels = data.extras["kg_rels"]
        self.tails = data.extras["kg_tails"]
        self.bi = data.extras["bi_adj_maskable"]

        self.tau = float(m.get("tau", 0.2))
        self.cl_weight = float(m.get("cl_weight", 0.1))
        self.mu = float(m.get("mu", 0.95))
        self.decay = float(m.decay_weight)
        self.context_hops = int(m.layer_num_kg)
        self.layer_num = int(m.layer_num)
        self.node_dropout = bool(m.node_dropout)
        self.node_dropout_rate = float(m.node_dropout_rate)
        self.mess_dropout = bool(m.mess_dropout)
        self.mess_dropout_rate = float(m.mess_dropout_rate)
        self.train_trans = bool(m.get("train_trans", False))
        self._kg_triplets = data.extras["kg_triplets_full"]
        # scatter-free segment ops for the RGAT hop (blocked kernels on TPU)
        from sslrec_tpu.ops.pallas_segment import OneHotTake, SegmentOps
        self.seg_h = SegmentOps(self.heads, self.n_entities)
        self.seg_t = SegmentOps(self.tails, self.n_entities)
        self.rel_take = OneHotTake(self.rels, self.n_relations)

        # Under a config-driven mesh with a model axis, the UI propagation
        # runs graph-partitioned (destination-owned edge shards + all_gather
        # hops, ``parallel/dist_train.py``) instead of leaving the replicated
        # edge arrays to GSPMD — the per-view normalised values ride the
        # partitioned layout through ``src_idx`` (view_vals_partitioned).
        from sslrec_tpu.parallel.mesh import MODEL_AXIS, mesh_from_config
        self._mesh = mesh_from_config(cfg)
        self._sg = None
        if self._mesh is not None and self._mesh.shape.get(MODEL_AXIS, 1) > 1:
            from sslrec_tpu.ops.sparse import CooGraph
            from sslrec_tpu.parallel.dist_train import partition_graph
            rows = np.asarray(self.bi._rows)
            cols = np.asarray(self.bi._cols)
            g = CooGraph(rows=rows, cols=cols,
                         vals=np.ones(rows.shape[0], np.float32),
                         n_rows=self.bi.n_nodes, n_cols=self.bi.n_nodes)
            self._sg = partition_graph(g, self.user_num, self.item_num,
                                       int(self._mesh.shape[MODEL_AXIS]))

    def init_params(self, key):
        ks = jax.random.split(key, 5)
        d = self.embedding_size
        return {
            "all_embed": normal_init(ks[0], (self.n_nodes, d), 0.1),
            "relation_embed": normal_init(ks[1], (self.n_relations, d), 0.1),
            "rgat_w": xavier_uniform(ks[2], (d, d)) * 1.414,
            "rgat_a": xavier_uniform(ks[3], (2 * d, 1)) * 1.414,
            "rgat_fc": {
                "w": xavier_uniform(ks[4], (2 * d, d)),
                "b": jnp.zeros((d,)),
            },
        }

    # -- RGAT ---------------------------------------------------------------
    def _hop0(self, params, entity_emb):
        """Shared hop-0 tensors: the first RGAT hop's endpoint gathers,
        projection and raw logits depend only on ``entity_emb`` — NOT on the
        per-view edge masks — so the loss's three parity-required forwards
        (main + two contrastive views) compute them once.  Per-edge gathers
        are fetch-count latency-bound (~6.5ns/row), so sharing hop 0 removes
        a third of the RGAT's gather volume per training step."""
        out_t = self.seg_t.take(entity_emb)
        a_in = jnp.concatenate([self.seg_h.take(entity_emb), out_t], axis=-1)
        proj = a_in @ params["rgat_fc"]["w"] + params["rgat_fc"]["b"]
        logits = jax.nn.leaky_relu(
            jnp.sum(proj * self.rel_take.take(params["relation_embed"]),
                    axis=-1), 0.2)
        return out_t, logits

    def _rgat(self, params, key, entity_emb, edge_mask=None,
              mess_dropout=False, hop0=None):
        out = entity_emb
        for hop in range(self.context_hops):
            if hop == 0 and hop0 is not None:
                out_t, logits = hop0
            else:
                out_h, out_t = self.seg_h.take(out), self.seg_t.take(out)
                a_in = jnp.concatenate([out_h, out_t], axis=-1)
                proj = a_in @ params["rgat_fc"]["w"] + params["rgat_fc"]["b"]
                logits = jax.nn.leaky_relu(
                    jnp.sum(proj * self.rel_take.take(params["relation_embed"]), axis=-1), 0.2)
            if edge_mask is not None:
                logits = jnp.where(edge_mask > 0, logits, -1e9)
            # fused softmax+aggregate; edge_mask keeps fully-masked heads at
            # exact zeros (numerator AND denominator masked — masked edges'
            # exp(-1e9-shift) underflows to 0 either way)
            agg = self.seg_h.attn(logits, out_t, edge_mask)
            if mess_dropout:
                key, sub = jax.random.split(key)
                keep = jax.random.bernoulli(sub, 1 - self.mess_dropout_rate, agg.shape)
                agg = jnp.where(keep, agg / (1 - self.mess_dropout_rate), 0.0)
            out = _l2norm_rows(agg)
        return out

    # -- UI propagation -----------------------------------------------------
    def _ui_prop(self, params, entity_emb, adj_vals):
        user_emb = params["all_embed"][: self.user_num]
        if self._sg is not None:
            from sslrec_tpu.parallel.dist_train import (
                mesh_partitioned_propagate, view_vals_partitioned)
            pv = view_vals_partitioned(self._sg, adj_vals)
            return mesh_partitioned_propagate(
                self._mesh, self._sg, user_emb, entity_emb[: self.item_num],
                pv, self.layer_num, combine="mean")
        all_emb = jnp.concatenate([user_emb, entity_emb[: self.item_num]], axis=0)
        acc = [all_emb]
        for _ in range(self.layer_num):
            all_emb = spmm(self.bi.graph, all_emb, edge_weight=adj_vals)
            acc.append(all_emb)
        mean = sum(acc) / len(acc)
        return mean[: self.user_num], mean[self.user_num:]

    def forward(self, params, key, kg_mask=None, adj_vals=None,
                training=False, hop0=None):
        entity_emb = params["all_embed"][self.user_num:]
        kd, kr = jax.random.split(key)
        entity_emb = self._rgat(params, kr, entity_emb, edge_mask=kg_mask,
                                mess_dropout=self.mess_dropout and training,
                                hop0=hop0)
        if adj_vals is None:
            adj_vals = self.bi.view_vals(jnp.ones((self.bi.nnz_rect,), jnp.float32))
        return self._ui_prop(params, entity_emb, adj_vals)

    # -- per-epoch view generation (trainer hook) ---------------------------
    def epoch_state(self, params, key, epoch):
        if not hasattr(self, "_views_fn"):
            @jax.jit
            def views_fn(params, key):
                k1, k2, k3, k4 = jax.random.split(key, 4)
                n_kg = self.heads.shape[0]
                kg_m1 = jax.random.bernoulli(k1, 0.5, (n_kg,)).astype(jnp.float32)
                kg_m2 = jax.random.bernoulli(k2, 0.5, (n_kg,)).astype(jnp.float32)
                entity_emb = params["all_embed"][self.user_num:]
                v1 = self._rgat(params, k1, entity_emb, edge_mask=kg_m1)[: self.item_num]
                v2 = self._rgat(params, k2, entity_emb, edge_mask=kg_m2)[: self.item_num]
                v1n, v2n = _l2norm_rows(v1), _l2norm_rows(v2)
                stability = jnp.sum(v1n * v2n, axis=-1)
                s = jnp.exp(stability)
                w = (s - s.min()) / (s.max() - s.min() + 1e-12)
                w = jnp.maximum(w, 0.3)
                w = jnp.minimum(self.mu / jnp.mean(w) * w, 0.95)
                # per-rect-edge keep prob = weight of the edge's item
                item_of_edge = self.bi.rect_item_ids
                p = w[item_of_edge]
                m1 = jax.random.bernoulli(k3, p).astype(jnp.float32)
                m2 = jax.random.bernoulli(k4, p).astype(jnp.float32)
                return {
                    "kg_mask1": kg_m1, "kg_mask2": kg_m2,
                    "ui_vals1": self.bi.view_vals(m1),
                    "ui_vals2": self.bi.view_vals(m2),
                }

            self._views_fn = views_fn
        return self._views_fn(jax.lax.stop_gradient(params), key)

    # -- loss ---------------------------------------------------------------
    def loss(self, params, batch, key):
        aux = batch["aux"]
        user, pos, neg = batch["user"], batch["pos"], batch["neg"]
        kmain, kdrop, kv1, kv2 = jax.random.split(key, 4)

        if self.node_dropout:
            k1, k2 = jax.random.split(kdrop)
            rect_m = jax.random.bernoulli(
                k1, 1 - self.node_dropout_rate, (self.bi.nnz_rect,)
            ).astype(jnp.float32)
            adj_vals = self.bi.view_vals(rect_m) / (1 - self.node_dropout_rate)
            kg_keep = jax.random.bernoulli(
                k2, 1 - self.node_dropout_rate, self.heads.shape).astype(jnp.float32)
        else:
            adj_vals = None
            kg_keep = None

        # shared hop-0: identical across the three forwards (masks only touch
        # the logits downstream); autodiff also merges their three take-
        # cotangents into ONE blocked reduction each
        hop0 = self._hop0(params, params["all_embed"][self.user_num:])
        user_emb, item_emb = self.forward(params, kmain, kg_mask=kg_keep,
                                          adj_vals=adj_vals, training=True,
                                          hop0=hop0)
        u_e, pos_e, neg_e = user_emb[user], item_emb[pos], item_emb[neg]
        rec = losses.bpr_loss(u_e, pos_e, neg_e)
        reg = 0.5 * (jnp.sum(u_e**2) + jnp.sum(pos_e**2) + jnp.sum(neg_e**2)) \
            / u_e.shape[0]

        u1, i1 = self.forward(params, kv1, kg_mask=aux["kg_mask1"],
                              adj_vals=aux["ui_vals1"], hop0=hop0)
        u2, i2 = self.forward(params, kv2, kg_mask=aux["kg_mask2"],
                              adj_vals=aux["ui_vals2"], hop0=hop0)
        cl = self.cl_weight * (
            self._infonce_overall(u1[user], u2[user], u2)
            + self._infonce_overall(i1[pos], i2[pos], i2))
        loss = rec + self.decay * reg + cl
        return loss, {"rec_loss": rec, "cl_loss": cl}

    def _infonce_overall(self, z1, z2, z_all):
        """(``kgcl.py:351-371``) cosine-similarity InfoNCE, sum-reduced."""
        z1n, z2n, zan = _l2norm_rows(z1), _l2norm_rows(z2), _l2norm_rows(z_all)
        between = jnp.exp(jnp.sum(z1n * z2n, axis=-1) / self.tau)
        denom = jnp.sum(jnp.exp(z1n @ zan.T / self.tau), axis=1)
        return jnp.sum(-jnp.log(between / denom + 1e-12))

    # -- TransE auxiliary objective (used when train_trans) ------------------
    def kg_loss(self, params, batch):
        h, r, pos_t, neg_t = batch
        ent = params["all_embed"][self.user_num:]
        r_e = params["relation_embed"][r]
        h_e, p_e, n_e = ent[h], ent[pos_t], ent[neg_t]
        pos_score = jnp.sum((h_e + r_e - p_e) ** 2, axis=1)
        neg_score = jnp.sum((h_e + r_e - n_e) ** 2, axis=1)
        kg = jnp.mean(-jax.nn.log_sigmoid(neg_score - pos_score))
        l2 = sum(jnp.mean(jnp.sum(x**2, 1) / 2.0) for x in (h_e, r_e, p_e, n_e))
        return kg + 1e-3 * l2

    def generate(self, params):
        return self.forward(params, jax.random.PRNGKey(0))
