"""KMCLR — multi-behavior GCN coupled with a knowledge-graph LightGCN whose
item embeddings come from a relation-aware GAT; KG-guided contrastive views.

Parity with ``models/multi_behavior/kmclr.py:35-760`` and ``KMCLRTrainer``
(``trainer/trainer.py:901-1049``):

- MB side: the CML-style multi-behavior GCN (mean-fused per-layer behavior
  propagations, concat+projection), trained with two sequential updates per
  batch; the second mixes ``0.9·mb_user + 0.1·kg_user`` embeddings.
- KG side: dual item/entity/relation embedding sets; per-item relation-GAT
  aggregation over padded entity lists; LightGCN over the buy graph; per-epoch
  TransR and TATEC objectives with their own Adam; KG-stability-weighted UI
  edge views feed a GRACE-style contrast during a BPR pass over buy pairs.
  (The reference wires that BPR/contrast pass to the *multi-behavior*
  optimiser, whose parameter set receives no gradients from it — effectively a
  no-op; here it updates the KG parameters with the KG Adam, matching the
  paper's intent.  Noted as a deliberate deviation.)
- SSL: CML's chunk-excluded InfoNCE on the user side only.

No ``hparams()`` hook (tuner note): the shipped tune grid's ``reg_weight``
lane is a DEAD KNOB in the reference — nothing in the reference KMCLR model
or ``KMCLRTrainer`` reads ``configs['model']['reg_weight']`` (verified by
grep over ``models/multi_behavior/kmclr.py`` and ``trainer/trainer.py:
901-1049``); the effective regularisation is the optimisers'
``weight_decay``/``decay``.  Vmapping a no-op lane would produce identical
trials, so the grid stays on the tuner's serial fallback with its logged
reason (``trainer/tuner.py``).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax
import optax

from sslrec_tpu.data.sampling import sample_negatives
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.ops.segment import segment_sum
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.utils.initializers import linear_params, normal_init, xavier_uniform


def _l2rows(x):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), -1, keepdims=True) + 1e-12)


class KMCLR(RecModel):
    batch_fields = ("user", "pos")

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        t = cfg.train
        self.graphs = data.extras["behavior_graphs"]
        self.n_beh = len(self.graphs)
        self.gnn_layer = int(m.layer_num)
        self.emb = int(m.embedding_size)
        self.beta = float(m.get("beta", 0.005))
        self.ipm = float(m.get("inner_product_mult", 1.0))
        self.ssl_batch = int(t.get("SSL_batch", 30))
        self.batch_size = int(t.batch_size)
        self.wd = float(cfg.optimizer.get("weight_decay", 0) or 1e-4)

        # KG side config
        self.latent = int(m.get("latent_dim_rec", self.emb))
        self.kg_layers = int(m.get("lightGCN_n_layers", 3))
        self.keep_prob = float(m.get("keep_prob", 0.7))
        self.kg_p_drop = float(m.get("kg_p_drop", 0.5))
        self.kgc_temp = float(m.get("kgc_temp", 0.2))
        self.kg_lr = float(m.get("kg_lr", 1e-3))
        self.bpr_bsz = int(m.get("bpr_batch_size", 2048))
        self.kg_decay = float(m.get("decay", 1e-4))
        self.ssl_reg = 0.1

        # KG structures: per-item padded entity/relation lists + buy graph
        trip = data.extras.get("kg_triplets")  # [n, 3] h, r, t over items/ents
        if trip is None:
            trip = np.zeros((1, 3), np.int64)
        self.n_entities = int(max(trip[:, 2].max(initial=0),
                                  trip[:, 0].max(initial=0)) + 1)
        self.n_relations = int(trip[:, 1].max(initial=0) + 1)
        by_item = {}
        for h, r, tt in trip:
            by_item.setdefault(int(h), []).append((int(r), int(tt)))
        cap = max((len(v) for v in by_item.values()), default=1)
        cap = min(cap, 32)
        ents = np.full((self.item_num, cap), self.n_entities, np.int32)
        rels = np.full((self.item_num, cap), self.n_relations, np.int32)
        for i, lst in by_item.items():
            if i >= self.item_num:
                continue
            for j, (r, tt) in enumerate(lst[:cap]):
                ents[i, j] = tt
                rels[i, j] = r
        self.item_ents = jnp.asarray(ents)
        self.item_rels = jnp.asarray(rels)
        self.kg_cap = cap
        self.kg_trip = (jnp.asarray(trip[:, 0].astype(np.int32)),
                        jnp.asarray(trip[:, 1].astype(np.int32)),
                        jnp.asarray(trip[:, 2].astype(np.int32)))
        ht = sp.coo_matrix((np.ones(len(trip), np.float32),
                            (trip[:, 0], trip[:, 2])),
                           shape=(max(self.n_entities, self.item_num),
                                  self.n_entities))
        self.kg_edge_set = sparse_ops.build_edge_set(ht)

        # buy graph (target behavior) as a maskable square adjacency
        from sslrec_tpu.data.kg import MaskableBiAdj
        buy = data.extras["behavior_mats_scipy"][-1].tocoo()
        self.buy_edges = (jnp.asarray(buy.row.astype(np.int32)),
                          jnp.asarray(buy.col.astype(np.int32)))
        self.n_buy = int(buy.nnz)
        self.bi = MaskableBiAdj(buy, self.user_num, self.item_num)
        self.buy_edge_set = sparse_ops.build_edge_set(buy)

        # Under train.mesh with a model axis (r5, KGCL pattern): the KG-view
        # LightGCN over the buy bi-adjacency and the per-behavior (A, AT)
        # simultaneous stacks both run graph-partitioned.
        from sslrec_tpu.data.multi_behavior import normalize_rect
        from sslrec_tpu.parallel.dist_train import maybe_partition_bi
        self._mesh, self._sg_bi = maybe_partition_bi(
            cfg, self.bi._rows, self.bi._cols, self.user_num, self.item_num)
        self._sg_beh = None
        sgs = []
        for coo in data.extras["behavior_mats_scipy"]:
            binm = (coo != 0) * 1.0
            a = normalize_rect(binm).tocoo()
            at = normalize_rect(binm.T).tocoo()
            rows = np.concatenate([a.row.astype(np.int64),
                                   self.user_num + at.row.astype(np.int64)])
            cols = np.concatenate([self.user_num + a.col.astype(np.int64),
                                   at.col.astype(np.int64)])
            vals = np.concatenate([a.data, at.data]).astype(np.float32)
            _, sg = maybe_partition_bi(cfg, rows, cols, self.user_num,
                                       self.item_num, vals=vals)
            if sg is None:
                sgs = None
                break
            sgs.append(sg)
        if sgs:
            self._sg_beh = sgs

        self._kg_opt = optax.adam(self.kg_lr)
        self.opt_model = optax.chain(optax.clip_by_global_norm(20.0),
                                     optax.adam(float(cfg.optimizer.lr)))

        # per-behavior sampling structures (shared with the CML sampler)
        self.samp_num = int(t.get("sampNum", 10))
        self._beh_csr = []
        self._beh_edge_sets = []
        self._beh_items = []
        for coo in data.extras["behavior_mats_scipy"]:
            csr = coo.tocsr()
            self._beh_csr.append((jnp.asarray(csr.indptr.astype(np.int32)),
                                  jnp.asarray(csr.indices.astype(np.int32))))
            self._beh_edge_sets.append(sparse_ops.build_edge_set(coo))
            self._beh_items.append(jnp.asarray(
                np.unique(coo.tocoo().col).astype(np.int32)))

    # -- params ---------------------------------------------------------------
    def init_params(self, key):
        d, dl = self.emb, self.latent
        ks = jax.random.split(key, 8 + 2 * self.gnn_layer)
        mb = {
            "user_emb": xavier_uniform(ks[0], (self.user_num, d)),
            "item_emb": xavier_uniform(ks[1], (self.item_num, d)),
            "u_cat_w": xavier_uniform(ks[2], (self.gnn_layer * d, d)),
            "i_cat_w": xavier_uniform(ks[3], (self.gnn_layer * d, d)),
            "u_w": [xavier_uniform(k, (d, d)) for k in ks[4:4 + self.gnn_layer]],
            "i_w": [xavier_uniform(k, (d, d))
                    for k in ks[4 + self.gnn_layer:4 + 2 * self.gnn_layer]],
        }
        kk = jax.random.split(jax.random.fold_in(key, 99), 14)
        gain = np.sqrt(2.0)
        kg = {
            "user": normal_init(kk[0], (self.user_num, dl), 0.1),
            "item": [normal_init(kk[1], (self.item_num, dl), 0.1),
                     normal_init(kk[2], (self.item_num, dl), 0.1)],
            "entity": [normal_init(kk[3], (self.n_entities + 1, dl), 0.1),
                       normal_init(kk[4], (self.n_entities + 1, dl), 0.1)],
            "relation": [normal_init(kk[5], (self.n_relations + 1, dl), 0.1),
                         normal_init(kk[6], (self.n_relations + 1, dl), 0.1)],
            "transR_W": xavier_uniform(kk[7], (self.n_relations + 1, dl, dl)) * gain,
            "TATEC_W": xavier_uniform(kk[8], (self.n_relations + 1, dl, dl)) * gain,
            "gat_fc": linear_params(kk[9], 3 * dl, 1),
            "gat_out": linear_params(kk[10], dl, dl),
        }
        return {"mb": mb, "kg": kg}

    def init_opt_state(self, params):
        return {"model": self.opt_model.init(params),
                "kg": self._kg_opt.init(params)}

    # -- MB GCN (CML-style) ----------------------------------------------------
    def _mb_gcn(self, g):
        u, i = g["user_emb"], g["item_emb"]
        cat_u, cat_i, cat_us = [], [], []
        for l in range(self.gnn_layer):
            if self._sg_beh is not None:
                from sslrec_tpu.parallel.dist_train import \
                    mesh_partitioned_propagate
                hops = [mesh_partitioned_propagate(self._mesh, sg, u, i,
                                                   sg.vals, 1, combine="last")
                        for sg in self._sg_beh]
                us = [h[0] for h in hops]
                is_ = [h[1] for h in hops]
            else:
                us = [spmm(a, i) for a, _ in self.graphs]
                is_ = [spmm(at, u) for _, at in self.graphs]
            u = jax.nn.sigmoid(sum(us) / self.n_beh @ g["u_w"][l])
            i = jax.nn.sigmoid(sum(is_) / self.n_beh @ g["i_w"][l])
            cat_u.append(u)
            cat_i.append(i)
            cat_us.append(jnp.stack([jax.nn.sigmoid(x @ g["u_w"][l]) for x in us]))
        user_embed = jnp.concatenate(cat_u, -1) @ g["u_cat_w"]
        item_embed = jnp.concatenate(cat_i, -1) @ g["i_cat_w"]
        user_embeds = jnp.concatenate(cat_us, -1) @ g["u_cat_w"]
        return user_embed, item_embed, user_embeds

    # -- KG item embedding via relation-GAT ------------------------------------
    def _rgat_items(self, kg, index, ent_mask=None):
        item_embs = kg["item"][index]                         # [I, d]
        ents = kg["entity"][index][self.item_ents]            # [I, cap, d]
        rels = kg["relation"][index][self.item_rels]
        pad = (self.item_ents != self.n_entities)
        if ent_mask is not None:
            pad = pad & ent_mask
        wh = jnp.broadcast_to(item_embs[:, None, :], ents.shape)
        e = jax.nn.leaky_relu(
            (jnp.concatenate([wh, rels, ents], -1) @ kg["gat_fc"]["w"]
             + kg["gat_fc"]["b"])[..., 0], 0.2)
        e = jnp.where(pad, e, -9e15)
        att = jax.nn.softmax(e, axis=1)
        agg = jnp.sum(att[..., None] * ents, axis=1)
        out = jax.nn.relu((agg + item_embs) @ kg["gat_out"]["w"]
                          + kg["gat_out"]["b"])
        return out

    def _bi_propagate(self, user_emb, items, adj_vals):
        """Mean-combined LightGCN over the buy bi-adjacency; rides the
        partitioned layout under train.mesh (per-view adj_vals through
        src_idx, r5)."""
        if self._sg_bi is not None:
            from sslrec_tpu.parallel.dist_train import (
                mesh_partitioned_propagate, view_vals_partitioned)
            pv = view_vals_partitioned(self._sg_bi, adj_vals)
            return mesh_partitioned_propagate(
                self._mesh, self._sg_bi, user_emb, items, pv,
                self.kg_layers, combine="mean")
        all_emb = jnp.concatenate([user_emb, items], 0)
        acc = [all_emb]
        for _ in range(self.kg_layers):
            acc.append(spmm(self.bi.graph, acc[-1], edge_weight=adj_vals))
        out = sum(acc) / (self.kg_layers + 1)
        return out[: self.user_num], out[self.user_num:]

    def _kg_computer(self, kg, adj_vals=None):
        items = (self._rgat_items(kg, 0) + self._rgat_items(kg, 1)) / 2.0
        if adj_vals is None:
            adj_vals = self.bi.view_vals(jnp.ones((self.bi.nnz_rect,)))
        return self._bi_propagate(kg["user"], items, adj_vals)

    def _kg_view_computer(self, kg, adj_vals, index):
        items = self._rgat_items(kg, index)
        return self._bi_propagate(kg["user"], items, adj_vals)

    # -- TransR / TATEC -------------------------------------------------------
    def _trans_loss(self, kg, batch, index, mode):
        h, r, pos_t, neg_t = batch
        r_e = kg["relation"][index][r][:, :, None]
        h_e = kg["item"][index][jnp.clip(h, 0, self.item_num - 1)][:, :, None]
        p_e = kg["entity"][index][pos_t][:, :, None]
        n_e = kg["entity"][index][neg_t][:, :, None]
        if mode == "transR":
            w = kg["transR_W"][r]
            hh, pp, nn = w @ h_e, w @ p_e, w @ n_e
            pos = jnp.sum((hh + r_e - pp) ** 2, axis=1)
            neg = jnp.sum((hh + r_e - nn) ** 2, axis=1)
            extra = jnp.sqrt(jnp.sum(kg["transR_W"] ** 2) + 1e-12)
        else:
            w = kg["TATEC_W"][r]
            pos = (jnp.sum(h_e * (w @ p_e), 1) + jnp.sum(h_e * r_e, 1)
                   + jnp.sum(p_e * r_e, 1) + jnp.sum(h_e * p_e, 1))
            neg = (jnp.sum(h_e * (w @ n_e), 1) + jnp.sum(h_e * r_e, 1)
                   + jnp.sum(n_e * r_e, 1) + jnp.sum(h_e * n_e, 1))
            extra = jnp.sqrt(jnp.sum(kg["TATEC_W"] ** 2) + 1e-12)
        kg_l = jnp.mean(-jax.nn.log_sigmoid((neg - pos)[:, 0] if mode == "transR"
                                            else (neg - pos)[:, 0]))
        l2 = sum(jnp.mean(jnp.sum(x[..., 0] ** 2, 1) / 2.0)
                 for x in (h_e, r_e, p_e, n_e)) + extra
        return kg_l + 1e-3 * l2

    # -- per-epoch hook: KG training + views ----------------------------------
    def epoch_state(self, params, key, epoch):
        if not hasattr(self, "_kg_fns"):
            self._build_kg_fns()
        k1, k2, k3, k4 = jax.random.split(key, 4)
        kgp = params["kg"]
        kg_opt_state = self._epoch_kg_opt_state
        kgp, kg_opt_state = self._kg_fns["trans_epoch"](kgp, kg_opt_state, k1)
        views = self._kg_fns["make_views"](kgp, k2)
        kgp, kg_opt_state = self._kg_fns["bpr_contrast"](kgp, kg_opt_state, k3,
                                                         views)
        self._epoch_kg_opt_state = kg_opt_state
        self._pending_kg = kgp  # merged into params by train_step round A
        kg_u, kg_i = self._kg_fns["get_all"](kgp)
        return {"kg_user": kg_u, "kg_params": kgp}

    def _build_kg_fns(self):
        n_trip = int(self.kg_trip[0].shape[0])
        kg_bsz = min(4096, max(n_trip, 1))
        n_batches = max(n_trip // kg_bsz, 1)
        self._epoch_kg_opt_state = None

        def trans_epoch(kgp, opt_state, key):
            if opt_state is None:
                opt_state = self._kg_opt.init(kgp)

            def step(carry, k):
                kgp, opt_state = carry
                ki, kn, km = jax.random.split(k, 3)
                idx = jax.random.randint(ki, (kg_bsz,), 0, n_trip)
                h = self.kg_trip[0][idx]
                r = self.kg_trip[1][idx]
                tt = self.kg_trip[2][idx]
                negs = sample_negatives(kn, h, self.kg_edge_set, self.n_entities)
                for mode in ("transR", "TATEC"):
                    loss, g = jax.value_and_grad(
                        lambda p: self._trans_loss(p, (h, r, tt, negs),
                                                   0 if mode == "transR" else 1,
                                                   mode))(kgp)
                    upd, opt_state = self._kg_opt.update(g, opt_state, kgp)
                    kgp = optax.apply_updates(kgp, upd)
                return (kgp, opt_state), loss

            keys = jax.random.split(key, n_batches)
            (kgp, opt_state), _ = lax.scan(step, (kgp, opt_state), keys)
            return kgp, opt_state

        def make_views(kgp, key):
            ks = jax.random.split(key, 6)
            vals = []
            for index, (ka, kb, kc) in enumerate(
                    [(ks[0], ks[1], ks[2]), (ks[3], ks[4], ks[5])]):
                m1 = jax.random.bernoulli(ka, 1 - self.kg_p_drop,
                                          self.item_ents.shape)
                m2 = jax.random.bernoulli(kb, 1 - self.kg_p_drop,
                                          self.item_ents.shape)
                v1 = self._rgat_items(kgp, index, m1)
                v2 = self._rgat_items(kgp, index, m2)
                stability = jnp.sum(_l2rows(v1) * _l2rows(v2), -1)  # [I]
                u = kgp["user"]
                it = kgp["item"][index]
                logits = u @ it.T                                # [U, I]
                user_sm = jax.nn.softmax(logits, axis=-1)
                ur, ic = self.buy_edges
                w = user_sm[ur, ic] * stability[ic]
                k_ = (1 - 0.6) / (w.max() - w.min() + 1e-12)
                probs = 0.6 + k_ * (w - w.min())
                keep = jax.random.bernoulli(kc, probs).astype(jnp.float32)
                vals.append(self.bi.view_vals(keep))
            return {"uiv1": vals[0], "uiv2": vals[1]}

        n_bpr = max(self.n_buy // self.bpr_bsz, 1)

        def bpr_contrast(kgp, opt_state, key, views):
            def step(carry, k):
                kgp, opt_state = carry
                ki, kn = jax.random.split(k)
                idx = jax.random.randint(ki, (self.bpr_bsz,), 0, self.n_buy)
                users = self.buy_edges[0][idx]
                poss = self.buy_edges[1][idx]
                negs = sample_negatives(kn, users, self.buy_edge_set,
                                        self.item_num)

                def loss_fn(p):
                    au, ai = self._kg_computer(p)
                    pos_s = jnp.sum(au[users] * ai[poss], 1)
                    neg_s = jnp.sum(au[users] * ai[negs], 1)
                    main = jnp.sum(jax.nn.softplus(-(pos_s - neg_s)))
                    reg = 0.5 * (jnp.sum(p["user"][users] ** 2)
                                 + jnp.sum(p["item"][0][poss] ** 2)
                                 + jnp.sum(p["item"][1][poss] ** 2)
                                 + jnp.sum(p["item"][0][negs] ** 2)
                                 + jnp.sum(p["item"][1][negs] ** 2)) \
                        / users.shape[0] * self.kg_decay
                    u1, i1 = self._kg_view_computer(p, views["uiv1"], 0)
                    u2, i2 = self._kg_view_computer(p, views["uiv2"], 1)

                    def semi(z1, z2):
                        f = jnp.exp(_l2rows(z1) @ _l2rows(z2).T / self.kgc_temp)
                        diag = jnp.diagonal(f)
                        return jnp.sum(-jnp.log(
                            diag / (jnp.sum(f, 1) - diag) + 1e-12))

                    ssl = (semi(u1[users], u2[users])
                           + semi(i1[poss], i2[poss])) * self.ssl_reg
                    return main + reg + ssl

                loss, g = jax.value_and_grad(loss_fn)(kgp)
                upd, opt_state = self._kg_opt.update(g, opt_state, kgp)
                kgp = optax.apply_updates(kgp, upd)
                return (kgp, opt_state), loss

            keys = jax.random.split(key, n_bpr)
            (kgp, opt_state), _ = lax.scan(step, (kgp, opt_state), keys)
            return kgp, opt_state

        def get_all(kgp):
            return self._kg_computer(kgp)

        self._kg_fns = {
            "trans_epoch": jax.jit(trans_epoch),
            "make_views": jax.jit(make_views),
            "bpr_contrast": jax.jit(bpr_contrast),
            "get_all": jax.jit(get_all),
        }

    # -- SSL (CML-style, user side) -------------------------------------------
    def _ssl(self, key, user_embeds, users):
        n = users.shape[0]
        s = max(n // 10, 1)
        sub = users[jax.random.permutation(key, n)[:s]]
        d = self.emb
        chunk_of = jnp.arange(s) // self.ssl_batch
        same = chunk_of[:, None] == chunk_of[None, :]
        out = []
        for b in range(self.n_beh):
            e1 = user_embeds[-1][sub]
            e2 = user_embeds[b][sub]
            scores = jnp.exp(e1 @ e2.T / (d + 1e-8))
            pos = jnp.exp(jnp.sum(e1 * e2, -1) / (d + 1e-8))
            neg = jnp.sum(jnp.where(same, 0.0, scores), -1)
            out.append(jnp.sum(-jnp.log(1e-8 + pos / (neg + 1e-8))))
        return out

    def _sample_behavior_batches(self, key, users, target_pos):
        # reuse the CML device sampler
        from sslrec_tpu.models.multi_behavior.cml import CML
        return CML._sample_behaviors(self, key, users, target_pos)

    # -- main two-round step ----------------------------------------------------
    def train_step(self, params, opt_state, batch, key):
        users = batch["user"]
        aux = batch["aux"]
        # adopt the KG params updated by the epoch hook
        params = dict(params, kg=aux["kg_params"])
        k1, k2, k3, k4 = jax.random.split(key, 4)
        pos_l, neg_l, valid_l = self._sample_behavior_batches(
            k1, users, batch["pos"])

        def round_loss(p, user_mix):
            ue, ie, ues = self._mb_gcn(p["mb"])
            if user_mix is not None:
                ue = 0.9 * ue + 0.1 * user_mix
            beh = []
            for b in range(self.n_beh):
                pi = jnp.sum(ue[users] * ie[pos_l[b]], 1) * self.ipm
                pj = jnp.sum(ue[users] * ie[neg_l[b]], 1) * self.ipm
                beh.append(jnp.sum(
                    -jnp.log(jax.nn.sigmoid(pi - pj) + 1e-8) * valid_l[b]))
            info = self._ssl(k2, ues, users)
            bpr = sum(beh) / self.n_beh
            nce = sum(info) / self.n_beh
            reg = (jnp.sum(ue[users] ** 2) + jnp.sum(ie[pos_l[-1]] ** 2)
                   + jnp.sum(ie[neg_l[-1]] ** 2))
            return (bpr + self.wd * reg + self.beta * nce) / self.batch_size, \
                (bpr, nce)

        zeros_kg = lambda g: {"mb": g["mb"],
                              "kg": jax.tree.map(jnp.zeros_like, g["kg"])}

        (l1, (bpr1, nce1)), g = jax.value_and_grad(
            lambda p: round_loss(p, None), has_aux=True)(params)
        upd, st = self.opt_model.update(zeros_kg(g), opt_state["model"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, model=st)

        (l2, (bpr2, nce2)), g = jax.value_and_grad(
            lambda p: round_loss(p, jax.lax.stop_gradient(aux["kg_user"])),
            has_aux=True)(params)
        upd, st = self.opt_model.update(zeros_kg(g), opt_state["model"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, model=st)

        return params, opt_state, {"loss": l1 + l2, "bpr_loss": bpr1 + bpr2,
                                   "infonce_loss": nce1 + nce2}

    def generate(self, params):
        ue, ie, _ = self._mb_gcn(params["mb"])
        return ue, ie
