"""CML — contrastive meta learning over behaviors with a meta-weight network
and a three-round per-batch optimisation.

Parity with ``models/multi_behavior/cml.py:15-516`` and ``CMLTrainer``
(``trainer/trainer.py:581-898``):

- GCN: per layer, per-behavior A/AT propagations are mean-fused (and kept
  per-behavior), sigmoid(W·); layer outputs concatenated then projected.
- ``MetaWeightNet``: per-behavior per-sample weights for the SSL and BPR loss
  vectors from (loss value ⊗ hidden) features through PReLU/dropout/batch-norm
  towers (``cml.py:477-516``).
- Per batch, three rounds: (1) clone the model, compute weighted losses, update
  the clone with a fresh AdamW and the meta-net with its AdamW; (2) recompute
  on the clone with freshly sampled behavior batches for the meta users and
  update the meta-net again; (3) recompute on the *original* model with
  stop-gradient meta weights and update it (AdamW, cyclic LR, grad-clip 20).
- ``_SSL`` (``trainer/trainer.py:760-860``): sub-sample 10% of the batch users;
  per behavior, InfoNCE between the target-behavior and behavior-b user
  embeddings where negatives exclude the user's own ``SSL_batch`` chunk.

Functional JAX makes the "clone" a pytree copy and the fresh per-batch AdamW a
single optimiser step from zero state.  Behavior-wise positive/negative
sampling (``CMLData.ng_sample``) runs on device: a global random item kept if
it is an edge, else a CSR-gather from the user's own row, else invalid
(loss-masked) — negatives rejection-sampled per behavior.

No ``hparams()`` hook (tuner note): the shipped tune grid's ``reg_weight``
lane is a DEAD KNOB in the reference — ``model.reg_weight`` is read only by
``CML.cal_loss`` (reference ``cml.py:67``), which ``CMLTrainer`` never calls;
the regulariser that actually trains is ``configs['train']['reg']``
(``trainer/trainer.py:667,704,735``).  Vmapping a no-op lane would produce
identical trials, so the grid stays on the tuner's serial fallback with its
logged reason (``trainer/tuner.py``); the live knobs here are ``train.reg`` /
``train.beta``, which are not in the shipped grid.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sslrec_tpu.data.sampling import sample_negatives
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


def _set_chain_lr(chain_state, lr):
    """Functionally set the injected learning_rate inside a
    (clip, inject_hyperparams(adamw)) chain state."""
    clip_st, inj_st = chain_state
    hp = dict(inj_st.hyperparams)
    hp["learning_rate"] = lr
    return (clip_st, inj_st._replace(hyperparams=hp))


def _cyclic_lr(epoch, base, mx, up=5, down=10):
    cycle = up + down
    pos = epoch % cycle
    frac = jnp.where(pos < up, pos / up, 1.0 - (pos - up) / down)
    return base + (mx - base) * frac


class CML(RecModel):
    batch_fields = ("user", "pos")

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        t = cfg.train
        self.graphs = data.extras["behavior_graphs"]
        self.n_beh = len(self.graphs)
        self.hidden = int(m.hidden_dim)
        self.gnn_layer = int(m.gnn_layer)
        self.slope = float(m.get("slope", 0.1))
        self.ipm = float(m.get("inner_product_mult", 1.0))
        self.samp_num = int(t.get("sampNum", 10))
        self.meta_batch = int(t.get("meta_batch", 128))
        self.ssl_batch = int(t.get("SSL_batch", 30))
        self.reg = float(t.get("reg", 1e-3))
        self.beta = float(t.get("beta", 5e-3))
        self.batch_size = int(t.batch_size)
        self.meta_users = data.extras.get("meta_users")
        if self.meta_users is None:
            self.meta_users = jnp.arange(self.user_num, dtype=jnp.int32)

        o = cfg.optimizer
        self.opt_model = optax.chain(
            optax.clip_by_global_norm(20.0),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=float(o.get("opt_base_lr", 1e-3)),
                weight_decay=float(o.get("opt_weight_decay", 1e-4) or 1e-4)))
        self.opt_meta = optax.chain(
            optax.clip_by_global_norm(20.0),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=float(o.get("meta_opt_base_lr", 1e-4)),
                weight_decay=float(o.get("meta_opt_weight_decay", 1e-4) or 1e-4)))
        self.opt_clone = optax.chain(
            optax.clip_by_global_norm(20.0),
            optax.adamw(learning_rate=float(o.lr),
                        weight_decay=float(o.get("opt_weight_decay", 1e-4) or 1e-4)))
        self.lr_base = float(o.get("opt_base_lr", 1e-3))
        self.lr_max = float(o.get("opt_max_lr", 5e-3))
        self.mlr_base = float(o.get("meta_opt_base_lr", 1e-4))
        self.mlr_max = float(o.get("meta_opt_max_lr", 1e-3))

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

        # Under train.mesh with a model axis, each behavior's (A, AT) rect
        # propagation pair runs as ONE graph-partitioned bidirectional hop
        # per layer (r4 KGCL pattern; destination-owned edge shards): the
        # u-destination half carries A's normalised values, the i-destination
        # half AT's — both static, so they live in ``sg.vals``.
        self._mesh, self._sg_beh = None, None
        from sslrec_tpu.data.multi_behavior import normalize_rect
        from sslrec_tpu.parallel.dist_train import maybe_partition_bi
        sgs = []
        mesh = None
        for coo in data.extras["behavior_mats_scipy"]:
            binm = (coo != 0) * 1.0
            a = normalize_rect(binm).tocoo()
            at = normalize_rect(binm.T).tocoo()
            rows = np.concatenate([a.row.astype(np.int64),
                                   self.user_num + at.row.astype(np.int64)])
            cols = np.concatenate([self.user_num + a.col.astype(np.int64),
                                   at.col.astype(np.int64)])
            vals = np.concatenate([a.data, at.data]).astype(np.float32)
            mesh, sg = maybe_partition_bi(cfg, rows, cols, self.user_num,
                                          self.item_num, vals=vals)
            if sg is None:
                sgs = None
                break
            sgs.append(sg)
        if sgs:
            self._mesh, self._sg_beh = mesh, sgs

    # -- parameters ----------------------------------------------------------
    def init_params(self, key):
        d = self.hidden
        ks = jax.random.split(key, 12 + 3 * self.gnn_layer)
        gcn = {
            "user_emb": xavier_uniform(ks[0], (self.user_num, d)),
            "item_emb": xavier_uniform(ks[1], (self.item_num, d)),
            "u_cat_w": xavier_uniform(ks[2], (self.gnn_layer * d, d)),
            "i_cat_w": xavier_uniform(ks[3], (self.gnn_layer * d, d)),
            "u_w": [xavier_uniform(k, (d, d)) for k in ks[4:4 + self.gnn_layer]],
            "i_w": [xavier_uniform(k, (d, d))
                    for k in ks[4 + self.gnn_layer:4 + 2 * self.gnn_layer]],
        }
        km = ks[4 + 2 * self.gnn_layer:]
        meta = {
            "ssl1": linear_params(km[0], d * 3, (d * 3) // 2),
            "ssl2": linear_params(km[1], (d * 3) // 2, 1),
            "ssl3": linear_params(km[2], d * 2, 1),
            "rs1": linear_params(km[3], d * 3, (d * 3) // 2),
            "rs2": linear_params(km[4], (d * 3) // 2, 1),
            "rs3": linear_params(km[5], d, 1),
            "prelu": jnp.asarray(0.25),
            "beh_emb": xavier_uniform(km[6], (self.n_beh, d)),
        }
        return {"gcn": gcn, "meta": meta}

    def init_opt_state(self, params):
        return {"model": self.opt_model.init(params),
                "meta": self.opt_meta.init(params)}

    # -- GCN forward ---------------------------------------------------------
    def _gcn(self, g):
        u, i = g["user_emb"], g["item_emb"]
        cat_u, cat_i, cat_us, cat_is = [], [], [], []
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
            cat_is.append(jnp.stack([jax.nn.sigmoid(x @ g["i_w"][l]) for x in is_]))
        user_embed = jnp.concatenate(cat_u, -1) @ g["u_cat_w"]
        item_embed = jnp.concatenate(cat_i, -1) @ g["i_cat_w"]
        user_embeds = jnp.concatenate(cat_us, -1) @ g["u_cat_w"]   # [n_beh, U, d]
        item_embeds = jnp.concatenate(cat_is, -1) @ g["i_cat_w"]
        return user_embed, item_embed, user_embeds, item_embeds

    # -- per-behavior sampling ------------------------------------------------
    def _sample_behaviors(self, key, users, target_pos):
        """(CMLData.ng_sample) per behavior: pos item (global draw kept if it is
        an edge, else a CSR draw from the user's row, else -1) + rejected neg."""
        pos_list, neg_list, valid_list = [], [], []
        for b in range(self.n_beh):
            kb = jax.random.fold_in(key, b)
            k1, k2, k3 = jax.random.split(kb, 3)
            if b == self.n_beh - 1 and target_pos is not None:
                pos = target_pos
                valid = jnp.ones_like(users, dtype=bool)
            else:
                items = self._beh_items[b]
                glob = items[jax.random.randint(k1, users.shape, 0, items.shape[0])]
                indptr, indices = self._beh_csr[b]
                start = indptr[users]
                deg = indptr[users + 1] - start
                off = (jax.random.uniform(k2, users.shape)
                       * jnp.maximum(deg, 1)).astype(jnp.int32)
                own = indices[jnp.clip(start + off, 0, indices.shape[0] - 1)]
                is_edge = self._beh_edge_sets[b].contains(users, glob)
                pos = jnp.where(is_edge, glob, own)
                valid = is_edge | (deg > 0)
            negs = sample_negatives(k3, users, self._beh_edge_sets[b],
                                    self.item_num)
            pos_list.append(jnp.where(valid, pos, 0))
            neg_list.append(negs)
            valid_list.append(valid.astype(jnp.float32))
        return pos_list, neg_list, valid_list

    # -- SSL (trainer.py:760-860) --------------------------------------------
    def _ssl(self, key, user_embeds, user_embed, step_users):
        n = step_users.shape[0]
        s = max(n // 10, 1)
        sub = step_users[jax.random.permutation(key, n)[:s]]
        d = self.hidden
        chunk_of = jnp.arange(s) // self.ssl_batch
        same_chunk = chunk_of[:, None] == chunk_of[None, :]
        losses = []
        for b in range(self.n_beh):
            e1 = user_embeds[-1][sub]
            e2 = user_embeds[b][sub]
            scores = jnp.exp(e1 @ e2.T / (d + 1e-8))
            pos = jnp.exp(jnp.sum(e1 * e2, -1) / (d + 1e-8))
            neg = jnp.sum(jnp.where(same_chunk, 0.0, scores), -1)
            con = -jnp.log(1e-8 + pos / (neg + 1e-8))
            losses.append(jnp.where(jnp.isnan(con), 1e-8, con))
        return losses, sub

    # -- MetaWeightNet (cml.py:477-516) ---------------------------------------
    def _meta_weights(self, meta, key, info_list, beh_list, ssl_users,
                      user_idx_list, user_embeds, user_embed, training=True):
        d = self.hidden
        prelu = lambda x: jnp.where(x >= 0, x, meta["prelu"] * x)

        def bnorm(x):
            # sqrt(var+eps): jnp.std's gradient NaNs at zero variance
            return (x - jnp.mean(x)) / jnp.sqrt(jnp.var(x) + 1e-5)

        def drop(k, x, rate=0.5):
            if not training:
                return x
            keep = jax.random.bernoulli(k, 1 - rate, x.shape)
            return jnp.where(keep, x / (1 - rate), 0.0)

        lin = lambda p, x: x @ p["w"] + p["b"]
        info_w, beh_w = [], []
        for b in range(self.n_beh):
            kb = jax.random.fold_in(key, b)
            k1, k2, k3, k4 = jax.random.split(kb, 4)
            il = info_list[b]
            ue_b = user_embeds[b][ssl_users]
            ue = user_embed[ssl_users]
            ssl_in = self.ipm * jnp.concatenate(
                [self.ipm * jnp.concatenate(
                    [jnp.tile(il[:, None], (1, d)) * self.ipm, ue_b], 1), ue], 1)
            ssl_in3 = self.ipm * (jnp.tile(il[:, None], (1, 2 * d))
                                  * jnp.concatenate([ue_b, ue], 1))
            w1 = self.ipm * jax.nn.sigmoid(bnorm(
                jnp.sqrt(ssl_in.shape[1])
                * drop(k1, lin(meta["ssl2"], drop(k2, prelu(lin(meta["ssl1"], ssl_in))))[:, 0])))
            w3 = self.ipm * jax.nn.sigmoid(bnorm(
                drop(k3, prelu(lin(meta["ssl3"], ssl_in3)))[:, 0]))
            info_w.append((w1 + w3) / 2.0)

            bl = beh_list[b]
            uidx = user_idx_list[b]
            rs_in = self.ipm * jnp.concatenate(
                [self.ipm * jnp.concatenate(
                    [jnp.tile(bl[:, None], (1, d)) * self.ipm,
                     user_embed[uidx]], 1), user_embeds[b][uidx]], 1)
            rs_in3 = self.ipm * (jnp.tile(bl[:, None], (1, d)) * user_embed[uidx])
            rw1 = self.ipm * jax.nn.sigmoid(bnorm(
                jnp.sqrt(rs_in.shape[1])
                * drop(k4, lin(meta["rs2"], drop(k4, prelu(lin(meta["rs1"], rs_in))))[:, 0])))
            rw3 = self.ipm * jax.nn.sigmoid(bnorm(
                drop(k4, prelu(lin(meta["rs3"], rs_in3)))[:, 0]))
            beh_w.append(rw1 + rw3)
        return info_w, beh_w

    # -- one loss evaluation --------------------------------------------------
    def _round_losses(self, params, key, users, pos_l, neg_l, valid_l,
                      ssl_key, meta_train=True):
        ue, ie, ues, ies = self._gcn(params["gcn"])
        beh_list = []
        for b in range(self.n_beh):
            pi = jnp.sum(ue[users] * ie[pos_l[b]], 1) * self.ipm
            pj = jnp.sum(ue[users] * ie[neg_l[b]], 1) * self.ipm
            bl = -jnp.log(jax.nn.sigmoid(pi - pj) + 1e-8) * valid_l[b]
            beh_list.append(bl)
        info_list, ssl_users = self._ssl(ssl_key, ues, ue, users)
        return ue, ie, ues, beh_list, info_list, ssl_users

    def _weighted_total(self, params, key, users, pos_l, neg_l, valid_l,
                        beh_list, info_list, ssl_users, ues, ue, ie,
                        stop_meta=False, half=False):
        meta = jax.tree.map(jax.lax.stop_gradient, params["meta"]) \
            if stop_meta else params["meta"]
        uil = [users] * self.n_beh
        iw, bw = self._meta_weights(meta, key, info_list, beh_list, ssl_users,
                                    uil, ues, ue)
        info_t = sum(jnp.sum(il * w) for il, w in zip(info_list, iw)) / self.n_beh
        beh_t = sum(jnp.sum(bl * w) for bl, w in zip(beh_list, bw)) / self.n_beh
        reg = (jnp.sum(ue[users] ** 2) + jnp.sum(ie[pos_l[-1]] ** 2)
               + jnp.sum(ie[neg_l[-1]] ** 2))
        total = (beh_t + self.reg * reg + self.beta * info_t) / self.batch_size
        return (0.5 * total if half else total), beh_t, info_t

    # -- the three-round step -------------------------------------------------
    def train_step(self, params, opt_state, batch, key):
        users = batch["user"]
        epoch = batch["aux"]["epoch"]
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
        pos_l, neg_l, valid_l = self._sample_behaviors(k1, users, batch["pos"])

        # round 1: clone update + meta update
        def loss_r1(p):
            ue, ie, ues, beh_list, info_list, ssl_users = self._round_losses(
                p, k2, users, pos_l, neg_l, valid_l, k3)
            total, beh_t, info_t = self._weighted_total(
                p, k2, users, pos_l, neg_l, valid_l, beh_list, info_list,
                ssl_users, ues, ue, ie)
            return total, (beh_t, info_t)

        (l1, _), g1 = jax.value_and_grad(loss_r1, has_aux=True)(params)
        clone_upd, _ = self.opt_clone.update(
            {"gcn": g1["gcn"], "meta": jax.tree.map(jnp.zeros_like, g1["meta"])},
            self.opt_clone.init(params), params)
        clone = optax.apply_updates(params, clone_upd)
        mlr = _cyclic_lr(epoch, self.mlr_base, self.mlr_max, up=2, down=3)
        opt_state = dict(opt_state, meta=_set_chain_lr(opt_state["meta"], mlr))
        meta_g = {"gcn": jax.tree.map(jnp.zeros_like, g1["gcn"]),
                  "meta": g1["meta"]}
        upd, st_meta = self.opt_meta.update(meta_g, opt_state["meta"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, meta=st_meta)

        # round 2: meta users through the clone; meta update again
        mu = self.meta_users[jax.random.randint(k4, (self.meta_batch,), 0,
                                                self.meta_users.shape[0])]
        # meta users' target positives are CSR-drawn too (they may lack edges)
        mpos, mneg, mval = self._sample_behaviors(k5, mu, None)
        def loss_r2(p):
            merged = {"gcn": clone["gcn"], "meta": p["meta"]}
            ue, ie, ues, beh_list, info_list, ssl_users = self._round_losses(
                merged, k6, mu, mpos, mneg, mval, k6)
            total, *_ = self._weighted_total(
                merged, k6, mu, mpos, mneg, mval, beh_list, info_list,
                ssl_users, ues, ue, ie, half=True)
            return total

        l2, g2 = jax.value_and_grad(loss_r2)(params)
        meta_g2 = {"gcn": jax.tree.map(jnp.zeros_like, g2["gcn"]),
                   "meta": g2["meta"]}
        upd, st_meta = self.opt_meta.update(meta_g2, opt_state["meta"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, meta=st_meta)

        # round 3: original model with frozen meta weights
        def loss_r3(p):
            ue, ie, ues, beh_list, info_list, ssl_users = self._round_losses(
                p, k7, users, pos_l, neg_l, valid_l, k7)
            total, beh_t, info_t = self._weighted_total(
                p, k7, users, pos_l, neg_l, valid_l, beh_list, info_list,
                ssl_users, ues, ue, ie, stop_meta=True)
            return total, (beh_t, info_t)

        (l3, (beh_t, info_t)), g3 = jax.value_and_grad(loss_r3, has_aux=True)(params)
        lr = _cyclic_lr(epoch, self.lr_base, self.lr_max)
        opt_state = dict(opt_state, model=_set_chain_lr(opt_state["model"], lr))
        model_g = {"gcn": g3["gcn"],
                   "meta": jax.tree.map(jnp.zeros_like, g3["meta"])}
        upd, st_model = self.opt_model.update(model_g, opt_state["model"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, model=st_model)

        return params, opt_state, {"loss": l3, "bpr_loss": beh_t,
                                   "infonce_loss": info_t}

    def epoch_state(self, params, key, epoch):
        return {"epoch": jnp.asarray(epoch, jnp.float32)}

    def generate(self, params):
        ue, ie, _, _ = self._gcn(params["gcn"])
        return ue, ie
