"""MAERec — graph masked autoencoder over the item-transition graph driving a
sequential transformer.

Parity with ``models/sequential/maerec.py:14-332`` and ``MAERecTrainer``
(``trainer/trainer.py:353-445``):

- i–i transition graph: co-occurrence within distance ≤3 in training sequences,
  self-loops, sym-normalised (``construct_graphs`` ``:247-261``).
- ``LocalGraph``: path-probability-decayed neighbourhood scores with Gumbel
  noise → top-``num_mask_cand`` seeds; ``RandomMaskSubgraphs``: removes edges
  incident to the seed closure (per-depth ``path_prob^i`` thinning) →
  renormalised encoder adjacency + the masked-edge pool.
- Per batch: CE over the transformer (token table = GCN-encoded item
  embeddings), layer-pair MLP decoder NCE on ``con_batch`` masked edges vs
  ``num_reco_neg`` rejected negatives, L2 reg; every ``mask_steps`` steps the
  mask regenerates and −mean(scores)·reward is added, where the RL-style reward
  compares the latest main-loss decrease to the running average
  (``calc_reward`` ``trainer.py:369-377``) — the loss history rides in the
  model-managed optimiser-state pytree through the epoch scan.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
import optax

from sslrec_tpu.models import layers
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.models.sequential.base_seq import SequentialModel
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.utils.initializers import xavier_uniform


class MAERec(SequentialModel):
    batch_fields = ("user", "seq", "pos")

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.con_batch = int(m.con_batch)
        self.num_reco_neg = int(m.num_reco_neg)
        self.reg = float(m.reg)
        self.ssl_reg = float(m.ssl_reg)
        self.mask_depth = int(m.mask_depth)
        self.path_prob = float(m.path_prob)
        self.num_gcn_layers = int(m.num_gcn_layers)
        self.num_trm_layers = int(m.num_trm_layers)
        self.num_mask_cand = int(m.num_mask_cand)
        self.mask_steps = int(m.mask_steps)
        self.eps = float(m.eps)
        self.n_items1 = self.item_num + 1  # node space includes pad 0

        # i-i transition graph from the training sequences (distance ≤ 3)
        seqs = np.asarray(data.extras["train_arrays"]["seq"])
        r, c = [], []
        for dist in range(1, 4):
            a = seqs[:, dist:].reshape(-1)
            b = seqs[:, :-dist].reshape(-1)
            live = (a > 0) & (b > 0)
            r.extend([a[live], b[live]])
            c.extend([b[live], a[live]])
        r = np.concatenate(r)
        c = np.concatenate(c)
        pairs = np.unique(np.stack([r, c], 1), axis=0)
        ii = sp.coo_matrix((np.ones(len(pairs), np.float32),
                            (pairs[:, 0], pairs[:, 1])),
                           shape=(self.n_items1, self.n_items1))
        ii = ((ii + sp.eye(self.n_items1)) != 0) * 1.0
        norm = sparse_ops.normalize_adj_sym(ii, eps=0.0).tocoo()
        order = np.lexsort((norm.col, norm.row))
        self.rows = jnp.asarray(norm.row[order].astype(np.int32))
        self.cols = jnp.asarray(norm.col[order].astype(np.int32))
        self.norm_vals = jnp.asarray(norm.data[order].astype(np.float32))
        self.nnz = int(norm.nnz)
        self.ii_edge_set = sparse_ops.build_edge_set(ii)
        # scatter-free segment ops over the transition graph (TPU)
        from sslrec_tpu.ops.pallas_segment import SegmentOps
        self.seg_r = SegmentOps(self.rows, self.n_items1)
        self.seg_c = SegmentOps(self.cols, self.n_items1)

        lr = float(cfg.optimizer.lr)
        wd = float(cfg.optimizer.get("weight_decay", 0) or 0)
        self._opt = optax.adam(lr) if wd == 0 else optax.chain(
            optax.add_decayed_weights(wd), optax.adam(lr))

    def init_params(self, key):
        ks = jax.random.split(key, 6)
        d = self.emb_size
        g = self.num_gcn_layers
        p = layers.init_transformer_tower(ks[0], 2, d,
                                          self.max_len, self.num_trm_layers)
        # the GCN-encoded item table replaces the token embedding
        del p["emb"]["token"]
        p["item_emb"] = xavier_uniform(ks[1], (self.n_items1, d))
        p["dec"] = {
            "l1": layers.init_linear_normal(ks[2], d * g * g, d * g),
            "l2": layers.init_linear_normal(ks[3], d * g, d),
            "l3": layers.init_linear_normal(ks[4], d, 1),
        }
        for i, lp in enumerate(p["dec"].values()):  # reference: xavier weights
            lp["w"] = xavier_uniform(jax.random.fold_in(ks[5], i), lp["w"].shape)
        return p

    def init_opt_state(self, params):
        return {"opt": self._opt.init(params),
                "loss_hist": jnp.zeros((3,)), "hist_len": jnp.asarray(0)}

    # -- encoder -------------------------------------------------------------
    def _spmm_vals(self, vals, x):
        return self.seg_r.sum(self.seg_c.take(x) * vals[:, None])

    def _encode_items(self, params, enc_vals):
        embeds = [params["item_emb"]]
        for _ in range(self.num_gcn_layers):
            embeds.append(self._spmm_vals(enc_vals, embeds[-1]))
        return sum(embeds), embeds

    def _seq_tower(self, params, key, seqs, item_emb, deterministic):
        x = item_emb[seqs] + params["emb"]["pos"][None, : seqs.shape[1], :]
        keys = jax.random.split(key, self.num_trm_layers + 1)
        x = layers.dropout(keys[0], x, self.dropout_rate, deterministic)
        mask = (seqs > 0).astype(jnp.int32)
        for lp, k in zip(p_layers(params), keys[1:]):
            x = layers.apply_transformer_layer(lp, k, x, mask, self.n_heads,
                                               self.dropout_rate, deterministic)
        return x[:, -1, :]

    # -- LocalGraph scores (differentiable) -----------------------------------
    def _path_scores(self, params, key):
        embeds = params["item_emb"]
        ones = jnp.ones((self.nnz,))
        order = self.seg_r.sum(ones)[:, None]
        fst = self._spmm_vals(ones, embeds) - embeds
        fst_num = order
        emb = [fst]
        num = [fst_num]
        vals = ones
        for i in range(self.mask_depth):
            key, sub = jax.random.split(key)
            keep = jax.random.bernoulli(sub, self.path_prob ** (i + 1),
                                        (self.nnz,)).astype(jnp.float32)
            vals = vals * keep
            emb.append((self._spmm_vals(vals, emb[-1]) - emb[-1])
                       - order * emb[-1])
            num.append((self._spmm_vals(vals, num[-1]) - num[-1]) - order)
            order = self.seg_r.sum(vals)[:, None]
        sub_emb = sum(emb) / (sum(num) + 1e-8)
        sub_emb = sub_emb / jnp.sqrt(jnp.sum(sub_emb**2, -1, keepdims=True) + 1e-12)
        en = embeds / jnp.sqrt(jnp.sum(embeds**2, -1, keepdims=True) + 1e-12)
        scores = jnp.sum(sub_emb * en, -1)
        key, sub = jax.random.split(key)
        noise = -jnp.log(-jnp.log(jax.random.uniform(sub, scores.shape,
                                                     minval=1e-8, maxval=1.0)))
        return scores, scores + noise

    # -- per-epoch mask bank ---------------------------------------------------
    def epoch_state(self, params, key, epoch):
        if not hasattr(self, "_view_fn"):
            @jax.jit
            def one_view(params, key):
                k1, k2 = jax.random.split(key)
                _, noisy = self._path_scores(params, k1)
                _, seeds = jax.lax.top_k(noisy, self.num_mask_cand)
                closure = jnp.zeros((self.n_items1,)).at[seeds].set(1.0)
                for i in range(self.mask_depth - 1):
                    spread = (self._spmm_vals(jnp.ones((self.nnz,)),
                                              closure[:, None])[:, 0] > 0)
                    thin = jax.random.bernoulli(
                        jax.random.fold_in(k2, i), self.path_prob ** (i + 1),
                        spread.shape)
                    closure = jnp.clip(
                        closure + spread.astype(jnp.float32)
                        * thin.astype(jnp.float32), 0.0, 1.0)
                masked = ((closure[self.rows] > 0) | (closure[self.cols] > 0))
                keep = (~masked).astype(jnp.float32)
                deg = self.seg_r.sum(keep)
                dinv = (deg + 1e-12) ** -0.5
                enc_vals = keep * dinv[self.rows] * dinv[self.cols]
                return {"enc_vals": enc_vals,
                        "masked": masked.astype(jnp.float32)}

            def views_fn(params, key, n_views):
                keys = jax.random.split(key, n_views)
                return jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[one_view(params, k) for k in keys])

            self._view_fn = views_fn
        n_views = -(-self._n_batches_hint // self.mask_steps)
        return self._view_fn(jax.lax.stop_gradient(params), key, n_views)

    # -- decoder NCE -----------------------------------------------------------
    def _decoder_loss(self, params, emb_list, pos, neg):
        g = self.num_gcn_layers

        def pair_feat(a_idx, b_idx):
            feats = []
            for i in range(g):
                for j in range(g):
                    feats.append(emb_list[i][a_idx] * emb_list[j][b_idx])
            return jnp.concatenate(feats, -1)

        def mlp(x):
            h = jax.nn.relu(x @ params["dec"]["l1"]["w"] + params["dec"]["l1"]["b"])
            h = jax.nn.relu(h @ params["dec"]["l2"]["w"] + params["dec"]["l2"]["b"])
            return jax.nn.sigmoid(
                (h @ params["dec"]["l3"]["w"] + params["dec"]["l3"]["b"])[..., 0])

        pos_scr = jnp.exp(mlp(pair_feat(pos[:, 0], pos[:, 1])))
        neg_scr = jnp.exp(mlp(pair_feat(neg[:, :, 0], neg[:, :, 1])))
        denom = jnp.sum(neg_scr, -1) + pos_scr
        return -jnp.sum(jnp.log(pos_scr / (denom + 1e-8) + 1e-8))

    # -- model-managed train step ---------------------------------------------
    def train_step(self, params, opt_state, batch, key):
        step = batch["step"]
        view = jax.tree.map(lambda x: x[step // self.mask_steps], batch["aux"])
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)

        # sample con_batch masked edges (inverse-CDF over the masked indicator)
        cdf = jnp.cumsum(view["masked"])
        total = jnp.maximum(cdf[-1], 1.0)
        u = jax.random.uniform(k1, (self.con_batch,)) * total
        eidx = jnp.clip(jnp.searchsorted(cdf, u), 0, self.nnz - 1)
        pos = jnp.stack([self.rows[eidx], self.cols[eidx]], 1)
        # negatives: per pos, half corrupt v, half corrupt u (rejected)
        half = self.num_reco_neg // 2
        from sslrec_tpu.data.sampling import sample_negatives
        vneg = sample_negatives(k2, jnp.repeat(pos[:, 0], half),
                                self.ii_edge_set, self.n_items1, low=1)
        uneg = sample_negatives(k3, jnp.repeat(pos[:, 1], half),
                                self.ii_edge_set, self.n_items1, low=1)
        neg_v = jnp.stack([jnp.repeat(pos[:, 0], half), vneg], 1) \
            .reshape(self.con_batch, half, 2)
        neg_u = jnp.stack([uneg, jnp.repeat(pos[:, 1], half)], 1) \
            .reshape(self.con_batch, half, 2)
        neg = jnp.concatenate([neg_v, neg_u], 1)

        # RL reward from the carried loss history
        hist = opt_state["loss_hist"]
        hlen = opt_state["hist_len"]
        cur_dec = hist[1] - hist[2]
        avg_dec = hist[0] - hist[1]
        reward = jnp.where(hlen < 3, 1.0,
                           jnp.where(cur_dec > avg_dec, 1.0, self.eps))

        def loss_fn(p):
            item_emb, emb_list = self._encode_items(p, view["enc_vals"])
            h = self._seq_tower(p, k4, batch["seq"], item_emb, False)
            logits = h @ item_emb.T
            logp = jax.nn.log_softmax(logits, -1)
            loss_main = -jnp.mean(
                jnp.take_along_axis(logp, batch["pos"][:, None], 1)[:, 0])
            loss_reco = self._decoder_loss(p, emb_list, pos, neg) * self.ssl_reg
            loss_regu = sum(jnp.sum(jnp.square(x))
                            for x in jax.tree.leaves(p)) * self.reg
            scores, _ = self._path_scores(p, k5)
            loss_mask = jnp.where(step % self.mask_steps == 0,
                                  -jnp.mean(scores) * reward, 0.0)
            total = loss_main + loss_reco + loss_regu + loss_mask
            return total, (loss_main, loss_reco, loss_regu, loss_mask)

        (loss, (lm, lr_, lg, lk)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = self._opt.update(grads, opt_state["opt"], params)
        params = optax.apply_updates(params, updates)
        new_hist = jnp.where(step % self.mask_steps == 0,
                             jnp.asarray([hist[2], hist[2], lm]),
                             jnp.asarray([hist[1], hist[2], lm]))
        opt_state = {"opt": new_opt, "loss_hist": new_hist,
                     "hist_len": jnp.minimum(hlen + 1, 3)}
        return params, opt_state, {"loss": loss, "loss_main": lm,
                                   "loss_reco": lr_, "loss_regu": lg,
                                   "loss_mask": lk}

    # -- eval ------------------------------------------------------------------
    def encode_for_predict(self, params, seqs):
        item_emb, _ = self._encode_items(params, self.norm_vals)
        return self._seq_tower(params, jax.random.PRNGKey(0), seqs, item_emb,
                               True)

    def item_logits_params(self, params):
        item_emb, _ = self._encode_items(params, self.norm_vals)
        return item_emb, jnp.zeros((item_emb.shape[0],), item_emb.dtype)


def p_layers(params):
    return params["layers"]
