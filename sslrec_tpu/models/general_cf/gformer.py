"""GFormer — graph transformer with anchor-set positional encoding and
rationale-guided masking.

Parity with ``models/general_cf/gformer.py:16-503`` + ``GFormerTrainer``
(``trainer/trainer.py:253-296``):

- Anchor-set PE: per epoch, ``anchor_set_num`` random anchors; node-to-anchor
  shortest-path distances become 1/(d+1) weights (``preSelect_anchor_set``
  ``:178-200``).  The reference runs networkx BFS on the host; here distances
  come from iterated min-plus relaxation (segment-min over edges) on device.
- ``PNNLayer``: messages = anchor embeds scaled by distance weights, concat
  self features, linear, mean over anchors (``:192-214``) — computed in closed
  form as ``((D @ E_anchor)/A) W₁ + E W₂ + b`` (no [N, A, d] tensor).
- ``LocalGraph``: PNN-encoded embeds → graph with ``addRate`` random extra
  edges + self loops → edge-attention scores from the GT layer.
- ``RandomMaskSubgraphs``: without-replacement weighted edge samples (Gumbel
  top-k) give the encoder graph (inverse-attention probabilities), ``sub``
  (attention-proportional) and ``cmp`` (inverse) views; the decoder graph adds
  ``ext``/``reRate`` random re-draws of dropped edges (dedup skipped — static
  shapes; duplicates only reweight attention).
- Loss: dot-product rec + secondary BPR on the sub view + log-sum-exp
  contrasts + NCE between sub and cmp aggregates (``cal_loss`` ``:89-117``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.segment import segment_sum
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


class GFormer(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.layer_num = int(m.layer_num)
        self.pnn_layer = int(m.pnn_layer)
        self.reg_weight = float(m.reg_weight)
        self.keep_rate = float(m.keep_rate)
        self.gtw = float(m.gtw)
        self.anchor_num = int(m.anchor_set_num)
        self.ctra = float(m.ctra)
        self.ssl_reg = float(m.ssl_reg)
        self.b2 = float(m.b2)
        self.head = int(m.head)
        self.add_rate = float(m.addRate)
        self.ext = float(m.ext)
        self.re_rate = float(m.reRate)
        self.sub_rate = float(m.sub)
        self.fix_steps = int(m.fix_steps)
        self.batch_train = int(cfg.train.batch_size)

        trn = data.extras["train_mat_scipy"].tocoo()
        bi = sparse_ops.make_bi_adj(trn, self.user_num, self.item_num).tocoo()
        order = np.lexsort((bi.col, bi.row))
        self.rows = jnp.asarray(bi.row[order].astype(np.int32))
        self.cols = jnp.asarray(bi.col[order].astype(np.int32))
        self.norm_vals = jnp.asarray(bi.data[order].astype(np.float32))
        self.n_nodes = self.user_num + self.item_num
        self.nnz = int(bi.nnz)
        # static sizes of the augmented edge space
        self.n_add = int(self.nnz * self.add_rate)
        self.nnz_aug = self.nnz + 2 * self.n_add + self.n_nodes
        self.k_keep = int(self.nnz_aug * self.keep_rate)
        self.k_sub = int(self.nnz_aug * self.sub_rate)

    def init_params(self, key):
        ks = jax.random.split(key, 8)
        d = self.embedding_size
        return {
            "user_embeds": xavier_uniform(ks[0], (self.user_num, d)),
            "item_embeds": xavier_uniform(ks[1], (self.item_num, d)),
            "gt": {"q": xavier_uniform(ks[2], (d, d)),
                   "k": xavier_uniform(ks[3], (d, d)),
                   "v": xavier_uniform(ks[4], (d, d))},
            "pnn_hidden": linear_params(ks[5], 2 * d, d),
            "pnn_out": linear_params(ks[6], d, d),
        }

    # -- anchor distances (device BFS via min-plus relaxation) ----------------
    def _anchor_dists(self, key, iters: int = 8):
        anchors = jax.random.choice(key, self.n_nodes, (self.anchor_num,),
                                    replace=False)
        dist = jnp.full((self.n_nodes, self.anchor_num), 1e9)
        dist = dist.at[anchors, jnp.arange(self.anchor_num)].set(0.0)
        for _ in range(iters):
            relaxed = jax.ops.segment_min(
                dist[self.cols] + 1.0, self.rows, num_segments=self.n_nodes,
                indices_are_sorted=True)
            dist = jnp.minimum(dist, relaxed)
        w = jnp.where(dist < 1e8, 1.0 / (dist + 1.0), 0.0)  # [N, A]
        return anchors, w

    # -- PNN (closed form) -----------------------------------------------------
    def _pnn(self, params, embeds, anchors, dist_w):
        set_emb = embeds[anchors]                      # [A, d]
        d = self.embedding_size
        w1 = params["pnn_hidden"]["w"][:d]
        w2 = params["pnn_hidden"]["w"][d:]
        b = params["pnn_hidden"]["b"]
        msg = (dist_w @ (set_emb @ w1)) / self.anchor_num
        return msg + embeds @ w2 + b

    # -- GT layer over an edge list --------------------------------------------
    def _gt(self, params, rows, cols, valid, embeds):
        h, d = self.head, self.embedding_size
        dh = d // h
        q = (embeds[rows] @ params["gt"]["q"]).reshape(-1, h, dh)
        k = (embeds[cols] @ params["gt"]["k"]).reshape(-1, h, dh)
        v = (embeds[cols] @ params["gt"]["v"]).reshape(-1, h, dh)
        att = jnp.clip(jnp.sum(q * k, -1), -10.0, 10.0)
        exp_att = jnp.exp(att)
        if valid is not None:
            exp_att = exp_att * valid[:, None]
        att_norm = segment_sum(exp_att, rows, self.n_nodes)[rows]
        attn = exp_att / (att_norm + 1e-8)
        res = (attn[:, :, None] * v).reshape(-1, d)
        return segment_sum(res, rows, self.n_nodes), jnp.sum(att, -1)

    # -- per-epoch view bank ----------------------------------------------------
    def epoch_state(self, params, key, epoch):
        if not hasattr(self, "_views_fn"):
            loops = jnp.arange(self.n_nodes, dtype=jnp.int32)

            @jax.jit
            def one_view(params, key):
                ks = jax.random.split(key, 9)
                anchors, dist_w = self._anchor_dists(ks[0])
                embeds = jnp.concatenate([params["user_embeds"],
                                          params["item_embeds"]], 0)
                pnn = self._pnn(params, embeds, anchors, dist_w)
                # augmented edge space: orig + addRate random (both dirs) + loops
                ar = self.rows[jax.random.randint(ks[1], (self.n_add,), 0, self.nnz)]
                ac = self.cols[jax.random.randint(ks[2], (self.n_add,), 0, self.nnz)]
                aug_rows = jnp.concatenate([ar, ac, loops, self.rows])
                aug_cols = jnp.concatenate([ac, ar, loops, self.cols])
                _, att_edge = self._gt(params, aug_rows, aug_cols, None, pnn)
                att_edge = jax.lax.stop_gradient(att_edge)

                def gumbel_topk_mask(k_sel, logp, key):
                    g = -jnp.log(-jnp.log(jax.random.uniform(
                        key, logp.shape, minval=1e-9, maxval=1.0)))
                    _, idx = jax.lax.top_k(logp + g, k_sel)
                    return jnp.zeros(logp.shape).at[idx].set(1.0)

                att_c = jnp.minimum(att_edge, 3.0)
                inv_logp = -att_c  # ∝ log(1/exp(att))
                pos_logp = jnp.log(att_edge - att_edge.min() + 1.001)
                keep = gumbel_topk_mask(self.k_keep, inv_logp, ks[3])
                sub_m = gumbel_topk_mask(self.k_sub, pos_logp, ks[4])
                cmp_m = gumbel_topk_mask(self.k_sub, inv_logp, ks[5])

                def norm_vals(mask):
                    live = jnp.clip(mask + (aug_rows == aug_cols), 0, 1)
                    deg = segment_sum(live, aug_rows, self.n_nodes)
                    dinv = jnp.where(deg > 0, deg ** -0.5, 0.0)
                    return live * dinv[aug_rows] * dinv[aug_cols]

                enc_vals = norm_vals(keep)
                sub_vals = norm_vals(sub_m)
                cmp_vals = norm_vals(cmp_m)
                # decoder: dropped ∪ random re-draws ∪ loops ∪ kept (validity 1)
                dropped = 1.0 - keep
                cdf = jnp.cumsum(dropped)
                total = jnp.maximum(cdf[-1], 1.0)
                n_re = int(self.nnz * self.re_rate)
                u = jax.random.uniform(ks[6], (n_re,)) * total
                eidx = jnp.clip(jnp.searchsorted(cdf, u), 0, self.nnz_aug - 1)
                dec_r = jnp.concatenate([aug_rows[eidx], aug_cols[eidx], loops])
                dec_c = jnp.concatenate([aug_cols[eidx], aug_rows[eidx], loops])
                return {"aug_rows": aug_rows, "aug_cols": aug_cols,
                        "enc_vals": enc_vals, "sub_vals": sub_vals,
                        "cmp_vals": cmp_vals, "dec_rows": dec_r,
                        "dec_cols": dec_c, "anchors": anchors,
                        "dist_w": dist_w}

            def views_fn(params, key, n_views):
                keys = jax.random.split(key, n_views)
                return jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[one_view(params, k) for k in keys])

            self._views_fn = views_fn
        n_views = -(-self._n_batches_hint // self.fix_steps)
        return self._views_fn(jax.lax.stop_gradient(params), key, n_views)

    # -- propagation -----------------------------------------------------------
    def _spmm_edges(self, rows, cols, vals, x):
        return segment_sum(x[cols] * vals[:, None], rows, self.n_nodes)

    def forward_train(self, params, view):
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], 0)
        acc = [embeds]
        ar, ac = view["aug_rows"], view["aug_cols"]
        gt_cmp, _ = self._gt(params, ar, ac, view["cmp_vals"] > 0, embeds)
        c_list = [embeds, self.gtw * gt_cmp]
        gt_sub, _ = self._gt(params, ar, ac, view["sub_vals"] > 0, embeds)
        sub_list = [embeds, self.gtw * gt_sub]
        for _ in range(self.layer_num):
            prev = acc[-1]
            acc.append(self._spmm_edges(ar, ac, view["enc_vals"], prev))
            sub_list.append(self._spmm_edges(ar, ac, view["sub_vals"], prev))
            c_list.append(self._spmm_edges(ar, ac, view["cmp_vals"], prev))
        for _ in range(self.pnn_layer):
            acc.append(self._pnn(params, acc[-1], view["anchors"], view["dist_w"]))
        dec, _ = self._gt(params, view["dec_rows"], view["dec_cols"], None, acc[-1])
        acc.append(dec)
        total = sum(acc)
        return (total[: self.user_num], total[self.user_num:],
                sum(c_list), sum(sub_list))

    def _contrast(self, nodes, e1, e2=None):
        if e2 is not None:
            return jnp.mean(jax.nn.logsumexp(e1[nodes] @ e2.T, axis=-1))
        return jnp.mean(jax.nn.logsumexp(e1[nodes] @ e1.T, axis=-1))

    def hparams(self):
        """Traced tune-grid scalars (reference ``gformer.yml`` tune block:
        reg_weight, ssl_reg; layer_num stays a structural serial group)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "ssl_reg": jnp.float32(self.ssl_reg)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_weight = hp.get("reg_weight", self.reg_weight)
        ssl_reg = hp.get("ssl_reg", self.ssl_reg)
        view = jax.tree.map(lambda x: x[batch["step"] // self.fix_steps],
                            batch["aux"])
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        u_emb, i_emb, c_all, s_all = self.forward_train(params, view)
        bpr = -jnp.mean(jnp.sum(u_emb[ancs] * i_emb[poss], -1))
        su, si = s_all[: self.user_num], s_all[self.user_num:]
        diff = jnp.sum(su[ancs] * si[poss], -1) - jnp.sum(su[ancs] * i_emb[negs], -1)
        bpr2 = -jnp.sum(jnp.log(jax.nn.sigmoid(diff) + 1e-12)) / self.batch_train
        reg = reg_weight * losses.reg_params(params)
        nce = jnp.mean(jnp.log(jnp.sum(jnp.exp(s_all[ancs] * c_all[ancs]), -1)
                               + 1e-12))
        cl = (self._contrast(ancs, u_emb) + self._contrast(poss, i_emb)) \
            * ssl_reg + self._contrast(ancs, u_emb, i_emb) + self.ctra * nce
        loss = bpr + reg + cl + self.b2 * bpr2
        return loss, {"bpr_loss": bpr, "reg_loss": reg, "cl_loss": cl}

    def generate(self, params):
        # test path (gformer.py:78-86): plain GCN stack over the normalised
        # adjacency; GT/PNN towers feed only the contrastive lists in training
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], 0)
        acc = [embeds]
        for _ in range(self.layer_num):
            acc.append(self._spmm_edges(self.rows, self.cols, self.norm_vals,
                                        acc[-1]))
        total = sum(acc)
        return total[: self.user_num], total[self.user_num:]
