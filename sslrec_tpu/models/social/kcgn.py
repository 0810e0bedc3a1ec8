"""KCGN — knowledge-coupled social rec over a (rating × time)-expanded graph
with DGI on social (uu) and item (ii) graphs.

Parity with ``models/social/kcgn.py:13-152``: item nodes are replicated per
rating class; the square user/(item,rating) graph carries sinusoidal
``TimeEncoding`` edge features (fixed table, trainable projection); layers are
``model_utils.GCNLayer`` (u/v weight transforms, src-outdeg and dst-indeg
D^-1/2, messages = src node feature + edge feature, leaky-relu); layer outputs
L2-normalised and concatenated; item-rating copies fused by mean (or learned
weight); DGI per component-summary on uu and ii graphs, batch-masked.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.segment import segment_sum
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


def _l2rows(x):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), -1, keepdims=True) + 1e-12)


class KCGN(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.layer_num = int(m.layer_num)
        self.reg_weight = float(m.reg_weight)
        self.fuse = str(m.fuse)
        self.lam = [float(x) for x in m.lam]
        self.slope = float(m.slope)
        e = data.extras
        self.src = e["kcgn_src"]
        self.dst = e["kcgn_dst"]
        self.time_seq = e["kcgn_time"]
        self.n_nodes = int(e["kcgn_n_nodes"])
        self.r_class = int(e["rating_class"])
        self.max_time = int(e["max_time"])
        self.uu_g = e["uu_dgi_graph"]
        self.ii_g = e["ii_dgi_graph"]
        self.uu_labels = e["uu_labels"]
        self.ii_labels = e["ii_labels"]
        self.uu_sub_adj = e["uu_sub_adj"]
        self.ii_sub_adj = e["ii_sub_adj"]
        self.uu_sub_norm = e["uu_sub_norm"]
        self.ii_sub_norm = e["ii_sub_norm"]
        self.uu_mask = e["uu_dgi_mask"]
        self.ii_mask = e["ii_dgi_mask"]
        self.out_dim = self.embedding_size * self.layer_num

        # fixed sinusoidal time table (kcgn.py:119-135), rows 0/1 zeroed
        d = self.embedding_size
        pos = np.arange(self.max_time, dtype=np.float64)[:, None]
        div = 1.0 / (10000 ** (np.arange(0, 2 * d, 2.0)) / d / 2.0)
        tab = np.zeros((self.max_time, 2 * d), np.float32)
        tab[:, 0::2] = np.sin(pos * div) / math.sqrt(d)
        tab[:, 1::2] = np.cos(pos * div) / math.sqrt(d)
        tab[0] = 0.0
        tab[1] = 0.0
        self._time_table = jnp.asarray(tab)

        # precomputed degrees of the expanded graph
        deg_out = np.zeros(self.n_nodes, np.float32)
        deg_in = np.zeros(self.n_nodes, np.float32)
        np.add.at(deg_out, np.asarray(self.src), 1.0)
        np.add.at(deg_in, np.asarray(self.dst), 1.0)
        self._out_n = jnp.asarray(np.power(np.maximum(deg_out, 1.0), -0.5))
        self._in_n = jnp.asarray(np.power(np.maximum(deg_in, 1.0), -0.5))

    def init_params(self, key):
        d = self.embedding_size
        nl = max(self.layer_num - 1, 0)
        ks = jax.random.split(key, 4 + 2 * nl)
        p = {
            "user_embeds": xavier_uniform(ks[0], (self.user_num, d)),
            "item_embeds": xavier_uniform(
                ks[1], (self.item_num * self.r_class, d)),
            "time_lin": linear_params(ks[2], 2 * d, d),
            "u_w": [xavier_uniform(k, (d, d)) for k in ks[4:4 + nl]],
            "v_w": [xavier_uniform(k, (d, d)) for k in ks[4 + nl:4 + 2 * nl]],
            "prelu": jnp.asarray(0.25),
        }
        if self.fuse == "weight":
            p["fuse_w"] = xavier_uniform(jax.random.fold_in(ks[3], 2),
                                         (self.item_num, self.r_class, 1))
        return p

    # -- one GCNLayer hop (model_utils.GCNLayer) ------------------------------
    def _hop(self, params, l, u_f, v_f, edge_feat):
        node = jnp.concatenate([u_f @ params["u_w"][l],
                                v_f @ params["v_w"][l]], 0)
        node = node * self._out_n[:, None]
        msg = node[self.src] + edge_feat
        agg = segment_sum(msg, self.dst, self.n_nodes, sorted_ids=True)
        agg = agg * self._in_n[:, None]
        return jax.nn.leaky_relu(agg, self.slope)

    def forward(self, params):
        d = self.embedding_size
        edge_feat = (self._time_table[self.time_seq] @ params["time_lin"]["w"]
                     + params["time_lin"]["b"])
        all_u = [params["user_embeds"]]
        all_i = [params["item_embeds"]]
        embeds = None
        for l in range(self.layer_num - 1):
            if l == 0:
                embeds = self._hop(params, l, params["user_embeds"],
                                   params["item_embeds"], edge_feat)
            else:
                embeds = self._hop(params, l, embeds[: self.user_num],
                                   embeds[self.user_num:], edge_feat)
            ne = _l2rows(embeds)
            all_u.append(ne[: self.user_num])
            all_i.append(ne[self.user_num:])
        user_embeds = jnp.concatenate(all_u, 1)
        item_embeds = jnp.concatenate(all_i, 1)
        if self.r_class == 1:
            return user_embeds, item_embeds.reshape(self.item_num, -1)
        item_embeds = item_embeds.reshape(self.item_num, self.r_class, -1)
        if self.fuse == "weight":
            w = jax.nn.softmax(params["fuse_w"], axis=1)
            ret_item = jnp.sum(item_embeds * w, axis=1)
        else:
            ret_item = jnp.sum(item_embeds, axis=1) / self.r_class
        return user_embeds, ret_item

    # -- DGI (kcgn.py:137-152) ------------------------------------------------
    def _dgi(self, params, key, graph, features, sub_adj, sub_norm, labels):
        prelu = lambda x: jnp.where(x >= 0, x, params["prelu"] * x)
        pos = prelu(spmm(graph, features))
        perm = jax.random.permutation(key, features.shape[0])
        neg = prelu(spmm(graph, features[perm]))
        graph_embeds = jax.nn.sigmoid(spmm(sub_adj, pos) / sub_norm[:, None])
        summary = graph_embeds[labels]

        # the reference discriminator defines a bilinear weight but never
        # applies it (model_utils.py:295-307) -- plain dot-product scoring
        def disc(node, label):
            score = jnp.sum(node * summary, axis=1)
            return jnp.maximum(score, 0) - score * label \
                + jnp.log1p(jnp.exp(-jnp.abs(score)))

        return disc(pos, 1.0), disc(neg, 0.0)

    def hparams(self):
        """Traced tune-grid scalars (structural: layer_num)."""
        return {"reg_weight": jnp.float32(self.reg_weight)}

    def loss(self, params, batch, key):
        reg_w = batch.get("hp", {}).get("reg_weight", self.reg_weight)
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        user_embeds, item_embeds = self.forward(params)
        anc_e, pos_e, neg_e = user_embeds[ancs], item_embeds[poss], item_embeds[negs]
        bpr = losses.bpr_loss(anc_e, pos_e, neg_e)
        reg = reg_w * losses.reg_pick_embeds([anc_e, pos_e, neg_e])
        k1, k2 = jax.random.split(key)
        up, un = self._dgi(params, k1, self.uu_g,
                           user_embeds, self.uu_sub_adj, self.uu_sub_norm,
                           self.uu_labels)
        umask = jnp.zeros((self.user_num,)).at[ancs].set(1.0) * self.uu_mask
        uu_loss = self.lam[0] * ((jnp.sum(up * umask) + jnp.sum(un * umask))
                                 / jnp.maximum(jnp.sum(umask), 1.0))
        ip, in_ = self._dgi(params, k2, self.ii_g,
                            item_embeds, self.ii_sub_adj, self.ii_sub_norm,
                            self.ii_labels)
        imask = jnp.zeros((self.item_num,)).at[poss].set(1.0)
        imask = imask.at[negs].set(1.0) * self.ii_mask
        ii_loss = self.lam[1] * ((jnp.sum(ip * imask) + jnp.sum(in_ * imask))
                                 / jnp.maximum(jnp.sum(imask), 1.0))
        loss = bpr + reg + uu_loss + ii_loss
        return loss, {"bpr_loss": bpr, "reg_loss": reg,
                      "uu_dgi_loss": uu_loss, "ii_dgi_loss": ii_loss}

    def generate(self, params):
        return self.forward(params)
