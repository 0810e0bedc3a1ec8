"""MHCN — multi-channel hypergraph convolution with self-gating, channel
attention, and hierarchical mutual-information SSL.

Parity with ``models/social/mhcn.py:12-169``: three motif-channel propagations
(H_s, H_j, H_p) with per-layer L2 row normalisation; joint adjacency R drives a
simple-channel and item updates; channel attention mixes user channels (+ half
the simple channel); BPR is *sum*-reduced (not batch-mean); hierarchical SSL
scores node-vs-hyperedge and hyperedge-vs-graph with row / row-col shuffles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.spmm import spmm, spmm_t
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


def _l2norm_rows(x):
    # sqrt(sum+eps) keeps the gradient finite at exactly-zero rows (which occur
    # for fully-masked / isolated nodes); jnp.linalg.norm's grad NaNs at 0.
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True) + 1e-12)


class MHCN(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.layer_num = int(m.layer_num)
        self.reg_weight = float(m.reg_weight)
        self.ss_rate = float(m.ss_rate)
        self.h_s = data.extras["mhcn_h_s"]
        self.h_j = data.extras["mhcn_h_j"]
        self.h_p = data.extras["mhcn_h_p"]
        self.r = data.extras["mhcn_r"]

    def init_params(self, key):
        ks = jax.random.split(key, 11)
        d = self.embedding_size
        return {
            "user_embeds": xavier_uniform(ks[0], (self.user_num, d)),
            "item_embeds": xavier_uniform(ks[1], (self.item_num, d)),
            "gating": [linear_params(k, d, d) for k in ks[2:6]],
            "sgating": [linear_params(k, d, d) for k in ks[6:9]],
            "attn": xavier_uniform(ks[9], (1, d)),
            "attn_mat": xavier_uniform(ks[10], (d, d)),
        }

    @staticmethod
    def _gate(p, x):
        return x * jax.nn.sigmoid(x @ p["w"] + p["b"])

    def _channel_attention(self, params, *channels):
        weights = jnp.stack(
            [jnp.sum(params["attn"] * (c @ params["attn_mat"]), axis=1)
             for c in channels], axis=0)                        # [C, n]
        score = jax.nn.softmax(weights.T, axis=-1)              # [n, C]
        mixed = sum(score[:, i:i + 1] * channels[i] for i in range(len(channels)))
        return mixed, score

    def forward(self, params):
        g = params["gating"]
        u = params["user_embeds"]
        uc1, uc2, uc3 = self._gate(g[0], u), self._gate(g[1], u), self._gate(g[2], u)
        simp = self._gate(g[3], u)
        acc1, acc2, acc3, acc_s = [uc1], [uc2], [uc3], [simp]
        item_embeds = params["item_embeds"]
        acc_i = [item_embeds]
        for _ in range(self.layer_num):
            mixed = self._channel_attention(params, uc1, uc2, uc3)[0] + simp / 2.0
            uc1 = spmm(self.h_s, uc1)
            acc1.append(_l2norm_rows(uc1))
            uc2 = spmm(self.h_j, uc2)
            acc2.append(_l2norm_rows(uc2))
            uc3 = spmm(self.h_p, uc3)
            acc3.append(_l2norm_rows(uc3))
            new_item = spmm_t(self.r, mixed)
            acc_i.append(_l2norm_rows(new_item))
            simp = spmm(self.r, item_embeds)
            acc_s.append(_l2norm_rows(simp))
            item_embeds = new_item
        u1, u2, u3 = sum(acc1), sum(acc2), sum(acc3)
        simp = sum(acc_s)
        ret_item = sum(acc_i)
        ret_user, _ = self._channel_attention(params, u1, u2, u3)
        ret_user = ret_user + simp / 2.0
        return ret_user, ret_item

    def _hierarchical_ssl(self, key, em, adj):
        """(``mhcn.py:120-143``) local node↔hyperedge + global hyperedge↔graph."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        edge = spmm(adj, em)

        def score(a, b):
            return jnp.sum(a * b, axis=1)

        def row_shuffle(k, x):
            return x[jax.random.permutation(k, x.shape[0])]

        def row_col_shuffle(k, x):
            ka, kb = jax.random.split(k)
            x = x[:, jax.random.permutation(ka, x.shape[1])]
            return x[jax.random.permutation(kb, x.shape[0])]

        pos = score(em, edge)
        neg1 = score(row_shuffle(k1, em), edge)
        neg2 = score(row_col_shuffle(k2, edge), em)
        local = -jnp.sum(jnp.log(jax.nn.sigmoid(pos - neg1) + 1e-12)
                         + jnp.log(jax.nn.sigmoid(neg1 - neg2) + 1e-12))
        graph = jnp.mean(edge, axis=0)
        pos_g = score(edge, graph[None, :])
        neg_g = score(row_col_shuffle(k3, edge), graph[None, :])
        global_ = -jnp.sum(jnp.log(jax.nn.sigmoid(pos_g - neg_g) + 1e-12))
        return local + global_

    def hparams(self):
        """Traced tune-grid scalars (structural: layer_num)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "ss_rate": jnp.float32(self.ss_rate)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_w = hp.get("reg_weight", self.reg_weight)
        ss_rate = hp.get("ss_rate", self.ss_rate)
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        user_embeds, item_embeds = self.forward(params)
        bpr = losses.bpr_loss(user_embeds[ancs], item_embeds[poss], item_embeds[negs])
        reg = reg_w * losses.reg_params(params)
        ks = jax.random.split(key, 3)
        sg = params["sgating"]
        ss = (self._hierarchical_ssl(ks[0], self._gate(sg[0], user_embeds), self.h_s)
              + self._hierarchical_ssl(ks[1], self._gate(sg[1], user_embeds), self.h_j)
              + self._hierarchical_ssl(ks[2], self._gate(sg[2], user_embeds), self.h_p))
        ss = ss * ss_rate
        return bpr + reg + ss, {"bpr_loss": bpr, "reg_loss": reg, "ss_loss": ss}

    def generate(self, params):
        return self.forward(params)
