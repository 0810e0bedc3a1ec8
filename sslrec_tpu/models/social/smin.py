"""SMIN — metapath GCNs with semantic attention + graph-infomax SSL.

Parity with ``models/social/smin.py:14-191``: per selected metapath, a stack of
``layer_num−1`` weighted sym-norm graph convolutions (dgl ``GraphConv`` with
shared PReLU) whose L2-normalised outputs concatenate with the ego embedding;
``SemanticAttention`` fuses the metapath channels; Informax compares DGI
encodings (destination-normalised one-hop conv, weightless) against subgraph
mean embeddings and reconstructs one-hop edges, batch-node-masked
(``smin.py:117-139``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


def _l2rows(x):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), -1, keepdims=True) + 1e-12)


class SMIN(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.layer_num = int(m.layer_num)
        self.reg_weight = float(m.reg_weight)
        self.lambda1 = float(m.lambda1)
        self.lambda2 = float(m.lambda2)
        graphs = data.extras["metapath_graphs"]
        self.user_paths = [graphs[k.upper()]
                           for k in m.user_graph_indx.split("_")]
        self.item_paths = [graphs[k.upper()]
                           for k in m.item_graph_indx.split("_")]
        self.dgi_graph = data.extras["dgi_graph"]
        self.dgi_edges = data.extras["dgi_edges"]
        self.sub_adj = data.extras["subgraph_adj"]
        self.sub_norm = data.extras["subgraph_norm"]
        self.in_size = self.layer_num * self.embedding_size

    def init_params(self, key):
        d = self.embedding_size
        nconv_u = len(self.user_paths) * (self.layer_num - 1)
        nconv_i = len(self.item_paths) * (self.layer_num - 1)
        ks = jax.random.split(key, 8 + nconv_u + nconv_i)
        p = {
            "user_embeds": xavier_uniform(ks[0], (self.user_num, d)),
            "item_embeds": xavier_uniform(ks[1], (self.item_num, d)),
            "u_conv_w": [xavier_uniform(k, (d, d)) for k in ks[2:2 + nconv_u]],
            "i_conv_w": [xavier_uniform(k, (d, d))
                         for k in ks[2 + nconv_u:2 + nconv_u + nconv_i]],
            "prelu": jnp.asarray(0.25),
            "attn_u": {"l1": linear_params(ks[-6], self.in_size, 128),
                       "l2": {"w": xavier_uniform(ks[-5], (128, 1))}},
            "attn_i": {"l1": linear_params(ks[-4], self.in_size, 128),
                       "l2": {"w": xavier_uniform(ks[-3], (128, 1))}},
        }
        return p

    def _prelu(self, p, x):
        return jnp.where(x >= 0, x, p["prelu"] * x)

    def _metapath_tower(self, params, embeds, paths, conv_ws):
        outs = []
        wi = 0
        for g in paths:
            acc = [embeds]
            h = embeds
            for _ in range(self.layer_num - 1):
                h = self._prelu(params, spmm(g, h) @ conv_ws[wi])
                wi += 1
                acc.append(_l2rows(h))
            outs.append(jnp.concatenate(acc, axis=1))   # [n, layer_num*d]
        return jnp.stack(outs, axis=1)                   # [n, paths, in_size]

    @staticmethod
    def _semantic_attention(ap, z):
        w = jnp.tanh(z @ ap["l1"]["w"] + ap["l1"]["b"]) @ ap["l2"]["w"]
        beta = jax.nn.softmax(jnp.mean(w, axis=0), axis=0)   # [paths, 1]
        return jnp.sum(beta[None] * z, axis=1)

    def forward(self, params):
        su = self._metapath_tower(params, params["user_embeds"],
                                  self.user_paths, params["u_conv_w"])
        si = self._metapath_tower(params, params["item_embeds"],
                                  self.item_paths, params["i_conv_w"])
        user_embeds = self._semantic_attention(params["attn_u"], su)
        item_embeds = self._semantic_attention(params["attn_i"], si)
        return user_embeds, item_embeds

    # -- Informax (smin.py:163-191) -----------------------------------------
    def _informax(self, params, key, features):
        pos = self._prelu(params, spmm(self.dgi_graph, features))
        perm = jax.random.permutation(key, features.shape[0])
        neg = self._prelu(params, spmm(self.dgi_graph, features[perm]))
        graph_embeds = jax.nn.sigmoid(
            spmm(self.sub_adj, features) / self.sub_norm[:, None])

        # the reference discriminator defines a bilinear weight but never
        # applies it (model_utils.py:295-307) -- plain dot-product scoring
        def disc(node, ref, label):
            score = jnp.sum(node * ref, axis=1)
            # BCEWithLogits, per node
            return jnp.maximum(score, 0) - score * label \
                + jnp.log1p(jnp.exp(-jnp.abs(score)))

        pos_xj = disc(pos, graph_embeds, 1.0)
        neg_xj = disc(neg, graph_embeds, 0.0)
        pos_xi = disc(pos, features, 1.0)
        neg_xi = disc(neg, features, 0.0)
        r, c = self.dgi_edges
        tmp = jax.nn.sigmoid(jnp.sum(pos[r] * pos[c], axis=1))
        adj_rebuilt = jnp.sum((tmp - 1.0) ** 2) / features.shape[0]
        return pos_xj, neg_xj, pos_xi, neg_xi, adj_rebuilt

    def hparams(self):
        """Traced tune-grid scalars (structural: layer_num)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "lambda1": jnp.float32(self.lambda1),
                "lambda2": jnp.float32(self.lambda2)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_w = hp.get("reg_weight", self.reg_weight)
        lam1 = hp.get("lambda1", self.lambda1)
        lam2 = hp.get("lambda2", self.lambda2)
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        user_embeds, item_embeds = self.forward(params)
        anc_e, pos_e, neg_e = user_embeds[ancs], item_embeds[poss], item_embeds[negs]
        bpr = losses.bpr_loss(anc_e, pos_e, neg_e)
        reg = reg_w * losses.reg_pick_embeds([anc_e, pos_e, neg_e])
        feats = jnp.concatenate([user_embeds, item_embeds], axis=0)
        p_xj, n_xj, p_xi, n_xi, rebuilt = self._informax(params, key, feats)
        mask = jnp.zeros((self.user_num + self.item_num,))
        mask = mask.at[ancs].set(1.0)
        mask = mask.at[self.user_num + poss].set(1.0)
        mask = mask.at[self.user_num + negs].set(1.0)
        denom = jnp.sum(mask)
        informax = lam1 * ((jnp.sum(mask * p_xj) + jnp.sum(mask * n_xj))
                           / denom) \
            + lam2 * ((jnp.sum(mask * p_xi) + jnp.sum(mask * n_xi))
                      / denom + rebuilt)
        loss = bpr + reg + informax
        return loss, {"bpr_loss": bpr, "reg_loss": reg, "informax_loss": informax}

    def generate(self, params):
        return self.forward(params)
