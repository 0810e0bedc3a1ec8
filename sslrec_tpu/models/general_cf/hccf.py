"""HCCF — hypergraph-enhanced CF: local GCN branch + learned hypergraph branch,
layer-wise cross-view InfoNCE.

Parity with ``models/general_cf/hccf.py:13-108``: per-layer fresh edge dropout
with 1/keep rescale; hypergraph adjacency ``E @ H * mult`` with inverted dropout;
HGNN layer = leaky(adjᵀE) then leaky(adj·hids); BPR as mean −log σ(diff); CL =
``cal_infonce_loss_spec_nodes`` on the GCN branch (stop-gradient) vs hypergraph
branch per layer.  Deviation: the reference dedups batch nodes with
``torch.unique`` (``hccf.py:84-85``) — dynamic-shape-hostile on TPU, so the raw
batch indices are used (duplicate nodes weight their term proportionally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.models import augment, losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.utils.initializers import xavier_uniform


class HCCF(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.adj = data.extras["bi_adj"]
        self.layer_num = int(m.layer_num)
        self.reg_weight = float(m.reg_weight)
        self.cl_weight = float(m.cl_weight)
        self.hyper_num = int(m.hyper_num)
        self.mult = float(m.mult)
        self.keep_rate = float(m.keep_rate)
        self.temperature = float(m.temperature)
        self.leaky = float(m.leaky)

    def init_params(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        d, h = self.embedding_size, self.hyper_num
        return {
            "user_embeds": xavier_uniform(k1, (self.user_num, d)),
            "item_embeds": xavier_uniform(k2, (self.item_num, d)),
            "user_hyper": xavier_uniform(k3, (d, h)),
            "item_hyper": xavier_uniform(k4, (d, h)),
        }

    def _hgnn(self, adj, embeds):
        act = lambda x: jax.nn.leaky_relu(x, self.leaky)
        hids = act(adj.T @ embeds)
        return act(adj @ hids)

    def forward(self, params, key, keep_rate):
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], axis=0)
        uu_hyper = params["user_embeds"] @ params["user_hyper"] * self.mult
        ii_hyper = params["item_embeds"] @ params["item_hyper"] * self.mult

        # scanned layer loop: one spmm (and one Pallas kernel) instance total
        def layer(prev, k):
            ke, ku, ki = jax.random.split(k, 3)
            ew = augment.edge_drop(ke, self.adj, keep_rate, resize_val=True)
            tem = spmm(self.adj, prev, edge_weight=ew)
            hyper_u = self._hgnn(augment.embed_dropout(ku, uu_hyper, 1 - keep_rate),
                                 prev[: self.user_num])
            hyper_i = self._hgnn(augment.embed_dropout(ki, ii_hyper, 1 - keep_rate),
                                 prev[self.user_num:])
            hyper = jnp.concatenate([hyper_u, hyper_i], axis=0)
            return tem + hyper, (tem, hyper)

        keys = jax.random.split(key, self.layer_num)
        _, (gcn, hyper) = jax.lax.scan(layer, embeds, keys)
        gcn_list = [gcn[i] for i in range(self.layer_num)]
        hyper_list = [hyper[i] for i in range(self.layer_num)]
        total = embeds + jnp.sum(gcn, axis=0) + jnp.sum(hyper, axis=0)
        return total, gcn_list, hyper_list

    def hparams(self):
        """Tuned loss scalars traced through ``batch['hp']`` so the shipped
        tune grid (``configs/hccf.yml``: layer_num × cl_weight × temperature)
        vmaps over (cl_weight, temperature) within each layer_num group."""
        return {"cl_weight": jnp.float32(self.cl_weight),
                "temperature": jnp.float32(self.temperature)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        cl_weight = hp.get("cl_weight", self.cl_weight)
        temperature = hp.get("temperature", self.temperature)
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        embeds, gcn_list, hyper_list = self.forward(params, key, self.keep_rate)
        u_emb, i_emb = embeds[: self.user_num], embeds[self.user_num:]
        diff = (jnp.sum(u_emb[ancs] * i_emb[poss], -1)
                - jnp.sum(u_emb[ancs] * i_emb[negs], -1))
        bpr = -jnp.mean(jnp.log(jax.nn.sigmoid(diff) + 1e-12))

        cl = 0.0
        for i in range(self.layer_num):
            e1 = jax.lax.stop_gradient(gcn_list[i])
            e2 = hyper_list[i]
            cl = cl + losses.infonce_loss_spec_nodes(
                e1[: self.user_num], e2[: self.user_num], ancs, temperature)
            cl = cl + losses.infonce_loss_spec_nodes(
                e1[self.user_num:], e2[self.user_num:], poss, temperature)
        cl = cl * cl_weight
        reg = self.reg_weight * losses.reg_params(params)
        return bpr + cl + reg, {"bpr_loss": bpr, "reg_loss": reg, "cl_loss": cl}

    def generate(self, params):
        # eval: keep_rate=1 → no dropout; key unused on that path
        embeds, _, _ = self.forward(params, jax.random.PRNGKey(0), 1.0)
        return embeds[: self.user_num], embeds[self.user_num:]
