"""DSL — denoised self-augmented learning: LightGCN on the UI graph + a second
LightGCN on the social (user-user) graph, with hinge-matched cross-view labels.

Parity with ``models/social/dsl.py:12-151``: shared user embedding table feeds
both towers; BPR (sum-reduced) on UI triples and on social (user, friend,
neg-user) triples; the self-augmented term hinges sigmoid-labelled UI-space
similarity against social-space dot products for random user pairs.  The
reference's special trainer only adds grad-clip 10 (``trainer/trainer.py:451-489``)
— expressed here via the model's ``grad_clip`` attribute.

No ``hparams()`` hook (tuner note, r5): the shipped tune grid is ENTIRELY
structural — ``gnn_layer``/``uugnn_layer`` size the two towers'
``nn.Sequential`` stacks in the reference (``dsl.py:102,126``), i.e. the
Python loop counts here.  Every trial is a different compiled program, so the
tuner's serial structural-group fallback is the only correct execution; there
is no traced lane to vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.data.sampling import sample_negatives
from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


class DSL(RecModel):
    batch_fields = ("user", "pos", "neg", "suser", "spos", "sneg")
    grad_clip = 10.0  # DSLTrainer clips grad-norm at 10

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.adj = data.extras["bi_adj"]
        self.uu_adj = data.extras["uu_adj"]
        self.trust_edge_set = data.extras["trust_edge_set"]
        self.gnn_layer = int(m.gnn_layer)
        self.uugnn_layer = int(m.uugnn_layer)
        self.leaky = float(m.leaky)
        self.reg_weight = float(m.reg_weight)
        self.soc_weight = float(m.soc_weight)
        self.sal_weight = float(m.sal_weight)
        self.dropout_rate = float(m.dropout_rate)

    def init_params(self, key):
        ks = jax.random.split(key, 4)
        d = self.embedding_size
        return {
            "user_embeds": xavier_uniform(ks[0], (self.user_num, d)),
            "item_embeds": xavier_uniform(ks[1], (self.item_num, d)),
            "linear1": linear_params(ks[2], 2 * d, d),
            "linear2": linear_params(ks[3], d, 1),
        }

    # trainer hook: social negatives rejected against the trust graph
    def extra_negatives(self, key, arrays):
        return {"sneg": sample_negatives(key, arrays["suser"],
                                         self.trust_edge_set, self.user_num)}

    def _towers(self, params):
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], 0)
        acc = embeds
        for _ in range(self.gnn_layer):
            embeds = spmm(self.adj, embeds)
            acc = acc + embeds
        u_soc = params["user_embeds"]
        acc_s = u_soc
        for _ in range(self.uugnn_layer):
            u_soc = spmm(self.uu_adj, u_soc)
            acc_s = acc_s + u_soc
        return acc[: self.user_num], acc[self.user_num:], acc_s

    def _label(self, params, key, lat1, lat2, training):
        """(``dsl.py:40-45``) sigmoid-scored pair labels in UI space."""
        from sslrec_tpu.models.layers import dropout

        k1, k2 = jax.random.split(key)
        lat = jnp.concatenate([lat1, lat2], axis=-1)
        h = dropout(k1, lat @ params["linear1"]["w"] + params["linear1"]["b"],
                    self.dropout_rate, not training)
        lat = jax.nn.leaky_relu(h, self.leaky) + lat1 + lat2
        out = dropout(k2, lat @ params["linear2"]["w"] + params["linear2"]["b"],
                      self.dropout_rate, not training)
        return jax.nn.sigmoid(out).reshape(-1)

    def loss(self, params, batch, key):
        ku, kl = jax.random.split(key)
        user_embeds, item_embeds, user_embeds2 = self._towers(params)
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        rec = losses.bpr_loss(user_embeds[ancs], item_embeds[poss], item_embeds[negs])
        reg = self.reg_weight * losses.reg_params(params)
        soc = self.soc_weight * losses.bpr_loss(
            user_embeds2[batch["suser"]], user_embeds2[batch["spos"]],
            user_embeds2[batch["sneg"]])
        # random user pairs for self-augmented matching (drawn on device; the
        # reference draws them per __getitem__, datasets_social.py:69-72).
        # Tests may inject fixed pairs via batch["sal_u1"/"sal_u2"].
        n = ancs.shape[0]
        if "sal_u1" in batch:
            u1, u2 = batch["sal_u1"], batch["sal_u2"]
        else:
            u1 = jax.random.randint(jax.random.fold_in(ku, 0), (n,), 0, self.user_num)
            u2 = jax.random.randint(jax.random.fold_in(ku, 1), (n,), 0, self.user_num)
        scores = self._label(params, kl, user_embeds[u1], user_embeds[u2], True)
        preds = jnp.sum(user_embeds2[u1] * user_embeds2[u2], axis=-1)
        sal = self.sal_weight * jnp.sum(jnp.maximum(0.0, 1.0 - scores * preds))
        loss = rec + reg + soc + sal
        return loss, {"rec_loss": rec, "reg_loss": reg,
                      "soc_loss": soc, "sal_loss": sal}

    def generate(self, params):
        u, i, _ = self._towers(params)
        return u, i
