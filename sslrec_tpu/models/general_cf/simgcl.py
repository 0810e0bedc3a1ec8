"""SimGCL — noise-perturbed propagation views + InfoNCE.

Parity with ``models/general_cf/simgcl.py:11-65``: perturbed views add
sign-aligned L2-normalised noise *after each propagation layer*; BPR on the
clean view; CL on anchors and positives only (no negative-side term, unlike SGL).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.models import augment, losses
from sslrec_tpu.models.general_cf.lightgcn import LightGCN
from sslrec_tpu.ops.spmm import spmm


class SimGCL(LightGCN):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.cl_weight = float(cfg.model.cl_weight)
        self.temperature = float(cfg.model.temperature)
        self.eps = float(cfg.model.eps)

    def forward_perturbed(self, params, key):
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], axis=0)
        acc = embeds
        for _ in range(self.layer_num):
            key, sub = jax.random.split(key)
            embeds = spmm(self.adj, embeds)
            embeds = augment.embed_perturb(sub, embeds, self.eps)
            acc = acc + embeds
        return acc[: self.user_num], acc[self.user_num:]

    def loss(self, params, batch, key):
        k1, k2 = jax.random.split(key)
        u1, i1 = self.forward_perturbed(params, k1)
        u2, i2 = self.forward_perturbed(params, k2)
        u3, i3 = self.propagate(params)

        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        bpr = losses.bpr_loss(u3[ancs], i3[poss], i3[negs]) / ancs.shape[0]
        cl = (losses.infonce_loss(u1[ancs], u2[ancs], u2, self.temperature)
              + losses.infonce_loss(i1[poss], i2[poss], i2, self.temperature))
        cl = cl / ancs.shape[0] * self.cl_weight
        reg = self.reg_weight * losses.reg_params(params)
        return bpr + cl + reg, {"bpr_loss": bpr, "reg_loss": reg, "cl_loss": cl}
