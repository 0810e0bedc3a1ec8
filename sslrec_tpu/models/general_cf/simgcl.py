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
from sslrec_tpu.ops.spmm import spmm_layers, spmm_views


class SimGCL(LightGCN):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.cl_weight = float(cfg.model.cl_weight)
        self.temperature = float(cfg.model.temperature)
        self.eps = float(cfg.model.eps)

    def _two_perturbed(self, params, key, eps=None):
        """Both noise views through ONE shared spmm call site."""
        eps = self.eps if eps is None else eps
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], axis=0)
        x0s = jnp.stack([embeds, embeds])
        keys = jax.random.split(key, 2 * self.layer_num).reshape(
            2, self.layer_num, 2)
        out = spmm_views(self.adj, x0s, self.layer_num,
                         post=lambda k, x: augment.embed_perturb(k, x, eps),
                         keys=keys)
        acc = x0s + out.sum(axis=1)
        return acc[0], acc[1]

    def hparams(self):
        """Traced loss scalars for the shipped grid (layer_num structural;
        eps only scales the post-layer noise, so it rides a lane too)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "cl_weight": jnp.float32(self.cl_weight),
                "temperature": jnp.float32(self.temperature),
                "eps": jnp.float32(self.eps)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_w = hp.get("reg_weight", self.reg_weight)
        cl_w = hp.get("cl_weight", self.cl_weight)
        temperature = hp.get("temperature", self.temperature)
        v1, v2 = self._two_perturbed(params, key, eps=hp.get("eps"))
        u1, i1 = v1[: self.user_num], v1[self.user_num:]
        u2, i2 = v2[: self.user_num], v2[self.user_num:]
        u3, i3 = self.propagate(params)

        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        bpr = losses.bpr_loss(u3[ancs], i3[poss], i3[negs]) / ancs.shape[0]
        cl = (losses.infonce_loss(u1[ancs], u2[ancs], u2, temperature)
              + losses.infonce_loss(i1[poss], i2[poss], i2, temperature))
        cl = cl / ancs.shape[0] * cl_w
        reg = reg_w * losses.reg_params(params)
        return bpr + cl + reg, {"bpr_loss": bpr, "reg_loss": reg, "cl_loss": cl}
