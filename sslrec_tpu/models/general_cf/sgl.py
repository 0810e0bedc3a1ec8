"""SGL — self-supervised graph learning: two augmented propagation views +
InfoNCE against the full embedding table.

Parity with ``models/general_cf/sgl.py:11-65``: augmentation ∈ {edge_drop,
node_drop, random_walk}; BPR on the *clean* (keep_rate=1) view; CL on anchors,
positives and negatives with denominators over all users/items; cl_loss divided
by batch size.  The reference's random_walk branch is broken (uses ``tem_adj``
before assignment, SURVEY §7 known bugs) — here it is implemented properly as a
fresh edge-drop sample per layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.models import augment, losses
from sslrec_tpu.models.general_cf.lightgcn import LightGCN
from sslrec_tpu.ops.spmm import spmm


class SGL(LightGCN):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.augmentation = cfg.model.augmentation
        self.cl_weight = float(cfg.model.cl_weight)
        self.temperature = float(cfg.model.temperature)

    def forward_view(self, params, key, keep_rate):
        """One augmented propagation view (``sgl.py:20-36``)."""
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], axis=0)
        if self.augmentation == "node_drop":
            key, sub = jax.random.split(key)
            embeds = augment.node_drop(sub, embeds, keep_rate)
        edge_weight = None
        if self.augmentation == "edge_drop":
            key, sub = jax.random.split(key)
            edge_weight = augment.edge_drop_mask(sub, self.adj.nnz, keep_rate)
        acc = embeds
        for _ in range(self.layer_num):
            ew = edge_weight
            if self.augmentation == "random_walk":
                key, sub = jax.random.split(key)
                ew = augment.edge_drop_mask(sub, self.adj.nnz, keep_rate)
            embeds = spmm(self.adj, embeds, edge_weight=ew)
            acc = acc + embeds
        return acc[: self.user_num], acc[self.user_num:]

    def loss(self, params, batch, key):
        k1, k2 = jax.random.split(key)
        u1, i1 = self.forward_view(params, k1, self.keep_rate)
        u2, i2 = self.forward_view(params, k2, self.keep_rate)
        u3, i3 = self.propagate(params)  # clean view for BPR

        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        bpr = losses.bpr_loss(u3[ancs], i3[poss], i3[negs]) / ancs.shape[0]
        cl = (losses.infonce_loss(u1[ancs], u2[ancs], u2, self.temperature)
              + losses.infonce_loss(i1[poss], i2[poss], i2, self.temperature)
              + losses.infonce_loss(i1[negs], i2[negs], i2, self.temperature))
        cl = cl / ancs.shape[0] * self.cl_weight
        reg = self.reg_weight * losses.reg_params(params)
        return bpr + cl + reg, {"bpr_loss": bpr, "reg_loss": reg, "cl_loss": cl}
