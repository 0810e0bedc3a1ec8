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
from sslrec_tpu.ops.spmm import spmm_layers, spmm_views


class SGL(LightGCN):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.augmentation = cfg.model.augmentation
        self.cl_weight = float(cfg.model.cl_weight)
        self.temperature = float(cfg.model.temperature)

    def _view_inputs(self, params, key, keep_rate):
        """(x0, edge_weight) for one augmented view (``sgl.py:20-36``)."""
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], axis=0)
        edge_weight = None
        if self.augmentation == "node_drop":
            embeds = augment.node_drop(key, embeds, keep_rate)
        elif self.augmentation == "edge_drop":
            edge_weight = augment.edge_drop(key, self.adj, keep_rate)
        elif self.augmentation == "random_walk":
            # fresh edge-drop sample per layer (the reference's branch is broken
            # — SURVEY §7 known bugs — this is the intended semantics)
            edge_weight = augment.edge_drop(key, self.adj, keep_rate,
                                            salts=jnp.arange(self.layer_num))
        return embeds, edge_weight

    def forward_view(self, params, key, keep_rate):
        """One augmented propagation view, scanned (single spmm instance)."""
        x0, ew = self._view_inputs(params, key, keep_rate)
        acc = x0 + spmm_layers(self.adj, x0, self.layer_num, ew).sum(axis=0)
        return acc[: self.user_num], acc[self.user_num:]

    def _two_views(self, params, key):
        """Both augmented views through ONE shared spmm call site."""
        k1, k2 = jax.random.split(key)
        x0a, ewa = self._view_inputs(params, k1, self.keep_rate)
        x0b, ewb = self._view_inputs(params, k2, self.keep_rate)
        x0s = jnp.stack([x0a, x0b])
        # tree-stack handles both [nnz] masks and PaddedEdgeWeight layouts
        ews = (None if ewa is None
               else jax.tree.map(lambda *xs: jnp.stack(xs), ewa, ewb))
        out = spmm_views(self.adj, x0s, self.layer_num, ews)  # [2, L, N, d]
        acc = x0s + out.sum(axis=1)
        return acc[0], acc[1]

    def hparams(self):
        """Traced loss scalars for the shipped grid (layer_num structural)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "cl_weight": jnp.float32(self.cl_weight),
                "temperature": jnp.float32(self.temperature)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_w = hp.get("reg_weight", self.reg_weight)
        cl_w = hp.get("cl_weight", self.cl_weight)
        temperature = hp.get("temperature", self.temperature)
        v1, v2 = self._two_views(params, key)
        u1, i1 = v1[: self.user_num], v1[self.user_num:]
        u2, i2 = v2[: self.user_num], v2[self.user_num:]
        u3, i3 = self.propagate(params)  # clean view for BPR

        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        bpr = losses.bpr_loss(u3[ancs], i3[poss], i3[negs]) / ancs.shape[0]
        cl = (losses.infonce_loss(u1[ancs], u2[ancs], u2, temperature)
              + losses.infonce_loss(i1[poss], i2[poss], i2, temperature)
              + losses.infonce_loss(i1[negs], i2[negs], i2, temperature))
        cl = cl / ancs.shape[0] * cl_w
        reg = reg_w * losses.reg_params(params)
        return bpr + cl + reg, {"bpr_loss": bpr, "reg_loss": reg, "cl_loss": cl}
