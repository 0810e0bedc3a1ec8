"""LightGCN — k-layer linear propagation over the normalised bipartite adjacency.

Capability parity with ``models/general_cf/lightgcn.py:11-66``: sum of layer
embeddings, per-batch edge dropout at ``keep_rate``, BPR (mean over batch) +
L2-of-all-params regularisation.  TPU-natively the propagation is a row-sorted
COO gather/segment-sum (``ops/spmm.py``) and edge dropout is a static-shape 0/1
edge-weight mask, all inside one jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.models import augment, losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.spmm import spmm, spmm_layers  # noqa: F401 (spmm used by subclasses)
from sslrec_tpu.utils.initializers import xavier_uniform


class LightGCN(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.adj = data.extras["bi_adj"]
        self.layer_num = int(cfg.model.layer_num)
        self.reg_weight = float(cfg.model.reg_weight)
        self.keep_rate = float(cfg.model.keep_rate)
        # Under train.mesh with a model axis, ``propagate`` runs
        # graph-partitioned (r5; destination-owned edge shards +
        # all_gather hops) instead of leaving replicated edge arrays to
        # GSPMD — covers every subclass that propagates through this
        # method (SGL/SimGCL/NCL/DirectAU clean forwards).  Edge dropout
        # rides the partitioned layout as a flat [nnz] mask.
        import numpy as np
        from sslrec_tpu.parallel.dist_train import maybe_partition_bi
        g = self.adj
        self._mesh, self._sg = maybe_partition_bi(
            cfg, np.asarray(g.rows), np.asarray(g.cols), self.user_num,
            self.item_num, vals=np.asarray(g.vals))
        if self._sg is not None:
            self._flat_vals = jnp.asarray(np.asarray(g.vals))

    def init_params(self, key):
        uk, ik = jax.random.split(key)
        return {
            "user_embeds": xavier_uniform(uk, (self.user_num, self.embedding_size)),
            "item_embeds": xavier_uniform(ik, (self.item_num, self.embedding_size)),
        }

    def propagate(self, params, edge_weight=None):
        """Sum-of-layers propagation (``lightgcn.py:31-43``) — scanned so all
        hops share one spmm (and one Pallas kernel) instance; under
        ``train.mesh`` the hops run graph-partitioned (``edge_weight`` must
        then be a flat [nnz] mask in original edge order)."""
        if self._sg is not None:
            from sslrec_tpu.parallel.dist_train import (
                mesh_partitioned_propagate, view_vals_partitioned)
            pv = self._sg.vals
            if edge_weight is not None:
                pv = view_vals_partitioned(self._sg,
                                           self._flat_vals * edge_weight)
            return mesh_partitioned_propagate(
                self._mesh, self._sg, params["user_embeds"],
                params["item_embeds"], pv, self.layer_num, combine="sum")
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], axis=0)
        ys = spmm_layers(self.adj, embeds, self.layer_num, edge_weight)
        acc = embeds + ys.sum(axis=0)
        return acc[: self.user_num], acc[self.user_num:]

    def forward_train(self, params, key):
        if self._sg is not None:
            ew = (augment.edge_drop_mask(key, self._flat_vals.shape[0],
                                         self.keep_rate)
                  if self.keep_rate < 1.0 else None)
            return self.propagate(params, edge_weight=ew)
        ew = augment.edge_drop(key, self.adj, self.keep_rate)
        return self.propagate(params, edge_weight=ew)

    def hparams(self):
        """Tuned loss scalars traced through ``batch['hp']`` (shipped grid:
        layer_num is structural, reg_weight rides a lane)."""
        return {"reg_weight": jnp.float32(self.reg_weight)}

    def loss(self, params, batch, key):
        reg_w = batch.get("hp", {}).get("reg_weight", self.reg_weight)
        user_embeds, item_embeds = self.forward_train(params, key)
        anc = user_embeds[batch["user"]]
        pos = item_embeds[batch["pos"]]
        neg = item_embeds[batch["neg"]]
        bpr = losses.bpr_loss(anc, pos, neg) / anc.shape[0]
        reg = reg_w * losses.reg_params(params)
        return bpr + reg, {"bpr_loss": bpr, "reg_loss": reg}

    def generate(self, params):
        return self.propagate(params, edge_weight=None)
