"""NCL — neighborhood-enriched contrastive learning: structural CL between
layer-0 and layer-2k embeddings + prototype CL against KMeans centroids.

Parity with ``models/general_cf/ncl.py:11-97``: no edge dropout; propagation runs
``max(layer_num, high_order*2)`` hops but the prediction embedding sums only
``layer_num+1`` layers; re-clusters every ``epoch_period`` epochs (the reference
threads this through a per-batch epoch flag in ``PairwiseWEpochFlagTrnData``,
``data_utils/datasets_general_cf.py:28-44`` — here it is a per-epoch trainer
hook, and clustering itself is the jitted pure-JAX KMeans from
``models/augment.py`` instead of the reference's torch loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.models import augment, losses
from sslrec_tpu.models.general_cf.lightgcn import LightGCN
from sslrec_tpu.ops.spmm import spmm_layers


class NCL(LightGCN):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.proto_weight = float(m.proto_weight)
        self.struct_weight = float(m.struct_weight)
        self.temperature = float(m.temperature)
        self.high_order = int(m.high_order)
        self.cluster_num = int(m.cluster_num)
        self.epoch_period = int(m.epoch_period)
        self._cluster_cache = None

        @jax.jit
        def _cluster(params, key):
            ku, ki = jax.random.split(key)
            ucent, u2c, _ = augment.kmeans(ku, params["user_embeds"], self.cluster_num)
            icent, i2c, _ = augment.kmeans(ki, params["item_embeds"], self.cluster_num)
            return {"user_centroids": ucent, "user2cluster": u2c,
                    "item_centroids": icent, "item2cluster": i2c}

        # pure refresh fn + period exposed separately so the vmapped tuner can
        # batch the re-clustering across trials (tuner.py::vmapped_grid_search)
        self.epoch_state_fn = _cluster
        self.epoch_state_period = self.epoch_period

    # trainer hook: refresh prototypes every epoch_period epochs
    def epoch_state(self, params, key, epoch):
        if self._cluster_cache is None or epoch % self.epoch_period == 0:
            self._cluster_cache = self.epoch_state_fn(params, key)
        return self._cluster_cache

    def _propagate_list(self, params):
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], axis=0)
        n_hops = max(self.layer_num, self.high_order * 2)
        ys = spmm_layers(self.adj, embeds, n_hops)  # one spmm instance
        return [embeds] + [ys[i] for i in range(n_hops)]

    def hparams(self):
        """Tuned scalars threaded as traced args (``batch['hp']``) so the grid
        search (``configs/ncl.yml`` tune block, 45 trials) shares ONE compiled
        epoch program across trials."""
        return {"temperature": jnp.float32(self.temperature),
                "proto_weight": jnp.float32(self.proto_weight),
                "struct_weight": jnp.float32(self.struct_weight)}

    def loss(self, params, batch, key):
        aux = batch["aux"]
        hp = batch.get("hp", {})
        temp = hp.get("temperature", self.temperature)
        proto_w = hp.get("proto_weight", self.proto_weight)
        struct_w = hp.get("struct_weight", self.struct_weight)
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        embeds_list = self._propagate_list(params)
        final = sum(embeds_list[: self.layer_num + 1])
        ego = embeds_list[0]
        context = embeds_list[self.high_order * 2]

        u_fin, i_fin = final[: self.user_num], final[self.user_num:]
        bpr = losses.bpr_loss(u_fin[ancs], i_fin[poss], i_fin[negs]) / ancs.shape[0]

        u_ego, i_ego = ego[: self.user_num], ego[self.user_num:]
        u_ctx, i_ctx = context[: self.user_num], context[self.user_num:]
        struct = (losses.infonce_loss(u_ctx[ancs], u_ego[ancs], u_ego, temp)
                  + losses.infonce_loss(i_ctx[poss], i_ego[poss], i_ego, temp)
                  ) / ancs.shape[0] * struct_w

        ucent = jax.lax.stop_gradient(aux["user_centroids"])
        icent = jax.lax.stop_gradient(aux["item_centroids"])
        proto = (losses.infonce_loss(u_ego[ancs], ucent[aux["user2cluster"][ancs]],
                                     ucent, temp)
                 + losses.infonce_loss(i_ego[poss], icent[aux["item2cluster"][poss]],
                                       icent, temp)
                 ) / ancs.shape[0] * proto_w

        reg = self.reg_weight * losses.reg_params(params)
        loss = bpr + struct + proto + reg
        return loss, {"bpr_loss": bpr, "reg_loss": reg,
                      "struct_loss": struct, "proto_loss": proto}

    def generate(self, params):
        embeds_list = self._propagate_list(params)
        final = sum(embeds_list[: self.layer_num + 1])
        return final[: self.user_num], final[self.user_num:]
