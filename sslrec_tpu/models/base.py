"""Model protocol.

The reference's contract (``models/base_model.py:6-47``) is an ``nn.Module`` with
``forward`` / ``cal_loss(batch) -> (loss, dict)`` / ``full_predict(batch)``.
The TPU-native contract is *functional*: a model object holds only static
structure (config scalars, device-resident graphs); parameters live in an explicit
pytree so the train step jits cleanly and shards under a mesh.

Required methods
----------------
``init_params(key) -> params``      parameter pytree
``loss(params, batch, key) -> (loss, {name: scalar})``   pure, jittable
``generate(params) -> (user_emb, item_emb)``             eval-mode embeddings

Optional
--------
``rating(user_emb, item_emb) -> scores``  (default: dot product)
``full_predict(params, users) -> [B, n_items]``  (default: generate+rating; the
    generate() result is lifted out of the per-batch loop by the evaluator)
``epoch_hooks`` — see trainer: host-level per-epoch callbacks (clustering, view
    regeneration, diffusion sub-loops) for the models whose reference trainers do
    epoch-level augmentation (SURVEY §3.5).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = Any


class RecModel:
    # which batch fields the default trainer feeds: ("user","pos","neg") pairwise
    batch_fields = ("user", "pos", "neg")

    def __init__(self, cfg, data):
        self.cfg = cfg
        self.data = data
        self.user_num = data.user_num
        self.item_num = data.item_num
        self.embedding_size = int(cfg.model.embedding_size)

    # -- protocol -----------------------------------------------------------
    def init_params(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def loss(self, params: Params, batch: dict, key: jax.Array):
        raise NotImplementedError

    def generate(self, params: Params):
        raise NotImplementedError

    def rating(self, user_emb: jnp.ndarray, item_emb: jnp.ndarray) -> jnp.ndarray:
        return user_emb @ item_emb.T

    # -- parallelism --------------------------------------------------------
    def sharded_row_dims(self) -> set[int]:
        """Leading-dimension sizes whose parameter rows shard over ``model``.

        Default: the embedding-table row spaces — user/item tables, the fused
        ``[U+I]`` node table, and (for KG models) the entity/node table.  A
        model with differently-shaped big tables overrides this.
        """
        dims = {self.user_num, self.item_num, self.user_num + self.item_num}
        for attr in ("node_num", "entity_num", "n_nodes"):
            v = getattr(self, attr, None)
            if v:
                dims.add(int(v))
        return dims

    def param_shardings(self, mesh, params: Params):
        """NamedSharding pytree for ``params``: embedding-table rows over the
        ``model`` axis, everything else replicated.

        This is the generic TP rule the config-driven mesh path uses
        (``train.mesh: {data: N, model: M}``): GSPMD propagates these argument
        shardings through the whole jitted epoch program and inserts the
        collectives — no per-model sharded step required.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sslrec_tpu.parallel.mesh import MODEL_AXIS

        n_model = mesh.shape[MODEL_AXIS]
        row_dims = self.sharded_row_dims()

        def rule(leaf):
            if (getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] in row_dims
                    and leaf.shape[0] % n_model == 0):
                return NamedSharding(mesh, P(MODEL_AXIS))
            return NamedSharding(mesh, P())

        return jax.tree.map(rule, params)

    # -- shared helpers -----------------------------------------------------
    @staticmethod
    def mask_predict(preds: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """``preds * (1-mask) - 1e8 * mask`` (``models/base_model.py:35-36``)."""
        return preds * (1.0 - mask) - 1e8 * mask
