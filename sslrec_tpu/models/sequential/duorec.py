"""DuoRec — contrastive regularisation with model-level (dropout-twice) and
semantic (same-target sequence) positive pairs.

Parity with ``models/sequential/duorec.py:11-170``: next-item CE against the
token-embedding table; the semantic index maps each last-item to ≤20 training
rows sharing that target (``_semantic_augmentation`` ``:57-76``), sampled per
batch row (fallback: the row's own sequence); NT-Xent between a fresh dropout
forward of the batch and the forward of the sampled sequences.  The per-row
host sampling loop (``_duorec_aug`` ``:87-99``) becomes a device gather from a
padded candidate table.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.models import layers
from sslrec_tpu.models.sequential.base_seq import SequentialModel
from sslrec_tpu.models.sequential.cl4srec import nt_xent


class DuoRec(SequentialModel):
    batch_fields = ("user", "seq", "pos")

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.lmd_sem = float(cfg.model.lmd_sem)
        self.tau = float(cfg.model.tau)
        self.train_seqs = data.extras["train_arrays"]["seq"]

        # same-target index: item -> up to 20 train-row ids (host, once)
        lasts = np.asarray(data.extras["train_arrays"]["pos"])
        order = np.argsort(lasts, kind="stable")
        cand = np.zeros((self.item_num + 2, 20), np.int32)
        cnt = np.zeros((self.item_num + 2,), np.int32)
        rng = np.random.default_rng(0)
        start = 0
        sorted_lasts = lasts[order]
        for i in range(1, len(order) + 1):
            if i == len(order) or sorted_lasts[i] != sorted_lasts[start]:
                group = order[start:i]
                item = int(sorted_lasts[start])
                pick = (rng.choice(group, 20, replace=False)
                        if len(group) > 20 else group)
                cand[item, : len(pick)] = pick
                cnt[item] = len(pick)
                start = i
        self.cand_table = jnp.asarray(cand)
        self.cand_count = jnp.asarray(cnt)

    def init_params(self, key):
        return layers.init_transformer_tower(
            key, self.item_num + 2, self.emb_size, self.max_len,
            self.n_layers)

    def _encode(self, params, key, seqs, deterministic):
        h = layers.apply_transformer_tower(params, key, seqs, self.n_heads,
                                           self.dropout_rate, deterministic)
        return h[:, -1, :]

    def _semantic_views(self, key, seqs, lasts):
        cnt = self.cand_count[lasts]                       # [B]
        j = jax.random.randint(key, lasts.shape, 0, jnp.maximum(cnt, 1))
        rows = self.cand_table[lasts, j]                   # [B]
        sampled = self.train_seqs[rows]                    # [B, L]
        return jnp.where((cnt > 0)[:, None], sampled, seqs)

    def hparams(self):
        """Traced tune-grid scalars (no structural hypers in the grid)."""
        return {"lmd_sem": jnp.float32(self.lmd_sem),
                "tau": jnp.float32(self.tau)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        lmd_sem = hp.get("lmd_sem", self.lmd_sem)
        tau = hp.get("tau", self.tau)
        k0, k1, k2, ks = jax.random.split(key, 4)
        seqs, lasts = batch["seq"], batch["pos"]
        h = self._encode(params, k0, seqs, deterministic=False)
        item_emb = params["emb"]["token"][: self.item_num + 1]
        logp = jax.nn.log_softmax(h @ item_emb.T, axis=-1)
        rec_loss = -jnp.mean(jnp.take_along_axis(logp, lasts[:, None], 1)[:, 0])

        h1 = self._encode(params, k1, seqs, deterministic=False)
        sem_seqs = self._semantic_views(ks, seqs, lasts)
        h2 = self._encode(params, k2, sem_seqs, deterministic=False)
        cl_loss = lmd_sem * nt_xent(h1, h2, tau)
        return rec_loss + cl_loss, {"rec_loss": rec_loss, "cl_loss": cl_loss}

    def encode_for_predict(self, params, seqs):
        return self._encode(params, jax.random.PRNGKey(0), seqs, deterministic=True)

    def item_logits_params(self, params):
        w = params["emb"]["token"][: self.item_num + 1]
        return w, jnp.zeros((w.shape[0],), w.dtype)
