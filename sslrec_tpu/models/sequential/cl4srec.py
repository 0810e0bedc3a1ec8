"""CL4SRec — next-item CE + NT-Xent between two augmented sequence views.

Parity with ``models/sequential/cl4srec.py:11-202``: prediction head is the
(item-token-embedding)ᵀ over ids 0..item_num (no bias); per-row 2-of-3
{crop, mask, reorder} augmentation (vectorised on device, see
``models/seq_augment.py``); NT-Xent over the 2B in-batch views with raw
(unnormalised) dot-product similarities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.models import layers, seq_augment
from sslrec_tpu.models.sequential.base_seq import SequentialModel


def nt_xent(z1, z2, temp):
    """In-batch NT-Xent (cl4srec ``info_nce``, ``:144-164``): CE over
    [positive, all-other-samples] logits, mean over 2B rows."""
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)                 # [2B, d]
    sim = z @ z.T / temp                                  # [2B, 2B]
    pos = jnp.concatenate([jnp.sum(z1 * z2, -1), jnp.sum(z2 * z1, -1)]) / temp
    idx = jnp.arange(2 * b)
    partner = jnp.where(idx < b, idx + b, idx - b)
    neg_mask = jnp.ones((2 * b, 2 * b), bool)
    neg_mask = neg_mask.at[idx, idx].set(False)
    neg_mask = neg_mask.at[idx, partner].set(False)
    neg = jnp.where(neg_mask, sim, -jnp.inf)
    denom = jax.nn.logsumexp(jnp.concatenate([pos[:, None], neg], axis=1), axis=1)
    return jnp.mean(denom - pos)


class CL4SRec(SequentialModel):
    batch_fields = ("user", "seq", "pos")

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        self.lmd = float(cfg.model.lmd)
        self.tau = float(cfg.model.tau)
        self.mask_token = self.item_num + 1

    def init_params(self, key):
        return layers.init_transformer_tower(
            key, self.item_num + 2, self.emb_size, self.max_len,
            self.n_layers)

    def _encode(self, params, key, seqs, deterministic):
        h = layers.apply_transformer_tower(params, key, seqs, self.n_heads,
                                           self.dropout_rate, deterministic)
        return h[:, -1, :]

    def hparams(self):
        """Traced tune-grid scalars.  dropout_rate stays structural: it is
        baked into the transformer stack's dropout calls."""
        return {"lmd": jnp.float32(self.lmd), "tau": jnp.float32(self.tau)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        lmd = hp.get("lmd", self.lmd)
        tau = hp.get("tau", self.tau)
        kf, ka, k1, k2 = jax.random.split(key, 4)
        seqs = batch["seq"]
        h = self._encode(params, kf, seqs, deterministic=False)
        item_emb = params["emb"]["token"][: self.item_num + 1]
        logits = h @ item_emb.T
        labels = batch["pos"]
        logp = jax.nn.log_softmax(logits, axis=-1)
        rec_loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1)[:, 0])

        v1, v2 = seq_augment.cl4srec_two_views(ka, seqs, self.mask_token)
        h1 = self._encode(params, k1, v1, deterministic=False)
        h2 = self._encode(params, k2, v2, deterministic=False)
        cl_loss = lmd * nt_xent(h1, h2, tau)
        return rec_loss + cl_loss, {"rec_loss": rec_loss, "cl_loss": cl_loss}

    def encode_for_predict(self, params, seqs):
        return self._encode(params, jax.random.PRNGKey(0), seqs, deterministic=True)

    def item_logits_params(self, params):
        w = params["emb"]["token"][: self.item_num + 1]
        return w, jnp.zeros((w.shape[0],), w.dtype)
