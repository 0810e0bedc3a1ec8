"""Shared machinery for the sequential (transformer) model family.

Evaluation contract: the base ``Evaluator`` calls ``generate(params)`` once and
then ``rating(user_emb[users], item_emb)`` per batch.  Sequential models compute
a hidden state per *test sequence* (one chunked forward over all test rows,
mirroring the reference's per-batch ``full_predict``), scatter it into a
``[user_num, d+1]`` table, and fold the output bias in as an extra coordinate
(user side appends 1, item side appends the bias) so plain dot-product rating
reproduces ``out_fc`` logits exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sslrec_tpu.models.base import RecModel


class SequentialModel(RecModel):
    batch_fields = ("user", "seq", "pos")  # no negatives by default

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.max_len = int(m.max_seq_len)
        self.dropout_rate = float(m.dropout_rate)
        self.n_layers = int(m.n_layers)
        self.n_heads = int(m.n_heads)
        self.emb_size = int(m.embedding_size)
        self.test_seqs = data.extras["test_seqs"]
        self.test_uids = data.extras["test_uids"]
        self.score_cols = int(data.extras["score_cols"])

    # -- subclass API -------------------------------------------------------
    def encode_for_predict(self, params, seqs):
        """[B, L] → [B, d] final-position representation (eval mode)."""
        raise NotImplementedError

    def item_logits_params(self, params):
        """Return (W [score_cols, d], b [score_cols]) of the output projection."""
        raise NotImplementedError

    # -- Evaluator contract -------------------------------------------------
    def generate(self, params, chunk: int = 512):
        n = self.test_seqs.shape[0]
        pad = (-n) % chunk
        seqs = jnp.concatenate([self.test_seqs,
                                jnp.zeros((pad, self.max_len), jnp.int32)])
        h = lax.map(lambda s: self.encode_for_predict(params, s),
                    seqs.reshape(-1, chunk, self.max_len))
        h = h.reshape(-1, h.shape[-1])[:n]
        table = jnp.zeros((self.user_num, h.shape[-1] + 1), h.dtype)
        table = table.at[self.test_uids].set(
            jnp.concatenate([h, jnp.ones((n, 1), h.dtype)], axis=1))
        w, b = self.item_logits_params(params)
        item_emb = jnp.concatenate([w, b[:, None]], axis=1)
        return table, item_emb
