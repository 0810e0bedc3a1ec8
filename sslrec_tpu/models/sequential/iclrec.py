"""ICLRec — intent-prototype contrastive learning for sequential rec.

Parity with ``models/sequential/iclrec.py:12-344`` + ``ICLRecTrainer``
(``trainer/trainer.py:301-351``): per-epoch KMeans over mean-pooled encodings
of every training sequence (the reference uses faiss, 20 iterations; here the
jitted pure-JAX KMeans from ``models/augment.py``, centroids L2-normalised);
per batch: binary CE with sampled negatives, CL4SRec-style augmentations
(eta 0.2 / gamma 0.7 / beta 0.2) under an in-batch NCE, and prototype NCE
against each sequence's nearest centroid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sslrec_tpu.models import augment, layers, seq_augment
from sslrec_tpu.models.sequential.base_seq import SequentialModel


def nce_loss(z1, z2, temp):
    """(``iclrec.py:38-77``, intent_ids=None branch) 2N-way CE over
    [sim12|sim11] and [sim22|sim12ᵀ] logit blocks with -inf self-sims."""
    d = z1.shape[0]
    sim11 = z1 @ z1.T / temp
    sim22 = z2 @ z2.T / temp
    sim12 = z1 @ z2.T / temp
    eye = jnp.eye(d, dtype=bool)
    sim11 = jnp.where(eye, -jnp.inf, sim11)
    sim22 = jnp.where(eye, -jnp.inf, sim22)
    raw1 = jnp.concatenate([sim12, sim11], axis=-1)
    raw2 = jnp.concatenate([sim22, sim12.T], axis=-1)
    logits = jnp.concatenate([raw1, raw2], axis=0)      # [2d, 2d]
    labels = jnp.arange(2 * d)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1)[:, 0])


class ICLRec(SequentialModel):
    batch_fields = ("user", "seq", "pos", "neg")

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.cl_weight = float(m.cl_weight)
        self.intent_cl_weight = float(m.intent_cl_weight)
        self.tau = float(m.tau)
        self.num_clusters = int(m.num_intent_clusters)
        self.mask_token = self.item_num + 1
        self.train_seqs = data.extras["train_arrays"]["seq"]

    def init_params(self, key):
        return layers.init_transformer_tower(
            key, self.item_num + 2, self.emb_size, self.max_len, self.n_layers)

    def _encode(self, params, key, seqs, deterministic, mean=False):
        h = layers.apply_transformer_tower(params, key, seqs, self.n_heads,
                                           self.dropout_rate, deterministic)
        return jnp.mean(h, axis=1) if mean else h[:, -1, :]

    # trainer hook: re-cluster the mean-pooled encodings of all train rows
    def epoch_state(self, params, key, epoch):
        if not hasattr(self, "_cluster_fn"):
            @jax.jit
            def cluster_fn(params, key):
                chunk = 512
                n = self.train_seqs.shape[0]
                pad = (-n) % chunk
                seqs = jnp.concatenate(
                    [self.train_seqs, jnp.zeros((pad, self.max_len), jnp.int32)])
                enc = lax.map(
                    lambda s: self._encode(params, jax.random.PRNGKey(0), s,
                                           True, mean=True),
                    seqs.reshape(-1, chunk, self.max_len))
                enc = enc.reshape(-1, self.emb_size)[:n]
                cents, _, _ = augment.kmeans(key, enc, self.num_clusters, iters=20)
                # reference KMeans.query assigns by L2 against the RAW faiss
                # centroids but returns the L2-normalised ones for the PCL
                # contrast (iclrec.py:122-137) — keep both
                cents_n = cents / jnp.sqrt(
                    jnp.sum(jnp.square(cents), -1, keepdims=True) + 1e-12)
                return {"centroids": cents_n, "centroids_raw": cents}

            self._cluster_fn = cluster_fn
        return self._cluster_fn(jax.lax.stop_gradient(params), key)

    def loss(self, params, batch, key):
        k0, ka, k1, k2, k3, k4 = jax.random.split(key, 6)
        seqs = batch["seq"]
        h = self._encode(params, k0, seqs, deterministic=False)
        tok = params["emb"]["token"]
        pos_logits = jnp.sum(tok[batch["pos"]] * h, -1)
        neg_logits = jnp.sum(tok[batch["neg"]] * h, -1)
        rec = jnp.sum(-jnp.log(jax.nn.sigmoid(pos_logits) + 1e-24)
                      - jnp.log(1 - jax.nn.sigmoid(neg_logits) + 1e-24)) \
            / seqs.shape[0]

        v1, v2 = seq_augment.cl4srec_two_views(ka, seqs, self.mask_token,
                                               eta=0.2, gamma=0.7, beta=0.2)
        h1 = self._encode(params, k1, v1, deterministic=False, mean=True)
        h2 = self._encode(params, k2, v2, deterministic=False, mean=True)
        cl = self.cl_weight * nce_loss(h1, h2, self.tau)

        # prototype contrast: nearest RAW centroid of the clean mean encoding
        # (reference queries the faiss index of unnormalised centroids), then
        # contrast against the normalised centroid
        cents = batch["aux"]["centroids"]
        raw = batch["aux"]["centroids_raw"]
        h_mean = jax.lax.stop_gradient(
            self._encode(params, k3, seqs, deterministic=True, mean=True))
        d2 = (jnp.sum(h_mean**2, 1, keepdims=True)
              - 2 * h_mean @ raw.T + jnp.sum(raw**2, 1)[None, :])
        intent = cents[jnp.argmin(d2, axis=1)]
        intent_cl = self.intent_cl_weight * 0.5 * (
            nce_loss(h1, intent, self.tau) + nce_loss(h2, intent, self.tau))
        return rec + cl + intent_cl, {"rec_loss": rec, "cl_loss": cl,
                                      "intent_cl_loss": intent_cl}

    def encode_for_predict(self, params, seqs):
        return self._encode(params, jax.random.PRNGKey(0), seqs, True)

    def item_logits_params(self, params):
        w = params["emb"]["token"][: self.item_num + 1]
        return w, jnp.zeros((w.shape[0],), w.dtype)
