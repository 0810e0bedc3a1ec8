"""LightGCL — GNN branch contrasted with a rank-q SVD-reconstructed branch.

Parity with ``models/general_cf/lightgcl.py:12-144``: rectangular UI adjacency
normalised by 1/√(rowD·colD); per-layer Z_u = Â·E_i, Z_i = Âᵀ·E_u (independent
value-dropout per call); SVD branch G via (U·S)(Vᵀ·E); sums over layers include
layer 0; BPR as mean −log σ; CL = LSE negatives − clamped positives.  The
``W_contrastive`` weights exist in the reference but are used only through the
L2 regulariser (``lightgcl.py:48,121``) — replicated for reg parity.

TPU-natively the one-shot SVD is the randomised subspace iteration from
``models/augment.py`` (replaces ``torch.svd_lowrank``), and both propagation
directions are scatter-free Pallas spmm graphs on TPU.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sslrec_tpu.models import augment, losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.ops.pallas_spmm import maybe_pallas
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.utils.initializers import xavier_uniform


class LightGCL(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.temp = float(m.temp)
        self.dropout = float(m.dropout)
        self.layer_num = int(m.layer_num)
        self.cl_weight = float(m.cl_weight)
        self.reg_weight = float(m.reg_weight)
        self.svd_q = int(m.svd_q)

        # 1/sqrt(rowD * colD) normalised rectangular adjacency (lightgcl.py:16-21)
        train_mat = data.extras["train_mat_scipy"].tocoo().astype(np.float32)
        row_d = np.asarray(train_mat.sum(1)).squeeze()
        col_d = np.asarray(train_mat.sum(0)).squeeze()
        vals = train_mat.data / np.sqrt(row_d[train_mat.row] * col_d[train_mat.col])
        norm = sp.coo_matrix((vals, (train_mat.row, train_mat.col)), train_mat.shape)
        use = cfg.model.get("use_pallas", True)  # scanned loop: few kernel instances
        self.adj = maybe_pallas(norm, use)
        self.adj_t = maybe_pallas(norm.transpose().tocsr().tocoo(), use)

        # one-shot randomized SVD (augment.svd_decompose ~ t.svd_lowrank)
        self.ut, self.vt, self.u_mul_s, self.v_mul_s = augment.svd_decompose(
            jax.random.PRNGKey(2023), self.adj, q=self.svd_q)

    def init_params(self, key):
        keys = jax.random.split(key, 2 + self.layer_num)
        d = self.embedding_size
        return {
            "user_embeds": xavier_uniform(keys[0], (self.user_num, d)),
            "item_embeds": xavier_uniform(keys[1], (self.item_num, d)),
            # present in the reference; only the L2 reg touches them
            "ws": [xavier_uniform(k, (d, d)) for k in keys[2:]],
        }

    def forward(self, params, key, training):
        drop = training and self.dropout > 0

        # scanned layer loop: the two rectangular spmm directions appear once
        # each (two kernel instances total, regardless of layer_num)
        def layer(carry, k):
            pu, pi = carry
            ew_u = ew_i = None
            if drop:
                k1, k2 = jax.random.split(k)
                ew_u = augment.edge_drop(k1, self.adj, 1 - self.dropout,
                                         resize_val=True)
                ew_i = augment.edge_drop(k2, self.adj_t, 1 - self.dropout,
                                         resize_val=True)
            z_u = spmm(self.adj, pi, edge_weight=ew_u)
            z_i = spmm(self.adj_t, pu, edge_weight=ew_i)
            gu = self.u_mul_s @ (self.vt @ pi)
            gi = self.v_mul_s @ (self.ut @ pu)
            return (z_u, z_i), (z_u, z_i, gu, gi)

        keys = jax.random.split(key, self.layer_num)
        _, (zu, zi, gu, gi) = jax.lax.scan(
            layer, (params["user_embeds"], params["item_embeds"]), keys)
        e_u = params["user_embeds"] + jnp.sum(zu, axis=0)
        e_i = params["item_embeds"] + jnp.sum(zi, axis=0)
        g_u = params["user_embeds"] + jnp.sum(gu, axis=0)
        g_i = params["item_embeds"] + jnp.sum(gi, axis=0)
        return e_u, e_i, g_u, g_i

    def loss(self, params, batch, key):
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        eu, ei, gu, gi = self.forward(params, key, training=True)
        pos_s = jnp.sum(eu[ancs] * ei[poss], -1)
        neg_s = jnp.sum(eu[ancs] * ei[negs], -1)
        bpr = -jnp.mean(jnp.log(jax.nn.sigmoid(pos_s - neg_s) + 1e-12))

        # reference computes log(Σexp(·)+1e-8) (lightgcl.py:114-115), which
        # overflows f32 exp once logits/temp exceed ~88 and NaN-collapses the
        # run (observed at epoch 2 on yelp); logsumexp is the same quantity
        # computed stably (the +1e-8 only matters when every logit < -18)
        neg_score = jnp.mean(jax.nn.logsumexp(gu[ancs] @ eu.T / self.temp, axis=1))
        neg_score += jnp.mean(jax.nn.logsumexp(gi[poss] @ ei.T / self.temp, axis=1))
        pos_score = jnp.mean(jnp.clip(jnp.sum(gu[ancs] * eu[ancs], 1) / self.temp, -5.0, 5.0))
        pos_score += jnp.mean(jnp.clip(jnp.sum(gi[poss] * ei[poss], 1) / self.temp, -5.0, 5.0))
        cl = self.cl_weight * (neg_score - pos_score)

        reg = self.reg_weight * losses.reg_params(params)
        return bpr + cl + reg, {"bpr_loss": bpr, "reg_loss": reg, "cl_loss": cl}

    def generate(self, params):
        eu, ei, _, _ = self.forward(params, jax.random.PRNGKey(0), training=False)
        return eu, ei
