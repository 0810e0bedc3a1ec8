"""DCCF — disentangled contrastive CF: intent prototypes + adaptive edge
re-weighting, 6-way layer-wise InfoNCE.

Parity with ``models/general_cf/dccf.py:14-156``: plain (unnormalised)
bidirectional adjacency whose D^-1/2 A D^-1/2 drives message passing
(``_cal_sparse_adj`` ``:57-63`` — done with scipy at init instead of
torch_sparse.spspmm); per layer intent attention softmax(E @ P)Pᵀ; adaptive
alpha-masked propagation over the plain edge structure; residual aggregation;
CL between gnn/int/gaa/iaa views with denominators over the *picked batch*
embeddings.  Deviation: ``torch.unique`` on batch nodes is replaced by the raw
batch (static shapes; duplicates weight terms proportionally).
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


class DCCF(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.layer_num = int(m.layer_num)
        self.intent_num = int(m.intent_num)
        self.reg_weight = float(m.reg_weight)
        self.cl_weight = float(m.cl_weight)
        self.temperature = float(m.temperature)

        trn = data.extras["train_mat_scipy"].tocoo()
        n = self.user_num + self.item_num
        rows = np.concatenate([trn.row, trn.col + self.user_num])
        cols = np.concatenate([trn.col + self.user_num, trn.row])
        plain = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                              shape=(n, n)).tocsr().tocoo()
        norm = sparse_ops.normalize_adj_sym(plain, eps=0.0)
        # same (row-sorted) edge order for both: build from the same csr
        use = cfg.model.get("use_pallas", True)  # scanned loop: few kernel instances
        self.plain_adj = maybe_pallas(plain, use)
        self.norm_adj = maybe_pallas(norm, use)

    def init_params(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        d = self.embedding_size
        return {
            "user_embeds": xavier_uniform(k1, (self.user_num, d)),
            "item_embeds": xavier_uniform(k2, (self.item_num, d)),
            "user_intent": xavier_uniform(k3, (d, self.intent_num)),
            "item_intent": xavier_uniform(k4, (d, self.intent_num)),
        }

    def forward(self, params):
        u = self.user_num
        embeds0 = jnp.concatenate([params["user_embeds"], params["item_embeds"]], 0)

        # scanned layer loop: 3 spmm instances total (norm_adj + 2×plain_adj)
        # instead of 3 per layer
        def layer(prev, _):
            gnn = spmm(self.norm_adj, prev)
            u_int = jax.nn.softmax(prev[:u] @ params["user_intent"], axis=1) \
                @ params["user_intent"].T
            i_int = jax.nn.softmax(prev[u:] @ params["item_intent"], axis=1) \
                @ params["item_intent"].T
            intent = jnp.concatenate([u_int, i_int], axis=0)
            gaa_vals = augment.adaptive_mask(self.plain_adj, gnn, gnn)
            iaa_vals = augment.adaptive_mask(self.plain_adj, intent, intent)
            gaa = spmm(self.plain_adj, prev, edge_weight=gaa_vals)
            iaa = spmm(self.plain_adj, prev, edge_weight=iaa_vals)
            return gnn + intent + gaa + iaa + prev, (gnn, intent, gaa, iaa)

        _, (gnn, intent, gaa, iaa) = jax.lax.scan(
            layer, embeds0, None, length=self.layer_num)
        L = self.layer_num
        # sum of all layer states: e0 + Σ_l e_l where e_l = prev + increments —
        # expand: Σ_l (L - l) · increment_l  ... keep the exact original sum by
        # reconstructing the per-layer cumulative states instead
        states = embeds0
        final = embeds0
        for l in range(L):
            states = gnn[l] + intent[l] + gaa[l] + iaa[l] + states
            final = final + states
        gnn_list = [gnn[l] for l in range(L)]
        int_list = [intent[l] for l in range(L)]
        gaa_list = [gaa[l] for l in range(L)]
        iaa_list = [iaa[l] for l in range(L)]
        return final[:u], final[u:], gnn_list, int_list, gaa_list, iaa_list

    def _cl_loss(self, users, items, gnn_list, int_list, gaa_list, iaa_list,
                 t=None):
        u = self.user_num
        t = self.temperature if t is None else t
        cl = 0.0
        n = users.shape[0]
        for gnn, inte, gaa, iaa in zip(gnn_list, int_list, gaa_list, iaa_list):
            ug, ui_, ua, uia = gnn[:u][users], inte[:u][users], gaa[:u][users], iaa[:u][users]
            ig, ii_, ia, iia = gnn[u:][items], inte[u:][items], gaa[u:][items], iaa[u:][items]
            cl += losses.infonce_loss(ug, ui_, ui_, t) / n
            cl += losses.infonce_loss(ug, ua, ua, t) / n
            cl += losses.infonce_loss(ug, uia, uia, t) / n
            cl += losses.infonce_loss(ig, ii_, ii_, t) / n
            cl += losses.infonce_loss(ig, ia, ia, t) / n
            cl += losses.infonce_loss(ig, iia, iia, t) / n
        return cl

    def hparams(self):
        """Traced tune-grid scalars (structural: layer_num)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "cl_weight": jnp.float32(self.cl_weight),
                "temperature": jnp.float32(self.temperature)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_w = hp.get("reg_weight", self.reg_weight)
        cl_w = hp.get("cl_weight", self.cl_weight)
        temp = hp.get("temperature", self.temperature)
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        u_emb, i_emb, gnn_l, int_l, gaa_l, iaa_l = self.forward(params)
        bpr = losses.bpr_loss(u_emb[ancs], i_emb[poss], i_emb[negs]) / ancs.shape[0]
        reg = reg_w * losses.reg_params(params)
        items = jnp.concatenate([poss, negs])
        cl = cl_w * self._cl_loss(ancs, items, gnn_l, int_l, gaa_l, iaa_l, temp)
        return bpr + reg + cl, {"bpr_loss": bpr, "reg_loss": reg, "cl_loss": cl}

    def generate(self, params):
        u_emb, i_emb, *_ = self.forward(params)
        return u_emb, i_emb
