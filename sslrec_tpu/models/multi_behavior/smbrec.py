"""SMBRec — per-behavior GCNs with similarity-sampled contrastive user pairs.

Parity with ``models/multi_behavior/smbrec.py:17-181``: per-behavior GCN towers
(same layer form as HMGCR); user fusion = softmax over behaviors of
(beh_weight·per-user-degree) weighting; item fusion = linear over concatenated
towers; BPR (sum) + picked-embed L2; contrastive term samples, per anchor,
``sample_num_pos`` co-interacting users (positives, uniform with replacement
from the co-interaction row — the reference's dgl neighbor sampling) and the
anchor itself as the "negative" pair (its dgl negative graph is the identity),
scoring full [S, S] similarity blocks per 128-anchor batch exactly like the
reference.  Co-row sampling uses CSR indptr/indices gathers on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.models.multi_behavior.hmgcr import GCNTower
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


class SMBRec(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.graphs = data.extras["behavior_graphs"]
        self.n_beh = len(self.graphs)
        self.layer_num = int(m.layer_num)
        self.tau = float(m.tau)
        self.cl_weight = float(m.cl_weight)
        self.reg_weight = float(m.reg_weight)
        self.samp_pos = int(m.sample_num_pos)
        self.beh_degrees = data.extras["beh_degrees"]      # [n_beh, n_users]
        self.co_indptr = data.extras["co_user_indptr"]
        self.co_indices = data.extras["co_user_indices"]
        # Under train.mesh with a model axis, each behavior tower's chained
        # (A, AT) rect pair runs graph-partitioned (r5, KGCL pattern).
        from sslrec_tpu.parallel.dist_train import maybe_partition_rect_pair
        self._mesh, self._sgs = None, None
        sgs = []
        for a, at in self.graphs:
            mesh, pair = maybe_partition_rect_pair(cfg, a, at, self.user_num,
                                                   self.item_num)
            if pair is None:
                sgs = None
                break
            self._mesh = mesh
            sgs.append(pair)
        self._sgs = sgs or None

    def init_params(self, key):
        ks = jax.random.split(key, self.n_beh + 2)
        d = self.embedding_size
        return {
            "towers": [GCNTower.init(k, self.user_num, self.item_num, d,
                                     self.layer_num) for k in ks[:self.n_beh]],
            "cat_trans": linear_params(ks[-2], self.n_beh * d, d),
            "user_trans": linear_params(ks[-1], d, d),
            "beh_weights": jnp.ones((self.n_beh,)),
        }

    def forward(self, params):
        ms = ([(self._mesh, sa, st) for sa, st in self._sgs]
              if self._sgs is not None else [None] * len(self.graphs))
        embeds = [GCNTower.apply(p, a, at, self.layer_num, mesh_sgs=m)
                  for p, (a, at), m in zip(params["towers"], self.graphs, ms)]
        users = jnp.stack([u for u, _ in embeds])          # [n_beh, U, d]
        items = jnp.concatenate([i for _, i in embeds], axis=1)
        w = jax.nn.softmax(
            params["beh_weights"][:, None, None] * self.beh_degrees[:, :, None],
            axis=0)
        user_emb = jnp.sum(w * users, axis=0) @ params["user_trans"]["w"] \
            + params["user_trans"]["b"]
        item_emb = items @ params["cat_trans"]["w"] + params["cat_trans"]["b"]
        return user_emb, item_emb, [u for u, _ in embeds]

    def _sample_co_users(self, key, anchors):
        """Uniform-with-replacement draw from each anchor's co-interaction row."""
        start = self.co_indptr[anchors]
        deg = self.co_indptr[anchors + 1] - start
        u = jax.random.uniform(key, (anchors.shape[0], self.samp_pos))
        off = (u * jnp.maximum(deg, 1)[:, None]).astype(jnp.int32)
        cols = self.co_indices[jnp.clip(start[:, None] + off, 0,
                                        self.co_indices.shape[0] - 1)]
        # anchors with empty co-rows fall back to themselves (score cancels)
        return jnp.where((deg > 0)[:, None], cols, anchors[:, None])

    def _cl(self, key, embed, chunk=128):
        """Per-128-anchor block: sum over the [S, S] pos-pair similarity matrix
        minus the [S, S] self-pair matrix (smbrec.py:41-64 semantics)."""
        n = embed.shape[0]
        en = embed / jnp.sqrt(jnp.sum(jnp.square(embed), -1, keepdims=True) + 1e-12)
        pad = (-n) % chunk
        anchors = jnp.arange(n + pad) % n

        def block(args):
            anc, k = args
            pos = self._sample_co_users(k, anc).reshape(-1)      # [S]
            rows = jnp.repeat(anc, self.samp_pos)                # [S]
            def neglog_sim(a, b):
                return -jnp.log(jnp.exp(a @ b.T / self.tau) + 1e-8)
            pos_term = neglog_sim(en[rows], en[pos])
            neg_term = neglog_sim(en[rows], en[rows])
            return jnp.sum(pos_term - neg_term)

        keys = jax.random.split(key, (n + pad) // chunk)
        sums = lax.map(block, (anchors.reshape(-1, chunk), keys))
        return jnp.sum(sums)

    def hparams(self):
        """Traced tune-grid scalars (structural: layer_num)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "cl_weight": jnp.float32(self.cl_weight)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_w = hp.get("reg_weight", self.reg_weight)
        cl_w = hp.get("cl_weight", self.cl_weight)
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        user_emb, item_emb, beh_users = self.forward(params)
        anc_e, pos_e, neg_e = user_emb[ancs], item_emb[poss], item_emb[negs]
        bpr = losses.bpr_loss(anc_e, pos_e, neg_e)
        reg = losses.reg_pick_embeds([anc_e, pos_e, neg_e])
        keys = jax.random.split(key, self.n_beh)
        cl = sum(self._cl(k, u) for k, u in zip(keys, beh_users))
        loss = bpr + cl_w * cl + reg_w * reg
        return loss, {"bpr_loss": bpr, "cl_loss": cl}

    def generate(self, params):
        u, i, _ = self.forward(params)
        return u, i
