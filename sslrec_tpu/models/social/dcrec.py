"""DcRec (social) — dual-domain contrastive recommendation.

Parity with ``models/social/dcrec.py:16-274``: a LightGCN tower on the UI
bi-adjacency plus a weightless relu-GCN tower on the trust graph; per-step
random graph augmentation (two distinct of {edge-add, edge-drop, node-drop})
produces two collaborative views and two social views; user embeddings from
each view pass through a domain linear+relu head; GRACE-style InfoNCE couples
the views within each domain (``domain_weight``) and across domains
(``cross_weight``), on top of BPR + picked-embedding L2.

TPU-native deviations (documented, behaviour-preserving):

* The reference re-builds augmented scipy graphs on the host **per batch**
  (``dcrec.py:154-180``) and renormalises them with numpy.  Here the raw edge
  lists are static device arrays and each view is an edge-weight vector plus a
  fixed-size buffer of added edges — drop counts ``int((1-keep_rate)·E)`` match
  the reference exactly; degrees and D^-1/2 renormalisation are recomputed on
  device per view, so the whole step stays inside one jitted program.
* ``edge_adding`` duplicates: the reference binarises the augmented matrix so a
  randomly added edge colliding with an existing one collapses to weight 1;
  here it would count twice.  Collision probability is ``E/(N·M)`` per added
  edge — negligible, and irrelevant at ``keep_rate=1`` (parity tests).
* The reference's ``GCNLayer`` (``dcrec.py:268-275``) *defines* a per-layer
  weight but its ``forward`` never applies it — the social tower is a
  weightless relu-GCN.  We do not allocate the dead parameters.
* The social normalisation is ``D_r^-1/2 A^T D_r^-1/2`` (row-degree, transposed
  propagation — ``dcrec.py:65-70`` builds ``mat·D^-1/2`` then transposes),
  replicated here via a col-scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.models.multi_behavior.hmgcr import grace_pair_losses
from sslrec_tpu.ops.spmm import spmm_layers
from sslrec_tpu.utils.initializers import apply_linear, linear_params, xavier_uniform

EDGE_ADD, EDGE_DROP, NODE_DROP = 0, 1, 2


def _inv_sqrt(deg):
    return jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)


class DcRec(RecModel):
    batch_fields = ("user", "pos", "neg")

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.adj = data.extras["bi_adj"]  # normalised base bi-adjacency
        # raw UI edges (row-sorted binary train matrix)
        self.ui_rows = data.train_users
        self.ui_cols = data.train_items
        self.t_rows, self.t_cols = data.extras["trust_edges"]
        self.layer_num = int(m.layer_num)
        self.reg_weight = float(m.reg_weight)
        self.keep_rate = float(m.keep_rate)
        self.cross_weight = float(m.cross_weight)
        self.domain_weight = float(m.domain_weight)
        self.tau = float(m.tau)
        p = 1.0 - self.keep_rate
        self.n_aug_ui = int(p * self.ui_rows.shape[0])   # add == drop count
        self.n_aug_t = int(p * self.t_rows.shape[0])
        self.n_drop_users = int(p * self.user_num)

    def init_params(self, key):
        ks = jax.random.split(key, 5)
        d = self.embedding_size
        return {
            "ui_user_embeds": xavier_uniform(ks[0], (self.user_num, d)),
            "uu_user_embeds": xavier_uniform(ks[1], (self.user_num, d)),
            "ui_item_embeds": xavier_uniform(ks[2], (self.item_num, d)),
            "ui_linear": linear_params(ks[3], d, d),
            "uu_linear": linear_params(ks[4], d, d),
        }

    # -- augmentation (``dcrec.py:96-180``), static shapes -------------------
    def _pick_kinds(self, key):
        """Ordered pair of distinct augmentation kinds (``random.sample(range(3), 2)``)."""
        k1, k2 = jax.random.split(key)
        a = jax.random.randint(k1, (), 0, 3)
        b = (a + 1 + jax.random.randint(k2, (), 0, 2)) % 3
        return a, b

    def _view(self, key, kind, rows, n_rows, n_cols, n_aug):
        """One augmented view: (edge weights, added rows/cols/weights)."""
        n_edges = rows.shape[0]
        kd, kn, kr, kc = jax.random.split(key, 4)
        add_r = jax.random.randint(kr, (n_aug,), 0, n_rows, jnp.int32)
        add_c = jax.random.randint(kc, (n_aug,), 0, n_cols, jnp.int32)
        # exact-count edge dropout: zero the n_aug smallest uniforms
        order = jnp.argsort(jax.random.uniform(kd, (n_edges,)))
        w_edge = jnp.ones((n_edges,)).at[order[:n_aug]].set(0.0)
        # node dropout: drop int(p·n_rows) source rows and their edges
        perm = jnp.argsort(jax.random.uniform(kn, (n_rows,)))
        keep_row = jnp.ones((n_rows,)).at[perm[: self.n_drop_users]].set(0.0)
        w_node = keep_row[rows]
        ones = jnp.ones((n_edges,))
        w = jnp.where(kind == EDGE_DROP, w_edge,
                      jnp.where(kind == NODE_DROP, w_node, ones))
        add_w = jnp.where(kind == EDGE_ADD, 1.0, 0.0) * jnp.ones((n_aug,))
        return w, add_r, add_c, add_w

    # -- propagation ---------------------------------------------------------
    def _lightgcn_base(self, params):
        embeds = jnp.concatenate(
            [params["ui_user_embeds"], params["ui_item_embeds"]], 0)
        # scanned hops: one spmm instance shared by loss + generate call sites
        ys = spmm_layers(self.adj, embeds, self.layer_num)
        acc = (embeds + ys.sum(0)) / (self.layer_num + 1)
        return acc[: self.user_num], acc[self.user_num:]

    def _lightgcn_view(self, params, w, add_r, add_c, add_w):
        """LightGCN over an augmented, renormalised bi-adjacency."""
        rows = jnp.concatenate([self.ui_rows, add_r])
        cols = jnp.concatenate([self.ui_cols, add_c])
        v = jnp.concatenate([w, add_w])
        deg_u = jax.ops.segment_sum(v, rows, num_segments=self.user_num)
        deg_i = jax.ops.segment_sum(v, cols, num_segments=self.item_num)
        ev = (v * _inv_sqrt(deg_u)[rows] * _inv_sqrt(deg_i)[cols])[:, None]
        u, i = params["ui_user_embeds"], params["ui_item_embeds"]
        acc_u, acc_i = u, i
        for _ in range(self.layer_num):
            u, i = (
                jax.ops.segment_sum(i[cols] * ev, rows, num_segments=self.user_num),
                jax.ops.segment_sum(u[rows] * ev, cols, num_segments=self.item_num),
            )
            acc_u, acc_i = acc_u + u, acc_i + i
        n = self.layer_num + 1
        return acc_u / n, acc_i / n

    def _gcn_view(self, params, w, add_r, add_c, add_w):
        """Weightless relu-GCN over an augmented trust graph, ``D_r^-1/2 A^T D_r^-1/2``."""
        rows = jnp.concatenate([self.t_rows, add_r])
        cols = jnp.concatenate([self.t_cols, add_c])
        v = jnp.concatenate([w, add_w])
        deg = jax.ops.segment_sum(v, rows, num_segments=self.user_num)
        d = _inv_sqrt(deg)
        ve = (v * d[rows])[:, None]

        def prop(x):
            return d[:, None] * jax.ops.segment_sum(
                ve * x[rows], cols, num_segments=self.user_num)

        x = params["uu_user_embeds"]
        acc = x
        for _ in range(self.layer_num):
            x = jax.nn.relu(prop(x))
            acc = acc + x
        return acc / (self.layer_num + 1)

    # -- objective (``dcrec.py:237-255``) ------------------------------------
    def hparams(self):
        """Traced tune-grid scalars (structural: layer_num)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "cross_weight": jnp.float32(self.cross_weight),
                "domain_weight": jnp.float32(self.domain_weight)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_w = hp.get("reg_weight", self.reg_weight)
        cross_w = hp.get("cross_weight", self.cross_weight)
        domain_w = hp.get("domain_weight", self.domain_weight)
        kc, ks, kv = jax.random.split(key, 3)
        user_embeds, item_embeds = self._lightgcn_base(params)

        if self.keep_rate >= 1.0:  # augmentation disabled → views = base graph
            uiu1, uii1 = self._lightgcn_base(params)
            uiu2, uii2 = uiu1, uii1
            ident = (jnp.ones((self.t_rows.shape[0],)),
                     jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.int32),
                     jnp.zeros((0,)))
            uu1 = self._gcn_view(params, *ident)
            uu2 = uu1
        else:
            ka, kb = self._pick_kinds(kc)
            sa, sb = self._pick_kinds(ks)
            kv1, kv2, kv3, kv4 = jax.random.split(kv, 4)
            uiu1, uii1 = self._lightgcn_view(params, *self._view(
                kv1, ka, self.ui_rows, self.user_num, self.item_num, self.n_aug_ui))
            uiu2, uii2 = self._lightgcn_view(params, *self._view(
                kv2, kb, self.ui_rows, self.user_num, self.item_num, self.n_aug_ui))
            uu1 = self._gcn_view(params, *self._view(
                kv3, sa, self.t_rows, self.user_num, self.user_num, self.n_aug_t))
            uu2 = self._gcn_view(params, *self._view(
                kv4, sb, self.t_rows, self.user_num, self.user_num, self.n_aug_t))

        uiu1 = jax.nn.relu(apply_linear(params["ui_linear"], uiu1))
        uiu2 = jax.nn.relu(apply_linear(params["ui_linear"], uiu2))
        uu1 = jax.nn.relu(apply_linear(params["uu_linear"], uu1))
        uu2 = jax.nn.relu(apply_linear(params["uu_linear"], uu2))

        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        anc_e, pos_e, neg_e = user_embeds[ancs], item_embeds[poss], item_embeds[negs]
        bpr = losses.bpr_loss(anc_e, pos_e, neg_e)
        # all 6 unordered pairs of the 4 user views are consumed, so the
        # fused all-pairs pass (ONE chunked map instead of 12 semi-loss
        # instances) wastes nothing — the per-pair form compiled >20 min at
        # the real 43k x 66k yelp scale (see grace_pair_losses)
        pu = grace_pair_losses([uu1, uu2, uiu1, uiu2], self.tau)

        def gca(a, b):
            return 0.5 * (pu[(a, b)] + pu[(b, a)])

        pi = grace_pair_losses([uii1, uii2], self.tau)
        cross = cross_w * (gca(0, 2) + gca(0, 3) + gca(1, 2) + gca(1, 3))
        i_loss = gca(2, 3) + 0.5 * (pi[(0, 1)] + pi[(1, 0)])
        s_loss = gca(0, 1)
        domain = domain_w * (i_loss + s_loss)
        reg = reg_w * losses.reg_pick_embeds([anc_e, pos_e, neg_e])
        loss = bpr + reg + domain + cross
        return loss, {"bpr_loss": bpr, "reg_loss": reg,
                      "domain_loss": domain, "cross_loss": cross}

    def generate(self, params):
        return self._lightgcn_base(params)
