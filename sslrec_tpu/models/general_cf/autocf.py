"""AutoCF — masked graph autoencoder: seed-sampled subgraph masking, GCN
encoder + graph-transformer decoder, infomax seed objective.

Parity with ``models/general_cf/autocf.py:11-230`` and ``AutoCFTrainer``
(``trainer/trainer.py:201-250``):

- ``LocalGraph``: subgraph scores from 1st+2nd-order all-one-adjacency
  aggregates, Gumbel-noised, top-``seed_num`` seeds (``:178-203``).
- ``RandomMaskSubgraphs``: remove all edges incident to the ≤``mask_depth``-hop
  closure of the seeds → renormalised encoder adjacency; decoder adjacency =
  remaining edges + random pairs among (closure ∪ random nodes) + self loops
  (``:205-257``).
- loss: −⟨anc,pos⟩ mean + L2 + log-sum-exp "contrast" terms; every
  ``fix_steps`` steps views regenerate and the −mean(scores) infomax term is
  added.

TPU formulation: views are regenerated per ``fix_steps`` window *inside* the
jitted epoch — the per-epoch hook precomputes a bank of static-shape view
tensors (edge keep-masks, random decoder pairs) indexed by ``step //
fix_steps``; the differentiable seed scores are recomputed in-loss (cheap: two
spmm against the all-one adjacency).  Dynamic dedup of decoder edges is skipped
(duplicates only reweight attention slightly); node-set draws use inverse-CDF
sampling over the closure indicator.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.segment import segment_sum
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.utils.initializers import xavier_uniform


class AutoCF(RecModel):
    batch_fields = ("user", "pos")  # negatives unused (autocf.py:81-84)

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.gcn_layer = int(m.gcn_layer)
        self.gt_layer = int(m.gt_layer)
        self.reg_weight = float(m.reg_weight)
        self.ssl_reg = float(m.ssl_reg)
        self.head_num = int(m.head_num)
        self.seed_num = int(m.seed_num)
        self.mask_depth = int(m.mask_depth)
        self.keep_rate = float(m.keep_rate)
        self.fix_steps = int(m.fix_steps)

        # bidirectional structure with normalised values + all-one values
        trn = data.extras["train_mat_scipy"].tocoo()
        n = self.user_num + self.item_num
        bi = sparse_ops.make_bi_adj(trn, self.user_num, self.item_num).tocoo()
        order = np.lexsort((bi.col, bi.row))
        self.rows = jnp.asarray(bi.row[order].astype(np.int32))
        self.cols = jnp.asarray(bi.col[order].astype(np.int32))
        self.norm_vals = jnp.asarray(bi.data[order].astype(np.float32))
        self.n_nodes = n
        self.nnz = int(bi.nnz)
        # all-one structure graph: every propagation is spmm(ones-graph, x,
        # edge_weight=vals), so the Pallas kernel serves dynamic value vectors
        import scipy.sparse as sp
        from sslrec_tpu.ops.pallas_spmm import maybe_pallas
        ones = sp.coo_matrix((np.ones(self.nnz, np.float32),
                              (bi.row[order], bi.col[order])), shape=(n, n))
        self.adj_ones = maybe_pallas(ones, cfg.model.get("use_pallas", True))

    def init_params(self, key):
        ks = jax.random.split(key, 2 + 3 * self.gt_layer)
        d = self.embedding_size
        p = {
            "user_embeds": xavier_uniform(ks[0], (self.user_num, d)),
            "item_embeds": xavier_uniform(ks[1], (self.item_num, d)),
            "gt": [{"q": xavier_uniform(ks[2 + 3 * i], (d, d)),
                    "k": xavier_uniform(ks[3 + 3 * i], (d, d)),
                    "v": xavier_uniform(ks[4 + 3 * i], (d, d))}
                   for i in range(self.gt_layer)],
        }
        return p

    # -- spmm over the (possibly masked) structure ---------------------------
    def _spmm_vals(self, vals, x):
        from sslrec_tpu.ops.spmm import spmm
        return spmm(self.adj_ones, x, edge_weight=vals)

    def _allone_spmm(self, x):
        # cold path (per-epoch view bank only): keep the XLA segment-sum so the
        # views program carries no extra Pallas instances (incl. a d=1 call)
        contrib = x[self.cols]
        return segment_sum(contrib, self.rows, self.n_nodes, sorted_ids=True)

    # -- LocalGraph scores (differentiable) ---------------------------------
    def _seed_scores(self, params, key):
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], 0)
        order = segment_sum(jnp.ones((self.nnz,)), self.rows, self.n_nodes,
                            sorted_ids=True)[:, None]
        fst = self._allone_spmm(embeds) - embeds
        fst_num = order
        scd = (self._allone_spmm(fst) - fst) - order * embeds
        scd_num = (self._allone_spmm(fst_num) - fst_num) - order
        sub = (fst + scd) / (fst_num + scd_num + 1e-8)
        sub = sub / jnp.sqrt(jnp.sum(sub**2, -1, keepdims=True) + 1e-12)
        emb = embeds / jnp.sqrt(jnp.sum(embeds**2, -1, keepdims=True) + 1e-12)
        scores = jax.nn.sigmoid(jnp.sum(sub * emb, -1))
        noise = jax.random.uniform(key, scores.shape, minval=1e-8, maxval=1.0)
        noisy = jnp.log(scores + 1e-12) - jnp.log(-jnp.log(noise))
        return scores, noisy

    # -- per-epoch view bank (trainer hook) ----------------------------------
    def epoch_state(self, params, key, epoch):
        if not hasattr(self, "_views_fn"):
            @jax.jit
            def one_view(params, key):
                k1, k2, k3, k4 = jax.random.split(key, 4)
                _, noisy = self._seed_scores(params, k1)
                _, seeds = jax.lax.top_k(noisy, self.seed_num)
                closure = jnp.zeros((self.n_nodes,), jnp.float32).at[seeds].set(1.0)
                # closure of depth-1 BFS (edges removed = incident to closure)
                for _ in range(self.mask_depth - 1):
                    spread = self._allone_spmm(closure[:, None])[:, 0]
                    closure = jnp.clip(closure + spread, 0.0, 1.0)
                keep = (closure[self.rows] == 0) & (closure[self.cols] == 0)
                keep = keep.astype(jnp.float32)
                # maskNodes = closure ∪ uniform node sample of keep_rate·N
                samp = jax.random.bernoulli(
                    k2, self.keep_rate, (self.n_nodes,)).astype(jnp.float32)
                mask_nodes = jnp.clip(closure + samp, 0.0, 1.0)
                # inverse-CDF draws from the mask-node set for decoder pairs
                cdf = jnp.cumsum(mask_nodes)
                total = cdf[-1]
                def draw(k):
                    u = jax.random.uniform(k, (self.nnz,)) * total
                    return jnp.clip(jnp.searchsorted(cdf, u), 0, self.n_nodes - 1)
                rand_rows = draw(k3).astype(jnp.int32)
                rand_cols = draw(k4).astype(jnp.int32)
                # encoder renormalisation D^-0.5 over the masked structure
                deg = segment_sum(keep, self.rows, self.n_nodes, sorted_ids=True)
                dinv = (deg + 1e-12) ** -0.5
                enc_vals = keep * dinv[self.rows] * dinv[self.cols]
                return {"enc_vals": enc_vals, "keep": keep,
                        "rand_rows": rand_rows, "rand_cols": rand_cols}

            def views_fn(params, key, n_views):
                keys = jax.random.split(key, n_views)
                return jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[one_view(params, k) for k in keys])

            self._views_fn = views_fn
        n_views = -(-self._n_batches_hint // self.fix_steps)
        return self._views_fn(jax.lax.stop_gradient(params), key, n_views)

    # -- graph-transformer layer over decoder edges -------------------------
    def _gt_apply(self, p, rows, cols, valid, embeds):
        h, d = self.head_num, self.embedding_size
        dh = d // h
        q = (embeds[rows] @ p["q"]).reshape(-1, h, dh)
        k = (embeds[cols] @ p["k"]).reshape(-1, h, dh)
        v = (embeds[cols] @ p["v"]).reshape(-1, h, dh)
        att = jnp.clip(jnp.sum(q * k, -1), -10.0, 10.0)
        exp_att = jnp.exp(att) * valid[:, None]
        att_norm = segment_sum(exp_att, rows, self.n_nodes)[rows]
        att = exp_att / (att_norm + 1e-8)
        res = (att[:, :, None] * v).reshape(-1, d)
        return segment_sum(res, rows, self.n_nodes)

    def forward(self, params, enc_vals, dec=None):
        embeds = jnp.concatenate([params["user_embeds"], params["item_embeds"]], 0)

        def hop(x, _):
            y = self._spmm_vals(enc_vals, x)
            return y, y

        _, ys = jax.lax.scan(hop, embeds, None, length=self.gcn_layer)
        acc = [embeds] + [ys[i] for i in range(self.gcn_layer)]
        if dec is not None:
            rows, cols, valid = dec
            for p in params["gt"]:
                acc.append(self._gt_apply(p, rows, cols, valid, acc[-1]))
        total = sum(acc)
        return total[: self.user_num], total[self.user_num:]

    def _decoder_edges(self, view):
        n = self.n_nodes
        loops = jnp.arange(n, dtype=jnp.int32)
        rows = jnp.concatenate([view["rand_rows"], view["rand_cols"], loops,
                                self.rows])
        cols = jnp.concatenate([view["rand_cols"], view["rand_rows"], loops,
                                self.cols])
        valid = jnp.concatenate([
            jnp.ones((2 * self.nnz + n,), jnp.float32), view["keep"]])
        return rows, cols, valid

    def _contrast(self, nodes, e1, e2=None):
        if e2 is not None:
            return jnp.mean(jax.nn.logsumexp(e1[nodes] @ e2.T, axis=-1))
        # reference dedups nodes (t.unique) — raw batch used here (static shape)
        return jnp.mean(jax.nn.logsumexp(e1[nodes] @ e1.T, axis=-1))

    def hparams(self):
        """Traced tune-grid scalars (structural: gcn_layer)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "ssl_reg": jnp.float32(self.ssl_reg)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_w = hp.get("reg_weight", self.reg_weight)
        ssl_reg = hp.get("ssl_reg", self.ssl_reg)
        aux = batch["aux"]
        vidx = batch["step"] // self.fix_steps
        view = jax.tree.map(lambda x: x[vidx], aux)
        user_embeds, item_embeds = self.forward(params, view["enc_vals"],
                                                self._decoder_edges(view))
        ancs, poss = batch["user"], batch["pos"]
        rec = -jnp.mean(jnp.sum(user_embeds[ancs] * item_embeds[poss], -1))
        reg = reg_w * losses.reg_params(params)
        cl = (self._contrast(ancs, user_embeds)
              + self._contrast(poss, item_embeds)) * ssl_reg \
            + self._contrast(ancs, user_embeds, item_embeds)
        # infomax on regeneration steps (differentiable scores recomputed)
        scores, _ = self._seed_scores(params, key)
        infomax = jnp.where(batch["step"] % self.fix_steps == 0,
                            -jnp.mean(scores), 0.0)
        loss = rec + reg + cl + infomax
        return loss, {"rec_loss": rec, "reg_loss": reg, "cl_loss": cl,
                      "infomax_loss": infomax}

    def generate(self, params):
        return self.forward(params, self.norm_vals,
                            (self.rows, self.cols,
                             jnp.ones((self.nnz,), jnp.float32)))
