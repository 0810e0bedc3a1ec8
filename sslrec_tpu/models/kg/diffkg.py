"""DiffKG — Gaussian diffusion over KG adjacency rows; the denoised KG feeds a
RGAT+LightGCN recommender with cross-view InfoNCE.

Parity with ``models/kg/diffkg.py:15-345`` and ``DiffKGTrainer``
(``trainer/trainer.py:1205-1309``):

- ``Denoise`` MLP with sinusoidal time embedding (tanh stack, normal-0.001 bias
  init); ``GaussianDiffusion`` with linear-variance betas, SNR-weighted MSE +
  user-KG-consistency (ukgc) loss; its own Adam.
- Per epoch: train the denoiser over batches of dense KG rows; rebuild the KG
  by reverse-sampling every entity row and taking top-``rebuild_k`` tails; add
  missing reverse edges; keep edges whose (h, t) exists in the original
  relation map; Bernoulli ``keepRate`` mask; the recommender then trains
  against the denoised KG (``cl_pattern`` chooses which view feeds BPR).

TPU formulation: the denoised KG is a *static* [2·n_ent·k] edge list (top-k per
entity + reversed copy) with a validity mask from a vectorised binary-search
relation lookup; dense rows are scattered on device from padded KG rows; the
whole diffusion epoch is one jitted scan owned by the model's ``epoch_state``.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import optax

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.segment import segment_softmax, segment_sum
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.utils.initializers import xavier_uniform

import scipy.sparse as sp


def _l2rows(x):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), -1, keepdims=True) + 1e-12)


class DiffKG(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.n_relations = data.extras["relation_num"]
        self.n_entities = data.extras["entity_num"]
        self.context_hops = int(m.layer_num_kg)
        self.layer_num = int(m.layer_num)
        self.mess_dropout_rate = float(m.mess_dropout_rate)
        self.reg_weight = float(m.reg_weight)
        self.temperature = float(m.temperature)
        self.cl_weight = float(m.cl_weight)
        self.res_lambda = float(m.res_lambda)
        self.cl_pattern = int(m.cl_pattern)
        self.rebuild_k = int(m.rebuild_k)
        self.keep_rate = float(m.keepRate)
        self.steps = int(m.steps)
        self.noise_scale = float(m.noise_scale)
        self.noise_min = float(m.noise_min)
        self.noise_max = float(m.noise_max)
        self.sampling_steps = int(m.sampling_steps)
        self.e_loss = float(m.e_loss)
        self.d_emb_size = int(m.d_emb_size)
        self.dims = list(m.get("dims_list", (1000,)))
        self.diff_lr = float(cfg.optimizer.lr)

        # capped KG edge sample for the base RGAT (triplet_num, diffkg.py:36)
        self.heads = data.extras["kg_heads"]
        self.rels = data.extras["kg_rels"]
        self.tails = data.extras["kg_tails"]
        self.adj = data.extras["bi_adj_maskable"].graph
        self.adj_vals = data.extras["bi_adj_maskable"].view_vals(
            jnp.ones((data.extras["bi_adj_maskable"].nnz_rect,), jnp.float32))

        # Under train.mesh with a model axis, the fixed-weight UI propagation
        # runs graph-partitioned (destination-owned edge shards, r4 KGCL
        # pattern) instead of leaving replicated edge arrays to GSPMD.
        from sslrec_tpu.parallel.dist_train import (maybe_partition_bi,
                                                    view_vals_partitioned)
        bi = data.extras["bi_adj_maskable"]
        self._mesh, self._sg = maybe_partition_bi(
            cfg, bi._rows, bi._cols, self.user_num, self.item_num)
        if self._sg is not None:
            self._adj_vals_part = view_vals_partitioned(self._sg, self.adj_vals)

        # (h, t) → relation map, h-major sorted for bounded binary search
        trip = data.extras["kg_triplets_full"]
        order = np.lexsort((trip[:, 2], trip[:, 0]))
        st = trip[order]
        self._map_t = jnp.asarray(st[:, 2].astype(np.int32))
        self._map_r = jnp.asarray(st[:, 1].astype(np.int32))
        ptr = np.zeros(self.n_entities + 1, np.int64)
        np.add.at(ptr, st[:, 0] + 1, 1)
        self._map_ptr = jnp.asarray(np.cumsum(ptr).astype(np.int32))

        # KG rows (entity → tail set) padded for dense-row scatter
        kg_mat = sp.coo_matrix(
            (np.ones(len(trip), np.float32), (trip[:, 0], trip[:, 2])),
            shape=(self.n_entities, self.n_entities)).tocsr()
        kg_mat.data[:] = 1.0
        self.kg_rows = sparse_ops.build_padded_rows(kg_mat)

        # rect UI matrix for the ukgc loss (item→user aggregation)
        trn = data.extras["train_mat_scipy"].tocoo()
        ui = sparse_ops.from_scipy(trn)
        self._ui = ui

        # diffusion coefficient tables (diffkg.py:240-276)
        start = self.noise_scale * self.noise_min
        end = self.noise_scale * self.noise_max
        variance = np.linspace(start, end, self.steps, dtype=np.float64)
        alpha_bar = 1 - variance
        betas = [1 - alpha_bar[0]]
        for i in range(1, self.steps):
            betas.append(min(1 - alpha_bar[i] / alpha_bar[i - 1], 0.999))
        betas = np.asarray(betas)
        betas[0] = 1e-4
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        self._sqrt_ac = jnp.asarray(np.sqrt(ac), jnp.float32)
        self._sqrt_1mac = jnp.asarray(np.sqrt(1 - ac), jnp.float32)
        self._ac = jnp.asarray(ac, jnp.float32)
        # SNR in float64 (1-ac cancels catastrophically in f32 near t=0)
        self._snr = jnp.asarray(ac / (1 - ac), jnp.float32)
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        self._pm_c1 = jnp.asarray(betas * np.sqrt(ac_prev) / (1.0 - ac), jnp.float32)
        self._pm_c2 = jnp.asarray((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac),
                                  jnp.float32)

    # -- recommender params --------------------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 4)
        d = self.embedding_size
        gain = math.sqrt(2.0)  # calculate_gain('relu')
        return {
            "u_embeds": xavier_uniform(ks[0], (self.user_num, d)),
            "e_embeds": xavier_uniform(ks[1], (self.n_entities, d)),
            "r_embeds": xavier_uniform(ks[2], (self.n_relations, d)),
            "rgat_w": xavier_uniform(ks[3], (2 * d, d)) * gain,
        }

    # -- RGAT (residual form, diffkg.py:132-165) ------------------------------
    def _rgat(self, params, key, heads, tails, rels, valid, training):
        ent = params["e_embeds"]
        res = ent
        n = self.n_entities
        for _ in range(self.context_hops):
            a_in = jnp.concatenate([ent[heads], ent[tails]], -1)
            logits = jax.nn.leaky_relu(
                jnp.sum((a_in @ params["rgat_w"]) * params["r_embeds"][rels], -1),
                0.2)
            if valid is not None:
                logits = jnp.where(valid > 0, logits, -1e9)
            e = segment_softmax(logits, heads, n)
            if valid is not None:
                e = e * valid
            agg = segment_sum(ent[tails] * e[:, None], heads, n) + ent
            if training and self.mess_dropout_rate > 0:
                key, sub = jax.random.split(key)
                keep = jax.random.bernoulli(sub, 1 - self.mess_dropout_rate,
                                            agg.shape)
                agg = jnp.where(keep, agg / (1 - self.mess_dropout_rate), 0.0)
            ent = _l2rows(agg)
            res = self.res_lambda * res + ent
        return res

    def forward(self, params, key, kg=None, training=False):
        if kg is None:
            h, t, r, v = self.heads, self.tails, self.rels, None
        else:
            h, t, r, v = kg
        hids = self._rgat(params, key, h, t, r, v, training)
        if self._sg is not None:
            from sslrec_tpu.parallel.dist_train import mesh_partitioned_propagate
            return mesh_partitioned_propagate(
                self._mesh, self._sg, params["u_embeds"],
                hids[: self.item_num], self._adj_vals_part, self.layer_num,
                combine="sum")
        embeds = jnp.concatenate([params["u_embeds"], hids[: self.item_num]], 0)
        acc = embeds
        for _ in range(self.layer_num):
            embeds = spmm(self.adj, embeds, edge_weight=self.adj_vals)
            acc = acc + embeds
        return acc[: self.user_num], acc[self.user_num:]

    # -- denoiser MLP ---------------------------------------------------------
    def _init_denoise(self, key):
        """(``Denoise.__init__`` ``diffkg.py:167-200``): out_dims = dims +
        [n_entities]; in_dims = reversed; time embedding concatenated to the
        first input layer."""
        out_dims = list(self.dims) + [self.n_entities]
        in_dims = list(reversed(out_dims))
        in_dims_temp = [in_dims[0] + self.d_emb_size] + in_dims[1:]
        in_pairs = list(zip(in_dims_temp[:-1], in_dims_temp[1:]))
        out_pairs = list(zip(out_dims[:-1], out_dims[1:]))
        ks = jax.random.split(key, len(in_pairs) + len(out_pairs) + 1)

        def norm_lin(k, i, o):
            std = math.sqrt(2.0 / (i + o))
            kw, kb = jax.random.split(k)
            return {"w": jax.random.normal(kw, (i, o)) * std,
                    "b": jax.random.normal(kb, (o,)) * 0.001}

        in_layers = [norm_lin(k, i, o) for k, (i, o) in zip(ks, in_pairs)]
        out_layers = [norm_lin(k, i, o) for k, (i, o) in
                      zip(ks[len(in_pairs):], out_pairs)]
        emb_layer = norm_lin(ks[-1], self.d_emb_size, self.d_emb_size)
        return {"in": in_layers, "out": out_layers, "emb": emb_layer}

    def _denoise_apply(self, dp, x, t, dropout_key=None):
        half = self.d_emb_size // 2
        freqs = jnp.exp(-math.log(10000) * jnp.arange(half) / half)
        temp = t[:, None].astype(jnp.float32) * freqs[None]
        time_emb = jnp.concatenate([jnp.cos(temp), jnp.sin(temp)], -1)
        if self.d_emb_size % 2:
            time_emb = jnp.concatenate([time_emb, jnp.zeros_like(time_emb[:, :1])], -1)
        emb = time_emb @ dp["emb"]["w"] + dp["emb"]["b"]
        x = _l2rows(x)
        if dropout_key is not None:
            keep = jax.random.bernoulli(dropout_key, 0.5, x.shape)
            x = jnp.where(keep, x / 0.5, 0.0)
        h = jnp.concatenate([x, emb], -1)
        for layer in dp["in"]:
            h = jnp.tanh(h @ layer["w"] + layer["b"])
        for i, layer in enumerate(dp["out"]):
            h = h @ layer["w"] + layer["b"]
            if i != len(dp["out"]) - 1:
                h = jnp.tanh(h)
        return h

    # -- diffusion math -------------------------------------------------------
    def _q_sample(self, x0, t, noise):
        return self._sqrt_ac[t][:, None] * x0 + self._sqrt_1mac[t][:, None] * noise

    def _p_sample(self, dp, x0):
        x_t = x0 if self.sampling_steps == 0 else self._q_sample(
            x0, jnp.full((x0.shape[0],), self.sampling_steps - 1, jnp.int32),
            jnp.zeros_like(x0))
        for i in reversed(range(self.steps)):
            t = jnp.full((x_t.shape[0],), i, jnp.int32)
            out = self._denoise_apply(dp, x_t, t)
            x_t = self._pm_c1[i] * out + self._pm_c2[i] * x_t
        return x_t

    def _dense_rows(self, idx, kg_cols=None, kg_mask=None):
        # kg_cols/kg_mask are passed as jit ARGUMENTS by the diffusion
        # programs: the padded row table is ~900 MB at alibaba-fashion scale
        # (89k entities x 2,518 max degree) and a closed-over device array
        # lowers as a literal HLO constant, overflowing the remote-compile
        # request transport (HTTP 413) — same hazard as the evaluator's eval
        # structures (trainer/metrics.py).
        cols = (self.kg_rows.cols if kg_cols is None else kg_cols)[idx]
        mask = (self.kg_rows.mask if kg_mask is None else kg_mask)[idx]
        b = idx.shape[0]
        rows = jnp.zeros((b, self.n_entities))
        r = jnp.broadcast_to(jnp.arange(b)[:, None], cols.shape)
        return rows.at[r, cols].max(mask.astype(jnp.float32))

    def _lookup_rel(self, h, t):
        """(h, t) → (relation, found) via bounded binary search (20 iters)."""
        lo = self._map_ptr[h]
        hi = self._map_ptr[h + 1]

        def body(_, carry):
            lo, hi = carry
            mid = (lo + hi) // 2
            mv = self._map_t[jnp.clip(mid, 0, self._map_t.shape[0] - 1)]
            go_right = mv < t
            return (jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid))

        lo, hi = lax.fori_loop(0, 22, body, (lo, hi))
        pos = jnp.clip(lo, 0, self._map_t.shape[0] - 1)
        found = (lo < self._map_ptr[h + 1]) & (self._map_t[pos] == t)
        return self._map_r[pos], found

    # -- per-epoch hook: train denoiser, rebuild denoised KG ------------------
    def epoch_state(self, params, key, epoch):
        if not hasattr(self, "_dn_params"):
            k0 = jax.random.PRNGKey(int(self.cfg.train.seed) + 77)
            self._dn_params = self._init_denoise(k0)
            self._dn_opt = optax.adam(self.diff_lr)
            self._dn_opt_state = self._dn_opt.init(self._dn_params)
            self._build_diff_fns()
        key, k1, k2, k3 = jax.random.split(key, 4)
        self._dn_params, self._dn_opt_state, diff_loss = self._diff_epoch(
            self._dn_params, self._dn_opt_state,
            jax.lax.stop_gradient(params), k1,
            self.kg_rows.cols, self.kg_rows.mask)
        aux = self._rebuild(self._dn_params, k2,
                            self.kg_rows.cols, self.kg_rows.mask)
        self._last_dkg = aux["dkg"]  # cl_pattern==0 evaluates on the denoised KG
        return aux

    def _build_diff_fns(self):
        n_ent = self.n_entities
        bsz = min(1024, n_ent)
        n_batches = -(-n_ent // bsz)
        pad = n_batches * bsz - n_ent

        def diff_epoch(dp, opt_state, params, key, kg_cols, kg_mask):
            perm = jax.random.permutation(jax.random.fold_in(key, 0), n_ent)
            idx = jnp.concatenate([perm, perm[:pad]]).reshape(n_batches, bsz)

            def step(carry, inp):
                dp, opt_state = carry
                bidx, k = inp
                kt, kn, kd = jax.random.split(k, 3)
                x0 = self._dense_rows(bidx, kg_cols, kg_mask)
                ts = jax.random.randint(kt, (bsz,), 0, self.steps)
                noise = jax.random.normal(kn, x0.shape)
                x_t = self._q_sample(x0, ts, noise) if self.noise_scale != 0 else x0

                def full_loss(dp):
                    out = self._denoise_apply(dp, x_t, ts, dropout_key=kd)
                    mse = jnp.mean((x0 - out) ** 2, axis=1)
                    snr = lambda t: self._snr[t]
                    w = jnp.where(ts == 0, 1.0,
                                  snr(jnp.maximum(ts - 1, 0)) - snr(ts))
                    diff_l = jnp.mean(w * mse)
                    # item_user_matrix = (UI @ out_items.T).T = out_items @ UI.T
                    # itmEmbeds_kg = item_user_matrix @ userEmbeds
                    contrib = params["u_embeds"][self._ui.rows]  # [nnz, d]
                    vals = self._ui.vals[:, None] * contrib
                    iu_emb = jax.ops.segment_sum(
                        vals, self._ui.cols, num_segments=self.item_num)
                    itm_kg = out[:, : self.item_num] @ iu_emb
                    ukgc = jnp.mean((itm_kg - params["e_embeds"][bidx]) ** 2)
                    return diff_l * (1 - self.e_loss) + ukgc * self.e_loss

                loss, grads = jax.value_and_grad(full_loss)(dp)
                updates, opt_state = self._dn_opt.update(grads, opt_state, dp)
                dp = optax.apply_updates(dp, updates)
                return (dp, opt_state), loss

            keys = jax.random.split(jax.random.fold_in(key, 1), n_batches)
            (dp, opt_state), ls = lax.scan(step, (dp, opt_state), (idx, keys))
            return dp, opt_state, jnp.mean(ls)

        self._diff_epoch = jax.jit(diff_epoch, donate_argnums=(0, 1))

        def rebuild(dp, key, kg_cols, kg_mask):
            def chunk_top(idx):
                x0 = self._dense_rows(idx, kg_cols, kg_mask)
                den = self._p_sample(dp, x0)
                _, top = lax.top_k(den, self.rebuild_k)
                return top

            n_ent_pad = n_batches * bsz
            all_idx = jnp.arange(n_ent_pad, dtype=jnp.int32) % n_ent
            tops = lax.map(chunk_top, all_idx.reshape(n_batches, bsz))
            tails = tops.reshape(-1, self.rebuild_k)[:n_ent].reshape(-1)
            heads = jnp.repeat(jnp.arange(n_ent, dtype=jnp.int32), self.rebuild_k)
            # forward + reverse, validity from the relation map
            h2 = jnp.concatenate([heads, tails])
            t2 = jnp.concatenate([tails, heads])
            r2, found = self._lookup_rel(h2, t2)
            keep = jax.random.bernoulli(key, self.keep_rate, h2.shape)
            valid = found & keep
            return {"dkg": (h2, t2, jnp.where(found, r2, 0),
                            valid.astype(jnp.float32))}

        self._rebuild = jax.jit(rebuild)

    # -- loss -----------------------------------------------------------------
    def hparams(self):
        """Traced tune-grid scalars (structural: cl_pattern — it switches
        which forward sees the diffused KG — and layer_num_kg)."""
        return {"reg_weight": jnp.float32(self.reg_weight),
                "temperature": jnp.float32(self.temperature)}

    def loss(self, params, batch, key):
        hp = batch.get("hp", {})
        reg_w = hp.get("reg_weight", self.reg_weight)
        temp = hp.get("temperature", self.temperature)
        aux = batch["aux"]
        k1, k2 = jax.random.split(key)
        if self.cl_pattern == 0:
            u_main, i_main = self.forward(params, k1, kg=aux["dkg"], training=True)
            u_kg, i_kg = self.forward(params, k2, training=True)
        else:
            u_main, i_main = self.forward(params, k1, training=True)
            u_kg, i_kg = self.forward(params, k2, kg=aux["dkg"], training=True)
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        bpr = losses.bpr_loss(u_main[ancs], i_main[poss], i_main[negs]) / ancs.shape[0]
        reg = reg_w * losses.reg_params(params)
        cl = (losses.infonce_loss(u_main[ancs], u_kg[ancs], u_kg, temp)
              + losses.infonce_loss(i_main[poss], i_kg[poss], i_kg, temp)
              ) / ancs.shape[0] * self.cl_weight
        return bpr + reg + cl, {"bpr_loss": bpr, "reg_loss": reg, "cl_loss": cl}

    def generate(self, params):
        if self.cl_pattern == 0 and hasattr(self, "_last_dkg"):
            return self.forward(params, jax.random.PRNGKey(0), kg=self._last_dkg)
        return self.forward(params, jax.random.PRNGKey(0))
