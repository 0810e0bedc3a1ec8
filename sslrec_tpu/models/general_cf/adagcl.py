"""AdaGCL — adaptive contrastive learning with two learned view generators
(VGAE and an L0-gated denoising net) and a three-phase optimisation step.

Parity with ``models/general_cf/adagcl.py:14-428`` + ``AdaGCLTrainer``
(``trainer/trainer.py:1114-1203``): per batch, sequentially
(1) CL between the VGAE-generated view and the denoised-propagation view →
model update; (2) information-bottleneck CL against the detached previous
outputs → model update; (3) BPR + reg → model update; (4) VGAE ELBO (edge BCE +
KL + BPR) and DenoiseNet (BPR + λ₀·L0) → generator updates with their own
Adams.  Hard-concrete gates use the (γ, ζ) stretch with logistic noise during
training and plain sigmoid at generation; temperature anneals as
``max(0.05, init·decay^epoch)``.

TPU formulation: the bidirectional adjacency is one static structure; every
generated view is a value vector over it (VGAE keep-mask rescaled by
nnz/kept; denoise gates renormalised by clamped D^-1/2).  The whole 4-phase
flow is the model-managed ``train_step`` inside the jitted epoch scan.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.segment import segment_sum
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


def _mlp(ps, x, acts):
    for p, act in zip(ps, acts):
        x = x @ p["w"] + p["b"]
        if act == "relu":
            x = jax.nn.relu(x)
        elif act == "softplus":
            x = jax.nn.softplus(x)
    return x


class AdaGCL(RecModel):
    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.cl_weight = float(m.cl_weight)
        self.ib_weight = float(m.ib_weight)
        self.temperature = float(m.temperature)
        self.layer_num = int(m.layer_num)
        self.reg_weight = float(m.reg_weight)
        self.gamma = float(m.gamma)
        self.zeta = float(m.zeta)
        self.init_temp = float(m.init_temperature)
        self.temp_decay = float(m.temperature_decay)
        self.lambda0 = float(m.lambda0)

        trn = data.extras["train_mat_scipy"].tocoo()
        bi = sparse_ops.make_bi_adj(trn, self.user_num, self.item_num).tocoo()
        order = np.lexsort((bi.col, bi.row))
        self.rows = jnp.asarray(bi.row[order].astype(np.int32))
        self.cols = jnp.asarray(bi.col[order].astype(np.int32))
        self.norm_vals = jnp.asarray(bi.data[order].astype(np.float32))
        self.n_nodes = self.user_num + self.item_num
        self.nnz = int(bi.nnz)
        # all-one structure graph so every propagation can route through the
        # Pallas kernel as spmm(ones, x, edge_weight=vals).  Opt-in here: the
        # three-phase step still carries ~10 kernel instances (the DN gate
        # loops have per-layer parameters and resist scanning).
        import scipy.sparse as sp
        from sslrec_tpu.ops.pallas_spmm import maybe_pallas
        ones = sp.coo_matrix((np.ones(self.nnz, np.float32),
                              (bi.row[order], bi.col[order])),
                             shape=(self.n_nodes, self.n_nodes))
        self.adj_ones = maybe_pallas(ones, cfg.model.get("use_pallas", None))

        lr = float(cfg.optimizer.lr)
        wd = float(cfg.optimizer.get("weight_decay", 0) or 0)
        mk = lambda: optax.adam(lr) if wd == 0 else optax.chain(
            optax.add_decayed_weights(wd), optax.adam(lr))
        self._opt_rec, self._opt_vgae, self._opt_dn = mk(), mk(), mk()

    # -- parameters (three partitions) --------------------------------------
    def init_params(self, key):
        ks = jax.random.split(key, 16)
        d = self.embedding_size
        rec = {"user_embeds": xavier_uniform(ks[0], (self.user_num, d)),
               "item_embeds": xavier_uniform(ks[1], (self.item_num, d))}
        vgae = {
            "enc_mean": [linear_params(ks[2], d, d), linear_params(ks[3], d, d)],
            "enc_std": [linear_params(ks[4], d, d), linear_params(ks[5], d, d)],
            "dec": [linear_params(ks[6], d, d), linear_params(ks[7], d, 1)],
        }
        dn = {
            "nb": [linear_params(ks[8], d, d), linear_params(ks[9], d, d)],
            "self": [linear_params(ks[10], d, d), linear_params(ks[11], d, d)],
            "attn": [linear_params(ks[12], 2 * d, 1), linear_params(ks[13], 2 * d, 1)],
        }
        return {"rec": rec, "vgae": vgae, "dn": dn}

    def init_opt_state(self, params):
        return {"rec": self._opt_rec.init(params),
                "vgae": self._opt_vgae.init(params),
                "dn": self._opt_dn.init(params)}

    # -- propagation over a value vector ------------------------------------
    def _spmm(self, vals, x):
        from sslrec_tpu.ops.spmm import spmm
        return spmm(self.adj_ones, x, edge_weight=vals)

    def _forward(self, rec, vals):
        embeds = jnp.concatenate([rec["user_embeds"], rec["item_embeds"]], 0)

        def hop(x, _):
            y = self._spmm(vals, x)
            return y, y

        _, ys = jax.lax.scan(hop, embeds, None, length=self.layer_num)
        return embeds + jnp.sum(ys, axis=0)

    # -- VGAE ----------------------------------------------------------------
    def _vgae_encode(self, params, key):
        x = jax.lax.stop_gradient(self._forward(params["rec"], self.norm_vals))
        mean = _mlp(params["vgae"]["enc_mean"], x, ["relu", None])
        std = _mlp(params["vgae"]["enc_std"], x, ["relu", "softplus"])
        z = jax.random.normal(key, mean.shape) * std + mean
        return z, mean, std

    def _vgae_decode(self, params, z_src, z_dst):
        h = z_src * z_dst
        h = jax.nn.relu(h)
        h = jax.nn.relu(h @ params["vgae"]["dec"][0]["w"] + params["vgae"]["dec"][0]["b"])
        return (h @ params["vgae"]["dec"][1]["w"] + params["vgae"]["dec"][1]["b"])[..., 0]

    def _vgae_view(self, params, key):
        """(adagcl.py:223-237) keep edges with σ(score) ≥ 0.5, rescale values."""
        z, _, _ = self._vgae_encode(params, key)
        pred = jax.nn.sigmoid(self._vgae_decode(params, z[self.rows], z[self.cols]))
        mask = jnp.floor(pred + 0.5)
        kept = jnp.maximum(jnp.sum(mask), 1.0)
        return self.norm_vals * mask * (self.nnz / kept)

    # -- DenoiseNet ----------------------------------------------------------
    def _dn_logit(self, params, x, layer):
        f1 = jax.nn.relu(x[self.rows] @ params["dn"]["nb"][layer]["w"]
                         + params["dn"]["nb"][layer]["b"])
        f2 = jax.nn.relu(x[self.cols] @ params["dn"]["self"][layer]["w"]
                         + params["dn"]["self"][layer]["b"])
        cat = jnp.concatenate([f1, f2], -1)
        return (cat @ params["dn"]["attn"][layer]["w"]
                + params["dn"]["attn"][layer]["b"])[..., 0]

    def _hard_concrete(self, key, log_alpha, beta, training):
        if training:
            u = jax.random.uniform(key, log_alpha.shape, minval=1e-7,
                                   maxval=1 - 1e-7)
            gate = jax.nn.sigmoid((jnp.log(u) - jnp.log(1 - u) + log_alpha) / beta)
        else:
            gate = jax.nn.sigmoid(log_alpha)
        return jnp.clip(gate * (self.zeta - self.gamma) + self.gamma, 0.0, 1.0)

    def _dn_normalize(self, mask):
        deg = segment_sum(mask, self.rows, self.n_nodes, sorted_ids=True)
        dinv = jnp.clip((deg + 1e-6) ** -0.5, 0.0, 10.0)
        return mask * dinv[self.rows] * dinv[self.cols]

    def _dn_forward(self, params, key, temperature, training, collect_l0):
        x = jax.lax.stop_gradient(jnp.concatenate(
            [params["rec"]["user_embeds"], params["rec"]["item_embeds"]], 0)) \
            if training else jnp.concatenate(
            [params["rec"]["user_embeds"], params["rec"]["item_embeds"]], 0)
        acc = [x]
        l0 = 0.0
        for layer in range(min(self.layer_num, 2)):
            key, sub = jax.random.split(key)
            log_alpha = self._dn_logit(params, acc[-1], layer)
            mask = self._hard_concrete(sub, log_alpha, temperature, training)
            if collect_l0:
                l0 = l0 + jnp.mean(jax.nn.sigmoid(
                    log_alpha - temperature * jnp.log(-self.gamma / self.zeta)))
            vals = self._dn_normalize(mask)
            acc.append(self._spmm(vals, acc[-1]))
        return sum(acc), l0

    def _dn_view_forward(self, params, key):
        """forward_ (adagcl.py:61-75): denoised propagation of rec embeds,
        gates generated without gradient."""
        embeds = jnp.concatenate([params["rec"]["user_embeds"],
                                  params["rec"]["item_embeds"]], 0)
        acc = [embeds]
        for layer in range(min(self.layer_num, 2)):
            log_alpha = jax.lax.stop_gradient(
                self._dn_logit(params, acc[-1], layer))
            mask = self._hard_concrete(key, log_alpha, 1.0, training=False)
            vals = self._dn_normalize(mask)
            acc.append(self._spmm(vals, acc[-1]))
        return sum(acc)

    # -- losses ---------------------------------------------------------------
    def _graphcl(self, x1, x2, users, items):
        u1, i1 = x1[: self.user_num], x1[self.user_num:]
        u2, i2 = x2[: self.user_num], x2[self.user_num:]
        norm = lambda e: e / jnp.sqrt(jnp.sum(e**2, -1, keepdims=True) + 1e-12)
        a1 = jnp.concatenate([norm(u1)[users], norm(i1)[items]], 0)
        a2 = jnp.concatenate([norm(u2)[users], norm(i2)[items]], 0)
        n1 = jnp.sqrt(jnp.sum(a1**2, -1) + 1e-12)
        n2 = jnp.sqrt(jnp.sum(a2**2, -1) + 1e-12)
        sim = jnp.exp((a1 @ a2.T) / (n1[:, None] * n2[None, :]) / self.temperature)
        pos = jnp.diagonal(sim)
        return -jnp.log(pos / (jnp.sum(sim, 1) - pos) + 1e-12)

    # -- the 4-phase step ------------------------------------------------------
    def train_step(self, params, opt_state, batch, key):
        ancs, poss, negs = batch["user"], batch["pos"], batch["neg"]
        temperature = batch["aux"]["temperature"]
        kv, kd1, kd2, kdn = jax.random.split(key, 4)
        vgae_vals = jax.lax.stop_gradient(self._vgae_view(params, kv))

        rec_only = lambda g: {"rec": g["rec"],
                              "vgae": jax.tree.map(jnp.zeros_like, g["vgae"]),
                              "dn": jax.tree.map(jnp.zeros_like, g["dn"])}

        # phase 1: CL
        def cl_loss(p):
            out1 = self._forward(p["rec"], vgae_vals)
            out2 = self._dn_view_forward(p, kd1)
            l = jnp.mean(self._graphcl(out1, out2, ancs, poss)) * self.cl_weight
            return l, (out1, out2)

        (cl_l, (out1, out2)), g = jax.value_and_grad(cl_loss, has_aux=True)(params)
        upd, st = self._opt_rec.update(rec_only(g), opt_state["rec"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, rec=st)

        # phase 2: information bottleneck vs detached old outs
        out1_old = jax.lax.stop_gradient(out1)
        out2_old = jax.lax.stop_gradient(out2)

        def ib_loss(p):
            o1 = self._forward(p["rec"], vgae_vals)
            o2 = self._dn_view_forward(p, kd2)
            l = self._graphcl(o1, out1_old, ancs, poss) \
                + self._graphcl(o2, out2_old, ancs, poss)
            return jnp.mean(l) * self.ib_weight

        ib_l, g = jax.value_and_grad(ib_loss)(params)
        upd, st = self._opt_rec.update(rec_only(g), opt_state["rec"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, rec=st)

        # phase 3: main BPR (+ generator losses share this backward in the
        # reference; their grads are disjoint so updates are equivalent)
        def main_loss(p):
            all_emb = self._forward(p["rec"], self.norm_vals)
            u, i = all_emb[: self.user_num], all_emb[self.user_num:]
            bpr = losses.bpr_loss(u[ancs], i[poss], i[negs]) / ancs.shape[0]
            reg = self.reg_weight * losses.reg_params(p["rec"])
            return bpr + reg, (bpr, reg)

        (main_l, (bpr_l, reg_l)), g = jax.value_and_grad(main_loss, has_aux=True)(params)
        upd, st = self._opt_rec.update(rec_only(g), opt_state["rec"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, rec=st)

        # phase 4: generators
        def vgae_loss(p):
            kz, = jax.random.split(kv, 1)
            z, mean, std = self._vgae_encode(p, kz)
            zu, zi = z[: self.user_num], z[self.user_num:]
            pos_pred = jax.nn.sigmoid(self._vgae_decode(p, zu[ancs], zi[poss]))
            neg_pred = jax.nn.sigmoid(self._vgae_decode(p, zu[ancs], zi[negs]))
            bce = -jnp.log(pos_pred + 1e-12) - jnp.log(1 - neg_pred + 1e-12)
            kl = -0.5 * jnp.sum(1 + 2 * jnp.log(std + 1e-12) - mean**2 - std**2, 1)
            bpr = losses.bpr_loss(zu[ancs], zi[poss], zi[negs]) / ancs.shape[0]
            return jnp.mean(bce) + 0.1 * jnp.mean(kl) + bpr

        vg_l, g = jax.value_and_grad(vgae_loss)(params)
        g_v = {"rec": jax.tree.map(jnp.zeros_like, g["rec"]), "vgae": g["vgae"],
               "dn": jax.tree.map(jnp.zeros_like, g["dn"])}
        upd, st = self._opt_vgae.update(g_v, opt_state["vgae"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, vgae=st)

        def dn_loss(p):
            x, l0 = self._dn_forward(p, kdn, temperature, True, True)
            u, i = x[: self.user_num], x[self.user_num:]
            bpr = losses.bpr_loss(u[ancs], i[poss], i[negs]) / ancs.shape[0]
            return bpr + l0 * self.lambda0

        dn_l, g = jax.value_and_grad(dn_loss)(params)
        g_d = {"rec": jax.tree.map(jnp.zeros_like, g["rec"]),
               "vgae": jax.tree.map(jnp.zeros_like, g["vgae"]), "dn": g["dn"]}
        upd, st = self._opt_dn.update(g_d, opt_state["dn"], params)
        params = optax.apply_updates(params, upd)
        opt_state = dict(opt_state, dn=st)

        aux = {"loss": cl_l + ib_l + main_l + vg_l + dn_l, "cl_loss": cl_l,
               "ib_loss": ib_l, "bpr_loss": bpr_l, "reg_loss": reg_l,
               "generate_loss": vg_l, "denoise_loss": dn_l}
        return params, opt_state, aux

    def epoch_state(self, params, key, epoch):
        return {"temperature": jnp.asarray(
            max(0.05, self.init_temp * (self.temp_decay ** epoch)), jnp.float32)}

    def generate(self, params):
        all_emb = self._forward(params["rec"], self.norm_vals)
        return all_emb[: self.user_num], all_emb[self.user_num:]
