"""MBGMN — meta-graph neural network over behaviors: meta networks generate
per-behavior embedding specialisations and per-pair prediction MLPs.

Parity with ``models/multi_behavior/mbgmn.py:19-224`` and its trainer
(``trainer/trainer.py:1052-1111``): half-size base embeddings specialised per
behavior by a rank-factored meta transform (concatenated back to full size);
per-behavior propagation with leaky-relu; a final multi-behavior tower fused by
light self-attention; hinge loss over every (source, target) behavior pair with
per-pair meta-generated 2-layer MLP scoring; ``trnNum`` uniformly-drawn users
per epoch with ``sampNum`` positives + negatives each.

TPU notes: per-behavior positive draws are CSR-gather samples (uniform with
replacement, matching ``np.random.choice(posset, sampNum)``); users without a
behavior fall back to a shared random item for pos and neg (the reference's
``sampNum==0`` branch).  Users are drawn uniformly on device per step.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from sslrec_tpu.data.sampling import sample_negatives
from sslrec_tpu.models import losses
from sslrec_tpu.models.base import RecModel
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.utils.initializers import linear_params, xavier_uniform


class MBGMN(RecModel):
    batch_fields = ("user", "pos")  # placeholders; sampling happens in-loss

    def __init__(self, cfg, data):
        super().__init__(cfg, data)
        m = cfg.model
        self.graphs = data.extras["behavior_graphs"]
        self.n_beh = len(self.graphs)
        self.layer_num = int(m.layer_num)
        self.rank = int(m.rank)
        self.att_head = int(m.att_head)
        self.samp_num = int(m.sampNum)
        self.trn_num = int(m.get("trnNum", 100))
        self.mult = float(m.mult)
        self.detach_pre = bool(m.get("detach_pre_loss", True))
        self.reg = float(cfg.train.get("reg", 1e-2))
        self.slope = float(m.get("slope", 0.1))

        # per-behavior CSR structures for on-device positive sampling
        self._beh_csr = []
        for coo in data.extras["behavior_mats_scipy"]:
            csr = coo.tocsr()
            self._beh_csr.append((jnp.asarray(csr.indptr.astype(np.int32)),
                                  jnp.asarray(csr.indices.astype(np.int32))))
        self._beh_edge_sets = [sparse_ops.build_edge_set(coo)
                               for coo in data.extras["behavior_mats_scipy"]]

    # -- params -------------------------------------------------------------
    def init_params(self, key):
        d = self.embedding_size
        h = d // 2
        ks = jax.random.split(key, 16)
        return {
            "u_embed": xavier_uniform(ks[0], (self.user_num, h)),
            "i_embed": xavier_uniform(ks[1], (self.item_num, h)),
            "beh_embeds": xavier_uniform(ks[2], (self.n_beh + 1, h)),
            "spec_u": linear_params(ks[3], 3 * h, h),
            "spec_i": linear_params(ks[4], 3 * h, h),
            "spec_u1": linear_params(ks[5], h, self.rank * h),
            "spec_i1": linear_params(ks[6], h, self.rank * h),
            "spec_u2": linear_params(ks[7], h, self.rank * h),
            "spec_i2": linear_params(ks[8], h, self.rank * h),
            "pred_fc1": linear_params(ks[9], 3 * d, d),
            "pred_fc2": linear_params(ks[10], 3 * d, 3 * d),
            "pred_fc3": linear_params(ks[11], 3 * d, 3 * d * d),
            "pred_fc4": linear_params(ks[12], 3 * d, d),
            "pred_fc5": linear_params(ks[13], 3 * d, d),
            "q": xavier_uniform(ks[14], (d, d)),
        }

    def epoch_schedule(self, n_train, batch_size):
        """Reference MBGMNTrainer draws ``trnNum`` random users per epoch and
        steps in ``batch_size`` chunks with a partial final batch
        (trainer.py:1058-1062) — NOT one pass over the interactions.  With the
        shipped trnNum=100 < batch 256 that is ONE optimizer step per epoch,
        which is what keeps the detached-hinge reference near its init.

        Static shapes forbid a ragged final batch, so the ``trnNum`` users are
        split evenly: ceil(trnNum/bsz) steps of ceil(trnNum/n_steps) users —
        the same per-epoch user total (users are i.i.d. draws, so the split is
        distributionally equivalent to the reference's bsz+remainder split).
        Remaining deviation: users are drawn per step WITH replacement
        (``loss``), not one epoch permutation — negligible for trnNum ≪ users."""
        n_steps = -(-self.trn_num // batch_size)
        return n_steps, -(-self.trn_num // n_steps)

    def _act(self, x):
        return jax.nn.leaky_relu(x, self.slope)

    def _lin(self, p, x):
        return x @ p["w"] + p["b"]

    # -- meta specialisation (mbgmn.py:94-141) ------------------------------
    def _specialize(self, params, beh_embed, adjs):
        h = self.embedding_size // 2
        u0, i0 = params["u_embed"], params["i_embed"]
        u_nb = sum(spmm(a, i0) for a, _ in adjs)
        i_nb = sum(spmm(at, u0) for _, at in adjs)
        ub = jnp.broadcast_to(beh_embed[None, :], u0.shape)
        ib = jnp.broadcast_to(beh_embed[None, :], i0.shape)
        u_meta = self._act(self._lin(params["spec_u"],
                                     jnp.concatenate([ub, u0, u_nb], -1)))
        i_meta = self._act(self._lin(params["spec_i"],
                                     jnp.concatenate([ib, i0, i_nb], -1)))
        uw1 = self._act(self._lin(params["spec_u1"], u_meta)).reshape(-1, h, self.rank)
        uw2 = self._act(self._lin(params["spec_u2"], u_meta)).reshape(-1, self.rank, h)
        iw1 = self._act(self._lin(params["spec_i1"], i_meta)).reshape(-1, h, self.rank)
        iw2 = self._act(self._lin(params["spec_i2"], i_meta)).reshape(-1, self.rank, h)
        ru = jnp.einsum("nh,nhr->nr", u0, uw1)
        ru = jnp.einsum("nr,nrh->nh", ru, uw2)
        ri = jnp.einsum("nh,nhr->nr", i0, iw1)
        ri = jnp.einsum("nr,nrh->nh", ri, iw2)
        return jnp.concatenate([ru, u0], -1), jnp.concatenate([ri, i0], -1)

    def _light_attention(self, params, reps):
        """(mbgmn.py:144-157) tiny self-attention across behaviors."""
        d, nh = self.embedding_size, self.att_head
        n = len(reps)
        stacked = jnp.stack(reps, axis=1)                # [N, n, d]
        tem = stacked @ params["q"]
        q = tem.reshape(-1, n, 1, nh, d // nh)
        k = tem.reshape(-1, 1, n, nh, d // nh)
        v = stacked.reshape(-1, 1, n, nh, d // nh)
        att = jax.nn.softmax(
            jnp.sum(q * k, -1, keepdims=True) / jnp.sqrt(d / nh), axis=2)
        attval = jnp.sum(att * v, axis=2).reshape(-1, n, d)
        return [attval[:, i] + reps[i] for i in range(n)]

    def forward(self, params):
        ulat, ilat = [], []
        for b in range(self.n_beh):
            bu, bi = self._specialize(params, params["beh_embeds"][b],
                                      [self.graphs[b]])
            us, is_ = [bu], [bi]
            for _ in range(self.layer_num):
                u = self._act(spmm(self.graphs[b][0], is_[-1]))
                i = self._act(spmm(self.graphs[b][1], us[-1]))
                us.append(u + us[-1])
                is_.append(i + is_[-1])
            ulat.append(sum(us))
            ilat.append(sum(is_))
        bu, bi = self._specialize(params, params["beh_embeds"][-1], self.graphs)
        us, is_ = [bu], [bi]
        for _ in range(self.layer_num):
            ub = [self._act(spmm(self.graphs[b][0], is_[-1]))
                  for b in range(self.n_beh)]
            ib = [self._act(spmm(self.graphs[b][1], us[-1]))
                  for b in range(self.n_beh)]
            us.append(sum(self._light_attention(params, ub)))
            is_.append(sum(self._light_attention(params, ib)))
        ulat.append(sum(us))
        ilat.append(sum(is_))
        return ulat, ilat

    # -- per-pair meta prediction (mbgmn.py:160-186) ------------------------
    def _meta_predict(self, params, su, si, tu, ti):
        d = self.embedding_size
        src_ui = self._act(self._lin(params["pred_fc1"],
                                     jnp.concatenate([su * si, su, si], -1)))
        tgt_ui = self._act(self._lin(params["pred_fc1"],
                                     jnp.concatenate([tu * ti, tu, ti], -1)))
        metalat = self._act(self._lin(params["pred_fc2"],
                                      jnp.concatenate([src_ui * tgt_ui, src_ui,
                                                       tgt_ui], -1)))
        w1 = self._act(self._lin(params["pred_fc3"], metalat)).reshape(-1, 3 * d, d)
        b1 = self._act(self._lin(params["pred_fc4"], metalat)).reshape(-1, 1, d)
        w2 = self._act(self._lin(params["pred_fc5"], metalat)).reshape(-1, d, 1)
        pe = jnp.concatenate([su * si, su, si], -1)[:, None, :]
        pe = self._act(pe @ w1 + b1)
        return (pe @ w2).reshape(-1)

    def hparams(self):
        """Traced tune-grid scalars.  The shipped grid's ``reg_weight`` is a
        *documented no-op*: the reference MBGMN regularises with
        ``configs['train']['reg']`` (models/multi_behavior/mbgmn.py:190) and
        never reads ``model.reg_weight`` — exposing it as an inert lane
        collapses the 9-trial grid to 3 compiled programs without changing
        any trial's semantics."""
        return {"reg_weight": jnp.float32(float(
            self.cfg.model.get("reg_weight", 0.0)))}

    def loss(self, params, batch, key):
        b = batch["user"].shape[0]
        ku, kp, kn, kf = jax.random.split(key, 4)
        users = jax.random.randint(ku, (b,), 0, self.user_num)
        ulat, ilat = self.forward(params)

        pre_loss = 0.0
        uids, iids = [], []
        for bi_ in range(self.n_beh):
            indptr, indices = self._beh_csr[bi_]
            start = indptr[users]
            deg = indptr[users + 1] - start
            u = jax.random.uniform(jax.random.fold_in(kp, bi_),
                                   (b, self.samp_num))
            off = (u * jnp.maximum(deg, 1)[:, None]).astype(jnp.int32)
            pos = indices[jnp.clip(start[:, None] + off, 0, indices.shape[0] - 1)]
            negs = sample_negatives(jax.random.fold_in(kn, bi_),
                                    jnp.repeat(users, self.samp_num),
                                    self._beh_edge_sets[bi_], self.item_num
                                    ).reshape(b, self.samp_num)
            fallback = jax.random.randint(jax.random.fold_in(kf, bi_),
                                          (b, 1), 0, self.item_num)
            has = (deg > 0)[:, None]
            pos = jnp.where(has, pos, fallback)
            negs = jnp.where(has, negs, fallback)
            uu = jnp.tile(jnp.repeat(users, self.samp_num), 2)
            ii = jnp.concatenate([pos.reshape(-1), negs.reshape(-1)])
            uids.append(uu)
            iids.append(ii)

        for src in range(self.n_beh + 1):
            for tgt in range(self.n_beh):
                uu, ii = uids[tgt], iids[tgt]
                preds = self._meta_predict(
                    params, ulat[src][uu], ilat[src][ii],
                    ulat[tgt][uu], ilat[tgt][ii]) * self.mult
                half = uu.shape[0] // 2
                pre_loss = pre_loss + jnp.mean(
                    jnp.maximum(0.0, 1.0 - (preds[:half] - preds[half:])))
        reg = self.reg * losses.reg_pick_embeds([ulat[-1], ilat[-1]])
        if self.detach_pre:
            # Reference-faithful: the reference wraps its hinge in
            # ``torch.tensor(...).clone().detach()`` (mbgmn.py:187), so the
            # ranking term carries NO gradient — only the L2 shrinkage trains.
            # Validated by a torch-CPU run of the reference itself
            # (tools/validate_mbgmn_ref.py): R@20 0.0478 on retail_rocket.
            # Set model.detach_pre_loss: false for the repaired trainable hinge.
            loss = jax.lax.stop_gradient(pre_loss) + reg
        else:
            loss = pre_loss + reg
        return loss, {"pre_loss": pre_loss, "reg_loss": reg}

    def generate(self, params):
        ulat, ilat = self.forward(params)
        return ulat[-1], ilat[-1]
