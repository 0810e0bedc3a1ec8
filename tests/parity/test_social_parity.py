"""Numeric parity: JAX social models vs the reference torch implementations.

Same tiny synthetic dataset, identical parameters injected into both sides,
forwards and loss components compared to ~1e-4 (VERDICT round-1 item 1).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from sslrec_tpu.config import load_config
from sslrec_tpu.data import social as social_data
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.ops import sparse as sparse_ops

from tests.parity.refshim import load_ref
from tests.parity.util import (assert_close, j2t, set_linear, t2j, tiny_social,
                               torch_sparse)


def _reverse_perm_torch(n, **kw):
    return torch.arange(n - 1, -1, -1)


def _reverse_perm_jax(key, x, **kw):
    return jnp.arange(x - 1, -1, -1)


class _Handler:
    pass


# ---------------------------------------------------------------------------
# DSL
# ---------------------------------------------------------------------------

def test_dsl_parity():
    ui, trust = tiny_social()
    n_users, n_items = ui.shape
    cfg = load_config("dsl", overrides={
        "model.embedding_size": 16, "model.dropout_rate": 0.0,
        "data.name": "synthetic"})
    data = social_data.bundle_from_matrices(cfg, ui, ui, trust)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.social.dsl")
    configs["data"].update({"user_num": n_users, "item_num": n_items})
    configs["model"] = {
        "embedding_size": 16,
        "gnn_layer": int(cfg.model.gnn_layer),
        "uugnn_layer": int(cfg.model.uugnn_layer),
        "leaky": float(cfg.model.leaky),
        "reg_weight": float(cfg.model.reg_weight),
        "soc_weight": float(cfg.model.soc_weight),
        "sal_weight": float(cfg.model.sal_weight),
        "dropout_rate": 0.0,
    }
    h = _Handler()
    h.torch_adj = torch_sparse(sparse_ops.make_bi_adj(ui, n_users, n_items))
    h.torch_uu_adj = torch_sparse(
        sparse_ops.normalize_adj_sym((trust != 0) * 1.0))
    ref = ref_mod.DSL(h)
    with torch.no_grad():
        ref.user_embeds.copy_(j2t(params["user_embeds"]))
        ref.item_embeds.copy_(j2t(params["item_embeds"]))
    set_linear(ref.linear1, params["linear1"])
    set_linear(ref.linear2, params["linear2"])
    ref.eval()  # freezes nn.Dropout (also dropout_rate=0)

    # --- forward parity
    ru, ri, ru2 = ref.forward(ref.adj, ref.u_adj)
    ju, ji, ju2 = model._towers(params)
    assert_close(ru, ju, what="DSL user embeds")
    assert_close(ri, ji, what="DSL item embeds")
    assert_close(ru2, ju2, what="DSL social user embeds")

    # --- loss parity (identical batch, injected SAL pairs)
    rng = np.random.default_rng(1)
    n = 32
    ancs = rng.integers(0, n_users, n).astype(np.int32)
    poss = rng.integers(0, n_items, n).astype(np.int32)
    negs = rng.integers(0, n_items, n).astype(np.int32)
    su = rng.integers(0, n_users, n).astype(np.int32)
    sp_ = rng.integers(0, n_users, n).astype(np.int32)
    sn = rng.integers(0, n_users, n).astype(np.int32)
    u1 = rng.integers(0, n_users, n).astype(np.int32)
    u2 = rng.integers(0, n_users, n).astype(np.int32)

    tt = lambda a: torch.from_numpy(a.astype(np.int64))
    rloss, rparts = ref.cal_loss((tt(ancs), tt(poss), tt(negs), tt(su),
                                  tt(sp_), tt(sn), tt(u1), tt(u2)))
    batch = {"user": jnp.asarray(ancs), "pos": jnp.asarray(poss),
             "neg": jnp.asarray(negs), "suser": jnp.asarray(su),
             "spos": jnp.asarray(sp_), "sneg": jnp.asarray(sn),
             "sal_u1": jnp.asarray(u1), "sal_u2": jnp.asarray(u2)}
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(7))
    for name, jname in [("rec_loss", "rec_loss"), ("reg_loss", "reg_loss"),
                        ("soc_loss", "soc_loss"), ("sal_loss", "sal_loss")]:
        assert_close(rparts[name], jparts[jname], rtol=2e-4,
                     what=f"DSL {name}")
    assert_close(rloss, jloss, rtol=2e-4, what="DSL total loss")


# ---------------------------------------------------------------------------
# MHCN
# ---------------------------------------------------------------------------

def test_mhcn_parity(monkeypatch):
    ui, trust = tiny_social(seed=3)
    n_users, n_items = ui.shape
    cfg = load_config("mhcn", overrides={
        "model.embedding_size": 16, "data.name": "synthetic"})
    data = social_data.bundle_from_matrices(cfg, ui, ui, trust)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.social.mhcn")
    configs["data"].update({"user_num": n_users, "item_num": n_items})
    configs["model"] = {
        "embedding_size": 16,
        "layer_num": int(cfg.model.layer_num),
        "reg_weight": float(cfg.model.reg_weight),
        "ss_rate": float(cfg.model.ss_rate),
    }
    h_s, h_j, h_p = social_data.build_motif_adjacencies(trust.tocsr(), ui)
    h = _Handler()
    h.H_s, h.H_j, h.H_p = (torch_sparse(h_s), torch_sparse(h_j),
                           torch_sparse(h_p))
    h.R = torch_sparse(social_data.build_joint_adjacency(ui))
    ref = ref_mod.MHCN(h)
    with torch.no_grad():
        ref.user_embeds.copy_(j2t(params["user_embeds"]))
        ref.item_embeds.copy_(j2t(params["item_embeds"]))
        ref.attn.copy_(j2t(params["attn"]))
        ref.attn_mat.copy_(j2t(params["attn_mat"]))
    for i, mod in enumerate([ref.gating1, ref.gating2, ref.gating3, ref.gating4]):
        set_linear(mod, params["gating"][i])
    for i, mod in enumerate([ref.sgating1, ref.sgating2, ref.sgating3]):
        set_linear(mod, params["sgating"][i])

    ru, ri = ref.forward()
    ju, ji = model.forward(params)
    assert_close(ru, ju, what="MHCN user embeds")
    assert_close(ri, ji, what="MHCN item embeds")

    # --- loss parity with pinned (reversed) shuffles on both sides
    monkeypatch.setattr(torch, "randperm", _reverse_perm_torch)
    monkeypatch.setattr(jax.random, "permutation", _reverse_perm_jax)
    rng = np.random.default_rng(5)
    n = 32
    ancs = rng.integers(0, n_users, n)
    poss = rng.integers(0, n_items, n)
    negs = rng.integers(0, n_items, n)
    rloss, rparts = ref.cal_loss((torch.from_numpy(ancs),
                                  torch.from_numpy(poss),
                                  torch.from_numpy(negs)))
    batch = {"user": jnp.asarray(ancs.astype(np.int32)),
             "pos": jnp.asarray(poss.astype(np.int32)),
             "neg": jnp.asarray(negs.astype(np.int32))}
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(11))
    assert_close(rparts["bpr_loss"], jparts["bpr_loss"], rtol=2e-4,
                 what="MHCN bpr")
    assert_close(rparts["reg_loss"], jparts["reg_loss"], rtol=2e-4,
                 what="MHCN reg")
    assert_close(rparts["ss_loss"], jparts["ss_loss"], rtol=2e-3,
                 what="MHCN ssl")
    assert_close(rloss, jloss, rtol=2e-3, what="MHCN total loss")
