"""Numeric parity for the remaining social models (KCGN, SMIN) vs the
reference torch implementations run through the refshim."""

from __future__ import annotations

import numpy as np
import pytest
import scipy.sparse as sp
import torch
import jax
import jax.numpy as jnp

from sslrec_tpu.config import load_config
from sslrec_tpu.data import social as social_data
from sslrec_tpu.models.registry import build_model

from tests.parity.refshim import load_ref, install_dgl
from tests.parity.util import (assert_close, j2t, set_linear, t2j, tiny_social,
                               torch_sparse)


class _Handler:
    pass


def _pin_perms(monkeypatch):
    monkeypatch.setattr(torch, "randperm",
                        lambda n, **kw: torch.arange(n - 1, -1, -1))
    monkeypatch.setattr(jax.random, "permutation",
                        lambda key, x, **kw: jnp.arange(x - 1, -1, -1))


# ---------------------------------------------------------------------------
# KCGN
# ---------------------------------------------------------------------------

def test_kcgn_parity(monkeypatch):
    ui, trust = tiny_social(seed=11)
    n_users, n_items = ui.shape
    rng = np.random.default_rng(1)
    # rated interactions (1..3) + per-edge timestamps, 2 categories
    rated = ui.tocoo().copy()
    rated.data = rng.integers(1, 4, rated.nnz).astype(np.float64)
    tmat = ui.tocoo().copy()
    tmat.data = rng.integers(10_000, 3_000_000, tmat.nnz).astype(np.float64)
    cat = sp.csr_matrix(
        (np.ones(n_items, np.float32),
         (np.arange(n_items), rng.integers(0, 2, n_items))),
        shape=(n_items, 2))

    cfg = load_config("kcgn", overrides={
        "model.embedding_size": 8, "model.subnode": 2,
        "data.name": "synthetic"})
    data = social_data.bundle_from_matrices(
        cfg, rated.tocsr(), ui, trust, category_mat=cat, trn_time=tmat.tocsr())
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.social.kcgn")
    configs["data"].update({"user_num": n_users, "item_num": n_items})
    configs["model"] = dict(cfg.model)
    import dgl

    h = _Handler()
    h.rating_class = model.r_class
    h.max_time = model.max_time
    src = np.asarray(model.src)
    dst = np.asarray(model.dst)
    h.uv_g = dgl.graph((src, dst), num_nodes=model.n_nodes)
    h.time_seq_tensor = torch.from_numpy(np.asarray(model.time_seq)).long()

    uu = ((trust.T + trust) + sp.eye(n_users, format="csr")) != 0
    ii = (sp.csr_matrix(cat) @ sp.csr_matrix(cat).T) != 0
    ucoo, icoo = uu.tocoo(), ii.tocoo()
    h.uu_graph = dgl.graph((ucoo.row, ucoo.col), num_nodes=n_users)
    h.ii_graph = dgl.graph((icoo.row, icoo.col), num_nodes=n_items)
    uu_lbl, uu_adj, _, uu_mask = social_data.connected_component_structs(uu, 2)
    ii_lbl, ii_adj, _, ii_mask = social_data.connected_component_structs(ii, 2)
    h.uu_subgraph_adj_tensor = torch_sparse(uu_adj.tocoo())
    h.ii_subgraph_adj_tensor = torch_sparse(ii_adj.tocoo())
    h.uu_subgraph_adj_norm = torch.from_numpy(
        np.asarray(model.uu_sub_norm)[:, None])
    h.ii_subgraph_adj_norm = torch.from_numpy(
        np.asarray(model.ii_sub_norm)[:, None])
    h.uu_node_subgraph = torch.from_numpy(uu_lbl.astype(np.int64))
    h.ii_node_subgraph = torch.from_numpy(ii_lbl.astype(np.int64))
    h.uu_dgi_node = None
    h.ii_dgi_node = None
    h.uu_dgi_node_mask = torch.from_numpy(uu_mask)
    h.ii_dgi_node_mask = torch.from_numpy(ii_mask)

    ref = ref_mod.KCGN(h)
    with torch.no_grad():
        ref.user_embeds.copy_(j2t(params["user_embeds"]))
        ref.item_embeds.copy_(j2t(params["item_embeds"]))
        for i, lay in enumerate(ref.layers):
            lay.u_w.copy_(j2t(params["u_w"][i]))
            lay.v_w.copy_(j2t(params["v_w"][i]))
        # both reference PReLUs match the repo's shared scalar
        for dgi in (ref.uu_dgi, ref.ii_dgi):
            for p_ in dgi.parameters():
                if p_.numel() == 1:
                    p_.copy_(j2t(params["prelu"]))
    set_linear(ref.t_e.lin, params["time_lin"])
    ref.eval()

    # --- forward parity
    ru, ri = ref.forward(h.uv_g, h.time_seq_tensor, ref.out_dim,
                         h.rating_class)
    ju, ji = model.forward(params)
    assert_close(ru, ju, atol=2e-4, what="KCGN user embeds")
    assert_close(ri, ji, atol=2e-4, what="KCGN item embeds")

    # --- loss parity with pinned corruption permutations
    _pin_perms(monkeypatch)
    n = 24
    ancs = rng.integers(0, n_users, n)
    poss = rng.integers(0, n_items, n)
    negs = rng.integers(0, n_items, n)
    ref.is_training = True
    rloss, rparts = ref.cal_loss((torch.from_numpy(ancs),
                                  torch.from_numpy(poss),
                                  torch.from_numpy(negs)))
    batch = {"user": jnp.asarray(ancs.astype(np.int32)),
             "pos": jnp.asarray(poss.astype(np.int32)),
             "neg": jnp.asarray(negs.astype(np.int32))}
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(3))
    for part in ("bpr_loss", "reg_loss", "uu_dgi_loss", "ii_dgi_loss"):
        assert_close(rparts[part], jparts[part], rtol=2e-3, atol=2e-4,
                     what=f"KCGN {part}")
    assert_close(rloss, jloss, rtol=1e-3, what="KCGN total loss")


# ---------------------------------------------------------------------------
# SMIN
# ---------------------------------------------------------------------------

def test_smin_parity(monkeypatch):
    ui, trust = tiny_social(seed=13)
    n_users, n_items = ui.shape
    rng = np.random.default_rng(2)
    cat = sp.csr_matrix(
        (np.ones(n_items, np.float32),
         (np.arange(n_items), rng.integers(0, 2, n_items))),
        shape=(n_items, 2))

    cfg = load_config("smin", overrides={
        "model.embedding_size": 8, "data.name": "synthetic"})
    data = social_data.bundle_from_matrices(cfg, ui, ui, trust,
                                            category_mat=cat)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.social.smin")
    configs["data"].update({"user_num": n_users, "item_num": n_items})
    configs["model"] = dict(cfg.model)
    import dgl

    trn_bin = (ui != 0).astype(np.float32).tocoo()
    metapath = social_data.gen_metapaths(trn_bin, trust, cat)
    one_hop, sub = social_data.gen_ui_subgraph(
        trn_bin, metapath, int(cfg.model.k_hop_num))

    def to_dgl(m):
        coo = m.tocoo()
        return dgl.graph((coo.row, coo.col), num_nodes=m.shape[0])

    h = _Handler()
    h.user_graph = [to_dgl(metapath[k.upper()])
                    for k in cfg.model.user_graph_indx.split("_")]
    h.item_graph = [to_dgl(metapath[k.upper()])
                    for k in cfg.model.item_graph_indx.split("_")]
    h.ui_graph = to_dgl(one_hop)
    h.ui_graph_adj = one_hop
    h.ui_subgraph_adj = None  # unused by Informax.forward
    h.ui_subgraph_adj_tensor = torch_sparse(
        (sub != 0).astype(np.float32).tocoo())
    h.ui_subgraph_adj_norm = torch.from_numpy(
        np.asarray(model.sub_norm)[:, None])
    ref = ref_mod.SMIN(h)
    with torch.no_grad():
        ref.user_embeds.copy_(j2t(params["user_embeds"]))
        ref.item_embeds.copy_(j2t(params["item_embeds"]))
        wi = 0
        for layers in ref.user_meta_layers:
            for lay in layers:
                lay.weight.copy_(j2t(params["u_conv_w"][wi]))
                wi += 1
        wi = 0
        for layers in ref.item_meta_layers:
            for lay in layers:
                lay.weight.copy_(j2t(params["i_conv_w"][wi]))
                wi += 1
        for p_ in ref.parameters():
            if p_.numel() == 1:  # every PReLU slope
                p_.copy_(j2t(params["prelu"]))
    set_linear(ref.semantic_user_attn.project[0], params["attn_u"]["l1"])
    set_linear(ref.semantic_item_attn.project[0], params["attn_i"]["l1"])
    with torch.no_grad():
        ref.semantic_user_attn.project[2].weight.copy_(
            j2t(params["attn_u"]["l2"]["w"]).T)
        ref.semantic_item_attn.project[2].weight.copy_(
            j2t(params["attn_i"]["l2"]["w"]).T)
    ref.eval()

    ru, ri = ref.forward()
    ju, ji = model.forward(params)
    assert_close(ru, ju, atol=3e-4, what="SMIN user embeds")
    assert_close(ri, ji, atol=3e-4, what="SMIN item embeds")

    _pin_perms(monkeypatch)
    n = 24
    ancs = rng.integers(0, n_users, n)
    poss = rng.integers(0, n_items, n)
    negs = rng.integers(0, n_items, n)
    ref.is_training = True
    rloss, rparts = ref.cal_loss((torch.from_numpy(ancs),
                                  torch.from_numpy(poss),
                                  torch.from_numpy(negs)))
    batch = {"user": jnp.asarray(ancs.astype(np.int32)),
             "pos": jnp.asarray(poss.astype(np.int32)),
             "neg": jnp.asarray(negs.astype(np.int32))}
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(3))
    for part in ("bpr_loss", "reg_loss", "informax_loss"):
        assert_close(rparts[part], jparts[part], rtol=2e-3, atol=3e-4,
                     what=f"SMIN {part}")
    assert_close(rloss, jloss, rtol=1e-3, what="SMIN total loss")


# ---------------------------------------------------------------------------
# DcRec (social)
# ---------------------------------------------------------------------------

def test_dcrec_social_parity():
    """keep_rate=1.0 disables augmentation on both sides (p=0 -> identity
    views), so towers, domain heads and all four loss components must agree."""
    from sslrec_tpu.ops import sparse as sparse_ops

    ui, trust = tiny_social(seed=9)
    n_users, n_items = ui.shape
    cfg = load_config("dcrec", overrides={
        "model.embedding_size": 16, "model.keep_rate": 1.0,
        "data.name": "synthetic"})
    data = social_data.bundle_from_matrices(cfg, ui, ui, trust)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.social.dcrec")
    configs["data"].update({"user_num": n_users, "item_num": n_items})
    configs["model"] = {
        "embedding_size": 16,
        "layer_num": int(cfg.model.layer_num),
        "reg_weight": float(cfg.model.reg_weight),
        "keep_rate": 1.0,
        "cross_weight": float(cfg.model.cross_weight),
        "domain_weight": float(cfg.model.domain_weight),
        "tau": float(cfg.model.tau),
    }
    h = _Handler()
    h.trn_mat = ui.tocsr()
    h.trust_mat = (trust != 0).astype(np.float64).tocsr()
    h.torch_adj = torch_sparse(sparse_ops.make_bi_adj(ui, n_users, n_items))
    h.torch_uu_adj = None  # unused by the reference forward
    ref = ref_mod.DcRec(h)
    with torch.no_grad():
        ref.ui_user_embeds.copy_(j2t(params["ui_user_embeds"]))
        ref.uu_user_embeds.copy_(j2t(params["uu_user_embeds"]))
        ref.ui_item_embeds.copy_(j2t(params["ui_item_embeds"]))
    set_linear(ref.ui_linear, params["ui_linear"])
    set_linear(ref.uu_linear, params["uu_linear"])

    # forward parity (base towers; eval path)
    ref.is_training = True
    routs = ref.forward(ref.adj, None, 1.0, h.trn_mat, h.trust_mat)
    ju, ji = model.generate(params)
    assert_close(routs[0], ju, what="DcRec user embeds")
    assert_close(routs[1], ji, what="DcRec item embeds")

    rng = np.random.default_rng(4)
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
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(5))
    for part in ("bpr_loss", "reg_loss", "domain_loss", "cross_loss"):
        assert_close(rparts[part], jparts[part], rtol=2e-4, atol=1e-5,
                     what=f"DcRec {part}")
    assert_close(rloss, jloss, rtol=2e-4, what="DcRec total loss")
