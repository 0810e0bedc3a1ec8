"""Numeric parity: JAX KG models vs the reference torch implementations.

Same tiny synthetic KG, identical parameters injected into both sides,
forwards (generate) and loss components compared to ~1e-4 (VERDICT round-1
item 1).  Dropouts are disabled for determinism; randomized components
(edge masks, TransE negatives) are pinned via injected batches.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from sslrec_tpu.config import load_config
from sslrec_tpu.data import kg as kg_data
from sslrec_tpu.models.registry import build_model

from tests.parity.refshim import load_ref
from tests.parity.util import assert_close, j2t, set_linear, t2j


def tiny_kg(n_users=14, n_items=10, n_ents=16, n_rels=3, seed=0):
    """Raw CF pairs + expanded triplets matching kg_data.read_triplets math."""
    rng = np.random.default_rng(seed)
    train_cf, test_cf = [], []
    for u in range(n_users):
        items = rng.choice(n_items, 5, replace=False)
        for i in items[:3]:
            train_cf.append((u, i))
        for i in items[3:]:
            test_cf.append((u, i))
    raw = set()
    for _ in range(60):
        h_ = int(rng.integers(0, n_ents))
        if sum(1 for x in raw if x[0] == h_) >= 6:
            continue  # keep per-head degree <= 15 after inverse expansion
        raw.add((h_, int(rng.integers(0, n_rels)), int(rng.integers(0, n_ents))))
    # every entity appears as a head at least once (keeps segment means busy)
    for e in range(n_ents):
        raw.add((e, int(rng.integers(0, n_rels)), int(rng.integers(0, n_ents))))
    can = np.unique(np.asarray(sorted(raw), np.int64), axis=0)
    inv = can.copy()
    inv[:, 0], inv[:, 2] = can[:, 2], can[:, 0]
    inv[:, 1] = can[:, 1] + can[:, 1].max() + 1
    can = can.copy()
    can[:, 1] += 1
    inv[:, 1] += 1
    trip = np.concatenate([can, inv])
    n_entities = int(max(trip[:, 0].max(), trip[:, 2].max()) + 1)
    n_relations = int(trip[:, 1].max() + 1)
    return (np.asarray(train_cf, np.int64), np.asarray(test_cf, np.int64),
            trip, n_entities, n_relations)


def _bundle(name, overrides, seed=0):
    train_cf, test_cf, trip, n_ent, n_rel = tiny_kg(seed=seed)
    cfg = load_config(name, overrides=overrides)
    data = kg_data.bundle_from_kg(cfg, train_cf, test_cf, trip, n_ent, n_rel)
    return cfg, data, train_cf, trip, n_ent, n_rel


def _ref_configs(configs, cfg, data, extra_model=None):
    configs["data"].update({
        "user_num": data.user_num, "item_num": data.item_num,
        "entity_num": data.extras["entity_num"],
        "relation_num": data.extras["relation_num"],
        "node_num": data.extras["node_num"],
    })
    md = {k: v for k, v in dict(cfg.model).items()}
    if extra_model:
        md.update(extra_model)
    configs["model"] = md
    configs["train"] = dict(cfg.train)
    configs["test"] = dict(cfg.test)


class _Handler:
    pass


def _kg_edges_ref(trip):
    """Reference kg_edges rows are [h, t, r] (data_handler_kg.py:119-133)."""
    return np.stack([trip[:, 0], trip[:, 2], trip[:, 1]], axis=1).tolist()


# ---------------------------------------------------------------------------
# KGIN
# ---------------------------------------------------------------------------

def test_kgin_parity():
    cfg, data, train_cf, trip, n_ent, n_rel = _bundle("kgin", {
        "model.embedding_size": 16, "model.node_dropout": False,
        "model.mess_dropout": False, "model.triplet_num": 4096,
        "data.name": "synthetic"})
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.kg.kgin")
    _ref_configs(configs, cfg, data)
    h = _Handler()
    h.ui_edges = train_cf.tolist()
    h.kg_edges = _kg_edges_ref(trip)
    ref = ref_mod.KGIN(h)
    with torch.no_grad():
        ref.all_embed.copy_(j2t(params["all_embed"]))
        ref.latent_emb.copy_(j2t(params["latent_emb"]))
        ref.gcn.weight.copy_(j2t(params["weight"]))
        ref.gcn.disen_weight_att.copy_(j2t(params["disen_weight_att"]))
    ref.eval()

    ru, ri = ref.generate()
    ju, ji = model.generate(params)
    assert_close(ru, ju, what="KGIN user embeds")
    assert_close(ri, ji, what="KGIN item embeds")

    rng = np.random.default_rng(1)
    n = 24
    ancs = rng.integers(0, data.user_num, n)
    poss = rng.integers(0, data.item_num, n)
    negs = rng.integers(0, data.item_num, n)
    rloss, rparts = ref.cal_loss((torch.from_numpy(ancs),
                                  torch.from_numpy(poss),
                                  torch.from_numpy(negs)))
    batch = {"user": jnp.asarray(ancs.astype(np.int32)),
             "pos": jnp.asarray(poss.astype(np.int32)),
             "neg": jnp.asarray(negs.astype(np.int32))}
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(3))
    assert_close(rparts["rec_loss"], jparts["rec_loss"], what="KGIN rec")
    assert_close(rparts["reg_loss"], jparts["reg_loss"], what="KGIN reg")
    # reference logs the raw cor; its total uses sim_decay*cor (kgin.py:332-334)
    assert_close(rparts["cor"] * float(cfg.model.sim_regularity),
                 jparts["cor"], rtol=1e-3, what="KGIN cor")
    assert_close(rloss, jloss, rtol=2e-4, what="KGIN total loss")


# ---------------------------------------------------------------------------
# KGCL
# ---------------------------------------------------------------------------

def test_kgcl_parity():
    cfg, data, train_cf, trip, n_ent, n_rel = _bundle("kgcl", {
        "model.embedding_size": 16, "model.node_dropout": False,
        "model.mess_dropout": False, "model.triplet_num": 4096,
        "data.name": "synthetic"}, seed=4)
    # the reference samples 15 tails per head (kgcl.py:187-198); stay under it
    heads, counts = np.unique(trip[:, 0], return_counts=True)
    assert counts.max() <= 15, "tiny KG too dense for cap-free parity"
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.kg.kgcl")
    _ref_configs(configs, cfg, data)
    import scipy.sparse as sp
    trn = data.extras["train_mat_scipy"].tocoo()
    kg_dict = {}
    # feed the repo's (possibly reordered) capped edge list so both sides use
    # the identical edge set
    jh = np.asarray(data.extras["kg_heads"])
    jr = np.asarray(data.extras["kg_rels"])
    jt = np.asarray(data.extras["kg_tails"])
    for h_, r_, t_ in zip(jh, jr, jt):
        kg_dict.setdefault(int(h_), []).append((int(r_), int(t_)))
    h = _Handler()
    h.ui_mat = trn
    h.kg_dict = kg_dict
    ref = ref_mod.KGCL(h)
    with torch.no_grad():
        ref.all_embed.copy_(j2t(params["all_embed"]))
        ref.relation_embed.copy_(j2t(params["relation_embed"]))
    set_linear(ref.rgat.fc, params["rgat_fc"])
    ref.eval()

    # reference edge order comes from kg_dict iteration; rebuild the map from
    # reference edge position -> repo edge position to translate masks
    r_h = ref.edge_index[0].numpy()
    r_t = ref.edge_index[1].numpy()
    r_r = ref.edge_type.numpy()
    key_of = {(int(a), int(b), int(c)): i
              for i, (a, b, c) in enumerate(zip(jh, jr, jt))}
    ref2repo = np.asarray([key_of[(int(a), int(c), int(b))]
                           for a, b, c in zip(r_h, r_t, r_r)])
    assert len(ref2repo) == len(jh)

    ru, ri = ref.generate()
    ju, ji = model.generate(params)
    assert_close(ru, ju, atol=2e-4, what="KGCL user embeds")
    assert_close(ri, ji, atol=2e-4, what="KGCL item embeds")

    # --- loss parity with injected KG/UI views
    rng = np.random.default_rng(9)
    kg_m1 = (rng.random(len(jh)) < 0.6)
    kg_m2 = (rng.random(len(jh)) < 0.6)
    ui_m1 = (rng.random(trn.nnz) < 0.8)
    ui_m2 = (rng.random(trn.nnz) < 0.8)

    def ref_kg_view(mask_repo_order):
        m = mask_repo_order[ref2repo]
        return (ref.edge_index[:, torch.from_numpy(m)],
                ref.edge_type[torch.from_numpy(m)])

    def ref_ui_view(mask):
        mm = sp.coo_matrix((trn.data[mask], (trn.row[mask], trn.col[mask])),
                           shape=trn.shape)
        return ref._get_norm_adj_mat(mm)

    n = 24
    ancs = rng.integers(0, data.user_num, n)
    poss = rng.integers(0, data.item_num, n)
    negs = rng.integers(0, data.item_num, n)
    rloss, rparts = ref.cal_loss((
        torch.from_numpy(ancs), torch.from_numpy(poss), torch.from_numpy(negs),
        ref_kg_view(kg_m1), ref_kg_view(kg_m2),
        ref_ui_view(ui_m1), ref_ui_view(ui_m2)))

    bi = data.extras["bi_adj_maskable"]
    aux = {
        "kg_mask1": jnp.asarray(kg_m1.astype(np.float32)),
        "kg_mask2": jnp.asarray(kg_m2.astype(np.float32)),
        "ui_vals1": bi.view_vals(jnp.asarray(ui_m1.astype(np.float32))),
        "ui_vals2": bi.view_vals(jnp.asarray(ui_m2.astype(np.float32))),
    }
    batch = {"user": jnp.asarray(ancs.astype(np.int32)),
             "pos": jnp.asarray(poss.astype(np.int32)),
             "neg": jnp.asarray(negs.astype(np.int32)), "aux": aux}
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(3))
    assert_close(rparts["rec_loss"], jparts["rec_loss"], rtol=2e-4,
                 what="KGCL rec")
    assert_close(rparts["cl_loss"], jparts["cl_loss"], rtol=2e-3,
                 what="KGCL cl")
    assert_close(rloss, jloss, rtol=1e-3, what="KGCL total loss")

    # --- TransE objective parity
    kb = 16
    hh = rng.integers(0, n_ent, kb)
    rr = rng.integers(1, n_rel, kb)
    pt = rng.integers(0, n_ent, kb)
    nt = rng.integers(0, n_ent, kb)
    rkg = ref.cal_kg_loss((torch.from_numpy(hh), torch.from_numpy(rr),
                           torch.from_numpy(pt), torch.from_numpy(nt)))
    jkg = model.kg_loss(params, (jnp.asarray(hh.astype(np.int32)),
                                 jnp.asarray(rr.astype(np.int32)),
                                 jnp.asarray(pt.astype(np.int32)),
                                 jnp.asarray(nt.astype(np.int32))))
    assert_close(rkg, jkg, rtol=2e-4, what="KGCL TransE loss")


# ---------------------------------------------------------------------------
# KGRec — the loss is randomness-heavy (per-relation sampling, Gumbel top-k),
# so parity is asserted on its deterministic building blocks: the attentive
# GCN forward, rationale scores, the two CL towers, the contrast head (with a
# pinned permutation) and the MAE decoder.
# ---------------------------------------------------------------------------

def test_kgrec_parity(monkeypatch):
    cfg, data, train_cf, trip, n_ent, n_rel = _bundle("kgrec", {
        "model.embedding_size": 16, "model.mess_dropout": False,
        "model.triplet_num": 4096, "model.mae_msize": 8,
        "data.name": "synthetic"}, seed=6)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.kg.kgrec")
    _ref_configs(configs, cfg, data, extra_model={"samp_func": "torch"})
    h = _Handler()
    h.ui_mat = data.extras["train_mat_scipy"].tocsr()
    # feed the repo's edge order so masks translate 1:1
    h.kg_edges = np.stack([np.asarray(model.kg_heads),
                           np.asarray(model.kg_tails),
                           np.asarray(model.kg_rels)], axis=1).tolist()
    ref = ref_mod.KGRec(h)
    with torch.no_grad():
        ref.all_embed.copy_(j2t(params["all_embed"]))
        ref.gcn.relation_emb.copy_(j2t(params["relation_emb"]))
        ref.gcn.W_Q.copy_(j2t(params["w_q"]))
    set_linear(ref.contrast_fn.mlp1[0], params["cl_mlp1"][0])
    set_linear(ref.contrast_fn.mlp1[2], params["cl_mlp1"][1])
    set_linear(ref.contrast_fn.mlp2[0], params["cl_mlp2"][0])
    set_linear(ref.contrast_fn.mlp2[2], params["cl_mlp2"][1])
    ref.eval()

    # --- full forward
    ru, ri = ref.generate()
    ju, ji = model.generate(params)
    assert_close(ru, ju, atol=2e-4, what="KGRec user embeds")
    assert_close(ri, ji, atol=2e-4, what="KGRec item embeds")

    # --- rationale (norm attention) scores, all edges live
    item_emb_t = ref.all_embed[ref.n_users:]
    r_score = ref.gcn.norm_attn_computer(item_emb_t, ref.edge_index,
                                         ref.edge_type)
    live = jnp.ones((model.n_kg,), jnp.float32)
    j_score, _ = model._norm_attn(params, params["all_embed"][model.user_num:],
                                  live)
    assert_close(r_score, j_score, atol=2e-4, what="KGRec rationale scores")

    # --- CL towers on the full graphs
    r_ui = ref.gcn.forward_ui(ref.all_embed[: ref.n_users],
                              item_emb_t[: ref.n_items],
                              ref.inter_edge, ref.inter_edge_w,
                              mess_dropout=False)
    j_ui = model._forward_ui(params, model.ie_w)
    assert_close(r_ui, j_ui, atol=2e-4, what="KGRec UI tower")

    r_kg = ref.gcn.forward_kg(item_emb_t, ref.edge_index, ref.edge_type,
                              mess_dropout=False)[: ref.n_items]
    j_kg = model._forward_kg(params, live)
    assert_close(r_kg, j_kg, atol=2e-4, what="KGRec KG tower")

    # --- contrast head with pinned permutation
    monkeypatch.setattr(torch, "randperm",
                        lambda n, **kw: torch.arange(n - 1, -1, -1))
    monkeypatch.setattr(jax.random, "permutation",
                        lambda key, x, **kw: jnp.arange(x - 1, -1, -1))
    r_cl = ref.contrast_fn(r_ui, r_kg)
    j_cl = model._contrast(params, jax.random.PRNGKey(0), j_ui, j_kg)
    assert_close(r_cl, j_cl, rtol=2e-4, what="KGRec contrast")

    # --- MAE decoder on a fixed masked-edge subset
    rng = np.random.default_rng(2)
    ids = rng.choice(model.n_kg, 8, replace=False)
    pair = torch.stack([item_emb_t[ref.edge_index[0][ids]],
                        item_emb_t[ref.edge_index[1][ids]]], dim=1)
    redge = ref.gcn.relation_emb[ref.edge_type[ids] - 1]
    r_mae = ref.create_mae_loss(pair, redge)
    jh_ = model.kg_heads[jnp.asarray(ids)]
    jt_ = model.kg_tails[jnp.asarray(ids)]
    jr_ = params["relation_emb"][model.kg_rels[jnp.asarray(ids)] - 1]
    ent0 = params["all_embed"][model.user_num:]
    j_mae = jnp.mean(-jnp.log(jax.nn.sigmoid(
        jnp.sum(ent0[jt_] * jr_ * ent0[jh_], 1)) + 1e-12))
    assert_close(r_mae, j_mae, rtol=2e-4, what="KGRec MAE decoder")


# ---------------------------------------------------------------------------
# DiffKG — recommender forward + loss with an injected denoised KG, plus the
# diffusion machinery (Denoise MLP, q_sample, p_sample, SNR tables).
# ---------------------------------------------------------------------------

def test_diffkg_parity():
    cfg, data, train_cf, trip, n_ent, n_rel = _bundle("diffkg", {
        "model.embedding_size": 16, "model.mess_dropout_rate": 0.0,
        "model.triplet_num": 4096, "model.dims_list": [24],
        "model.d_emb_size": 6, "data.name": "synthetic"}, seed=8)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.kg.diffkg")
    _ref_configs(configs, cfg, data, extra_model={"dims": "[24]"})
    import scipy.sparse as sp
    trn = data.extras["train_mat_scipy"].tocsr()
    n_users, n_items = trn.shape

    # reference torch_adj: bi-directional sym-normalised with eps 1e-10
    # (data_handler_kg.py:193-226)
    a = sp.csr_matrix((n_users, n_users))
    b = sp.csr_matrix((n_items, n_items))
    mat = sp.vstack([sp.hstack([a, trn]), sp.hstack([trn.T, b])])
    mat = (mat != 0) * 1.0
    deg = np.array(mat.sum(axis=-1)) + 1e-10
    dis = np.reshape(np.power(deg, -0.5), [-1])
    dis[np.isinf(dis)] = 0.0
    dmat = sp.diags(dis)
    norm = mat.dot(dmat).transpose().dot(dmat).tocoo()
    from tests.parity.util import torch_sparse as _tsp
    h = _Handler()
    h.torch_adj = _tsp(norm)
    kg_dict = {}
    jh = np.asarray(model.heads)
    jr = np.asarray(model.rels)
    jt = np.asarray(model.tails)
    for h_, r_, t_ in zip(jh, jr, jt):
        kg_dict.setdefault(int(h_), []).append((int(r_), int(t_)))
    h.kg_dict = kg_dict
    ref = ref_mod.DiffKG(h)
    with torch.no_grad():
        ref.uEmbeds.copy_(j2t(params["u_embeds"]))
        ref.eEmbeds.copy_(j2t(params["e_embeds"]))
        ref.rEmbeds.copy_(j2t(params["r_embeds"]))
        ref.rgat.W.copy_(j2t(params["rgat_w"]))
    ref.eval()

    # --- forward on the base KG
    ru, ri = ref.forward(ref.adj, mess_dropout=False)
    ju, ji = model.forward(params, jax.random.PRNGKey(0))
    assert_close(ru, ju, atol=3e-4, what="DiffKG user embeds")
    assert_close(ri, ji, atol=3e-4, what="DiffKG entity embeds")

    # --- cal_loss with an injected denoised KG (random live subset)
    rng = np.random.default_rng(3)
    live = rng.random(len(jh)) < 0.5
    dh = jnp.asarray(jh.astype(np.int32))
    dt = jnp.asarray(jt.astype(np.int32))
    dr = jnp.asarray(jr.astype(np.int32))
    aux = {"dkg": (dh, dt, dr, jnp.asarray(live.astype(np.float32)))}
    ref_dkg = [torch.stack([torch.from_numpy(jh[live].astype(np.int64)),
                            torch.from_numpy(jt[live].astype(np.int64))]),
               torch.from_numpy(jr[live].astype(np.int64))]
    n = 24
    ancs = rng.integers(0, n_users, n)
    poss = rng.integers(0, n_items, n)
    negs = rng.integers(0, n_items, n)
    rloss, rparts = ref.cal_loss((torch.from_numpy(ancs),
                                  torch.from_numpy(poss),
                                  torch.from_numpy(negs)), ref_dkg)
    batch = {"user": jnp.asarray(ancs.astype(np.int32)),
             "pos": jnp.asarray(poss.astype(np.int32)),
             "neg": jnp.asarray(negs.astype(np.int32)), "aux": aux}
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(5))
    assert_close(rparts["bpr_loss"], jparts["bpr_loss"], rtol=2e-4,
                 what="DiffKG bpr")
    assert_close(rparts["reg_loss"], jparts["reg_loss"], rtol=2e-4,
                 what="DiffKG reg")
    assert_close(rparts["cl_loss"], jparts["cl_loss"], rtol=2e-3,
                 what="DiffKG cl")
    assert_close(rloss, jloss, rtol=1e-3, what="DiffKG total loss")

    # --- diffusion machinery
    dn = model._init_denoise(jax.random.PRNGKey(7))
    rdiff = ref_mod.GaussianDiffusion(model.noise_scale, model.noise_min,
                                      model.noise_max, model.steps)
    out_dims = [24, model.n_entities]
    rden = ref_mod.Denoise(list(reversed(out_dims)), out_dims,
                           model.d_emb_size, norm=True)
    with torch.no_grad():
        rden.emb_layer.weight.copy_(j2t(dn["emb"]["w"]).T)
        rden.emb_layer.bias.copy_(j2t(dn["emb"]["b"]))
        for rl, jl in zip(rden.in_layers, dn["in"]):
            rl.weight.copy_(j2t(jl["w"]).T)
            rl.bias.copy_(j2t(jl["b"]))
        for rl, jl in zip(rden.out_layers, dn["out"]):
            rl.weight.copy_(j2t(jl["w"]).T)
            rl.bias.copy_(j2t(jl["b"]))
    rden.eval()

    x0 = rng.random((6, model.n_entities)).astype(np.float32)
    ts = rng.integers(0, model.steps, 6)
    r_out = rden(torch.from_numpy(x0), torch.from_numpy(ts),
                 mess_dropout=False)
    j_out = model._denoise_apply(dn, jnp.asarray(x0), jnp.asarray(ts))
    assert_close(r_out, j_out, atol=2e-4, what="DiffKG denoise MLP")

    noise = rng.standard_normal((6, model.n_entities)).astype(np.float32)
    r_q = rdiff.q_sample(torch.from_numpy(x0), torch.from_numpy(ts),
                         torch.from_numpy(noise))
    j_q = model._q_sample(jnp.asarray(x0), jnp.asarray(ts), jnp.asarray(noise))
    assert_close(r_q, j_q, atol=2e-4, what="DiffKG q_sample")

    r_p = rdiff.p_sample(rden, torch.from_numpy(x0), model.sampling_steps)
    j_p = model._p_sample(dn, jnp.asarray(x0))
    assert_close(r_p, j_p, atol=3e-4, what="DiffKG p_sample")

    t_all = np.arange(model.steps)
    r_snr = rdiff.SNR(torch.from_numpy(t_all))
    j_snr = model._snr[jnp.asarray(t_all)]
    assert_close(r_snr, j_snr, rtol=1e-4, atol=1e-2, what="DiffKG SNR")
