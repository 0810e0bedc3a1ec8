"""Numeric parity: JAX sequential models (MAERec, DCRec) vs the reference
torch implementations.  Randomised subsystems (path sampling, graph masking)
are covered by comparing their deterministic building blocks with identical
injected inputs; dropouts are disabled via eval()/deterministic flags."""

from __future__ import annotations

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from sslrec_tpu.config import load_config
from sslrec_tpu.data import sequential as seq_data
from sslrec_tpu.models.registry import build_model

from tests.parity.refshim import load_ref
from tests.parity.util import (assert_close, j2t, set_linear,
                               set_transformer_layer, t2j)


class _Obj:
    pass


def synthetic_seqs(n_users=30, n_items=20, max_ln=9, seed=0):
    """Sequences short enough that max_seq_len truncation is a no-op, so both
    sides build the i-i graph from identical pair sets."""
    rng = np.random.default_rng(seed)
    trn_u, trn_s, trn_l = [], [], []
    tst_u, tst_s, tst_l = [], [], []
    for u in range(n_users):
        ln = int(rng.integers(3, max_ln + 1))
        seq = list(int(x) for x in rng.integers(1, n_items + 1, ln))
        trn_u.append(u)
        trn_s.append(seq[:-1])
        trn_l.append(seq[-1])
        tst_u.append(u)
        tst_s.append(seq)
        tst_l.append(int(rng.integers(1, n_items + 1)))
    return (trn_u, trn_s, trn_l), (tst_u, tst_s, tst_l)


# ---------------------------------------------------------------------------
# MAERec
# ---------------------------------------------------------------------------

def test_maerec_parity():
    train, test = synthetic_seqs(seed=20)
    cfg = load_config("maerec", overrides={
        "model.embedding_size": 16, "model.max_seq_len": 10,
        "model.num_gcn_layers": 2, "model.num_trm_layers": 2,
        "model.num_attention_heads": 2, "model.con_batch": 8,
        "model.num_reco_neg": 4, "model.num_mask_cand": 5,
        "model.attention_probs_dropout_prob": 0.0,
        "model.hidden_dropout_prob": 0.0, "model.dropout_rate": 0.0,
        "data.name": "synthetic"})
    data = seq_data.bundle_from_seqs(cfg, train, test)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.sequential.maerec")
    configs["data"].update({"user_num": data.user_num,
                            "item_num": data.item_num})
    configs["model"] = dict(cfg.model)
    h = _Obj()
    h.train_dataloader = _Obj()
    h.train_dataloader.dataset = _Obj()
    h.train_dataloader.dataset.seqs = train[1]
    ref = ref_mod.MAERec(h)
    with torch.no_grad():
        ref.encoder.item_emb.copy_(j2t(params["item_emb"]))
        ref.emb_layer.position_emb.weight.copy_(j2t(params["emb"]["pos"]))
        for i, lay in enumerate(ref.transformer_layers):
            set_transformer_layer(lay, params["layers"][i])
    set_linear(ref.decoder.MLP[0], params["dec"]["l1"])
    set_linear(ref.decoder.MLP[2], params["dec"]["l2"])
    set_linear(ref.decoder.MLP[4], params["dec"]["l3"])
    ref.eval()

    # --- encoder parity on the full i-i graph
    r_sum, r_list = ref.encoder(ref.ii_adj)
    j_sum, j_list = model._encode_items(params, model.norm_vals)
    assert_close(r_sum, j_sum, atol=2e-4, what="MAERec encoder sum")
    for i, (re_, je_) in enumerate(zip(r_list, j_list)):
        assert_close(re_, je_, atol=2e-4, what=f"MAERec encoder layer {i}")

    # --- transformer forward on padded batches
    seq_table = np.asarray(data.extras["train_arrays"]["seq"])[:12]
    r_out = ref.forward(torch.from_numpy(seq_table.astype(np.int64)))
    j_out = model._seq_tower(params, jax.random.PRNGKey(0),
                             jnp.asarray(seq_table), j_sum, True)
    assert_close(r_out, j_out, atol=3e-4, what="MAERec transformer output")

    # --- full cal_loss with injected (item_emb, emb_list, pos, neg)
    rng = np.random.default_rng(4)
    n_pos = 8
    pos = rng.integers(1, data.item_num + 1, (n_pos, 2))
    neg = rng.integers(1, data.item_num + 1, (n_pos, 4, 2))
    last = np.asarray(data.extras["train_arrays"]["pos"])[:12]
    rloss, r_main, r_reco, r_regu = ref.cal_loss(
        (None, torch.from_numpy(seq_table.astype(np.int64)),
         torch.from_numpy(last.astype(np.int64))),
        r_sum, [e.detach() for e in r_list],
        torch.from_numpy(pos), torch.from_numpy(neg))

    logits = j_out @ j_sum.T
    logp = jax.nn.log_softmax(logits, -1)
    j_main = -jnp.mean(jnp.take_along_axis(
        logp, jnp.asarray(last.astype(np.int32))[:, None], 1)[:, 0])
    j_reco = model._decoder_loss(params, j_list, jnp.asarray(pos),
                                 jnp.asarray(neg)) * model.ssl_reg
    j_regu = sum(jnp.sum(jnp.square(x))
                 for x in jax.tree.leaves(params)) * model.reg
    assert_close(r_main, j_main, rtol=2e-4, what="MAERec main CE")
    assert_close(r_reco, j_reco, rtol=2e-4, what="MAERec decoder NCE")
    assert_close(r_regu, j_regu, rtol=2e-4, what="MAERec reg")
    assert_close(rloss, j_main + j_reco + j_regu, rtol=2e-4,
                 what="MAERec total loss")


# ---------------------------------------------------------------------------
# ICLRec
# ---------------------------------------------------------------------------

def test_iclrec_parity(monkeypatch):
    """Inject identical params/views/centroids into the reference ICLRec
    (``models/sequential/iclrec.py:138-337``) and the JAX model; the three loss
    components (binary CE rec, CL4SRec NCE, prototype PCL) must agree."""
    train, test = synthetic_seqs(n_users=24, n_items=22, max_ln=7, seed=40)
    cfg = load_config("iclrec", overrides={
        "model.embedding_size": 16, "model.max_seq_len": 8,
        "model.n_layers": 2, "model.n_heads": 2,
        "model.num_intent_clusters": 6, "model.dropout_rate": 0.0,
        "data.name": "synthetic"})
    data = seq_data.bundle_from_seqs(cfg, train, test)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.sequential.iclrec")
    configs["data"].update({"user_num": data.user_num,
                            "item_num": data.item_num})
    configs["model"] = dict(cfg.model)
    configs["train"].update({"batch_size": 12, "seed": 0})
    ref = ref_mod.ICLRec(None)
    with torch.no_grad():
        ref.emb_layer.token_emb.weight.copy_(j2t(params["emb"]["token"]))
        ref.emb_layer.position_emb.weight.copy_(j2t(params["emb"]["pos"]))
        for i, lay in enumerate(ref.transformer_layers):
            set_transformer_layer(lay, params["layers"][i])
    ref.eval()

    rng = np.random.default_rng(6)
    seq_table = np.asarray(data.extras["train_arrays"]["seq"])[:12]
    last = np.asarray(data.extras["train_arrays"]["pos"])[:12]
    negs = rng.integers(1, data.item_num + 1, 12)

    # pinned augmented views (the real augmentation is stochastic host/device
    # RNG on either side; parity is over the loss math given identical views)
    import sslrec_tpu.models.seq_augment as seq_aug
    v1, v2 = seq_aug.cl4srec_two_views(jax.random.PRNGKey(3),
                                       jnp.asarray(seq_table.astype(jnp.int32)),
                                       model.mask_token, eta=0.2, gamma=0.7,
                                       beta=0.2)
    v1_np, v2_np = np.asarray(v1), np.asarray(v2)
    monkeypatch.setattr(seq_aug, "cl4srec_two_views",
                        lambda *a, **k: (jnp.asarray(v1_np), jnp.asarray(v2_np)))
    monkeypatch.setattr(
        ref, "_cl4srec_aug",
        lambda seqs: (torch.from_numpy(v1_np.astype(np.int64)),
                      torch.from_numpy(v2_np.astype(np.int64))))

    # pinned centroids: raw for the L2 assignment (faiss index holds raw
    # centroids), L2-normalised for the PCL contrast (iclrec.py:122-137)
    cents_raw = rng.standard_normal((6, 16)).astype(np.float32)
    cents_n = cents_raw / np.linalg.norm(cents_raw, axis=1, keepdims=True)
    ref.cluster.centroids = torch.from_numpy(cents_n)

    def ref_query(x):
        d2 = ((x[:, None, :] - cents_raw[None, :, :]) ** 2).sum(-1)
        ids = torch.from_numpy(np.argmin(d2, axis=1))
        return ids, torch.from_numpy(cents_n)[ids]

    monkeypatch.setattr(ref.cluster, "query", ref_query)

    rloss, rparts = ref.cal_loss(
        (None, torch.from_numpy(seq_table.astype(np.int64)),
         torch.from_numpy(last.astype(np.int64)),
         torch.from_numpy(negs.astype(np.int64))))

    batch = {"seq": jnp.asarray(seq_table.astype(np.int32)),
             "pos": jnp.asarray(last.astype(np.int32)),
             "neg": jnp.asarray(negs.astype(np.int32)),
             "aux": {"centroids": jnp.asarray(cents_n),
                     "centroids_raw": jnp.asarray(cents_raw)}}
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(9))
    assert_close(rparts["rec_loss"], jparts["rec_loss"], rtol=2e-3, atol=3e-4,
                 what="ICLRec rec CE")
    assert_close(rparts["cl_loss"], jparts["cl_loss"], rtol=2e-3, atol=3e-4,
                 what="ICLRec CL4SRec NCE")
    assert_close(rparts["intent_cl_loss"], jparts["intent_cl_loss"], rtol=2e-3,
                 atol=3e-4, what="ICLRec prototype PCL")
    assert_close(rloss, jloss, rtol=2e-3, atol=5e-4, what="ICLRec total loss")


# ---------------------------------------------------------------------------
# DCRec (sequential)
# ---------------------------------------------------------------------------

def test_dcrec_seq_parity(monkeypatch):
    train, test = synthetic_seqs(n_users=20, n_items=24, max_ln=5, seed=30)
    cfg = load_config("dcrec_seq", overrides={
        "model.embedding_size": 16, "model.max_seq_len": 8,
        "model.n_layers": 2, "model.n_heads": 2, "model.sim_group_k": 3,
        "model.dropout_rate": 0.0, "model.graph_dropout_prob": 0.0,
        "data.name": "synthetic"})
    data = seq_data.bundle_from_seqs(cfg, train, test)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    ref_mod, configs = load_ref("models.sequential.dcrec_seq")
    configs["data"].update({"user_num": data.user_num,
                            "item_num": data.item_num})
    configs["model"] = dict(cfg.model)
    configs["train"]["batch_size"] = 16
    import dgl
    import pandas as pd

    def shim_graph(triple):
        rows, cols, vals = triple
        g = dgl.graph((np.asarray(cols), np.asarray(rows)),
                      num_nodes=model.n_items1)
        g.edata["w"] = torch.from_numpy(np.asarray(vals))
        return g

    # the reference neighbour readout subsamples sets larger than 10; keep the
    # tiny graph under that cap so full-mean readouts match exactly
    rows_np = np.asarray(model.adj[0])
    deg = np.bincount(rows_np, minlength=model.n_items1)
    assert deg.max() <= 10, "graph too dense for cap-free readout parity"

    uhist = {u: s for u, s in zip(train[0], train[1])}
    edges_a, edges_b = {}, {}
    for u, seq in uhist.items():
        a, b = [], []
        for i in range(len(seq)):
            if i > 0:
                a.append(seq[i]); b.append(seq[i - 1])
            if i + 1 < len(seq):
                a.append(seq[i]); b.append(seq[i + 1])
        edges_a[u] = np.asarray(a)
        edges_b[u] = np.asarray(b)
    user_edges = pd.DataFrame(
        {"item_edges_a": pd.Series(edges_a), "item_edges_b": pd.Series(edges_b)})

    h = _Obj()
    h.train_dataloader = _Obj()
    h.train_dataloader.dataset = _Obj()
    h.train_dataloader.dataset.adj_graph = shim_graph(model.adj)
    h.train_dataloader.dataset.sim_graph = shim_graph(model.sim)
    h.train_dataloader.dataset.user_edges = user_edges
    h.test_dataloader = _Obj()
    h.test_dataloader.dataset = _Obj()
    h.test_dataloader.dataset.adj_graph = shim_graph(model.adj_test)
    h.test_dataloader.dataset.sim_graph = shim_graph(model.sim_test)
    ref = ref_mod.DCRec_seq(h)
    with torch.no_grad():
        ref.emb_layer.token_emb.weight.copy_(j2t(params["emb"]["token"]))
        ref.emb_layer.position_emb.weight.copy_(j2t(params["emb"]["pos"]))
        for i, lay in enumerate(ref.transformer_layers):
            set_transformer_layer(lay, params["layers"][i])
        ref.attn_weights.copy_(j2t(params["attn_weights"]))
        ref.attn.copy_(j2t(params["attn"]))
        ref.layernorm.weight.copy_(j2t(params["gcn_ln"]["scale"]))
        ref.layernorm.bias.copy_(j2t(params["gcn_ln"]["bias"]))
    set_linear(ref.contrastive_learning_layer.fc1, params["cl_fc1"])
    set_linear(ref.contrastive_learning_layer.fc2, params["cl_fc2"])
    ref.eval()

    # --- GCN tower parity (adj + sim graphs)
    r_adj = ref.gcn_forward(ref.item_adjgraph)
    j_adj = model._gcn(params, jax.random.PRNGKey(0), model.adj,
                       model.ops_adj, deterministic=True)
    assert_close(r_adj, j_adj, atol=3e-4, what="DCRec adj GCN")
    r_sim = ref.gcn_forward(ref.item_simgraph)
    j_sim = model._gcn(params, jax.random.PRNGKey(0), model.sim,
                       model.ops_sim, deterministic=True)
    assert_close(r_sim, j_sim, atol=3e-4, what="DCRec sim GCN")

    # --- transformer forward
    seq_table = np.asarray(data.extras["train_arrays"]["seq"])[:12]
    r_out = ref.forward(torch.from_numpy(seq_table.astype(np.int64)))
    from sslrec_tpu.models import layers as L
    j_out = L.apply_transformer_tower(params, jax.random.PRNGKey(0),
                                      jnp.asarray(seq_table), model.n_heads,
                                      0.0, True)[:, -1]
    assert_close(r_out, j_out, atol=3e-4, what="DCRec transformer output")

    # --- full cal_loss with pinned KL reference samples
    nvals = np.sort(np.asarray(
        np.random.default_rng(5).standard_normal(12), np.float32))
    monkeypatch.setattr(
        torch, "normal",
        lambda mean, std, size=None, **kw: torch.from_numpy(
            (mean + std * nvals[: size[0] if size else len(nvals)])
            .astype(np.float32)))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), **kw: jnp.asarray(nvals[: shape[0]]))

    uids = np.asarray(data.extras["train_arrays"]["user"])[:12]
    last = np.asarray(data.extras["train_arrays"]["pos"])[:12]
    rloss, rparts = ref.cal_loss((torch.from_numpy(uids.astype(np.int64)),
                                  torch.from_numpy(seq_table.astype(np.int64)),
                                  torch.from_numpy(last.astype(np.int64))))
    batch = {"user": jnp.asarray(uids.astype(np.int32)),
             "seq": jnp.asarray(seq_table.astype(np.int32)),
             "pos": jnp.asarray(last.astype(np.int32))}
    jloss, jparts = model.loss(params, batch, jax.random.PRNGKey(9))
    assert_close(rparts["loss"], jparts["loss"], rtol=2e-3, atol=3e-4,
                 what="DCRec CE")
    assert_close(rparts["cl_loss"], jparts["cl_loss"], rtol=2e-3, atol=3e-4,
                 what="DCRec cl")
    assert_close(rparts["kl_loss"], jparts["kl_loss"], rtol=2e-3, atol=3e-4,
                 what="DCRec kl")
    assert_close(rloss, jloss, rtol=2e-3, atol=5e-4, what="DCRec total loss")
