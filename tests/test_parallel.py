"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (SURVEY §4.4):
sharded computations must match their single-device references bit-for-bit
(within float tolerance)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from sslrec_tpu.parallel.mesh import make_mesh, pad_to_multiple
from sslrec_tpu.parallel.dist_train import (
    partition_graph, build_sharded_lightgcn_step, _owned_lookup)
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.ops.spmm import spmm
from sslrec_tpu.ops.topk import sharded_topk
from sslrec_tpu.models import losses
from tests.conftest import random_ui_matrix


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_partition_graph_covers_edges(tiny_ui):
    g = sparse_ops.from_scipy(sparse_ops.make_bi_adj(tiny_ui, *tiny_ui.shape))
    sg = partition_graph(g, tiny_ui.shape[0], tiny_ui.shape[1], n_model=2)
    live = np.asarray(sg.vals) != 0
    assert live.sum() == g.nnz


def test_owned_lookup_matches_gather(tiny_ui):
    mesh = make_mesh(n_data=1, n_model=4)
    n = 16
    table = jax.random.normal(jax.random.PRNGKey(0), (n * 4, 8))
    idx = jax.random.randint(jax.random.PRNGKey(1), (12,), 0, n * 4)

    def f(tab, idx):
        return _owned_lookup(tab, idx, n, "model")

    out = shard_map(f, mesh=mesh, in_specs=(P("model", None), P()),
                    out_specs=P(), check_rep=False)(table, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[idx]),
                               rtol=1e-6)


def test_sharded_step_matches_single_device(tiny_ui):
    """One TP×DP sharded LightGCN step == the equivalent single-device step."""
    n_users, n_items = tiny_ui.shape
    n_model, n_data = 2, 4
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    g = sparse_ops.from_scipy(sparse_ops.make_bi_adj(tiny_ui, *tiny_ui.shape))
    sg = partition_graph(g, n_users, n_items, n_model)
    opt = optax.adam(1e-2)
    shardings, train_step = build_sharded_lightgcn_step(
        mesh, sg, layer_num=2, reg_weight=1e-6, keep_rate=1.0, optimizer=opt)

    d = 8
    u_pad = sg.u_loc * n_model
    i_pad = sg.i_loc * n_model
    ku, ki = jax.random.split(jax.random.PRNGKey(0))
    u0 = jax.random.normal(ku, (u_pad, d)) * 0.1
    i0 = jax.random.normal(ki, (i_pad, d)) * 0.1
    # zero the padding rows so the reg term matches the unpadded reference
    u0 = u0.at[n_users:].set(0.0)
    i0 = i0.at[n_items:].set(0.0)
    params = {"user_embeds": jax.device_put(u0, shardings["user_embeds"]),
              "item_embeds": jax.device_put(i0, shardings["item_embeds"])}
    opt_state = opt.init(params)
    b = 8 * n_data
    rng = np.random.default_rng(0)
    batch = {
        "user": jnp.asarray(rng.integers(0, n_users, b), jnp.int32),
        "pos": jnp.asarray(rng.integers(0, n_items, b), jnp.int32),
        "neg": jnp.asarray(rng.integers(0, n_items, b), jnp.int32),
    }
    new_params, _, loss = train_step(params, opt_state, batch,
                                     jax.random.PRNGKey(3))

    # single-device reference with identical math
    def ref_loss(p):
        emb = jnp.concatenate([p["user_embeds"][:n_users],
                               p["item_embeds"][:n_items]], 0)
        acc = emb
        for _ in range(2):
            emb = spmm(g, emb)
            acc = acc + emb
        u, i = acc[:n_users], acc[n_users:]
        bpr = losses.bpr_loss(u[batch["user"]], i[batch["pos"]],
                              i[batch["neg"]]) / b
        reg = 1e-6 * (jnp.sum(p["user_embeds"]**2) + jnp.sum(p["item_embeds"]**2))
        return bpr + reg

    ref_params = {"user_embeds": u0, "item_embeds": i0}
    ref_l, ref_g = jax.value_and_grad(ref_loss)(ref_params)
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)

    upd, _ = opt.update(ref_g, opt.init(ref_params), ref_params)
    ref_new = optax.apply_updates(ref_params, upd)
    np.testing.assert_allclose(
        np.asarray(new_params["user_embeds"])[:n_users],
        np.asarray(ref_new["user_embeds"])[:n_users], rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(new_params["item_embeds"])[:n_items],
        np.asarray(ref_new["item_embeds"])[:n_items], rtol=2e-4, atol=2e-6)


def test_sharded_evaluator_matches_single_device():
    """Evaluator(mesh=...) — user batches split over the data axis — must
    produce exactly the single-device metrics."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.general_cf import bundle_from_matrices
    from sslrec_tpu.models.registry import build_model
    from sslrec_tpu.trainer.metrics import Evaluator

    trn = random_ui_matrix(60, 30, density=0.15, seed=0)
    tst = random_ui_matrix(60, 30, density=0.05, seed=1)
    data = bundle_from_matrices(trn, None, tst)
    cfg = load_config("lightgcn", overrides={
        "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 8,
        "test.metrics": ["recall", "ndcg", "precision", "mrr"],
    })
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    single = Evaluator(model, data.test, cfg)(params)
    mesh = make_mesh(n_data=4, n_model=1)
    sharded = Evaluator(model, data.test, cfg, mesh=mesh)(params)
    for m in single:
        np.testing.assert_allclose(sharded[m], single[m], rtol=1e-5)


def test_sharded_topk_matches_global():
    mesh = make_mesh(n_data=1, n_model=8)
    b, n_items = 6, 64
    scores = jax.random.normal(jax.random.PRNGKey(0), (b, n_items))
    shard = n_items // 8

    def f(s):
        off = jax.lax.axis_index("model") * shard
        return sharded_topk(s, off, 5, "model")

    out = shard_map(f, mesh=mesh, in_specs=(P(None, "model"),),
                    out_specs=P(), check_rep=False)(scores)
    _, ref = jax.lax.top_k(scores, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_partitioned_spmm_reusable_multi_view(tiny_ui):
    """partitioned_spmm/partitioned_propagate as a REUSABLE primitive: an
    SGL-style two-view propagation (per-view edge weights, mean combine)
    under shard_map matches the single-device spmm reference — demonstrating
    the partitioned layout serves propagations beyond the LightGCN step."""
    from sslrec_tpu.parallel.dist_train import partitioned_propagate

    n_users, n_items = tiny_ui.shape
    n_model = 2
    mesh = make_mesh(n_data=4, n_model=n_model)
    g = sparse_ops.from_scipy(sparse_ops.make_bi_adj(tiny_ui, *tiny_ui.shape))
    sg = partition_graph(g, n_users, n_items, n_model)

    d = 8
    u_pad = sg.u_loc * n_model
    i_pad = sg.i_loc * n_model
    ku, ki, kw = jax.random.split(jax.random.PRNGKey(3), 3)
    u_tab = jax.random.normal(ku, (u_pad, d))
    i_tab = jax.random.normal(ki, (i_pad, d))
    # two per-view edge weight vectors on the ORIGINAL edge order
    w1 = jax.random.uniform(kw, (g.nnz,))
    w2 = 1.0 - w1

    # per-view sharded values: rebuild the partition on view-weighted graphs
    g1 = sparse_ops.CooGraph(g.rows, g.cols, g.vals * w1, g.n_rows, g.n_cols)
    g2 = sparse_ops.CooGraph(g.rows, g.cols, g.vals * w2, g.n_rows, g.n_cols)
    sg1 = partition_graph(g1, n_users, n_items, n_model)
    sg2 = partition_graph(g2, n_users, n_items, n_model)

    from jax import lax

    def gather_rows(x):
        return lax.all_gather(x, "model").reshape(-1, x.shape[-1])

    def f(u, i, r1, c1, v1, r2, c2, v2):
        u1, i1 = partitioned_propagate(sg, u, i, r1[0], c1[0], v1[0],
                                       layer_num=2, combine="mean")
        u2, i2 = partitioned_propagate(sg, u, i, r2[0], c2[0], v2[0],
                                       layer_num=2, combine="mean")
        return gather_rows(u1 + u2), gather_rows(i1 + i2)

    out_u, out_i = shard_map(
        f, mesh=mesh,
        in_specs=(P("model", None), P("model", None),
                  P("model", None), P("model", None), P("model", None),
                  P("model", None), P("model", None), P("model", None)),
        out_specs=(P(), P()), check_rep=False)(
        u_tab, i_tab, sg1.local_rows, sg1.cols, sg1.vals,
        sg2.local_rows, sg2.cols, sg2.vals)

    # single-device reference: same math on the padded node space
    x0 = jnp.concatenate([u_tab, i_tab], axis=0)
    n_pad = u_pad + i_pad
    rows_p = jnp.where(g.rows < n_users, g.rows,
                       u_pad + (g.rows - n_users))
    cols_p = jnp.where(g.cols < n_users, g.cols,
                       u_pad + (g.cols - n_users))

    def ref_prop(w):
        order = jnp.argsort(rows_p, stable=True)
        gp = sparse_ops.CooGraph(rows_p[order], cols_p[order],
                                 (g.vals * w)[order], n_pad, n_pad)
        x, acc = x0, [x0]
        for _ in range(2):
            x = spmm(gp, x)
            acc.append(x)
        return sum(acc) / len(acc)

    ref = ref_prop(w1) + ref_prop(w2)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref[:u_pad]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref[u_pad:]),
                               rtol=2e-5, atol=2e-6)


def test_mesh_partitioned_propagate_entry(tiny_ui):
    """The jit-callable consumer entry (KGCL's UI propagation path):
    ``view_vals_partitioned`` maps original-order per-view values into the
    partitioned layout and ``mesh_partitioned_propagate`` (pad → shard_map
    hops → unpad) matches the single-device spmm reference on UNPADDED
    tables with mean combine."""
    from sslrec_tpu.parallel.dist_train import (
        mesh_partitioned_propagate, view_vals_partitioned)

    n_users, n_items = tiny_ui.shape
    mesh = make_mesh(n_data=2, n_model=4)
    g = sparse_ops.from_scipy(sparse_ops.make_bi_adj(tiny_ui, *tiny_ui.shape))
    ones = sparse_ops.CooGraph(g.rows, g.cols,
                               jnp.ones_like(g.vals), g.n_rows, g.n_cols)
    sg = partition_graph(ones, n_users, n_items, n_model=4)

    d = 8
    ku, ki, kw = jax.random.split(jax.random.PRNGKey(7), 3)
    u_x = jax.random.normal(ku, (n_users, d))
    i_x = jax.random.normal(ki, (n_items, d))
    vals = g.vals * jax.random.uniform(kw, (g.nnz,))  # per-view weights

    pv = view_vals_partitioned(sg, vals)
    live = np.asarray(sg.src_idx) >= 0
    assert int(live.sum()) == g.nnz
    np.testing.assert_allclose(np.asarray(pv)[live].sum(),
                               np.asarray(vals).sum(), rtol=1e-5)

    with mesh:
        out_u, out_i = jax.jit(
            lambda u, i, v: mesh_partitioned_propagate(
                mesh, sg, u, i, v, layer_num=2, combine="mean"))(u_x, i_x, pv)

    gp = sparse_ops.CooGraph(g.rows, g.cols, vals, g.n_rows, g.n_cols)
    x = jnp.concatenate([u_x, i_x], axis=0)
    acc = [x]
    for _ in range(2):
        x = spmm(gp, x)
        acc.append(x)
    ref = sum(acc) / len(acc)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref[:n_users]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref[n_users:]),
                               rtol=2e-5, atol=2e-6)


def test_kgcl_engages_partitioned_path():
    """KGCL under train.mesh with model>1 must actually build and use the
    partitioned layout (not fall back to replicated GSPMD edges) — the
    mesh-parity test alone can't catch a silent fallback."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data import kg as kg_data
    from sslrec_tpu.models.registry import build_model
    from tests.test_models_kg import _synthetic_kg

    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg(n_ents=34)
    cfg = load_config("kgcl", overrides={
        "model.embedding_size": 8,
        "train.mesh": {"data": 4, "model": 2}})
    data = kg_data.bundle_from_kg(cfg, train_cf, test_cf, trip, n_ent, n_rel)
    model = build_model(cfg, data)
    assert model._sg is not None and model._sg.n_model == 2
    cfg1 = load_config("kgcl", overrides={"model.embedding_size": 8})
    model1 = build_model(cfg1, kg_data.bundle_from_kg(
        cfg1, train_cf, test_cf, trip, n_ent, n_rel))
    assert model1._sg is None


@pytest.mark.parametrize("name", ["kgin", "diffkg"])
def test_kg_family_partitioned_generate_parity(name):
    """r5 (VERDICT r4 #4): KGIN and DiffKG engage the partitioned UI/interact
    propagation under ``train.mesh`` with model>1 (KGCL deployment pattern)
    and their deterministic ``generate()`` matches the single-device path."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data import kg as kg_data
    from sslrec_tpu.models.registry import build_model
    from tests.test_models_kg import _synthetic_kg

    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg(n_ents=34)
    ov = {"model.embedding_size": 8}
    cfg1 = load_config(name, overrides=ov)
    data1 = kg_data.bundle_from_kg(cfg1, train_cf, test_cf, trip, n_ent, n_rel)
    m1 = build_model(cfg1, data1)
    params = m1.init_params(jax.random.PRNGKey(3))
    u1, i1 = m1.generate(params)

    cfgm = load_config(name, overrides={**ov,
                                        "train.mesh": {"data": 2, "model": 2}})
    datam = kg_data.bundle_from_kg(cfgm, train_cf, test_cf, trip, n_ent, n_rel)
    mm = build_model(cfgm, datam)
    sg = next(s for s in (getattr(mm, a, None) for a in ("_sg_iu", "_sg"))
              if s is not None)
    assert sg.n_model == 2
    um, im = mm.generate(params)
    np.testing.assert_allclose(np.asarray(um), np.asarray(u1),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(im), np.asarray(i1),
                               rtol=2e-5, atol=2e-6)


def test_kgrec_partitioned_ui_tower_parity():
    """KGRec's rationale-weighted UI tower (``_forward_ui``) under the mesh:
    per-step ``ui_w`` rides the partitioned layout as concat([w, w]); output
    must match the single-device segment-op tower."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data import kg as kg_data
    from sslrec_tpu.models.registry import build_model
    from tests.test_models_kg import _synthetic_kg

    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg(n_ents=34)
    ov = {"model.embedding_size": 8}
    cfg1 = load_config("kgrec", overrides=ov)
    data1 = kg_data.bundle_from_kg(cfg1, train_cf, test_cf, trip, n_ent, n_rel)
    m1 = build_model(cfg1, data1)
    params = m1.init_params(jax.random.PRNGKey(3))
    ui_w = jax.random.uniform(jax.random.PRNGKey(9), (m1.n_ui,))
    out1 = m1._forward_ui(params, ui_w)

    cfgm = load_config("kgrec", overrides={**ov,
                                           "train.mesh": {"data": 2, "model": 2}})
    datam = kg_data.bundle_from_kg(cfgm, train_cf, test_cf, trip, n_ent, n_rel)
    mm = build_model(cfgm, datam)
    assert mm._sg_ui is not None and mm._sg_ui.n_model == 2
    outm = mm._forward_ui(params, ui_w)
    np.testing.assert_allclose(np.asarray(outm), np.asarray(out1),
                               rtol=2e-5, atol=2e-6)


def test_cml_partitioned_behavior_stacks_parity():
    """CML's per-behavior (A, AT) rect pairs run as one partitioned
    bidirectional hop per layer under the mesh; ``_gcn`` outputs must match
    the single-device spmm path."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data import multi_behavior as mb_data
    from sslrec_tpu.models.registry import build_model
    from tests.test_models_multi_behavior import _mb_setup

    behaviors, mats, tst = _mb_setup()
    ov = {"model.embedding_size": 8, "model.hidden_dim": 8,
          "train.meta_batch": 8, "train.SSL_batch": 4}
    cfg1 = load_config("cml", overrides=ov)
    data1 = mb_data.bundle_from_behaviors(cfg1, behaviors, mats, tst)
    m1 = build_model(cfg1, data1)
    params = m1.init_params(jax.random.PRNGKey(3))
    o1 = m1._gcn(params["gcn"])

    cfgm = load_config("cml", overrides={**ov,
                                         "train.mesh": {"data": 2, "model": 2}})
    datam = mb_data.bundle_from_behaviors(cfgm, behaviors, mats, tst)
    mm = build_model(cfgm, datam)
    assert mm._sg_beh is not None and len(mm._sg_beh) == len(behaviors)
    om = mm._gcn(params["gcn"])
    for a, b in zip(om, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("name", ["hmgcr", "smbrec", "kmclr"])
def test_mb_family_partitioned_forward_parity(name):
    """r5: HMGCR/SMBRec chained (A, AT) tower pairs
    (``maybe_partition_rect_pair``) and KMCLR's behavior stacks + KG-view
    LightGCN engage the partitioned layout under ``train.mesh`` and match the
    single-device forward."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data import multi_behavior as mb_data
    from sslrec_tpu.models.registry import build_model
    from tests.test_models_multi_behavior import _mb_setup

    behaviors, mats, tst = _mb_setup()
    ov = {"model.embedding_size": 8, "model.hidden_dim": 8,
          "train.SSL_batch": 4}
    kg_triplets = None
    meta = mats if name == "hmgcr" else None
    if name == "kmclr":
        ov.update({"model.latent_dim_rec": 8, "model.bpr_batch_size": 16})
        rng = np.random.default_rng(7)
        kg_triplets = np.stack([rng.integers(0, 25, 60),
                                rng.integers(0, 3, 60),
                                rng.integers(0, 40, 60)], 1).astype(np.int64)

    def build(extra):
        cfg = load_config(name, overrides={**ov, **extra})
        data = mb_data.bundle_from_behaviors(cfg, behaviors, mats, tst,
                                             meta_mats=meta,
                                             kg_triplets=kg_triplets)
        return build_model(cfg, data)

    m1 = build({})
    mm = build({"train.mesh": {"data": 2, "model": 2}})
    params = m1.init_params(jax.random.PRNGKey(3))

    if name == "kmclr":
        assert mm._sg_beh is not None and mm._sg_bi is not None
        o1 = list(m1._mb_gcn(params["mb"])) + list(m1._kg_computer(params["kg"]))
        om = list(mm._mb_gcn(params["mb"])) + list(mm._kg_computer(params["kg"]))
    else:
        assert mm._sgs is not None and len(mm._sgs) == len(mm.graphs)
        o1 = jax.tree.leaves(m1.forward(params))
        om = jax.tree.leaves(mm.forward(params))
    for a, b in zip(om, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_lightgcn_family_partitioned_propagate_parity():
    """r5: the LightGCN-family ``propagate`` engages the partitioned layout
    under train.mesh (covering SGL/SimGCL/NCL/DirectAU clean forwards) and
    matches the single-device spmm path; dropout rides a flat [nnz] mask."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.general_cf import bundle_from_matrices
    from sslrec_tpu.models.registry import build_model

    trn = random_ui_matrix(60, 30, density=0.15, seed=0)
    tst = random_ui_matrix(60, 30, density=0.05, seed=1)
    ov = {"model.embedding_size": 8}
    cfg1 = load_config("lightgcn", overrides=ov)
    m1 = build_model(cfg1, bundle_from_matrices(trn, None, tst))
    params = m1.init_params(jax.random.PRNGKey(3))
    u1, i1 = m1.propagate(params)

    cfgm = load_config("lightgcn",
                       overrides={**ov, "train.mesh": {"data": 2, "model": 2}})
    mm = build_model(cfgm, bundle_from_matrices(trn, None, tst))
    assert mm._sg is not None and mm._sg.n_model == 2
    um, im = mm.propagate(params)
    np.testing.assert_allclose(np.asarray(um), np.asarray(u1),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(im), np.asarray(i1),
                               rtol=2e-5, atol=2e-6)
    # weighted propagation (the dropout path) also matches
    w = jax.random.uniform(jax.random.PRNGKey(9), (mm._flat_vals.shape[0],))
    from sslrec_tpu.ops.spmm import spmm_layers
    emb = jnp.concatenate([params["user_embeds"], params["item_embeds"]], 0)
    ys = spmm_layers(m1.adj, emb, m1.layer_num, w)
    ref = emb + ys.sum(axis=0)
    um2, im2 = mm.propagate(params, edge_weight=w)
    np.testing.assert_allclose(np.asarray(um2), np.asarray(ref[:60]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(im2), np.asarray(ref[60:]),
                               rtol=2e-5, atol=2e-6)
