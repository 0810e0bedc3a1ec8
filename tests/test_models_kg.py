"""KG family: handler parsing, maskable adjacency normalisation, KGCL smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sslrec_tpu.config import load_config
from sslrec_tpu.data import kg as kg_data
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer
from sslrec_tpu.trainer.metrics import Evaluator


class _Silent:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


def _synthetic_kg(n_users=30, n_items=20, n_ents=35, n_rels=3, seed=0):
    rng = np.random.default_rng(seed)
    train_cf, test_cf = [], []
    for u in range(n_users):
        items = rng.choice(n_items, 6, replace=False)
        for i in items[:4]:
            train_cf.append((u, i))
        for i in items[4:]:
            test_cf.append((u, i))
    raw = []
    for _ in range(120):
        raw.append((rng.integers(0, n_ents), rng.integers(0, n_rels),
                    rng.integers(0, n_ents)))
    raw = np.asarray(sorted(set(map(tuple, raw))), np.int64)
    trip, n_entities, n_relations = _expand(raw)
    return (np.asarray(train_cf, np.int64), np.asarray(test_cf, np.int64),
            trip, n_entities, n_relations)


def _expand(raw):
    """Inline the triplet expansion (matches kg_data.read_triplets math)."""
    can = np.unique(raw, axis=0)
    inv = can.copy()
    inv[:, 0] = can[:, 2]
    inv[:, 2] = can[:, 0]
    inv[:, 1] = can[:, 1] + can[:, 1].max() + 1
    can = can.copy()
    can[:, 1] += 1
    inv[:, 1] += 1
    trip = np.concatenate([can, inv])
    return trip, int(max(trip[:, 0].max(), trip[:, 2].max()) + 1), int(trip[:, 1].max() + 1)


def test_read_triplets_inverse_expansion(tmp_path):
    p = tmp_path / "kg_final.txt"
    np.savetxt(p, np.asarray([[0, 0, 1], [2, 1, 3]]), fmt="%d")
    trip, n_ent, n_rel = kg_data.read_triplets(str(p))
    assert len(trip) == 4
    # forward relations shifted +1; inverse offset by max+1 then +1
    assert set(trip[:, 1]) == {1, 2, 3, 4}
    assert n_ent == 4 and n_rel == 5
    # inverse triples swap head/tail
    fwd = {(h, t) for h, r, t in trip if r <= 2}
    inv = {(h, t) for h, r, t in trip if r > 2}
    assert inv == {(t, h) for h, t in fwd}


def test_maskable_bi_adj_matches_scipy():
    import scipy.sparse as sp
    from sslrec_tpu.ops.sparse import normalize_adj_sym
    rng = np.random.default_rng(0)
    ui = sp.random(10, 8, density=0.3, random_state=rng,
                   data_rvs=lambda n: np.ones(n)).tocoo()
    bi = kg_data.MaskableBiAdj(ui, 10, 8)
    vals = bi.view_vals(jnp.ones((bi.nnz_rect,), jnp.float32))
    # compare against scipy D^-1/2 A D^-1/2 with eps 1e-7
    a = sp.lil_matrix((18, 18))
    a[:10, 10:] = ui
    a[10:, :10] = ui.T
    deg = np.asarray(a.tocsr().sum(1)).reshape(-1) + 1e-7
    dinv = deg ** -0.5
    expect = sp.diags(dinv) @ a.tocsr() @ sp.diags(dinv)
    from sslrec_tpu.ops.spmm import spmm
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (18, 4)))
    got = np.asarray(spmm(bi.graph, jnp.asarray(x), edge_weight=vals))
    np.testing.assert_allclose(got, expect @ x, rtol=1e-4, atol=1e-5)
    # masking an edge zeroes its contribution and renormalises degrees
    m = jnp.ones((bi.nnz_rect,), jnp.float32).at[0].set(0.0)
    vals2 = bi.view_vals(m)
    assert float(jnp.sum(vals2 == 0.0)) >= 2  # both directions dropped


@pytest.mark.parametrize("name", ["kgcl", "kgin", "kgrec", "diffkg"])
def test_kg_model_trains(name):
    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg()
    overrides = {
        "train.epoch": 2, "train.batch_size": 32, "train.kg_batch_size": 32,
        "test.batch_size": 8, "test.k": [3, 5], "model.embedding_size": 8,
        "model.triplet_num": 5,
    }
    if name == "kgrec":
        overrides["model.mae_msize"] = 8
    if name == "diffkg":
        overrides.update({"model.dims_list": [16], "model.d_emb_size": 4})
    cfg = load_config(name, overrides=overrides)
    data = kg_data.bundle_from_kg(cfg, train_cf, test_cf, trip, n_ent, n_rel)
    model = build_model(cfg, data)
    trainer = Trainer(cfg, model, data, logger=_Silent())
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = (model.init_opt_state(params)
                 if hasattr(model, "init_opt_state")
                 else trainer.optimizer.init(params))
    key = jax.random.PRNGKey(1)
    for epoch in range(2):
        params, opt_state, aux = trainer.train_epoch(params, opt_state, key, epoch)
    aux = jax.device_get(aux)
    assert np.isfinite(aux["loss"]), aux
    res = Evaluator(model, data.test, cfg)(params)
    for me, vals in res.items():
        assert np.isfinite(vals).all(), (me, vals)


def test_kgcl_trans_suboptimizer():
    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg(seed=2)
    cfg = load_config("kgcl", overrides={
        "train.epoch": 1, "train.batch_size": 32, "train.kg_batch_size": 16,
        "test.batch_size": 8, "test.k": [3], "model.embedding_size": 8,
        "model.triplet_num": 5, "model.train_trans": True,
    })
    data = kg_data.bundle_from_kg(cfg, train_cf, test_cf, trip, n_ent, n_rel)
    model = build_model(cfg, data)
    trainer = Trainer(cfg, model, data, logger=_Silent())
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = (model.init_opt_state(params)
                 if hasattr(model, "init_opt_state")
                 else trainer.optimizer.init(params))
    params, opt_state, aux = trainer.train_epoch(params, opt_state,
                                                 jax.random.PRNGKey(1), 0)
    aux = jax.device_get(aux)
    assert "kg_loss" in aux and np.isfinite(aux["kg_loss"]), aux
