"""Multi-behavior family: handler normalisation + model training smoke."""

import numpy as np
import scipy.sparse as sp
import jax
import pytest

from sslrec_tpu.config import load_config
from sslrec_tpu.data import multi_behavior as mb_data
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer
from sslrec_tpu.trainer.metrics import Evaluator
from tests.conftest import random_ui_matrix


class _Silent:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


def _mb_setup(seed=0):
    behaviors = ["view", "cart", "buy"]
    mats = [random_ui_matrix(40, 25, density=d, seed=seed + i).tocsr()
            for i, d in enumerate([0.2, 0.1, 0.08])]
    # buy implies view (nesting like real data)
    mats[0] = ((mats[0] + mats[2]) != 0).astype(np.float32).tocsr()
    tst = random_ui_matrix(40, 25, density=0.04, seed=seed + 9)
    return behaviors, mats, tst


def test_normalize_rect_values():
    _, mats, _ = _mb_setup()
    norm = mb_data.normalize_rect(mats[0])
    coo = mats[0].tocoo()
    r = np.asarray(mats[0].sum(1)).reshape(-1)
    c = np.asarray(mats[0].sum(0)).reshape(-1)
    e = 0
    expect = coo.data[e] * (r[coo.row[e]] + 1e-8) ** -0.5 * (c[coo.col[e]] + 1e-8) ** -0.5
    got = norm.tocsr()[coo.row[e], coo.col[e]]
    np.testing.assert_allclose(got, expect, rtol=1e-6)


@pytest.mark.parametrize("name", ["hmgcr", "smbrec", "mbgmn", "cml", "kmclr"])
def test_mb_model_trains(name):
    behaviors, mats, tst = _mb_setup()
    overrides = {
        "train.epoch": 2, "train.batch_size": 32, "test.batch_size": 8,
        "test.k": [3, 5], "model.embedding_size": 8, "model.hidden_dim": 8,
    }
    if name == "cml":
        overrides.update({"train.meta_batch": 8, "train.SSL_batch": 4})
    kg_triplets = None
    if name == "kmclr":
        overrides.update({"model.latent_dim_rec": 8, "train.SSL_batch": 4,
                          "model.bpr_batch_size": 16})
        rng = np.random.default_rng(7)
        kg_triplets = np.stack([rng.integers(0, 25, 60),
                                rng.integers(0, 3, 60),
                                rng.integers(0, 40, 60)], 1).astype(np.int64)
    cfg = load_config(name, overrides=overrides)
    meta = mats if name == "hmgcr" else None  # reuse behavior mats as metapaths
    data = mb_data.bundle_from_behaviors(cfg, behaviors, mats, tst,
                                         meta_mats=meta,
                                         kg_triplets=kg_triplets)
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
    assert np.isfinite(aux["loss"]), (name, aux)
    res = Evaluator(model, data.test, cfg)(params)
    for m, vals in res.items():
        assert np.isfinite(vals).all(), (name, m, vals)


def test_loader_rejects_missing_required_behavior(tmp_path, monkeypatch):
    """Only the two known-missing dense matrices (tmall pv / ijcai click) may
    be absent; any other missing behavior pickle must raise, not silently
    retarget training (data/multi_behavior.py load)."""
    import pickle
    import pytest
    import scipy.sparse as sp
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data import multi_behavior as mb_data

    d = tmp_path / "multi_behavior" / "retail_rocket"
    d.mkdir(parents=True)
    m = sp.coo_matrix(np.ones((4, 5), np.float32))
    for name in ("train_mat_view", "train_mat_cart", "test_mat"):
        with open(d / f"{name}.pkl", "wb") as f:
            pickle.dump(m, f)  # train_mat_buy.pkl (the target) is missing
    cfg = load_config("smbrec", dataset="retail_rocket",
                      overrides={"data.dir": str(tmp_path)})
    with pytest.raises(FileNotFoundError, match="train_mat_buy"):
        mb_data.load(cfg)
