"""Per-model smoke: every general-CF model trains 2 epochs on a tiny synthetic
bundle with finite losses and produces well-formed eval output."""

import numpy as np
import jax
import pytest

from sslrec_tpu.config import load_config
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer
from sslrec_tpu.trainer.metrics import Evaluator


class _Silent:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


SMALL = {
    "train.epoch": 2, "train.batch_size": 64, "train.test_step": 5,
    "train.patience": 0, "test.batch_size": 16, "test.k": [3, 5],
    "model.embedding_size": 8,
}

MODEL_OVERRIDES = {
    "hccf": {"model.hyper_num": 8},
    "dccf": {"model.intent_num": 8},
    "lightgcl": {"model.svd_q": 4},
    "ncl": {"model.cluster_num": 4, "tune.enable": False},
    "autocf": {"model.seed_num": 5, "model.fix_steps": 2},
    "gformer": {"model.anchor_set_num": 4, "model.fix_steps": 2},
}


@pytest.mark.parametrize("name", [
    "lightgcn", "sgl", "simgcl", "directau", "ncl", "hccf", "lightgcl", "dccf",
    "autocf", "adagcl", "gformer",
])
def test_model_trains(name, tiny_bundle):
    overrides = dict(SMALL)
    overrides.update(MODEL_OVERRIDES.get(name, {}))
    cfg = load_config(name, overrides=overrides)
    model = build_model(cfg, tiny_bundle)
    trainer = Trainer(cfg, model, tiny_bundle, logger=_Silent())
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = (model.init_opt_state(params)
                 if hasattr(model, "init_opt_state")
                 else trainer.optimizer.init(params))
    key = jax.random.PRNGKey(1)
    for epoch in range(2):
        params, opt_state, aux = trainer.train_epoch(params, opt_state, key, epoch)
    aux = jax.device_get(aux)
    assert np.isfinite(aux["loss"]), (name, aux)
    ev = Evaluator(model, tiny_bundle.test, cfg)
    res = ev(params)
    for m, vals in res.items():
        assert vals.shape == (2,)
        assert np.isfinite(vals).all(), (name, m, vals)
        assert (vals >= 0).all() and (vals <= 1.0 + 1e-6).all()


@pytest.mark.parametrize("aug", ["node_drop", "random_walk"])
def test_sgl_augmentation_variants(aug, tiny_bundle):
    """SGL's non-default augmentations: node_drop and the per-layer
    random_walk resample (a 2-D edge-weight stack through spmm_views)."""
    overrides = dict(SMALL)
    overrides["model.augmentation"] = aug
    cfg = load_config("sgl", overrides=overrides)
    model = build_model(cfg, tiny_bundle)
    trainer = Trainer(cfg, model, tiny_bundle, logger=_Silent())
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = trainer.optimizer.init(params)
    params, opt_state, aux = trainer.train_epoch(params, opt_state,
                                                 jax.random.PRNGKey(1), 0)
    assert np.isfinite(jax.device_get(aux)["loss"]), (aug, aux)
