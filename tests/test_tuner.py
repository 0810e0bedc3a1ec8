"""Grid-search tuner (counterpart of ``trainer/tuner.py:6-53``)."""

import numpy as np
import jax

from sslrec_tpu.config import load_config
from sslrec_tpu.trainer.tuner import trial_configs, grid_search
from tests.test_train_smoke import _make_bundle, _SilentLogger


class _RecordingLogger(_SilentLogger):
    def __init__(self):
        self.lines = []

    def log(self, msg, *a, **k):
        self.lines.append(str(msg))

    log_loss = _SilentLogger.log_loss
    log_eval = _SilentLogger.log_eval


def _tune_cfg():
    return load_config("lightgcn", overrides={
        "train.epoch": 3, "train.batch_size": 128, "train.test_step": 10,
        "test.batch_size": 16, "test.k": [5],
        "model.embedding_size": 8,
        "tune.enable": True,
        "tune.hyperparameters": ["layer_num", "reg_weight"],
        "tune.layer_num": [1, 2],
        "tune.reg_weight": [1e-7],
    })


def test_trial_configs_grid_product():
    cfg = _tune_cfg()
    trials = list(trial_configs(cfg))
    assert len(trials) == 2
    assignments = [a for _, a in trials]
    assert {a["layer_num"] for a in assignments} == {1, 2}
    # each variant carries its assignment merged into model.*
    for tcfg, a in trials:
        assert tcfg.model.layer_num == a["layer_num"]
        assert tcfg.model.reg_weight == a["reg_weight"]
        # untouched model keys survive the merge
        assert tcfg.model.embedding_size == 8


def test_grid_search_runs_and_picks_best():
    cfg = _tune_cfg()
    data = _make_bundle(5)
    logger = _RecordingLogger()
    score, assignment = grid_search(cfg, data, logger)
    assert np.isfinite(score) and score >= 0
    assert set(assignment) == {"layer_num", "reg_weight"}
    assert any("tune best" in ln for ln in logger.lines)
