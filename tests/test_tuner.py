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


def _parse_trial_scores(lines):
    out = {}
    for ln in lines:
        if ln.startswith("tune trial {") and "->" in ln:
            a, s = ln.split("->")
            out[a.replace("tune trial ", "").strip()] = float(s.split("=")[-1])
    return out


def test_vmapped_grid_search_matches_serial():
    """tune.parallel=K runs K trials in one vmapped program with per-trial
    scores matching the serial loop (same seed → same key sequence)."""
    data = _make_bundle(3)
    base = {
        "train.epoch": 4, "train.batch_size": 128, "train.test_step": 1,
        "train.patience": 2, "test.batch_size": 16, "test.k": [5],
        "model.embedding_size": 8, "model.cluster_num": 4,
        "model.epoch_period": 2, "model.layer_num": 2, "model.high_order": 1,
        "tune.enable": True,
        "tune.hyperparameters": ["temperature", "proto_weight"],
        "tune.temperature": [0.1, 1.0],
        "tune.proto_weight": [1.0e-6, 1.0e-2],
    }
    slog, vlog = _RecordingLogger(), _RecordingLogger()
    best_s = grid_search(load_config("ncl", overrides=base), data, slog)
    # parallel=3 over 4 trials: exercises the padded tail chunk
    best_v = grid_search(load_config("ncl", overrides={**base, "tune.parallel": 3}),
                         data, vlog)
    assert not any("falling back" in ln for ln in vlog.lines)
    ser, par = _parse_trial_scores(slog.lines), _parse_trial_scores(vlog.lines)
    assert set(ser) == set(par) and len(ser) == 4
    for a in ser:
        assert abs(ser[a] - par[a]) < 5e-3, (a, ser[a], par[a])
    assert abs(best_s[0] - best_v[0]) < 5e-3


def test_vmapped_grid_search_simgcl_eps_lane():
    """SimGCL's hparams() exposes eps (noise scale) as a traced lane scalar —
    this 4-trial cl_weight x eps grid lands in ONE structural group (layer_num
    is not tuned) and per-trial scores must match the serial loop, with eps
    riding a traced lane rather than forcing a recompile."""
    data = _make_bundle(6)
    base = {
        "train.epoch": 4, "train.batch_size": 128, "train.test_step": 1,
        "train.patience": 2, "test.batch_size": 16, "test.k": [5],
        "model.embedding_size": 8, "model.layer_num": 2,
        "tune.enable": True,
        "tune.hyperparameters": ["cl_weight", "eps"],
        "tune.cl_weight": [1.0e-2, 1.0e-1],
        "tune.eps": [0.1, 0.9],
    }
    slog, vlog = _RecordingLogger(), _RecordingLogger()
    best_s = grid_search(load_config("simgcl", overrides=base), data, slog)
    best_v = grid_search(load_config("simgcl", overrides={**base, "tune.parallel": 4}),
                         data, vlog)
    assert not any("falling back" in ln for ln in vlog.lines)
    ser, par = _parse_trial_scores(slog.lines), _parse_trial_scores(vlog.lines)
    assert set(ser) == set(par) and len(ser) == 4
    for a in ser:
        assert abs(ser[a] - par[a]) < 5e-3, (a, ser[a], par[a])
    # near-tied trials can legitimately flip the argmax between the serial and
    # vmapped paths; the contract is that the best *score* agrees
    assert abs(best_s[0] - best_v[0]) < 5e-3


def test_vmapped_grid_search_falls_back_without_vmap_benefit():
    # every trial lands in its own structural group (reg_weight has 1 value,
    # layer_num is structural) → vmapping buys nothing → serial fallback
    cfg = _tune_cfg().replace(tune={"parallel": 2})
    data = _make_bundle(5)
    logger = _RecordingLogger()
    score, assignment = grid_search(cfg, data, logger)
    assert np.isfinite(score)
    assert any("falling back" in ln for ln in logger.lines)


def test_vmapped_grid_search_structural_groups():
    """Tuned hypers outside hparams() (layer_num) group the trials; traceable
    ones (cl_weight) vmap within each group. Scores must match serial."""
    data = _make_bundle(4)
    base = {
        "train.epoch": 3, "train.batch_size": 128, "train.test_step": 1,
        "test.batch_size": 16, "test.k": [5],
        "model.embedding_size": 8, "model.hyper_num": 8,
        "tune.enable": True,
        "tune.hyperparameters": ["layer_num", "cl_weight"],
        "tune.layer_num": [1, 2],
        "tune.cl_weight": [0.01, 1.0],
    }
    slog, vlog = _RecordingLogger(), _RecordingLogger()
    grid_search(load_config("hccf", overrides=base), data, slog)
    grid_search(load_config("hccf", overrides={**base, "tune.parallel": 2}),
                data, vlog)
    assert not any("falling back" in ln for ln in vlog.lines)
    assert any("structural group" in ln for ln in vlog.lines)
    ser, par = _parse_trial_scores(slog.lines), _parse_trial_scores(vlog.lines)
    assert set(ser) == set(par) and len(ser) == 4
    for a in ser:
        assert abs(ser[a] - par[a]) < 5e-3, (a, ser[a], par[a])


def test_vmapped_grid_search_dccf_three_lanes():
    """Round-3 hook coverage: DCCF's hparams() exposes reg_weight, cl_weight
    and temperature, so the shipped-style grid (layer_num structural x 2
    traced lanes) vmaps into per-layer-count groups with per-trial scores
    matching the serial loop."""
    data = _make_bundle(7)
    base = {
        "train.epoch": 3, "train.batch_size": 128, "train.test_step": 1,
        "train.patience": 3, "test.batch_size": 16, "test.k": [5],
        "model.embedding_size": 8, "model.intent_num": 4,
        "tune.enable": True,
        "tune.hyperparameters": ["layer_num", "cl_weight", "temperature"],
        "tune.layer_num": [1, 2],
        "tune.cl_weight": [1.0e-3, 1.0e-1],
        "tune.temperature": [0.2],
    }
    slog, vlog = _RecordingLogger(), _RecordingLogger()
    best_s = grid_search(load_config("dccf", overrides=base), data, slog)
    best_v = grid_search(load_config("dccf", overrides={**base, "tune.parallel": 2}),
                         data, vlog)
    assert not any("falling back" in ln for ln in vlog.lines)
    assert any("2 structural group(s)" in ln for ln in vlog.lines)
    ser, par = _parse_trial_scores(slog.lines), _parse_trial_scores(vlog.lines)
    assert set(ser) == set(par) and len(ser) == 4
    for a in ser:
        assert abs(ser[a] - par[a]) < 5e-3, (a, ser[a], par[a])
    assert abs(best_s[0] - best_v[0]) < 5e-3


def test_structural_only_grid_falls_back_with_reason():
    """A grid over only structural hypers (KGIN tunes just layer_num) must
    fall back to the serial loop with a logged reason, not crash."""
    import scipy.sparse as sp
    from sslrec_tpu.data import kg as kg_data
    from tests.test_models_kg import _synthetic_kg

    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg()
    base = {
        "train.epoch": 2, "train.batch_size": 32, "train.test_step": 1,
        "train.patience": 2, "test.batch_size": 8, "test.k": [3],
        "model.embedding_size": 8, "model.triplet_num": 5,
        "tune.enable": True, "tune.parallel": 2,
        "tune.hyperparameters": ["layer_num"],
        "tune.layer_num": [1, 2],
    }
    cfg = load_config("kgin", overrides=base)
    data = kg_data.bundle_from_kg(cfg, train_cf, test_cf, trip, n_ent, n_rel)
    vlog = _RecordingLogger()
    best = grid_search(cfg, data, vlog)
    assert best is not None and np.isfinite(best[0])
    assert any("falling back" in ln for ln in vlog.lines)
