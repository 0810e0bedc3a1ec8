"""End-to-end integration: tiny synthetic dataset through train→eval (SURVEY §4.3).

LightGCN must beat a random scorer on held-out data after a few epochs — this
exercises the full pipeline (sampler, jitted epoch scan, optimiser, evaluator,
early stopping bookkeeping) on the CPU backend.
"""

import numpy as np
import jax

from sslrec_tpu.config import load_config
from sslrec_tpu.data.general_cf import bundle_from_matrices
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer
from sslrec_tpu.trainer.metrics import Evaluator
from tests.conftest import random_ui_matrix


class _SilentLogger:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


def _make_bundle(seed=0):
    # structured data: users prefer items with matching parity so there is signal
    rng = np.random.default_rng(seed)
    n_u, n_i = 80, 40
    rows, cols = [], []
    for u in range(n_u):
        liked = [i for i in range(n_i) if i % 2 == u % 2]
        pick = rng.choice(liked, size=12, replace=False)
        rows += [u] * len(pick)
        cols += list(pick)
    import scipy.sparse as sp
    full = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n_u, n_i))
    full = full.tocsr()
    trn = full.copy().tolil()
    tst = sp.lil_matrix(full.shape)
    for u in range(n_u):
        items = full[u].indices
        # hold out 3 random items (holding out e.g. the 3 largest ids would make
        # the test items systematically cold — held out by every user)
        held = rng.choice(items, size=3, replace=False)
        tst[u, held] = 1
        trn[u, held] = 0
    return bundle_from_matrices(trn.tocoo(), None, tst.tocoo())


def test_lightgcn_learns():
    data = _make_bundle()
    cfg = load_config("lightgcn", overrides={
        "train.epoch": 60, "train.batch_size": 256, "train.test_step": 20,
        "train.patience": 0, "test.batch_size": 32, "test.k": [5, 10],
        "model.embedding_size": 16, "model.keep_rate": 1.0,
        "optimizer.lr": 5.0e-3,
    })
    model = build_model(cfg, data)
    # random-params baseline
    ev = Evaluator(model, data.test, cfg)
    params0 = model.init_params(jax.random.PRNGKey(0))
    before = ev(params0)["recall"][0]
    trainer = Trainer(cfg, model, data, logger=_SilentLogger())
    best = trainer.train(params0)
    after = trainer.test_results["recall"][0]
    assert after > before + 0.05, (before, after)
    # parity-protocol sanity: recall@10 >= recall@5
    assert trainer.test_results["recall"][1] >= trainer.test_results["recall"][0]


def test_resume_roundtrip(tmp_path):
    """Mid-train save → resume restores params, optimizer state and epoch."""
    from sslrec_tpu.utils import checkpoint as ckpt
    import jax.numpy as jnp
    data = _make_bundle(3)
    cfg = load_config("lightgcn", overrides={
        "train.epoch": 4, "train.batch_size": 128, "train.test_step": 10,
        "test.batch_size": 16, "test.k": [3], "model.embedding_size": 8,
    })
    model = build_model(cfg, data)
    trainer = Trainer(cfg, model, data, logger=_SilentLogger())
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = trainer.optimizer.init(params)
    params, opt_state, _ = trainer.train_epoch(params, opt_state,
                                               jax.random.PRNGKey(1), 0)
    p = str(tmp_path / "state.ckpt")
    full_state = {"params": params, "opt_state": opt_state, "epoch": 0,
                  "best_params": params, "best_metric": 0.0, "wait": 0}
    ckpt.save(p, full_state)
    tmpl = {"params": model.init_params(jax.random.PRNGKey(9)),
            "opt_state": trainer.optimizer.init(params), "epoch": 0,
            "best_params": params, "best_metric": 0.0, "wait": 0}
    state = ckpt.load(p, tmpl)
    assert int(state["epoch"]) == 0
    for a, b in zip(jax.tree.leaves(state["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed trainer continues without error
    cfg2 = cfg.replace(train={"resume_path": p, "epoch": 2})
    trainer2 = Trainer(cfg2, model, data, logger=_SilentLogger())
    trainer2.train(model.init_params(jax.random.PRNGKey(0)))


def test_resume_is_bit_faithful(tmp_path):
    """A run resumed from epoch N consumes the identical per-epoch key stream
    (fold_in(root, epoch), not sequential splits) — so interrupt+resume
    produces bit-identical parameters to the uninterrupted run."""
    data = _make_bundle(3)
    base = {
        "train.epoch": 4, "train.batch_size": 128, "train.test_step": 1,
        "test.batch_size": 16, "test.k": [3], "model.embedding_size": 8,
        "train.save_model": False,
    }
    # uninterrupted 4-epoch run
    cfg = load_config("lightgcn", overrides=base)
    model = build_model(cfg, data)
    t_full = Trainer(cfg, model, data, logger=_SilentLogger())
    t_full.train()

    # same run, but saving state every 2 epochs, stopped after epoch 1...
    p = str(tmp_path / "mid")
    cfg_a = load_config("lightgcn", overrides={
        **base, "train.epoch": 2, "train.save_state_every": 2})
    t_a = Trainer(cfg_a, model, data, logger=_SilentLogger())
    import unittest.mock as mock
    with mock.patch.object(Trainer, "_ckpt_path", lambda self: p):
        t_a.train()
    # ...then resumed to the full epoch budget
    cfg_b = load_config("lightgcn", overrides={
        **base, "train.resume_path": p + ".state"})
    t_b = Trainer(cfg_b, model, data, logger=_SilentLogger())
    t_b.train()

    for a, b in zip(jax.tree.leaves(t_full.best_params),
                    jax.tree.leaves(t_b.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_chunk_matches_single_scan():
    """train.scan_chunk splits the epoch into bounded-length device calls; the
    RNG streams come from one prologue program so the step sequence (and hence
    the resulting parameters) must match the single-scan path exactly."""
    import jax.numpy as jnp
    data = _make_bundle(7)
    base = {
        "train.epoch": 1, "train.batch_size": 64, "test.batch_size": 16,
        "test.k": [5], "model.embedding_size": 8, "model.keep_rate": 1.0,
    }
    cfg_a = load_config("lightgcn", overrides=base)
    cfg_b = load_config("lightgcn", overrides=dict(base, **{"train.scan_chunk": 3}))
    model = build_model(cfg_a, data)
    params0 = model.init_params(jax.random.PRNGKey(0))
    outs = []
    for cfg in (cfg_a, cfg_b):
        tr = Trainer(cfg, model, data, logger=_SilentLogger())
        p = jax.tree.map(jnp.copy, params0)
        p, _, aux = tr.train_epoch(p, tr.optimizer.init(p), jax.random.PRNGKey(5), 0)
        outs.append((p, aux))
    (pa, aux_a), (pb, aux_b) = outs
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(float(aux_a["loss"]), float(aux_b["loss"]), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from sslrec_tpu.utils import checkpoint as ckpt
    data = _make_bundle(1)
    cfg = load_config("lightgcn", overrides={"model.embedding_size": 8})
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    p = tmp_path / "m.ckpt"
    ckpt.save(str(p), params)
    template = model.init_params(jax.random.PRNGKey(1))
    restored = ckpt.load(str(p), template)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
