"""Social family: motif algebra parity + MHCN/DSL training smoke."""

import numpy as np
import scipy.sparse as sp
import jax
import pytest

from sslrec_tpu.config import load_config
from sslrec_tpu.data import social as social_data
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer
from sslrec_tpu.trainer.metrics import Evaluator
from tests.conftest import random_ui_matrix


class _Silent:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


def _social_setup(seed=0):
    rng = np.random.default_rng(seed)
    trn = random_ui_matrix(50, 30, density=0.12, seed=seed)
    tst = random_ui_matrix(50, 30, density=0.04, seed=seed + 1)
    trust = sp.random(50, 50, density=0.1, random_state=rng,
                      data_rvs=lambda n: np.ones(n)).tocsr()
    trust.setdiag(0)
    trust.eliminate_zeros()
    trust = ((trust + sp.eye(50, format="csr") * 0) != 0).astype(np.float32)
    # ensure nonempty
    trust[0, 1] = 1.0
    return trn, tst, trust.tocsr()


def test_motif_adjacency_row_normalised():
    trn, _, trust = _social_setup()
    h_s, h_j, h_p = social_data.build_motif_adjacencies(trust, trn)
    for h in (h_s, h_j, h_p):
        assert h.shape == (50, 50)
        sums = np.asarray(h.tocsr().sum(axis=1)).reshape(-1)
        nz = sums[sums > 1e-9]
        np.testing.assert_allclose(nz, 1.0, rtol=1e-5)


def test_joint_adjacency_values():
    trn, _, _ = _social_setup()
    r = social_data.build_joint_adjacency(trn.tocoo())
    coo = trn.tocoo()
    udeg = np.asarray(coo.sum(axis=1)).reshape(-1)
    ideg = np.asarray(coo.sum(axis=0)).reshape(-1)
    got = r.tocsr()[coo.row[0], coo.col[0]]
    expect = 1.0 / np.sqrt(udeg[coo.row[0]] * ideg[coo.col[0]])
    np.testing.assert_allclose(got, expect, rtol=1e-6)


@pytest.mark.parametrize("name", ["mhcn", "dsl", "smin", "kcgn", "dcrec"])
def test_social_model_trains(name):
    trn, tst, trust = _social_setup()
    cfg = load_config(name, overrides={
        "train.epoch": 2, "train.batch_size": 64, "test.batch_size": 16,
        "test.k": [3, 5], "model.embedding_size": 8,
    })
    cat = sp.csr_matrix((np.eye(3)[np.arange(trn.shape[1]) % 3]).astype(np.float32))
    trn_time = None
    if name == "kcgn":
        rng = np.random.default_rng(5)
        coo = trn.tocoo()
        # ratings 1..3 and unix-ish times on the same sparsity
        trn = sp.coo_matrix((rng.integers(1, 4, coo.nnz).astype(np.float32),
                             (coo.row, coo.col)), coo.shape)
        trn_time = sp.coo_matrix(
            (rng.integers(1, 10_000_000, coo.nnz).astype(np.float64),
             (coo.row, coo.col)), coo.shape).tocsr()
    data = social_data.bundle_from_matrices(cfg, trn, tst, trust,
                                            category_mat=cat,
                                            trn_time=trn_time)
    model = build_model(cfg, data)
    trainer = Trainer(cfg, model, data, logger=_Silent())
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(1)
    for epoch in range(2):
        params, opt_state, aux = trainer.train_epoch(params, opt_state, key, epoch)
    aux = jax.device_get(aux)
    assert np.isfinite(aux["loss"]), (name, aux)
    res = Evaluator(model, data.test, cfg)(params)
    for m, vals in res.items():
        assert np.isfinite(vals).all(), (name, m, vals)
