"""Golden-metric regression tests (SURVEY §4.3).

One representative model per scenario trains a fixed number of epochs from a
fixed seed on a deterministic synthetic dataset; the resulting metric vectors
must match the pinned values exactly (tight tolerance).  Unlike the smoke tests
(`isfinite`), these fail on any silent math regression in the loss/propagation/
metric stack.  Goldens were generated on the CPU backend this suite always runs
on (tests/conftest.py); regenerate with `python tests/test_golden_metrics.py`.
"""

import numpy as np
import jax
import pytest

from sslrec_tpu.config import load_config
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer
from sslrec_tpu.trainer.metrics import Evaluator
from tests.conftest import random_ui_matrix


class _Silent:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


def _train_eval(name, data, overrides, epochs=3):
    cfg = load_config(name, overrides={
        "train.epoch": epochs, "train.batch_size": 32,
        "test.batch_size": 16, "test.k": [3, 5],
        "model.embedding_size": 8, "train.log_loss": False,
        "train.save_model": False, **overrides})
    model = build_model(cfg, data)
    trainer = Trainer(cfg, model, data, logger=_Silent())
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = (model.init_opt_state(params)
                 if hasattr(model, "init_opt_state")
                 else trainer.optimizer.init(params))
    key = jax.random.PRNGKey(1)
    for epoch in range(epochs):
        key, ekey = jax.random.split(key)
        params, opt_state, _ = trainer.train_epoch(params, opt_state, ekey, epoch)
    res = Evaluator(model, data.test, cfg)(params)
    return {m: np.asarray(v, np.float64) for m, v in res.items()}


def _cf_data():
    from sslrec_tpu.data.general_cf import bundle_from_matrices
    trn = random_ui_matrix(50, 30, density=0.12, seed=7)
    tst = random_ui_matrix(50, 30, density=0.04, seed=8)
    return bundle_from_matrices(trn, None, tst)


def _seq_data(cfg):
    from sslrec_tpu.data.sequential import bundle_from_seqs
    from tests.test_models_sequential import _synthetic_seqs
    train, test = _synthetic_seqs(seed=3)
    return bundle_from_seqs(cfg, train, test)


def _social_data(cfg):
    import scipy.sparse as sp
    from sslrec_tpu.data import social as social_data
    rng = np.random.default_rng(11)
    trn = random_ui_matrix(50, 30, density=0.12, seed=11)
    tst = random_ui_matrix(50, 30, density=0.04, seed=12)
    trust = sp.random(50, 50, density=0.1, random_state=rng,
                      data_rvs=lambda n: np.ones(n)).tocsr()
    trust.setdiag(0)
    trust.eliminate_zeros()
    trust = (trust != 0).astype(np.float32)
    trust[0, 1] = 1.0
    return social_data.bundle_from_matrices(cfg, trn, tst, trust.tocsr())


def _kg_data(cfg):
    from sslrec_tpu.data import kg as kg_data
    from tests.test_models_kg import _synthetic_kg
    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg()
    return kg_data.bundle_from_kg(cfg, train_cf, test_cf, trip, n_ent, n_rel)


def _mb_data(cfg):
    import scipy.sparse as sp
    from sslrec_tpu.data import multi_behavior as mb
    mats = [random_ui_matrix(40, 30, density=d, seed=s)
            for d, s in ((0.15, 20), (0.08, 21), (0.05, 22))]
    tst = random_ui_matrix(40, 30, density=0.03, seed=23)
    return mb.bundle_from_behaviors(cfg, ["view", "cart", "buy"],
                                    [m.tocsr() for m in mats], tst.tocsr())


GOLDEN = {
    # scenario-representative models; values pinned from the fixed-seed run
    "bert4rec": {"recall": [0.10000000149011612, 0.15000000596046448], "ndcg": [0.0625, 0.08184263855218887]},
    "kgcl": {"recall": [0.1666666716337204, 0.28333333134651184], "ndcg": [0.14622841775417328, 0.2060529738664627]},
    "lightgcn": {"recall": [0.09333333373069763, 0.20666667819023132], "ndcg": [0.08285629004240036, 0.1410919427871704]},
    "mhcn": {"recall": [0.06066666543483734, 0.13233333826065063], "ndcg": [0.0686321035027504, 0.1016472727060318]},
    "smbrec": {"recall": [0.14666667580604553, 0.19249999523162842], "ndcg": [0.12520959973335266, 0.14548556506633759]},
}


def _compute(name):
    if name == "lightgcn":
        return _train_eval(name, _cf_data(), {})
    if name == "bert4rec":
        cfg = load_config(name, overrides={"model.max_seq_len": 10})
        return _train_eval(name, _seq_data(cfg), {"model.max_seq_len": 10})
    if name == "mhcn":
        cfg = load_config(name)
        return _train_eval(name, _social_data(cfg), {})
    if name == "kgcl":
        cfg = load_config(name, overrides={"model.triplet_num": 5})
        return _train_eval(name, _kg_data(cfg),
                           {"model.triplet_num": 5,
                            "train.kg_batch_size": 32})
    if name == "smbrec":
        cfg = load_config(name)
        return _train_eval(name, _mb_data(cfg), {})
    raise KeyError(name)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_metrics(name):
    got = _compute(name)
    want = GOLDEN[name]
    assert want["recall"] is not None, (
        f"golden for {name} not pinned — run `python tests/test_golden_metrics.py`"
        f" and paste the values")
    for metric in ("recall", "ndcg"):
        np.testing.assert_allclose(
            got[metric], np.asarray(want[metric]), rtol=5e-4, atol=1e-6,
            err_msg=f"{name} {metric} regressed (golden={want[metric]}, "
                    f"got={got[metric].tolist()})")


if __name__ == "__main__":
    for name in sorted(GOLDEN):
        res = _compute(name)
        print(f'    "{name}": {{"recall": {res["recall"].tolist()}, '
              f'"ndcg": {res["ndcg"].tolist()}}},')
