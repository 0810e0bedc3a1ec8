"""Sequential family: handler parsing + model training smoke on synthetic TSVs."""

import numpy as np
import jax
import pytest

from sslrec_tpu.config import load_config
from sslrec_tpu.data import sequential as seq_data
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer
from sslrec_tpu.trainer.metrics import Evaluator


class _Silent:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


def _synthetic_seqs(n_users=40, n_items=30, seed=0):
    rng = np.random.default_rng(seed)
    trn_u, trn_s, trn_l = [], [], []
    tst_u, tst_s, tst_l = [], [], []
    for u in range(n_users):
        ln = int(rng.integers(3, 12))
        seq = list(rng.integers(1, n_items + 1, ln))
        trn_u.append(u)
        trn_s.append(seq[:-1])
        trn_l.append(seq[-1])
        tst_u.append(u)
        tst_s.append(seq)
        tst_l.append(int(rng.integers(1, n_items + 1)))
    return (trn_u, trn_s, trn_l), (tst_u, tst_s, tst_l)


SMALL = {
    "train.epoch": 2, "train.batch_size": 16, "train.test_step": 5,
    "test.batch_size": 8, "test.k": [3, 5],
    "model.embedding_size": 16, "model.max_seq_len": 10,
    "model.n_layers": 1, "model.n_heads": 2,
}


@pytest.mark.parametrize("name", ["bert4rec", "cl4srec", "duorec", "iclrec",
                                  "maerec", "dcrec_seq"])
def test_sequential_model_trains(name):
    overrides = dict(SMALL)
    if name == "iclrec":
        overrides["model.num_intent_clusters"] = 4
    if name == "dcrec_seq":
        overrides["model.sim_group_k"] = 2
    if name == "maerec":
        overrides.update({"model.con_batch": 8, "model.num_reco_neg": 4,
                          "model.num_mask_cand": 5, "model.mask_steps": 2,
                          "model.num_gcn_layers": 2, "model.num_trm_layers": 1})
    cfg = load_config(name, overrides=overrides)
    train, test = _synthetic_seqs()
    data = seq_data.bundle_from_seqs(cfg, train, test)
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
    ev = Evaluator(model, data.test, cfg)
    res = ev(params)
    for m, vals in res.items():
        assert np.isfinite(vals).all() and (vals >= 0).all(), (name, m, vals)


def test_bert4rec_masked_budget_equals_full_loss():
    """With budget >= masked count the gathered-position CE is exactly the
    all-position CE (unmasked positions only contribute ignore_index zeros)."""
    train, test = _synthetic_seqs()
    cfg_full = load_config("bert4rec", overrides=SMALL)
    cfg_k = load_config("bert4rec", overrides={**SMALL,
                                               "model.masked_budget": 10})
    data = seq_data.bundle_from_seqs(cfg_full, train, test)
    m_full = build_model(cfg_full, data)
    m_k = build_model(cfg_k, data)
    params = m_full.init_params(jax.random.PRNGKey(0))
    arr = data.extras["train_arrays"]
    batch = {"user": arr["user"][:16], "seq_last": arr["seq_last"][:16],
             "pos": arr["pos"][:16]}
    key = jax.random.PRNGKey(7)
    l_full, _ = m_full.loss(params, batch, key)
    l_k, _ = m_k.loss(params, batch, key)
    np.testing.assert_allclose(float(l_k), float(l_full), rtol=1e-6)


def test_handler_padding_and_stats():
    cfg = load_config("bert4rec", overrides=SMALL)
    train, test = _synthetic_seqs()
    data = seq_data.bundle_from_seqs(cfg, train, test)
    assert data.user_num == 40
    arr = data.extras["train_arrays"]
    assert arr["seq"].shape[1] == 10
    # seq_last windows end with the label item
    sl = np.asarray(arr["seq_last"])
    lasts = np.asarray(arr["pos"])
    np.testing.assert_array_equal(sl[:, -1], lasts)
    # ground truth is the single last item of each test row
    gt = data.test.ground_truth
    tu = np.asarray(data.test.test_users)
    assert all(np.asarray(gt.lengths)[tu] == 1)


def test_seq_aug_expansion():
    cfg = load_config("cl4srec", overrides=SMALL)  # cl4srec config has seq_aug
    train, test = _synthetic_seqs()
    data = seq_data.bundle_from_seqs(cfg, train, test)
    n_rows = sum(max(len(s) - 2, 0) + 1 for s in train[1])
    assert data.n_train == n_rows


def test_cl4srec_augment_ops():
    from sslrec_tpu.models import seq_augment
    import jax.numpy as jnp
    key = jax.random.PRNGKey(0)
    seqs = jnp.asarray([[0, 0, 1, 2, 3, 4, 5, 6],
                        [0, 0, 0, 0, 0, 0, 0, 9]], dtype=jnp.int32)
    v1, v2 = seq_augment.cl4srec_two_views(key, seqs, mask_token=99)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    # single-item row passes through
    np.testing.assert_array_equal(v1[1], np.asarray(seqs[1]))
    np.testing.assert_array_equal(v2[1], np.asarray(seqs[1]))
    # augmented rows remain valid: nonzero count <= original, ids in range
    for v in (v1[0], v2[0]):
        live = v[v != 0]
        assert all((1 <= x <= 6) or x == 99 for x in live)

    # crop keeps a contiguous end-offset window, right-aligned
    out, num_left = seq_augment.crop(key, seqs[:1], eta=0.5)
    out = np.asarray(out)[0]
    k = int(np.asarray(num_left)[0])
    assert (out[:-k] == 0).all() and (out[-k:] != 0).all()
