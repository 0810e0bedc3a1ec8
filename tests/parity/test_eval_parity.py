"""Evaluation-protocol parity: our single Evaluator vs the reference's
``Metric.eval_at_one_forward`` (``trainer/metrics.py:137-184``) on the same
synthetic KG data with identical model scores.

The reference uses two protocols (per-batch ``full_predict`` vs one-forward
``generate``/``rating`` gated by ``test.eval_at_one_forward``); our Evaluator is
a single protocol that must reproduce both.  Here the one-forward path is pinned
numerically: a mock torch model returns the exact embeddings of the JAX model.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from sslrec_tpu.config import load_config
from sslrec_tpu.data import kg as kg_data
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.metrics import Evaluator
from tests.parity.refshim import load_ref
from tests.parity.util import j2t
from tests.test_models_kg import _synthetic_kg

K = (3, 5, 10)


class _RefModel:
    """Mock torch model carrying the JAX model's embeddings."""

    def __init__(self, user_emb, item_emb):
        self._u = j2t(user_emb)
        self._i = j2t(item_emb)

    def generate(self):
        return self._u, self._i

    def rating(self, batch_u_emb, all_i_emb):
        return batch_u_emb @ all_i_emb.T


class _RefDataset:
    def __init__(self, test_users, user_pos_lists, user_history_lists):
        self.test_users = test_users
        self.user_pos_lists = user_pos_lists
        self.user_history_lists = user_history_lists


class _RefLoader:
    """Minimal DataLoader stand-in: batches of test-user id tensors."""

    def __init__(self, dataset, batch_size):
        self.dataset = dataset
        self.batch_size = batch_size

    def __iter__(self):
        users = self.dataset.test_users
        for i in range(0, len(users), self.batch_size):
            yield torch.as_tensor(users[i: i + self.batch_size])


def test_one_forward_eval_parity():
    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg(seed=5)
    cfg = load_config("kgcl", overrides={
        "model.embedding_size": 16, "test.batch_size": 8,
        "test.k": list(K),
        "test.metrics": ["recall", "ndcg", "precision", "mrr"],
        "model.triplet_num": 5})
    data = kg_data.bundle_from_kg(cfg, train_cf, test_cf, trip, n_ent, n_rel)
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(3))
    ours = Evaluator(model, data.test, cfg)(params)

    user_emb, item_emb = model.generate(params)

    metrics_mod, configs = load_ref("trainer.metrics")
    configs["test"] = {"metrics": ["recall", "ndcg", "precision", "mrr"],
                       "k": list(K)}
    metric = metrics_mod.Metric()

    n_items = int(data.item_num)
    pos = {}
    for u, i in test_cf:
        pos.setdefault(int(u), []).append(int(i))
    hist = {}
    for u, i in train_cf:
        hist.setdefault(int(u), []).append(int(i))
    test_users = sorted(pos)
    ds = _RefDataset(test_users,
                     {u: pos[u] for u in test_users},
                     {u: hist.get(u, []) for u in test_users})
    loader = _RefLoader(ds, batch_size=8)
    ref = metric.eval_at_one_forward(_RefModel(user_emb, item_emb), loader)

    for m in ("recall", "ndcg", "precision", "mrr"):
        np.testing.assert_allclose(
            np.asarray(ours[m], np.float64), np.asarray(ref[m], np.float64),
            rtol=1e-5, atol=1e-7, err_msg=f"one-forward eval mismatch: {m}")
