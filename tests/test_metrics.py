"""Metric parity: device evaluator vs a numpy reimplementation of the reference
protocol (``trainer/metrics.py``), and hand-computed values."""

import numpy as np
import jax.numpy as jnp

from sslrec_tpu.config import Config
from sslrec_tpu.trainer.metrics import Evaluator, _batch_metric_sums


def _np_reference_metrics(topk, ground_truth, ks):
    """Reference math (trainer/metrics.py:11-55) in plain numpy."""
    n = len(ground_truth)
    r = np.zeros((n, topk.shape[1]))
    for i, gt in enumerate(ground_truth):
        r[i] = [1.0 if it in gt else 0.0 for it in topk[i]]
    out = {"recall": [], "ndcg": [], "precision": [], "mrr": []}
    for k in ks:
        rk = r[:, :k]
        right = rk.sum(1)
        recall_n = np.array([len(g) for g in ground_truth])
        out["recall"].append(np.sum(right / recall_n))
        out["precision"].append(np.sum(right) / k)
        out["mrr"].append(np.sum(rk * (1.0 / np.arange(1, k + 1))))
        test_matrix = np.zeros((n, k))
        for i, g in enumerate(ground_truth):
            test_matrix[i, :min(k, len(g))] = 1
        idcg = np.sum(test_matrix / np.log2(np.arange(2, k + 2)), axis=1)
        dcg = np.sum(rk / np.log2(np.arange(2, k + 2)), axis=1)
        idcg[idcg == 0] = 1.0
        out["ndcg"].append(np.sum(dcg / idcg))
    return {m: np.asarray(v) for m, v in out.items()}


def test_batch_metric_sums_parity():
    rng = np.random.default_rng(0)
    n_users, n_items, kmax, w = 17, 50, 10, 6
    topk = np.stack([rng.choice(n_items, kmax, replace=False) for _ in range(n_users)])
    ground_truth = [list(rng.choice(n_items, rng.integers(1, w), replace=False))
                    for _ in range(n_users)]
    gt_cols = np.zeros((n_users, w), np.int32)
    gt_mask = np.zeros((n_users, w), bool)
    gt_len = np.zeros((n_users,), np.int32)
    for i, g in enumerate(ground_truth):
        gt_cols[i, :len(g)] = g
        gt_mask[i, :len(g)] = True
        gt_len[i] = len(g)
    ks = (3, 5, 10)
    got = _batch_metric_sums(jnp.asarray(topk), jnp.asarray(gt_cols),
                             jnp.asarray(gt_mask), jnp.asarray(gt_len),
                             jnp.ones((n_users,), jnp.float32), ks)
    ref = _np_reference_metrics(topk, ground_truth, ks)
    for m in ref:
        np.testing.assert_allclose(np.asarray(got[m]), ref[m], rtol=1e-5,
                                   err_msg=m)


def test_evaluator_end_to_end(tiny_bundle):
    """Evaluator on a trivial 'model' whose scores are deterministic."""
    import jax

    class FakeModel:
        def __init__(self, data):
            self.data = data
            key = jax.random.PRNGKey(0)
            self.u = jax.random.normal(key, (data.user_num, 8))
            self.i = jax.random.normal(jax.random.PRNGKey(1), (data.item_num, 8))

        def generate(self, params):
            return self.u, self.i

        def rating(self, ue, ie):
            return ue @ ie.T

    data = tiny_bundle
    cfg = Config({"test": {"metrics": ["recall", "ndcg", "precision", "mrr"],
                           "k": [5, 10], "batch_size": 7}})
    model = FakeModel(data)
    ev = Evaluator(model, data.test, cfg)
    got = ev(None)

    # numpy reference: score, mask history, topk, metrics
    scores = np.asarray(model.u) @ np.asarray(model.i).T
    hist = data.test.history
    test_users = np.asarray(data.test.test_users)
    gt_cols = np.asarray(data.test.ground_truth.cols)
    gt_mask = np.asarray(data.test.ground_truth.mask)
    ground_truth = []
    topks = []
    for u in test_users:
        s = scores[u].copy()
        hc = np.asarray(hist.cols[u])[np.asarray(hist.mask[u])]
        s[hc] = -1e8
        order = np.argsort(-s, kind="stable")[:10]
        topks.append(order)
        ground_truth.append(list(gt_cols[u][gt_mask[u]]))
    ref = _np_reference_metrics(np.stack(topks), ground_truth, (5, 10))
    n = len(test_users)
    for m in got:
        np.testing.assert_allclose(got[m], ref[m] / n, rtol=1e-4, err_msg=m)


def test_blocked_topk_exact_vs_laxtopk():
    """topk_indices' blocked two-stage path (wide rows) must equal lax.top_k
    exactly, INCLUDING tie order (lower index wins, as in torch.topk)."""
    import jax
    from jax import lax
    from sslrec_tpu.ops.topk import topk_indices

    key = jax.random.PRNGKey(7)
    for b, n, k in [(5, 26822, 40), (3, 57001, 20), (2, 5000, 40)]:
        # heavy quantisation => many exact ties across and within blocks
        x = jnp.round(jax.random.normal(key, (b, n)) * 3.0)
        ref = lax.top_k(x, k)[1]
        # blocked path is opt-in as of r4 (plain lax.top_k measures 2.25x
        # faster on real eval shapes) — force it to keep its exactness pinned
        got = topk_indices(x, k, block=2048)
        assert got.shape == (b, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # narrow rows stay on the plain path and must still be exact
    x = jnp.round(jax.random.normal(key, (4, 300)))
    np.testing.assert_array_equal(np.asarray(topk_indices(x, 10)),
                                  np.asarray(lax.top_k(x, 10)[1]))


def test_packed_bitmask_path_matches_scatter_path(tiny_bundle):
    """The Evaluator's precomputed packed-bit history mask (default) and the
    per-batch scatter path (mask_bits_mb=0) must produce identical metrics —
    the bit path is a layout change, not a semantic one."""
    import jax

    class FakeModel:
        def __init__(self, data):
            self.item_num = data.item_num
            self.u = jax.random.normal(jax.random.PRNGKey(0), (data.user_num, 8))
            self.i = jax.random.normal(jax.random.PRNGKey(1), (data.item_num, 8))

        def generate(self, params):
            return self.u, self.i

        def rating(self, ue, ie):
            return ue @ ie.T

    data = tiny_bundle
    model = FakeModel(data)
    base = {"test": {"metrics": ["recall", "ndcg", "precision", "mrr"],
                     "k": [5, 10], "batch_size": 7}}
    ev_bits = Evaluator(model, data.test, Config(base))
    assert ev_bits._data[4] is not None, "bit path should be active"
    scatter_cfg = {"test": dict(base["test"], mask_bits_mb=0)}
    ev_scatter = Evaluator(model, data.test, Config(scatter_cfg))
    assert ev_scatter._data[4] is None, "scatter path should be active"
    a, b = ev_bits(None), ev_scatter(None)
    for m in a:
        np.testing.assert_allclose(a[m], b[m], rtol=1e-6, err_msg=m)


def test_blocked_topk_padding_never_outranks_neg_inf():
    """Advisor r4: the blocked path pads with the dtype's finite min, so a row
    containing REAL -inf scores could rank padding slots (index >= n) above
    them.  The merge stage must force padded candidates to -inf and resolve
    the tie to the real column."""
    import numpy as np
    import jax.numpy as jnp
    from sslrec_tpu.ops.topk import topk_indices

    n, k, block = 70, 4, 16           # nb=5, pad=10
    scores = np.full((2, n), -np.inf, np.float32)
    scores[0, 3] = 1.0                # one finite value, rest real -inf
    scores[1, [60, 65, 69]] = [2.0, 3.0, 1.0]
    idx = np.asarray(topk_indices(jnp.asarray(scores), k, block=block))
    assert (idx < n).all(), idx       # no padding index leaks
    assert idx[0, 0] == 3
    assert set(idx[1, :3].tolist()) == {60, 65, 69}
    # and exact agreement with the plain path on finite scores
    rng = np.random.default_rng(1)
    s = rng.normal(size=(3, n)).astype(np.float32)
    plain = np.asarray(topk_indices(jnp.asarray(s), k))
    blocked = np.asarray(topk_indices(jnp.asarray(s), k, block=block))
    assert (plain == blocked).all()


def test_compact_test_user_bitmask_matches_full():
    """r5 (VERDICT r4 #6): when the all-users bitmask exceeds the budget, the
    evaluator compacts it to unique TEST users + an id→row LUT (ijcai_15-scale
    fix).  Metrics must be identical across: full table, compacted table, and
    the scatter fallback (budget 0)."""
    import jax
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.general_cf import bundle_from_matrices
    from sslrec_tpu.models.registry import build_model
    from sslrec_tpu.trainer.metrics import Evaluator
    from tests.conftest import random_ui_matrix

    trn = random_ui_matrix(80, 40, density=0.15, seed=4)
    tst = random_ui_matrix(80, 40, density=0.03, seed=5).tolil()
    tst[40:] = 0                       # only half the users are test users
    tst = tst.tocsr()
    tst.eliminate_zeros()
    data = bundle_from_matrices(trn, None, tst)
    base = {"test.batch_size": 16, "test.k": [5, 10],
            "model.embedding_size": 8}
    cfg_full = load_config("lightgcn", overrides=base)
    model = build_model(cfg_full, data)
    params = model.init_params(jax.random.PRNGKey(0))
    ref = Evaluator(model, data.test, cfg_full)(params)

    # budget sized between compact-table and full-table footprints
    n_users = trn.shape[0]
    n_uniq = np.unique(np.asarray(data.test.test_users)).size
    assert n_uniq < n_users
    nw = -(-(model.item_num + 1) // 32)
    mb = (n_uniq * nw * 4 + (n_users - n_uniq) * nw * 2) / 2**20
    ev = Evaluator(model, data.test,
                   load_config("lightgcn", overrides={**base,
                                                      "test.mask_bits_mb": mb}))
    assert ev._data[5] is not None          # LUT engaged (compact path)
    compact = ev(params)
    scatter = Evaluator(model, data.test,
                        load_config("lightgcn",
                                    overrides={**base,
                                               "test.mask_bits_mb": 0}))(params)
    for m in ref:
        np.testing.assert_allclose(compact[m], ref[m], rtol=1e-6)
        np.testing.assert_allclose(scatter[m], ref[m], rtol=1e-6)
