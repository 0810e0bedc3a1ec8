"""Config-driven sharded training (``train.mesh``) vs single-device parity.

The mesh path is pure GSPMD: ``Trainer`` commits embedding-table rows to the
``model`` axis (``RecModel.param_shardings``) and constrains per-step batches to
the ``data`` axis; XLA inserts the collectives.  Sharding is semantics-preserving,
so an identically-seeded run must produce the same parameters and metrics as the
single-device run (within float tolerance).  Covers the LightGCN family and a KG
model (row-sharded ``all_embed``), per SURVEY §2.5 / the round-1 review.
"""

import numpy as np
import jax
import pytest

from sslrec_tpu.config import load_config
from sslrec_tpu.data import kg as kg_data
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer
from tests.conftest import random_ui_matrix
from tests.test_models_kg import _synthetic_kg


class _Silent:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


def _cf_bundle():
    from sslrec_tpu.data.general_cf import bundle_from_matrices
    trn = random_ui_matrix(64, 48, density=0.1, seed=4)
    val = random_ui_matrix(64, 48, density=0.03, seed=5)
    tst = random_ui_matrix(64, 48, density=0.03, seed=6)
    return bundle_from_matrices(trn, val, tst)


def _run(name, data, mesh: bool, extra=None):
    overrides = {
        "train.epoch": 2, "train.batch_size": 32, "train.test_step": 2,
        "train.patience": 10, "test.batch_size": 16, "test.k": [3, 5],
        "model.embedding_size": 8, "train.save_model": False,
        "train.log_loss": False,
    }
    overrides.update(extra or {})
    if mesh:
        overrides["train.mesh"] = {"data": 4, "model": 2}
    cfg = load_config(name, overrides=overrides)
    model = build_model(cfg, data)
    trainer = Trainer(cfg, model, data, logger=_Silent())
    best = trainer.train()
    return jax.device_get(best), trainer.test_results


def _assert_run_parity(name, data, extra=None):
    p0, r0 = _run(name, data, mesh=False, extra=extra)
    p1, r1 = _run(name, data, mesh=True, extra=extra)
    flat0 = jax.tree_util.tree_leaves_with_path(p0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(p1))
    for path, leaf in flat0:
        np.testing.assert_allclose(
            leaf, flat1[path], rtol=2e-4, atol=2e-5,
            err_msg=f"{name} param {jax.tree_util.keystr(path)}")
    for m in r0:
        np.testing.assert_allclose(np.asarray(r0[m]), np.asarray(r1[m]),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"{name} metric {m}")


@pytest.mark.parametrize("name", ["lightgcn", "sgl"])
def test_mesh_parity_cf(name):
    _assert_run_parity(name, _cf_bundle())


def test_mesh_parity_kg():
    # n_ents=34 → node space (30 users + 34 entities) is even, so the
    # [n_nodes, d] all_embed table actually row-shards over model=2
    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg(n_ents=34)
    assert (30 + n_ent) % 2 == 0
    cfg = load_config("kgcl", overrides={"model.embedding_size": 8})
    data = kg_data.bundle_from_kg(cfg, train_cf, test_cf, trip, n_ent, n_rel)
    model = build_model(cfg, data)
    from sslrec_tpu.parallel.mesh import make_mesh
    sh = model.param_shardings(make_mesh(4, 2),
                               model.init_params(jax.random.PRNGKey(0)))
    assert sh["all_embed"].spec == jax.sharding.PartitionSpec("model")
    _assert_run_parity("kgcl", data,
                       extra={"train.kg_batch_size": 32, "model.triplet_num": 5})


def test_distributed_init_gate(monkeypatch):
    """maybe_distributed_init is a no-op unless explicitly configured, and
    forwards the cluster spec to jax.distributed.initialize when it is."""
    from sslrec_tpu.parallel import mesh as mesh_mod

    for var in ("SSLREC_COORDINATOR", "SSLREC_NUM_PROCESSES",
                "SSLREC_PROCESS_ID", "SSLREC_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    cfg = load_config("lightgcn")
    assert mesh_mod.maybe_distributed_init(cfg) is False

    calls = {}
    monkeypatch.setattr(mesh_mod, "_DIST_INITIALIZED", False)
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    monkeypatch.setenv("SSLREC_COORDINATOR", "host0:1234")
    monkeypatch.setenv("SSLREC_NUM_PROCESSES", "2")
    monkeypatch.setenv("SSLREC_PROCESS_ID", "1")
    assert mesh_mod.maybe_distributed_init(cfg) is True
    assert calls == {"coordinator_address": "host0:1234",
                     "num_processes": 2, "process_id": 1}
    # idempotent: a second call does not re-initialize
    calls.clear()
    assert mesh_mod.maybe_distributed_init(cfg) is True
    assert calls == {}
    monkeypatch.setattr(mesh_mod, "_DIST_INITIALIZED", False)


def test_mesh_params_actually_sharded():
    """The committed user table really lives row-sharded on the model axis."""
    data = _cf_bundle()
    cfg = load_config("lightgcn", overrides={
        "model.embedding_size": 8,
        "train.mesh": {"data": 4, "model": 2}})
    model = build_model(cfg, data)
    trainer = Trainer(cfg, model, data, logger=_Silent())
    params = model.init_params(jax.random.PRNGKey(0))
    sh = model.param_shardings(trainer.mesh, params)
    assert sh["user_embeds"].spec == jax.sharding.PartitionSpec("model")
    placed = jax.device_put(params, sh)
    shard_shapes = {s.data.shape for s in placed["user_embeds"].addressable_shards}
    assert shard_shapes == {(data.user_num // 2, 8)}


def test_distributed_init_requires_full_spec(monkeypatch):
    """A coordinator without num_processes/process_id must fail with a clear
    error, not TypeError int(None)."""
    import pytest
    from sslrec_tpu.parallel import mesh as mesh_mod

    for var in ("SSLREC_NUM_PROCESSES", "SSLREC_PROCESS_ID",
                "SSLREC_DISTRIBUTED"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(mesh_mod, "_DIST_INITIALIZED", False)
    monkeypatch.setenv("SSLREC_COORDINATOR", "host0:1234")
    with pytest.raises(ValueError, match="num_processes"):
        mesh_mod.maybe_distributed_init(load_config("lightgcn"))
    monkeypatch.setattr(mesh_mod, "_DIST_INITIALIZED", False)


# ---- round-3 coverage: sequential / social / multi-behavior + degenerate
# meshes (8x1 and 1x8 are where axis-collapse sharding bugs usually hide)


def test_mesh_parity_degenerate_axes():
    """8x1 and 1x8 meshes must both reproduce the single-device run
    (degenerate axes exercise GSPMD's all-replicated and fully-model-sharded
    corners, where axis-collapse bugs usually hide)."""
    data = _cf_bundle()
    for mesh_shape in ({"data": 8, "model": 1}, {"data": 1, "model": 8}):
        p0, r0 = _run("lightgcn", data, mesh=False)
        p1, r1 = _run("lightgcn", data, mesh=True,
                      extra={"train.mesh": mesh_shape})
        for m in r0:
            np.testing.assert_allclose(np.asarray(r0[m]), np.asarray(r1[m]),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"mesh {mesh_shape} metric {m}")


def test_mesh_parity_sequential_bert4rec():
    """Sequential family under the mesh: BERT4Rec's vocab table [n_items+2, d]
    is not an exact row-space match, so this is the pure-DP path — batches
    split over 'data', params replicated."""
    from sslrec_tpu.data import sequential as seq_data
    from tests.test_models_sequential import _synthetic_seqs, SMALL

    overrides = dict(SMALL)
    overrides.update({"train.save_model": False, "train.log_loss": False,
                      "train.batch_size": 16, "train.epoch": 2,
                      "train.test_step": 2, "train.patience": 10})
    cfg = load_config("bert4rec", overrides=overrides)
    train, test = _synthetic_seqs()
    data = seq_data.bundle_from_seqs(cfg, train, test)
    _assert_run_parity("bert4rec", data, extra=overrides)


def test_mesh_parity_social_mhcn():
    """Social family under the mesh: motif hypergraph propagation with the
    [n_users, d] table row-sharded over 'model' (96 % 2 == 0)."""
    from tests.test_learning import _social_bundle, _mhcn_cfg

    data = _social_bundle(_mhcn_cfg(0.01))
    _assert_run_parity("mhcn", data, extra={"model.ss_rate": 0.01})


def test_mesh_parity_mb_cml():
    """Multi-behavior family under the mesh: CML's model-managed three-phase
    train_step (three optimizers inside one jitted scan) under GSPMD — the
    family with the largest real tables (ijcai_15: 423k users) had zero
    sharding evidence before this test."""
    from tests.test_learning import _mb_bundle, _cml_cfg

    cfg = _cml_cfg(0.02)
    data = _mb_bundle(cfg)
    _assert_run_parity("cml", data, extra={
        "train.beta": 0.02, "train.batch_size": 32,
        "optimizer.opt_base_lr": 5.0e-3, "optimizer.opt_max_lr": 2.0e-2})
