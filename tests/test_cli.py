"""End-to-end CLI coverage: ``python -m sslrec_tpu.main`` train mode and
test-from-checkpoint mode (reference ``main.py:9-72`` dispatch), driven
through ``main.main(argv)`` on a tiny on-disk general_cf dataset.

Pins the full entry contract the TPU queue relies on: --set typed coercion,
data.dir resolution, evidence-artifact writing (``results/<model>_<data>.json``
with config/seed/trajectory/finals), checkpoint saving, and checkpoint
evaluation.
"""

from __future__ import annotations

import glob
import json
import os
import pickle

import numpy as np
import scipy.sparse as sp


def _write_tiny_cf(root, n_users=60, n_items=40, seed=0):
    d = os.path.join(root, "general_cf", "tiny")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for fname, nnz in (("train_mat.pkl", 600), ("valid_mat.pkl", 120),
                       ("test_mat.pkl", 120)):
        r = rng.integers(0, n_users, nnz)
        c = rng.integers(0, n_items, nnz)
        m = sp.coo_matrix((np.ones(nnz, np.float32), (r, c)),
                          shape=(n_users, n_items))
        with open(os.path.join(d, fname), "wb") as f:
            pickle.dump(m.tocsr(), f)
    return d


def test_cli_train_and_checkpoint_eval(tmp_path, monkeypatch):
    from sslrec_tpu import main as cli

    data_root = tmp_path / "datasets"
    _write_tiny_cf(str(data_root))
    monkeypatch.chdir(tmp_path)  # results/, checkpoint/, log/ land here

    cli.main([
        "--model", "lightgcn", "--dataset", "tiny",
        "--data_dir", str(data_root),
        "--set", "train.epoch=3",
        "--set", "train.batch_size=32",
        "--set", "train.test_step=1",
        "--set", "train.save_model=true",
        "--set", "model.embedding_size=8",
        "--set", "test.batch_size=16",
    ])

    # evidence artifact: config + seed + trajectory + final metrics
    apath = tmp_path / "results" / "lightgcn_tiny.json"
    assert apath.exists()
    art = json.loads(apath.read_text())
    assert art["model"] == "lightgcn" and art["dataset"] == "tiny"
    assert len(art["trajectory"]) == 3
    assert art["test"] is not None and "recall" in art["test"]
    assert art["config"]["train"]["batch_size"] == 32  # --set coercion to int

    ckpts = glob.glob(str(tmp_path / "checkpoint" / "lightgcn" / "*.ckpt"))
    assert len(ckpts) == 1

    # test-from-checkpoint mode must evaluate without retraining
    cli.main([
        "--model", "lightgcn", "--dataset", "tiny",
        "--data_dir", str(data_root),
        "--set", f"train.pretrain_path={ckpts[0]}",
        "--set", "test.batch_size=16",
    ])


def test_cli_tune_mode(tmp_path, monkeypatch):
    """main() dispatches tune.enable to grid_search and the grid artifact is
    written (reference main.py:30-46 tune mode); list-valued --set overrides
    parse via YAML."""
    from sslrec_tpu import main as cli

    data_root = tmp_path / "datasets"
    _write_tiny_cf(str(data_root))
    monkeypatch.chdir(tmp_path)

    cli.main([
        "--model", "lightgcn", "--dataset", "tiny",
        "--data_dir", str(data_root),
        "--set", "tune.enable=true",
        "--set", "tune.hyperparameters=[layer_num]",
        "--set", "tune.layer_num=[1, 2]",
        "--set", "train.epoch=2",
        "--set", "train.batch_size=32",
        "--set", "model.embedding_size=8",
        "--set", "test.batch_size=16",
    ])

    art = json.loads((tmp_path / "results" / "lightgcn_tiny_tune.json").read_text())
    assert len(art["trials"]) == 2
    assert art["best"]["assignment"]["layer_num"] in (1, 2)
