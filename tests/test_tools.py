"""Offline preprocessing CLI (counterpart of the reference's per-dataset
``datapreprocessing.py`` / ``statistic.py`` scripts) + the DataHandlerMF
loader variant."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
import scipy.sparse as sp

from sslrec_tpu.tools.preprocess import build_cooc_kg


def _beh_mats(seed=0):
    rng = np.random.default_rng(seed)
    mats = {}
    for beh, density in [("view", 0.25), ("cart", 0.12), ("buy", 0.06)]:
        m = (rng.random((40, 20)) < density).astype(np.float32)
        mats[beh] = sp.csr_matrix(m)
    return mats


def test_build_cooc_kg_matches_naive():
    mats = _beh_mats()
    triples = build_cooc_kg(list(mats.values()), threshold=2)
    # naive recomputation for one behavior: co-counts via dense algebra
    dense = mats["view"].toarray()
    cooc = dense.T @ dense
    expect = {(i, 0, j) for i, j in zip(*np.nonzero(cooc > 2))}
    got = {tuple(t) for t in triples[triples[:, 1] == 0]}
    assert got == expect
    # relation ids follow behavior order
    assert set(np.unique(triples[:, 1])) <= {0, 1, 2}


def test_preprocess_cli_roundtrip(tmp_path):
    d = str(tmp_path)
    for beh, m in _beh_mats().items():
        with open(os.path.join(d, f"train_mat_{beh}.pkl"), "wb") as f:
            pickle.dump(m, f)
    out = subprocess.run(
        [sys.executable, "-m", "sslrec_tpu.tools.preprocess", "kg",
         "--dir", d, "--behaviors", "view,cart,buy", "--threshold", "1"],
        capture_output=True, text=True, check=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert "wrote" in out.stdout
    kg = np.loadtxt(os.path.join(d, "kg.txt"), dtype=np.int64, ndmin=2)
    assert kg.shape[1] == 3 and kg.shape[0] > 0
    # stats subcommand runs over the same dir
    out = subprocess.run(
        [sys.executable, "-m", "sslrec_tpu.tools.preprocess", "stats",
         "--dir", d], capture_output=True, text=True, check=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert "train_mat_buy.pkl" in out.stdout and "nnz=" in out.stdout


def test_load_mf_variant(tmp_path):
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.registry import load_data

    d = tmp_path / "multi_behavior" / "retail_rocket"
    d.mkdir(parents=True)
    mats = _beh_mats(1)
    for beh, m in mats.items():
        with open(d / f"train_mat_{beh}.pkl", "wb") as f:
            pickle.dump(m, f)
    rng = np.random.default_rng(2)
    tst = sp.csr_matrix((rng.random((40, 20)) < 0.05).astype(np.float32))
    with open(d / "test_mat.pkl", "wb") as f:
        pickle.dump(tst, f)
    cfg = load_config("smbrec", dataset="retail_rocket", overrides={
        "data.dir": str(tmp_path), "data.type": "multi_behavior_mf"})
    data = load_data(cfg)
    assert data.user_num == 40 and data.item_num == 20
    assert int(data.n_train) == mats["buy"].nnz
    assert "behavior_graphs" not in data.extras
