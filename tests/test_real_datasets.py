"""Real-dataset handler checks (CPU; skipped when the reference snapshot's
files are absent — several scenarios ship incomplete data)."""

import os

import numpy as np
import pytest

from sslrec_tpu.config import load_config

_ROOT = "/root/reference/datasets"


def _has(*parts):
    return os.path.exists(os.path.join(_ROOT, *parts))


@pytest.mark.skipif(not _has("general_cf", "sparse_gowalla", "train_mat.pkl"),
                    reason="gowalla pickles absent")
def test_gowalla_loads():
    from sslrec_tpu.data.general_cf import load
    cfg = load_config("lightgcn", dataset="gowalla")
    data = load(cfg)
    assert data.user_num > 0 and data.item_num > 0
    assert data.n_train > 0
    assert data.valid is not None
    # eval protocol structures are consistent
    tu = np.asarray(data.test.test_users)
    assert (np.asarray(data.test.ground_truth.lengths)[tu] > 0).all()


@pytest.mark.skipif(not _has("sequential", "sports_seq", "train.tsv"),
                    reason="sports tsv absent")
def test_sports_loads():
    from sslrec_tpu.data.sequential import load
    cfg = load_config("bert4rec", dataset="sports")
    data = load(cfg)
    assert data.extras["train_arrays"]["seq"].shape[1] == 50
    assert data.test.n_test_users > 0
    # all item ids within [0, item_num]
    assert int(np.asarray(data.extras["train_arrays"]["seq"]).max()) \
        <= data.item_num


@pytest.mark.skipif(not _has("multi_behavior", "retail_rocket",
                             "train_mat_buy.pkl"),
                    reason="retail_rocket pickles absent")
def test_retail_rocket_loads():
    from sslrec_tpu.data.multi_behavior import load
    cfg = load_config("smbrec", dataset="retail_rocket")
    data = load(cfg)
    assert len(data.extras["behavior_graphs"]) == 3
    assert data.n_train > 0
