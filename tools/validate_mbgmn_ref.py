"""Validation run: the REFERENCE torch MBGMN on retail_rocket, shipped config.

Round-1 review flagged our MBGMN row (Recall@20 0.0064 after the shipped
15-epoch / trnNum=100 schedule) as indistinguishable from a broken port.  This
script executes the reference implementation itself (via the parity shim, torch
CPU) under the identical protocol and reports its metrics, so the two rows are
directly comparable.

Relevant reference fact (models/multi_behavior/mbgmn.py:187): the hinge ranking
loss is wrapped in ``torch.tensor(...).clone().detach()`` — it carries NO
gradient, so the only trainable signal in the shipped reference is the L2
regulariser.  Our JAX port does not replicate that bug (the hinge term flows
gradients), i.e. ours is strictly more trainable than the reference.

Usage: PYTHONPATH=/root/repo python tools/validate_mbgmn_ref.py
Writes log to log/mbgmn/ref_validation.log
"""

from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np
import scipy.sparse as sp
import torch

sys.path.insert(0, "/root/repo")

from tests.parity.refshim import load_ref  # noqa: E402

DATA = "/root/reference/datasets/multi_behavior/retail_rocket"
BEHAVIORS = ["view", "cart", "buy"]


class _Handler:
    pass


def normalize_adj(adj):
    """Reference ``_normalize_adj`` (data_handler_multi_behavior.py:100-107)."""
    adj = sp.coo_matrix(adj)
    rowsum = np.array(adj.sum(1))
    rowsum_diag = sp.diags(np.power(rowsum + 1e-8, -0.5).flatten())
    colsum = np.array(adj.sum(0))
    colsum_diag = sp.diags(np.power(colsum + 1e-8, -0.5).flatten())
    return rowsum_diag * adj * colsum_diag


def to_torch(coo):
    coo = sp.coo_matrix(coo)
    idx = torch.from_numpy(np.vstack([coo.row, coo.col]).astype(np.int64))
    vals = torch.from_numpy(coo.data.astype(np.float32))
    return torch.sparse_coo_tensor(idx, vals, coo.shape).coalesce()


def main():
    mod, configs = load_ref("models.multi_behavior.mbgmn")
    import yaml
    with open("/root/reference/config/modelconf/mbgmn.yml") as f:
        ref_cfg = yaml.safe_load(f)
    configs.update(ref_cfg)
    configs["device"] = "cpu"

    h = _Handler()
    h.behaviors = BEHAVIORS
    h.behaviors_data = []
    for b in BEHAVIORS:
        with open(os.path.join(DATA, f"train_mat_{b}.pkl"), "rb") as f:
            h.behaviors_data.append(1 * (pickle.load(f) != 0))
    with open(os.path.join(DATA, "test_mat.pkl"), "rb") as f:
        test_mat = pickle.load(f).tocsr()
    n_users, n_items = h.behaviors_data[0].shape
    configs["data"].update({"user_num": n_users, "item_num": n_items})
    h.behavior_mats = {}
    for i, m in enumerate(h.behaviors_data):
        h.behavior_mats[i] = {
            "A": to_torch(normalize_adj(m)),
            "AT": to_torch(normalize_adj(m.T)),
            "A_ori": None,
        }
    trn_target = h.behaviors_data[-1].tocsr()  # buy

    np.random.seed(int(configs["train"]["seed"]))
    torch.manual_seed(int(configs["train"]["seed"]))
    model = mod.MBGMN(h)
    opt = torch.optim.Adam(model.parameters(),
                           lr=float(configs["optimizer"]["lr"]),
                           weight_decay=float(configs["optimizer"]["weight_decay"]))

    # MBGMNTrainer epoch (trainer/trainer.py:1056-1074): trnNum users, per
    # behavior sampNum pos + rejection-sampled negs
    samp_num = int(configs["model"]["sampNum"])
    trn_num = int(configs["model"]["trnNum"])
    bsz = int(configs["train"]["batch_size"])

    def sample_batch(bat_ids, label_mat):
        tem = label_mat[bat_ids].toarray()
        u_locs, i_locs_pos, i_locs_neg, u2 = [], [], [], []
        for i in range(len(bat_ids)):
            posset = np.flatnonzero(tem[i])
            sn = min(samp_num, len(posset))
            if sn == 0:
                pos = [np.random.choice(n_items)]
                neg = [pos[0]]
            else:
                pos = list(np.random.choice(posset, sn))
                neg = []
                while len(neg) < sn:
                    c = np.random.choice(n_items)
                    if tem[i][c] == 0:
                        neg.append(c)
            u_locs += [bat_ids[i]] * len(pos)
            u2 += [bat_ids[i]] * len(neg)
            i_locs_pos += pos
            i_locs_neg += neg
        return u_locs + u2, i_locs_pos + i_locs_neg

    os.makedirs("log/mbgmn", exist_ok=True)
    logf = open("log/mbgmn/ref_validation.log", "a")

    def log(msg):
        line = f"{time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        logf.write(line + "\n")
        logf.flush()

    log(f"reference MBGMN, retail_rocket {n_users}x{n_items}, shipped config "
        f"(epoch {configs['train']['epoch']}, trnNum {trn_num})")

    n_epochs = int(configs["train"]["epoch"])
    for ep in range(n_epochs):
        model.train()
        sf = np.random.permutation(n_users)[:trn_num]
        steps = int(np.ceil(len(sf) / bsz))
        ep_loss = 0.0
        for s in range(steps):
            bat = sf[s * bsz: (s + 1) * bsz]
            uids, iids = [0] * 3, [0] * 3
            for beh in range(3):
                u, i = sample_batch(bat, h.behaviors_data[beh].tocsr())
                uids[beh] = torch.as_tensor(u)
                iids[beh] = torch.as_tensor(i)
            loss = model.cal_loss(uids, iids)
            opt.zero_grad()
            loss.backward()
            opt.step()
            ep_loss += float(loss)
        log(f"epoch {ep} loss {ep_loss / max(steps,1):.4f}")

    # evaluation: reference Metric.eval protocol via full_predict
    metrics_mod, _ = load_ref("trainer.metrics")
    configs["test"] = {"metrics": ["recall", "ndcg"], "k": [10, 20, 40],
                       "batch_size": 1024}
    metric = metrics_mod.Metric()

    test_users = np.flatnonzero(np.asarray(test_mat.sum(1)).ravel() > 0)

    class _DS:
        def __init__(self):
            self.test_users = test_users.tolist()
            self.user_pos_lists = {int(u): test_mat[u].indices.tolist()
                                   for u in test_users}

    class _Loader:
        dataset = _DS()

        def __iter__(self):
            for i in range(0, len(test_users), 1024):
                us = test_users[i: i + 1024]
                mask = torch.from_numpy(
                    trn_target[us].toarray().astype(np.float32))
                yield [torch.as_tensor(us), mask]

    with torch.no_grad():
        model.is_training = False
        res = metric.eval(model, _Loader())
    log(f"reference-run metrics: {res}")


if __name__ == "__main__":
    main()
