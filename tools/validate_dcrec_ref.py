"""Validation run: the REFERENCE torch social DcRec on the yelp_sub split.

VERDICT r4 #3: social DcRec was the only model with no quality evidence
anywhere — at the full 43k x 66k yelp scale the reference algorithm is
infeasible (its ``semi_loss`` keeps every [1024, n_items] activation alive for
backward, >30 GB; ~34 h for the shipped schedule).  ``tools/make_social_subsample.py``
derives a 9,000-user split where BOTH implementations run; this script
executes the reference implementation itself (``models/social/dcrec.py:16-274``
via the parity shim, torch CPU) under the reference base-Trainer protocol
(``trainer/trainer.py:51-137``) and logs per-epoch full-sort metrics, so the
TPU row and the reference row are directly comparable on the identical split.

yelp-social ships no valid split, so valid = test (as in the reference).

Usage: PYTHONPATH=/root/repo python tools/validate_dcrec_ref.py [--epochs N]
Writes log to results/dcrec_ref_validation.log (appends; flushed per epoch).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np
import scipy.sparse as sp
import torch

sys.path.insert(0, "/root/repo")

from tests.parity.refshim import load_ref  # noqa: E402

DATA = "/root/repo/datasets/social/yelp_sub"


class _Handler:
    pass


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=None,
                    help="override the shipped lr (tuned head-to-head: the "
                         "shipped lr 5e-5 / weight_decay 0.98 leaves BOTH "
                         "implementations at near-random for hundreds of "
                         "epochs — measured: ref epochs 0-1 R@20 0.0004-6)")
    ap.add_argument("--wd", type=float, default=None)
    args = ap.parse_args(argv)

    torch.set_num_threads(os.cpu_count() or 4)
    mod, configs = load_ref("models.social.dcrec")
    import yaml
    with open("/root/reference/config/modelconf/dcrec.yml") as f:
        configs.update(yaml.safe_load(f))
    configs["device"] = "cpu"
    if args.lr is not None:
        configs["optimizer"]["lr"] = args.lr
    if args.wd is not None:
        configs["optimizer"]["weight_decay"] = args.wd

    with open(os.path.join(DATA, "trn_mat.pkl"), "rb") as f:
        trn = sp.coo_matrix(pickle.load(f))
    with open(os.path.join(DATA, "tst_mat.pkl"), "rb") as f:
        tst = sp.csr_matrix(pickle.load(f))
    with open(os.path.join(DATA, "trust_mat.pkl"), "rb") as f:
        trust = sp.coo_matrix(pickle.load(f))
    n_users, n_items = trn.shape
    configs["data"].update({"user_num": n_users, "item_num": n_items})

    h = _Handler()
    h.trn_mat = trn
    h.trust_mat = trust

    seed = int(configs["train"]["seed"])
    np.random.seed(seed)
    torch.manual_seed(seed)
    import random as _random
    _random.seed(seed)

    # the reference builds torch_adj/torch_uu_adj in the HANDLER before the
    # model ctor reads them (data_handler_social.py:540-542; math identical
    # to DcRec._normalize_adj/_make_torch_adj, dcrec.py:65-95)
    def normalize_adj(mat):
        degree = np.array(mat.sum(axis=-1))
        d_inv_sqrt = np.reshape(np.power(degree, -0.5), [-1])
        d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
        d = sp.diags(d_inv_sqrt)
        return mat.dot(d).transpose().dot(d).tocoo()

    def to_torch(mat):
        mat = sp.coo_matrix(mat)
        idxs = torch.from_numpy(np.vstack([mat.row, mat.col]).astype(np.int64))
        vals = torch.from_numpy(mat.data.astype(np.float32))
        return torch.sparse_coo_tensor(idxs, vals, mat.shape).coalesce()

    bi = sp.vstack([
        sp.hstack([sp.csr_matrix((n_users, n_users)), trn.tocsr()]),
        sp.hstack([trn.tocsr().T, sp.csr_matrix((n_items, n_items))])])
    h.torch_adj = to_torch(normalize_adj((bi != 0) * 1.0))
    h.torch_uu_adj = to_torch(normalize_adj((trust.tocsr() != 0) * 1.0))
    model = mod.DcRec(h)

    opt = torch.optim.Adam(model.parameters(),
                           lr=float(configs["optimizer"]["lr"]),
                           weight_decay=float(configs["optimizer"]["weight_decay"]))

    # PairwiseTrnData semantics (datasets_social.py / datasets_general_cf.py):
    # per (u, i) train pair, one rejection-sampled negative per epoch
    trn_csr = trn.tocsr()
    us, is_ = trn.row.astype(np.int64), trn.col.astype(np.int64)

    def sample_negs():
        negs = np.random.randint(0, n_items, len(us))
        bad = np.asarray(trn_csr[us, negs]).reshape(-1) != 0
        while bad.any():
            negs[bad] = np.random.randint(0, n_items, int(bad.sum()))
            bad[bad] = np.asarray(trn_csr[us[bad], negs[bad]]).reshape(-1) != 0
        return negs

    test_users = np.flatnonzero(np.asarray((tst != 0).sum(1)).reshape(-1))
    ks = [10, 20, 40]

    def evaluate():
        model.is_training = False
        with torch.no_grad():
            recalls = {k: 0.0 for k in ks}
            ndcgs = {k: 0.0 for k in ks}
            bs = int(configs["test"]["batch_size"])
            for s in range(0, len(test_users), bs):
                batch_u = test_users[s:s + bs]
                mask = torch.from_numpy(
                    np.asarray(trn_csr[batch_u].todense(), np.float32))
                preds = model.full_predict(
                    (torch.from_numpy(batch_u), mask))
                topk = torch.topk(preds, max(ks), dim=-1).indices.numpy()
                for row, u in enumerate(batch_u):
                    gt = set(tst[u].indices.tolist())
                    for k in ks:
                        hits = [1.0 if it in gt else 0.0
                                for it in topk[row, :k]]
                        recalls[k] += sum(hits) / max(len(gt), 1)
                        dcg = sum(hh / np.log2(j + 2)
                                  for j, hh in enumerate(hits))
                        idcg = sum(1.0 / np.log2(j + 2)
                                   for j in range(min(len(gt), k)))
                        ndcgs[k] += dcg / max(idcg, 1e-9)
        model.is_training = True
        n = len(test_users)
        return {f"recall@{k}": recalls[k] / n for k in ks} | \
               {f"ndcg@{k}": ndcgs[k] / n for k in ks}

    logf = open("results/dcrec_ref_validation.log", "a")

    def log(msg):
        line = f"{time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        logf.write(line + "\n")
        logf.flush()

    log(f"reference DcRec on yelp_sub {n_users}x{n_items} "
        f"({trn.nnz} train, {tst.nnz} test, {trust.nnz} trust), shipped "
        f"config lr={configs['optimizer']['lr']} "
        f"wd={configs['optimizer']['weight_decay']} keep={configs['model']['keep_rate']}")

    bsz = args.batch
    for ep in range(args.epochs):
        t0 = time.time()
        negs = sample_negs()
        perm = np.random.permutation(len(us))
        ep_loss = 0.0
        model.train()
        for s in range(0, len(perm), bsz):
            sel = perm[s:s + bsz]
            batch = [torch.from_numpy(us[sel]), torch.from_numpy(is_[sel]),
                     torch.from_numpy(negs[sel])]
            opt.zero_grad()
            loss, _ = model.cal_loss(batch)
            loss.backward()
            opt.step()
            ep_loss += float(loss)
        res = evaluate()
        log(f"epoch {ep} loss {ep_loss:.2f} ({time.time()-t0:.0f}s) " +
            " ".join(f"{k}:{v:.5f}" for k, v in res.items()))


if __name__ == "__main__":
    main()
