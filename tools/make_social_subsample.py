"""Derive a reduced-scale yelp-social split (``datasets/social/yelp_sub``) for
direct ours-vs-reference DcRec parity (VERDICT r4 #3).

At the full 43,043x66,576 scale the reference torch DcRec is infeasible (its
``semi_loss`` keeps every [1024, n_items] activation alive for backward — >30 GB
— and its shipped 300-epoch schedule is ~34 h/chip; see BASELINE.md DcRec row).
This split is small enough that BOTH implementations converge, so the social
model with the weakest quality evidence gets a same-split head-to-head.

Provenance (deterministic, seed 2023):

- users: ``n_users`` sampled uniformly from users with >=1 train AND >=1 test
  interaction in the derived yelp-social split (``tools/make_social.py``);
- items: every item with >=1 train interaction among sampled users, reindexed;
- ``trn_mat`` / ``tst_mat``: the corresponding submatrices (test restricted to
  kept items);
- ``trust_mat``: recomputed with ``make_social.synth_trust`` (same top-k
  co-interaction construction, k=10) ON the subsampled train matrix — same
  synthetic-trust caveat as the parent split.

Usage: python tools/make_social_subsample.py [--n_users 9000]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_social import synth_trust  # noqa: E402

SRC = "/root/repo/datasets/social/yelp"
REF = "/root/reference/datasets/social/yelp"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_users", type=int, default=9000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--seed", type=int, default=2023)
    ap.add_argument("--out", default="datasets/social/yelp_sub")
    args = ap.parse_args(argv)

    with open(os.path.join(SRC, "trn_mat.pkl"), "rb") as f:
        trn = sp.csr_matrix(pickle.load(f))
    with open(os.path.join(REF, "tst_mat.pkl"), "rb") as f:
        tst = sp.csr_matrix(pickle.load(f))

    trn_deg = np.asarray((trn != 0).sum(1)).reshape(-1)
    tst_deg = np.asarray((tst != 0).sum(1)).reshape(-1)
    eligible = np.flatnonzero((trn_deg > 0) & (tst_deg > 0))
    rng = np.random.default_rng(args.seed)
    sel_u = np.sort(rng.choice(eligible, size=min(args.n_users, eligible.size),
                               replace=False))

    trn_s = trn[sel_u]
    item_deg = np.asarray((trn_s != 0).sum(0)).reshape(-1)
    sel_i = np.flatnonzero(item_deg > 0)
    trn_s = sp.csr_matrix((trn_s[:, sel_i] != 0) * 1.0)
    tst_s = sp.csr_matrix((tst[sel_u][:, sel_i] != 0) * 1.0)
    trust_s = synth_trust(trn_s, k=args.k)

    os.makedirs(args.out, exist_ok=True)
    for name, m in (("trn_mat.pkl", trn_s.tocoo()),
                    ("tst_mat.pkl", tst_s.tocoo()),
                    ("trust_mat.pkl", trust_s.tocoo())):
        with open(os.path.join(args.out, name), "wb") as f:
            pickle.dump(m, f)
    prov = {
        "derived_by": "tools/make_social_subsample.py",
        "derived_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "parent": {"trn": os.path.join(SRC, "trn_mat.pkl"),
                   "tst": os.path.join(REF, "tst_mat.pkl")},
        "seed": args.seed,
        "n_users": int(trn_s.shape[0]),
        "n_items": int(trn_s.shape[1]),
        "train_nnz": int(trn_s.nnz),
        "test_nnz": int(tst_s.nnz),
        "trust_nnz": int(trust_s.nnz),
        "trust": f"synth_trust(k={args.k}) RECOMPUTED on the subsampled "
                 "train matrix (synthetic, like the parent split)",
        "user_ids": "uniform sample of users with >=1 train and >=1 test "
                    "interaction; items reindexed to those with >=1 sampled "
                    "train interaction",
    }
    with open(os.path.join(args.out, "PROVENANCE.json"), "w") as f:
        json.dump(prov, f, indent=1)
    print(json.dumps(prov, indent=1))


if __name__ == "__main__":
    main()
