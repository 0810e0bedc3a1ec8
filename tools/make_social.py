"""Derive the missing yelp social pickles: binary train matrix + synthetic trust.

The reference snapshot's ``datasets/social/yelp`` ships ``trn_time.pkl`` (the
real 43,043x66,576 train matrix with timestamps as values), ``tst_mat.pkl``
and ``category.pkl`` — but NOT ``trn_mat.pkl`` or ``trust_mat.pkl`` (loader
contract: ``data_utils/data_handler_social.py``).  This tool derives both so
the social family gets scale-realistic end-to-end runs:

- ``trn_mat.pkl``: ``trn_time != 0`` — every model binarizes the train matrix
  anyway (``(trn_mat != 0)``), so binarizing timestamps is value-exact.
- ``trust_mat.pkl``: SYNTHETIC (documented provenance, written alongside):
  top-k co-interaction neighbors under cosine weighting.  With B the binary
  train matrix and D_u/D_i the degree diagonals,
  ``S = D_u^-1/2 B D_i^-1 B^T D_u^-1/2`` (inverse item-degree weighting keeps
  blockbuster items from linking everyone to everyone); each user keeps their
  k strongest neighbors, then the graph is symmetrized.  Deterministic — no
  RNG.  Every quality row produced on this data must be labelled
  "real interactions, synthetic trust".

Usage: python tools/make_social.py [--k 10] [--out datasets/social/yelp]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import time
import warnings

import numpy as np
import scipy.sparse as sp

SRC = "/root/reference/datasets/social/yelp"


def synth_trust(B: sp.csr_matrix, k: int = 10) -> sp.csr_matrix:
    """Top-k cosine co-interaction neighbors, symmetrized, no self loops."""
    B = (B != 0).astype(np.float32).tocsr()
    d_u = np.asarray(B.sum(1)).reshape(-1)
    d_i = np.asarray(B.sum(0)).reshape(-1)
    du_inv = sp.diags(1.0 / np.sqrt(np.maximum(d_u, 1.0)))
    di_inv = sp.diags(1.0 / np.maximum(d_i, 1.0))
    W = du_inv @ B @ di_inv @ B.T @ du_inv  # [U, U] similarity
    W = W.tocsr()
    W.setdiag(0)
    W.eliminate_zeros()
    rows, cols = [], []
    for u in range(W.shape[0]):
        s, e = W.indptr[u], W.indptr[u + 1]
        if s == e:
            continue
        idx = W.indices[s:e]
        val = W.data[s:e]
        top = np.argsort(-val, kind="stable")[:k]
        rows += [u] * len(top)
        cols += list(idx[top])
    T = sp.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                      shape=W.shape)
    T = ((T + T.T) != 0).astype(np.float32).tocsr()
    return T


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="datasets/social/yelp")
    args = ap.parse_args(argv)

    warnings.filterwarnings("ignore")
    with open(os.path.join(SRC, "trn_time.pkl"), "rb") as f:
        trn_time = pickle.load(f)
    trn = (trn_time != 0).astype(np.float32).tocsr()
    trust = synth_trust(trn, k=args.k)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "trn_mat.pkl"), "wb") as f:
        pickle.dump(trn.tocoo(), f)
    with open(os.path.join(args.out, "trust_mat.pkl"), "wb") as f:
        pickle.dump(trust, f)
    with open(os.path.join(args.out, "PROVENANCE.json"), "w") as f:
        json.dump({
            "trn_mat": "binarized /root/reference/datasets/social/yelp/"
                       "trn_time.pkl (real interactions)",
            "trust_mat": f"SYNTHETIC top-{args.k} cosine co-interaction "
                         "neighbors, symmetrized (tools/make_social.py — the "
                         "snapshot ships no trust_mat.pkl)",
            "users": int(trn.shape[0]), "items": int(trn.shape[1]),
            "train_nnz": int(trn.nnz), "trust_nnz": int(trust.nnz),
            "written_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        }, f, indent=1)
    print(f"wrote {args.out}: trn {trn.shape} nnz={trn.nnz}, "
          f"trust nnz={trust.nnz}")


if __name__ == "__main__":
    main()
