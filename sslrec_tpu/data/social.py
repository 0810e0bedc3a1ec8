"""Social-recommendation data handler (ciao / epinions / yelp / lastfm).

Parity with ``data_utils/data_handler_social.py``: pickled ``trn_mat / tst_mat /
trust_mat`` (+ ``category.pkl`` for metapath models); model-conditional
preprocessing — MHCN motif-induced adjacencies A1..A10 (``:98-126``), the joint
degree-normalised rectangular adjacency (``:128-137``), DSL's bidirectional UI
adjacency + symmetric-normalised trust graph (``:352-361``) and paired
CF+social sampling (``datasets_social.py:52-91``).

The heavy sparse algebra stays host-side scipy (computed once at load); device
artifacts are CooGraph/PallasGraph layouts.  Note: this reference snapshot ships
only partial social data files — real-data runs require complete pickles; all
logic is exercised by synthetic-data tests.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from sslrec_tpu.data.base import DataBundle, EvalData
from sslrec_tpu.data.general_cf import _eval_data
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.ops.pallas_spmm import maybe_pallas

_DEFAULT_DATA_ROOT = "/root/reference/datasets"


def build_motif_adjacencies(trust_mat: sp.spmatrix, trn_mat: sp.spmatrix):
    """MHCN motif-induced hypergraph adjacencies (``data_handler_social.py:98-126``).

    Returns row-normalised [H_s, H_j, H_p] over users.
    """
    s = trust_mat.tocsr()
    y = trn_mat.tocsr()
    b = s.multiply(s.T)
    u = s - b
    c1 = (u @ u).multiply(u.T)
    a1 = c1 + c1.T
    c2 = (b @ u).multiply(u.T) + (u @ b).multiply(u.T) + (u @ u).multiply(b)
    a2 = c2 + c2.T
    c3 = (b @ b).multiply(u) + (b @ u).multiply(b) + (u @ b).multiply(b)
    a3 = c3 + c3.T
    a4 = (b @ b).multiply(b)
    c5 = (u @ u).multiply(u) + (u @ u.T).multiply(u) + (u.T @ u).multiply(u)
    a5 = c5 + c5.T
    a6 = (u @ b).multiply(u) + (b @ u.T).multiply(u.T) + (u.T @ u).multiply(b)
    a7 = (u.T @ b).multiply(u.T) + (b @ u).multiply(u) + (u @ u.T).multiply(b)
    a8 = (y @ y.T).multiply(b)
    a9 = (y @ y.T).multiply(u)
    a9 = a9 + a9.T
    a10 = y @ y.T - a8 - a9

    def row_norm(h):
        h = sp.csr_matrix(h)
        deg = np.asarray(h.sum(axis=1)).reshape(-1)
        inv = np.divide(1.0, deg, out=np.zeros_like(deg, dtype=np.float64),
                        where=deg != 0)
        return sp.diags(inv) @ h

    h_s = row_norm(a1 + a2 + a3 + a4 + a5 + a6 + a7)
    h_j = row_norm(a8 + a9)
    h_p = sp.csr_matrix(a10)
    h_p = h_p.multiply(h_p > 1)
    h_p = row_norm(h_p)
    return [h_s.tocoo(), h_j.tocoo(), h_p.tocoo()]


def build_joint_adjacency(trn_mat: sp.coo_matrix) -> sp.coo_matrix:
    """Degree-normalised rectangular UI adjacency
    (``data_handler_social.py:128-137``): v/√(du·di)."""
    coo = trn_mat.tocoo()
    udeg = np.asarray(coo.sum(axis=-1)).reshape(-1)
    ideg = np.asarray(coo.sum(axis=0)).reshape(-1)
    vals = coo.data / np.sqrt(udeg[coo.row] * ideg[coo.col])
    return sp.coo_matrix((vals, (coo.row, coo.col)), coo.shape)


def _dataset_dir(cfg) -> str:
    root = cfg.data.get("dir") or _DEFAULT_DATA_ROOT
    return os.path.join(root, "social", cfg.data.name)


def _load_pkl(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def load(cfg) -> DataBundle:
    d = _dataset_dir(cfg)
    trn_mat = _load_pkl(os.path.join(d, "trn_mat.pkl")).tocoo()
    tst_mat = _load_pkl(os.path.join(d, "tst_mat.pkl")).tocoo()
    trust_mat = _load_pkl(os.path.join(d, "trust_mat.pkl")).tocsr()
    return bundle_from_matrices(cfg, trn_mat, tst_mat, trust_mat)


def bundle_from_matrices(cfg, trn_mat, tst_mat, trust_mat) -> DataBundle:
    n_users, n_items = trn_mat.shape
    trn_bin = (trn_mat != 0).astype(np.float32).tocoo()
    coo = trn_bin
    order = np.lexsort((coo.col, coo.row))
    model_name = cfg.model.name.lower()

    extras = {"trust_mat_scipy": trust_mat, "train_mat_scipy": trn_bin}
    if model_name == "mhcn":
        h_s, h_j, h_p = build_motif_adjacencies(trust_mat, trn_bin)
        extras["mhcn_h_s"] = maybe_pallas(h_s)
        extras["mhcn_h_j"] = maybe_pallas(h_j)
        extras["mhcn_h_p"] = maybe_pallas(h_p)
        extras["mhcn_r"] = maybe_pallas(build_joint_adjacency(trn_bin))
    if model_name in ("dsl", "dcrec"):
        extras["bi_adj"] = maybe_pallas(
            sparse_ops.make_bi_adj(trn_bin, n_users, n_items))
        uu = (trust_mat != 0) * 1.0
        extras["uu_adj"] = maybe_pallas(sparse_ops.normalize_adj_sym(uu))
    train_users = coo.row[order].astype(np.int32)
    train_items = coo.col[order].astype(np.int32)
    if model_name == "dsl":
        # paired CF+social stream (``DSLTrnData``: length = max of the two,
        # each side wrapped modulo its own length)
        tcoo = trust_mat.tocoo()
        n = max(len(train_users), tcoo.nnz)
        wrap = lambda a: a[np.arange(n) % len(a)]
        extras["trust_edge_set"] = sparse_ops.build_edge_set(trust_mat)
        extras["train_arrays"] = {
            "user": jnp.asarray(wrap(train_users)),
            "pos": jnp.asarray(wrap(train_items)),
            "suser": jnp.asarray(wrap(tcoo.row.astype(np.int32))),
            "spos": jnp.asarray(wrap(tcoo.col.astype(np.int32))),
        }
        train_users = wrap(train_users)
        train_items = wrap(train_items)

    return DataBundle(
        user_num=int(n_users),
        item_num=int(n_items),
        train_users=jnp.asarray(train_users),
        train_items=jnp.asarray(train_items),
        train_edge_set=sparse_ops.build_edge_set(trn_bin),
        valid=None,
        test=_eval_data(tst_mat, trn_bin),
        extras=extras,
    )
