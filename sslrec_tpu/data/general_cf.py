"""General collaborative-filtering data handler (yelp / gowalla / amazon).

Behavioural parity with ``data_utils/data_handler_general_cf.py``: loads the same
pickled COO train/valid/test matrices, binarises them, builds the bidirectional
symmetric-normalised ``[U+I, U+I]`` adjacency — but lands everything as
device-resident static-shape arrays (``CooGraph`` + padded eval structures)
instead of torch sparse tensors + python DataLoaders.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from sslrec_tpu.data.base import DataBundle, EvalData
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.ops.pallas_spmm import maybe_pallas

_DEFAULT_DATA_ROOT = "/root/reference/datasets"


def _dataset_dir(cfg) -> str:
    root = cfg.data.get("dir") or _DEFAULT_DATA_ROOT
    name = cfg.data.name
    sub = {"yelp": "sparse_yelp", "gowalla": "sparse_gowalla", "amazon": "sparse_amazon"}
    return os.path.join(root, "general_cf", sub.get(name, name))


def load_one_mat(path: str) -> sp.coo_matrix:
    """Load + binarise one pickled sparse matrix (``data_handler_general_cf.py:22-35``)."""
    with open(path, "rb") as f:
        mat = pickle.load(f)
    mat = (mat != 0).astype(np.float32)
    if not isinstance(mat, sp.coo_matrix):
        mat = sp.coo_matrix(mat)
    return mat


def _eval_data(split_mat: sp.spmatrix, trn_mat: sp.spmatrix) -> EvalData:
    csr = split_mat.tocsr()
    counts = np.diff(csr.indptr)
    test_users = np.where(counts > 0)[0].astype(np.int32)
    return EvalData(
        test_users=jnp.asarray(test_users),
        ground_truth=sparse_ops.build_padded_rows(split_mat),
        history=sparse_ops.build_padded_rows(trn_mat),
        n_test_users=int(test_users.shape[0]),
    )


def bundle_from_matrices(trn_mat: sp.spmatrix, val_mat: sp.spmatrix | None,
                         tst_mat: sp.spmatrix,
                         use_pallas: bool | None = None) -> DataBundle:
    """Assemble a DataBundle from scipy matrices (also used by tests/synthetic)."""
    n_users, n_items = trn_mat.shape
    coo = trn_mat.tocoo()
    order = np.lexsort((coo.col, coo.row))
    bi_adj = sparse_ops.make_bi_adj(trn_mat, n_users, n_items)
    return DataBundle(
        user_num=int(n_users),
        item_num=int(n_items),
        train_users=jnp.asarray(coo.row[order], dtype=jnp.int32),
        train_items=jnp.asarray(coo.col[order], dtype=jnp.int32),
        train_edge_set=sparse_ops.build_edge_set(trn_mat),
        valid=_eval_data(val_mat, trn_mat) if val_mat is not None else None,
        test=_eval_data(tst_mat, trn_mat),
        extras={
            # normalised bidirectional adjacency over [U+I] nodes — the input to
            # every general-CF propagation (LightGCN & subclasses).  When
            # use_pallas, pre-blocked for the scatter-free Pallas spmm kernel
            # (runtime win, but each call site costs a Mosaic compile — see
            # maybe_pallas docstring for why it is opt-in).
            "bi_adj": maybe_pallas(bi_adj, use_pallas),
            # raw train matrix kept host-side for models needing bespoke graph
            # algebra at init (LightGCL SVD, DCCF intent graphs, ...).
            "train_mat_scipy": trn_mat.tocoo(),
        },
    )


def _mats_from_txt(d: str):
    """CF splits in the KG line format (``u i1 i2 ...``) → scipy matrices.

    Lets pure-CF models train on a KG dataset's derived interaction splits
    (tools/split_kg.py) so SSL-KG models have a plain-CF baseline row on the
    *same* split (VERDICT r2 item 1)."""
    from sslrec_tpu.data.kg import read_cf

    def mat(pairs, shape):
        return sp.coo_matrix((np.ones(len(pairs), np.float32),
                              (pairs[:, 0], pairs[:, 1])), shape=shape)

    trn = read_cf(os.path.join(d, "train.txt"))
    tst = read_cf(os.path.join(d, "test.txt"))
    vp = os.path.join(d, "valid.txt")
    val = read_cf(vp) if os.path.exists(vp) else None
    splits = [trn, tst] + ([val] if val is not None else [])
    n_users = int(max(s[:, 0].max() for s in splits) + 1)
    n_items = int(max(s[:, 1].max() for s in splits) + 1)
    shape = (n_users, n_items)
    return (mat(trn, shape), mat(val, shape) if val is not None else None,
            mat(tst, shape))


def load(cfg) -> DataBundle:
    d = _dataset_dir(cfg)
    # Pallas spmm defaults ON for the scan-refactored family: all their hops
    # and views share ONE (or a few) kernel instances per program
    # (ops/spmm.spmm_layers / model-local lax.scan), which removed the
    # per-call-site Mosaic compile blowup (SGL: >30 min in round 1 → 75 s
    # compile+first-epoch, then ~2x faster epochs than XLA).  LightGCL/DCCF/
    # AutoCF build their own graphs and default on in their constructors;
    # AdaGCL (multi-instance three-phase step) and GFormer (matmul-dominated)
    # stay opt-in.
    scanned_family = ("lightgcn", "sgl", "simgcl", "ncl", "directau", "hccf")
    use_pallas = cfg.model.get("use_pallas", cfg.model.name in scanned_family)
    if not os.path.exists(os.path.join(d, "train_mat.pkl")):
        # derived txt splits live under the kg/ layout
        root = cfg.data.get("dir") or _DEFAULT_DATA_ROOT
        kg_dir = os.path.join(root, "kg", f"{cfg.data.name}_kg")
        if os.path.exists(os.path.join(kg_dir, "train.txt")):
            trn, val, tst = _mats_from_txt(kg_dir)
            return bundle_from_matrices(trn, val, tst, use_pallas)
    trn = load_one_mat(os.path.join(d, "train_mat.pkl"))
    tst = load_one_mat(os.path.join(d, "test_mat.pkl"))
    val_path = os.path.join(d, "valid_mat.pkl")
    val = load_one_mat(val_path) if os.path.exists(val_path) else None
    return bundle_from_matrices(trn, val, tst, use_pallas)
