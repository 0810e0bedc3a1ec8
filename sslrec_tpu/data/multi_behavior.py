"""Multi-behavior data handler (tmall / ijcai_15 / retail_rocket).

Parity with ``data_utils/data_handler_multi_behavior.py``: per-behavior pickled
``train_mat_<beh>.pkl`` binarised; separately-normalised A (user→item) and AT
(item→user) per behavior via D_r^-1/2 A D_c^-1/2 with +1e-8 (``_get_use``/
``_normalize_adj`` ``:94-113``); the target behavior supplies the pairwise
training stream and eval history; HMGCR additionally loads the cumulative
meta-path matrices; SMBRec per-behavior user degrees and the user co-interaction
matrix; CML the meta user index file.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from sslrec_tpu.data.base import DataBundle
from sslrec_tpu.data.general_cf import _eval_data
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.ops.pallas_spmm import maybe_pallas

_DEFAULT_DATA_ROOT = "/root/reference/datasets"

BEHAVIORS = {
    "ijcai_15": ["click", "fav", "cart", "buy"],
    "tmall": ["pv", "fav", "cart", "buy"],
    "retail_rocket": ["view", "cart", "buy"],
}
META_PATHS = {
    "ijcai_15": ["buy", "click_buy", "click_fav_buy", "click_fav_cart_buy"],
    "tmall": ["buy", "pv_buy", "pv_fav_buy", "pv_fav_cart_buy"],
    "retail_rocket": ["buy", "view_buy", "view_cart_buy"],
}


def normalize_rect(adj: sp.spmatrix) -> sp.coo_matrix:
    """D_r^-1/2 A D_c^-1/2 with +1e-8 (``_normalize_adj`` ``:105-113``)."""
    adj = sp.coo_matrix(adj)
    rowsum = np.asarray(adj.sum(1)).reshape(-1)
    colsum = np.asarray(adj.sum(0)).reshape(-1)
    dr = sp.diags(np.power(rowsum + 1e-8, -0.5))
    dc = sp.diags(np.power(colsum + 1e-8, -0.5))
    return (dr @ adj @ dc).tocoo()


def behavior_graphs(mat: sp.spmatrix):
    """(A, AT) normalised propagation graphs for one behavior."""
    binm = (mat != 0) * 1.0
    return (maybe_pallas(normalize_rect(binm)),
            maybe_pallas(normalize_rect(binm.T)))


def _dataset_dir(cfg) -> str:
    root = cfg.data.get("dir") or _DEFAULT_DATA_ROOT
    return os.path.join(root, "multi_behavior", cfg.data.name)


def load(cfg) -> DataBundle:
    d = _dataset_dir(cfg)
    name = cfg.data.name
    # The reference snapshot omits the densest behavior matrix for tmall
    # (train_mat_pv.pkl) and ijcai_15 (train_mat_click.pkl) even though its own
    # handler lists them (data_handler_multi_behavior.py:20-24).  Only those
    # two known-missing matrices may be skipped; anything else absent (above
    # all the TARGET behavior, the last list entry) is a broken data dir and
    # must fail loudly rather than silently retarget training.
    _known_missing = {"tmall": {"pv"}, "ijcai_15": {"click"}}.get(name, set())
    behaviors = []
    for b in BEHAVIORS[name]:
        path = os.path.join(d, f"train_mat_{b}.pkl")
        if os.path.exists(path):
            behaviors.append(b)
        elif b not in _known_missing:
            raise FileNotFoundError(
                f"multi_behavior/{name}: required behavior matrix missing: {path}")
    mats = []
    for beh in behaviors:
        with open(os.path.join(d, f"train_mat_{beh}.pkl"), "rb") as f:
            mats.append((pickle.load(f) != 0).astype(np.float32))
    with open(os.path.join(d, "test_mat.pkl"), "rb") as f:
        tst = (pickle.load(f) != 0).astype(np.float32)
    meta_mats = None
    if cfg.model.name.lower() == "hmgcr":
        meta_mats = []
        for mp in META_PATHS[name]:
            with open(os.path.join(d, f"train_mat_{mp}.pkl"), "rb") as f:
                meta_mats.append((pickle.load(f) != 0).astype(np.float32))
    kg_triplets = None
    if cfg.model.name.lower() == "kmclr":
        kg_path = os.path.join(d, "kg.txt")
        if os.path.exists(kg_path):
            kg_triplets = np.loadtxt(kg_path, dtype=np.int64, ndmin=2)
    meta_users = None
    if cfg.model.name.lower() == "cml":
        # shuffled meta user index (CML meta-round pool)
        with open(os.path.join(d, "meta_multi_single_beh_user_index_shuffle"),
                  "rb") as f:
            meta_users = np.asarray(pickle.load(f), np.int32)
    return bundle_from_behaviors(cfg, behaviors, mats, tst, meta_mats=meta_mats,
                                 meta_users=meta_users, kg_triplets=kg_triplets)


def load_mf(cfg) -> DataBundle:
    """Plain matrix-factorisation view of a multi-behavior dataset
    (``DataHandlerMF``, ``data_handler_multi_behavior.py:154-165``): only the
    target behavior's train matrix + test split, no propagation graphs."""
    d = _dataset_dir(cfg)
    behaviors = BEHAVIORS[cfg.data.name]
    target = cfg.model.get("target", "buy")
    beh = target if target in behaviors else behaviors[-1]
    with open(os.path.join(d, f"train_mat_{beh}.pkl"), "rb") as f:
        trn = (pickle.load(f) != 0).astype(np.float32).tocoo()
    with open(os.path.join(d, "test_mat.pkl"), "rb") as f:
        tst = (pickle.load(f) != 0).astype(np.float32)
    order = np.lexsort((trn.col, trn.row))
    return DataBundle(
        user_num=int(trn.shape[0]), item_num=int(trn.shape[1]),
        train_users=jnp.asarray(trn.row[order], dtype=jnp.int32),
        train_items=jnp.asarray(trn.col[order], dtype=jnp.int32),
        train_edge_set=sparse_ops.build_edge_set(trn),
        valid=None, test=_eval_data(tst.tocoo(), trn),
        extras={"train_mat_scipy": trn},
    )


def bundle_from_behaviors(cfg, behaviors, mats, tst_mat, meta_mats=None,
                          meta_users=None, kg_triplets=None) -> DataBundle:
    target = cfg.model.get("target", "buy")
    t_idx = behaviors.index(target) if target in behaviors else len(behaviors) - 1
    trn = (mats[t_idx] != 0).astype(np.float32).tocoo()
    n_users, n_items = trn.shape
    order = np.lexsort((trn.col, trn.row))

    extras = {
        "behaviors": list(behaviors),
        "behavior_graphs": [behavior_graphs(m) for m in mats],
        "behavior_mats_scipy": [m.tocoo() for m in mats],
        "train_mat_scipy": trn,
    }
    if meta_mats is not None:
        extras["meta_path_graphs"] = [behavior_graphs(m) for m in meta_mats]
    if meta_users is not None:
        extras["meta_users"] = jnp.asarray(meta_users.astype(np.int32))
    if kg_triplets is not None:
        extras["kg_triplets"] = kg_triplets
    if cfg.model.name.lower() == "smbrec":
        extras["beh_degrees"] = jnp.asarray(np.stack(
            [np.asarray((m != 0).sum(axis=1)).reshape(-1) for m in mats]
        ).astype(np.float32))
        # user co-interaction CSR (trainLabel @ trainLabel.T) for pos sampling
        lbl = (mats[t_idx] != 0) * 1.0
        co = (lbl @ lbl.T).tocsr()
        co.setdiag(0)
        co.eliminate_zeros()
        extras["co_user_indptr"] = jnp.asarray(co.indptr.astype(jnp.int32))
        extras["co_user_indices"] = jnp.asarray(co.indices.astype(jnp.int32))

    return DataBundle(
        user_num=int(n_users),
        item_num=int(n_items),
        train_users=jnp.asarray(trn.row[order], dtype=jnp.int32),
        train_items=jnp.asarray(trn.col[order], dtype=jnp.int32),
        train_edge_set=sparse_ops.build_edge_set(trn),
        valid=None,
        test=_eval_data(tst_mat.tocoo(), trn),
        extras=extras,
    )
