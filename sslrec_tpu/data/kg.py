"""Knowledge-graph data handler (mind / alibaba-fashion / last-fm).

Parity with ``data_utils/data_handler_kg.py``: CF files are ``u i1 i2 ...``
lines (``_read_cf`` ``:34-43``); KG triples from ``kg_final.txt`` get inverse
relations appended (relation ids shifted by +1 to reserve the 'interact'
relation, ``_read_triplets`` ``:95-119``); statistics (entity/node/relation
counts) are returned on the bundle instead of written into a global config.

Device artifacts: KG edge arrays (head, tail, relation) capped per head at
``triplet_num`` like KGCL's ``_samp_edge_from_dict`` (``models/kg/kgcl.py``),
the square normalised UI adjacency as a *maskable* structure (base values 1 +
precomputed rect-edge id map so per-view normalisation can be recomputed on
device from a Bernoulli edge mask), and padded eval structures.

Note: this reference snapshot ships incomplete KG datasets (no ``train.txt``);
real-data runs need complete files — logic is covered by synthetic-data tests.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from sslrec_tpu.data.base import DataBundle, EvalData
from sslrec_tpu.ops import sparse as sparse_ops
from sslrec_tpu.ops.pallas_spmm import maybe_pallas

_DEFAULT_DATA_ROOT = "/root/reference/datasets"


def read_cf(path: str) -> np.ndarray:
    """u i1 i2 ... lines → unique [n, 2] (u, i) pairs (order per reference)."""
    pairs = []
    with open(path) as f:
        for line in f:
            toks = [int(x) for x in line.strip().split(" ")]
            u, items = toks[0], sorted(set(toks[1:]))
            for i in items:
                pairs.append((u, i))
    return np.asarray(pairs, dtype=np.int64)


def read_triplets(path: str):
    """kg_final.txt (h r t) → inverse-augmented triples + stats.

    Matches ``_read_triplets`` (``data_handler_kg.py:95-119``): inverse
    relations offset by max+1, then all relations shifted +1 for 'interact'.
    """
    can = np.loadtxt(path, dtype=np.int64, ndmin=2)
    can = np.unique(can, axis=0)
    inv = can.copy()
    inv[:, 0] = can[:, 2]
    inv[:, 2] = can[:, 0]
    inv[:, 1] = can[:, 1] + can[:, 1].max() + 1
    can = can.copy()
    can[:, 1] = can[:, 1] + 1
    inv[:, 1] = inv[:, 1] + 1
    triplets = np.concatenate([can, inv], axis=0)
    n_entities = int(max(triplets[:, 0].max(), triplets[:, 2].max()) + 1)
    n_relations = int(triplets[:, 1].max() + 1)
    return triplets, n_entities, n_relations


def cap_edges_per_head(triplets: np.ndarray, cap: int, seed: int = 0):
    """≤cap random triples per head (KGCL ``_samp_edge_from_dict``)."""
    rng = np.random.default_rng(seed)
    by_head = defaultdict(list)
    for h, r, t in triplets:
        by_head[int(h)].append((int(r), int(t)))
    heads, rels, tails = [], [], []
    for h, lst in by_head.items():
        if len(lst) > cap:
            idx = rng.choice(len(lst), cap, replace=False)
            lst = [lst[i] for i in idx]
        for r, t in lst:
            heads.append(h)
            rels.append(r)
            tails.append(t)
    return (np.asarray(heads, np.int32), np.asarray(rels, np.int32),
            np.asarray(tails, np.int32))


class MaskableBiAdj:
    """Square [U+I, U+I] adjacency whose per-view normalised values are a
    function of a Bernoulli mask over the *rectangular* UI edges.

    ``graph``: edge structure with base values 1 (CooGraph or PallasGraph);
    ``rect_id``: [nnz_bi] map from bi-edge to its rect edge;
    ``view_vals(mask)``: D^-1/2 A D^-1/2 values for the masked graph, computed
    on device (replaces KGCL's per-epoch host rebuild, ``kgcl.py:216-247``).
    """

    def __init__(self, ui_mat: sp.coo_matrix, n_users: int, n_items: int):
        coo = ui_mat.tocoo()
        nnz = coo.nnz
        rows = np.concatenate([coo.row, coo.col + n_users])
        cols = np.concatenate([coo.col + n_users, coo.row])
        rect = np.concatenate([np.arange(nnz), np.arange(nnz)])
        order = np.lexsort((cols, rows))
        rows, cols, rect = rows[order], cols[order], rect[order]
        self.n_nodes = n_users + n_items
        # Pallas ON by default for the KG family's UI propagation: the
        # scatter-free kernel beats the XLA segment-sum path even with the
        # data-dependent view values riding the edge_ids gather (KGCL
        # synthetic-at-scale epoch 47 -> 41 s from this flip alone); only
        # two kernel instances compile (the hop loop is unrolled)
        self.graph = maybe_pallas(sp.coo_matrix(
            (np.ones(2 * nnz, np.float32), (rows, cols)),
            shape=(self.n_nodes, self.n_nodes)), use=True)
        self._rows = jnp.asarray(rows.astype(np.int32))
        self._cols = jnp.asarray(cols.astype(np.int32))
        from sslrec_tpu.ops.pallas_segment import SegmentOps
        self._seg_rows = SegmentOps(self._rows, self.n_nodes)
        self.rect_id = jnp.asarray(rect.astype(np.int32))
        self.rect_item_ids = jnp.asarray(coo.col.astype(np.int32))  # [nnz_rect]
        self.nnz_rect = nnz

    def view_vals(self, rect_mask: jnp.ndarray) -> jnp.ndarray:
        """[nnz_rect] 0/1 mask → [nnz_bi] normalised edge values (eps 1e-7)."""
        import jax

        me = rect_mask[self.rect_id]
        deg = self._seg_rows.sum(me) + 1e-7
        dinv = deg ** -0.5
        return me * dinv[self._rows] * dinv[self._cols]


def _eval_from_dicts(train_dict, test_dict, n_users, n_items):
    def to_mat(d):
        rows, cols = [], []
        for u, items in d.items():
            rows.extend([u] * len(items))
            cols.extend(items)
        return sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                             shape=(n_users, n_items))

    trn = to_mat(train_dict)
    tst = to_mat(test_dict)
    csr = tst.tocsr()
    test_users = np.where(np.diff(csr.indptr) > 0)[0].astype(np.int32)
    return EvalData(
        test_users=jnp.asarray(test_users),
        ground_truth=sparse_ops.build_padded_rows(tst),
        history=sparse_ops.build_padded_rows(trn),
        n_test_users=int(test_users.shape[0]),
    ), trn


def _dataset_dir(cfg) -> str:
    root = cfg.data.get("dir") or _DEFAULT_DATA_ROOT
    name = cfg.data.name
    return os.path.join(root, "kg", f"{name}_kg")


def _resolve(d: str, fname: str) -> str:
    """Find a dataset file in ``d``, falling back to the read-only reference
    directory of the same dataset — derived split dirs (tools/split_kg.py)
    carry train/valid/test.txt but not the 3.8 MB kg_final.txt."""
    p = os.path.join(d, fname)
    if os.path.exists(p):
        return p
    fallback = os.path.join(_DEFAULT_DATA_ROOT, "kg", os.path.basename(d), fname)
    if os.path.exists(fallback):
        return fallback
    return p  # let the open() raise with the primary path


def load(cfg) -> DataBundle:
    d = _dataset_dir(cfg)
    train_cf = read_cf(_resolve(d, "train.txt"))
    test_cf = read_cf(_resolve(d, "test.txt"))
    valid_cf = None
    vp = os.path.join(d, "valid.txt")  # only derived splits have one
    if os.path.exists(vp):
        valid_cf = read_cf(vp)
    triplets, n_entities, n_relations = read_triplets(_resolve(d, "kg_final.txt"))
    return bundle_from_kg(cfg, train_cf, test_cf, triplets, n_entities,
                          n_relations, valid_cf=valid_cf)


def bundle_from_kg(cfg, train_cf, test_cf, triplets, n_entities, n_relations,
                   valid_cf=None) -> DataBundle:
    n_users = int(max(train_cf[:, 0].max(), test_cf[:, 0].max()) + 1)
    n_items = int(max(train_cf[:, 1].max(), test_cf[:, 1].max()) + 1)
    if valid_cf is not None and len(valid_cf):
        n_users = max(n_users, int(valid_cf[:, 0].max() + 1))
        n_items = max(n_items, int(valid_cf[:, 1].max() + 1))

    train_dict = defaultdict(list)
    for u, i in train_cf:
        train_dict[int(u)].append(int(i))
    test_dict = defaultdict(list)
    for u, i in test_cf:
        test_dict[int(u)].append(int(i))

    test_eval, trn_mat = _eval_from_dicts(train_dict, test_dict, n_users, n_items)
    valid_eval = None
    if valid_cf is not None and len(valid_cf):
        valid_dict = defaultdict(list)
        for u, i in valid_cf:
            valid_dict[int(u)].append(int(i))
        valid_eval, _ = _eval_from_dicts(train_dict, valid_dict, n_users, n_items)
    trn_coo = trn_mat.tocoo()
    order = np.lexsort((trn_coo.col, trn_coo.row))

    cap = int(cfg.model.get("triplet_num", 15))
    heads, rels, tails = cap_edges_per_head(triplets, cap, seed=int(cfg.train.seed))

    extras = {
        "kg_heads": jnp.asarray(heads),
        "kg_rels": jnp.asarray(rels),
        "kg_tails": jnp.asarray(tails),
        "kg_triplets_full": triplets,  # host, for TransE batches
        "bi_adj_maskable": MaskableBiAdj(trn_coo, n_users, n_items),
        "entity_num": n_entities,
        "relation_num": n_relations,
        "node_num": n_entities + n_users,
        "train_mat_scipy": trn_coo,
    }
    return DataBundle(
        user_num=n_users,
        item_num=n_items,
        train_users=jnp.asarray(trn_coo.row[order], dtype=jnp.int32),
        train_items=jnp.asarray(trn_coo.col[order], dtype=jnp.int32),
        train_edge_set=sparse_ops.build_edge_set(trn_mat),
        valid=valid_eval,
        test=test_eval,
        extras=extras,
    )
