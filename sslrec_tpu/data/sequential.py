"""Sequential data handler (sports / ml-20m TSV sequence files).

Parity with ``data_utils/data_handler_sequential.py`` + ``SequentialDataset``
(``data_utils/datasets_sequential.py:136-191``): TSV rows ``uid \t seq \t last``
(1-indexed items, header skipped); optional prefix augmentation (``seq_aug``);
left-padding/truncation to ``max_seq_len`` with pad id 0; test ground truth is
the single ``last_item`` and eval masks the items of the user's own history
(the reference masks via ``user_history_lists``, ``trainer/metrics.py:129-135``).

TPU-natively everything lands as fixed-shape int32 arrays: train rows carry the
*concatenated* (seq + last) window used by BERT4Rec-style masking, plus the
plain input seq for next-item models.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from sslrec_tpu.data.base import DataBundle, EvalData
from sslrec_tpu.ops import sparse as sparse_ops

_DEFAULT_DATA_ROOT = "/root/reference/datasets"


def read_tsv(path: str):
    uids, seqs, lasts = [], [], []
    with open(path) as f:
        next(f)  # header
        for line in f:
            uid, seq, last = line.strip().split("\t")
            uids.append(int(uid))
            seqs.append([int(x) for x in seq.split(" ")])
            lasts.append(int(last))
    return uids, seqs, lasts


def _pad_left(seq, max_len):
    if len(seq) >= max_len:
        return seq[-max_len:]
    return [0] * (max_len - len(seq)) + seq


def _dataset_dir(cfg) -> str:
    root = cfg.data.get("dir") or _DEFAULT_DATA_ROOT
    name = cfg.data.name
    sub = {"sports": "sports_seq", "ml-20m": "ml-20m_seq"}
    return os.path.join(root, "sequential", sub.get(name, name))


def load(cfg) -> DataBundle:
    d = _dataset_dir(cfg)
    trn_u, trn_s, trn_l = read_tsv(os.path.join(d, "train.tsv"))
    tst_u, tst_s, tst_l = read_tsv(os.path.join(d, "test.tsv"))
    return bundle_from_seqs(cfg, (trn_u, trn_s, trn_l), (tst_u, tst_s, tst_l))


def bundle_from_seqs(cfg, train, test) -> DataBundle:
    trn_u, trn_s, trn_l = train
    tst_u, tst_s, tst_l = test
    max_len = int(cfg.model.max_seq_len)
    max_item = max(max(max(s) for s in trn_s), max(trn_l),
                   max(max(s) for s in tst_s), max(tst_l))
    user_num = max(max(trn_u), max(tst_u)) + 1
    item_num = max_item  # items are 1-indexed (handler ``_set_statistics``)

    # optional prefix expansion ([1,2,3] -> ([1],2), ([1,2],3)) — seq_aug
    if cfg.data.get("seq_aug", False):
        au, as_, al = list(trn_u), [list(s) for s in trn_s], list(trn_l)
        for uid, seq, last in zip(trn_u, trn_s, trn_l):
            for i in range(1, len(seq) - 1):
                au.append(uid)
                as_.append(seq[:i])
                al.append(seq[i])
        trn_u, trn_s, trn_l = au, as_, al

    seqs = np.asarray([_pad_left(s, max_len) for s in trn_s], np.int32)
    # BERT4Rec-style window: last max_len of (seq + [last])
    seq_last = np.asarray([_pad_left(list(s) + [l], max_len)
                           for s, l in zip(trn_s, trn_l)], np.int32)
    lasts = np.asarray(trn_l, np.int32)
    uids = np.asarray(trn_u, np.int32)

    # per-user full history (+ last) for negative-sampling rejection
    hrows, hcols = [], []
    hist = {}
    for uid, s, l in zip(trn_u, trn_s, trn_l):
        if uid not in hist:
            hist[uid] = set()
        hist[uid].update(s)
        hist[uid].add(l)
    for uid, items in hist.items():
        hrows.extend([uid] * len(items))
        hcols.extend(items)
    # score width = item_num + 1 (column index == item id, col 0 = pad)
    width = item_num + 1
    hist_mat = sp.coo_matrix((np.ones(len(hrows), np.float32), (hrows, hcols)),
                             shape=(user_num, width))

    # test: ground truth = single last item; history = the input sequence items
    gt_rows, gt_cols = [], []
    th_rows, th_cols = [], []
    tst_seqs = np.asarray([_pad_left(s, max_len) for s in tst_s], np.int32)
    for uid, s, l in zip(tst_u, tst_s, tst_l):
        gt_rows.append(uid)
        gt_cols.append(l)
        for it in set(s):
            th_rows.append(uid)
            th_cols.append(it)
    gt_mat = sp.coo_matrix((np.ones(len(gt_rows), np.float32), (gt_rows, gt_cols)),
                           shape=(user_num, width))
    th_mat = sp.coo_matrix((np.ones(len(th_rows), np.float32), (th_rows, th_cols)),
                           shape=(user_num, width))
    test_eval = EvalData(
        test_users=jnp.asarray(np.asarray(tst_u, np.int32)),
        ground_truth=sparse_ops.build_padded_rows(gt_mat),
        history=sparse_ops.build_padded_rows(th_mat),
        n_test_users=len(tst_u),
    )

    return DataBundle(
        user_num=int(user_num),
        item_num=int(item_num),
        train_users=jnp.asarray(uids),
        train_items=jnp.asarray(lasts),
        train_edge_set=sparse_ops.build_edge_set(hist_mat),
        valid=None,  # reference uses test.tsv for both (handler :22-23)
        test=test_eval,
        extras={
            "train_arrays": {
                "user": jnp.asarray(uids),
                "seq": jnp.asarray(seqs),
                "seq_last": jnp.asarray(seq_last),
                "pos": jnp.asarray(lasts),
            },
            # unexpanded per-user training history (DCRec graph construction)
            "user_seq_table": jnp.asarray(np.stack(
                [_pad_left(s, max_len) for s in train[1]]).astype(np.int32))
            if len(train[1]) else jnp.zeros((0, max_len), jnp.int32),
            "user_seq_uids": jnp.asarray(np.asarray(train[0], np.int32)),
            "test_seqs": jnp.asarray(tst_seqs),
            "test_uids": jnp.asarray(np.asarray(tst_u, np.int32)),
            "score_cols": width,
            "neg_low": 1,  # sequential neg sampling draws from [1, item_num)
        },
    )
