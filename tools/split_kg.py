"""Derive train/valid/test CF splits for KG datasets that ship only test.txt.

The reference snapshot's KG datasets are incomplete: alibaba-fashion has the
full knowledge graph (kg_final.txt, 279,155 canonical triples) plus 114,737
user lines / 400,583 interactions in ``test.txt``, but no ``train.txt`` — so
no KG model can be trained on real data as shipped.  This tool splits that
interaction file per user into train/valid/test (default 80/10/10, seeded,
deterministic) in the exact line format the loader expects
(reference ``data_utils/data_handler_kg.py:16-43``: ``u i1 i2 ...``).

Per-user minimums keep every user trainable: n=2 items → 1 train / 1 test;
n>=3 → at least 1 in each split, remainder to train.

Usage::

    python tools/split_kg.py --dataset alibaba-fashion \
        [--src /root/reference/datasets] [--out datasets] [--seed 2023]

Writes ``<out>/kg/<dataset>_kg/{train,valid,test}.txt``.  kg_final.txt is NOT
copied — the loader falls back to the reference directory for files the
derived directory lacks.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def split_user(items: list[int], rng: np.random.Generator):
    n = len(items)
    order = rng.permutation(n)
    items = [items[i] for i in order]
    if n == 1:
        return items, [], []
    # alibaba-fashion is head-heavy on tiny users (median 3 items): a blanket
    # 1-valid-per-user minimum would put 23% of all interactions in valid and
    # starve train to 48%.  Valid items are carved only from users with >= 4
    # items (34k users — ample for early stopping); test always gets >= 1.
    n_test = max(1, n // 10)
    n_valid = max(1, n // 10) if n >= 4 else 0
    n_train = n - n_test - n_valid
    return items[:n_train], items[n_train:n_train + n_valid], items[n_train + n_valid:]


def derive_splits(src_file: str, seed: int):
    """Returns (train, valid, test) dicts u -> sorted item list."""
    users = []
    with open(src_file) as f:
        for line in f:
            toks = [int(x) for x in line.split()]
            if len(toks) >= 2:
                users.append((toks[0], sorted(set(toks[1:]))))
    train, valid, test = {}, {}, {}
    for u, items in users:
        # independent per-user stream: the split of user u is invariant to the
        # presence/order of other users in the file
        rng = np.random.default_rng(np.random.SeedSequence([seed, u]))
        tr, va, te = split_user(items, rng)
        if tr:
            train[u] = sorted(tr)
        if va:
            valid[u] = sorted(va)
        if te:
            test[u] = sorted(te)
    return train, valid, test


def write_split(path: str, d: dict):
    with open(path, "w") as f:
        for u in sorted(d):
            f.write(" ".join(str(x) for x in [u] + d[u]) + "\n")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="alibaba-fashion")
    p.add_argument("--src", default="/root/reference/datasets")
    p.add_argument("--out", default="datasets")
    p.add_argument("--seed", type=int, default=2023)
    args = p.parse_args(argv)

    src = os.path.join(args.src, "kg", f"{args.dataset}_kg", "test.txt")
    out_dir = os.path.join(args.out, "kg", f"{args.dataset}_kg")
    os.makedirs(out_dir, exist_ok=True)
    train, valid, test = derive_splits(src, args.seed)
    write_split(os.path.join(out_dir, "train.txt"), train)
    write_split(os.path.join(out_dir, "valid.txt"), valid)
    write_split(os.path.join(out_dir, "test.txt"), test)
    n = lambda d: sum(len(v) for v in d.values())
    print(f"{args.dataset}: {len(train)} users | interactions "
          f"train={n(train)} valid={n(valid)} test={n(test)} -> {out_dir}")


if __name__ == "__main__":
    main()
