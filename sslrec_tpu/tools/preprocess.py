"""Offline dataset preprocessing (counterpart of the reference's per-dataset
``datasets/multi_behavior/*/datapreprocessing.py`` and
``datasets/social/yelp/statistic.py`` scripts, generalized into one CLI).

``kg`` subcommand — build a co-interaction knowledge graph: for each behavior
matrix ``train_mat_<beh>.pkl`` the item-item co-interaction counts ``IᵀI`` are
thresholded (> ``--threshold``, reference uses 3) and every surviving (i, j)
pair becomes a triple ``i <behavior_index> j`` in ``kg.txt`` (space-separated,
same file format the KG-enhanced multi-behavior models consume).

``stats`` subcommand — print user/item counts, per-split nnz and density for
any scenario directory (pickled matrices or tsv).

Usage::

    python -m sslrec_tpu.tools.preprocess kg --dir DIR \
        --behaviors view,cart,buy [--threshold 3] [--out kg.txt]
    python -m sslrec_tpu.tools.preprocess stats --dir DIR
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle

import numpy as np
import scipy.sparse as sp


def _load_mat(path: str) -> sp.csr_matrix:
    with open(path, "rb") as f:
        return sp.csr_matrix(pickle.load(f))


def build_cooc_kg(mats: list[sp.spmatrix], threshold: int = 3) -> np.ndarray:
    """[n_triples, 3] int array of (head_item, relation=behavior_idx, tail_item)."""
    triples = []
    for rel, m in enumerate(mats):
        b = (sp.csr_matrix(m) != 0).astype(np.int64)
        cooc = (b.T @ b).tocoo()
        keep = cooc.data > threshold
        h, t = cooc.row[keep], cooc.col[keep]
        triples.append(np.stack(
            [h, np.full(h.shape, rel, dtype=np.int64), t], axis=1))
    return np.concatenate(triples, axis=0) if triples else np.zeros((0, 3), np.int64)


def write_kg(out_path: str, triples: np.ndarray) -> None:
    np.savetxt(out_path, triples, fmt="%d", delimiter=" ")


def _cmd_kg(args) -> None:
    behaviors = [b for b in args.behaviors.split(",") if b]
    mats = [_load_mat(os.path.join(args.dir, f"train_mat_{b}.pkl"))
            for b in behaviors]
    triples = build_cooc_kg(mats, args.threshold)
    out = os.path.join(args.dir, args.out) if not os.path.isabs(args.out) else args.out
    write_kg(out, triples)
    for rel, b in enumerate(behaviors):
        print(f"behavior {b!r} (relation {rel}): "
              f"{int((triples[:, 1] == rel).sum())} triples")
    print(f"wrote {triples.shape[0]} triples -> {out}")


def _cmd_stats(args) -> None:
    for path in sorted(glob.glob(os.path.join(args.dir, "*.pkl"))):
        try:
            m = _load_mat(path)
        except Exception:  # category dicts etc.
            with open(path, "rb") as f:
                obj = pickle.load(f)
            print(f"{os.path.basename(path)}: {type(obj).__name__}")
            continue
        density = m.nnz / max(1, m.shape[0] * m.shape[1])
        print(f"{os.path.basename(path)}: shape={m.shape} nnz={m.nnz} "
              f"density={density:.6f}")
    for path in sorted(glob.glob(os.path.join(args.dir, "*.tsv"))):
        n = sum(1 for _ in open(path))
        print(f"{os.path.basename(path)}: {n} rows")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="sslrec_tpu.tools.preprocess")
    sub = p.add_subparsers(dest="cmd", required=True)
    kg = sub.add_parser("kg", help="build co-interaction kg.txt")
    kg.add_argument("--dir", required=True)
    kg.add_argument("--behaviors", required=True,
                    help="comma-separated behavior names (relation id = position)")
    kg.add_argument("--threshold", type=int, default=3)
    kg.add_argument("--out", default="kg.txt")
    kg.set_defaults(fn=_cmd_kg)
    st = sub.add_parser("stats", help="print dataset statistics")
    st.add_argument("--dir", required=True)
    st.set_defaults(fn=_cmd_stats)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
