"""Validation run: the REFERENCE torch ICLRec on sports, shipped model config.

Round-1 review flagged our ICLRec row (Recall@20 0.0248 @ epoch 200, vs
CL4SRec 0.0400 on the same split) as a possible porting bug.  Numeric parity
is already covered (tests/parity/test_seq_parity.py::test_iclrec_parity —
identical params => identical loss terms); this script adds *behavioral*
validation: it trains the reference implementation itself (torch CPU, via the
parity shim) on the identical sports split and prints the per-epoch valid
trajectory, directly comparable with our logs (log/iclrec/).

Why a gap vs CL4SRec is expected: the reference ICLRec's recommendation loss
is a 1-negative binary CE on the LAST position only
(models/sequential/iclrec.py:303-313), while CL4SRec trains full-softmax CE
over all items (models/sequential/cl4srec.py:179-181) — a far stronger
signal on sparse data.  The reference also ships ICLRec configured for
ml-20m, not sports (config/modelconf/iclrec.yml:24); sports is used here
because it is the only sequential dataset in the snapshot.

The faiss KMeans is replaced with a numpy Lloyd implementation with faiss
semantics preserved: centroids trained on raw mean-pooled outputs, queries
against RAW centroids (faiss index holds unnormalised centroids), returned
prototype embedding L2-normalised (iclrec.py:117-135).

Usage: PYTHONPATH=/root/repo python tools/validate_iclrec_ref.py [n_epochs]
Writes log to results/iclrec_ref_validation.log (committed evidence dir)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/repo")

from tests.parity.refshim import load_ref  # noqa: E402
from sslrec_tpu.data.sequential import read_tsv  # noqa: E402

N_EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
DATA_DIR = "/root/reference/datasets/sequential/sports_seq"
LOG_PATH = "results/iclrec_ref_validation.log"
SEED = 2023
BATCH = 512
KS = (5, 10, 20)


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG_PATH, "a") as f:
        f.write(line + "\n")


class NumpyKMeans:
    """Drop-in for the reference faiss KMeans (iclrec.py:79-135)."""

    def __init__(self, num_cluster, seed, hidden_size):
        self.num_cluster = num_cluster
        self.seed = seed
        self.hidden_size = hidden_size
        self.device = "cpu"
        self.centroids_raw = None
        self.centroids = []

    def train(self, x):
        x = np.asarray(x, np.float32)
        if x.shape[0] > self.num_cluster:
            rng = np.random.default_rng(self.seed)
            c = x[rng.choice(x.shape[0], self.num_cluster, replace=False)].copy()
            for _ in range(20):  # faiss Clustering niter=20 (iclrec.py:97)
                d = (
                    (x * x).sum(1, keepdims=True)
                    - 2.0 * x @ c.T
                    + (c * c).sum(1)
                )
                assign = d.argmin(1)
                for k in range(self.num_cluster):
                    m = assign == k
                    if m.any():
                        c[k] = x[m].mean(0)
                    else:  # faiss splits big clusters; random restart is enough here
                        c[k] = x[rng.integers(0, x.shape[0])]
            self.centroids_raw = c
        norm = np.maximum(np.linalg.norm(self.centroids_raw, axis=1, keepdims=True), 1e-12)
        self.centroids = torch.from_numpy((self.centroids_raw / norm).astype(np.float32))

    def query(self, x):
        x = np.asarray(x, np.float32)
        c = self.centroids_raw
        d = (x * x).sum(1, keepdims=True) - 2.0 * x @ c.T + (c * c).sum(1)
        idx = torch.LongTensor(d.argmin(1))
        return idx, self.centroids[idx]


def pad_left(seq, max_len):
    if len(seq) >= max_len:
        return seq[-max_len:]
    return [0] * (max_len - len(seq)) + seq


def main():
    os.makedirs("results", exist_ok=True)
    torch.manual_seed(SEED)
    np.random.seed(SEED)
    torch.set_num_threads(max(2, (os.cpu_count() or 8) - 4))

    ref, configs = load_ref("models.sequential.iclrec")
    ref.KMeans = NumpyKMeans

    trn_u, trn_s, trn_l = read_tsv(os.path.join(DATA_DIR, "train.tsv"))
    tst_u, tst_s, tst_l = read_tsv(os.path.join(DATA_DIR, "test.tsv"))
    item_num = max(max(max(s) for s in trn_s), max(trn_l),
                   max(max(s) for s in tst_s), max(tst_l))
    max_len = 50

    # prefix seq_aug exactly as the handler does (data/sequential.py:71-78)
    au, as_, al = list(trn_u), [list(s) for s in trn_s], list(trn_l)
    for uid, seq, last in zip(trn_u, trn_s, trn_l):
        for i in range(1, len(seq) - 1):
            au.append(uid)
            as_.append(seq[:i])
            al.append(seq[i])

    # reference SequentialDataset state (datasets_sequential.py:136-191)
    full_seq = {u: s for u, s in zip(trn_u, trn_s)}  # unexpanded train seqs
    n_rows = len(au)
    seqs_padded = np.asarray([pad_left(s, max_len) for s in as_], np.int64)
    uids = np.asarray(au, np.int64)
    lasts = np.asarray(al, np.int64)

    configs["data"].update({
        "type": "sequential", "name": "sports", "seq_aug": True,
        "neg_samp": True, "item_num": item_num, "user_num": max(trn_u) + 1,
    })
    configs["train"].update({"batch_size": BATCH, "seed": SEED, "log_loss": False})
    configs["test"].update({"metrics": ["recall", "ndcg"], "k": list(KS),
                            "batch_size": BATCH})
    configs["model"].update({
        "name": "iclrec", "dropout_rate": 0.1, "n_layers": 2,
        "embedding_size": 64, "n_heads": 2, "max_seq_len": max_len,
        "cl_weight": 0.1, "intent_cl_weight": 1.0, "tau": 1,
        "num_intent_clusters": 256,
    })

    class _DH:  # the reference model only reads configs, not the handler
        pass

    model = ref.ICLRec(_DH())
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    log(f"reference ICLRec on sports: {n_rows} aug train rows, "
        f"{len(tst_u)} test users, item_num={item_num}")

    # test tensors + history mask lists
    tst_seqs = torch.from_numpy(
        np.asarray([pad_left(s, max_len) for s in tst_s], np.int64))
    tst_last = np.asarray(tst_l, np.int64)

    def sample_negs():
        negs = np.empty(n_rows, np.int64)
        for i in range(n_rows):
            seq = full_seq[au[i]]
            last = al[i]
            while True:
                cand = np.random.randint(1, item_num)
                if cand not in seq and cand != last:
                    break
            negs[i] = cand
        return negs

    def evaluate():
        model.eval()
        sums = {f"recall@{k}": 0.0 for k in KS}
        sums.update({f"ndcg@{k}": 0.0 for k in KS})
        with torch.no_grad():
            for s in range(0, len(tst_u), BATCH):
                e = min(s + BATCH, len(tst_u))
                scores = model.full_predict((None, tst_seqs[s:e], None))
                for i in range(e - s):  # mask input-seq history (metrics.py:129-135)
                    scores[i, tst_s[s + i]] = -1e8
                top = torch.topk(scores, k=max(KS)).indices.numpy()
                hit_pos = (top == tst_last[s:e, None])
                for k in KS:
                    hits = hit_pos[:, :k]
                    sums[f"recall@{k}"] += hits.any(1).sum()
                    ranks = hits.argmax(1)
                    gains = hits.any(1) / np.log2(ranks + 2)
                    sums[f"ndcg@{k}"] += gains.sum()
        n = float(len(tst_u))
        return {m: v / n for m, v in sums.items()}

    for epoch in range(N_EPOCHS):
        t0 = time.time()
        # --- cluster pass (ICLRecTrainer.train_epoch, trainer.py:306-321) ---
        model.eval()
        means = []
        with torch.no_grad():
            for s in range(0, n_rows, BATCH):
                batch = torch.from_numpy(seqs_padded[s:s + BATCH])
                means.append(model(batch, return_mean=True).numpy())
        model.cluster.train(np.concatenate(means, 0))
        t_cluster = time.time() - t0

        # --- train pass ---
        model.train()
        negs = sample_negs()
        order = np.random.permutation(n_rows)
        tot = {}
        nb = 0
        for s in range(0, n_rows, BATCH):
            idx = order[s:s + BATCH]
            batch = (torch.from_numpy(uids[idx]),
                     torch.from_numpy(seqs_padded[idx]),
                     torch.from_numpy(lasts[idx]),
                     torch.from_numpy(negs[idx]))
            opt.zero_grad()
            loss, ld = model.cal_loss(batch)
            loss.backward()
            opt.step()
            for name, v in ld.items():
                tot[name] = tot.get(name, 0.0) + float(v)
            nb += 1
        t_train = time.time() - t0 - t_cluster

        res = evaluate()
        losses = " ".join(f"{k}: {v / nb:.4f}" for k, v in sorted(tot.items()))
        metrics = " ".join(f"{k}: {v:.5f}" for k, v in sorted(res.items()))
        log(f"[Epoch {epoch:3d}] {losses} | {metrics} "
            f"(cluster {t_cluster:.0f}s, train {t_train:.0f}s)")


if __name__ == "__main__":
    main()
