"""Benchmark suite: train/eval throughput + MFU across scenario-representative
models (LightGCN, SGL, BERT4Rec, KGCL, CML — general CF, CF-SSL, sequential,
KG, multi-behavior), plus component benches for the flagship Pallas SpMM
kernel and the evaluator's two history-mask paths.

Output contract (round 4 — the round-3 all-or-nothing format lost the whole
suite to a driver timeout, BENCH_r03 rc=124):

- each suite entry prints its own JSON line (``{"bench_entry": name, ...}``)
  the moment it completes, and
- a CUMULATIVE combined line (the ``{"metric": ...}`` headline format) is
  re-printed after every entry, so whenever the process is killed the last
  complete stdout line is the best-so-far summary with every finished entry.

Budgets: each entry gets a wall budget (``SSLREC_BENCH_BUDGET_S`` overrides
the per-entry defaults below); ``_throughput`` adapts by timing fewer epochs
when the entry is over budget (always >= 1 timed epoch).  A global deadline
(``SSLREC_BENCH_DEADLINE_S``, default 510 s) skips remaining entries outright
so the driver's window is never exceeded.

Headline metric stays the round-1 comparable (LightGCN/Yelp train examples/s
vs the faithful torch-CPU rerun of the reference step — the only
reference-implementation number obtainable here, see BASELINE.md); the
``suite`` field carries the full table: per-model steady-state epoch seconds,
train examples/s, eval users/s, and an edge-FLOPs MFU estimate.

MFU convention: "useful" model FLOPs only — 2·nnz·d per spmm application
(gather-multiply-accumulate over edges), ×layers, ×(fwd + dx backward), plus the
dense scoring matmul for eval — divided by the chip's bf16 peak (v5e: 197
TFLOP/s).  Graph propagation is HBM-bound, so single-digit MFU is expected; the
number is tracked to catch regressions, not to flatter.

KGCL runs on synthetic KG data at realistic scale because no reference KG
dataset ships a train split (verified: datasets/kg/*/ have no train.txt).
Select a subset with SSLREC_BENCH_MODELS=lightgcn,sgl,...
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time

from sslrec_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np
import jax

# torch-CPU faithful rerun of the reference LightGCN training step (batch 4096,
# yelp, full-graph forward per batch, edge dropout, Adam) = 987 ms/step.
# Round-2 repo-side wins (batched sort-based negative sampling; PRF-addressed
# gather-free edge dropout) took the epoch from 0.876 s (round 1) to ~0.53 s.
BASELINE_EXAMPLES_PER_S = 4149.0
PEAK_FLOPS = 197e12  # TPU v5e bf16

# per-entry wall budgets (seconds); compile time through the remote tunnel
# dominates, so entries whose programs are big (KGCL's RGAT) get more
_BUDGETS = {
    "lightgcn": 75.0,
    "sgl": 75.0,
    "bert4rec": 75.0,
    "kgcl": 200.0,
    "cml": 60.0,
    "eval": 60.0,
    "spmm": 90.0,
}


def _budget(name: str) -> float:
    env = os.environ.get("SSLREC_BENCH_BUDGET_S")
    if env:
        return float(env)
    return _BUDGETS.get(name, 90.0)


class _Null:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


_DATA_CACHE: dict = {}


def _load_cf(model_name: str, dataset: str):
    """(cfg, data) with the DataBundle shared across same-dataset general_cf
    entries (lightgcn/sgl/eval all load the identical yelp pickles + bi-adj;
    ~30 s each through the loader)."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.registry import load_data

    cfg = load_config(model_name, dataset=dataset)
    key = (str(cfg.data.type), str(cfg.data.name))
    if key not in _DATA_CACHE:
        _DATA_CACHE[key] = load_data(cfg)
    return cfg, _DATA_CACHE[key]


def _throughput(cfg, data, n_epochs=3, budget_s=None, t_start=None,
                n_warmup=2):
    """(epoch_s, train_examples_per_s, eval_users_per_s) steady-state.

    ``budget_s``/``t_start``: soft wall budget for the whole entry — after
    each timed epoch, stop early (>=1 epoch timed) once 60% of the budget is
    spent, leaving room for the eval compile + timed eval."""
    from sslrec_tpu.models.registry import build_model
    from sslrec_tpu.trainer.trainer import Trainer
    from sslrec_tpu.trainer.metrics import Evaluator

    t_start = t_start or time.time()
    model = build_model(cfg, data)
    trainer = Trainer(cfg, model, data, logger=_Null())
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    opt_state = (model.init_opt_state(params)
                 if hasattr(model, "init_opt_state")
                 else trainer.optimizer.init(params))
    # two warmup epochs by default: several models compile a SECOND program at
    # epoch 1 (fix_steps view banks / epoch-schedule branches) — e.g. CML's
    # steady state is 0.15 s/epoch but its epoch 1 costs 12 s of compile.
    # Single-program models (KGCL) pass n_warmup=1 to save a 38 s epoch.
    for e in range(n_warmup):
        key, k = jax.random.split(key)
        params, opt_state, aux = trainer.train_epoch(params, opt_state, k, e)
    # device_get, NOT block_until_ready: donated-buffer outputs on the remote
    # axon platform can report ready early (observed: a bert4rec epoch
    # "measured" 2 ms); fetching the loss scalars forces real completion
    jax.device_get(aux)
    t0 = time.time()
    done = 0
    for e in range(n_warmup, n_warmup + n_epochs):
        key, k = jax.random.split(key)
        params, opt_state, aux = trainer.train_epoch(params, opt_state, k, e)
        jax.device_get(aux)
        done += 1
        if budget_s and done >= 1 and (time.time() - t_start) > 0.6 * budget_s:
            break
    epoch_s = (time.time() - t0) / done

    ev = Evaluator(model, data.test, cfg)
    jax.device_get(ev(params))  # compile
    t0 = time.time()
    jax.device_get(ev(params))
    eval_s = time.time() - t0
    return epoch_s, data.n_train / epoch_s, int(data.test.n_test_users) / eval_s


def _edge_flops_per_epoch(nnz, d, layers, n_batches, spmm_apps_per_step=None):
    """2·nnz·d per spmm application; fwd L + backward dx L per step."""
    apps = spmm_apps_per_step if spmm_apps_per_step is not None else 2 * layers
    return 2.0 * nnz * d * apps * n_batches


def _edge_fetch_ns(epoch_s, fl, d):
    """Achieved ns per edge-row fetch — the honest roofline axis for the
    HBM/latency-bound graph models (random-row gathers are fetch-count bound
    at ~6.5 ns/row on v5e regardless of row bytes, BASELINE.md r3 analysis).
    fetches/epoch = edge-FLOPs / (2·d)."""
    return epoch_s / (fl / (2.0 * d)) * 1e9


def bench_lightgcn(budget_s=None, t_start=None):
    cfg, data = _load_cf("lightgcn", "yelp")
    epoch_s, ex_s, ev_s = _throughput(cfg, data, budget_s=budget_s,
                                      t_start=t_start)
    g = data.extras["bi_adj"]
    nnz = getattr(g, "nnz", None) or g.rows.shape[0]
    n_batches = -(-data.n_train // int(cfg.train.batch_size))
    fl = _edge_flops_per_epoch(nnz, int(cfg.model.embedding_size),
                               int(cfg.model.layer_num), n_batches)
    return {"epoch_s": epoch_s, "train_examples_per_s": ex_s,
            "eval_users_per_s": ev_s, "mfu": fl / epoch_s / PEAK_FLOPS,
            "edge_fetch_ns": _edge_fetch_ns(
                epoch_s, fl, int(cfg.model.embedding_size))}


def bench_sgl(budget_s=None, t_start=None):
    cfg, data = _load_cf("sgl", "yelp")
    epoch_s, ex_s, ev_s = _throughput(cfg, data, budget_s=budget_s,
                                      t_start=t_start)
    g = data.extras["bi_adj"]
    nnz = getattr(g, "nnz", None) or g.rows.shape[0]
    n_batches = -(-data.n_train // int(cfg.train.batch_size))
    # 3 propagation stacks (2 views + clean), fwd + dx
    fl = _edge_flops_per_epoch(nnz, int(cfg.model.embedding_size),
                               int(cfg.model.layer_num), n_batches,
                               spmm_apps_per_step=3 * 2 * int(cfg.model.layer_num))
    return {"epoch_s": epoch_s, "train_examples_per_s": ex_s,
            "eval_users_per_s": ev_s, "mfu": fl / epoch_s / PEAK_FLOPS,
            "edge_fetch_ns": _edge_fetch_ns(
                epoch_s, fl, int(cfg.model.embedding_size))}


def bench_bert4rec(budget_s=None, t_start=None):
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.registry import load_data

    # fast mode opt-in (shipped default is the reference-exact all-position
    # CE, masked_budget: 0) — the bench tracks the optimised TPU path
    cfg = load_config("bert4rec", dataset="sports",
                      overrides={"model.masked_budget": 16})
    data = load_data(cfg)
    epoch_s, ex_s, ev_s = _throughput(cfg, data, budget_s=budget_s,
                                      t_start=t_start)
    # transformer FLOPs: 2·params_dense·tokens·3 (fwd+bwd) + CE scoring
    d = int(cfg.model.embedding_size)
    L = int(cfg.model.get("n_layers", 2))
    seq = int(cfg.model.max_seq_len)
    per_layer = 4 * d * d + 2 * d * 4 * d  # attn proj + ffn
    toks = data.n_train * seq
    fl = 2.0 * per_layer * L * toks * 3
    return {"epoch_s": epoch_s, "train_examples_per_s": ex_s,
            "eval_users_per_s": ev_s, "mfu": fl / epoch_s / PEAK_FLOPS}


def _synthetic_kg_scaled(n_users=20000, n_items=15000, n_ents=30000,
                         n_rels=20, n_cf=200000, n_trip=150000, seed=0):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, n_users, n_cf + n_users)
    users[:n_users] = np.arange(n_users)
    items = rng.integers(0, n_items, n_cf + n_users)
    train_cf = np.unique(np.stack([users, items], 1), axis=0)
    tu = rng.integers(0, n_users, 20000)
    ti = rng.integers(0, n_items, 20000)
    test_cf = np.unique(np.stack([tu, ti], 1), axis=0)
    raw = np.stack([rng.integers(0, n_ents, n_trip),
                    rng.integers(0, n_rels, n_trip),
                    rng.integers(0, n_ents, n_trip)], 1)
    raw[: n_ents, 0] = np.arange(n_ents)
    can = np.unique(raw, axis=0)
    inv = can.copy()
    inv[:, 0], inv[:, 2] = can[:, 2], can[:, 0]
    inv[:, 1] = can[:, 1] + can[:, 1].max() + 1
    can = can.copy()
    can[:, 1] += 1
    inv[:, 1] += 1
    trip = np.concatenate([can, inv])
    return (train_cf.astype(np.int64), test_cf.astype(np.int64), trip,
            int(max(trip[:, 0].max(), trip[:, 2].max()) + 1),
            int(trip[:, 1].max() + 1))


def bench_kgcl(budget_s=None, t_start=None):
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data import kg as kg_data

    train_cf, test_cf, trip, n_ent, n_rel = _synthetic_kg_scaled()
    # ~340 ms/step x 54 steps: one whole-epoch device call exceeds what the
    # remote-execution transport tolerates (~15-20 s) and surfaces as a TPU
    # device error; chunk the scan (RNG/steps identical, see trainer.py)
    cfg = load_config("kgcl", overrides={"train.scan_chunk": 16})
    data = kg_data.bundle_from_kg(cfg, train_cf, test_cf, trip, n_ent, n_rel)
    epoch_s, ex_s, ev_s = _throughput(cfg, data, budget_s=budget_s,
                                      t_start=t_start, n_warmup=1)
    d = int(cfg.model.embedding_size)
    n_batches = -(-data.n_train // int(cfg.train.batch_size))
    # RGAT over KG triples (fwd+dx) + 2 UI views + clean propagation
    ui_nnz = 2 * len(train_cf)
    fl = _edge_flops_per_epoch(len(trip) + 3 * ui_nnz, d,
                               1, n_batches, spmm_apps_per_step=2)
    return {"epoch_s": epoch_s, "train_examples_per_s": ex_s,
            "eval_users_per_s": ev_s, "mfu": fl / epoch_s / PEAK_FLOPS,
            "edge_fetch_ns": _edge_fetch_ns(epoch_s, fl, d)}


def bench_cml(budget_s=None, t_start=None):
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.registry import load_data

    cfg = load_config("cml", dataset="retail_rocket")
    data = load_data(cfg)
    epoch_s, ex_s, ev_s = _throughput(cfg, data, budget_s=budget_s,
                                      t_start=t_start)
    d = int(cfg.model.embedding_size)
    nnz = sum(int(m.nnz)
              for m in data.extras.get("behavior_mats_scipy", [])) or data.n_train
    n_batches = -(-data.n_train // int(cfg.train.batch_size))
    # 3 meta rounds × per-behavior propagation (fwd + dx)
    fl = _edge_flops_per_epoch(nnz, d, int(cfg.model.get("layer_num", 2)),
                               n_batches, spmm_apps_per_step=3 * 2 * 2)
    return {"epoch_s": epoch_s, "train_examples_per_s": ex_s,
            "eval_users_per_s": ev_s, "mfu": fl / epoch_s / PEAK_FLOPS,
            "edge_fetch_ns": _edge_fetch_ns(epoch_s, fl, d)}


def bench_eval_paths(budget_s=None, t_start=None):
    """Evaluator history-mask paths head-to-head on LightGCN/yelp: the
    precomputed packed-bitmask row-gather (default) vs the per-batch scatter
    (``test.mask_bits_mb: 0``).  Settles the round-3 open question of whether
    the bitmask rework regressed single-chip eval (reference workload:
    ``trainer/metrics.py:82-135``).  Times are a 3-run mean post-compile."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.models.registry import build_model
    from sslrec_tpu.trainer.metrics import Evaluator

    cfg, data = _load_cf("lightgcn", "yelp")
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    n_users = int(data.test.n_test_users)

    def timed(ev):
        r = ev(params)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(3):
            r = ev(params)
            jax.block_until_ready(r)
        return n_users / ((time.time() - t0) / 3)

    bitmask = timed(Evaluator(model, data.test, cfg))
    cfg_sc = load_config("lightgcn", dataset="yelp",
                         overrides={"test.mask_bits_mb": 0})
    scatter = timed(Evaluator(model, data.test, cfg_sc))
    return {"bitmask_users_per_s": bitmask, "scatter_users_per_s": scatter,
            "bitmask_speedup": bitmask / scatter}


def bench_spmm(budget_s=None, t_start=None):
    """Flagship-kernel component bench on the real Yelp bi-adjacency —
    reports achieved HBM GB/s alongside the suite's MFU numbers (the honest
    perf axis for a d=32 HBM/latency-bound workload; v5e peak ~819 GB/s, but
    the random-row gather is FETCH-COUNT bound at ~6.5 ns/row regardless of
    row bytes, which is the formulation's real roofline).  Runs BOTH precision
    modes: exact f32 (3-way mantissa split) and default (bf16 gather +
    1-pass MXU)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.bench_spmm import run_interleaved

    # Round-5 (VERDICT r4 #1): interleaved A/B trials — Pallas and XLA cycled
    # within each trial over distinct inputs, median + IQR reported — so
    # platform drift between measurement blocks can no longer masquerade as a
    # kernel margin (the BENCH_r04 7.63-vs-5.06 ambiguity).
    res = run_interleaved(trials=9, iters=6)
    return {k: res[k] for k in (
        "pallas_fwd_ms", "pallas_fwd_iqr_ms", "pallas_grad_ms",
        "pallas_grad_iqr_ms", "xla_fwd_ms", "xla_fwd_iqr_ms", "xla_grad_ms",
        "xla_grad_iqr_ms", "default_fwd_ms", "default_grad_ms",
        "combined_pallas_ms", "combined_xla_ms", "combined_default_ms",
        "rel_err_vs_xla", "default_rel_err_vs_xla")}


# deadline-ordered: the headline first, the cheap component benches next, and
# the one entry that can eat 200+ s (KGCL's synthetic-at-scale RGAT) LAST so a
# tight driver window skips at most the entry that BASELINE.md already pins
BENCHES = {
    "lightgcn": bench_lightgcn,
    "eval": bench_eval_paths,
    "spmm": bench_spmm,
    "sgl": bench_sgl,
    "bert4rec": bench_bert4rec,
    "cml": bench_cml,
    "kgcl": bench_kgcl,
}


def _round_result(r):
    keep7 = ("mfu", "rel_err_vs_xla", "default_rel_err_vs_xla")
    return {k: (round(v, 7) if k in keep7 else round(v, 2))
            for k, v in r.items()}


def main():
    sel = os.environ.get("SSLREC_BENCH_MODELS", "")
    names = [n for n in sel.split(",") if n] or list(BENCHES)
    deadline = time.time() + float(
        os.environ.get("SSLREC_BENCH_DEADLINE_S", "510"))
    suite = {}

    def combined_line():
        head = suite.get("lightgcn", {}).get("train_examples_per_s", 0.0)
        print(json.dumps({
            "metric": "lightgcn_yelp_train_throughput",
            "value": round(head, 1),
            "unit": "examples/s",
            "vs_baseline": round(head / BASELINE_EXAMPLES_PER_S, 3),
            "suite": suite,
            "mfu_note": "edge-FLOPs / 197e12 (v5e bf16 peak); HBM-bound workload",
        }), flush=True)

    for name in names:
        t0 = time.time()
        if t0 > deadline - 20:
            suite[name] = {"skipped": "deadline"}
            print(json.dumps({"bench_entry": name, **suite[name]}), flush=True)
            continue
        budget = min(_budget(name), deadline - t0)
        try:
            # entries print diagnostics (data-load lines etc.) — keep stdout
            # pure JSON by routing entry prints to stderr
            with contextlib.redirect_stdout(sys.stderr):
                r = BENCHES[name](budget_s=budget, t_start=t0)
            suite[name] = _round_result(r)
        except Exception as e:  # a broken entry must not kill the headline
            suite[name] = {"error": repr(e)[:200]}
        suite[name]["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps({"bench_entry": name, **suite[name]}), flush=True)
        combined_line()


if __name__ == "__main__":
    main()
