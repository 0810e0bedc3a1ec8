"""Benchmark: LightGCN training throughput on Yelp (the reference's flagship
general-CF workload, ``config/modelconf/lightgcn.yml``).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md), so the recorded
baseline is a faithful torch-CPU run of the reference's LightGCN training step
measured on this host (see BASELINE.md "measured" section) — the only
reference-implementation number obtainable in this environment.
"""

from __future__ import annotations

import json
import time

from sslrec_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax

# Reference implementation throughput measured on this host (examples/s):
# torch-CPU faithful rerun of the reference LightGCN training step (batch 4096,
# yelp, full-graph forward per batch, edge dropout, Adam) = 987 ms/step.
# See BASELINE.md for the measurement protocol and the CPU-vs-TPU caveat.
BASELINE_EXAMPLES_PER_S = 4149.0


def main():
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.registry import load_data
    from sslrec_tpu.models.registry import build_model
    from sslrec_tpu.trainer.trainer import Trainer

    cfg = load_config("lightgcn", dataset="yelp")
    data = load_data(cfg)
    model = build_model(cfg, data)
    trainer = Trainer(cfg, model, data, logger=_Null())

    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    opt_state = trainer.optimizer.init(params)

    # warmup & compile
    params, opt_state, losses = trainer.train_epoch(params, opt_state, key, 0)
    jax.block_until_ready(losses)

    epochs = 5
    t0 = time.time()
    for e in range(epochs):
        key, k = jax.random.split(key)
        params, opt_state, losses = trainer.train_epoch(params, opt_state, k, e)
    jax.block_until_ready(losses)
    dt = time.time() - t0
    examples_per_s = data.n_train * epochs / dt
    print(json.dumps({
        "metric": "lightgcn_yelp_train_throughput",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 3),
    }))


class _Null:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


if __name__ == "__main__":
    main()
