"""Evaluator history-mask paths, measured head-to-head on the real chip.

Settles the round-3 open question (VERDICT r3 items 2/4): did the
packed-bitmask history mask (ebea2f6) + blocked two-stage top-k (66afef8)
regress single-chip eval vs the round-2 per-batch scatter?  Reference
workload being replaced: ``/root/reference/trainer/metrics.py:82-135``.

Measures, each as a 3-run mean after one compile run:
- lightgcn/yelp, bitmask path (default; ``test.mask_bits_mb`` large enough)
- lightgcn/yelp, scatter path (``test.mask_bits_mb: 0``)
- smbrec/ijcai_15, whichever path the 768 MB budget gate picks at 423k-user
  scale (the scatter path — the bit table would need ~29 GB)

Prints one JSON line; run via the queue (one process owns the chip).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sslrec_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax


def timed_eval(model, data, cfg, runs=3):
    from sslrec_tpu.trainer.metrics import Evaluator

    ev = Evaluator(model, data.test, cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    r = ev(params)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(runs):
        r = ev(params)
        jax.block_until_ready(r)
    dt = (time.time() - t0) / runs
    return int(data.test.n_test_users) / dt, dt


def main():
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.registry import load_data
    from sslrec_tpu.models.registry import build_model

    import os

    out = {}
    cfg = load_config("lightgcn", dataset="yelp")
    data = load_data(cfg)
    model = build_model(cfg, data)
    cfg_sc = load_config("lightgcn", dataset="yelp",
                         overrides={"test.mask_bits_mb": 0})
    # 2x2: {bitmask, scatter} mask paths x {blocked, plain} top-k — r2's
    # 117k users/s predates BOTH (ebea2f6, 66afef8), so the grid attributes
    # any regression to the responsible axis
    for tk_name, tk_env in (("blocked", None), ("plain", "0")):
        if tk_env is None:
            os.environ.pop("SSLREC_TOPK_BLOCK", None)
        else:
            os.environ["SSLREC_TOPK_BLOCK"] = tk_env
        ups, dt = timed_eval(model, data, cfg)
        out[f"yelp_bitmask_{tk_name}_users_per_s"] = round(ups, 1)
        ups, dt = timed_eval(model, data, cfg_sc)
        out[f"yelp_scatter_{tk_name}_users_per_s"] = round(ups, 1)
    os.environ.pop("SSLREC_TOPK_BLOCK", None)

    if "--skip-ijcai" not in sys.argv:
        cfg_ij = load_config("smbrec", dataset="ijcai_15")
        data_ij = load_data(cfg_ij)
        model_ij = build_model(cfg_ij, data_ij)
        ups, dt = timed_eval(model_ij, data_ij, cfg_ij, runs=2)
        out["ijcai_users_per_s"] = round(ups, 1)
        out["ijcai_eval_s"] = round(dt, 3)
        out["ijcai_n_test_users"] = int(data_ij.test.n_test_users)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
