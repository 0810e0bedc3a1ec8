"""CLI entry: train / tune / test-from-checkpoint (parity with ``main.py:9-72``).

Usage::

    python -m sslrec_tpu.main --model lightgcn [--dataset yelp] [--set k=v ...]
"""

from __future__ import annotations

import sys

from sslrec_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax

from sslrec_tpu.config import parse_cli
from sslrec_tpu.data.registry import load_data
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.logger import Logger
from sslrec_tpu.trainer.trainer import Trainer
from sslrec_tpu.utils import checkpoint as ckpt


def main(argv=None):
    import os

    cfg = parse_cli(argv)
    # wedge forensics (utils/dispatch_trace): CLI runs always trace their
    # python-level device calls so a watchdog-killed process leaves an
    # attribution (the last BEGIN without END names the wedged call)
    if "SSLREC_TRACE_FILE" not in os.environ:
        os.environ["SSLREC_TRACE_FILE"] = \
            f"runs/dispatch_trace_{os.getpid()}.log"
    if "results_dir" not in cfg.train:
        # CLI runs always write a committed evidence artifact (results/*.json:
        # config + seed + trajectory + final metrics); library/test use stays
        # silent unless train.results_dir is set explicitly
        cfg = cfg.set_path("train.results_dir", "results")
    from sslrec_tpu.parallel.mesh import maybe_distributed_init
    maybe_distributed_init(cfg)  # multi-host (DCN) gate; no-op unless configured
    logger = Logger(cfg)
    logger.log(f"devices: {jax.devices()}")
    if cfg.train.get("debug_nans", False):
        # analog of the reference's inline NaN asserts (trainer.py:889-890):
        # every jitted computation re-runs un-jitted on NaN and pinpoints the op
        jax.config.update("jax_debug_nans", True)
        logger.log("jax_debug_nans enabled")
    profile_dir = cfg.train.get("profile", "")
    if profile_dir:
        jax.profiler.start_trace(str(profile_dir))
        logger.log(f"capturing profiler trace to {profile_dir}")
    data = load_data(cfg)
    logger.log(f"data loaded: {data.user_num} users x {data.item_num} items, "
               f"{data.n_train} train interactions")
    model = build_model(cfg, data)

    if cfg.tune.get("enable", False):
        from sslrec_tpu.trainer.tuner import grid_search
        grid_search(cfg, data, logger)
        return

    trainer = Trainer(cfg, model, data, logger)
    pretrain = cfg.train.get("pretrain_path")
    if pretrain:
        # test-from-checkpoint mode (reference main.py:48-67)
        key = jax.random.PRNGKey(int(cfg.train.seed))
        template = model.init_params(key)
        params = ckpt.load(pretrain, template)
        results = trainer.test(params)
        logger.log_eval(results, cfg.test.k, name="(test from checkpoint)")
        return
    try:
        trainer.train()
    finally:
        if profile_dir:
            jax.profiler.stop_trace()
            logger.log(f"profiler trace written to {profile_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
