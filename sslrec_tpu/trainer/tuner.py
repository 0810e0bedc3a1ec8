"""Grid-search hyperparameter tuner.

Parity with ``trainer/tuner.py:6-53``: exhaustive product over the lists in
``cfg.tune``, re-seeding and rebuilding the model per trial.  Functional config
means no mutate/restore dance — each trial gets its own frozen config.
"""

from __future__ import annotations

import itertools

from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer


def trial_configs(cfg):
    """Yield (cfg_variant, assignment dict) over the tune grid."""
    hypers = list(cfg.tune.get("hyperparameters", ()))
    spaces = [list(cfg.tune[h]) for h in hypers]
    for combo in itertools.product(*spaces):
        assignment = dict(zip(hypers, combo))
        yield cfg.replace(model=assignment), assignment


def grid_search(cfg, data, logger):
    best = None
    metric0 = cfg.test.metrics[0]
    for trial_cfg, assignment in trial_configs(cfg):
        logger.log(f"tune trial: {assignment}")
        model = build_model(trial_cfg, data)
        trainer = Trainer(trial_cfg, model, data, logger)
        trainer.train()
        score = float(trainer.test_results[metric0][0])
        logger.log(f"tune trial {assignment} -> {metric0}@{trial_cfg.test.k[0]} = {score:.5f}")
        if best is None or score > best[0]:
            best = (score, assignment)
    logger.log(f"tune best: {best[1]} ({metric0}@{cfg.test.k[0]}={best[0]:.5f})")
    return best
