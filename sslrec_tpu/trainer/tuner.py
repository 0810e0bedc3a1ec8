"""Grid-search hyperparameter tuner.

Parity with ``trainer/tuner.py:6-53``: exhaustive product over the lists in
``cfg.tune``, re-seeding and rebuilding the model per trial.  Functional config
means no mutate/restore dance — each trial gets its own frozen config.

TPU extension (no reference counterpart): ``tune.parallel: K`` runs K trials
*simultaneously* in one compiled program by ``jax.vmap``-ing the whole epoch
function and evaluator over stacked (params, opt_state, hparams).  The grid's
hyperparameters must all be traced scalars exposed by the model's ``hparams()``
hook (e.g. NCL); anything else falls back to the serial loop.  Per-trial
semantics are exact: every trial sees the reference key sequence (same seed →
same data order / negatives), keeps its own best-on-valid snapshot, and its
reported result freezes once its own patience is exhausted — trials that
stopped keep training as dead weight until all are done, which costs FLOPs but
buys a K× reduction in wall-clock and compile count.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp

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
    n_parallel = int(cfg.tune.get("parallel", 0) or 0)
    if n_parallel > 1:
        best = vmapped_grid_search(cfg, data, logger, n_parallel)
        if best is not None:
            return best
        logger.log("tune.parallel unsupported for this model/config; "
                   "falling back to serial grid search")
    return _serial_grid_search(cfg, data, logger)


def _write_grid_artifact(cfg, results, best, mode):
    """Durable evidence for a tuned BASELINE row: every trial's assignment and
    test score, written next to the per-run artifacts (results/*.json)."""
    out_dir = str(cfg.train.get("results_dir", "") or "")
    if not out_dir:
        return None
    import json, os, time
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, f"{cfg.model.name}_{cfg.data.name}_tune.json")
    with open(p, "w") as f:
        json.dump({
            "model": cfg.model.name, "dataset": cfg.data.name, "mode": mode,
            "seed": int(cfg.train.seed),
            "metric": f"{cfg.test.metrics[0]}@{cfg.test.k[0]}",
            "grid": {h: list(cfg.tune[h])
                     for h in cfg.tune.get("hyperparameters", ())},
            "trials": [{"assignment": a, "score": s} for s, a in results],
            "best": {"assignment": best[1], "score": best[0]},
            "written_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        }, f, indent=1)
    return p


def _serial_grid_search(cfg, data, logger):
    best = None
    results = []
    metric0 = cfg.test.metrics[0]
    for trial_cfg, assignment in trial_configs(cfg):
        logger.log(f"tune trial: {assignment}")
        model = build_model(trial_cfg, data)
        # per-trial run artifacts would overwrite each other (same deterministic
        # filename); the grid artifact below is the tune evidence instead
        trainer = Trainer(trial_cfg.set_path("train.results_dir", ""),
                          model, data, logger)
        trainer.train()
        score = float(trainer.test_results[metric0][0])
        logger.log(f"tune trial {assignment} -> {metric0}@{trial_cfg.test.k[0]} = {score:.5f}")
        results.append((score, assignment))
        if best is None or score > best[0]:
            best = (score, assignment)
    logger.log(f"tune best: {best[1]} ({metric0}@{cfg.test.k[0]}={best[0]:.5f})")
    p = _write_grid_artifact(cfg, results, best, mode="serial")
    if p:
        logger.log(f"wrote tune artifact {p}")
    return best


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def vmapped_grid_search(cfg, data, logger, n_parallel):
    """K-trials-at-once grid search; returns (score, assignment) or None if the
    grid cannot be vmapped (caller then falls back to the serial loop)."""
    from sslrec_tpu.trainer.metrics import Evaluator

    trials = list(trial_configs(cfg))
    if not trials:
        return None
    tuned = set(cfg.tune.get("hyperparameters", ()))
    probe0 = build_model(trials[0][0], data)
    if (not hasattr(probe0, "hparams")
            or (getattr(probe0, "train_trans", False) and hasattr(probe0, "kg_loss"))
            or (hasattr(probe0, "epoch_state")
                and not hasattr(probe0, "epoch_state_fn"))
            or cfg.train.get("mesh")):
        return None
    # hypers outside hparams() are STRUCTURAL (layer counts etc.): they cannot
    # ride a traced lane, so trials are grouped by their structural assignment
    # and vmapped within each group (one compiled program per group)
    structural = sorted(tuned - set(probe0.hparams()))
    groups: dict = {}
    for t in trials:
        groups.setdefault(tuple((h, t[1][h]) for h in structural), []).append(t)
    if len(groups) >= len(trials):
        return None  # every trial its own group — vmapping buys nothing

    metric0 = cfg.test.metrics[0]
    k0 = int(cfg.test.k[0])
    logger.log(f"tune: vmapped grid search, {len(trials)} trials in "
               f"{len(groups)} structural group(s) x {n_parallel} lanes")

    results = []  # (test_score, assignment)
    for gkey, gtrials in groups.items():
        # one probe + ONE set of jitted wrappers per structural group: jit
        # caches key on the function object, so per-chunk construction would
        # re-trace and re-compile the K-lane program for every chunk (the
        # padded tail exists precisely so one program serves the whole group)
        probe = build_model(gtrials[0][0], data)
        trainer = Trainer(gtrials[0][0], probe, data, logger=_Silent())
        epoch_fn = trainer._build_epoch_fn()
        has_aux = hasattr(probe, "epoch_state")
        aux_axes = 0 if has_aux else None
        ctx = {
            "trainer": trainer, "epoch_fn": epoch_fn,
            "arrays": trainer._train_arrays,
            "vm_epoch": jax.jit(jax.vmap(epoch_fn,
                                         in_axes=(0, 0, None, aux_axes, None, 0)),
                                donate_argnums=(0, 1)),
            "has_aux": has_aux,
        }
        if has_aux:
            ctx["vm_aux"] = jax.jit(jax.vmap(probe.epoch_state_fn,
                                             in_axes=(0, None)))
            ctx["period"] = int(getattr(probe, "epoch_state_period", 1) or 1)
        eval_split = data.valid if data.valid is not None else data.test
        ev_valid = Evaluator(probe, eval_split, cfg)
        ev_test = Evaluator(probe, data.test, cfg)
        # eval structures as jit args (same transport-limit rationale as
        # Evaluator.__call__), vmapped over the params lane only
        ctx["vm_eval"] = jax.jit(jax.vmap(ev_valid._eval_core, in_axes=(0, None)))
        ctx["vm_test"] = jax.jit(jax.vmap(ev_test._eval_core, in_axes=(0, None)))
        ctx["eval_data"] = ev_valid._data
        ctx["test_data"] = ev_test._data
        ctx["denom"] = float(eval_split.n_test_users)
        if gkey:
            logger.log(f"tune group {dict(gkey)}: {len(gtrials)} trials")

        k_eff = n_parallel
        lo = 0
        while lo < len(gtrials):
            chunk = gtrials[lo:lo + k_eff]
            real = len(chunk)
            # pad the tail chunk by repeating its last trial so every chunk
            # runs at the same K; padded lanes are dropped
            chunk = chunk + [chunk[-1]] * (k_eff - real)
            try:
                scores = _run_vmapped_chunk(cfg, data, logger, chunk, probe, ctx)
            except jax.errors.JaxRuntimeError as e:
                # K lanes can exceed HBM (e.g. HCCF layer_num=3 x 9 lanes:
                # per-lane [B, n_items] CL logits); halve and retry — the
                # jitted wrappers are shape-polymorphic, only a recompile.
                # UNAVAILABLE means the device/worker itself died: nothing
                # in-process can recover that, so don't burn retries on it.
                if k_eff == 1 or "UNAVAILABLE" in str(e):
                    raise
                k_eff = max(1, k_eff // 2)
                logger.log(f"tune chunk failed ({str(e).splitlines()[0][:120]}); "
                           f"retrying this group at {k_eff} lanes")
                continue
            for i in range(real):
                assignment = chunk[i][1]
                score = float(scores[i])
                logger.log(f"tune trial {assignment} -> {metric0}@{k0} = {score:.5f}")
                results.append((score, assignment))
            lo += real

    best = max(results, key=lambda t: t[0])
    logger.log(f"tune best: {best[1]} ({metric0}@{k0}={best[0]:.5f})")
    p = _write_grid_artifact(cfg, results, best, mode="vmapped")
    if p:
        logger.log(f"wrote tune artifact {p}")
    return best


def _run_vmapped_chunk(cfg, data, logger, chunk, probe, ctx):
    """Train K stacked trials to completion; returns per-trial test scores.

    All jitted machinery arrives via ``ctx`` (built once per grid) so chunks
    share compiled programs."""
    K = len(chunk)
    models = [build_model(tc, data) for tc, _ in chunk]
    hp = _stack([m.hparams() for m in models])
    arrays = ctx["arrays"]
    vm_epoch = ctx["vm_epoch"]
    has_aux = ctx["has_aux"]

    # reference tuner re-seeds identically per trial (trainer/tuner.py:33):
    # every lane starts from the same init and consumes the same key sequence
    seed = int(cfg.train.seed)
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    root_key = key  # per-epoch fold_in, mirroring Trainer.train exactly
    params0 = probe.init_params(init_key)
    params = jax.tree.map(lambda x: jnp.stack([x] * K), params0)
    if hasattr(probe, "init_opt_state"):
        opt_state = jax.vmap(probe.init_opt_state)(params)
    else:
        opt_state = jax.vmap(ctx["trainer"].optimizer.init)(params)

    if has_aux:
        vm_aux = ctx["vm_aux"]
        period = ctx["period"]
    vm_eval, vm_test, denom = ctx["vm_eval"], ctx["vm_test"], ctx["denom"]
    eval_data, test_data = ctx["eval_data"], ctx["test_data"]

    metric0 = cfg.test.metrics[0]
    patience = int(cfg.train.get("patience", 0) or 0)
    early_stop = bool(cfg.train.get("early_stop", False))
    test_step = int(cfg.train.get("test_step", 1))
    n_epochs = int(cfg.train.epoch)

    best = np.full((K,), -1.0)
    wait = np.zeros((K,), np.int32)
    stopped = np.zeros((K,), bool)
    best_params = jax.tree.map(jnp.copy, params)
    aux_state = None
    for epoch in range(n_epochs):
        ekey = jax.random.fold_in(root_key, epoch)
        if has_aux and (aux_state is None or epoch % period == 0):
            aux_state = vm_aux(params, ekey)
        params, opt_state, _ = vm_epoch(params, opt_state, ekey, aux_state,
                                        arrays, hp)
        if epoch % test_step != 0:
            continue
        sums = jax.device_get(vm_eval(params, eval_data))
        cur = sums[metric0][:, 0] / denom                      # [K]
        improved = (cur > best) & ~stopped
        best = np.where(improved, cur, best)
        imp = jnp.asarray(improved)
        best_params = jax.tree.map(
            lambda b, p: jnp.where(imp.reshape((K,) + (1,) * (p.ndim - 1)), p, b),
            best_params, params)
        wait = np.where(improved, 0, wait + 1)
        if early_stop:
            newly = ~stopped & (wait >= patience)
            stopped |= newly
            if newly.any():
                logger.log(f"tune epoch {epoch}: lanes {np.nonzero(newly)[0].tolist()} "
                           f"hit patience (active {int((~stopped).sum())}/{K})")
            if stopped.all():
                break

    test_sums = jax.device_get(vm_test(best_params, test_data))
    return test_sums[metric0][:, 0] / float(data.test.n_test_users)


class _Silent:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log
