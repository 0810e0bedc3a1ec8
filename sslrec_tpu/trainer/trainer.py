"""Training loop: jitted whole-epoch ``lax.scan`` with early stopping.

Reference behaviour being matched (``trainer/trainer.py:39-196``):
- Adam optimiser from config (``:45-49``)
- per-epoch negative resampling (``:55``; here fused into the jitted epoch)
- evaluate every ``test_step`` epochs on valid (else test), early stop with
  ``patience`` on ``metrics[0]@k[0]``, keep best parameters (``:102-126``)
- final: reload best params, evaluate + test + optional save (``:129-137``)

TPU-native differences: the *entire epoch* — shuffle, negative sampling, every
train step — is one compiled XLA program (``lax.scan`` over fixed-shape batches),
so there is no per-batch host dispatch; parameters/optimizer state are donated
buffers that never leave the device.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax

from sslrec_tpu.data.base import DataBundle
from sslrec_tpu.data.sampling import sample_negatives
from sslrec_tpu.trainer.logger import Logger, log_exceptions
from sslrec_tpu.trainer.metrics import Evaluator
from sslrec_tpu.utils import checkpoint as ckpt
from sslrec_tpu.utils import dispatch_trace as trace


def build_optimizer(cfg) -> optax.GradientTransformation:
    """Adam per the reference (``trainer/trainer.py:45-49``); weight_decay>0 →
    torch-style Adam-with-L2 (optax ``add_decayed_weights`` before adam)."""
    name = cfg.optimizer.get("name", "adam").lower()
    lr = float(cfg.optimizer.lr)
    wd = float(cfg.optimizer.get("weight_decay", 0.0) or 0.0)
    if name != "adam":
        raise NotImplementedError(f"optimizer {name}")
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if wd > 0:
        opt = optax.chain(optax.add_decayed_weights(wd), opt)
    return opt


class Trainer:
    """Default trainer; specialised flows are expressed through hooks.

    Hooks a model may define (replacing the reference's 11 trainer subclasses):
    - ``epoch_state(params, key, epoch) -> aux``: host-level per-epoch
      computation (KMeans clustering, view generation, diffusion sub-loops);
      the returned pytree is passed to ``loss`` as ``batch['aux']``.
    - ``extra_batch_fields(key, n) -> dict``: additional per-interaction arrays.
    """

    def __init__(self, cfg, model, data: DataBundle, logger: Logger | None = None):
        self.cfg = cfg
        self.model = model
        # wedge-forensics bookkeeping (utils/dispatch_trace; no-op unless
        # SSLREC_TRACE_FILE is set by the CLI entry)
        self._trace_ep = "ep?"
        self._trace_sync = bool(cfg.train.get("trace_sync", False))
        self.data = data
        self.logger = logger or Logger(cfg)
        # config-driven device mesh (train.mesh: {data: N, model: M}) — GSPMD
        # shards the whole epoch program from the argument shardings alone
        from sslrec_tpu.parallel.mesh import mesh_from_config
        self.mesh = mesh_from_config(cfg)
        if self.mesh is not None:
            self.logger.log(f"mesh: {dict(self.mesh.shape)}")
        self.optimizer = build_optimizer(cfg)
        clip = getattr(model, "grad_clip", None)
        if clip:  # e.g. DSL's grad-norm clip (reference trainer.py:480)
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(float(clip)), self.optimizer)
        self.batch_size = int(cfg.train.batch_size)
        if hasattr(model, "epoch_schedule"):
            # model-defined epoch length (e.g. MBGMN's trnNum-users-per-epoch
            # schedule, reference trainer.py:1058-1062) instead of one pass
            # over the training interactions
            self.n_batches, self.batch_size = model.epoch_schedule(
                data.n_train, self.batch_size)
        else:
            self.n_batches = -(-data.n_train // self.batch_size)
        # models with per-fix_steps view banks size them from the batch count
        model._n_batches_hint = self.n_batches
        self._epoch_fn = None
        self._kg_epoch_fn = None

    # ------------------------------------------------------------------
    def _build_epoch_fn(self) -> Callable:
        model, data, opt = self.model, self.data, self.optimizer
        mesh = self.mesh
        n_train, bsz, n_batches = data.n_train, self.batch_size, self.n_batches
        rows = n_batches * bsz  # may be < n_train under a model epoch_schedule
        pad = max(rows - n_train, 0)
        has_aux_state = hasattr(model, "epoch_state")
        # scenario handlers may provide extra per-interaction arrays (sequences,
        # behaviour ids, ...) beyond the default (user, pos) pair
        self._train_arrays = dict(data.extras.get("train_arrays")
                                  or {"user": data.train_users,
                                      "pos": data.train_items})
        needs_neg = "neg" in getattr(model, "batch_fields", ("user", "pos", "neg"))
        neg_low = int(data.extras.get("neg_low", 0))

        # ``arrays`` is a jit *argument* (not a closure): closed-over device
        # arrays are lowered as literal HLO constants, and full-epoch sequence
        # tensors (e.g. sports: 2×37 MB) bloat the program past what the
        # remote-compile transport accepts.  ``hparams`` likewise: tuned scalars
        # arrive traced so every grid-search trial shares ONE compiled epoch
        # program (baked-constant hyperparameters made each of NCL's 45 trials
        # a fresh multi-minute compile).
        def make_step(sampled, aux_state, arrays, hparams):
            def step(carry, inp):
                params, opt_state = carry
                bidx, bkey, step_idx = inp
                batch = {k: v[bidx] for k, v in arrays.items()}
                batch["step"] = step_idx
                for k, v in sampled.items():
                    batch[k] = v[bidx]
                if hparams:
                    batch["hp"] = hparams
                if mesh is not None:
                    # data-parallel batches: GSPMD splits every per-step loss
                    # over the 'data' axis from this one constraint
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    dp = NamedSharding(mesh, P("data"))
                    batch = {k: (lax.with_sharding_constraint(v, dp)
                                 if getattr(v, "ndim", 0) >= 1 else v)
                             for k, v in batch.items()}
                if has_aux_state:
                    batch["aux"] = aux_state
                if hasattr(model, "train_step"):
                    # model-managed multi-optimizer step (e.g. AdaGCL's three
                    # sequential updates + generator optimizers)
                    params, opt_state, aux = model.train_step(params, opt_state,
                                                              batch, bkey)
                    return (params, opt_state), aux
                (loss, aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
                    params, batch, bkey)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                aux = dict(aux, loss=loss)
                return (params, opt_state), aux

            return step

        def prologue(key, arrays):
            pkey, nkey, xkey, skey = jax.random.split(key, 4)
            perm = jax.random.permutation(pkey, n_train).astype(jnp.int32)
            if pad:
                perm = jnp.concatenate([perm, perm[:pad]])
            idx = perm[:rows].reshape(n_batches, bsz)
            sampled = {}
            if needs_neg:
                sampled["neg"] = sample_negatives(
                    nkey, arrays["user"], data.train_edge_set,
                    data.item_num, low=neg_low)
            if hasattr(model, "extra_negatives"):
                # model-specific auxiliary negative streams (e.g. DSL's social
                # user negatives) — full-epoch arrays, sliced per batch below
                sampled.update(model.extra_negatives(xkey, arrays))
            keys = jax.random.split(skey, n_batches)
            steps = jnp.arange(n_batches, dtype=jnp.int32)
            return idx, keys, steps, sampled

        chunk = int(self.cfg.train.get("scan_chunk", 0) or 0)
        if not chunk or chunk >= n_batches:
            def epoch_fn(params, opt_state, key, aux_state, arrays, hparams):
                idx, keys, steps, sampled = prologue(key, arrays)
                step = make_step(sampled, aux_state, arrays, hparams)
                (params, opt_state), aux = lax.scan(step, (params, opt_state),
                                                    (idx, keys, steps))
                mean_aux = jax.tree.map(jnp.mean, aux)
                return params, opt_state, mean_aux

            jitted = jax.jit(epoch_fn, donate_argnums=(0, 1))

            def traced_epoch(params, opt_state, key, aux_state, arrays, hparams):
                trace.mark(f"{self._trace_ep}.whole_epoch", steps=n_batches,
                           model=self.cfg.model.name)
                out = jitted(params, opt_state, key, aux_state, arrays, hparams)
                trace.done(f"{self._trace_ep}.whole_epoch")
                return out

            return traced_epoch

        # train.scan_chunk: bound the length of each device call by scanning at
        # most ``chunk`` steps per XLA program (the remote-execution transport
        # kills executions that run too long in one call — MAERec's 363-step
        # epoch at the shipped con_batch=2048 crashed the TPU worker).  The RNG
        # streams are computed once in a prologue program, so the step sequence
        # is bit-identical to the single-scan path.
        prologue_j = jax.jit(prologue)

        # every chunk runs at exactly ``chunk`` steps — the ragged tail is
        # padded with steps whose parameter updates and aux are discarded via
        # a validity mask, so the whole epoch reuses ONE compiled chunk program
        # (a second full compile for the tail length would defeat the feature
        # in precisely the slow-compile environments it exists for)
        def run_chunk(params, opt_state, idx, keys, steps, valid, sampled,
                      aux_state, arrays, hparams):
            step = make_step(sampled, aux_state, arrays, hparams)

            def gstep(carry, inp):
                idx_i, key_i, step_i, valid_i = inp
                new_carry, aux = step(carry, (idx_i, key_i, step_i))
                carry = jax.tree.map(
                    lambda n, o: jnp.where(valid_i, n, o), new_carry, carry)
                aux = jax.tree.map(
                    lambda a: jnp.where(valid_i, a, jnp.zeros_like(a)), aux)
                return carry, aux

            (params, opt_state), aux = lax.scan(gstep, (params, opt_state),
                                                (idx, keys, steps, valid))
            return params, opt_state, jax.tree.map(
                lambda a: jnp.sum(a, axis=0), aux)

        chunk_j = jax.jit(run_chunk, donate_argnums=(0, 1))

        def epoch_fn(params, opt_state, key, aux_state, arrays, hparams):
            idx, keys, steps, sampled = prologue_j(key, arrays)
            pad = (-n_batches) % chunk
            valid = jnp.arange(n_batches + pad, dtype=jnp.int32) < n_batches
            if pad:  # pad < chunk <= n_batches, so reusing the head is in-range
                idx = jnp.concatenate([idx, idx[:pad]])
                keys = jnp.concatenate([keys, keys[:pad]])
                steps = jnp.concatenate([steps, steps[:pad]])
            sums = None
            for s in range(0, n_batches + pad, chunk):
                e = s + chunk
                trace.mark(f"{self._trace_ep}.chunk{s // chunk}",
                           steps=chunk, model=self.cfg.model.name)
                params, opt_state, part = chunk_j(
                    params, opt_state, idx[s:e], keys[s:e], steps[s:e],
                    valid[s:e], sampled, aux_state, arrays, hparams)
                if self._trace_sync:
                    jax.block_until_ready(part)
                trace.done(f"{self._trace_ep}.chunk{s // chunk}")
                sums = part if sums is None else jax.tree.map(jnp.add, sums, part)
            mean_aux = jax.tree.map(lambda x: x / n_batches, sums)
            return params, opt_state, mean_aux

        return epoch_fn

    def train_epoch(self, params, opt_state, key, epoch: int):
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()
        aux_state = None
        if hasattr(self.model, "epoch_state"):
            aux_state = self.model.epoch_state(params, key, epoch)
        hparams = (self.model.hparams() if hasattr(self.model, "hparams")
                   else {})
        params, opt_state, mean_aux = self._epoch_fn(params, opt_state, key,
                                                     aux_state,
                                                     self._train_arrays, hparams)
        if getattr(self.model, "train_trans", False) and hasattr(self.model, "kg_loss"):
            params, kg_loss = self._kg_trans_epoch(params, key)
            mean_aux = dict(mean_aux, kg_loss=kg_loss)
        return params, opt_state, mean_aux

    # -- auxiliary TransE sub-loop (KGCL/KGRec style, trainer.py:536-552) ----
    def _kg_trans_epoch(self, params, key):
        model, cfg = self.model, self.cfg
        if self._kg_epoch_fn is None:
            import numpy as np
            from sslrec_tpu.ops import sparse as sparse_ops
            import scipy.sparse as sp

            trip = self.data.extras["kg_triplets_full"]
            n_ent = self.data.extras["entity_num"]
            heads = jnp.asarray(trip[:, 0].astype(np.int32))
            rels = jnp.asarray(trip[:, 1].astype(np.int32))
            tails = jnp.asarray(trip[:, 2].astype(np.int32))
            ht = sp.coo_matrix((np.ones(len(trip), np.float32),
                                (trip[:, 0], trip[:, 2])), shape=(n_ent, n_ent))
            kg_edge_set = sparse_ops.build_edge_set(ht)
            kg_bsz = int(cfg.train.get("kg_batch_size", 4096))
            n_batches = max(len(trip) // kg_bsz, 1)
            kg_opt = build_optimizer(cfg)
            self._kg_opt_state = kg_opt.init(params)

            def kg_epoch(params, kg_opt_state, key):
                def step(carry, k):
                    params, kg_opt_state = carry
                    ki, kn = jax.random.split(k)
                    idx = jax.random.randint(ki, (kg_bsz,), 0, heads.shape[0])
                    h, r, t = heads[idx], rels[idx], tails[idx]
                    negs = sample_negatives(kn, h, kg_edge_set, n_ent)
                    loss, grads = jax.value_and_grad(
                        lambda p: model.kg_loss(p, (h, r, t, negs)))(params)
                    updates, kg_opt_state = kg_opt.update(grads, kg_opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, kg_opt_state), loss

                keys = jax.random.split(key, n_batches)
                (params, kg_opt_state), ls = lax.scan(step, (params, kg_opt_state), keys)
                return params, kg_opt_state, jnp.mean(ls)

            self._kg_epoch_fn = jax.jit(kg_epoch, donate_argnums=(0, 1))
        params, self._kg_opt_state, kg_loss = self._kg_epoch_fn(
            params, self._kg_opt_state, key)
        return params, kg_loss

    # ------------------------------------------------------------------
    @log_exceptions
    def train(self, params=None):
        cfg = self.cfg
        seed = int(cfg.train.seed)
        key = jax.random.PRNGKey(seed)
        key, init_key = jax.random.split(key)
        # per-epoch keys are fold_in(root, epoch), NOT sequential splits: a run
        # resumed from epoch N consumes the identical stream an uninterrupted
        # run would, so mid-train resume is bit-faithful (and any epoch can be
        # replayed in isolation from a saved train state)
        root_key = key
        if params is None:
            params = self.model.init_params(init_key)
        if hasattr(self.model, "init_opt_state"):
            opt_state = self.model.init_opt_state(params)
        else:
            opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            # commit embedding-table rows to the 'model' axis; the same
            # shape-based rule shards the optimizer moments identically
            params = jax.device_put(
                params, self.model.param_shardings(self.mesh, params))
            opt_state = jax.device_put(
                opt_state, self.model.param_shardings(self.mesh, opt_state))

        # mid-train resume (an upgrade over the reference, which only supports
        # load-for-test): restores params, optimizer state, epoch counter AND
        # the best-valid snapshot + early-stop bookkeeping — without the
        # latter, a resumed run whose metric peak preceded the save point
        # would silently report a different best than the uninterrupted run
        start_epoch = 0
        best_metric = -1.0
        # copy: the live `params` buffers are donated into the epoch program
        best_params = jax.tree.map(jnp.copy, params)
        wait = 0
        resume = cfg.train.get("resume_path")
        if resume:
            state = ckpt.load(resume, {"params": params, "opt_state": opt_state,
                                       "epoch": 0, "best_params": best_params,
                                       "best_metric": 0.0, "wait": 0})
            params, opt_state = state["params"], state["opt_state"]
            best_params = state["best_params"]
            best_metric = float(state["best_metric"])
            wait = int(state["wait"])
            start_epoch = int(state["epoch"]) + 1
            self.logger.log(f"resumed from {resume} at epoch {start_epoch}")

        eval_split = self.data.valid if self.data.valid is not None else self.data.test
        evaluator = Evaluator(self.model, eval_split, cfg, mesh=self.mesh)
        test_evaluator = Evaluator(self.model, self.data.test, cfg, mesh=self.mesh)

        metric0 = cfg.test.metrics[0]
        patience = int(cfg.train.get("patience", 0) or 0)
        early_stop = bool(cfg.train.get("early_stop", False))
        test_step = int(cfg.train.get("test_step", 1))
        n_epochs = int(cfg.train.epoch)

        from sslrec_tpu.utils.summary import make_writer
        from sslrec_tpu.utils.results import RunRecorder
        writer = make_writer(cfg)
        recorder = RunRecorder(cfg)
        self.recorder = recorder

        save_every = int(cfg.train.get("save_state_every", 0) or 0)
        for epoch in range(start_epoch, n_epochs):
            ekey = jax.random.fold_in(root_key, epoch)
            self._trace_ep = f"ep{epoch}"
            params, opt_state, losses = self.train_epoch(params, opt_state, ekey, epoch)
            trace.mark(f"ep{epoch}.losses_sync")
            losses_host = jax.device_get(losses)
            trace.done(f"ep{epoch}.losses_sync")
            if cfg.train.get("log_loss", True):
                self.logger.log_loss(epoch, losses_host)
            writer.add_scalar("Loss/train", float(losses_host["loss"]), epoch)
            epoch_valid = None
            if epoch % test_step == 0:
                eval_t0 = time.time()
                trace.mark(f"ep{epoch}.eval")
                results = evaluator(params)
                trace.done(f"ep{epoch}.eval")
                epoch_valid = results
                writer.add_scalar("HR/test", float(results[metric0][0]), epoch)
                self.logger.log_eval(results, cfg.test.k, epoch=epoch,
                                     name=f"(valid, {time.time()-eval_t0:.1f}s)")
                cur = float(results[metric0][0])
                if cur > best_metric:
                    best_metric = cur
                    best_params = jax.tree.map(jnp.copy, params)
                    wait = 0
                else:
                    wait += 1
                if early_stop and wait >= patience:
                    self.logger.log(f"Early stop at epoch {epoch} "
                                    f"(best {metric0}@{cfg.test.k[0]}={best_metric:.5f})")
                    recorder.record_epoch(epoch, losses_host, epoch_valid)
                    break
            recorder.record_epoch(epoch, losses_host, epoch_valid)
            # state save AFTER the eval/best update so a resumed run carries
            # the exact bookkeeping the uninterrupted run had at this point
            if save_every and (epoch + 1) % save_every == 0:
                path = self._ckpt_path() + ".state"
                trace.mark(f"ep{epoch}.save_state", path=path)
                ckpt.save(path, {"params": params, "opt_state": opt_state,
                                 "epoch": epoch, "best_params": best_params,
                                 "best_metric": float(best_metric),
                                 "wait": int(wait)})
                trace.done(f"ep{epoch}.save_state")
                self.logger.log(f"saved train state to {path}")
        else:
            # fixed-epoch run without early stop: when the final epoch is off
            # the test_step grid it was never scored — evaluate it so the run
            # doesn't silently report a stale earlier snapshot as "best"
            if n_epochs > start_epoch and (n_epochs - 1) % test_step != 0:
                results = evaluator(params)
                cur = float(results[metric0][0])
                if cur > best_metric:
                    best_metric = cur
                    best_params = params  # loop done; no donation hazard

        writer.close()
        final_valid = evaluator(best_params)
        self.logger.log_eval(final_valid, cfg.test.k, name="(best valid)")
        test_results = test_evaluator(best_params)
        self.logger.log_eval(test_results, cfg.test.k, name="(test)")
        rpath = recorder.finalize(best_valid=final_valid, test=test_results)
        if rpath:
            self.logger.log(f"wrote results artifact {rpath}")
        if cfg.train.get("save_model", False):
            ckpt.save(self._ckpt_path(), best_params)
            self.logger.log(f"saved checkpoint to {self._ckpt_path()}")
        self.best_params = best_params
        self.test_results = test_results
        return best_params

    def evaluate(self, params):
        split = self.data.valid if self.data.valid is not None else self.data.test
        return Evaluator(self.model, split, self.cfg, mesh=self.mesh)(params)

    def test(self, params):
        return Evaluator(self.model, self.data.test, self.cfg, mesh=self.mesh)(params)

    def _ckpt_path(self) -> str:
        import datetime, os
        name = self.cfg.model.name
        d = os.path.join("./checkpoint", name)
        os.makedirs(d, exist_ok=True)
        ts = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        return os.path.join(d, f"{name}-{self.cfg.data.name}-{ts}.ckpt")
