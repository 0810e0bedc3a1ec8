"""Social DcRec real-scale stall diagnosis: split lowering / XLA compile /
per-step execution timings for ONE loss+grad step (the whole-epoch scan only
multiplies the step; if the step compiles and runs, the scan does too).

Round-3 job 14 and two round-4 diags produced zero epochs inside 1500 s with
the log stopping right after "data loaded" — this pins WHICH phase eats the
time at the 43k x 66k yelp scale (layer_num 4, per-step view augmentation +
all-pairs GRACE).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sslrec_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from sslrec_tpu.config import load_config
from sslrec_tpu.data.registry import load_data
from sslrec_tpu.models.registry import build_model

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    cfg = load_config("dcrec", overrides={"data.dir": "datasets"})
    data = load_data(cfg)
    log(f"data loaded ({data.user_num} x {data.item_num})")
    model = build_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    log("params built")

    batch = {"user": data.train_users[:2048].astype(jnp.int32),
             "pos": data.train_items[:2048].astype(jnp.int32),
             "neg": jnp.zeros((2048,), jnp.int32)}
    step = jax.jit(jax.value_and_grad(model.loss, has_aux=True))
    lowered = step.lower(params, batch, jax.random.PRNGKey(1))
    log("lowered (client-side trace done)")
    compiled = lowered.compile()
    log("XLA compile done")
    for i in range(3):
        (loss, aux), grads = compiled(params, batch,
                                      jax.random.fold_in(jax.random.PRNGKey(2), i))
        loss = jax.device_get(loss)
        log(f"step {i}: loss={float(loss):.4f}")

    from sslrec_tpu.trainer.metrics import Evaluator
    ev = Evaluator(model, data.test, cfg)
    r = ev(params)
    log(f"eval compile+run done (recall@20={float(r['recall'][1]):.4f})")
    t = time.time()
    ev(params)
    log(f"eval steady {time.time() - t:.2f}s")


if __name__ == "__main__":
    main()
