"""Micro-bench: top-k strategies on eval-shaped score matrices (real TPU).

Sequential-model evaluation wall-clock is dominated by the per-batch
``lax.top_k`` over ``[B, n_items≈57k]`` (sports eval ≈7 s per epoch, while the
training scan itself is sub-second).  Candidates:

* ``lax.top_k``           — current implementation
* blocked two-stage       — ``[B, nb, w]`` per-block top-k then merge; exactly
                            equivalent incl. tie order (blocks are index-ordered
                            and lax.top_k is stable)
* ``lax.approx_max_k``    — TPU PartialReduce custom call (checked for
                            agreement; tie order may differ)

Usage: python tools/bench_topk.py   (honours the ambient JAX platform)
"""

from __future__ import annotations

import time

from sslrec_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import os

if os.environ.get("SSLREC_BENCH_SMOKE"):  # tiny CPU smoke of the same code paths
    B, N, K, STEPS, ITERS = 32, 3000, 20, 4, 2
else:
    B, N, K, STEPS, ITERS = 512, 56975, 20, 167, 20


def blocked_topk(scores, k, block=2048):
    b, n = scores.shape
    nb = -(-n // block)
    pad = nb * block - n
    s = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    s = s.reshape(b, nb, block)
    v, i = lax.top_k(s, min(k, block))
    gi = i + (jnp.arange(nb, dtype=jnp.int32) * block)[None, :, None]
    v2, p = lax.top_k(v.reshape(b, -1), k)
    return jnp.take_along_axis(gi.reshape(b, -1), p, axis=-1)


def run(name, fn, x):
    f = jax.jit(fn)
    r = f(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    iters = ITERS
    for _ in range(iters):
        r = f(x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:28s} {dt:8.2f} ms/call   -> eval scan ≈ {dt*STEPS/1000:6.2f} s")
    return np.asarray(r), dt


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N), jnp.float32)

    ref, _ = run("lax.top_k", lambda s: lax.top_k(s, K)[1], x)
    for blk in (512, 1024, 2048, 4096):
        got, _ = run(f"blocked_topk(block={blk})",
                     lambda s, blk=blk: blocked_topk(s, K, blk), x)
        print(f"    exact match vs lax.top_k: {bool((got == ref).all())}")
    for rt in (0.95, 1.0):
        got, _ = run(f"approx_max_k(recall={rt})",
                     lambda s, rt=rt: lax.approx_max_k(s, K, recall_target=rt,
                                                       aggregate_to_topk=True)[1], x)
        same = bool((np.sort(got, 1) == np.sort(ref, 1)).all())
        print(f"    same index SET as lax.top_k: {same}")

    # full eval-shaped scan: score matmul + mask + topk + metric-ish reduce
    d = 64
    ue = jax.random.normal(key, (STEPS, B, d), jnp.float32)
    ie = jax.random.normal(key, (N, d), jnp.float32)

    def scan_eval(topk_fn):
        def body(c, u):
            s = u @ ie.T
            idx = topk_fn(s)
            return c + idx.sum(), None
        return lambda _: lax.scan(body, jnp.int32(0), ue)[0]

    run("scan: matmul+lax.top_k", scan_eval(lambda s: lax.top_k(s, K)[1]), x)
    run("scan: matmul+blocked2048", scan_eval(lambda s: blocked_topk(s, K, 2048)), x)
    run("scan: matmul only", scan_eval(lambda s: s.argmax(1, keepdims=True)), x)


if __name__ == "__main__":
    main()
