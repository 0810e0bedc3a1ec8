"""Micro-bench: Pallas SpMM components on the real Yelp bi-adjacency (TPU).

Measures, per variant:
- gather-only:   contrib = x[cols] * vals  (the XLA-side feed)
- kernel-only:   chunked reduction on precomputed contribs
- fwd fused:     pallas_spmm forward
- fwd+grad:      value_and_grad of sum(pallas_spmm(x))
- xla baseline:  gather + sorted segment-sum

and reports achieved HBM GB/s against the ~819 GB/s v5e peak (traffic model:
gather reads x rows + writes contribs; kernel reads contribs + writes the
padded output once per owner visit).

Usage: python tools/bench_spmm.py [--d 32] [--r 256] [--m 512] [--precision highest|default]
"""

from __future__ import annotations

import argparse
import time

from sslrec_tpu.utils.jax_setup import setup_jax

setup_jax()

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, xs, iters=24, warmup=2):
    """Time fn over DISTINCT pre-materialised inputs: the remote executor
    coalesces identical in-flight requests (measured: a 1.8 ms gather reads
    0.026 ms when the same (fn, args) is dispatched 30x), so every iteration
    must differ.  Inputs stay independent so dispatch pipelining hides the
    tunnel RTT and the mean reflects device time."""
    for _ in range(warmup):
        r = fn(xs[0])
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    out = [fn(x) for x in xs[:iters]]
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / min(iters, len(xs)) * 1e3  # ms


def run_bench(d=32, r=256, m=512, precision=None, iters=24):
    """Component timings dict (see module docstring); reusable from bench.py."""
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.registry import load_data
    from sslrec_tpu.ops import pallas_spmm as ps
    from sslrec_tpu.ops.sparse import CooGraph

    if precision:
        import os
        os.environ["SSLREC_PALLAS_PRECISION"] = precision
        # _mxu_precision is lru_cached — without this, a second in-process
        # run_bench silently keeps the FIRST call's mode (r4 bench caught it:
        # the "default" column reported rel_err 2e-7, i.e. still highest)
        ps._mxu_precision.cache_clear()

    cfg = load_config("lightgcn")
    data = load_data(cfg)
    g: CooGraph = data.extras["bi_adj"]
    if isinstance(g, ps.PallasGraph):
        rows, cols, vals = (np.asarray(g.rows), np.asarray(g.cols),
                            np.asarray(g.vals))
        n = g.n_rows
    else:
        rows, cols, vals = jax.device_get((g.rows, g.cols, g.vals))
        n = g.n_rows
    pg = ps.build_pallas_graph_host(np.asarray(rows, np.int64),
                                    np.asarray(cols, np.int64),
                                    np.asarray(vals, np.float32),
                                    n, n, r=r, m=m)
    nnz = pg.nnz
    padded = int(pg.fwd.cols.shape[0])
    print(f"bi-adj: n={n} nnz={nnz} padded={padded} chunks={pg.fwd.n_chunks} "
          f"(r={r}, m={m}, d={d})")

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d), jnp.float32)
    NX = max(iters, 8)
    xs = jax.block_until_ready([x + 0.01 * i for i in range(NX)])

    fwd_cols, fwd_vals = pg.fwd.cols, pg.fwd.vals

    @jax.jit
    def gather_only(x):
        if ps._mxu_precision() is jax.lax.Precision.DEFAULT:
            return x.astype(jnp.bfloat16)[fwd_cols] \
                * fwd_vals.astype(jnp.bfloat16)[:, None]
        return x[fwd_cols] * fwd_vals[:, None]

    contrib = jax.block_until_ready(gather_only(x))
    contribs = jax.block_until_ready([gather_only(xi) for xi in xs])

    @jax.jit
    def kernel_only(c):
        return ps._blocked_matvec(pg.fwd, c, False)

    @jax.jit
    def fwd(x):
        return ps.pallas_spmm(pg, x)

    @jax.jit
    def fwdgrad(x):
        return jax.value_and_grad(lambda x: ps.pallas_spmm(pg, x).sum())(x)

    coo = CooGraph(rows=jnp.asarray(rows, jnp.int32),
                   cols=jnp.asarray(cols, jnp.int32),
                   vals=jnp.asarray(vals, jnp.float32), n_rows=n, n_cols=n)

    @jax.jit
    def xla_fwd(x):
        contrib = x[coo.cols] * coo.vals[:, None]
        return jax.ops.segment_sum(contrib, coo.rows, num_segments=n,
                                   indices_are_sorted=True)

    @jax.jit
    def xla_fwdgrad(x):
        return jax.value_and_grad(lambda x: xla_fwd(x).sum())(x)

    bpe = 2 if ps._mxu_precision() is jax.lax.Precision.DEFAULT else 4
    res = {}
    res["gather_ms"] = timeit(gather_only, xs, iters=iters)
    res["kernel_ms"] = timeit(kernel_only, contribs, iters=iters)
    res["fwd_ms"] = timeit(fwd, xs, iters=iters)
    res["fwdgrad_ms"] = timeit(fwdgrad, xs, iters=iters)
    res["xla_fwd_ms"] = timeit(xla_fwd, xs, iters=iters)
    res["xla_fwdgrad_ms"] = timeit(xla_fwdgrad, xs, iters=iters)
    # traffic model (fwd): gather reads ~nnz rows of x (bpe) + writes padded
    # contribs (bpe); kernel reads padded contribs (bpe) + writes out f32 once
    traffic = (nnz * d * bpe + 2 * padded * d * bpe
               + pg.fwd.n_rows_pad * d * 4)
    res["fwd_GBps"] = traffic / (res["fwd_ms"] * 1e-3) / 1e9
    err = float(jnp.max(jnp.abs(fwd(x) - xla_fwd(x)))
                / (jnp.max(jnp.abs(xla_fwd(x))) + 1e-12))
    res["rel_err_vs_xla"] = err
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--r", type=int, default=256)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--precision", default=None)
    args = ap.parse_args(argv)
    res = run_bench(d=args.d, r=args.r, m=args.m, precision=args.precision)
    for k, v in res.items():
        print(f"{k:18s} {v:10.4f}")


if __name__ == "__main__":
    main()
