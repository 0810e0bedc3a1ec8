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
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
        jax.block_until_ready(fn(xs[0]))
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


def run_interleaved(d=32, r=256, m=512, trials=9, iters=6):
    """Contention-robust Pallas-vs-XLA comparison (round-5, VERDICT r4 #1).

    The r4 driver suite timed Pallas and XLA in separate blocks, so platform
    drift between blocks masqueraded as a kernel margin (BENCH_r04 showed
    Pallas fwd 7.63 ms vs XLA 5.06 in-suite while standalone same-morning runs
    showed 3.41 vs 5.23).  Here all six variants — Pallas exact-f32 fwd/grad,
    Pallas default-precision (bf16 gather + 1-pass MXU) fwd/grad, XLA
    segment-sum fwd/grad — are compiled up front and then cycled WITHIN each
    trial (A/B/A/B over distinct pre-materialised inputs), so any drift hits
    every variant equally.  Reports per-variant median and IQR over trials.

    Reference workload being accelerated: the k-layer sparse propagation of
    /root/reference/models/general_cf/lightgcn.py:28-29.
    """
    import os
    from sslrec_tpu.config import load_config
    from sslrec_tpu.data.registry import load_data
    from sslrec_tpu.ops import pallas_spmm as ps
    from sslrec_tpu.ops.sparse import CooGraph

    prev = os.environ.get("SSLREC_PALLAS_PRECISION")

    cfg = load_config("lightgcn")
    data = load_data(cfg)
    g = data.extras["bi_adj"]
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
    coo = CooGraph(rows=jnp.asarray(rows, jnp.int32),
                   cols=jnp.asarray(cols, jnp.int32),
                   vals=jnp.asarray(vals, jnp.float32), n_rows=n, n_cols=n)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d), jnp.float32)
    NX = 2 * iters
    xs = jax.block_until_ready([x + 0.01 * i for i in range(NX)])

    def make_pallas_fns():
        # Fresh wrappers per precision mode: pallas_spmm reads the (cleared)
        # lru-cached precision at TRACE time, so each jit bakes its own mode.
        fwd = jax.jit(lambda x: ps.pallas_spmm(pg, x))
        grd = jax.jit(
            lambda x: jax.value_and_grad(lambda y: ps.pallas_spmm(pg, y).sum())(x))
        return fwd, grd

    @jax.jit
    def xla_fwd(x):
        contrib = x[coo.cols] * coo.vals[:, None]
        return jax.ops.segment_sum(contrib, coo.rows, num_segments=n,
                                   indices_are_sorted=True)

    @jax.jit
    def xla_grd(x):
        return jax.value_and_grad(lambda y: xla_fwd(y).sum())(x)

    os.environ["SSLREC_PALLAS_PRECISION"] = "highest"
    ps._mxu_precision.cache_clear()
    pex_fwd, pex_grd = make_pallas_fns()
    ref = jax.block_until_ready(xla_fwd(x))
    err_exact = float(jnp.max(jnp.abs(pex_fwd(x) - ref))
                      / (jnp.max(jnp.abs(ref)) + 1e-12))

    os.environ["SSLREC_PALLAS_PRECISION"] = "default"
    ps._mxu_precision.cache_clear()
    pdf_fwd, pdf_grd = make_pallas_fns()
    err_default = float(jnp.max(jnp.abs(pdf_fwd(x) - ref))
                        / (jnp.max(jnp.abs(ref)) + 1e-12))

    if prev is None:
        os.environ.pop("SSLREC_PALLAS_PRECISION", None)
    else:
        os.environ["SSLREC_PALLAS_PRECISION"] = prev
    ps._mxu_precision.cache_clear()

    variants = [
        ("pallas_fwd", pex_fwd), ("xla_fwd", xla_fwd),
        ("pallas_grad", pex_grd), ("xla_grad", xla_grd),
        ("default_fwd", pdf_fwd), ("default_grad", pdf_grd),
    ]
    # warm every variant (compile + one run) before any timing
    for _, fn in variants:
        jax.block_until_ready(fn(xs[0]))

    samples = {name: [] for name, _ in variants}
    for t in range(trials):
        off = (t * iters) % NX
        batch = (xs + xs)[off:off + iters]
        for name, fn in variants:
            samples[name].append(timeit(fn, batch, iters=iters, warmup=0))

    res = {}
    for name, _ in variants:
        arr = np.asarray(samples[name])
        res[f"{name}_ms"] = float(np.median(arr))
        res[f"{name}_iqr_ms"] = float(np.percentile(arr, 75)
                                      - np.percentile(arr, 25))
    res["rel_err_vs_xla"] = err_exact
    res["default_rel_err_vs_xla"] = err_default
    res["trials"] = trials
    res["combined_pallas_ms"] = res["pallas_fwd_ms"] + res["pallas_grad_ms"]
    res["combined_xla_ms"] = res["xla_fwd_ms"] + res["xla_grad_ms"]
    res["combined_default_ms"] = res["default_fwd_ms"] + res["default_grad_ms"]
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--r", type=int, default=256)
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--precision", default=None)
    ap.add_argument("--interleaved", action="store_true",
                    help="contention-robust A/B comparison (median + IQR)")
    ap.add_argument("--trials", type=int, default=9)
    args = ap.parse_args(argv)
    if args.interleaved:
        res = run_interleaved(d=args.d, r=args.r, m=args.m, trials=args.trials)
    else:
        res = run_bench(d=args.d, r=args.r, m=args.m, precision=args.precision)
    for k, v in res.items():
        print(f"{k:24s} {v:10.4f}" if isinstance(v, float) else f"{k:24s} {v}")


if __name__ == "__main__":
    main()
