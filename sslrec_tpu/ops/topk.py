"""Top-k ranking kernels for full-sort evaluation.

Replaces ``torch.topk`` on ``[B, n_items]`` score matrices (the reference's
``trainer/metrics.py`` full-sort eval; call sites here are the Evaluator's
bitmask/scatter paths in ``sslrec_tpu/trainer/metrics.py``).  Provides a
sharded two-stage variant for
item-sharded score matrices: per-shard ``lax.top_k`` → all-gather the small
``[B, k]`` candidates → final merge — so the ``[B, n_items]`` matrix never has to
be gathered across the mesh.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax


def topk_indices(scores: jnp.ndarray, k: int, block: int = 0) -> jnp.ndarray:
    """Top-k item indices per row (ties broken by lower index, like torch).

    DEFAULT: plain ``lax.top_k``.  The blocked two-stage form (``block > 0``,
    or env ``SSLREC_TOPK_BLOCK``) is EXACT — per-block ``lax.top_k`` (every
    global top-k element is inside its block's top-k) then a merge over the
    ``nb*k`` candidates, tie order preserved (blocks are index-ordered in the
    candidate list and ``lax.top_k`` is stable, so equal values still resolve
    to the lowest index) — but it MEASURES SLOWER on the real eval shapes:
    round-4 quiet-chip head-to-head (``tools/bench_eval_paths.py``) put the
    yelp [1024, 26822] evaluator at 79.6k users/s blocked vs **179.4k plain**
    (2.25x).  Round 3's "~3x faster on [512, 57k]" micro-bench (66afef8) did
    not survive in-context re-measurement — kept opt-in for experimentation.

    Padding never leaks (blocked path): padded candidate slots (global index
    >= n) are forced to -inf (floats) / iinfo.min (ints) before the merge, and
    ties resolve to the earlier candidate position — so rows containing real
    -inf still rank every real column above padding (advisor r4 finding).
    NaN caveat remains: a row whose every value is NaN ranks arbitrarily
    (scores in this framework are finite by construction — history masking
    writes -1e8, not -inf/NaN).
    """
    n = scores.shape[-1]
    # env override read at trace time (unset → default argument)
    env_block = os.environ.get("SSLREC_TOPK_BLOCK")
    if env_block is not None:
        block = int(env_block)
    if block <= 0 or n <= 2 * block or k > block:
        _, idx = lax.top_k(scores, k)
        return idx
    lead = scores.shape[:-1]
    nb = -(-n // block)
    pad = nb * block - n
    if jnp.issubdtype(scores.dtype, jnp.floating):
        lowest = jnp.finfo(scores.dtype).min
    else:
        lowest = jnp.iinfo(scores.dtype).min
    s = jnp.pad(scores, [(0, 0)] * len(lead) + [(0, pad)],
                constant_values=lowest)
    v, i = lax.top_k(s.reshape(*lead, nb, block), k)
    gi = i + (jnp.arange(nb, dtype=jnp.int32) * block)[:, None]
    v, gi = v.reshape(*lead, nb * k), gi.reshape(*lead, nb * k)
    if jnp.issubdtype(scores.dtype, jnp.floating):
        sentinel = jnp.array(-jnp.inf, scores.dtype)
    else:
        sentinel = jnp.array(lowest, scores.dtype)
    v = jnp.where(gi < n, v, sentinel)
    _, p = lax.top_k(v, k)
    return jnp.take_along_axis(gi, p, axis=-1)


def masked_topk_indices(scores: jnp.ndarray, mask_cols: jnp.ndarray,
                        mask_valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k after writing ``-1e8`` at per-row masked columns.

    ``mask_cols``/``mask_valid`` are ``[B, W]`` padded history columns (see
    ``PaddedRows``); parity with ``Metric._mask_history_pos``
    (``trainer/metrics.py:129-135``) and ``BaseModel._mask_predict``
    (``models/base_model.py:35-36``).
    """
    b = scores.shape[0]
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    rows = jnp.broadcast_to(rows, mask_cols.shape)
    # min-update: masked positions become at most -1e8; padding (valid=False)
    # points at column 0 with a no-op update.
    updates = jnp.where(mask_valid, jnp.float32(-1e8), jnp.float32(jnp.inf))
    masked = scores.at[rows, mask_cols].min(updates)
    return topk_indices(masked, k)


def sharded_topk(scores_local: jnp.ndarray, item_offset: jnp.ndarray, k: int,
                 axis_name: str) -> jnp.ndarray:
    """Two-stage global top-k over an item-sharded score matrix.

    To be called inside ``shard_map``: ``scores_local`` is ``[B, n_items/P]`` on
    each device, ``item_offset`` the first global item id of the local shard.
    Returns replicated global ``[B, k]`` indices.
    """
    vals, idx = lax.top_k(scores_local, min(k, scores_local.shape[-1]))
    gidx = idx + item_offset
    all_vals = lax.all_gather(vals, axis_name, axis=-1, tiled=True)
    all_idx = lax.all_gather(gidx, axis_name, axis=-1, tiled=True)
    _, pos = lax.top_k(all_vals, k)
    return jnp.take_along_axis(all_idx, pos, axis=-1)
