"""Top-k ranking kernels for full-sort evaluation.

Replaces ``torch.topk`` on ``[B, n_items]`` score matrices
(``trainer/metrics.py:108,165``).  Provides a sharded two-stage variant for
item-sharded score matrices: per-shard ``lax.top_k`` → all-gather the small
``[B, k]`` candidates → final merge — so the ``[B, n_items]`` matrix never has to
be gathered across the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def topk_indices(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Plain top-k item indices per row (ties broken by lower index, like torch)."""
    _, idx = lax.top_k(scores, k)
    return idx


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
