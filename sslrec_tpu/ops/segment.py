"""Segment reductions: the TPU-native replacement for ``torch_scatter``.

The reference uses ``torch_scatter.scatter_{sum,mean,softmax}`` throughout the KG
family (``models/kg/kgcl.py:67-70``, ``kgrec.py``, ``kgin.py``) and dgl's
``update_all(copy_u, sum)`` message passing (``models/model_utils.py:88-96``).
These map to ``jax.ops.segment_*`` plus a numerically-stable segment softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments, sorted_ids: bool = False):
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def segment_mean(data, segment_ids, num_segments, sorted_ids: bool = False):
    s = segment_sum(data, segment_ids, num_segments, sorted_ids)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, sorted_ids)
    return s / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def segment_max(data, segment_ids, num_segments, sorted_ids: bool = False):
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=sorted_ids
    )


def segment_softmax(logits, segment_ids, num_segments, sorted_ids: bool = False):
    """Numerically-stable softmax within segments; ``logits`` is ``[n]``.

    Replacement for ``torch_scatter.scatter_softmax`` (RGAT attention,
    ``models/kg/kgcl.py:67-70``).  Empty segments produce no entries so the
    gathered max/denominator only touch live positions.
    """
    maxes = segment_max(logits, segment_ids, num_segments, sorted_ids)
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)  # empty segments → -inf
    shifted = jnp.exp(logits - maxes[segment_ids])
    denom = segment_sum(shifted, segment_ids, num_segments, sorted_ids)
    return shifted / (denom[segment_ids] + 1e-16)


def segment_normalize(data, segment_ids, num_segments, sorted_ids: bool = False, eps=1e-16):
    """Divide each entry by its segment sum (linear normalisation)."""
    denom = segment_sum(data, segment_ids, num_segments, sorted_ids)
    return data / (denom[segment_ids] + eps)
