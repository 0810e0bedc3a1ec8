"""Sequence augmentations (CL4SRec crop/mask/reorder) as vectorised device ops.

The reference implements these as per-row host-python loops over the batch
(``models/sequential/cl4srec.py:55-133``).  Sequences are left-padded [B, L];
all ops are expressed in *end-offsets* (j = 0 is the most recent item), matching
the reference's negative-index arithmetic, and run fully batched under jit.
Distribution parity per row:

- crop(eta):   keep a contiguous window of ``floor(len*eta)`` items starting at
  a uniform begin ∈ [0, len-num_left], right-aligned in the output.
- mask(gamma): replace ``floor(len*gamma)`` distinct positions with the mask
  token (distinct sampling via top-k of uniform keys).
- reorder(beta): shuffle a contiguous window of ``floor(len*beta)`` positions.

Rows with length ≤ 1 pass through unchanged; each row applies 2 distinct ops
chosen uniformly from the 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lengths(seqs):
    return jnp.sum((seqs > 0).astype(jnp.int32), axis=1)


def _end_offsets(l):
    # j[p] = end-offset of position p in a left-padded row of width L
    return jnp.arange(l - 1, -1, -1, dtype=jnp.int32)


def crop(key, seqs, eta=0.6):
    b, l = seqs.shape
    lens = _lengths(seqs)
    num_left = jnp.maximum((lens.astype(jnp.float32) * eta).astype(jnp.int32), 0)
    begin = jax.random.randint(key, (b,), 0, jnp.maximum(lens - num_left + 1, 1))
    j = _end_offsets(l)[None, :]                      # [1, L] end-offset per pos
    keep = j < num_left[:, None]
    src_pos = jnp.clip(jnp.arange(l)[None, :] - begin[:, None], 0, l - 1)
    out = jnp.where(keep, jnp.take_along_axis(seqs, src_pos, axis=1), 0)
    return out, num_left


def mask(key, seqs, mask_token, gamma=0.3):
    b, l = seqs.shape
    lens = _lengths(seqs)
    num_mask = (lens.astype(jnp.float32) * gamma).astype(jnp.int32)
    j = _end_offsets(l)[None, :]
    valid = j < lens[:, None]
    u = jnp.where(valid, jax.random.uniform(key, (b, l)), 2.0)
    # mask the num_mask smallest keys → distinct positions within the row
    sorted_u = jnp.sort(u, axis=1)
    kth = jnp.take_along_axis(
        jnp.concatenate([sorted_u, jnp.full((b, 1), 3.0)], axis=1),
        jnp.clip(num_mask[:, None] - 1, 0, l), axis=1)
    sel = valid & (u <= kth) & (num_mask[:, None] > 0)
    return jnp.where(sel, mask_token, seqs), lens


def reorder(key, seqs, beta=0.6):
    b, l = seqs.shape
    lens = _lengths(seqs)
    num_re = (lens.astype(jnp.float32) * beta).astype(jnp.int32)
    kb, kp = jax.random.split(key)
    begin = jax.random.randint(kb, (b,), 0, jnp.maximum(lens - num_re + 1, 1))
    j = _end_offsets(l)[None, :]
    in_win = (j >= begin[:, None]) & (j < (begin + num_re)[:, None])
    # random permutation within the window: rank the window positions by random
    # keys, then map each window slot to the slot with that rank
    u = jnp.where(in_win, jax.random.uniform(kp, (b, l)), jnp.inf)
    order = jnp.argsort(u, axis=1)            # order[:, s] = position with rank s
    # window slot index of each in-window position (0..num_re-1 in position order)
    slot = jnp.cumsum(in_win.astype(jnp.int32), axis=1) - 1
    src_pos = jnp.take_along_axis(order, jnp.clip(slot, 0, l - 1), axis=1)
    out = jnp.where(in_win, jnp.take_along_axis(seqs, src_pos, axis=1), seqs)
    return out, lens


def cl4srec_two_views(key, seqs, mask_token, eta=0.6, gamma=0.3, beta=0.6):
    """Two independently-augmented views; ops chosen 2-of-3 without replacement
    per row; rows with length ≤ 1 unchanged."""
    b, l = seqs.shape
    lens = _lengths(seqs)
    ksel, k1, k2 = jax.random.split(key, 3)
    # per-row permutation of (0,1,2): pick by ranking 3 uniforms
    u3 = jax.random.uniform(ksel, (b, 3))
    choice = jnp.argsort(u3, axis=1)  # [:,0] first op, [:,1] second op

    def apply_op(op_idx, k, s):
        c, _ = crop(jax.random.fold_in(k, 0), s, eta)
        m, _ = mask(jax.random.fold_in(k, 1), s, mask_token, gamma)
        r, _ = reorder(jax.random.fold_in(k, 2), s, beta)
        stacked = jnp.stack([c, m, r], axis=0)  # [3, B, L]
        return jnp.take_along_axis(
            stacked, op_idx[None, :, None].astype(jnp.int32), axis=0)[0]

    view1 = apply_op(choice[:, 0], k1, seqs)
    view2 = apply_op(choice[:, 1], k2, seqs)
    passthrough = (lens <= 1)[:, None]
    view1 = jnp.where(passthrough, seqs, view1)
    view2 = jnp.where(passthrough, seqs, view2)
    return view1, view2
