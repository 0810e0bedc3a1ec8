"""Device-side negative sampling.

The reference resamples one negative per (user, pos) interaction at every epoch
with a host-python rejection loop over a dok matrix
(``data_utils/datasets_general_cf.py:13-20``) — the hottest host loop in its
training path.  Here the whole epoch's negatives are drawn in one jitted call:
uniform draws + membership rejection against the sorted edge-code set, with a
fixed number of redraw rounds (collision probability after R rounds is
density^R ≈ 1e-4^R for these datasets — beyond float error by R=4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sslrec_tpu.ops.sparse import EdgeSet


@partial(jax.jit, static_argnames=("n_items", "rounds", "low"))
def sample_negatives(key: jax.Array, users: jnp.ndarray, edge_set: EdgeSet,
                     n_items: int, rounds: int = 6, low: int = 0) -> jnp.ndarray:
    """One negative item per interaction: uniform over [low, n_items), rejecting
    train edges.  ``low=1`` replicates the sequential sampler's 1-indexed draw
    (``data_utils/datasets_sequential.py:176``).

    ``users``: int32 [n]; returns int32 [n].
    """
    n = users.shape[0]

    def body(carry, k):
        negs, done = carry
        cand = jax.random.randint(k, (n,), low, n_items, dtype=jnp.int32)
        is_pos = edge_set.contains(users, cand)
        take = jnp.logical_and(~done, ~is_pos)
        negs = jnp.where(take, cand, negs)
        done = jnp.logical_or(done, take)
        return (negs, done), None

    keys = jax.random.split(key, rounds)
    init = (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool))
    (negs, done), _ = jax.lax.scan(body, init, keys)
    # Pathological fallback (a user interacting with every item): accept the last
    # candidate even if positive, mirroring "loop forever" semantics closely enough.
    last = jax.random.randint(keys[-1], (n,), low, n_items, dtype=jnp.int32)
    return jnp.where(done, negs, last)


def sample_uniform_items(key: jax.Array, n: int, n_items: int) -> jnp.ndarray:
    return jax.random.randint(key, (n,), 0, n_items, dtype=jnp.int32)
