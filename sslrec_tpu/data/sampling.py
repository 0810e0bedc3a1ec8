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
    # all rounds drawn and membership-tested at once: one [rounds*n] batched
    # set lookup (sort-based, see EdgeSet.contains) instead of ``rounds``
    # sequential reject/redraw passes — 142 ms -> ~15 ms per Yelp epoch
    cands = jax.random.randint(key, (rounds, n), low, n_items, dtype=jnp.int32)
    ok = ~edge_set.contains(jnp.broadcast_to(users, (rounds, n)), cands)
    first = jnp.argmax(ok, axis=0)                     # first accepting round
    negs = jnp.take_along_axis(cands, first[None, :], axis=0)[0]
    # Pathological fallback (a user interacting with every item): accept the last
    # candidate even if positive, mirroring "loop forever" semantics closely enough.
    return jnp.where(jnp.any(ok, axis=0), negs, cands[-1])


def sample_uniform_items(key: jax.Array, n: int, n_items: int) -> jnp.ndarray:
    return jax.random.randint(key, (n,), 0, n_items, dtype=jnp.int32)
