"""Parameter checkpointing (save / load-for-test, ``trainer/trainer.py:164-196``).

Uses flax's msgpack serialisation of the parameter pytree — a single portable
file, no torch pickles.  ``load`` restores into a template pytree so shapes and
dtypes are validated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import serialization


def save(path: str, params) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load(path: str, template):
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    return jax.tree.map(jnp.asarray, restored)
