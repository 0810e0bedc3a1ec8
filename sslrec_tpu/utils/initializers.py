"""Parameter initialisers matching the reference's torch defaults.

The reference uses ``nn.init.xavier_uniform_`` for embedding tables
(``models/general_cf/lightgcn.py:9,22-23``) and torch ``nn.Linear`` defaults
(kaiming-uniform weight, fan-in uniform bias) for dense layers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    fan_in, fan_out = shape[-2], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal_init(key: jax.Array, shape, std=0.02, dtype=jnp.float32) -> jnp.ndarray:
    return jax.random.normal(key, shape, dtype) * std


def linear_params(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                  dtype=jnp.float32) -> dict:
    """torch ``nn.Linear`` default init: kaiming-uniform(a=√5) weight → U(±1/√fan_in)."""
    wkey, bkey = jax.random.split(key)
    limit = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.uniform(wkey, (in_dim, out_dim), dtype, -limit, limit)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (out_dim,), dtype, -limit, limit)
    return p


def linear_params_xavier(key: jax.Array, in_dim: int, out_dim: int,
                         bias: bool = True, dtype=jnp.float32) -> dict:
    wkey, _ = jax.random.split(key)
    p = {"w": xavier_uniform(wkey, (in_dim, out_dim), dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def apply_linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y
