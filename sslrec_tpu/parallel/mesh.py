"""Device mesh and named shardings.

The reference has no distribution layer at all (single ``configs['device']``
string, SURVEY §2.5); this module is the new first-class component: one mesh with
axes ``('data', 'model')``.

- ``data``: batch dimension (BPR/InfoNCE interactions, eval users)
- ``model``: embedding-table rows + graph destination-row partitions

Collectives ride ICI via XLA (`psum`/`all_gather` inserted by shard_map/pjit).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int | None = None,
              devices=None) -> Mesh:
    """Create a ``(data, model)`` mesh over the available devices.

    Defaults: all devices on the data axis (pure DP) unless ``n_model`` given.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_model is None and n_data is None:
        n_data, n_model = n, 1
    elif n_model is None:
        n_model = n // n_data
    elif n_data is None:
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(f"mesh {n_data}x{n_model} needs more than {n} devices")
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows over the model axis (embedding tables)."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading dim over the data axis (interaction batches)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
