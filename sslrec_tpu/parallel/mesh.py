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


def mesh_from_config(cfg) -> Mesh | None:
    """Config-driven mesh: ``train.mesh: {data: N, model: M}`` → Mesh, else None.

    Either axis may be omitted (the other fills the remaining devices, as in
    :func:`make_mesh`).  ``train.mesh`` absent or empty → single-device training
    (no mesh), matching the reference's behaviour.
    """
    spec = cfg.train.get("mesh")
    if not spec:
        return None
    n_data = spec.get("data")
    n_model = spec.get("model")
    if n_data is None and n_model is None:
        return None
    return make_mesh(n_data=int(n_data) if n_data else None,
                     n_model=int(n_model) if n_model else None)


_DIST_INITIALIZED = False


def maybe_distributed_init(cfg=None) -> bool:
    """Gated ``jax.distributed.initialize`` for multi-host (DCN) runs.

    The single-host path never calls this implicitly.  Enable with env vars
    (the standard JAX cluster spec) or ``train.distributed`` config::

        SSLREC_COORDINATOR=host0:1234 SSLREC_NUM_PROCESSES=2 SSLREC_PROCESS_ID=0

    or ``train.distributed: {coordinator: ..., num_processes: N, process_id: K}``.
    On TPU pods with cloud metadata, set ``SSLREC_DISTRIBUTED=1`` and JAX
    autodetects all three.  Axis mapping: the ``data`` axis of the mesh spans
    hosts (gradient ``psum`` rides DCN once per step — small, latency-tolerant),
    while ``model`` (embedding-row shards, per-layer ``all_gather``) must stay
    within a host's ICI domain; ``make_mesh``'s row-major device order ensures
    this whenever ``n_model`` divides the per-host device count.

    Returns True if initialize was called (idempotent).
    """
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return True
    import os

    spec = {}
    if cfg is not None:
        spec = dict(cfg.train.get("distributed") or {})
    coord = os.environ.get("SSLREC_COORDINATOR", spec.get("coordinator"))
    n_proc = os.environ.get("SSLREC_NUM_PROCESSES", spec.get("num_processes"))
    proc_id = os.environ.get("SSLREC_PROCESS_ID", spec.get("process_id"))
    auto = os.environ.get("SSLREC_DISTRIBUTED", "") == "1" or spec.get("enable")
    if not (auto or coord):
        return False
    kwargs = {}
    if coord:
        if n_proc is None or proc_id is None:
            raise ValueError(
                "distributed init: a coordinator address requires num_processes "
                "and process_id (SSLREC_NUM_PROCESSES / SSLREC_PROCESS_ID or "
                "train.distributed.{num_processes,process_id})")
        kwargs = {"coordinator_address": coord,
                  "num_processes": int(n_proc),
                  "process_id": int(proc_id)}
    jax.distributed.initialize(**kwargs)
    _DIST_INITIALIZED = True
    return True
