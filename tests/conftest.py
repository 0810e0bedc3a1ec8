"""Test harness: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY §4 item 4).  Must run before jax is imported."""

import os

# Force-override: the environment pins JAX_PLATFORMS to the remote TPU platform,
# which would route every tiny test through the device tunnel (slow) and change
# matmul precision. Tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

from sslrec_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

# The environment's sitecustomize registers a remote-TPU PJRT plugin and calls
# jax.config.update("jax_platforms", "axon,cpu"), overriding the env var — so
# re-assert CPU at the config level before any backend initialises.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402


def random_ui_matrix(n_users=60, n_items=40, density=0.08, seed=0):
    rng = np.random.default_rng(seed)
    mat = sp.random(n_users, n_items, density=density, random_state=rng,
                    data_rvs=lambda n: np.ones(n))
    mat = (mat != 0).astype(np.float32).tocoo()
    # ensure every user/item has at least one interaction (avoids empty rows)
    rows = np.concatenate([mat.row, np.arange(n_users)])
    cols = np.concatenate([mat.col, rng.integers(0, n_items, n_users)])
    vals = np.ones(rows.shape[0], dtype=np.float32)
    out = sp.coo_matrix((vals, (rows, cols)), shape=(n_users, n_items))
    out.sum_duplicates()
    return (out != 0).astype(np.float32).tocoo()


@pytest.fixture
def tiny_ui():
    return random_ui_matrix()


@pytest.fixture
def tiny_bundle():
    from sslrec_tpu.data.general_cf import bundle_from_matrices
    trn = random_ui_matrix(seed=1)
    val = random_ui_matrix(density=0.02, seed=2)
    tst = random_ui_matrix(density=0.02, seed=3)
    return bundle_from_matrices(trn, val, tst)
