"""Shared helpers for reference-vs-JAX numeric parity tests."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import torch
import jax.numpy as jnp


def t2j(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.detach().cpu().numpy())


def j2t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x))


def torch_sparse(coo: sp.spmatrix) -> torch.Tensor:
    coo = coo.tocoo()
    idx = torch.from_numpy(np.vstack([coo.row, coo.col]).astype(np.int64))
    vals = torch.from_numpy(coo.data.astype(np.float32))
    return torch.sparse_coo_tensor(idx, vals, coo.shape).coalesce()


def set_linear(mod: torch.nn.Linear, p: dict) -> None:
    """Copy a repo linear-params dict {w: [in,out], b: [out]} into nn.Linear."""
    with torch.no_grad():
        mod.weight.copy_(j2t(p["w"]).T)
        if mod.bias is not None and "b" in p:
            mod.bias.copy_(j2t(p["b"]))


def set_transformer_layer(ref_layer, jl) -> None:
    """Copy a repo transformer-layer pytree into a reference
    ``model_utils.TransformerLayer``."""
    attn = ref_layer.attention
    for mod, name in zip(attn.linear_layers, ("q", "k", "v")):
        set_linear(mod, jl["attn"][name])
    set_linear(attn.output_linear, jl["attn"]["out"])
    set_linear(ref_layer.feed_forward.w_1, jl["ff"]["w1"])
    set_linear(ref_layer.feed_forward.w_2, jl["ff"]["w2"])
    with torch.no_grad():
        ref_layer.input_sublayer.norm.weight.copy_(j2t(jl["ln1"]["scale"]))
        ref_layer.input_sublayer.norm.bias.copy_(j2t(jl["ln1"]["bias"]))
        ref_layer.output_sublayer.norm.weight.copy_(j2t(jl["ln2"]["scale"]))
        ref_layer.output_sublayer.norm.bias.copy_(j2t(jl["ln2"]["bias"]))


def assert_close(a, b, rtol=1e-4, atol=1e-4, what=""):
    a = np.asarray(a.detach().cpu().numpy() if isinstance(a, torch.Tensor) else a)
    b = np.asarray(b.detach().cpu().numpy() if isinstance(b, torch.Tensor) else b)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=what)


def tiny_social(n_users=24, n_items=18, seed=0):
    """Small random UI + trust matrices where every node has degree ≥ 1."""
    rng = np.random.default_rng(seed)
    ui = sp.random(n_users, n_items, density=0.15, random_state=rng,
                   data_rvs=lambda n: np.ones(n))
    rows = np.concatenate([ui.tocoo().row, np.arange(n_users)])
    cols = np.concatenate([ui.tocoo().col, rng.integers(0, n_items, n_users)])
    ui = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                       shape=(n_users, n_items))
    ui = (ui != 0).astype(np.float32)
    tr = sp.random(n_users, n_users, density=0.12, random_state=rng,
                   data_rvs=lambda n: np.ones(n)).tolil()
    tr.setdiag(0)
    r = np.arange(n_users)
    tr[r, (r + 1) % n_users] = 1  # ensure every user has a friend
    tr = (sp.csr_matrix(tr) != 0).astype(np.float32)
    return ui.tocoo(), tr
