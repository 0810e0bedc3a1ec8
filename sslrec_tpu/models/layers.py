"""Neural building blocks (functional): transformer tower + GCN layers.

Equivalents of ``models/model_utils.py:180-277`` (MultiHeadAttention,
PositionwiseFeedForward, pre-LN ResidualConnection, TransformerLayer,
TransformerEmbedding) as pure init/apply functions over explicit parameter
pytrees.  The attention stack is small (2 layers, d=64, L=50) — plain XLA dense
ops hit the MXU; no flash-attention needed at this scale (SURVEY §5).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sslrec_tpu.utils.initializers import linear_params, normal_init


# -- primitives -------------------------------------------------------------

def init_linear_normal(key, in_dim, out_dim, std=0.02):
    """torch Linear re-initialised with N(0, 0.02) weight + zero bias (the
    BERT4Rec ``_init_weights`` convention, ``models/sequential/bert4rec.py``)."""
    wk, _ = jax.random.split(key)
    return {"w": normal_init(wk, (in_dim, out_dim), std),
            "b": jnp.zeros((out_dim,))}


def apply_linear(p, x):
    return x @ p["w"] + p["b"]


def init_layer_norm(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def apply_layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def dropout(key, x, rate, deterministic):
    if deterministic or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# -- multi-head attention ----------------------------------------------------

def init_attention(key, d):
    ks = jax.random.split(key, 4)
    return {
        "q": init_linear_normal(ks[0], d, d),
        "k": init_linear_normal(ks[1], d, d),
        "v": init_linear_normal(ks[2], d, d),
        "out": init_linear_normal(ks[3], d, d),
    }


def apply_attention(p, key, x, mask, n_heads, drop_rate, deterministic):
    """Self-attention; ``mask`` is [B, 1, L, L] or [B, L] key-validity (1=keep).

    Parity with ``model_utils.MultiHeadAttention`` (scores masked to -1e9,
    softmax dropout).
    """
    b, l, d = x.shape
    h = n_heads
    dk = d // h

    def split_heads(t):
        return t.reshape(b, l, h, dk).transpose(0, 2, 1, 3)

    q = split_heads(apply_linear(p["q"], x))
    k = split_heads(apply_linear(p["k"], x))
    v = split_heads(apply_linear(p["v"], x))
    scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(dk)
    if mask is not None:
        if mask.ndim == 2:  # [B, L] key validity
            mask = mask[:, None, None, :]
        scores = jnp.where(mask == 0, -1e9, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = dropout(key, attn, drop_rate, deterministic)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, l, d)
    return apply_linear(p["out"], out)


# -- transformer layer (pre-LN residual, trailing dropout) -------------------

def init_transformer_layer(key, d, d_ff):
    ks = jax.random.split(key, 3)
    return {
        "attn": init_attention(ks[0], d),
        "ff": {"w1": init_linear_normal(ks[1], d, d_ff),
               "w2": init_linear_normal(ks[2], d_ff, d)},
        "ln1": init_layer_norm(d),
        "ln2": init_layer_norm(d),
    }


def apply_transformer_layer(p, key, x, mask, n_heads, drop_rate, deterministic):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    # input sublayer: x + drop(attn(LN(x)))
    a = apply_attention(p["attn"], k1, apply_layer_norm(p["ln1"], x), mask,
                        n_heads, drop_rate, deterministic)
    x = x + dropout(k2, a, drop_rate, deterministic)
    # output sublayer: x + drop(ff(LN(x)))
    h = apply_linear(p["ff"]["w1"], apply_layer_norm(p["ln2"], x))
    h = dropout(k3, jax.nn.gelu(h, approximate=False), drop_rate, deterministic)
    h = apply_linear(p["ff"]["w2"], h)
    x = x + dropout(k4, h, drop_rate, deterministic)
    # trailing dropout (model_utils.TransformerLayer.forward)
    return dropout(k5, x, drop_rate, deterministic)


# -- token+position embedding ------------------------------------------------

def init_transformer_embedding(key, vocab, d, max_len):
    k1, k2 = jax.random.split(key)
    tok = normal_init(k1, (vocab, d), 0.02)
    tok = tok.at[0].set(0.0)  # padding_idx=0 zeroed (torch Embedding semantic)
    return {"token": tok, "pos": normal_init(k2, (max_len, d), 0.02)}


def apply_transformer_embedding(p, key, seqs, drop_rate, deterministic):
    """[B, L] int ids → [B, L, d]; position emb added everywhere (incl. pads),
    matching ``model_utils.TransformerEmbedding``; token row 0 forced to zero."""
    x = p["token"][seqs] * (seqs != 0)[..., None]
    x = x + p["pos"][None, : seqs.shape[1], :]
    return dropout(key, x, drop_rate, deterministic)


# -- full tower --------------------------------------------------------------

def init_transformer_tower(key, vocab, d, max_len, n_layers, d_ff=None):
    d_ff = d_ff or d * 4
    ks = jax.random.split(key, n_layers + 1)
    return {
        "emb": init_transformer_embedding(ks[0], vocab, d, max_len),
        "layers": [init_transformer_layer(k, d, d_ff) for k in ks[1:]],
    }


def apply_transformer_tower(p, key, seqs, n_heads, drop_rate, deterministic):
    """Returns hidden states [B, L, d]; attention mask = key validity of pads."""
    keys = jax.random.split(key, len(p["layers"]) + 1)
    mask = (seqs > 0).astype(jnp.int32)  # [B, L]
    x = apply_transformer_embedding(p["emb"], keys[0], seqs, drop_rate, deterministic)
    for lp, k in zip(p["layers"], keys[1:]):
        x = apply_transformer_layer(lp, k, x, mask, n_heads, drop_rate, deterministic)
    return x
