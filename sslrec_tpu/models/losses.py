"""Loss library: functional JAX equivalents of the reference loss surface.

Behavioural parity with ``models/loss_utils.py`` (function-by-function, same
reductions and epsilons) so converged metrics can be compared.  All are pure
``jnp`` functions; XLA fuses the elementwise chains into the surrounding matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bpr_loss(anc_embeds, pos_embeds, neg_embeds):
    """Softplus-form BPR, sum-reduced (``loss_utils.py:7-10``).

    Callers divide by batch size like the reference (``lightgcn.py:52``).
    """
    pos_preds = jnp.sum(anc_embeds * pos_embeds, axis=-1)
    neg_preds = jnp.sum(anc_embeds * neg_embeds, axis=-1)
    return jnp.sum(jax.nn.softplus(neg_preds - pos_preds))


def reg_pick_embeds(embeds_list):
    """Sum of squared entries over picked embedding batches (``loss_utils.py:13-17``)."""
    return sum(jnp.sum(jnp.square(e)) for e in embeds_list)


def reg_params(params):
    """L2² over every parameter leaf (``loss_utils.py:20-24``)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(jnp.square(p)) for p in leaves)


def _l2norm_eps(x, eps=1e-8):
    return x / jnp.sqrt(eps + jnp.sum(jnp.square(x), axis=-1, keepdims=True))


def _l2norm_safe(x, eps=1e-12):
    """Row L2-normalise with a finite gradient at zero rows (torch F.normalize
    clamps the denominator; jnp.linalg.norm's gradient NaNs at exactly 0)."""
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


def infonce_loss(embeds1, embeds2, all_embeds2, temp=1.0):
    """InfoNCE, sum-reduced, both operands L2-normalised (``loss_utils.py:30-39``)."""
    n1 = _l2norm_eps(embeds1)
    n2 = _l2norm_eps(embeds2)
    na2 = _l2norm_eps(all_embeds2)
    nume_term = -jnp.sum(n1 * n2 / temp, axis=-1)
    deno_term = jax.nn.logsumexp(n1 @ na2.T / temp, axis=-1)
    return jnp.sum(nume_term + deno_term)


def infonce_loss_spec_nodes(embeds1, embeds2, nodes, temp):
    """InfoNCE over selected node ids, mean-reduced (``loss_utils.py:42-51``).

    Note the reference normalises with ``F.normalize(x + 1e-8)`` (additive eps)
    — replicated here.
    """

    def _norm(x):
        return _l2norm_safe(x + 1e-8)

    e1 = _norm(embeds1)
    e2 = _norm(embeds2)
    p1 = e1[nodes]
    p2 = e2[nodes]
    nume = jnp.exp(jnp.sum(p1 * p2, axis=-1) / temp)
    deno = jnp.sum(jnp.exp(p1 @ e2.T / temp), axis=-1) + 1e-8
    return -jnp.mean(jnp.log(nume / deno))


def sce_loss(x, y, alpha=3.0):
    """Scaled cosine error (GraphMAE; ``loss_utils.py:54-61``)."""
    xn, yn = _l2norm_safe(x), _l2norm_safe(y)
    return jnp.mean(jnp.power(1.0 - jnp.sum(xn * yn, axis=-1), alpha))


def sig_loss(x, y):
    """Sigmoid loss (GraphMAE; ``loss_utils.py:64-71``)."""
    xn, yn = _l2norm_safe(x), _l2norm_safe(y)
    return jnp.mean(jax.nn.sigmoid(-jnp.sum(xn * yn, axis=-1)))


def alignment_loss(x, y, alpha=2.0):
    """DirectAU alignment (``loss_utils.py:75-78``)."""
    xn, yn = _l2norm_safe(x), _l2norm_safe(y)
    return jnp.mean(jnp.sum(jnp.square(xn - yn), axis=-1) ** (alpha / 2.0))


def uniformity_loss(x):
    """DirectAU uniformity: log-mean-exp of -2·pairwise-dist² (``loss_utils.py:81-86``).

    ``torch.pdist`` enumerates unordered distinct pairs; since the Gaussian kernel
    matrix is symmetric with unit diagonal, its off-diagonal mean equals the pair
    mean — computed here from the [B, B] Gram matrix (MXU matmul, O(B²) memory
    instead of O(B²·d)).
    """
    xn = _l2norm_safe(x)
    gram = xn @ xn.T
    sq = jnp.maximum(2.0 - 2.0 * gram, 0.0)  # ||a-b||² for unit vectors
    n = x.shape[0]
    total = jnp.sum(jnp.exp(-2.0 * sq)) - n  # drop the diagonal (exp(0)=1 each)
    return jnp.log(total / (n * (n - 1)))


def kl_divergence(p, q, is_prob: bool, reduce: str = "mean"):
    """KL(p‖q) over the last axis (``loss_utils.py:89-104``)."""
    if not is_prob:
        p = jax.nn.log_softmax(p, axis=-1)
        q = jax.nn.log_softmax(q, axis=-1)
    res = jnp.sum(jnp.exp(p) * (p - q), axis=-1)
    return _reduce(res, reduce)


def js_divergence(p, q, is_prob: bool, reduce: str = "mean"):
    """Symmetrised KL (``loss_utils.py:107-120``)."""
    if not is_prob:
        p = jax.nn.log_softmax(p, axis=-1)
        q = jax.nn.log_softmax(q, axis=-1)
    res = jnp.sum(jnp.exp(p) * (p - q), axis=-1) + jnp.sum(jnp.exp(q) * (q - p), axis=-1)
    return _reduce(res, reduce)


def _reduce(res, reduce):
    if reduce == "mean":
        return jnp.mean(res)
    if reduce == "sum":
        return jnp.sum(res)
    if reduce == "none":
        return res
    raise NotImplementedError(reduce)


def cross_entropy_ignore(logits, labels, ignore_index=0):
    """Mean CE skipping ignore_index positions (BERT4Rec's masked-LM loss,
    ``models/sequential/bert4rec.py`` CE with ``ignore_index=0``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    valid = (labels != ignore_index).astype(logits.dtype)
    return -jnp.sum(ll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
