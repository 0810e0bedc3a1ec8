"""Loss parity tests vs closed-form / torch-computed reference values.

torch (CPU) is available in the image, so we check our jnp losses against the
exact formulas of ``models/loss_utils.py`` evaluated with torch ops.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from sslrec_tpu.models import losses

rng = np.random.default_rng(0)


def _pair(shape):
    a = rng.normal(size=shape).astype(np.float32)
    return a, torch.tensor(a), jnp.asarray(a)


def test_bpr_loss():
    a_np, a_t, a_j = _pair((16, 8))
    p_np, p_t, p_j = _pair((16, 8))
    n_np, n_t, n_j = _pair((16, 8))
    # reference formula: softplus(neg_preds - pos_preds), summed
    ref = torch.sum(F.softplus((a_t * n_t).sum(-1) - (a_t * p_t).sum(-1)))
    got = losses.bpr_loss(a_j, p_j, n_j)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_reg_params():
    params = {"a": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
              "b": {"c": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))}}
    expect = float(np.sum(np.square(np.asarray(params["a"])))
                   + np.sum(np.square(np.asarray(params["b"]["c"]))))
    np.testing.assert_allclose(float(losses.reg_params(params)), expect, rtol=1e-5)


def test_infonce_loss():
    e1_np, e1_t, e1_j = _pair((8, 16))
    e2_np, e2_t, e2_j = _pair((8, 16))
    all_np, all_t, all_j = _pair((32, 16))
    temp = 0.2

    def tnorm(x):
        return x / torch.sqrt(1e-8 + x.square().sum(-1, keepdim=True))

    n1, n2, na = tnorm(e1_t), tnorm(e2_t), tnorm(all_t)
    nume = -(n1 * n2 / temp).sum(-1)
    deno = torch.log(torch.sum(torch.exp(n1 @ na.T / temp), dim=-1))
    ref = (nume + deno).sum()
    got = losses.infonce_loss(e1_j, e2_j, all_j, temp)
    # float32 logsumexp vs direct log-sum-exp rounding → loose-ish tolerance
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-3)


def test_infonce_spec_nodes():
    _, e1_t, e1_j = _pair((20, 16))
    _, e2_t, e2_j = _pair((20, 16))
    nodes = np.asarray([1, 4, 7], dtype=np.int32)
    temp = 0.5
    e1n = F.normalize(e1_t + 1e-8, p=2)
    e2n = F.normalize(e2_t + 1e-8, p=2)
    p1, p2 = e1n[nodes], e2n[nodes]
    nume = torch.exp(torch.sum(p1 * p2, dim=-1) / temp)
    deno = torch.exp(p1 @ e2n.T / temp).sum(-1) + 1e-8
    ref = -torch.log(nume / deno).mean()
    got = losses.infonce_loss_spec_nodes(e1_j, e2_j, jnp.asarray(nodes), temp)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


def test_alignment_uniformity():
    _, x_t, x_j = _pair((12, 8))
    _, y_t, y_j = _pair((12, 8))
    ref_align = (F.normalize(x_t, dim=-1) - F.normalize(y_t, dim=-1)) \
        .norm(p=2, dim=1).pow(2).mean()
    np.testing.assert_allclose(float(losses.alignment_loss(x_j, y_j)),
                               float(ref_align), rtol=1e-4)
    xu = F.normalize(x_t, dim=-1)
    ref_unif = torch.pdist(xu, p=2).pow(2).mul(-2).exp().mean().log()
    np.testing.assert_allclose(float(losses.uniformity_loss(x_j)),
                               float(ref_unif), rtol=1e-4)


def test_sce_sig():
    _, x_t, x_j = _pair((10, 6))
    _, y_t, y_j = _pair((10, 6))
    xn, yn = F.normalize(x_t, p=2, dim=-1), F.normalize(y_t, p=2, dim=-1)
    ref_sce = (1 - (xn * yn).sum(-1)).pow(3).mean()
    np.testing.assert_allclose(float(losses.sce_loss(x_j, y_j, 3.0)),
                               float(ref_sce), rtol=1e-4)
    ref_sig = torch.sigmoid(-(xn * yn).sum(1)).mean()
    np.testing.assert_allclose(float(losses.sig_loss(x_j, y_j)),
                               float(ref_sig), rtol=1e-4)


def test_kl_js():
    _, p_t, p_j = _pair((6, 10))
    _, q_t, q_j = _pair((6, 10))
    lp, lq = F.log_softmax(p_t, dim=-1), F.log_softmax(q_t, dim=-1)
    ref_kl = (lp.exp() * (lp - lq)).sum(-1).mean()
    np.testing.assert_allclose(float(losses.kl_divergence(p_j, q_j, False)),
                               float(ref_kl), rtol=1e-4)
    ref_js = ((lp.exp() * (lp - lq)).sum(-1) + (lq.exp() * (lq - lp)).sum(-1)).mean()
    np.testing.assert_allclose(float(losses.js_divergence(p_j, q_j, False)),
                               float(ref_js), rtol=1e-4)


def test_cross_entropy_ignore():
    logits = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    labels = jnp.asarray([3, 0, 1, 0])  # two ignored
    lt = torch.tensor(np.asarray(logits))
    ref = F.cross_entropy(lt, torch.tensor([3, 0, 1, 0]), ignore_index=0)
    got = losses.cross_entropy_ignore(logits, labels, ignore_index=0)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_grace_pair_losses_match_per_pair_form():
    """Advisor r4 (medium): ``grace_pair_losses`` (the fused all-pairs pass
    that replaced per-pair ``grace_loss`` in social DcRec's objective,
    ``models/social/dcrec.py:204-210``) must be numerically equivalent to the
    per-pair form — for random inputs AND all-zero rows (post-relu views can
    produce them; the refl diag is then 0, not 1)."""
    from sslrec_tpu.models.multi_behavior.hmgcr import (grace_loss,
                                                        grace_pair_losses)

    n, d, tau = 37, 8, 0.5   # n deliberately not a multiple of any chunk
    zs = [rng.normal(size=(n, d)).astype(np.float32) for _ in range(3)]
    zs[1][5] = 0.0           # a zero row in one view
    zs[2][0] = 0.0
    zj = [jnp.asarray(z) for z in zs]

    pu = grace_pair_losses(zj, tau, chunk=16)
    for g in range(3):
        for h in range(3):
            if g == h:
                continue
            fused = 0.5 * (float(pu[(g, h)]) + float(pu[(h, g)]))
            per_pair = 0.5 * (float(grace_loss(zj[g], zj[h], tau, chunk=8))
                              + float(grace_loss(zj[h], zj[g], tau, chunk=8)))
            assert abs(fused - per_pair) < 1e-4, (g, h, fused, per_pair)
