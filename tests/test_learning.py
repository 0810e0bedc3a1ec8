"""Per-scenario learning + SSL-ablation integration tests.

The per-model smoke tests assert only finiteness; these tests assert the
training loop actually *learns* on structured synthetic data with a planted
signal, one dataset per scenario (LightGCN's beats-random test lives in
``test_train_smoke``; sequential models are pinned by the golden metrics):

- general_cf: popularity-skewed parity communities with noise likes.
- KG: items link to genre entities plus distractor noise relations; the
  held-out signal is reachable only through the KG triples.
- social: user communities with clean intra-community trust and noisy
  interactions. Trust is the transfer path.
- multi-behavior: a rich auxiliary 'view' behavior vs a sparse noisy target
  'buy' behavior; aux propagation carries the signal for held-out buys.

Every dataset and seed is fixed, so the measured margins are deterministic
on the CPU test platform (margins quoted per helper were measured here).

And the SSL-ablation pins: with everything else fixed (same seed, same
epochs), the self-supervised objective switched ON must beat OFF on held-out
data for SGL (cl_weight), KGCL (cl_weight), MHCN (ss_rate) and CML
(train.beta).  If an SSL term is silently inert, ON == OFF exactly — which
also fails the strict inequality.

Reference behaviors exercised: SGL ``models/general_cf/sgl.py`` cl loss,
KGCL ``models/kg/kgcl.py`` graph-view contrastive, MHCN
``models/social/mhcn.py`` hypergraph self-supervision, CML
``models/multi_behavior/cml.py`` meta contrastive weighting.
"""

import numpy as np
import scipy.sparse as sp
import jax

from sslrec_tpu.config import load_config
from sslrec_tpu.models.registry import build_model
from sslrec_tpu.trainer.trainer import Trainer
from sslrec_tpu.trainer.metrics import Evaluator


class _Silent:
    def log(self, *a, **k):
        pass

    log_loss = log
    log_eval = log


def _train_recall(cfg, data, seed=0):
    """Train from scratch; returns (random-params recall, trained recall)."""
    model = build_model(cfg, data)
    params0 = model.init_params(jax.random.PRNGKey(seed))
    before = float(Evaluator(model, data.test, cfg)(params0)["recall"][0])
    trainer = Trainer(cfg, model, data, logger=_Silent())
    trainer.train(params0)
    after = float(trainer.test_results["recall"][0])
    return before, after


# ---------------------------------------------------------------- sequential


def test_bert4rec_learns():
    """BERT4Rec lifts next-item recall on a planted Markov cycle: every
    sequence walks the fixed successor chain i → i+1 (mod n), so the masked
    transformer can learn the transition exactly while random params sit at
    chance (k/n)."""
    from sslrec_tpu.data import sequential as seq_data

    n_items, n_users = 50, 120
    rng = np.random.default_rng(0)
    trn = ([], [], [])
    tst = ([], [], [])
    for u in range(n_users):
        start = int(rng.integers(1, n_items + 1))
        ln = int(rng.integers(5, 10))
        seq = [(start + j - 1) % n_items + 1 for j in range(ln + 1)]
        trn[0].append(u); trn[1].append(seq[:-1]); trn[2].append(seq[-1])
        tst[0].append(u); tst[1].append(seq); tst[2].append(seq[-1] % n_items + 1)
    cfg = load_config("bert4rec", overrides={
        "train.epoch": 40, "train.batch_size": 32, "train.test_step": 40,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "model.max_seq_len": 12,
        "model.n_layers": 1, "model.n_heads": 2,
    })
    data = seq_data.bundle_from_seqs(cfg, trn, tst)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.3, (before, after)


# ---------------------------------------------------------------- general_cf


def _cf_bundle(seed=0, n_u=192, n_i=48, n_pop=8, pop_likes=4, niche=5,
               held=2, noise=2):
    """Popularity-skewed parity data: every user likes 4 of 8 'popular' items
    (degree-dominating noise) plus 5 'niche' items of their parity community;
    2 niche items are held out, and 2 cross-parity noise likes corrupt each
    user's train row.  BPR alone over-ranks the popular block and overfits
    the noise; the contrastive uniformity term recovers niche recall — the
    classic SGL debiasing effect, which makes the ablation margin reliable
    (measured: cl_weight 0 → R@5 0.122, cl_weight 1.0 → 0.185)."""
    from sslrec_tpu.data.general_cf import bundle_from_matrices
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    tst = sp.lil_matrix((n_u, n_i))
    for u in range(n_u):
        pops = rng.choice(n_pop, size=pop_likes, replace=False)
        rows += [u] * pop_likes
        cols += list(pops)
        mine = [i for i in range(n_pop, n_i) if i % 2 == u % 2]
        pick = rng.choice(mine, size=niche + held, replace=False)
        rows += [u] * niche
        cols += list(pick[:niche])
        for i in pick[niche:]:
            tst[u, i] = 1
        other = [i for i in range(n_pop, n_i) if i % 2 != u % 2]
        rows += [u] * noise
        cols += list(rng.choice(other, size=noise, replace=False))
    trn = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n_u, n_i))
    return bundle_from_matrices(trn.tocoo(), None, tst.tocsr().tocoo())


def _sgl_cfg(cl_weight):
    return load_config("sgl", overrides={
        "train.epoch": 100, "train.batch_size": 256, "train.test_step": 100,
        "train.patience": 0, "test.batch_size": 32, "test.k": [5, 10],
        "model.embedding_size": 16, "model.keep_rate": 0.8,
        "model.cl_weight": cl_weight, "optimizer.lr": 1.0e-2,
    })


def test_sgl_learns_and_ssl_helps():
    data = _cf_bundle()
    before, with_ssl = _train_recall(_sgl_cfg(1.0), data)
    assert with_ssl > before + 0.04, (before, with_ssl)
    _, without = _train_recall(_sgl_cfg(0.0), data)
    assert with_ssl > without + 0.02, (with_ssl, without)


# ----------------------------------------------------------------------- KG


def _kg_bundle(cfg, seed=0, n_users=96, n_items=96, n_genres=8, likes=4,
               held=2, n_noise_ents=32, noise_links=3):
    """Planted-genre KG with distractor relations: item i links to its genre
    entity via relation 0 AND to 3 random noise entities via relation 1; user
    u likes genre u%8 items.  At random init the noisy aggregation hides the
    genre signal (a pure-structure propagation can't solve it), so beating
    random requires the RGAT attention to learn to favor the genre relation —
    and the held-out items are reachable only through the KG."""
    from sslrec_tpu.data import kg as kg_data
    rng = np.random.default_rng(seed)
    train_cf, test_cf = [], []
    for u in range(n_users):
        g = u % n_genres
        mine = [i for i in range(n_items) if i % n_genres == g]
        pick = rng.choice(mine, size=likes + held, replace=False)
        train_cf += [(u, i) for i in pick[:likes]]
        test_cf += [(u, i) for i in pick[likes:]]
    raw = [(i, 0, n_items + (i % n_genres)) for i in range(n_items)]
    for i in range(n_items):
        for e in rng.choice(n_noise_ents, size=noise_links, replace=False):
            raw.append((i, 1, n_items + n_genres + int(e)))
    raw = np.asarray(raw, np.int64)
    can = np.unique(raw, axis=0)
    inv = can.copy()
    inv[:, 0], inv[:, 2] = can[:, 2], can[:, 0]
    inv[:, 1] = can[:, 1] + can[:, 1].max() + 1
    can[:, 1] += 1
    inv[:, 1] += 1
    trip = np.concatenate([can, inv])
    n_ent = int(max(trip[:, 0].max(), trip[:, 2].max()) + 1)
    n_rel = int(trip[:, 1].max() + 1)
    return kg_data.bundle_from_kg(cfg, np.asarray(train_cf, np.int64),
                                  np.asarray(test_cf, np.int64), trip,
                                  n_ent, n_rel)


def _kgcl_cfg(cl_weight):
    return load_config("kgcl", overrides={
        "train.epoch": 60, "train.batch_size": 64, "train.kg_batch_size": 32,
        "train.test_step": 60, "train.patience": 0, "train.train_trans": False,
        "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "model.triplet_num": 8,
        "model.cl_weight": cl_weight, "optimizer.lr": 5.0e-3,
    })


def test_kgcl_learns_and_ssl_helps():
    cfg = _kgcl_cfg(0.1)
    data = _kg_bundle(cfg)
    before, with_ssl = _train_recall(cfg, data)
    assert with_ssl > before + 0.10, (before, with_ssl)
    _, without = _train_recall(_kgcl_cfg(0.0), data)
    assert with_ssl > without + 0.01, (with_ssl, without)


def test_kgin_learns():
    """KGIN (intent-disentangled relational GNN) on the planted-genre KG."""
    cfg = load_config("kgin", overrides={
        "train.epoch": 60, "train.batch_size": 64, "train.test_step": 60,
        "train.patience": 0, "train.scan_chunk": 0, "test.batch_size": 16,
        "test.k": [5, 10], "model.embedding_size": 16,
        "optimizer.lr": 5.0e-3,
    })
    data = _kg_bundle(cfg)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.10, (before, after)


def test_kgrec_learns():
    """KGRec (rationale-weighted KG aggregation + MAE + CL) on the
    planted-genre KG."""
    cfg = load_config("kgrec", overrides={
        "train.epoch": 60, "train.batch_size": 64, "train.test_step": 60,
        "train.patience": 0, "train.scan_chunk": 0, "test.batch_size": 16,
        "test.k": [5, 10], "model.embedding_size": 16,
        "optimizer.lr": 5.0e-3,
    })
    data = _kg_bundle(cfg)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.10, (before, after)


def _diffkg_cfg(**extra):
    over = {
        "train.epoch": 40, "train.batch_size": 64, "train.test_step": 40,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "model.dims_list": [64],
        "model.rebuild_k": 2, "model.keepRate": 1.0, "model.triplet_num": 8,
        "optimizer.lr": 5.0e-3,
    }
    over.update(extra)
    return load_config("diffkg", overrides=over)


def test_diffkg_learns_and_rebuild_recovers_kg():
    """The diffusion→KG-rebuild→rec loop (reference ``trainer/trainer.py:
    1205-1309``) on the planted-genre KG: (a) training lifts held-out recall
    over random init; (b) after training, the denoiser's top-k reverse-sampled
    rows reconstruct edges that EXIST in the original KG far above chance —
    with ``keepRate: 1.0`` the rebuilt-edge validity mask is exactly the
    (h, t)-found indicator, so its mean is the recovery rate (chance level =
    mean KG row density ≈ row_degree/n_ent ≈ 4/136 ≈ 0.03)."""
    cfg = _diffkg_cfg()
    data = _kg_bundle(cfg)
    model = build_model(cfg, data)
    p0 = model.init_params(jax.random.PRNGKey(0))
    before = float(Evaluator(model, data.test, cfg)(p0)["recall"][0])
    trainer = Trainer(cfg, model, data, logger=_Silent())
    trainer.train(p0)
    after = float(trainer.test_results["recall"][0])
    assert after > before + 0.10, (before, after)
    aux = model._rebuild(model._dn_params, jax.random.PRNGKey(1),
                         model.kg_rows.cols, model.kg_rows.mask)
    recovered = float(np.mean(np.asarray(aux["dkg"][3])))
    assert recovered > 0.30, recovered


# -------------------------------------------------------------------- social


def _social_matrices(seed=0, n_u=96, n_i=96, n_c=8, likes=4, held=2,
                     tn=4, noise=3):
    """8 user communities with 12 signature items each; trust is clean and
    intra-community while the train interactions carry 3 cross-community
    noise likes per user.  The hypergraph self-supervision injects the trust
    structure, so it pays off exactly when interactions are noisy — which is
    what makes the ON-vs-OFF margin reliable.  Returns (trn, tst, trust,
    item_community) — the last is each item's dominant community id, used as
    the planted category matrix for the metapath models."""
    rng = np.random.default_rng(seed)
    sig = {c: rng.choice(n_i, size=12, replace=False) for c in range(n_c)}
    rows, cols = [], []
    tst = sp.lil_matrix((n_u, n_i))
    for u in range(n_u):
        c = u % n_c
        pick = rng.choice(sig[c], size=likes + held, replace=False)
        rows += [u] * likes
        cols += list(pick[:likes])
        for i in pick[likes:]:
            tst[u, i] = 1
        others = [i for i in range(n_i) if i not in sig[c]]
        rows += [u] * noise
        cols += list(rng.choice(others, size=noise, replace=False))
    trn = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n_u, n_i))
    t_rows, t_cols = [], []
    for u in range(n_u):
        peers = [v for v in range(n_u) if v % n_c == u % n_c and v != u]
        for v in rng.choice(peers, size=tn, replace=False):
            t_rows.append(u)
            t_cols.append(v)
    trust = sp.csr_matrix((np.ones(len(t_rows)), (t_rows, t_cols)),
                          shape=(n_u, n_u))
    trust = ((trust + trust.T) != 0).astype(np.float32)
    # item i's community: the community whose signature set contains it most
    # often (ties → lowest id); items in no signature get community 0
    item_comm = np.zeros(n_i, np.int64)
    for c in range(n_c):
        item_comm[sig[c]] = c
    return trn, tst.tocsr(), trust, item_comm


def _social_bundle(cfg, seed=0, **kw):
    from sslrec_tpu.data import social as social_data
    trn, tst, trust, _ = _social_matrices(seed=seed, **kw)
    return social_data.bundle_from_matrices(cfg, trn, tst, trust)


def _mhcn_cfg(ss_rate):
    return load_config("mhcn", overrides={
        "train.epoch": 60, "train.batch_size": 128, "train.test_step": 60,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "model.ss_rate": ss_rate,
        "optimizer.lr": 5.0e-3,
    })


def test_mhcn_learns_and_ssl_helps():
    cfg = _mhcn_cfg(0.05)
    data = _social_bundle(cfg)
    model = build_model(cfg, data)
    p0 = model.init_params(jax.random.PRNGKey(0))
    before = Evaluator(model, data.test, cfg)(p0)["recall"]
    trainer = Trainer(cfg, model, data, logger=_Silent())
    trainer.train(p0)
    with_ssl = trainer.test_results["recall"]
    assert with_ssl[0] > before[0] + 0.04, (before, with_ssl)
    # SSL margin summed over both cutoffs (one granularity step each at
    # 1/192; the sum gives two steps of deterministic headroom)
    cfg0 = _mhcn_cfg(0.0)
    model0 = build_model(cfg0, data)
    t0 = Trainer(cfg0, model0, data, logger=_Silent())
    t0.train(model0.init_params(jax.random.PRNGKey(0)))
    without = t0.test_results["recall"]
    assert with_ssl[0] + with_ssl[1] > without[0] + without[1] + 0.008, (
        with_ssl, without)


def _social_bundle_with_structs(cfg, seed=0, with_time=False):
    """Planted-community bundle with the category matrix the metapath models
    consume (item → its community) and, for KCGN, ratings/times on the train
    sparsity."""
    from sslrec_tpu.data import social as social_data
    trn, tst, trust, item_comm = _social_matrices(seed=seed)
    n_i = trn.shape[1]
    n_c = int(item_comm.max()) + 1
    cat = sp.csr_matrix(np.eye(n_c, dtype=np.float32)[item_comm])
    trn_time = None
    if with_time:
        rng = np.random.default_rng(seed + 1)
        coo = trn.tocoo()
        trn = sp.coo_matrix((rng.integers(1, 4, coo.nnz).astype(np.float32),
                             (coo.row, coo.col)), coo.shape).tocsr()
        trn_time = sp.coo_matrix(
            (rng.integers(1, 10_000_000, coo.nnz).astype(np.float64),
             (coo.row, coo.col)), coo.shape).tocsr()
    return social_data.bundle_from_matrices(cfg, trn, tst, trust,
                                            category_mat=cat,
                                            trn_time=trn_time)


def test_kcgn_learns():
    """KCGN (multi-rating×time graph + DGI over uu/ii subgraphs) lifts
    held-out recall over random init on the planted-community data — the
    family's first learns-on-planted-signal pin (real-scale evidence was
    synthetic-only through round 3)."""
    cfg = load_config("kcgn", overrides={
        "train.epoch": 60, "train.batch_size": 128, "train.test_step": 60,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "optimizer.lr": 5.0e-3,
    })
    data = _social_bundle_with_structs(cfg, with_time=True)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.04, (before, after)


def test_dsl_learns():
    """DSL (dual LightGCN towers + denoised cross-view label matching) on the
    planted communities — trust carries the held-out signal."""
    cfg = load_config("dsl", overrides={
        "train.epoch": 60, "train.batch_size": 128, "train.test_step": 60,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "optimizer.lr": 5.0e-3,
    })
    data = _social_bundle(cfg)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.04, (before, after)


def test_dcrec_social_learns():
    """Social DcRec (dual-domain GRACE contrast) lifts held-out recall over
    random init on the planted communities — pins the fused all-pairs GRACE
    objective (grace_pair_losses) end-to-end through training.  lr raised
    from the reference's 5e-5 (which barely moves in 60 tiny epochs) and
    weight_decay dropped; the objective wiring is what's under test."""
    cfg = load_config("dcrec", overrides={
        "train.epoch": 60, "train.batch_size": 128, "train.test_step": 60,
        "train.patience": 0, "train.scan_chunk": 0, "test.batch_size": 16,
        "test.k": [5, 10], "model.embedding_size": 16,
        "optimizer.lr": 5.0e-3, "optimizer.weight_decay": 0.0,
    })
    data = _social_bundle(cfg)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.04, (before, after)


def test_smin_learns():
    """SMIN (metapath GCNs + semantic attention + Informax) on the planted
    communities, where the UU/UIU/ITI metapaths carry the community signal."""
    cfg = load_config("smin", overrides={
        "train.epoch": 60, "train.batch_size": 128, "train.test_step": 60,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "optimizer.lr": 5.0e-3,
    })
    data = _social_bundle_with_structs(cfg)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.04, (before, after)


# ------------------------------------------------------------ multi-behavior


def _mb_bundle(cfg, seed=0, n_u=96, n_i=64, buys=2, held=2, views=12,
               bnoise=3, kg_triplets=None, meta=False):
    """'view' ⊃ 'buy' with parity structure, a very sparse target behavior
    (2 true buys) corrupted by 3 cross-parity noise buys.  The aux behavior
    carries the real signal, so the meta-weighted behavior-contrastive term
    (gated by ``train.beta``) measurably denoises the target — and plain BPR
    on the noisy buys overfits (measured at 60 epochs: beta 0 → R@5 0.245,
    beta 0.02 → 0.266; at 150 epochs the gap widens)."""
    from sslrec_tpu.data import multi_behavior as mb_data
    rng = np.random.default_rng(seed)
    v_rows, v_cols, b_rows, b_cols = [], [], [], []
    tst = sp.lil_matrix((n_u, n_i))
    for u in range(n_u):
        mine = [i for i in range(n_i) if i % 2 == u % 2]
        seen = rng.choice(mine, size=views, replace=False)
        v_rows += [u] * views
        v_cols += list(seen)
        b_rows += [u] * buys
        b_cols += list(seen[:buys])
        other = [i for i in range(n_i) if i % 2 != u % 2]
        b_rows += [u] * bnoise
        b_cols += list(rng.choice(other, size=bnoise, replace=False))
        for i in seen[buys:buys + held]:
            tst[u, i] = 1
    view = sp.csr_matrix((np.ones(len(v_rows)), (v_rows, v_cols)),
                         shape=(n_u, n_i))
    buy = sp.csr_matrix((np.ones(len(b_rows)), (b_rows, b_cols)),
                        shape=(n_u, n_i))
    return mb_data.bundle_from_behaviors(cfg, ["view", "buy"], [view, buy],
                                         tst.tocsr(),
                                         meta_mats=([view, buy] if meta
                                                    else None),
                                         kg_triplets=kg_triplets)


def _cml_cfg(beta):
    # CML's three-phase step uses its own cyclic-LR AdamWs driven by
    # optimizer.opt_base_lr/opt_max_lr (optimizer.lr only feeds the meta net)
    return load_config("cml", overrides={
        "train.epoch": 60, "train.batch_size": 128, "train.test_step": 60,
        "train.patience": 0, "train.beta": beta, "test.batch_size": 16,
        "test.k": [5, 10], "model.embedding_size": 16,
        "optimizer.opt_base_lr": 5.0e-3, "optimizer.opt_max_lr": 2.0e-2,
    })


def test_smbrec_learns():
    """SMBRec (behavior-graph propagation + similarity-sampled user-pair CL)
    lifts held-out recall on the planted parity structure — the aux 'view'
    behavior carries the true signal."""
    cfg = load_config("smbrec", overrides={
        "train.epoch": 60, "train.batch_size": 128, "train.test_step": 60,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "optimizer.lr": 5.0e-3,
    })
    data = _mb_bundle(cfg)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.04, (before, after)


def test_cml_learns_and_ssl_helps():
    cfg = _cml_cfg(0.02)
    data = _mb_bundle(cfg)
    before, with_ssl = _train_recall(cfg, data)
    assert with_ssl > before + 0.04, (before, with_ssl)
    _, without = _train_recall(_cml_cfg(0.0), data)
    assert with_ssl > without + 0.015, (with_ssl, without)


# ------------------------------------------------- sequential (trainer loops)


def _markov_seq_bundle(cfg, n_items=50, n_users=120, seed=0):
    """Planted Markov-cycle sequences (same construction as the BERT4Rec
    test): every sequence walks i → i+1 (mod n), so next-item recall is
    learnable exactly while random params sit at chance."""
    from sslrec_tpu.data import sequential as seq_data

    rng = np.random.default_rng(seed)
    trn = ([], [], [])
    tst = ([], [], [])
    for u in range(n_users):
        start = int(rng.integers(1, n_items + 1))
        ln = int(rng.integers(5, 10))
        seq = [(start + j - 1) % n_items + 1 for j in range(ln + 1)]
        trn[0].append(u); trn[1].append(seq[:-1]); trn[2].append(seq[-1])
        tst[0].append(u); tst[1].append(seq); tst[2].append(seq[-1] % n_items + 1)
    return seq_data.bundle_from_seqs(cfg, trn, tst)


def test_iclrec_learns():
    """ICLRec's trainer-entangled loop (per-epoch KMeans intent refresh via
    the ``epoch_state`` hook + PCL/NCE contrast, reference
    ``trainer/trainer.py:301-351``) lifts next-item recall on the planted
    Markov cycle.  The margin is set for its weak rec signal (1-negative
    binary CE on the last position, ``iclrec.py:303-313``)."""
    cfg = load_config("iclrec", overrides={
        "train.epoch": 60, "train.batch_size": 32, "train.test_step": 60,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "model.max_seq_len": 12,
        "model.n_layers": 1, "model.n_heads": 2,
        "model.num_intent_clusters": 8,
    })
    data = _markov_seq_bundle(cfg)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.10, (before, after)


def test_maerec_learns():
    """MAERec's trainer-entangled loop (path-sampled mask regeneration every
    ``mask_steps`` + reward-driven candidates, reference
    ``trainer/trainer.py:353-445``) lifts next-item recall on the planted
    Markov cycle — the item transition graph IS the cycle, so the graph MAE
    branch carries an exact signal."""
    cfg = load_config("maerec", overrides={
        "train.epoch": 20, "train.batch_size": 32, "train.test_step": 20,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "model.max_seq_len": 12,
        "model.con_batch": 32, "model.num_reco_neg": 8,
        "model.mask_depth": 2, "model.num_mask_cand": 8,
        "model.mask_steps": 10, "model.n_heads": 2,
        "model.num_attention_heads": 2, "model.num_gcn_layers": 1,
        "model.num_trm_layers": 1, "model.n_layers": 1,
    })
    data = _markov_seq_bundle(cfg)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.15, (before, after)


# ------------------------------------------- multi-behavior (trainer loops)


def test_kmclr_learns():
    """KMCLR's trainer-entangled loop (TransR/TATEC KG epoch objectives +
    BPR-contrast joint step, reference ``trainer/trainer.py:901-1049``) lifts
    held-out recall on the planted parity structure; the synthetic KG links
    same-parity items, so the KG branch carries the true signal."""
    from sslrec_tpu.data import multi_behavior as mb_data

    cfg = load_config("kmclr", overrides={
        "train.epoch": 40, "train.batch_size": 128, "train.test_step": 40,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "model.latent_dim_rec": 16,
        "train.SSL_batch": 4, "model.bpr_batch_size": 32,
        "optimizer.lr": 5.0e-3,
    })
    # rebuild the same planted matrices _mb_bundle uses, then add a KG whose
    # triplets connect same-parity items (the ground-truth community)
    rng = np.random.default_rng(0)
    n_i = 64
    heads, rels, tails = [], [], []
    for i in range(n_i):
        for j in rng.choice([x for x in range(n_i) if x % 2 == i % 2], 3):
            heads.append(i); rels.append(0); tails.append(int(j))
    trip = np.stack([np.asarray(heads), np.asarray(rels),
                     np.asarray(tails)], 1).astype(np.int64)
    data = _mb_bundle(cfg, kg_triplets=trip)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.04, (before, after)


def test_hmgcr_learns():
    """HMGCR (metapath-level GRACE contrast between consecutive hyper-graph
    towers) lifts held-out recall on the planted parity structure."""
    cfg = load_config("hmgcr", overrides={
        "train.epoch": 40, "train.batch_size": 128, "train.test_step": 40,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "optimizer.lr": 5.0e-3,
    })
    data = _mb_bundle(cfg, meta=True)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.04, (before, after)


def test_mbgmn_learns_with_trainable_hinge():
    """MBGMN under the repaired hinge (``model.detach_pre_loss: false``; the
    shipped default replicates the reference's detached no-gradient loss,
    reference ``mbgmn.py:187`` — see BASELINE MBGMN validation) lifts
    held-out recall on the planted parity structure through its
    trnNum-sampled epoch schedule (reference ``trainer/trainer.py:1056-1074``)."""
    cfg = load_config("mbgmn", overrides={
        "train.epoch": 60, "train.batch_size": 64, "train.test_step": 60,
        "train.patience": 0, "test.batch_size": 16, "test.k": [5, 10],
        "model.embedding_size": 16, "model.detach_pre_loss": False,
        "model.trnNum": 96, "optimizer.lr": 1.0e-2,
    })
    data = _mb_bundle(cfg)
    before, after = _train_recall(cfg, data)
    assert after > before + 0.04, (before, after)


def test_directau_learns():
    """DirectAU (alignment + uniformity only, no negatives — reference
    ``models/general_cf/directau.py:10-59``) lifts held-out niche recall on
    the popularity-skewed parity data: the uniformity term spreads the
    popular block apart, recovering the community structure (measured:
    0.117 → 0.177 at 100 epochs).  Second general_cf learning lane beside
    SGL's contrastive one."""
    cfg = load_config("directau", overrides={
        "train.epoch": 100, "train.batch_size": 256, "train.test_step": 100,
        "train.patience": 0, "test.batch_size": 32, "test.k": [5, 10],
        "model.embedding_size": 16, "optimizer.lr": 1.0e-2,
    })
    data = _cf_bundle()
    before, after = _train_recall(cfg, data)
    assert after > before + 0.04, (before, after)
