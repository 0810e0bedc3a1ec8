"""Native preprocessing library: builds, and matches the numpy fallbacks."""

import numpy as np
import scipy.sparse as sp

from sslrec_tpu import native
from tests.conftest import random_ui_matrix


def test_native_builds():
    # the toolchain is part of this image; the native path must be active
    assert native.available()


def test_padded_rows_parity(tiny_ui):
    csr = tiny_ui.tocsr()
    width = int(np.diff(csr.indptr).max())
    cols, mask, lengths = native.padded_rows(csr.indptr, csr.indices, width)
    for r in [0, 3, 11]:
        expect = list(csr.indices[csr.indptr[r]:csr.indptr[r + 1]])
        got = list(cols[r][mask[r]])
        assert got == expect
        assert lengths[r] == len(expect)


def test_sampled_cooc_edges():
    m = random_ui_matrix(30, 20, density=0.2, seed=3).tocsr()
    cooc = (m @ m.T).tocsr()
    rows, cols = native.sampled_cooc_edges(cooc.indptr, cooc.indices, 0.5,
                                           seed=7)
    degs = np.diff(cooc.indptr)
    expected_count = int(np.sum((degs * 0.5).astype(np.int64)))
    assert len(rows) == expected_count
    # every sampled edge exists in the co-occurrence matrix
    dense = cooc.toarray()
    assert (dense[rows, cols] > 0).all()
    # per-row counts match floor(deg * rate)
    cnt = np.bincount(rows, minlength=30)
    np.testing.assert_array_equal(cnt, (degs * 0.5).astype(np.int64))
    # no duplicate columns within a row (without-replacement)
    for r in range(30):
        cs = cols[rows == r]
        assert len(cs) == len(set(cs.tolist()))


def test_transition_pairs_parity():
    seqs = np.asarray([[0, 0, 1, 2, 3],
                       [0, 5, 6, 0, 7]], np.int32)
    a, b = native.transition_pairs(seqs, 2)
    got = sorted(zip(a.tolist(), b.tolist()))
    # numpy fallback as the oracle
    a2, b2 = [], []
    for d in range(1, 3):
        x = seqs[:, d:].reshape(-1)
        y = seqs[:, :-d].reshape(-1)
        live = (x > 0) & (y > 0)
        a2.extend([x[live], y[live]])
        b2.extend([y[live], x[live]])
    expect = sorted(zip(np.concatenate(a2).tolist(),
                        np.concatenate(b2).tolist()))
    assert got == expect
