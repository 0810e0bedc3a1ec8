"""Data layer base types.

The reference's data layer is a set of ``DataHandler`` classes that mutate the
global config with discovered statistics and expose torch ``DataLoader``s
(``data_utils/build_data_handler.py``, ``data_utils/data_handler_general_cf.py``).
Here a handler is a function ``load(cfg) -> DataBundle``: an immutable bundle of
device-resident arrays (graphs, interaction lists, padded eval structures) plus
dataset statistics.  Batch iteration is index-based and fixed-shape — the whole
training epoch runs as one jitted ``lax.scan`` over precomputed index arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax.numpy as jnp

from sslrec_tpu.ops.sparse import EdgeSet, PaddedRows


@dataclasses.dataclass(frozen=True)
class EvalData:
    """Fixed-shape full-sort evaluation data for one split.

    Mirrors ``AllRankTstData`` (``data_utils/datasets_general_cf.py:46-68``):
    ``test_users`` are users with ≥1 positive in the split; ``ground_truth`` their
    padded positive item lists; ``history`` the padded *train* positives used for
    score masking (−1e8), keyed by global user id.
    """

    test_users: jnp.ndarray          # int32 [n_test_users]
    ground_truth: PaddedRows         # [n_users, w_gt] (indexed by global user id)
    history: PaddedRows | None       # [n_users, w_hist] or None (no masking)
    n_test_users: int


@dataclasses.dataclass(frozen=True)
class DataBundle:
    """Everything a model + trainer needs, loaded once."""

    user_num: int
    item_num: int
    # training interactions as parallel arrays (COO of the train matrix)
    train_users: jnp.ndarray         # int32 [n_train]
    train_items: jnp.ndarray         # int32 [n_train]
    train_edge_set: EdgeSet          # membership for negative-sampling rejection
    valid: EvalData | None
    test: EvalData
    # scenario-specific extras (graphs, KG triplets, behaviour mats, sequences...)
    extras: dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def n_train(self) -> int:
        return int(self.train_users.shape[0])


def pad_to_batches(n: int, batch_size: int) -> np.ndarray:
    """Index array [n_batches, batch_size] covering 0..n-1, last batch wraps.

    Wrapping keeps every batch full-shape (one compiled program); the few
    duplicated tail samples are a negligible reweighting vs the reference's
    smaller final batch.
    """
    n_batches = -(-n // batch_size)
    idx = np.arange(n_batches * batch_size) % n
    return idx.reshape(n_batches, batch_size).astype(np.int32)
