"""Data-handler registry: scenario type → loader (replaces
``data_utils/build_data_handler.py:4-14`` reflection)."""

from __future__ import annotations

import importlib

_HANDLERS = {
    "general_cf": "sslrec_tpu.data.general_cf",
    "sequential": "sslrec_tpu.data.sequential",
    "social": "sslrec_tpu.data.social",
    "kg": "sslrec_tpu.data.kg",
    "multi_behavior": "sslrec_tpu.data.multi_behavior",
}


def load_data(cfg):
    dtype = cfg.data.type
    if dtype == "multi_behavior_mf":
        # DataHandlerMF (data_handler_multi_behavior.py:154-165): plain MF view
        from sslrec_tpu.data import multi_behavior
        return multi_behavior.load_mf(cfg)
    if dtype not in _HANDLERS:
        raise KeyError(f"unknown data type {dtype!r}; available: {sorted(_HANDLERS)}")
    module = importlib.import_module(_HANDLERS[dtype])
    return module.load(cfg)
