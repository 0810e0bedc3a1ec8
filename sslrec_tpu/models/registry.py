"""Model registry: name → (scenario, class).

Replaces the reference's importlib reflection factory
(``models/bulid_model.py:4-15`` — including its typo'd filename) with an explicit
registry; lookup stays case-insensitive for CLI parity.
"""

from __future__ import annotations

import importlib

# name -> (module path, class name). Populated as model families land.
_REGISTRY: dict[str, tuple[str, str]] = {
    # general CF
    "lightgcn": ("sslrec_tpu.models.general_cf.lightgcn", "LightGCN"),
    "sgl": ("sslrec_tpu.models.general_cf.sgl", "SGL"),
    "simgcl": ("sslrec_tpu.models.general_cf.simgcl", "SimGCL"),
    "directau": ("sslrec_tpu.models.general_cf.directau", "DirectAU"),
    "ncl": ("sslrec_tpu.models.general_cf.ncl", "NCL"),
    "hccf": ("sslrec_tpu.models.general_cf.hccf", "HCCF"),
    "lightgcl": ("sslrec_tpu.models.general_cf.lightgcl", "LightGCL"),
    "dccf": ("sslrec_tpu.models.general_cf.dccf", "DCCF"),
    "autocf": ("sslrec_tpu.models.general_cf.autocf", "AutoCF"),
    "gformer": ("sslrec_tpu.models.general_cf.gformer", "GFormer"),
    "adagcl": ("sslrec_tpu.models.general_cf.adagcl", "AdaGCL"),
    # sequential
    "bert4rec": ("sslrec_tpu.models.sequential.bert4rec", "BERT4Rec"),
    "cl4srec": ("sslrec_tpu.models.sequential.cl4srec", "CL4SRec"),
    "duorec": ("sslrec_tpu.models.sequential.duorec", "DuoRec"),
    "iclrec": ("sslrec_tpu.models.sequential.iclrec", "ICLRec"),
    "dcrec_seq": ("sslrec_tpu.models.sequential.dcrec", "DCRec"),
    "maerec": ("sslrec_tpu.models.sequential.maerec", "MAERec"),
    # social
    "mhcn": ("sslrec_tpu.models.social.mhcn", "MHCN"),
    "kcgn": ("sslrec_tpu.models.social.kcgn", "KCGN"),
    "smin": ("sslrec_tpu.models.social.smin", "SMIN"),
    "dsl": ("sslrec_tpu.models.social.dsl", "DSL"),
    "dcrec": ("sslrec_tpu.models.social.dcrec", "DcRec"),
    # knowledge graph
    "kgin": ("sslrec_tpu.models.kg.kgin", "KGIN"),
    "kgcl": ("sslrec_tpu.models.kg.kgcl", "KGCL"),
    "kgrec": ("sslrec_tpu.models.kg.kgrec", "KGRec"),
    "diffkg": ("sslrec_tpu.models.kg.diffkg", "DiffKG"),
    # multi-behavior
    "cml": ("sslrec_tpu.models.multi_behavior.cml", "CML"),
    "kmclr": ("sslrec_tpu.models.multi_behavior.kmclr", "KMCLR"),
    "mbgmn": ("sslrec_tpu.models.multi_behavior.mbgmn", "MBGMN"),
    "hmgcr": ("sslrec_tpu.models.multi_behavior.hmgcr", "HMGCR"),
    "smbrec": ("sslrec_tpu.models.multi_behavior.smbrec", "SMBRec"),
}


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def build_model(cfg, data):
    name = cfg.model.name.lower()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {available_models()}")
    module_path, cls_name = _REGISTRY[name]
    module = importlib.import_module(module_path)
    cls = getattr(module, cls_name)
    return cls(cfg, data)
