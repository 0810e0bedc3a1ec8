"""Config tree behaviour."""

import pytest

from sslrec_tpu.config import Config, load_config


def test_attribute_and_item_access():
    c = Config({"model": {"layer_num": 2, "name": "x"}, "k": [1, 2]})
    assert c.model.layer_num == 2
    assert c["model"]["name"] == "x"
    assert c.k == (1, 2)


def test_immutability():
    c = Config({"a": 1})
    with pytest.raises(TypeError):
        c.a = 2


def test_replace_merges():
    c = Config({"model": {"a": 1, "b": 2}})
    c2 = c.replace(model={"a": 10})
    assert c2.model.a == 10 and c2.model.b == 2
    assert c.model.a == 1  # original untouched


def test_set_path():
    c = Config({"train": {"epoch": 5}})
    c2 = c.set_path("train.epoch", 9)
    assert c2.train.epoch == 9


def test_hashable():
    c1 = Config({"a": 1, "b": {"c": [1, 2]}})
    c2 = Config({"a": 1, "b": {"c": [1, 2]}})
    assert hash(c1) == hash(c2) and c1 == c2


def test_load_lightgcn_yaml():
    cfg = load_config("lightgcn")
    assert cfg.model.name == "lightgcn"
    assert cfg.model.layer_num == 2
    assert cfg.train.early_stop is True  # derived from patience
    assert cfg.test.k == (10, 20, 40)
    cfg2 = load_config("lightgcn", dataset="gowalla",
                       overrides={"model.layer_num": 3})
    assert cfg2.data.name == "gowalla"
    assert cfg2.model.layer_num == 3


def test_cli_set_numeric_coercion():
    """--set values like 1e12 (YAML 1.1 strings) must land as numbers."""
    from sslrec_tpu.config import parse_cli
    cfg = parse_cli(["--model", "lightgcn",
                     "--set", "optimizer.lr=1e12",
                     "--set", "model.layer_num=3",
                     "--set", "train.trainer=custom",
                     "--set", "model.keep_rate=0.7"])
    assert cfg.optimizer.lr == 1e12 and isinstance(cfg.optimizer.lr, float)
    assert cfg.model.layer_num == 3
    assert cfg.train.trainer == "custom"       # non-numeric strings unchanged
    assert cfg.model.keep_rate == 0.7
