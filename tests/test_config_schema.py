"""Config schema validation: shipped configs pass; typos fail fast with
the YAML path (new capability — the reference passes raw dicts untyped)."""

import copy
import glob
import os

import pytest
import yaml

from event_based_optical_flow_tpu.utils import ConfigError, validate_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))))
def test_shipped_configs_validate(path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    assert validate_config(cfg) == []  # no warnings either


def _base():
    with open(os.path.join(CONFIG_DIR, "synthetic_quickstart.yaml")) as f:
        return yaml.safe_load(f)


def test_missing_section_fails():
    cfg = _base()
    del cfg["optimizer"]
    with pytest.raises(ConfigError, match="optimizer"):
        validate_config(cfg)


def test_bad_cost_name_fails():
    cfg = _base()
    cfg["solver"]["cost"] = "image_varaince"  # typo
    with pytest.raises(ConfigError, match="solver.cost"):
        validate_config(cfg)


def test_bad_optimizer_method_fails():
    cfg = _base()
    cfg["optimizer"]["method"] = "NewtonCG"
    with pytest.raises(ConfigError, match="optimizer.method"):
        validate_config(cfg)


def test_inverted_parameter_box_fails():
    cfg = _base()
    cfg["optimizer"]["parameters"]["trans_x"] = {"min": 10, "max": -10}
    with pytest.raises(ConfigError, match="trans_x"):
        validate_config(cfg)


def test_fleet_requires_no_warm_start():
    cfg = _base()
    cfg["data"]["fleet_batch"] = 4
    with pytest.raises(ConfigError, match="warm_start"):
        validate_config(cfg)
    cfg["data"]["warm_start"] = False
    validate_config(cfg)


def test_unknown_key_warns_not_fails():
    cfg = _base()
    cfg["solver"]["blur_sgima"] = 1
    warnings = validate_config(cfg)
    assert any("blur_sgima" in w for w in warnings)


def test_coarse_budget_keys_validate():
    cfg = _base()
    cfg["optimizer"]["coarse_max_iter"] = 10
    cfg["optimizer"]["coarse_cg_maxiter"] = 4
    assert validate_config(cfg) == []
    cfg["optimizer"]["coarse_max_iter"] = 0
    with pytest.raises(ConfigError, match="coarse_max_iter"):
        validate_config(cfg)
    cfg["optimizer"]["coarse_max_iter"] = 2.5
    with pytest.raises(ConfigError, match="coarse_max_iter"):
        validate_config(cfg)
