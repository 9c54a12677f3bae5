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


def test_aot_warning_filter_pattern():
    """The fd-2 filter must drop EXACTLY the benign same-host tuning-pref
    lines (+prefer-no-scatter/-gather, which XLA puts in the compile
    feature list but never the host list) and pass through a genuine
    cross-host ISA mismatch line (named real feature)."""
    import re

    from event_based_optical_flow_tpu.config import _AOT_BENIGN_RE

    pat = re.compile(_AOT_BENIGN_RE)
    benign = (
        b"E0819 15:19:45.781945 8512 cpu_aot_loader.cc:210] Loading XLA:CPU"
        b" AOT result. Target machine feature +prefer-no-scatter is not "
        b" supported on the host machine. Machine type used for XLA:CPU"
        b" compilation doesn't match the machine type for execution."
    )
    benign2 = benign.replace(b"+prefer-no-scatter", b"+prefer-no-gather")
    genuine = benign.replace(b"+prefer-no-scatter", b"+avx512f")
    assert pat.search(benign)
    assert pat.search(benign2)
    assert not pat.search(genuine)
    # unrelated stderr must never match
    assert not pat.search(b"Traceback (most recent call last):")


def test_aot_warning_filter_preserves_crash_traceback():
    """Regression (round-4 review): the fd-2 filter's daemon pump used to
    die before draining at process exit, so a CRASHING harness process
    (the exact case the filter claims to keep readable) exited with an
    EMPTY stderr.  The atexit restore must flush the pending pipe
    content — real lines and the uncaught traceback — while still
    dropping the benign AOT lines."""
    import subprocess
    import sys

    code = (
        "import event_based_optical_flow_tpu.config as c\n"
        "c.suppress_benign_aot_warnings()\n"
        "import os\n"
        "os.write(2, b'cpu_aot_loader blah feature +prefer-no-scatter"
        " is not  supported\\n')\n"
        "os.write(2, b'REAL SIGNAL LINE\\n')\n"
        "raise RuntimeError('boom')\n"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       timeout=120)
    err = p.stderr.decode()
    assert p.returncode == 1
    assert "RuntimeError: boom" in err  # traceback survives the filter
    assert "REAL SIGNAL LINE" in err
    assert "prefer-no-scatter" not in err
