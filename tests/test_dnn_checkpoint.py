"""DNN checkpoint/resume (models/train.py): orbax round-trip of
(params, opt_state, step), latest-checkpoint discovery, and identity of
the restored pytrees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu.models.train import (
    dnn_train_step,
    latest_dnn_checkpoint,
    make_dnn_train_state,
    restore_dnn_checkpoint,
    save_dnn_checkpoint,
)
from event_based_optical_flow_tpu.types import pad_events

IMG = (16, 16)


def _batch(n=300, seed=0):
    rng = np.random.default_rng(seed)
    ev = np.stack([
        rng.uniform(0, IMG[0] - 1, n), rng.uniform(0, IMG[1] - 1, n),
        np.sort(rng.uniform(0, 0.1, n)), rng.integers(0, 2, n).astype(float),
    ], 1)
    p, w = pad_events(ev, target_n=512)
    return jnp.asarray(p)[None], jnp.asarray(w)[None]


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    model, params, tx, opt_state = make_dnn_train_state(IMG, n_bin=2, seed=3)
    step, _ = dnn_train_step(model, tx, IMG, n_bin=2)
    ev, wt = _batch()
    params, opt_state, loss = step(params, opt_state, ev, wt)
    assert np.isfinite(float(loss))

    ckpt_dir = str(tmp_path / "ckpts")
    save_dnn_checkpoint(ckpt_dir, params, opt_state, 1)
    save_dnn_checkpoint(ckpt_dir, params, opt_state, 7)
    latest = latest_dnn_checkpoint(ckpt_dir)
    assert latest is not None and latest.endswith("step_7")

    _, params0, _, opt0 = make_dnn_train_state(IMG, n_bin=2, seed=99)
    r_params, r_opt, r_step = restore_dnn_checkpoint(latest, params0, opt0)
    assert r_step == 7
    for a, b in zip(jax.tree_util.tree_leaves(r_params), jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(r_opt), jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state continues training bit-identically to the original
    p1, o1, l1 = step(params, opt_state, ev, wt)
    p2, o2, l2 = step(r_params, r_opt, ev, wt)
    assert float(l1) == float(l2)


def test_latest_checkpoint_empty(tmp_path):
    assert latest_dnn_checkpoint(str(tmp_path / "nope")) is None
