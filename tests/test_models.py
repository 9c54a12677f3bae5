"""EV-FlowNet training step: one unsupervised CMax step runs and the
loss is finite and (over a few steps) decreasing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_based_optical_flow_tpu.models import dnn_train_step, make_dnn_train_state
from event_based_optical_flow_tpu.types import pad_events


def _moving_scene(n=1500, h=32, w=32, gt=(6.0, -4.0), seed=0):
    rng = np.random.default_rng(seed)
    n_dots = 40
    dx = rng.uniform(2, h - 2, n_dots)
    dy = rng.uniform(2, w - 2, n_dots)
    idx = rng.integers(0, n_dots, n)
    t = np.sort(rng.uniform(0, 0.4, n))
    x = dx[idx] + rng.normal(0, 0.2, n) - t * gt[0]
    y = dy[idx] + rng.normal(0, 0.2, n) - t * gt[1]
    ok = (x >= 0) & (x < h - 1) & (y >= 0) & (y < w - 1)
    return np.stack([np.round(x), np.round(y), t, rng.integers(0, 2, n)], 1)[ok]


@pytest.mark.slow
def test_dnn_train_step_descends():
    image_size = (32, 32)
    model, params, tx, opt_state = make_dnn_train_state(image_size, n_bin=4, lr=3e-4, scale_time=8.0)
    step, loss_fn = dnn_train_step(model, tx, image_size, n_bin=4)

    evs, wgts = [], []
    for b in range(2):
        ev = _moving_scene(seed=b)
        p, w = pad_events(ev, target_n=2048)
        evs.append(p)
        wgts.append(w)
    events = jnp.asarray(np.stack(evs))
    weights = jnp.asarray(np.stack(wgts))

    loss0 = float(loss_fn(params, events, weights))
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, events, weights)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses) < loss0  # optimization makes progress


@pytest.mark.slow
def test_dnn_multi_scale_train_step():
    """Multi-scale CMax loss: every decoder head receives gradient (the
    single-scale loss only trains through flow3's path) and a step
    descends."""
    from event_based_optical_flow_tpu.models.train import multi_scale_cmax_loss

    image_size = (32, 32)
    model, params, tx, opt_state = make_dnn_train_state(image_size, n_bin=4, lr=3e-4, scale_time=8.0)
    step, loss_fn = dnn_train_step(model, tx, image_size, n_bin=4, multi_scale=True)

    ev = _moving_scene(seed=3)
    p, w = pad_events(ev, target_n=2048)
    events = jnp.asarray(p)[None]
    weights = jnp.asarray(w)[None]

    loss0 = float(loss_fn(params, events, weights))
    assert np.isfinite(loss0)
    grads = jax.grad(loss_fn)(params, events, weights)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    # the coarsest prediction head only matters under the multi-scale loss
    head0 = [np.abs(np.asarray(v)).sum() for k, v in flat if "UpsampleConvAndPredict_0" in str(k)]
    assert head0 and sum(head0) > 0.0

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, events, weights)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses) < loss0


@pytest.mark.slow
def test_dnn_parallel_step_matches_single():
    """Data-parallel shard_map train step == single-device step (equal
    shard sizes: pmean of shard means is the global mean)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    from event_based_optical_flow_tpu.models.train import dnn_train_step_parallel

    image_size = (32, 32)
    model, params, tx, opt_state = make_dnn_train_state(image_size, n_bin=4, lr=3e-4, scale_time=8.0)
    step_s, _ = dnn_train_step(model, tx, image_size, n_bin=4)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    step_p, _ = dnn_train_step_parallel(model, tx, image_size, mesh, n_bin=4)

    evs, wgts = [], []
    for b in range(8):
        ev = _moving_scene(seed=b)
        p, w = pad_events(ev, target_n=2048)
        evs.append(p)
        wgts.append(w)
    events = jnp.asarray(np.stack(evs))
    weights = jnp.asarray(np.stack(wgts))

    ps, os_, loss_s = step_s(params, opt_state, events, weights)
    pp, op_, loss_p = step_p(params, opt_state, events, weights)
    assert float(loss_p) == pytest.approx(float(loss_s), rel=1e-6)
    flat_s = jax.flatten_util.ravel_pytree(ps)[0]
    flat_p = jax.flatten_util.ravel_pytree(pp)[0]
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_s), atol=1e-5)


@pytest.mark.slow
def test_run_dnn_flow_trains_and_evaluates(tmp_path):
    """CLI DNN path end-to-end on the synthetic loader: a few training
    steps then the AEE evaluation loop (new capability — the reference's
    DNN path raises NotImplementedError, ref main.py:151-154)."""
    from event_based_optical_flow_tpu import data as data_mod
    from event_based_optical_flow_tpu import visualizer as viz_mod
    from event_based_optical_flow_tpu.models.train import run_dnn_flow

    data_cfg = {
        "eval_dt": 1, "root": "", "dataset": "synthetic", "sequence": "dnn_t",
        "height": 32, "width": 32, "load_gt_flow": True, "gt": ".",
        "n_events_per_batch": 2048, "duration": 1.0, "event_rate": 20000,
        "n_frames": 3,
    }
    config = {
        "is_dnn": True,
        "data": data_cfg,
        "dnn": {"n_bin": 4, "batch_size": 1, "n_steps": 2, "lr": 1e-4},
        "output": {"output_dir": str(tmp_path), "show_interactive_result": False},
    }
    loader = data_mod.collections["synthetic"](config=data_cfg)
    loader.set_sequence("dnn_t")
    viz = viz_mod.Visualizer((32, 32), show=False, save=True, save_dir=str(tmp_path))
    params = run_dnn_flow(config, loader, viz, evaluate=True)
    assert params is not None
    txt = tmp_path / "dnn_flow_error.txt"
    assert txt.exists()
    content = txt.read_text()
    assert "mean::" in content and "EPE" in content

    # training saved a final checkpoint; a rerun restores it, skips
    # training (target step already reached) and returns the same params
    from event_based_optical_flow_tpu.models.train import latest_dnn_checkpoint

    assert latest_dnn_checkpoint(str(tmp_path / "checkpoints")) is not None
    params2 = run_dnn_flow(config, loader, viz, evaluate=False)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_dnn_supervised_train_step_descends():
    """dnn.supervised: the masked-EPE loss takes a GT batch, descends
    over a few steps, and invalid (inf) GT pixels are ignored."""
    from event_based_optical_flow_tpu.models.train import supervised_epe_loss

    image_size = (32, 32)
    model, params, tx, opt_state = make_dnn_train_state(
        image_size, n_bin=4, lr=3e-4, scale_time=8.0
    )
    step, loss_fn = dnn_train_step(model, tx, image_size, n_bin=4, supervised=True)

    gt_disp = (-6.0 * 0.4, 4.0 * 0.4)  # scene gt is a velocity over 0.4 s
    evs, wgts, gts = [], [], []
    for b in range(2):
        ev = _moving_scene(seed=b)
        p, w = pad_events(ev, target_n=2048)
        evs.append(p)
        wgts.append(w)
        g = np.zeros((2, 32, 32))
        g[0], g[1] = gt_disp
        gts.append(g)
    events = jnp.asarray(np.stack(evs))
    weights = jnp.asarray(np.stack(wgts))
    gt = jnp.asarray(np.stack(gts), jnp.float32)

    loss0 = float(loss_fn(params, events, weights, gt))
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, events, weights, gt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses) < loss0

    # inf-GT masking: a half-invalid field scores only the valid half
    flow = jnp.zeros((2, 4, 4))
    g = jnp.asarray(np.stack([np.full((4, 4), 3.0), np.zeros((4, 4))]))
    g = g.at[:, :2, :].set(jnp.inf)
    assert float(supervised_epe_loss(flow, g)) == pytest.approx(3.0)


@pytest.mark.slow
def test_run_dnn_flow_supervised_smoke(tmp_path):
    """dnn.supervised wiring through the CLI DNN path: per-window GT is
    pulled from the loader (index_to_time -> load_optical_flow) and two
    training steps run to a finite loss + checkpoint."""
    from event_based_optical_flow_tpu import data as data_mod
    from event_based_optical_flow_tpu import visualizer as viz_mod
    from event_based_optical_flow_tpu.models.train import (
        latest_dnn_checkpoint,
        run_dnn_flow,
    )

    data_cfg = {
        "eval_dt": 1, "root": "", "dataset": "synthetic", "sequence": "dnn_s",
        "height": 32, "width": 32, "load_gt_flow": True, "gt": ".",
        "n_events_per_batch": 2048, "duration": 1.0, "event_rate": 20000,
        "n_frames": 3,
    }
    config = {
        "is_dnn": True,
        "data": data_cfg,
        "dnn": {"n_bin": 4, "batch_size": 1, "n_steps": 2, "lr": 1e-4,
                "supervised": True},
        "output": {"output_dir": str(tmp_path), "show_interactive_result": False},
    }
    loader = data_mod.collections["synthetic"](config=data_cfg)
    loader.set_sequence("dnn_s")
    viz = viz_mod.Visualizer((32, 32), show=False, save=True, save_dir=str(tmp_path))
    params = run_dnn_flow(config, loader, viz, evaluate=False)
    assert params is not None
    assert latest_dnn_checkpoint(str(tmp_path / "checkpoints")) is not None

    # a GT-free loader must be rejected (the synthetic loader always has
    # GT, so force the flag off)
    import pytest as _pytest
    loader.gt_flow_available = False
    with _pytest.raises(ValueError, match="supervised"):
        run_dnn_flow(config, loader, viz, evaluate=False)
