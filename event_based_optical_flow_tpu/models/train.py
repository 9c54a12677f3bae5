"""EV-FlowNet training: unsupervised contrast-maximization loss, jitted
train step, data-parallel friendly state.

The reference's DNN path is unreleased (main.py raises
NotImplementedError, ref main.py:151-154); here the model trains against
the framework's own CMax objective (multi-focal normalized gradient
magnitude + total variation on the predicted flow), i.e. the secrets-
paper loss driving a network instead of per-tile parameters.
"""

import logging
import os
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..costs import functional as F
from ..ops.iwe import EventImageConverter
from ..ops.warp import Warp
from ..types import pad_events
from .ev_flownet import EVFlowNet, events_to_voxel_grid

from ..costs.functional import nan_to_penalty

logger = logging.getLogger(__name__)


def unsupervised_cmax_loss(
    flow: jax.Array,
    events: jax.Array,
    image_size: Tuple[int, int],
    weights: Optional[jax.Array] = None,
    blur_sigma: float = 1.0,
    tv_weight: float = 0.01,
) -> jax.Array:
    """Multi-focal NGM contrast loss of a dense [2, H, W] flow on one event
    slice, plus total variation — the same objective the CMax solvers
    optimize per-tile, applied to a network prediction."""
    imager = EventImageConverter(image_size)
    warper = Warp(image_size, normalize_t=True)

    def iwe(ev):
        return imager.create_iwe(ev, "bilinear_vote", blur_sigma, weight=1.0 if weights is None else weights)

    t = events[:, 2]
    if weights is None:
        t_scale = jnp.max(t) - jnp.min(t)
    else:
        big = jnp.finfo(t.dtype).max
        t_scale = jnp.max(jnp.where(weights > 0, t, -big)) - jnp.min(jnp.where(weights > 0, t, big))
    scaled_flow = flow * t_scale

    orig = iwe(events)
    bwd = iwe(warper.warp_event(events, scaled_flow, "dense-flow", "first", weights))
    fwd = iwe(warper.warp_event(events, scaled_flow, "dense-flow", "last", weights))
    mid = iwe(warper.warp_event(events, scaled_flow, "dense-flow", "middle", weights))
    loss = F.multi_focal_normalized_gradient_magnitude(orig, fwd, bwd, mid, omit_boundary=True)
    loss = loss + tv_weight * F.total_variation(flow, omit_boundary=True)
    return nan_to_penalty(loss)


def multi_scale_cmax_loss(
    flows: dict,
    events: jax.Array,
    image_size: Tuple[int, int],
    weights: Optional[jax.Array] = None,
    blur_sigma: float = 1.0,
    tv_weight: float = 0.01,
) -> jax.Array:
    """CMax loss applied at EVERY decoder scale (flow0 coarsest ...
    flow3 full res), the EV-FlowNet training recipe adapted to the
    contrast objective: scale k's loss warps the events with their
    coordinates divided by 2^(3-k) on a 2^(3-k)-downscaled grid, so each
    head is supervised at its native resolution (coarse IWEs are nearly
    free on the MXU).  Returns the mean over scales."""
    h, w = image_size
    total = 0.0
    n = 0
    for i in range(4):
        key = f"flow{i}"
        if key not in flows:
            continue
        s = 2 ** (3 - i)
        scale_vec = jnp.asarray([1.0 / s, 1.0 / s, 1.0, 1.0], events.dtype)
        total = total + unsupervised_cmax_loss(
            flows[key], events * scale_vec, (h // s, w // s), weights,
            blur_sigma=blur_sigma, tv_weight=tv_weight,
        )
        n += 1
    return total / max(1, n)


def _event_t_scale(events, weights=None):
    """Time span of a (padded) event window — the factor that converts
    the px/s flow convention into px displacement over the window (the
    same computation unsupervised_cmax_loss uses before warping)."""
    t = events[:, 2]
    if weights is None:
        return jnp.max(t) - jnp.min(t)
    big = jnp.finfo(t.dtype).max
    return jnp.max(jnp.where(weights > 0, t, -big)) - jnp.min(
        jnp.where(weights > 0, t, big)
    )


def supervised_epe_loss(flow, gt_flow, t_scale=1.0):
    """Mean endpoint error of a dense [2, H, W] flow in px/s (the
    network convention — see _evaluate_dnn) against GT px DISPLACEMENT
    over the window: the prediction is scaled by the window span
    ``t_scale`` before comparison, exactly as the unsupervised loss
    scales it before warping and the eval loop scales it before AEE.
    Pixels with non-finite GT are masked (MVSEC and DSEC mark invalid
    GT with inf).  The supervised alternative to the CMax loss when the
    training set carries dense GT (e.g. the DSEC train split)."""
    err = jnp.sqrt(jnp.sum((flow * t_scale - gt_flow) ** 2, axis=0) + 1e-12)
    valid = jnp.all(jnp.isfinite(gt_flow), axis=0)
    err = jnp.where(valid, err, 0.0)
    return jnp.sum(err) / jnp.maximum(jnp.sum(valid), 1)


def make_dnn_train_state(
    image_size: Tuple[int, int],
    n_bin: int = 4,
    lr: float = 1e-4,
    seed: int = 0,
    scale_time: float = 128.0,
):
    """Initialize (model, params, tx, opt_state) for EV-FlowNet."""
    model = EVFlowNet(n_bin=n_bin, scale_time=scale_time)
    dummy = jnp.zeros((1, image_size[0], image_size[1], n_bin))
    params = model.init(jax.random.PRNGKey(seed), dummy)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    return model, params, tx, opt_state


def make_loss_fn(model, image_size: Tuple[int, int], n_bin: int = 4,
                 multi_scale: bool = False, supervised: bool = False):
    """Batch loss fn(params, events [B, N, 4], weights [B, N]) -> scalar,
    shared by the single-device and data-parallel train steps.  Flow head
    3 (full resolution) drives the CMax loss per batch item; with
    ``multi_scale`` every decoder head is supervised at its native
    resolution (multi_scale_cmax_loss).  With ``supervised`` the loss fn
    takes an extra gt batch [B, 2, H, W] and trains on masked mean EPE
    (supervised_epe_loss) instead of the contrast objective."""

    def loss_fn(params, events, weights, *gt):
        voxels = jax.vmap(lambda e, w: events_to_voxel_grid(e, image_size, n_bin, w))(events, weights)
        flows = model.apply(params, voxels)
        if supervised:
            spans = jax.vmap(_event_t_scale)(events, weights)
            per_item = jax.vmap(supervised_epe_loss)(flows["flow3"], gt[0], spans)
        elif multi_scale:
            per_item = jax.vmap(
                lambda f0, f1, f2, f3, e, w: multi_scale_cmax_loss(
                    {"flow0": f0, "flow1": f1, "flow2": f2, "flow3": f3},
                    e, image_size, w,
                )
            )(flows["flow0"], flows["flow1"], flows["flow2"], flows["flow3"],
              events, weights)
        else:
            per_item = jax.vmap(
                lambda f, e, w: unsupervised_cmax_loss(f, e, image_size, w)
            )(flows["flow3"], events, weights)
        return jnp.mean(per_item)

    return loss_fn


def dnn_train_step(model, tx, image_size: Tuple[int, int], n_bin: int = 4,
                   multi_scale: bool = False, supervised: bool = False):
    """Build the jitted training step:
    step(params, opt_state, events [B, N, 4], weights [B, N][, gt])
      -> (params, opt_state, loss)  (loss: see make_loss_fn; the gt
      batch [B, 2, H, W] is required iff ``supervised``)."""
    loss_fn = make_loss_fn(model, image_size, n_bin, multi_scale, supervised)

    @jax.jit
    def step(params, opt_state, events, weights, *gt):
        loss, grads = jax.value_and_grad(loss_fn)(params, events, weights, *gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, loss_fn


def dnn_train_step_parallel(model, tx, image_size: Tuple[int, int], mesh, n_bin: int = 4,
                            multi_scale: bool = False, supervised: bool = False):
    """Data-parallel variant of dnn_train_step under ``shard_map``: the
    batch shards over the mesh's 'data' axis, params/opt state replicate,
    gradients are combined with ``pmean`` over ICI.  Per-step results are
    bitwise-independent of the sharding (equal shard sizes => pmean of
    shard means == global mean); verified in tests on an 8-device mesh."""
    from jax.sharding import PartitionSpec as P

    loss_fn = make_loss_fn(model, image_size, n_bin, multi_scale, supervised)

    def local_step(params, opt_state, events, weights, *gt):
        loss, grads = jax.value_and_grad(loss_fn)(params, events, weights, *gt)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    n_in = 3 if supervised else 2
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P()) + (P("data"),) * n_in,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step), loss_fn


def save_dnn_checkpoint(ckpt_dir: str, params, opt_state, step: int) -> str:
    """Orbax checkpoint of (params, opt_state, step) at
    ``<ckpt_dir>/step_<step>`` — the DNN analog of the eval loop's
    checkpoint/resume (utils/checkpoint.py).  The reference only promises
    an externally hosted checkpoint (ref README.md:126); here training is
    resumable and the trained model reloadable."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ocp.PyTreeCheckpointer().save(
        path, {"params": params, "opt_state": opt_state, "step": step}, force=True
    )
    return path


def latest_dnn_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the highest-step checkpoint under ``ckpt_dir`` (None if no
    checkpoints exist)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), os.path.join(ckpt_dir, name))
    return os.path.abspath(best[1]) if best else None


def restore_dnn_checkpoint(path: str, params, opt_state):
    """Restore (params, opt_state, step) using the freshly-initialized
    state as the structure template (standard orbax item-restore)."""
    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(path),
        item={"params": params, "opt_state": opt_state, "step": 0},
    )
    return restored["params"], restored["opt_state"], int(restored["step"])


def run_dnn_flow(config: dict, loader, viz, evaluate: bool = False):
    """CLI entry for is_dnn configs: train EV-FlowNet unsupervised on the
    loaded sequence, then (if evaluate) report AEE against GT."""
    data_cfg = config["data"]
    dnn_cfg = config.get("dnn", {})
    H, W = data_cfg["height"], data_cfg["width"]
    # EV-FlowNet needs dims divisible by 16
    Hc, Wc = (H // 16) * 16, (W // 16) * 16
    image_size = (Hc, Wc)
    n_bin = int(dnn_cfg.get("n_bin", 4))
    batch = int(dnn_cfg.get("batch_size", 2))
    steps = int(dnn_cfg.get("n_steps", 50))
    n_events = int(data_cfg.get("n_events_per_batch", 30000))

    # tanh-head flow range in px per normalized window: the 128 default
    # fits MVSEC/DSEC-scale frames; small sensors need a matching range
    # or the random-init warps blow out of frame and the NaN penalty
    # flattens the loss landscape
    scale_time = float(dnn_cfg.get("scale_time", min(128.0, max(image_size) / 2)))
    model, params, tx, opt_state = make_dnn_train_state(
        image_size, n_bin, lr=float(dnn_cfg.get("lr", 1e-4)),
        scale_time=scale_time,
    )

    ckpt_dir = dnn_cfg.get(
        "checkpoint_dir",
        os.path.join(config["output"]["output_dir"], "checkpoints"),
    )
    ckpt_every = int(dnn_cfg.get("checkpoint_every", 0))  # 0 = end only
    start_step = 0
    latest = latest_dnn_checkpoint(ckpt_dir) if dnn_cfg.get("resume", True) else None
    if latest is not None:
        params, opt_state, start_step = restore_dnn_checkpoint(latest, params, opt_state)
        logger.info(f"restored DNN checkpoint {latest} (step {start_step})")
        if start_step >= steps and not dnn_cfg.get("eval_only"):
            logger.warning(
                f"checkpoint step {start_step} >= dnn.n_steps {steps}: training "
                "is SKIPPED and the restored model is used as-is.  If the "
                "training config changed (loss, lr, ...), set "
                "'dnn.resume: false' or point dnn.checkpoint_dir elsewhere "
                "to retrain."
            )
    elif dnn_cfg.get("eval_only"):
        raise FileNotFoundError(
            f"dnn.eval_only set but no checkpoint found under {ckpt_dir}"
            + (" (dnn.resume is false)" if not dnn_cfg.get("resume", True) else "")
        )

    supervised = bool(dnn_cfg.get("supervised"))
    if supervised and not getattr(loader, "gt_flow_available", False):
        raise ValueError(
            "dnn.supervised requires a loader with dense GT flow "
            "(data.load_gt_flow); use the unsupervised CMax loss otherwise"
        )
    if supervised and dnn_cfg.get("multi_scale"):
        logger.warning("dnn.supervised trains the full-resolution head only; "
                       "dnn.multi_scale is ignored")

    n_dev = len(jax.devices())
    if dnn_cfg.get("data_parallel") and n_dev > 1 and batch % n_dev == 0:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        step, loss_fn = dnn_train_step_parallel(
            model, tx, image_size, mesh, n_bin,
            multi_scale=bool(dnn_cfg.get("multi_scale")),
            supervised=supervised,
        )
        logger.info(f"data-parallel DNN training over {n_dev} devices")
    else:
        step, loss_fn = dnn_train_step(
            model, tx, image_size, n_bin,
            multi_scale=bool(dnn_cfg.get("multi_scale")),
            supervised=supervised,
        )

    total = len(loader)
    rng = np.random.default_rng(0)
    if not dnn_cfg.get("eval_only"):
        # resume determinism: replay the RNG draws of completed steps so a
        # resumed run sees the same batch sequence as an uninterrupted one
        for _ in range(start_step * batch):
            rng.integers(0, max(1, total - n_events))
        for it in range(start_step, steps):
            evs, wgts, gts = [], [], []
            for _ in range(batch):
                start = int(rng.integers(0, max(1, total - n_events)))
                end = min(start + n_events, total)
                ev = loader.load_event(start, end)
                if supervised:
                    # dense GT displacement over THIS window ([H, W, 2]
                    # loader convention -> [2, Hc, Wc] crop)
                    gt_hw2 = np.asarray(loader.load_optical_flow(
                        loader.index_to_time(start), loader.index_to_time(end - 1)
                    ))
                    gts.append(np.transpose(gt_hw2[:Hc, :Wc], (2, 0, 1)))
                ev[:, 2] -= ev[:, 2].min()
                ev = ev[(ev[:, 0] < Hc) & (ev[:, 1] < Wc)]
                p, w = pad_events(ev, target_n=n_events)
                evs.append(p)
                wgts.append(w)
            extra = (jnp.asarray(np.stack(gts), jnp.float32),) if supervised else ()
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(np.stack(evs)), jnp.asarray(np.stack(wgts)),
                *extra,
            )
            if it % 10 == 0:
                logger.info(f"dnn step {it}: loss {float(loss):.4f}")
            if ckpt_every and (it + 1) % ckpt_every == 0 and (it + 1) < steps:
                save_dnn_checkpoint(ckpt_dir, params, opt_state, it + 1)
        if steps > start_step:
            save_dnn_checkpoint(ckpt_dir, params, opt_state, steps)
            logger.info(f"DNN training finished; checkpoint at {ckpt_dir}/step_{steps}.")
        else:
            logger.info("DNN training already complete (checkpoint at target step).")

    if evaluate and getattr(loader, "gt_flow_available", False):
        _evaluate_dnn(
            model, params, loader, data_cfg, image_size, n_bin, n_events, viz
        )
    return params


def _evaluate_dnn(model, params, loader, data_cfg, image_size, n_bin, n_events, viz):
    """Post-training evaluation: per gray-frame window, predict a dense
    flow with the trained network and report AEE/NPE/AE against GT (same
    metrics as the CMax eval pipeline, flow/metrics.py)."""
    from ..flow.metrics import calculate_flow_error_numpy

    eval_dt = int(data_cfg.get("eval_dt", 1))
    eval_ts = loader.eval_frame_time_list()
    Hc, Wc = image_size

    @jax.jit
    def predict(events, weights):
        voxel = events_to_voxel_grid(events, image_size, n_bin, weights)
        flows = model.apply(params, voxel[None])
        return flows["flow3"][0]

    out_dir = viz.save_dir if viz is not None else "."
    results = []
    for i1 in range(len(eval_ts) - eval_dt):
        t1, t2 = eval_ts[i1], eval_ts[i1 + eval_dt]
        ind1, ind2 = loader.time_to_index(t1), loader.time_to_index(t2)
        ev = loader.load_event(ind1, ind2)
        gt_flow = loader.load_optical_flow(t1, t2)
        ev[:, 2] -= ev[:, 2].min()
        ev = ev[(ev[:, 0] < Hc) & (ev[:, 1] < Wc)]
        # bucketed padding: eval windows are variable-length (the jitted
        # predictor recompiles once per 4096-event bucket)
        padded, wgt = pad_events(ev)
        # network flow is px/s (training scales it by t_scale to warp);
        # GT is a displacement over [t1, t2] — same convention as
        # SolverBase.calculate_flow_error (motion * timescale vs gt)
        flow = np.asarray(predict(jnp.asarray(padded), jnp.asarray(wgt)))
        gt_2hw = np.transpose(gt_flow[:Hc, :Wc], (2, 0, 1))
        mask = np.zeros((Hc, Wc), bool)
        mask[ev[:, 0].astype(int), ev[:, 1].astype(int)] = True
        err = calculate_flow_error_numpy(
            gt_2hw[None],
            (flow * (t2 - t1))[None],
            event_mask=mask[None, None],
        )
        results.append(err)
        logger.info(f"dnn eval frame {i1}: {err}")
    if results:
        mean = {k: float(np.mean([r[k] for r in results])) for k in results[0]}
        logger.info(f"DNN eval mean over {len(results)} frames: {mean}")
        with open(f"{out_dir}/dnn_flow_error.txt", "w") as f:
            for i, r in enumerate(results):
                f.write(f"frame {i}::{r}\n")
            f.write(f"mean::{mean}\n")
    return results
