#!/usr/bin/env python3
"""CLI driver for the TPU-native event-based optical flow framework.

Same contract as the reference driver (reference ``main.py``):

    python3 main.py --config_file configs/<cfg>.yaml [--eval] [--log LEVEL]

Single-frame mode optimizes one event slice [ind1, ind2); --eval runs the
sequential evaluation pipeline over gray-frame timestamps with GT flow
(AEE/NPE/AE + FWL per frame, text dump + visualizations).
"""

import argparse
import logging
import os
import shutil
import sys

import numpy as np
import yaml

from event_based_optical_flow_tpu import data, solver, utils, visualizer
from event_based_optical_flow_tpu.utils import checkpoint as ckpt

logger = logging.getLogger(__name__)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config_file",
        default="./configs/mvsec_indoor_no_timeaware.yaml",
        help="Config file yaml path",
        type=str,
    )
    parser.add_argument("--eval", help="Add for evaluation run", action="store_true")
    parser.add_argument(
        "--log", help="Log level: [debug, info, warning, error, critical]", type=str, default="info"
    )
    args = parser.parse_args()
    with open(args.config_file, "r") as f:
        config = yaml.safe_load(f)
    utils.validate_config(config)
    return config, args


def save_config(save_dir: str, file_name: str, log_level=logging.INFO):
    if not os.path.exists(save_dir):
        os.makedirs(save_dir)
    shutil.copy(file_name, save_dir)
    logging.basicConfig(
        handlers=[
            logging.FileHandler(f"{save_dir}/main.log", mode="w"),
            logging.StreamHandler(sys.stdout),
        ],
        level=log_level,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        force=True,
    )


def _gather_frame(loader, data_config, t1, t2):
    """One eval window: (optimization batch, gt-slice batch, gt flow, dt)."""
    n_events = data_config["n_events_per_batch"]
    ind1 = loader.time_to_index(t1)
    ind2 = loader.time_to_index(t2)
    batch_for_gt_slice = loader.load_event(ind1, ind2)
    gt_flow = loader.load_optical_flow(t1, t2) if loader.gt_flow_available else None
    batch_for_gt_slice[..., 2] -= np.min(batch_for_gt_slice[..., 2])
    if ind2 - ind1 < n_events:
        insufficient = n_events - (ind2 - ind1)
        ind1 -= insufficient // 2
        ind2 += insufficient // 2
    elif ind2 - ind1 > n_events:
        ind1 = ind2 - n_events
    batch_for_optimization = loader.load_event(max(ind1, 0), min(ind2, len(loader)))
    batch_for_optimization[..., 2] -= np.min(batch_for_optimization[..., 2])
    if utils.check_key_and_bool(data_config, "remove_car"):
        batch_for_optimization = utils.crop_event(batch_for_optimization, 0, 193, 0, 346)
    return batch_for_optimization, batch_for_gt_slice, gt_flow, t2 - t1


def _maybe_save_flow(solv, frame_index, best_motion, flow_time):
    """Per-frame flow dump when ``output.save_flow`` is configured
    (dsec_png = DSEC benchmark submission layout, or npz): the dense
    PIXEL DISPLACEMENT over the window, written next to the metrics."""
    fmt = (solv.out_config or {}).get("save_flow")
    if not fmt:
        return
    from event_based_optical_flow_tpu.flow.io import save_flow_frame

    out_dir = solv.visualizer.save_dir if solv.visualizer else "."
    try:
        flow = np.asarray(solv.motion_to_dense_flow(best_motion, flow_time))
    except TypeError:  # non-pyramidal solvers take only the motion
        flow = np.asarray(solv.motion_to_dense_flow(best_motion))
    if flow.ndim == 4:
        # time-aware voxel [T, 2, H, W]: dump the SAME slice the metrics
        # score (t0 per t0_flow_location — bin 0 or T//2, base.py:183)
        flow = solv.get_original_flow_from_time_aware_flow_voxel(flow)
    save_flow_frame(out_dir, frame_index, flow * flow_time, fmt)


def evaluate_dataset_fleet(eval_ts, data_config, loader, solv, fleet_batch: int):
    """Batched evaluation: fleet_batch frames per device solve (requires
    warm_start: false — frames are independent).  New capability; the
    reference loop is strictly sequential."""
    eval_dt = data_config["eval_dt"]
    batch_warm = data_config.get("warm_start") == "batch"
    out_dir = solv.visualizer.save_dir if solv.visualizer else "."
    start_frame, warm_motion = ckpt.load_eval_state(out_dir)
    if batch_warm and warm_motion is not None:
        solv.set_previous_frame_best_estimation(warm_motion)
    frames = list(range(start_frame, len(eval_ts) - eval_dt))
    logger.info(
        f"Fleet evaluation: {len(frames)} frames, batch {fleet_batch}"
        + (", batch warm start" if batch_warm else "")
    )
    for chunk_start in range(0, len(frames), fleet_batch):
        chunk = frames[chunk_start : chunk_start + fleet_batch]
        gathered = [
            _gather_frame(loader, data_config, eval_ts[i], eval_ts[i + eval_dt]) for i in chunk
        ]
        motions = solv.optimize_batch([g[0] for g in gathered])
        if batch_warm:
            # every frame of the next batch warm-starts from this batch's
            # temporally last solution (fleet analog of the sequential
            # warm-start chain)
            solv.set_previous_frame_best_estimation(motions[-1])
        for i1, (opt_b, gt_b, gt_flow, flow_time), best in zip(chunk, gathered, motions):
            flow_error = solv.calculate_flow_error(best, gt_flow, timescale=flow_time, events=gt_b)
            solv.save_flow_error_as_text(i1, flow_error, "flow_error_per_frame_with_mask.txt")
            ckpt.append_frame_metrics(out_dir, i1, flow_error)
            _maybe_save_flow(solv, i1, best, flow_time)
        ckpt.save_eval_state(
            out_dir, chunk[-1] + 1, motions[-1] if batch_warm else None
        )


def evaluate_dataset_fwl_only(eval_frame_time_stamp_list, data_config, loader, solv):
    """GT-free evaluation (e.g. ECD: no dense flow GT exists): per window,
    optimize and report PRED_FWL (Var(IWE_orig)/Var(IWE_warped) of the
    predicted flow; < 1 is better) — the protocol the reference defines
    (calculate_fwl_pred, ref base.py:616-649) but never wires to a
    GT-free dataset.  Window renormalization, warm start, checkpoint and
    text/JSONL outputs match the GT loop."""
    eval_dt = data_config["eval_dt"]
    warm_start = data_config.get("warm_start", True)
    out_dir = solv.visualizer.save_dir if solv.visualizer else "."
    start_frame, warm_motion = ckpt.load_eval_state(out_dir)
    if warm_motion is not None and warm_start:
        solv.set_previous_frame_best_estimation(warm_motion)
    logger.info(
        f"FWL-only evaluation (no GT flow), dt={eval_dt}, warm_start={warm_start}, "
        f"from frame {start_frame}"
    )
    for i1 in range(start_frame, len(eval_frame_time_stamp_list) - eval_dt):
        logger.info(f"Frame {i1} of {len(eval_frame_time_stamp_list)}")
        t1 = eval_frame_time_stamp_list[i1]
        t2 = eval_frame_time_stamp_list[i1 + eval_dt]
        batch_for_optimization, batch_for_metrics, _, flow_time = _gather_frame(
            loader, data_config, t1, t2
        )
        best_motion = solv.profiled_optimize(batch_for_optimization)
        fwl = solv.calculate_fwl_pred(best_motion, batch_for_metrics, flow_time)
        if warm_start:
            solv.set_previous_frame_best_estimation(best_motion)
        solv.save_flow_error_as_text(i1, fwl, "flow_error_per_frame_with_mask.txt")
        ckpt.append_frame_metrics(out_dir, i1, fwl)
        _maybe_save_flow(solv, i1, best_motion, flow_time)
        ckpt.save_eval_state(out_dir, i1 + 1, best_motion if warm_start else None)
        viz_every = int(data_config.get("visualize_every", 1))
        if viz_every and i1 % viz_every == 0:
            solv.visualize_original_sequential(batch_for_metrics)
            solv.visualize_pred_sequential(batch_for_metrics, best_motion)
    if solv.visualizer is not None:
        solv.visualizer.flush()


def evaluate_dataset_with_gt(eval_frame_time_stamp_list, data_config, loader, solv):
    """Sequential evaluation pipeline (reference main.py:52-107): per
    gray-frame window, fixed-count event batch for optimization, exact GT
    window batch for metrics, warm start chaining (switchable via
    data_config['warm_start']=False)."""
    eval_dt = data_config["eval_dt"]
    n_events = data_config["n_events_per_batch"]
    warm_start = data_config.get("warm_start", True)
    out_dir = solv.visualizer.save_dir if solv.visualizer else "."
    start_frame, warm_motion = ckpt.load_eval_state(out_dir)
    if warm_motion is not None and warm_start:
        solv.set_previous_frame_best_estimation(warm_motion)
    logger.info(f"Evaluation pipeline, dt={eval_dt}, warm_start={warm_start}, from frame {start_frame}")

    for i1 in range(start_frame, len(eval_frame_time_stamp_list) - eval_dt):
        logger.info(f"Frame {i1} of {len(eval_frame_time_stamp_list)}")
        if "ind1" in data_config and "ind2" in data_config:
            if i1 < data_config["ind1"] or i1 > data_config["ind2"]:
                continue
        t1 = eval_frame_time_stamp_list[i1]
        t2 = eval_frame_time_stamp_list[i1 + eval_dt]
        ind1 = loader.time_to_index(t1)
        ind2 = loader.time_to_index(t2)

        batch_for_gt_slice = loader.load_event(ind1, ind2)
        gt_flow = loader.load_optical_flow(t1, t2)
        flow_time = t2 - t1
        batch_for_gt_slice[..., 2] -= np.min(batch_for_gt_slice[..., 2])

        # renormalize the optimization batch to a fixed event count
        if ind2 - ind1 < n_events:
            insufficient = n_events - (ind2 - ind1)
            ind1 -= insufficient // 2
            ind2 += insufficient // 2
        elif ind2 - ind1 > n_events:
            ind1 = ind2 - n_events
        batch_for_optimization = loader.load_event(max(ind1, 0), min(ind2, len(loader)))
        batch_for_optimization[..., 2] -= np.min(batch_for_optimization[..., 2])

        if utils.check_key_and_bool(data_config, "remove_car"):
            batch_for_optimization = utils.crop_event(batch_for_optimization, 0, 193, 0, 346)

        if hasattr(solv, "optimize_with_metrics"):
            # pyramid fast path: solve + metrics in one device dispatch
            best_motion, flow_error = solv.optimize_with_metrics(
                batch_for_optimization, gt_flow, flow_time, batch_for_gt_slice
            )
        else:
            best_motion = solv.profiled_optimize(batch_for_optimization)
            flow_error = solv.calculate_flow_error(
                best_motion, gt_flow, timescale=flow_time, events=batch_for_gt_slice
            )
        if warm_start:
            solv.set_previous_frame_best_estimation(best_motion)
        solv.save_flow_error_as_text(i1, flow_error, "flow_error_per_frame_with_mask.txt")
        ckpt.append_frame_metrics(out_dir, i1, flow_error)
        _maybe_save_flow(solv, i1, best_motion, flow_time)
        ckpt.save_eval_state(out_dir, i1 + 1, best_motion if warm_start else None)

        viz_every = int(data_config.get("visualize_every", 1))
        if viz_every and i1 % viz_every == 0:
            solv.visualize_original_sequential(batch_for_gt_slice)
            solv.visualize_pred_sequential(batch_for_gt_slice, best_motion)
            solv.visualize_gt_sequential(batch_for_gt_slice, gt_flow)
    if solv.visualizer is not None:
        solv.visualizer.flush()


def main():
    config, args = parse_args()
    data_config: dict = config["data"]
    out_config: dict = config["output"]
    log_level = getattr(logging, args.log.upper(), None)
    if not isinstance(log_level, int):
        raise ValueError(f"Invalid log level: {args.log}")
    save_config(out_config["output_dir"], args.config_file, log_level)
    logger.info(f"runtime: {utils.fetch_runtime_info()}")

    if utils.check_key_and_bool(config, "fix_random_seed"):
        utils.fix_random_seed()

    image_shape = (data_config["height"], data_config["width"])
    if config.get("is_dnn") and "crop" in data_config.get("preprocess", {}):
        image_shape = (
            data_config["preprocess"]["crop"]["height"],
            data_config["preprocess"]["crop"]["width"],
        )

    viz = visualizer.Visualizer(
        image_shape,
        show=out_config["show_interactive_result"],
        save=True,
        save_dir=out_config["output_dir"],
    )

    loader = data.collections[data_config["dataset"]](config=data_config)
    loader.set_sequence(data_config["sequence"])

    if config.get("parallel"):
        # forward the top-level parallel block to the solver: it builds a
        # ("data", "event") mesh and event-shards the fused objective
        config["solver"]["parallel"] = config["parallel"]

    method_name = config["solver"]["method"]
    solv = solver.collections[method_name](
        image_shape,
        calibration_parameter=loader.load_calib(),
        solver_config=config["solver"],
        optimizer_config=config["optimizer"],
        output_config=config["output"],
        visualize_module=viz,
    )

    if config.get("is_dnn"):
        from event_based_optical_flow_tpu.models import run_dnn_flow

        run_dnn_flow(config, loader, viz, evaluate=args.eval)
        return

    if args.eval:
        eval_ts = loader.eval_frame_time_list()
        fleet_batch = int(data_config.get("fleet_batch", 1))
        if not loader.gt_flow_available:
            # GT-free datasets (ECD): FWL-only evaluation protocol
            evaluate_dataset_fwl_only(eval_ts, data_config, loader, solv)
        elif fleet_batch > 1 and hasattr(solv, "optimize_batch"):
            assert data_config.get("warm_start", True) in (False, "batch"), (
                "fleet_batch requires warm_start: false (independent frames) "
                "or warm_start: batch (chained batches)"
            )
            evaluate_dataset_fleet(eval_ts, data_config, loader, solv, fleet_batch)
        else:
            evaluate_dataset_with_gt(eval_ts, data_config, loader, solv)
        summary = ckpt.summarize_metrics(out_config["output_dir"])
        if summary:
            logger.info(f"Evaluation summary (mean over frames): {summary}")
        logger.info(f"Evaluation done! {data_config['sequence']}")
        return

    # single-frame optimization
    ind1, ind2 = data_config["ind1"], data_config["ind2"]
    batch = loader.load_event(ind1, ind2)
    batch[..., 2] -= np.min(batch[..., 2])
    if utils.check_key_and_bool(data_config, "remove_car"):
        batch = utils.crop_event(batch, 0, 193, 0, 346)

    solv.visualize_one_batch_warp(batch)
    best_motion = solv.profiled_optimize(batch)
    solv.visualize_one_batch_warp(batch, best_motion)

    if loader.gt_flow_available:
        t1 = loader.index_to_time(ind1)
        t2 = loader.index_to_time(ind2)
        gt_flow = loader.load_optical_flow(t1, t2)
        solv.calculate_flow_error(best_motion, gt_flow, t2 - t1, batch)
    viz.flush()


if __name__ == "__main__":
    main()
