"""Eval-loop checkpoint/resume roundtrip."""

import numpy as np

from event_based_optical_flow_tpu.utils import checkpoint as ckpt


def test_roundtrip_array(tmp_path):
    out = str(tmp_path)
    motion = np.random.rand(2, 4, 4)
    ckpt.save_eval_state(out, 17, motion)
    frame, warm = ckpt.load_eval_state(out)
    assert frame == 17
    np.testing.assert_allclose(warm, motion)


def test_roundtrip_pyramid_dict(tmp_path):
    out = str(tmp_path)
    motion = {1: np.random.rand(2, 2, 2), 2: np.random.rand(2, 4, 4)}
    ckpt.save_eval_state(out, 3, motion)
    frame, warm = ckpt.load_eval_state(out)
    assert frame == 3
    assert set(warm.keys()) == {1, 2}
    np.testing.assert_allclose(warm[2], motion[2])


def test_missing_state(tmp_path):
    frame, warm = ckpt.load_eval_state(str(tmp_path))
    assert frame == 0 and warm is None


def test_metrics_accumulation(tmp_path):
    out = str(tmp_path)
    ckpt.append_frame_metrics(out, 0, {"EPE": 1.0, "AE": 0.5})
    ckpt.append_frame_metrics(out, 1, {"EPE": 3.0, "AE": 1.5})
    summary = ckpt.summarize_metrics(out)
    assert summary["EPE"] == 2.0 and summary["AE"] == 1.0
