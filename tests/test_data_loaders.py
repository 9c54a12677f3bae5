"""Data loader contracts on synthetic on-disk fixtures (no real datasets
needed): ECD text format roundtrip, DSEC event/flow decoding, MVSEC GT
displacement convention, synthetic loader determinism."""

import os

import numpy as np
import pytest

from event_based_optical_flow_tpu import data


def test_synthetic_loader_contract():
    cfg = {"height": 40, "width": 50, "duration": 1.0, "event_rate": 20000,
           "n_frames": 5, "load_gt_flow": True, "gt": ".", "root": "", "dataset": "synthetic"}
    loader = data.collections["synthetic"](config=cfg)
    loader.set_sequence("seq")
    assert len(loader) > 1000
    ev = loader.load_event(0, 100)
    assert ev.shape == (100, 4)
    assert (np.diff(ev[:, 2]) >= 0).all()
    i = loader.time_to_index(0.5)
    assert abs(loader.index_to_time(i) - 0.5) < 0.01
    flow = loader.load_optical_flow(0.1, 0.3)
    assert flow.shape == (40, 50, 2)
    # displacement scales with dt
    flow2 = loader.load_optical_flow(0.1, 0.5)
    np.testing.assert_allclose(flow2, flow * 2, atol=1e-9)


def test_ecd_text_loader(tmp_path):
    seq = tmp_path / "slider"
    seq.mkdir()
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1, 500))
    x = rng.integers(0, 240, 500)  # width coord in file
    y = rng.integers(0, 180, 500)  # height coord in file
    p = rng.integers(0, 2, 500)
    np.savetxt(seq / "events.txt", np.stack([t, x, y, p], 1), fmt="%.6f %d %d %d")
    np.savetxt(seq / "calib.txt", np.array([199.0, 198.0, 132.0, 110.0, -0.38, 0.18, 0.0, 0.0, 0.0])[None])

    cfg = {"height": 180, "width": 240, "root": str(tmp_path), "dataset": "ECD"}
    loader = data.collections["ECD"](config=cfg)
    loader.set_sequence("slider")
    ev = loader.load_event(0, 500)
    # framework convention: col0 = height coord (file's y), col3 in {-1,1}
    np.testing.assert_allclose(np.sort(np.unique(ev[:, 3])), [-1.0, 1.0])
    assert ev[:, 0].max() < 180 and ev[:, 1].max() < 240
    calib = loader.load_calib()
    assert calib["K"][0, 0] == pytest.approx(199.0)


def test_dsec_h5_loader(tmp_path):
    h5py = pytest.importorskip("h5py")
    from PIL import Image

    seq = tmp_path / "zurich_city_00_a"
    (seq / "events" / "left").mkdir(parents=True)
    (seq / "flow" / "forward").mkdir(parents=True)
    rng = np.random.default_rng(1)
    n = 400
    with h5py.File(seq / "events" / "left" / "events.h5", "w") as f:
        g = f.create_group("events")
        g.create_dataset("x", data=rng.integers(0, 640, n).astype(np.uint16))
        g.create_dataset("y", data=rng.integers(0, 480, n).astype(np.uint16))
        g.create_dataset("t", data=np.sort(rng.integers(0, 1_000_000, n)).astype(np.int64))
        g.create_dataset("p", data=rng.integers(0, 2, n).astype(np.uint8))
        f.create_dataset("t_offset", data=np.int64(5_000_000))
    # one GT flow png: u=+2px (width), v=-1px (height), valid everywhere
    img = np.zeros((480, 640, 3), dtype=np.uint16)
    img[..., 0] = 2 * 128 + 2**15
    img[..., 1] = (2**15) - 128
    img[..., 2] = 1
    Image.fromarray(img, mode="RGB;16" if False else None or "I;16").close() if False else None
    # PIL 16-bit RGB is awkward; write via png with PIL 'I;16' per channel is
    # unsupported — use 3-channel uint16 through PNG via imageio-free route:
    import struct, zlib

    def write_png16(path, arr):
        h, w, _ = arr.shape
        raw = b"".join(b"\x00" + arr[i].astype(">u2").tobytes() for i in range(h))
        def chunk(tag, data):
            c = tag + data
            return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))
        ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
        png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        open(path, "wb").write(png)

    write_png16(seq / "flow" / "forward" / "000000.png", img)
    np.savetxt(seq / "flow" / "forward_timestamps.txt", np.array([[5_000_000, 5_100_000]]),
               fmt="%d", delimiter=",")

    cfg = {"height": 480, "width": 640, "root": str(tmp_path), "dataset": "DSEC",
           "load_gt_flow": True, "gt": str(seq / "flow")}
    loader = data.collections["DSEC"](config=cfg)
    loader.set_sequence("zurich_city_00_a")
    ev = loader.load_event(0, n)
    assert ev.shape == (n, 4)
    assert ev[:, 2].min() >= 5.0  # t_offset applied, seconds
    assert set(np.unique(ev[:, 3])) <= {-1.0, 1.0}
    flow = loader.load_optical_flow(5.0, 5.1)
    assert flow.shape == (480, 640, 2)
    np.testing.assert_allclose(flow[..., 0], -1.0, atol=1e-6)  # height comp
    np.testing.assert_allclose(flow[..., 1], 2.0, atol=1e-6)   # width comp


@pytest.mark.slow  # 8 s; loader basics stay fast in the other synthetic tests
def test_synthetic_scene_families_gt_consistency():
    """Every synthetic scene family (parity-study substrate) must be
    self-consistent: warping the events by the exact GT displacement
    sharpens the IWE (normalized-variance ratio < 1)."""
    import jax.numpy as jnp

    from event_based_optical_flow_tpu.costs import functional as F
    from event_based_optical_flow_tpu.ops.iwe import EventImageConverter
    from event_based_optical_flow_tpu.ops.warp import Warp

    H, W = 60, 80
    cases = [
        ("quadrants", {}),
        ("disc", {"flow_max": 12.0}),
        ("rot", {"omega": 0.6}),
        ("zoom", {"zoom_rate": 0.5}),
        ("quadrants", {"noise_fraction": 0.3}),
    ]
    for scene, extra in cases:
        cfg = {"height": H, "width": W, "duration": 1.0, "event_rate": 60000,
               "n_frames": 3, "scene": scene}
        cfg.update(extra)
        loader = data.collections["synthetic"](config=cfg)
        loader.set_sequence("s")
        ts = loader.eval_frame_time_list()
        i1, i2 = loader.time_to_index(ts[0]), loader.time_to_index(ts[1])
        ev = loader.load_event(i1, i2)
        ev[:, 2] -= ev[:, 2].min()
        gt = loader.load_optical_flow(ts[0], ts[1])
        assert len(ev) > 1000 and gt.shape == (H, W, 2)
        imager = EventImageConverter((H, W))
        warper = Warp((H, W), normalize_t=True)
        e = jnp.asarray(ev)
        warped = warper.warp_event(e, jnp.asarray(np.transpose(gt, (2, 0, 1))), "dense-flow")
        ratio = float(
            F.normalized_image_variance(
                imager.create_iwe(warped, sigma=1), imager.create_iwe(e, sigma=1),
                omit_boundary=False, ddof=0,
            )
        )
        assert 1.0 / ratio < 0.75, (scene, extra, 1.0 / ratio)


def test_evt2_decoder_and_loader(tmp_path, monkeypatch):
    """EVT2 (Prophesee RAW) ingestion: the native C++ decoder and the
    vectorized numpy fallback produce identical events from a synthetic
    word stream (TIME_HIGH rollover, pre-TIME_HIGH events, skipped
    EXT_TRIGGER words), and the loader maps sensor (column, row) to the
    framework (x=height, y=width) convention with seconds + ±1 polarity."""
    from event_based_optical_flow_tpu import native
    from event_based_optical_flow_tpu.data import collections
    from event_based_optical_flow_tpu.data.evt2 import decode_evt2_numpy

    rng = np.random.default_rng(5)
    n = 5000
    t_us = np.sort(rng.integers(0, 500_000, n)).astype(np.uint64)
    x_col = rng.integers(0, 640, n)
    y_row = rng.integers(0, 480, n)
    pol = rng.integers(0, 2, n)

    words = []
    th_prev = -1
    for i in range(n):
        th = int(t_us[i]) >> 6
        if th != th_prev:
            words.append((0x8 << 28) | th)
            th_prev = th
        if i == 1000:
            words.append(0xA << 28)  # EXT_TRIGGER: must be skipped
        words.append(
            (int(pol[i]) << 28)
            | ((int(t_us[i]) & 0x3F) << 22)
            | (int(x_col[i]) << 11)
            | int(y_row[i])
        )
    # a CD event BEFORE any TIME_HIGH decodes with time_high = 0
    words = [(1 << 28) | (5 << 22) | (3 << 11) | 7] + words
    words = np.asarray(words, np.uint32)

    xp, yp, tp, pp = decode_evt2_numpy(words)
    assert len(xp) == n + 1
    np.testing.assert_array_equal(xp[1:], x_col)
    np.testing.assert_array_equal(yp[1:], y_row)
    np.testing.assert_array_equal(tp[1:], t_us.astype(np.float64))
    np.testing.assert_array_equal(pp[1:], pol)
    assert (xp[0], yp[0], tp[0], pp[0]) == (3.0, 7.0, 5.0, 1.0)

    if native._get_evt2_lib() is not None:  # toolchain present
        xn, yn, tn, pn = native.decode_evt2(words)
        np.testing.assert_array_equal(xn, xp)
        np.testing.assert_array_equal(yn, yp)
        np.testing.assert_array_equal(tn, tp)
        np.testing.assert_array_equal(pn, pp)

    raw = tmp_path / "seq1.raw"
    header = b"% format EVT2;height=480;width=640\n% end\n"
    raw.write_bytes(header + words.tobytes())

    np.savetxt(
        tmp_path / "seq1_calib.txt",
        np.array([640.0, 641.0, 320.0, 240.0, -0.1, 0.02, 0.0, 0.0, 0.0])[None],
    )
    loader = collections["EVT2"](
        config={"height": 480, "width": 640, "root": str(tmp_path)}
    )
    loader.set_sequence("seq1")
    calib = loader.load_calib()
    assert calib["K"][0, 0] == 640.0 and calib["K"][1, 2] == 240.0
    assert len(calib["D"]) == 5
    ev = loader.load_event(0, len(loader))
    assert ev.shape == (n + 1, 4)
    np.testing.assert_array_equal(ev[1:, 0], y_row)   # x = height = sensor row
    np.testing.assert_array_equal(ev[1:, 1], x_col)   # y = width = sensor col
    np.testing.assert_allclose(ev[1:, 2], t_us * 1e-6)
    assert set(np.unique(ev[:, 3])) <= {-1.0, 1.0}
    assert not loader.gt_flow_available
    clock = loader.eval_frame_time_list()
    assert clock[0] == ev[0, 2] and clock[-1] == ev[-1, 2]
    assert loader.time_to_index(ev[100, 2] + 1e-9) >= 99


def test_evt3_decoder_and_loader(tmp_path):
    """EVT3 (stateful 16-bit stream): the native C++ decoder and the
    vectorized numpy fallback agree with a plain sequential model on a
    random op stream covering single events, VECT_12/VECT_8 runs with
    sparse masks, multiple vectors per base, TIME_HIGH rollover, and
    skipped trigger words; the loader applies the framework conventions."""
    from event_based_optical_flow_tpu import native
    from event_based_optical_flow_tpu.data import collections
    from event_based_optical_flow_tpu.data.evt3 import decode_evt3_numpy

    rng = np.random.default_rng(11)
    words, expected = [], []
    # sequential model state (mirrors evt3.cpp)
    row = base = vpol = tl = th = epoch = 0

    def t_now():
        return float((epoch << 24) | (th << 12) | tl)

    # start with an event before ANY register writes (all-zero state).
    # Type codes per the Metavision EVT3 spec: ADDR_Y 0x0, ADDR_X 0x2,
    # VECT_BASE_X 0x3, VECT_12 0x4, VECT_8 0x5, TIME_LOW 0x6,
    # TIME_HIGH 0x8 (0x1 is reserved).
    words.append((0x2 << 12) | (1 << 11) | 17)
    expected.append((17.0, 0.0, 0.0, 1.0))

    for _ in range(4000):
        op = rng.integers(0, 8)
        if op == 0:  # EVT_ADDR_Y
            row = int(rng.integers(0, 480))
            words.append((0x0 << 12) | row)
        elif op == 1:  # EVT_TIME_LOW
            tl = int(rng.integers(0, 4096))
            words.append((0x6 << 12) | tl)
        elif op == 2:  # EVT_TIME_HIGH (occasionally backward -> rollover)
            new_th = int(rng.integers(0, 4096))
            if new_th < th:
                epoch += 1
            th = new_th
            words.append((0x8 << 12) | th)
        elif op == 3:  # single CD event
            x = int(rng.integers(0, 640))
            p = int(rng.integers(0, 2))
            words.append((0x2 << 12) | (p << 11) | x)
            expected.append((float(x), float(row), t_now(), float(p)))
        elif op == 4:  # VECT_BASE_X
            base = int(rng.integers(0, 600))
            vpol = int(rng.integers(0, 2))
            words.append((0x3 << 12) | (vpol << 11) | base)
        elif op in (5, 6):  # VECT_12 / VECT_8
            nbits = 12 if op == 5 else 8
            mask = int(rng.integers(0, 1 << nbits))
            words.append(((0x4 if nbits == 12 else 0x5) << 12) | mask)
            for b in range(nbits):
                if mask & (1 << b):
                    expected.append((float(base + b), float(row), t_now(), float(vpol)))
            base += nbits
        else:  # EXT_TRIGGER: skipped
            words.append(0xA << 12)

    words = np.asarray(words, np.uint16)
    exp = np.asarray(expected, np.float64)
    assert len(exp) > 3000  # the stream genuinely emits vector runs

    xp, yp, tp, pp = decode_evt3_numpy(words)
    got = np.stack([xp, yp, tp, pp], axis=1)
    np.testing.assert_array_equal(got, exp)

    if native._get_evt3_lib() is not None:
        xn, yn, tn, pn = native.decode_evt3(words)
        np.testing.assert_array_equal(np.stack([xn, yn, tn, pn], 1), exp)

    raw = tmp_path / "gen4.raw"
    raw.write_bytes(b"% format EVT3;height=480;width=640\n% end\n" + words.tobytes())
    loader = collections["EVT3"](
        config={"height": 480, "width": 640, "root": str(tmp_path)}
    )
    loader.set_sequence("gen4")
    ev = loader.load_event(0, len(loader))
    np.testing.assert_array_equal(ev[:, 0], exp[:, 1])  # x = sensor row
    np.testing.assert_array_equal(ev[:, 1], exp[:, 0])  # y = sensor col
    np.testing.assert_allclose(ev[:, 2], exp[:, 2] * 1e-6)
    assert set(np.unique(ev[:, 3])) <= {-1.0, 1.0}
    assert not loader.gt_flow_available


def test_evt_decoders_degenerate_streams():
    """Streams missing a stateful register word entirely (EVT2 with no
    TIME_HIGH; EVT3 vector words before any VECT_BASE_X) decode with the
    initial-zero registers — numpy fallback == native (regression: the
    forward-fill indexing crashed on empty marker arrays)."""
    from event_based_optical_flow_tpu import native
    from event_based_optical_flow_tpu.data.evt2 import decode_evt2_numpy
    from event_based_optical_flow_tpu.data.evt3 import decode_evt3_numpy

    w2 = np.asarray([(0x1 << 28) | (5 << 22) | (3 << 11) | 7], np.uint32)
    exp2 = np.asarray([[3.0, 7.0, 5.0, 1.0]])
    out2 = np.stack(decode_evt2_numpy(w2), 1)
    np.testing.assert_array_equal(out2, exp2)
    if native._get_evt2_lib() is not None:
        np.testing.assert_array_equal(np.stack(native.decode_evt2(w2), 1), exp2)

    w3 = np.asarray([(0x4 << 12) | 0b101, (0x5 << 12) | 0b1], np.uint16)
    exp3 = np.asarray([
        [0.0, 0.0, 0.0, 0.0],
        [2.0, 0.0, 0.0, 0.0],
        [12.0, 0.0, 0.0, 0.0],  # base advanced by 12 after the VECT_12
    ])
    out3 = np.stack(decode_evt3_numpy(w3), 1)
    np.testing.assert_array_equal(out3, exp3)
    if native._get_evt3_lib() is not None:
        np.testing.assert_array_equal(np.stack(native.decode_evt3(w3), 1), exp3)


def test_evt_decoders_fuzz_native_matches_numpy():
    """Adversarial-input property: the C++ decoders parse UNTRUSTED
    camera bytes, so arbitrary word streams (random type codes, register
    words in any order, reserved/unknown types) must (a) not crash and
    (b) stay byte-identical to the numpy fallbacks.  Catches both memory
    bugs in the native parsers and state-machine divergence."""
    from event_based_optical_flow_tpu import native
    from event_based_optical_flow_tpu.data.evt2 import decode_evt2_numpy
    from event_based_optical_flow_tpu.data.evt3 import decode_evt3_numpy

    rng = np.random.default_rng(1234)
    for trial in range(6):
        n = int(rng.integers(1, 5000))
        w2 = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
        ref2 = np.stack(decode_evt2_numpy(w2), 1) if n else None
        assert np.all(ref2[:, :2] < 2048) and np.all(ref2[:, 3] <= 1)
        if native._get_evt2_lib() is not None:
            np.testing.assert_array_equal(np.stack(native.decode_evt2(w2), 1), ref2)

        w3 = rng.integers(0, 1 << 16, size=n, dtype=np.uint32).astype(np.uint16)
        ref3 = np.stack(decode_evt3_numpy(w3), 1)
        # 11-bit fields, but the vector base register accumulates +12/+8
        # per vector word between bases: bounded by 2047 + 12*n_words
        assert np.all(ref3[:, 0] < 2048 + 12 * n) and np.all(ref3[:, 1] < 2048)
        assert np.all(ref3[:, 3] <= 1)
        if native._get_evt3_lib() is not None:
            np.testing.assert_array_equal(np.stack(native.decode_evt3(w3), 1), ref3)


def test_evt_raw_readers_truncated_payload(tmp_path):
    """A live capture cut mid-word (process killed, disk full) must still
    load: the readers drop the trailing partial word."""
    from event_based_optical_flow_tpu.data.evt2 import read_raw_evt2
    from event_based_optical_flow_tpu.data.evt3 import read_raw_evt3

    w2 = np.asarray([(0x8 << 28) | 2, (0x1 << 28) | (5 << 22) | (3 << 11) | 7], "<u4")
    p2 = tmp_path / "t2.raw"
    p2.write_bytes(b"% format EVT2\n" + w2.tobytes() + b"\x55")  # +1 stray byte
    x, y, t, p = read_raw_evt2(str(p2))
    assert len(x) == 1 and t[0] == float((2 << 6) | 5)

    w3 = np.asarray([(0x4 << 12) | 0b1], "<u2")
    p3 = tmp_path / "t3.raw"
    p3.write_bytes(b"% format EVT3\n" + w3.tobytes() + b"\x55")
    x3, *_ = read_raw_evt3(str(p3))
    assert len(x3) == 1


def test_synthetic_gt_advection_matches_closed_form():
    """gt_advection serves GT the MVSEC way (per-GT-frame displacement
    stacks advected via flow.gt.estimate_corresponding_gt_flow, ref
    flow_utils.py:763-839).  On a piecewise-constant scene the advected
    dt=4 window must reproduce the closed form away from the quadrant
    boundaries (nearest-remap along a constant-velocity path is exact);
    pixels advected out of frame are masked to zero."""
    cfg = {"height": 60, "width": 80, "duration": 1.0, "event_rate": 20000.0,
           "n_frames": 9, "flow_max": 12.0, "seed": 3, "load_gt_flow": True,
           "gt": ".", "root": "", "dataset": "synthetic",
           "gt_advection": True}
    loader = data.collections["synthetic"](config=cfg)
    loader.set_sequence("adv")
    ts = loader.eval_frame_time_list()
    t1, t2 = ts[0], ts[4]  # spans 4 GT intervals -> the advection loop
    adv = loader.load_optical_flow(t1, t2)
    exact = loader._exact_flow(t1, t2)

    H, W = 60, 80
    dt = t2 - t1
    margin = 12.0 * dt + 3
    rows = np.arange(H)[:, None] * np.ones((1, W))
    cols = np.ones((H, 1)) * np.arange(W)[None, :]
    interior = (
        (np.abs(rows - H / 2) > margin) & (np.abs(cols - W / 2) > margin)
        & (rows > margin) & (rows < H - margin)
        & (cols > margin) & (cols < W - margin)
    )
    moved = (adv != 0).any(axis=2)  # advected-out pixels are masked to 0
    sel = interior & moved
    assert sel.sum() > 0.5 * interior.sum()
    np.testing.assert_allclose(adv[sel], exact[sel], atol=0.05)

    # dt=1 (single GT interval) short-circuits to a pure rescale of the
    # first frame -- must equal the closed form everywhere
    adv1 = loader.load_optical_flow(ts[0], ts[1])
    np.testing.assert_allclose(adv1, loader._exact_flow(ts[0], ts[1]), atol=1e-5)
