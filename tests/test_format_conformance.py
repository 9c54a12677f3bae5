"""Format-conformance suite: byte-exact vectors derived from the
PUBLISHED specs, not from the repo's own encoders.

Real dataset files cannot be downloaded on this box (no egress), so
each test hand-assembles the on-disk byte layout straight from the
format's public specification and asserts the loader recovers the
hand-computed values:

- MVSEC HDF5 tree/dtypes (daniilidis-group; ref src/data_loader/
  mvsec.py:15-36 documents the fields real files have),
- DSEC optical-flow PNG16 encoding (u = (R - 2^15)/128, 16-bit RGB,
  valid = B > 0; dsec.ifi.uzh.ch submission format),
- Prophesee Metavision EVT2.0 word layout (CD_OFF/CD_ON/EVT_TIME_HIGH),
- Prophesee Metavision EVT3.0 word layout (ADDR_Y/ADDR_X/VECT_BASE_X/
  VECT_12/VECT_8/TIME_LOW/TIME_HIGH incl. 24-bit rollover).

If any loader misreads a real-world file layout, a test here fails.
What still awaits real hardware/data access is documented in
README.md ("Real-data validation status").
"""

import struct
import zlib

import numpy as np
import pytest


# --------------------------------------------------------------------
# MVSEC HDF5
# --------------------------------------------------------------------


def _write_mvsec_fixture(tmp_path, seq="conformance_room1"):
    """Build <seq>_data.hdf5 + <seq>_gt_flow_dist.npz with the exact
    published MVSEC layout: events are float64 [N, 4] columns
    (x = sensor column, y = sensor row, t = absolute epoch SECONDS,
    p in {-1, +1}); davis/<cam>/events + davis/left/image_raw_ts;
    GT npz keys timestamps / x_flow_dist / y_flow_dist."""
    h5py = pytest.importorskip("h5py")
    t0 = 1.5060e9  # real MVSEC stamps are unix-epoch seconds (~1.5e9)
    n = 40
    t = t0 + np.linspace(0.0, 0.39, n)
    x_col = np.arange(n, dtype=np.float64) % 346  # width coord, 0..345
    y_row = (7 * np.arange(n, dtype=np.float64)) % 260  # height coord
    p = np.where(np.arange(n) % 3 == 0, -1.0, 1.0)
    events = np.stack([x_col, y_row, t, p], axis=1)

    gray_ts = t0 + np.array([0.05, 0.15, 0.25, 0.35])
    path = tmp_path / f"{seq}_data.hdf5"
    with h5py.File(path, "w") as f:
        left = f.create_group("davis/left")
        left.create_dataset("events", data=events)
        left.create_dataset("image_raw_ts", data=gray_ts)
        right = f.create_group("davis/right")
        right.create_dataset("events", data=events[:4])

    # GT: 3 frames of constant flow; frame k has u = k+1, v = -(k+1)
    gt_ts = t0 + np.array([0.02, 0.18, 0.38])  # events exist before frame 0
    H, W = 260, 346
    u = np.stack([np.full((H, W), k + 1.0) for k in range(3)])
    v = np.stack([np.full((H, W), -(k + 1.0)) for k in range(3)])
    np.savez(
        tmp_path / f"{seq}_gt_flow_dist.npz",
        timestamps=gt_ts,
        x_flow_dist=u,
        y_flow_dist=v,
    )
    return seq, events, gray_ts, gt_ts


def test_mvsec_hdf5_layout_conformance(tmp_path):
    from event_based_optical_flow_tpu.data.mvsec import MvsecDataLoader

    seq, events, gray_ts, gt_ts = _write_mvsec_fixture(tmp_path)
    config = {
        "height": 260,
        "width": 346,
        "root": str(tmp_path),
        "dataset": ".",
        "load_gt_flow": True,
        "gt": str(tmp_path),
    }
    loader = MvsecDataLoader(config)
    assert loader.gt_flow_available
    loader.set_sequence(seq)

    # omit_invalid_data for an unlisted sequence keeps frames [0:-1] and
    # clips events to the kept GT span
    np.testing.assert_allclose(loader.gt_timestamps, gt_ts[:-1])
    first_ev = int(np.searchsorted(events[:, 2], gt_ts[0])) - 1
    last_ev = int(np.searchsorted(events[:, 2], gt_ts[1])) - 1

    got = loader.load_event(0, 4)
    exp = events[first_ev : first_ev + 4]
    # THE column swap: loader (x=height=sensor row, y=width=sensor col)
    np.testing.assert_allclose(got[:, 0], exp[:, 1])
    np.testing.assert_allclose(got[:, 1], exp[:, 0])
    # timestamps must survive at float64 epoch magnitude (an accidental
    # int16/float32 path would corrupt them)
    np.testing.assert_allclose(got[:, 2], exp[:, 2], rtol=0, atol=1e-6)
    assert got.dtype == np.float64
    # polarity is +-1, preserved through the int16 memory cast
    assert set(np.unique(got[:, 3])) <= {-1.0, 1.0}
    np.testing.assert_allclose(got[:, 3], exp[:, 3])

    assert len(loader) == last_ev - first_ev
    # time_to_index is searchsorted - 1 on the CLIPPED stream
    t_query = 0.5 * (loader.left_ts[5] + loader.left_ts[6])
    assert loader.time_to_index(t_query) == 5

    # load_optical_flow stacks (V, U) = (height, width) components
    flow = loader.load_optical_flow(gt_ts[0], gt_ts[0] + 1e-4)
    assert flow.shape == (260, 346, 2)
    # exact advection scaling is the GT algorithm's own business
    # (tested in test_flow_voxel/golden); conformance = channel ORDER:
    # channel 0 carries y_flow_dist (v, here negative), channel 1
    # carries x_flow_dist (u, positive), scaled to the short window
    frac = 1e-4 / (gt_ts[1] - gt_ts[0])
    np.testing.assert_allclose(flow[..., 0], -1.0 * frac, rtol=5e-3)  # v
    np.testing.assert_allclose(flow[..., 1], 1.0 * frac, rtol=5e-3)  # u
    np.testing.assert_allclose(flow[..., 0], -flow[..., 1], rtol=1e-12)


# --------------------------------------------------------------------
# DSEC optical-flow PNG16
# --------------------------------------------------------------------


def _png16_bytes(img16):
    """Independent minimal PNG writer (filter 0, one IDAT) used only by
    this test — NOT the repo encoder."""
    h, w, _ = img16.shape
    raw = b"".join(
        b"\x00" + img16[i].astype(">u2").tobytes() for i in range(h)
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_dsec_flow_png_spec_decode(tmp_path):
    """Hand-computed DSEC submission-format vectors:
    R = u_px * 128 + 2^15, G = v_px * 128 + 2^15, B = valid flag."""
    from event_based_optical_flow_tpu.data.dsec import DsecDataLoader

    # pixel (0,0): u=+1.5  v=-2.25  valid; pixel (0,1): invalid
    # pixel (1,0): u=-0.0078125 (=-1/128, one quantum)  v=+255.99
    img = np.zeros((2, 2, 3), np.uint16)
    img[0, 0] = (32768 + 192, 32768 - 288, 1)
    img[0, 1] = (40000, 20000, 0)
    img[1, 0] = (32768 - 1, 32768 + 32767, 65535)
    img[1, 1] = (32768, 32768, 1)
    path = tmp_path / "000012.png"
    path.write_bytes(_png16_bytes(img))

    loader = DsecDataLoader.__new__(DsecDataLoader)
    loader.flow_windows_us = np.array([[1_000_000, 1_100_000]])
    loader.flow_files = [str(path)]
    flow = loader.load_optical_flow(1.0, 1.1)

    assert flow.shape == (2, 2, 2)
    # channel order is (height=v, width=u)
    np.testing.assert_allclose(flow[0, 0], [-2.25, 1.5])
    assert np.all(np.isinf(flow[0, 1]))  # invalid -> inf (NOT 0.0)
    np.testing.assert_allclose(flow[1, 0], [32767 / 128.0, -1 / 128.0])
    np.testing.assert_allclose(flow[1, 1], [0.0, 0.0])


def test_dsec_submission_writer_matches_spec(tmp_path):
    """The writer's bytes decode per the published formula using an
    independent pure-python PNG reader (no repo decode involved)."""
    from event_based_optical_flow_tpu.flow.io import write_flow_dsec_png

    flow = np.array(
        [[[-2.25, 0.5]], [[1.5, -1 / 128.0]]]  # [2, 1, 2]: v then u
    )
    valid = np.array([[True, False]])
    path = tmp_path / "out.png"
    write_flow_dsec_png(path, flow, valid)

    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # parse IHDR + IDAT independently
    pos, idat = 8, []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[pos + 8 : pos + 18])
            assert (w, h, depth, color) == (2, 1, 16, 2)
        elif tag == b"IDAT":
            idat.append(data[pos + 8 : pos + 8 + ln])
        pos += 12 + ln
    raw = zlib.decompress(b"".join(idat))
    assert raw[0] == 0  # filter None
    px = np.frombuffer(raw[1:], ">u2").reshape(1, 2, 3)
    # pixel 0: u=1.5 v=-2.25 valid; pixel 1: u=-1/128 v=0.5 invalid
    np.testing.assert_array_equal(px[0, 0], [32768 + 192, 32768 - 288, 1])
    np.testing.assert_array_equal(px[0, 1], [32768 - 1, 32768 + 64, 0])


@pytest.mark.parametrize("use_native", [True, False])
def test_png16_decoder_handles_real_encoder_filters(
    tmp_path, use_native, monkeypatch
):
    """decode_png16 vs an independent C encoder (cv2) on data that
    makes the encoder pick non-trivial scanline filters — through both
    the native C++ defilter and the byte-identical Python fallback."""
    cv2 = pytest.importorskip("cv2")
    from event_based_optical_flow_tpu.flow.io import decode_png16

    if not use_native:
        from event_based_optical_flow_tpu import native

        monkeypatch.setattr(native, "png_defilter", lambda *a: None)

    rng = np.random.default_rng(3)
    # smooth gradient + noise: drives cv2's libpng to Sub/Up/Paeth rows
    base = (np.arange(64)[:, None] * 700 + np.arange(48)[None, :] * 300).astype(
        np.uint16
    )
    img = np.stack(
        [base, base.T[:48, :64].repeat(2, 0)[:64, :48], base // 3], axis=-1
    ).astype(np.uint16)
    img += rng.integers(0, 50, img.shape, dtype=np.uint16)
    ok, buf = cv2.imencode(".png", img[..., ::-1])  # cv2 takes BGR
    assert ok
    np.testing.assert_array_equal(decode_png16(buf.tobytes()), img)


# --------------------------------------------------------------------
# Prophesee EVT2.0 (Metavision spec word layout)
# --------------------------------------------------------------------


def _evt2_cd(pol, ts6, x, y):
    return np.uint32((pol << 28) | (ts6 << 22) | (x << 11) | y)


def _evt2_time_high(t_high28):
    return np.uint32((0x8 << 28) | t_high28)


def _decoders_evt2():
    from event_based_optical_flow_tpu import native
    from event_based_optical_flow_tpu.data.evt2 import decode_evt2_numpy

    yield "numpy", decode_evt2_numpy
    if native.available():
        yield "native", native.decode_evt2


def _decoders_evt3():
    from event_based_optical_flow_tpu import native
    from event_based_optical_flow_tpu.data.evt3 import decode_evt3_numpy

    yield "numpy", decode_evt3_numpy
    if native.available():
        yield "native", native.decode_evt3


def test_evt2_spec_worked_example():
    """Spec vectors: EVT_TIME_HIGH (0x8) carries t[33:6]; CD words carry
    a 6-bit LSB remainder; full t_us = (time_high << 6) | ts6."""
    words = np.array(
        [
            _evt2_time_high(0x0000001),  # time base 1 << 6 = 64 us
            _evt2_cd(1, 5, 1213, 677),  # CD_ON  @ t = 69 us
            _evt2_cd(0, 63, 0, 2047),  # CD_OFF @ t = 127 us, corners
            _evt2_time_high(0x0FFFFFF),  # max 28-bit time base
            _evt2_cd(1, 0, 2047, 0),  # t = 0xFFFFFF << 6
            np.uint32(0xA << 28),  # EXT_TRIGGER: must be skipped
            _evt2_cd(0, 1, 7, 8),
        ],
        dtype=np.uint32,
    )
    for name, dec in _decoders_evt2():
        x_col, y_row, t_us, pol = dec(words)
        np.testing.assert_array_equal(x_col, [1213, 0, 2047, 7], err_msg=name)
        np.testing.assert_array_equal(y_row, [677, 2047, 0, 8])
        np.testing.assert_array_equal(
            t_us, [64 + 5, 64 + 63, (0x0FFFFFF << 6) + 0, (0x0FFFFFF << 6) + 1]
        )
        np.testing.assert_array_equal(pol, [1, 0, 1, 0])


def test_evt2_cd_before_first_time_high():
    """CD words before any EVT_TIME_HIGH use a zero time base."""
    words = np.array([_evt2_cd(1, 9, 3, 4)], dtype=np.uint32)
    for name, dec in _decoders_evt2():
        x, y, t, p = dec(words)
        np.testing.assert_array_equal(t, [9], err_msg=name)


# --------------------------------------------------------------------
# Prophesee EVT3.0 (Metavision spec word layout)
# --------------------------------------------------------------------


def _evt3(ty, payload):
    return np.uint16((ty << 12) | payload)


def test_evt3_spec_worked_example():
    """Spec vectors: ADDR_Y (0x0) sets the row register; TIME_LOW (0x6)/
    TIME_HIGH (0x8) build t = high<<12 | low; ADDR_X (0x2) emits one
    event with polarity in bit 11; VECT_BASE_X (0x3) sets base+polarity;
    VECT_12 (0x4) emits set lanes [base, base+12) then advances the
    base by 12; VECT_8 (0x5) uses 8 lanes and advances by 8."""
    words = np.array(
        [
            _evt3(0x8, 0x001),  # TIME_HIGH = 1
            _evt3(0x6, 0x0FE),  # TIME_LOW = 254  -> t = 4096 + 254
            _evt3(0x0, 321),  # row = 321
            _evt3(0x2, (1 << 11) | 100),  # single ON event at x=100
            _evt3(0x3, 512),  # vect base x=512, polarity OFF
            _evt3(0x4, 0b100000000101),  # VECT_12: lanes 0,2,11
            _evt3(0x5, 0b10000001),  # VECT_8: lanes 0,7 (base now 524)
            _evt3(0x6, 0x0FF),  # TIME_LOW = 255
            _evt3(0x2, 45),  # single OFF event at x=45
        ],
        dtype=np.uint16,
    )
    exp_x = [100, 512, 514, 523, 524, 531, 45]
    exp_y = [321] * 7
    exp_t = [4350, 4350, 4350, 4350, 4350, 4350, 4351]
    exp_p = [1, 0, 0, 0, 0, 0, 0]
    for name, dec in _decoders_evt3():
        x, y, t, p = dec(words)
        np.testing.assert_array_equal(x, exp_x, err_msg=name)
        np.testing.assert_array_equal(y, exp_y)
        np.testing.assert_array_equal(t, exp_t)
        np.testing.assert_array_equal(p, exp_p)


def test_evt3_time_high_rollover():
    """TIME_HIGH decreasing signals a 24-bit epoch rollover: full time
    is epoch<<24 | high<<12 | low."""
    words = np.array(
        [
            _evt3(0x8, 0xFFF),  # TIME_HIGH at max
            _evt3(0x6, 0x005),
            _evt3(0x0, 10),
            _evt3(0x2, 1),  # t = 0xFFF<<12 | 5
            _evt3(0x8, 0x000),  # rollover (high went backward)
            _evt3(0x6, 0x002),
            _evt3(0x2, 2),  # t = 1<<24 | 2
        ],
        dtype=np.uint16,
    )
    exp_t = [(0xFFF << 12) | 5, (1 << 24) | 2]
    for name, dec in _decoders_evt3():
        x, y, t, p = dec(words)
        np.testing.assert_array_equal(t, exp_t, err_msg=name)
        np.testing.assert_array_equal(x, [1, 2])


def test_evt3_vect_before_base_and_y():
    """Vector/single words before any VECT_BASE_X / ADDR_Y use
    zero-initialized registers (decoder must not crash or misalign)."""
    words = np.array(
        [_evt3(0x4, 0b11), _evt3(0x2, 7)],
        dtype=np.uint16,
    )
    for name, dec in _decoders_evt3():
        x, y, t, p = dec(words)
        np.testing.assert_array_equal(x, [0, 1, 7], err_msg=name)
        np.testing.assert_array_equal(y, [0, 0, 0])
        np.testing.assert_array_equal(t, [0, 0, 0])


def test_evt3_raw_file_with_header(tmp_path):
    """End-to-end: a .raw file with the Prophesee ASCII header decodes
    through the loader entry point."""
    from event_based_optical_flow_tpu.data.evt3 import read_raw_evt3

    words = np.array(
        [_evt3(0x8, 0x001), _evt3(0x6, 0x001), _evt3(0x0, 5), _evt3(0x2, 9)],
        dtype=np.uint16,
    )
    header = b"% date 2026-08-19\n% format EVT3;height=720;width=1280\n% end\n"
    path = tmp_path / "stream.raw"
    path.write_bytes(header + words.tobytes())
    x, y, t, p = read_raw_evt3(str(path))
    np.testing.assert_array_equal(x, [9])
    np.testing.assert_array_equal(y, [5])
    np.testing.assert_array_equal(t, [4097])
