"""Event warping under different motion models.

Parity target: reference ``src/warp.py``.  Motion models:

* ``"2d-translation"`` / ``"rigid-optical-flow"`` — global 2-DoF
  translation: ``x' = x + dt * tx`` (sign per ref warp.py:512-514).
* ``"dense-flow"`` — per-pixel flow [2, H, W]: ``x' = x - dt * u(x, y)``
  gathered at the (integer) original event position (ref warp.py:263-313).
* ``"dense-flow-voxel"`` — time-binned flow [T, 2, H, W]; events are
  bucketed by dt into T bins (edges per ref warp.py:344-345) and each
  bucket gathers from its own flow slice (ref warp.py:315-396).  The
  reference masks-and-loops per bin; here the bin id is computed in
  closed form and the gather is a single vectorized lookup — identical
  result, one kernel.

All functions accept an optional per-event ``weights`` mask so padded
buffers keep batch statistics (reference times are masked min/max).
Warped events carry ``dt`` in the time column, as in the reference.
"""

from typing import Optional, Tuple, Union

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MOTION_MODELS = (
    "2d-translation",
    "rigid-optical-flow",
    "4-param-similarity",
    "3-rotation",
    "dense-flow",
    "dense-flow-voxel",
)


def calib_tuple(image_size: Tuple[int, int], calib_param=None) -> Tuple[float, float, float, float]:
    """(f_row, f_col, c_row, c_col) from a calibration dict with a 3x3
    ``K`` (OpenCV convention: K[0,0]=f_col, K[0,2]=c_col, K[1,1]=f_row,
    K[1,2]=c_row — our event x axis is the image ROW).  Without calib a
    generic pinhole is assumed: f = (H+W)/2 (a ~60 deg FOV), principal
    point at the image center."""
    if calib_param and "K" in calib_param:
        K = np.asarray(calib_param["K"], dtype=np.float64)
        return float(K[1, 1]), float(K[0, 0]), float(K[1, 2]), float(K[0, 2])
    h, w = image_size
    f = (h + w) / 2.0
    return f, f, (h - 1) / 2.0, (w - 1) / 2.0


def _masked_min(x: Array, weights: Optional[Array]) -> Array:
    if weights is None:
        return jnp.min(x, axis=-1)
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    return jnp.min(jnp.where(weights > 0, x, big), axis=-1)


def _masked_max(x: Array, weights: Optional[Array]) -> Array:
    if weights is None:
        return jnp.max(x, axis=-1)
    small = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
    return jnp.max(jnp.where(weights > 0, x, small), axis=-1)


def calculate_reftime(
    events: Array,
    direction: Union[str, float] = "first",
    weights: Optional[Array] = None,
    rng: Optional[np.random.Generator] = None,
) -> Array:
    """Reference time for the warp (ref warp.py:201-233).

    ``direction``: float in the [0, 1] convention, or one of
    'first' | 'middle' | 'last' | 'random' | 'before' (-1.0) | 'after' (2.0).
    """
    t = events[..., 2]
    tmin = _masked_min(t, weights)
    tmax = _masked_max(t, weights)
    if isinstance(direction, float):
        return tmin + (tmax - tmin) * direction
    if direction == "first":
        return tmin
    if direction == "middle":
        return tmin + (tmax - tmin) * 0.5
    if direction == "last":
        return tmax
    if direction == "random":
        r = (rng or np.random.default_rng()).uniform(0.0, 1.0)
        return tmin + (tmax - tmin) * float(r)
    if direction == "before":
        return tmin + (tmax - tmin) * -1.0
    if direction == "after":
        return tmin + (tmax - tmin) * 2.0
    raise ValueError(f"direction should be first/middle/last/random/before/after or float, got {direction}")


def calculate_dt(
    events: Array,
    reference_time: Array,
    normalize_t: bool,
    time_period: Optional[Array] = None,
    weights: Optional[Array] = None,
) -> Array:
    """dt = t - ref, optionally normalized so max-min = 1 (ref warp.py:235-259)."""
    t = events[..., 2]
    ref = jnp.asarray(reference_time, t.dtype)
    if ref.ndim == t.ndim - 1:
        ref = ref[..., None]
    dt = t - ref
    if normalize_t:
        if time_period is None:
            period = _masked_max(dt, weights) - _masked_min(dt, weights)
        else:
            period = jnp.asarray(time_period, t.dtype)
        if jnp.ndim(period) == t.ndim - 1:
            period = period[..., None]
        dt = dt / period
    return dt


def _replace_xy_t(events: Array, x: Array, y: Array, dt: Array) -> Array:
    return jnp.stack([x, y, dt, events[..., 3]], axis=-1)


def warp_2dof(
    events: Array,
    translation: Array,
    reference_time: Array,
    normalize_t: bool = False,
    time_period: Optional[Array] = None,
    weights: Optional[Array] = None,
) -> Array:
    """Global 2-DoF translation warp: x' = x + dt*tx, y' = y + dt*ty
    (plus sign: translation pose -> flow sign flip x warp sign flip,
    ref warp.py:483-522)."""
    dt = calculate_dt(events, reference_time, normalize_t, time_period, weights)
    tx = translation[..., 0]
    ty = translation[..., 1]
    if jnp.ndim(tx) == events.ndim - 2:  # batched translation [b, 2] with [b, n, 4] events
        tx = tx[..., None]
        ty = ty[..., None]
    x = events[..., 0] + dt * tx
    y = events[..., 1] + dt * ty
    return _replace_xy_t(events, x, y, dt)


def _gather_flow_at_events(flow: Array, events: Array, image_size: Tuple[int, int]) -> Tuple[Array, Array]:
    """Gather (u, v) from a [2, H, W] flow at integer event positions."""
    h, w = image_size
    ix = jnp.clip(events[..., 0].astype(jnp.int32), 0, h - 1)
    iy = jnp.clip(events[..., 1].astype(jnp.int32), 0, w - 1)
    flat = flow.reshape(2, -1)
    lin = ix * w + iy
    return flat[0, lin], flat[1, lin]


def warp_dense_flow(
    events: Array,
    flow: Array,
    reference_time: Array,
    image_size: Tuple[int, int],
    normalize_t: bool = False,
    weights: Optional[Array] = None,
) -> Array:
    """Dense-flow warp: x' = x - dt * flow[0, x, y] (ref warp.py:263-313)."""
    dt = calculate_dt(events, reference_time, normalize_t, weights=weights)
    if events.ndim == 3:
        return jax.vmap(lambda e, f, d: _warp_dense_single(e, f, d, image_size))(events, flow, dt)
    return _warp_dense_single(events, flow, dt, image_size)


def _warp_dense_single(events, flow, dt, image_size):
    u, v = _gather_flow_at_events(flow, events, image_size)
    x = events[..., 0] - dt * u
    y = events[..., 1] - dt * v
    return _replace_xy_t(events, x, y, dt)


def warp_voxel_flow(
    events: Array,
    flow_voxel: Array,
    reference_time: Array,
    image_size: Tuple[int, int],
    normalize_t: bool = False,
    weights: Optional[Array] = None,
) -> Array:
    """Time-aware warp with a [T, 2, H, W] flow voxel (ref warp.py:315-396).

    Bin edges are ``t_min + k/T * (t_max - t_min)`` for k=0..T-1 with the
    last bin open-ended; the reference loops bins with masks, we compute
    the bin id directly: ``clip(floor((dt - t_min)/(t_max - t_min) * T))``.
    """
    dt = calculate_dt(events, reference_time, normalize_t, weights=weights)
    if events.ndim == 3:
        return jax.vmap(
            lambda e, f, d, wgt: _warp_voxel_single(e, f, d, image_size, wgt)
        )(events, flow_voxel, dt, weights if weights is not None else jnp.ones_like(dt))
    return _warp_voxel_single(events, flow_voxel, dt, image_size, weights)


def _warp_voxel_single(events, flow_voxel, dt, image_size, weights):
    n_bins = flow_voxel.shape[0]
    h, w = image_size
    t_min = _masked_min(dt, weights)
    t_max = _masked_max(dt, weights)
    span = jnp.where(t_max > t_min, t_max - t_min, 1.0)
    bin_id = jnp.clip(
        jnp.floor((dt - t_min) / span * n_bins).astype(jnp.int32), 0, n_bins - 1
    )
    ix = jnp.clip(events[..., 0].astype(jnp.int32), 0, h - 1)
    iy = jnp.clip(events[..., 1].astype(jnp.int32), 0, w - 1)
    flat = flow_voxel.reshape(n_bins, 2, -1)
    lin = ix * w + iy
    u = flat[bin_id, 0, lin]
    v = flat[bin_id, 1, lin]
    x = events[..., 0] - dt * u
    y = events[..., 1] - dt * v
    return _replace_xy_t(events, x, y, dt)


def _gather_uv_fwd_impl(flow_flat: Array, lin: Array):
    return flow_flat[0, lin], flow_flat[1, lin]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_uv(flow_flat: Array, lin: Array, image_size: Tuple[int, int]):
    """(u, v) = flow at per-event linear pixel indices, with a TPU-friendly
    backward: the cotangent scatter d flow[p] += du[n] (an XLA scatter-add,
    slow on TPU) is expressed as a bilinear vote at the integer event
    pixels — exactly the rasterizer's single-corner case — so it runs on
    the MXU (pallas on TPU, matmul elsewhere)."""
    return _gather_uv_fwd_impl(flow_flat, lin)


def _gather_uv_fwd(flow_flat, lin, image_size):
    return _gather_uv_fwd_impl(flow_flat, lin), lin


def _gather_uv_bwd(image_size, lin, cotangents):
    from ..ops.iwe import bilinear_vote

    du, dv = cotangents
    h, w = image_size
    ix = (lin // w).astype(du.dtype)
    iy = (lin % w).astype(du.dtype)
    pseudo_events = jnp.stack([ix, iy, jnp.zeros_like(ix), jnp.zeros_like(ix)], axis=-1)
    dflow0 = bilinear_vote(pseudo_events, image_size, weight=du, eps=0.0)
    dflow1 = bilinear_vote(pseudo_events, image_size, weight=dv, eps=0.0)
    dflow_flat = jnp.stack([dflow0.reshape(-1), dflow1.reshape(-1)])
    return (dflow_flat, None)


_gather_uv.defvjp(_gather_uv_fwd, _gather_uv_bwd)


def multi_direction_dense_warp(
    events: Array,
    flow: Array,
    directions,
    image_size: Tuple[int, int],
    weights: Optional[Array] = None,
    time_aware: bool = False,
):
    """Warp one event set to several reference times with a SINGLE flow
    gather.

    The reference assembles its multi-focal cost by calling the warp once
    per direction (first/last/middle — ref patch_contrast_base.py:289-352),
    re-gathering the same per-event flow each time.  The gathered (u, v)
    depend only on the integer event position (and, for the time-aware
    voxel, the time-bin id, which is shift-invariant across reference
    times), so one gather serves every direction.  On TPU the gather is
    the expensive part, so this is a ~3x saving on the warp stage.

    Args:
        flow: [2, H, W] (time_aware=False) or [T, 2, H, W].
        directions: iterable of floats in the [0, 1] reftime convention
            (0 = first, 0.5 = middle, 1 = last).  normalize_t semantics
            (dt scaled so max-min = 1) are built in, matching the solver's
            ``normalize_t_in_batch``.

    Returns:
        list of warped event arrays, one per direction.
    """
    h, w = image_size
    t = events[..., 2]
    t_min = _masked_min(t, weights)
    t_max = _masked_max(t, weights)
    span = jnp.where(t_max > t_min, t_max - t_min, 1.0)

    ix = jnp.clip(events[..., 0].astype(jnp.int32), 0, h - 1)
    iy = jnp.clip(events[..., 1].astype(jnp.int32), 0, w - 1)
    lin = ix * w + iy
    if time_aware:
        n_bins = flow.shape[0]
        rel = (t - t_min) / span  # in [0, 1]; bin id is reftime-invariant
        bin_id = jnp.clip(jnp.floor(rel * n_bins).astype(jnp.int32), 0, n_bins - 1)
        flat = flow.reshape(n_bins, 2, -1)
        u = flat[bin_id, 0, lin]
        v = flat[bin_id, 1, lin]
    else:
        u, v = _gather_uv(flow.reshape(2, -1), lin, (h, w))

    out = []
    for d in directions:
        ref = t_min + (t_max - t_min) * d
        dt = (t - ref) / span
        out.append(_replace_xy_t(events, events[..., 0] - dt * u, events[..., 1] - dt * v, dt))
    return out


def warp_voxel_flow_streaming(
    events: Array,
    flow0: Array,
    n_time_bin: int,
    reference_time: Array,
    image_size: Tuple[int, int],
    normalize_t: bool = False,
    weights: Optional[Array] = None,
    scheme: str = "burgers",
) -> Array:
    """Memory-lean time-aware warp: propagate the [2, H, W] flow bin-by-bin
    (Burgers/upwind) inside a ``lax.scan`` and warp each time-bin's events
    with the current field — never materializing the [T, 2, H, W] voxel.

    Parity target: reference ``warp_event_from_optical_flow_voxel_optimized``
    (ref warp.py:398-481), which is latent-broken upstream (references a
    nonexistent ``self.feature_base``, unreachable from shipped configs).
    Reference semantics kept: the flow is propagated once *before* the
    first bin is consumed, so bin k uses the (k+1)-step propagated field
    (unlike ``construct_dense_flow_voxel(t0_location='first')`` whose bin 0
    is the unpropagated flow).
    """
    from ..flow.voxel import burgers_step, upwind_step

    h, w = image_size
    dt = calculate_dt(events, reference_time, normalize_t, weights=weights)
    t_min = _masked_min(dt, weights)
    t_max = _masked_max(dt, weights)
    span = jnp.where(t_max > t_min, t_max - t_min, 1.0)
    bin_id = jnp.clip(jnp.floor((dt - t_min) / span * n_time_bin).astype(jnp.int32), 0, n_time_bin - 1)
    ix = jnp.clip(events[..., 0].astype(jnp.int32), 0, h - 1)
    iy = jnp.clip(events[..., 1].astype(jnp.int32), 0, w - 1)
    lin = ix * w + iy
    step = burgers_step if scheme == "burgers" else upwind_step
    delta_t = 1.0 / n_time_bin

    def body(carry_flow, k):
        propagated = step(carry_flow, delta_t)
        flat = propagated.reshape(2, -1)
        in_bin = (bin_id == k).astype(events.dtype)
        u = flat[0, lin] * in_bin
        v = flat[1, lin] * in_bin
        return propagated, (u, v)

    _, (us, vs) = jax.lax.scan(body, flow0, jnp.arange(n_time_bin))
    u = jnp.sum(us, axis=0)
    v = jnp.sum(vs, axis=0)
    x = events[..., 0] - dt * u
    y = events[..., 1] - dt * v
    return _replace_xy_t(events, x, y, dt)


def flow_from_2d_translation(motion: Array, image_size: Tuple[int, int]) -> Array:
    """Dense [2, H, W] flow equivalent of a 2-DoF translation.

    The reference computes this numerically by warping a synthetic pixel
    grid and negating the displacement (ref warp.py:130-153); with the
    2-DoF warp that is analytically flow = -(tx, ty) broadcast.
    """
    h, w = image_size
    return jnp.broadcast_to((-motion)[..., :, None, None], motion.shape[:-1] + (2, h, w))


def flow_from_similarity(motion: Array, image_size: Tuple[int, int]) -> Array:
    """Dense [2, H, W] flow of a 4-DoF similarity motion about the image
    center: motion = (tx, ty, rot [rad/s], zoom [1/s]).

    New capability (ego-motion/rotational sequences, e.g. ECD): the
    reference stripped its rotational models (its "rigid-optical-flow" is
    an alias of 2d-translation, ref warp.py:77,108).  Convention matches
    2d-translation: the warp advects events with velocity g(p) =
    (tx, ty) + rot*perp(p-c) + zoom*(p-c), and the equivalent dense flow
    is -g (ref warp.py:149-150 sign flip), so every term is linear in the
    parameters (motion * timescale scales the flow exactly)."""
    h, w = image_size
    cx, cy = (h - 1) / 2.0, (w - 1) / 2.0
    rx = jnp.arange(h, dtype=motion.dtype)[:, None] - cx  # [H, 1]
    ry = jnp.arange(w, dtype=motion.dtype)[None, :] - cy  # [1, W]
    tx, ty, om, zm = motion[..., 0], motion[..., 1], motion[..., 2], motion[..., 3]
    ex = lambda a: a[..., None, None]
    gx = ex(tx) - ex(om) * ry + ex(zm) * rx  # broadcasts to [..., H, W]
    gy = ex(ty) + ex(om) * rx + ex(zm) * ry
    shape = motion.shape[:-1] + (2, h, w)
    return -jnp.stack([jnp.broadcast_to(gx, shape[:-3] + (h, w)),
                       jnp.broadcast_to(gy, shape[:-3] + (h, w))], axis=-3)


def flow_from_rotation(
    motion: Array,
    image_size: Tuple[int, int],
    calib: Tuple[float, float, float, float],
) -> Array:
    """Dense [2, H, W] flow of a calibrated 3-DoF camera rotation,
    motion = (rot_x, rot_y, rot_z) [rad/s].

    New capability for ego-rotation sequences (the classic CMax rotation
    estimation problem, Gallego CVPR'18; the reference stripped every
    rotational model from its public release — its "rigid-optical-flow"
    aliases 2d-translation, ref warp.py:77,108).

    Geometry: camera frame z forward, x right (= image column), y down
    (= image row); the camera rotates with angular velocity omega, a
    fixed scene direction ray satisfies ray' = -omega x ray, and the
    induced pixel velocity is the rotational interaction matrix
        udot = f_c [ X Y wx - (1 + X^2) wy + Y wz ]   (column px/s)
        vdot = f_r [ (1 + Y^2) wx - X Y wy - X wz ]   (row px/s)
    with X = (c - c_col)/f_col, Y = (r - c_row)/f_row.  As everywhere in
    this framework, events advect with +g and the dense flow is -g (see
    flow_from_2d_translation's sign note; ref warp.py:149-150)."""
    h, w = image_size
    f_r, f_c, c_r, c_c = calib
    Y = (jnp.arange(h, dtype=motion.dtype)[:, None] - c_r) / f_r  # [H, 1]
    X = (jnp.arange(w, dtype=motion.dtype)[None, :] - c_c) / f_c  # [1, W]
    wx, wy, wz = motion[..., 0], motion[..., 1], motion[..., 2]
    ex = lambda a: a[..., None, None]
    g_col = f_c * (X * Y * ex(wx) - (1.0 + X * X) * ex(wy) + Y * ex(wz))
    g_row = f_r * ((1.0 + Y * Y) * ex(wx) - X * Y * ex(wy) - X * ex(wz))
    shape = motion.shape[:-1] + (2, h, w)
    return -jnp.stack(
        [jnp.broadcast_to(g_row, shape[:-3] + (h, w)),
         jnp.broadcast_to(g_col, shape[:-3] + (h, w))], axis=-3)


class Warp:
    """Facade mirroring the reference ``Warp`` class (ref warp.py:24-62)."""

    def __init__(
        self,
        image_size: Tuple[int, int],
        calculate_feature: bool = False,  # feature path is a stub upstream too
        normalize_t: bool = False,
        calib_param=None,
    ):
        self.image_size = tuple(image_size)
        self.normalize_t = normalize_t
        self.calib_param = calib_param

    def get_key_names(self, motion_model: str):
        if motion_model in ("dense-flow", "2d-translation", "rigid-optical-flow"):
            return ["trans_x", "trans_y"]
        if motion_model == "4-param-similarity":
            return ["trans_x", "trans_y", "rot", "zoom"]
        if motion_model == "3-rotation":
            return ["rot_x", "rot_y", "rot_z"]
        raise ValueError(f"motion model {motion_model!r} not supported")

    def get_motion_vector_size(self, motion_model: str) -> int:
        return len(self.get_key_names(motion_model))

    def motion_model_to_motion(self, motion_model: str, params: dict) -> np.ndarray:
        if motion_model == "dense-flow":
            motion = np.array([params["trans_x"], params["trans_y"]])
            return np.asarray(flow_from_2d_translation(jnp.asarray(motion), self.image_size))
        if motion_model in ("2d-translation", "rigid-optical-flow"):
            return np.array([params["trans_x"], params["trans_y"]])
        if motion_model == "4-param-similarity":
            return np.array([params["trans_x"], params["trans_y"], params["rot"], params["zoom"]])
        if motion_model == "3-rotation":
            return np.array([params["rot_x"], params["rot_y"], params["rot_z"]])
        raise ValueError(f"motion model {motion_model!r} not supported")

    def motion_model_from_motion(self, motion, motion_model: str) -> dict:
        if motion_model in ("dense-flow", "2d-translation", "rigid-optical-flow"):
            return {"trans_x": motion[0], "trans_y": motion[1]}
        if motion_model == "4-param-similarity":
            return {"trans_x": motion[0], "trans_y": motion[1], "rot": motion[2], "zoom": motion[3]}
        if motion_model == "3-rotation":
            return {"rot_x": motion[0], "rot_y": motion[1], "rot_z": motion[2]}
        raise ValueError(f"motion model {motion_model!r} not supported")

    def get_flow_from_motion(self, motion, motion_model: str):
        if motion_model in ("2d-translation", "rigid-optical-flow"):
            return flow_from_2d_translation(jnp.asarray(motion), self.image_size)
        if motion_model == "4-param-similarity":
            return flow_from_similarity(jnp.asarray(motion), self.image_size)
        if motion_model == "3-rotation":
            return flow_from_rotation(
                jnp.asarray(motion), self.image_size,
                calib_tuple(self.image_size, self.calib_param))
        raise ValueError(f"motion model {motion_model!r} not supported")

    def warp_event(
        self,
        events: Array,
        motion: Array,
        motion_model: str,
        direction: Union[str, float] = "first",
        weights: Optional[Array] = None,
    ):
        """Dispatch per motion model (ref warp.py:156-199).  Returns the
        warped events (the reference also returns a feature dict from a
        mock calculator; we drop that dead surface)."""
        ref_time = calculate_reftime(events, direction, weights)
        motion = jnp.asarray(motion)
        if motion_model == "dense-flow":
            return warp_dense_flow(events, motion, ref_time, self.image_size, self.normalize_t, weights)
        if motion_model == "dense-flow-voxel":
            return warp_voxel_flow(events, motion, ref_time, self.image_size, self.normalize_t, weights)
        if motion_model in ("2d-translation", "rigid-optical-flow"):
            return warp_2dof(events, motion, ref_time, self.normalize_t, weights=weights)
        if motion_model == "4-param-similarity":
            flow = flow_from_similarity(motion, self.image_size)
            return warp_dense_flow(events, flow, ref_time, self.image_size, self.normalize_t, weights)
        if motion_model == "3-rotation":
            flow = flow_from_rotation(
                motion, self.image_size, calib_tuple(self.image_size, self.calib_param))
            return warp_dense_flow(events, flow, ref_time, self.image_size, self.normalize_t, weights)
        raise ValueError(f"motion model {motion_model!r} not supported")
