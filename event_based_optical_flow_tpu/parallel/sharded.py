"""Sharded CMax kernels over a jax device mesh.

Layout: a 2-D mesh ("data", "event").  Frames (event windows) shard over
"data"; within a frame, events shard over "event" and each device
rasterizes a partial IWE that is reduced with ``psum`` — valid because
bilinear voting is an associative sum.  Time statistics (masked t_min /
t_max) are global per frame, so they use pmin/pmax over the event axis.
Collectives stay on ICI; nothing here assumes a host round-trip.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..costs import functional as F
from ..ops.blur import gaussian_blur3
from ..ops.interp import tile_to_dense_flow
from ..ops.iwe import bilinear_vote

from ..costs.functional import nan_to_penalty

Array = jax.Array


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    event: int = 1,
) -> Mesh:
    """Build a ("data", "event") mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if data is None:
        data = n_devices // event
    assert data * event == n_devices, f"{data}x{event} != {n_devices}"
    dev_array = np.array(devices[:n_devices]).reshape(data, event)
    return Mesh(dev_array, ("data", "event"))


def _masked_stats_sharded(t: Array, weights: Array):
    """Global (t_min, t_max) of one frame across event shards."""
    big = jnp.finfo(t.dtype).max
    t_min = jax.lax.pmin(jnp.min(jnp.where(weights > 0, t, big)), "event")
    t_max = jax.lax.pmax(jnp.max(jnp.where(weights > 0, t, -big)), "event")
    return t_min, t_max


def _partial_iwe(events: Array, weights: Array, image_size, blur_sigma: float):
    """Per-shard partial bilinear IWE, psum'ed to the full frame IWE; blur
    applied after the reduction (blur is linear, but applying it once on
    the reduced image matches the single-device pipeline exactly)."""
    partial_img = bilinear_vote(events, image_size, weight=weights)
    full = jax.lax.psum(partial_img, "event")
    if blur_sigma > 0:
        full = gaussian_blur3(full, blur_sigma)
    return full


def sharded_iwe(events: Array, weights: Array, image_size, mesh: Mesh, blur_sigma: float = 0.0):
    """Event-sharded IWE of a single frame: events [N, 4] sharded over the
    "event" axis; returns the replicated [H, W] image."""

    def body(ev_blk, w_blk):
        return _partial_iwe(ev_blk, w_blk, tuple(image_size), blur_sigma)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("event", None), P("event")),
        out_specs=P(),
    )(events, weights)


def sharded_multifocal_loss(
    motion: Array,
    events: Array,
    weights: Array,
    image_size: Tuple[int, int],
    patch_image_size: Tuple[int, int],
    patch_size: Tuple[int, int],
    sliding_window: Tuple[int, int],
    patch_shift: Tuple[int, int] = (0, 0),
    blur_sigma: float = 1.0,
    tv_weight: float = 0.01,
):
    """One frame's hybrid CMax loss with events sharded over "event".

    Must run inside shard_map with an "event" axis.  The three warps are
    computed per shard on local events; the four IWEs are psum-reduced;
    the scalar cost is computed redundantly on every shard (cheap) so the
    loss — and its gradient w.r.t. the replicated tile motion — is
    identical on all event shards.
    """
    h, w = image_size
    t = events[:, 2]
    t_min, t_max = _masked_stats_sharded(t, weights)
    span = jnp.where(t_max > t_min, t_max - t_min, 1.0)
    t_scale = t_max - t_min

    dense = tile_to_dense_flow(
        motion, patch_image_size, image_size, patch_size, sliding_window, patch_shift
    ) * t_scale

    ix = jnp.clip(events[:, 0].astype(jnp.int32), 0, h - 1)
    iy = jnp.clip(events[:, 1].astype(jnp.int32), 0, w - 1)
    flat = dense.reshape(2, -1)
    lin = ix * w + iy
    u = flat[0, lin]
    v = flat[1, lin]

    def warp_to(ref):
        dt = (t - ref) / span
        warped = jnp.stack([events[:, 0] - dt * u, events[:, 1] - dt * v, dt, events[:, 3]], axis=1)
        return _partial_iwe(warped, weights, image_size, blur_sigma)

    orig = _partial_iwe(events, weights, image_size, blur_sigma)
    bwd = warp_to(t_min)
    fwd = warp_to(t_max)
    mid = warp_to((t_min + t_max) * 0.5)
    loss = F.multi_focal_normalized_gradient_magnitude(orig, fwd, bwd, mid, omit_boundary=True)
    loss = loss + tv_weight * F.total_variation(motion.reshape((2,) + tuple(patch_image_size)))
    return nan_to_penalty(loss)


def pad_chunks_for_sharding(packed, n_shards: int):
    """Pad a banded packing (x, y, dtf, wt, band_ids) to a chunk count
    divisible by ``n_shards`` — extra chunks are empty (sentinel coords,
    zero weights) and therefore inert in every vote and gradient.  Works
    for both the dense layout ([G, 1, C], chunk axis 0) and the voxel
    layout ([T, G, 1, C], chunk axis 1)."""
    x, y, dtf, wt, bands = packed
    axis = 0 if x.ndim == 3 else 1
    g = x.shape[axis]
    g_pad = -(-g // n_shards) * n_shards
    if g_pad == g:
        return packed

    def pad_to(a, fill):
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, g_pad - g)
        return np.pad(a, widths, constant_values=fill)

    return (
        pad_to(np.asarray(x), -10.0),
        pad_to(np.asarray(y), -10.0),
        pad_to(np.asarray(dtf), 0.0),
        pad_to(np.asarray(wt), 0.0),
        pad_to(np.asarray(bands), 0),
    )


def build_objective_banded_sharded(spec, mesh: Mesh):
    """Event-sharded banded CMax objective for frames too large for one
    chip's duty cycle (e.g. DSEC's ~1.5M events/window): the pre-packed
    chunks shard over the mesh's "event" axis, every device rasterizes a
    partial IWE stack with the fused banded (or banded-voxel) kernel, and
    the stacks combine with ``psum`` — bilinear voting is an associative
    sum, so the result equals the single-device kernel exactly.  The
    scalar cost is computed redundantly per shard, so the loss and its
    motion-gradient come out replicated.

    fn(motion, x, y, dtf, wt, bands, t_scale) -> (loss, components); the
    chunk arrays must have their chunk axis divisible by the event-axis
    size (see pad_chunks_for_sharding).

    Thin delegate to ``solver.objective.build_objective_banded(mesh=...)``
    — the same code path the CLI solvers use when a ``parallel:`` config
    block is present, so this function and the product stay in lockstep.
    """
    from ..solver.objective import build_objective_banded

    return build_objective_banded(spec, mesh=mesh)


def build_fleet_step(
    mesh: Mesh,
    image_size: Tuple[int, int],
    patch_image_size: Tuple[int, int],
    patch_size: Tuple[int, int],
    sliding_window: Tuple[int, int],
    lr: float = 0.5,
):
    """Full multi-frame training step under the mesh:

    * frames shard over "data" (each device group owns B/data frames),
    * each frame's events shard over "event" (partial IWEs + psum),
    * per-frame tile motions are optimized with a gradient step; the mean
      loss is psum'ed over "data" for reporting.

    step(motions [B, M], events [B, N, 4], weights [B, N])
        -> (motions', mean_loss)
    Apply ``jax.jit`` with shardings from :func:`fleet_shardings`.
    """

    def per_frame_loss(motion, events, weights):
        return sharded_multifocal_loss(
            motion, events, weights, image_size, patch_image_size, patch_size, sliding_window
        )

    def body(motions_blk, events_blk, weights_blk):
        # motions_blk: [B/d, M]; events_blk: [B/d, N/e, 4]
        def one(motion, ev, wgt):
            loss, grad = jax.value_and_grad(per_frame_loss)(motion, ev, wgt)
            return loss, grad

        losses, grads = jax.vmap(one)(motions_blk, events_blk, weights_blk)
        new_motions = motions_blk - lr * grads
        mean_loss = jax.lax.pmean(jnp.mean(losses), "data")
        return new_motions, mean_loss

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data", None), P("data", "event", None), P("data", "event")),
        out_specs=(P("data", None), P()),
    )
    return jax.jit(sharded)


def fleet_shardings(mesh: Mesh):
    """NamedShardings for (motions, events, weights) of build_fleet_step."""
    return (
        NamedSharding(mesh, P("data", None)),
        NamedSharding(mesh, P("data", "event", None)),
        NamedSharding(mesh, P("data", "event")),
    )
