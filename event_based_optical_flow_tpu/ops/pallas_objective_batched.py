"""Natively batched variant of the fused CMax rasterizer.

Same math as ops/pallas_objective.py but over a leading frame axis with a
(B, chunks) grid — one kernel launch rasterizes every frame of a fleet.
vmap cannot be used over pallas_call here (grid contexts don't nest), so
batching is expressed in the grid itself; the kernel body is shared with
the single-frame module.

Used by the batched objective (solver/fleet.py) that powers
multi-frame-at-once evaluation when warm-start chaining is disabled.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_objective import (
    _CHUNK,
    _bwd_kernel,
    _fwd_kernel,
    _round_up,
)

Array = jax.Array


def _pad_rows_batched(arrs, n_pad, fills):
    out = []
    for a, fill in zip(arrs, fills):
        b, n = a.shape
        pad = n_pad - n
        if pad:
            a = jnp.concatenate([a, jnp.full((b, pad), fill, a.dtype)], axis=1)
        out.append(a.reshape(b, n_pad // _CHUNK, 1, _CHUNK))
    return out


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _specs(hp, wp, k_total):
    row = pl.BlockSpec((None, None, 1, _CHUNK), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    flow = pl.BlockSpec((None, 2, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((None, k_total, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    return row, flow, out


def _fwd_impl_batched(flow, x, y, dtf, wt, image_size, offsets, include_orig, eps, use_bf16):
    bsz, n = x.shape
    h, w = image_size
    hp = _round_up(h + 1, 8)
    wp = _round_up(w + 1, 128)
    n_pad = _round_up(n, _CHUNK)
    x2, y2, d2, w2 = _pad_rows_batched([x, y, dtf, wt], n_pad, [-10.0, -10.0, 0.0, 0.0])
    flow_p = jnp.zeros((bsz, 2, hp, wp), flow.dtype).at[:, :, :h, :w].set(flow)
    k_total = len(offsets) + (1 if include_orig else 0)
    grid = (bsz, n_pad // _CHUNK)
    row, flow_spec, out_spec = _specs(hp, wp, k_total)

    fwd_body = functools.partial(
        _fwd_kernel,
        hp=hp, wp=wp, eps=eps, offsets=offsets,
        include_orig=include_orig, use_bf16=use_bf16, chunk_axis=1,
    )

    out = pl.pallas_call(
        fwd_body,
        grid=grid,
        in_specs=[row, row, row, row, flow_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, k_total, hp, wp), flow.dtype),
        interpret=_interpret(),
    )(x2, y2, d2, w2, flow_p)
    return out[:, :, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_batched(flow, x, y, dtf, wt, image_size, offsets, include_orig, eps, use_bf16):
    return _fwd_impl_batched(flow, x, y, dtf, wt, image_size, offsets, include_orig, eps, use_bf16)


def _vjp_fwd(flow, x, y, dtf, wt, image_size, offsets, include_orig, eps, use_bf16):
    out = _fwd_impl_batched(flow, x, y, dtf, wt, image_size, offsets, include_orig, eps, use_bf16)
    return out, (flow, x, y, dtf, wt)


def _vjp_bwd(image_size, offsets, include_orig, eps, use_bf16, res, g):
    flow, x, y, dtf, wt = res
    bsz, n = x.shape
    h, w = image_size
    hp = _round_up(h + 1, 8)
    wp = _round_up(w + 1, 128)
    n_pad = _round_up(n, _CHUNK)
    x2, y2, d2, w2 = _pad_rows_batched([x, y, dtf, wt], n_pad, [-10.0, -10.0, 0.0, 0.0])
    flow_p = jnp.zeros((bsz, 2, hp, wp), flow.dtype).at[:, :, :h, :w].set(flow)
    k_total = g.shape[1]
    g_p = jnp.zeros((bsz, k_total, hp, wp), g.dtype).at[:, :, :h, :w].set(g)
    grid = (bsz, n_pad // _CHUNK)
    row, flow_spec, _ = _specs(hp, wp, k_total)
    g_spec = pl.BlockSpec((None, k_total, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    dflow_spec = pl.BlockSpec((None, 2, hp, wp), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)

    bwd_body = functools.partial(
        _bwd_kernel,
        hp=hp, wp=wp, eps=eps, offsets=offsets,
        include_orig=include_orig, use_bf16=use_bf16, chunk_axis=1,
    )

    dflow_p = pl.pallas_call(
        bwd_body,
        grid=grid,
        in_specs=[row, row, row, row, flow_spec, g_spec],
        out_specs=dflow_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, 2, hp, wp), flow.dtype),
        interpret=_interpret(),
    )(x2, y2, d2, w2, flow_p, g_p)
    dflow = dflow_p[:, :, :h, :w]
    z = jnp.zeros_like
    return dflow, z(x), z(y), z(dtf), z(wt)


_fused_batched.defvjp(_vjp_fwd, _vjp_bwd)


def fused_multi_iwe_batched(
    events: Array,
    flow: Array,
    image_size: Tuple[int, int],
    offsets: Tuple[float, ...] = (0.0, 1.0, 0.5),
    weights: Optional[Array] = None,
    include_orig: bool = True,
    eps: float = 1e-6,
    use_bf16: bool = True,
) -> Array:
    """events [B, N, 4], flow [B, 2, H, W] ->
    [B, (orig?) + len(offsets), H, W] raw IWEs, one kernel launch."""
    t = events[..., 2]
    if weights is None:
        weights = jnp.ones_like(t)
    big = jnp.finfo(t.dtype).max
    t_min = jnp.min(jnp.where(weights > 0, t, big), axis=1, keepdims=True)
    t_max = jnp.max(jnp.where(weights > 0, t, -big), axis=1, keepdims=True)
    span = jnp.where(t_max > t_min, t_max - t_min, 1.0)
    dtf = (t - t_min) / span
    return _fused_batched(
        flow, events[..., 0], events[..., 1], dtf, weights,
        tuple(image_size), tuple(offsets), include_orig, eps, use_bf16,
    )
