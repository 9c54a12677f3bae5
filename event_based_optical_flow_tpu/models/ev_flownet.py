"""EV-FlowNet (Zhu et al.) in flax.linen, NHWC.

Architecture parity with the reference torch port
(ref src/solver/nnmodels/ev_flownet.py): 4 stride-2 encoders
(64/128/256/512 ch), 2 residual transition blocks, 4 decoder stages each
predicting a 2-channel flow at increasing resolution (tanh * scale) whose
output is concatenated into the next stage's input together with the
encoder skip.  Returns {"flow0" (coarsest) ... "flow3" (full res)} with
flow channels (height, width) to match the framework convention.
"""

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .basic_layers import ConvBlock, ResidualBlock, UpsampleConvAndPredict

_BASE_CHANNELS = 64


class EVFlowNet(nn.Module):
    n_bin: int = 4
    scale_time: float = 128.0
    use_norm: bool = False

    @nn.compact
    def __call__(self, voxel: jax.Array) -> Dict[str, jax.Array]:
        """voxel: [B, H, W, n_bin] event voxel grid (H, W divisible by 16).

        Returns flow dict; flow arrays are [B, 2, h, w] (channel-first to
        match the rest of the framework)."""
        x = voxel
        skips = []
        for mult in (1, 2, 4, 8):
            x = ConvBlock(mult * _BASE_CHANNELS, use_norm=self.use_norm)(x)
            skips.append(x)

        x = ResidualBlock(8 * _BASE_CHANNELS, self.use_norm)(x)
        x = ResidualBlock(8 * _BASE_CHANNELS, self.use_norm)(x)

        flows = {}
        for i, mult in enumerate((4, 2, 1, 0.5)):
            x = jnp.concatenate([x, skips[3 - i]], axis=-1)
            x, flow = UpsampleConvAndPredict(
                int(mult * _BASE_CHANNELS), scale=self.scale_time, use_norm=self.use_norm
            )(x)
            flows[f"flow{i}"] = jnp.transpose(flow, (0, 3, 1, 2))
        return flows


def events_to_voxel_grid(
    events: jax.Array,
    image_size,
    n_bin: int = 4,
    weights=None,
) -> jax.Array:
    """Rasterize events into a [H, W, n_bin] time-binned voxel grid
    (polarity-signed bilinear votes per temporal bin) — the standard
    EV-FlowNet input representation, built on the MXU rasterizer."""
    from ..ops.iwe import bilinear_vote
    from ..ops.warp import _masked_max, _masked_min

    t = events[:, 2]
    t_min = _masked_min(t, weights)
    t_max = _masked_max(t, weights)
    span = jnp.where(t_max > t_min, t_max - t_min, 1.0)
    pos = (t - t_min) / span * n_bin
    pol = jnp.where(events[:, 3] > 0, 1.0, -1.0).astype(events.dtype)
    base_w = pol if weights is None else pol * weights

    planes = []
    for b in range(n_bin):
        # temporal bilinear weight of each event for bin b
        w_b = jnp.maximum(0.0, 1.0 - jnp.abs(pos - 0.5 - b))
        planes.append(bilinear_vote(events, tuple(image_size), weight=base_w * w_b))
    return jnp.stack(planes, axis=-1)
