"""EV-FlowNet building blocks (flax.linen).

Behavioral parity with the reference torch layers
(ref src/solver/nnmodels/basic_layers.py): general_conv2d (conv + ReLU +
optional norm), residual blocks, and the upsample-conv-and-predict-flow
decoder stage (bilinear 2x upsample, reflect-pad 3x3 conv, 1x1 tanh flow
head scaled by ``scale``).  NHWC layout (TPU-native) instead of torch's
NCHW; batch norm is replaced by instance norm to stay stateless/jit-pure
(the shipped reference config uses no_batch_norm anyway).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    """general_conv2d: stride-2 (default) 3x3 conv + activation + opt. norm."""

    features: int
    kernel: int = 3
    strides: int = 2
    use_norm: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel), (self.strides, self.strides))(x)
        if self.activation == "relu":
            x = nn.relu(x)
        elif self.activation == "tanh":
            x = nn.tanh(x)
        if self.use_norm:
            x = nn.GroupNorm(num_groups=None, group_size=1)(x)  # instance norm
        return x


class ResidualBlock(nn.Module):
    """Two stride-1 conv blocks with a skip connection."""

    features: int
    use_norm: bool = False

    @nn.compact
    def __call__(self, x):
        h = ConvBlock(self.features, strides=1, use_norm=self.use_norm)(x)
        h = ConvBlock(self.features, strides=1, use_norm=self.use_norm)(h)
        return h + x


class UpsampleConvAndPredict(nn.Module):
    """Decoder stage: bilinear 2x upsample, reflect-padded 3x3 conv (ReLU),
    then a 1x1 tanh flow head scaled by ``scale``; returns
    (concat(features, flow), flow)."""

    features: int
    scale: float = 256.0
    use_norm: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="linear")
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = nn.Conv(self.features, (3, 3), (1, 1), padding="VALID")(x)
        x = nn.relu(x)
        if self.use_norm:
            x = nn.GroupNorm(num_groups=None, group_size=1)(x)
        flow = nn.tanh(nn.Conv(2, (1, 1), (1, 1))(x)) * self.scale
        return jnp.concatenate([x, flow], axis=-1), flow
