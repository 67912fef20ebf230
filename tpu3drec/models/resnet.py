"""ResNet encoder (flax/linen, NHWC).

Capability-parity with the reference's torchvision-resnet18 multi-scale
encoder (`ref/monodepth2/trainer.py:54-57` builds `networks.ResnetEncoder(18)`;
depth 18/34/50 selectable via `ref/monodepth2/options.py:39-43`). Built
from scratch for TPU: NHWC, channels padded MXU-friendly, BatchNorm
statistics reduce over the (possibly sharded) batch axis — under pjit the
cross-device mean lowers to an ICI collective automatically.

Returns the 5-scale feature pyramid [conv1, layer1..layer4] the depth
decoder's skip connections consume.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

# stage channel widths per depth, torchvision layout
_STAGES = {
    18: ((64, 64, 128, 256, 512), (2, 2, 2, 2), False),
    34: ((64, 64, 128, 256, 512), (3, 4, 6, 3), False),
    50: ((64, 256, 512, 1024, 2048), (3, 4, 6, 3), True),
}


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: nn.BatchNorm(use_running_average=not train, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    channels: int  # output channels (4x the bottleneck width)
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: nn.BatchNorm(use_running_average=not train, dtype=self.dtype)
        width = self.channels // 4
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """Multi-scale encoder. Input NHWC in [0, 1]; normalized internally with
    the ImageNet statistics the reference inherits from torchvision."""

    depth: int = 18
    in_frames: int = 1  # pose encoder stacks 2 frames -> 6 input channels
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        chans, blocks, bottleneck = _STAGES[self.depth]
        mean = jnp.asarray([0.485, 0.456, 0.406] * self.in_frames, dtype=x.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225] * self.in_frames, dtype=x.dtype)
        x = (x - mean) / std

        feats = []
        y = nn.Conv(chans[0], (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        feats.append(y)  # /2
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        block = Bottleneck if bottleneck else BasicBlock
        for stage, (c, n) in enumerate(zip(chans[1:], blocks)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                y = block(c, stride=stride, dtype=self.dtype)(y, train=train)
            feats.append(y)  # /4, /8, /16, /32
        return feats

    @property
    def num_ch_enc(self):
        chans, _, _ = _STAGES[self.depth]
        return list(chans)
