"""Depth decoder: upconv + skip connections -> multi-scale sigmoid disparity.

Capability-parity with monodepth2's DepthDecoder (built at
`ref/monodepth2/trainer.py:58-60`, consumed per scale [0..3] at
`ref/monodepth2/trainer.py:351-401`): 5 up-levels, ELU activations,
nearest-neighbor x2 upsampling, skip concat from the encoder pyramid,
sigmoid disparity heads at the 4 finest scales. TPU-first details: NHWC,
reflection padding like the reference's Conv3x3, resize via
jax.image.resize (static shapes).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 on NHWC."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")


class ConvBlock(nn.Module):
    """3x3 conv with reflection padding + ELU (monodepth2 ConvBlock)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = nn.Conv(self.channels, (3, 3), padding="VALID", dtype=self.dtype)(x)
        return nn.elu(x)


class DepthDecoder(nn.Module):
    """Encoder pyramid -> dict {scale: disparity NHW1 in (0,1)}."""

    num_ch_enc: Sequence[int]  # e.g. [64, 64, 128, 256, 512] for resnet18
    scales: Sequence[int] = (0, 1, 2, 3)
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        outputs = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(self.num_ch_dec[i], dtype=self.dtype)(x)
            x = upsample2x(x)
            if i > 0:
                skip = feats[i - 1]
                # guard odd input sizes: crop to skip's spatial dims
                x = x[:, : skip.shape[1], : skip.shape[2], :]
                x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(self.num_ch_dec[i], dtype=self.dtype)(x)
            if i in self.scales:
                d = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                d = nn.Conv(1, (3, 3), padding="VALID", dtype=self.dtype,
                            name=f"dispconv_{i}")(d)
                outputs[i] = nn.sigmoid(d)
        return outputs
