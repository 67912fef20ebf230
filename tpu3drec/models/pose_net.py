"""Pose network: frame pair -> 6-DoF relative pose (axis-angle + translation).

Capability-parity with the reference's `separate_resnet` pose path
(`ref/monodepth2/trainer.py:71-88` builds a 2-frame ResnetEncoder + PoseDecoder;
`ref/monodepth2/trainer.py:276-302` feeds ordered pairs and reads
axisangle/translation scaled into cam_T_cam). The 0.01 output scaling keeps
early training near identity, matching upstream PoseDecoder semantics.
`use_GTpose` (the thesis modification, `ref/monodepth2/options.py:52-55`,
`trainer.py:267-274`) bypasses this net — handled in `monodepth.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpu3drec.models.resnet import ResNetEncoder


class PoseDecoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        # squeeze to 256ch, then 2 hidden 3x3 convs, then 6-dof head
        y = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype)(feat))
        y = nn.relu(nn.Conv(256, (3, 3), strides=(1, 1), padding=1, dtype=self.dtype)(y))
        y = nn.relu(nn.Conv(256, (3, 3), strides=(1, 1), padding=1, dtype=self.dtype)(y))
        y = nn.Conv(6, (1, 1), dtype=self.dtype)(y)
        y = jnp.mean(y, axis=(1, 2))  # global average over spatial dims
        y = 0.01 * y
        return y[..., :3], y[..., 3:]  # axisangle, translation


class PoseNet(nn.Module):
    """Two RGB frames (NHWC each) -> (axisangle (N,3), translation (N,3))."""

    depth: int = 18
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img_a, img_b, train: bool = False):
        x = jnp.concatenate([img_a, img_b], axis=-1)
        feats = ResNetEncoder(depth=self.depth, in_frames=2, dtype=self.dtype,
                              name="encoder")(x, train=train)
        return PoseDecoder(dtype=self.dtype, name="decoder")(feats[-1])
