"""Pinhole camera model.

Replaces the hard-coded intrinsics scattered through the reference:
fx=600.391 fy=600.079 cx=320 cy=240 (`ref/transfer/pixel_to_camera.py:25-28`,
`ref/transfer/camera_to_world.py:68-71`), the InteriorNet normalized K
(`ref/monodepth2/interior_dataset.py:26-30`), and the AirSim client's
cx=319.5 cy=239.5 f=269.5 (`ref/airsim/main.cpp:40-43`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Intrinsics. Fields may carry leading batch dims (per-frame cameras)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, width, height) -> "PinholeCamera":
        f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return PinholeCamera(f32(fx), f32(fy), f32(cx), f32(cy), int(width), int(height))

    @staticmethod
    def reference_default(width: int = 640, height: int = 480) -> "PinholeCamera":
        """The constants baked into the reference transform scripts
        (`ref/transfer/pixel_to_camera.py:25-28`)."""
        return PinholeCamera.create(600.391, 600.079, 320.0, 240.0, width, height)

    @staticmethod
    def from_normalized(K_norm, width: int, height: int) -> "PinholeCamera":
        """From a normalized intrinsics matrix (fx/W, fy/H, cx/W, cy/H layout),
        the monodepth dataset convention (`ref/monodepth2/mono_dataset.py:170-179`)."""
        K = jnp.asarray(K_norm, dtype=jnp.float32)
        return PinholeCamera.create(
            K[0, 0] * width, K[1, 1] * height, K[0, 2] * width, K[1, 2] * height,
            width, height,
        )

    def K(self) -> jnp.ndarray:
        """3x3 intrinsics matrix (batched if fields are batched)."""
        fx = jnp.asarray(self.fx)
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        rows = jnp.stack(
            [fx, z, jnp.broadcast_to(self.cx, fx.shape),
             z, jnp.broadcast_to(self.fy, fx.shape), jnp.broadcast_to(self.cy, fx.shape),
             z, z, o],
            axis=-1,
        )
        return rows.reshape(fx.shape + (3, 3))

    def scaled(self, scale: float) -> "PinholeCamera":
        """Camera for an image resized by ``scale`` (the /2-per-level pyramid
        of `ref/monodepth2/mono_dataset.py:170-179`)."""
        return PinholeCamera(
            self.fx * scale, self.fy * scale, self.cx * scale, self.cy * scale,
            int(round(self.width * scale)), int(round(self.height * scale)),
        )

    def project(self, pts_cam: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
        """Camera-frame points (..., 3) -> pixel coords (..., 2) (u, v)."""
        z = pts_cam[..., 2:3]
        z_safe = jnp.where(jnp.abs(z) < eps, eps, z)
        u = pts_cam[..., 0:1] / z_safe * self.fx + self.cx
        v = pts_cam[..., 1:2] / z_safe * self.fy + self.cy
        return jnp.concatenate([u, v], axis=-1)

    def unproject(self, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3):
        ``X=(u-cx)/fx*Z, Y=(v-cy)/fy*Z`` (`ref/transfer/pixel_to_camera.py:34-43`)."""
        X = (uv[..., 0] - self.cx) / self.fx * depth
        Y = (uv[..., 1] - self.cy) / self.fy * depth
        return jnp.stack([X, Y, depth], axis=-1)
