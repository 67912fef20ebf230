"""SE(3) rigid transforms as a JAX pytree.

One canonical representation: rotation matrix ``R`` (..., 3, 3) plus
translation ``t`` (..., 3). Helpers cover the conventions the reference
relies on:

* COLMAP pose-file convention (world->camera: ``p_c = R p_w + t``), whose
  inverse is the reference's hot-path math ``p_w = R^{-1}(p_c - t)``
  (`ref/transfer/camera_to_world.py:53-59,86-105`).
* Homogeneous 4x4 T application, the ICP scale-correction step
  (`ref/other_tools/transfer_T_icp.py:71-97`).
* axis-angle <-> matrix, the monodepth pose-net parameterization
  (upstream monodepth2 `transformation_from_parameters`, used at
  `ref/monodepth2/trainer.py:303-327`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SE3(NamedTuple):
    """Rigid transform: x -> R @ x + t. Fields broadcast over batch dims."""

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return SE3(R, t)

    @staticmethod
    def from_matrix(T: jnp.ndarray) -> "SE3":
        """From homogeneous (..., 4, 4)."""
        return SE3(T[..., :3, :3], T[..., :3, 3])


def se3_from_rt(R: jnp.ndarray, t: jnp.ndarray) -> SE3:
    return SE3(R, t)


def se3_matrix(T: SE3) -> jnp.ndarray:
    """SE3 -> homogeneous (..., 4, 4)."""
    batch = jnp.broadcast_shapes(T.R.shape[:-2], T.t.shape[:-1])
    R = jnp.broadcast_to(T.R, batch + (3, 3))
    t = jnp.broadcast_to(T.t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: SE3) -> SE3:
    """(R, t)^-1 = (R^T, -R^T t)."""
    Rt = jnp.swapaxes(T.R, -1, -2)
    return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, T.t, precision="highest"))


def se3_compose(A: SE3, B: SE3) -> SE3:
    """A then-applied-after B: (A o B)(x) = A(B(x))."""
    return SE3(
        jnp.einsum("...ij,...jk->...ik", A.R, B.R, precision="highest"),
        jnp.einsum("...ij,...j->...i", A.R, B.t, precision="highest") + A.t,
    )


def se3_apply(T: SE3, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply to points (..., N, 3) or (..., 3)."""
    if pts.shape[-1] != 3:
        raise ValueError(f"points must have last dim 3, got {pts.shape}")
    if pts.ndim >= 2 and T.R.ndim == pts.ndim + 1:
        # (..., N, 3) with (..., 3, 3): rotate each point.
        return jnp.einsum("...ij,...nj->...ni", T.R, pts, precision="highest") + T.t[..., None, :]
    return jnp.einsum("...ij,...j->...i", T.R, pts, precision="highest") + T.t


def axis_angle_to_matrix(axisangle: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues: axis-angle vector (..., 3) -> rotation matrix (..., 3, 3).

    Taylor-safe near theta=0 so gradients through small rotations (the
    pose-net regime: outputs scaled by 0.01 upstream) are stable.
    """
    theta2 = jnp.sum(axisangle * axisangle, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + eps * eps)
    k = axisangle / theta
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [zero, -kz, ky, kz, zero, -kx, -ky, kx, zero], axis=-1
    ).reshape(axisangle.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=axisangle.dtype)
    return eye + s * K + (1.0 - c) * jnp.einsum("...ij,...jk->...ik", K, K, precision="highest")


def matrix_to_axis_angle(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rotation matrix -> axis-angle (..., 3), theta in [0, pi].

    Differentiation-safe: `arccos` is evaluated strictly inside (-1, 1)
    (its derivative at +-1 is infinite, and jacfwd through a pose-graph
    residual with a near-pi rotation error otherwise produces NaN —
    measured on the 500-frame loop, where closure errors reach 175 deg).
    The derivative near pi is still large (the log map is genuinely
    singular there); callers handling near-pi errors should reduce them
    first (pipelines/kitti.py::_distribute_closure_error)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    # Off-diagonal antisymmetric part gives axis * 2 sin(theta).
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)[..., None]
    axis = w / jnp.maximum(2.0 * sin_theta, eps)
    # Near theta=0 the direction is irrelevant; w/2 ~ axis*theta already.
    small = (jnp.abs(sin_theta) < 1e-6)
    return jnp.where(small, w * 0.5, axis * theta[..., None])


def colmap_world_to_cam(q_xyzw: jnp.ndarray, t: jnp.ndarray) -> SE3:
    """Build the world->camera SE3 from a COLMAP pose row (xyzw quat + t),
    matching the file contract read at `ref/transfer/camera_to_world.py:149-158`."""
    from tpu3drec.core.quaternion import quat_xyzw_to_matrix

    return SE3(quat_xyzw_to_matrix(q_xyzw), t)


def colmap_cam_to_world(q_xyzw: jnp.ndarray, t: jnp.ndarray) -> SE3:
    """Camera->world transform from a COLMAP pose row: the reference's
    ``p_w = R^{-1}(p_c - t)`` (`ref/transfer/camera_to_world.py:86-105`)."""
    return se3_inverse(colmap_world_to_cam(q_xyzw, t))
