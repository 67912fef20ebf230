"""Quaternion algebra in pure JAX.

Canonical internal order is **wxyz** (scalar-first). The reference mixes
conventions — a hand-rolled wxyz rotation (`ref/transfer/camera_to_world.py:40-52`)
alongside scipy's xyzw path (`ref/transfer/camera_to_world.py:53-55`) and a
wxyz InteriorNet parser (`ref/monodepth2/interior_dataset.py:80-99`).
Here the convention is explicit in every function name; adapters convert at
the IO boundary (COLMAP pose txt stores xyzw, see `utils/poseio.py`).

All functions are elementwise over leading batch dimensions (broadcast-safe)
and differentiable, so they can sit inside jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize to unit quaternion along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_wxyz_from_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    """(x,y,z,w) -> (w,x,y,z)."""
    return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def quat_xyzw_from_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    """(w,x,y,z) -> (x,y,z,w)."""
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a wxyz quaternion (inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b of wxyz quaternions (batch-broadcasting)."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_wxyz_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit wxyz quaternion -> rotation matrix, shape (..., 3, 3).

    Same formula the reference hand-rolls at
    `ref/transfer/camera_to_world.py:40-52`, vectorized.
    """
    q = quat_normalize(q)
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_xyzw_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit xyzw quaternion -> rotation matrix (scipy `from_quat` semantics,
    the convention actually used on the reference's hot path,
    `ref/transfer/camera_to_world.py:53-55,91`)."""
    return quat_wxyz_to_matrix(quat_wxyz_from_xyzw(q))


def matrix_to_quat_wxyz(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit wxyz quaternion.

    Branch-free Shepperd-style extraction: computes all four candidate
    quaternions and selects the best-conditioned one with `where`, so it is
    jit/vmap-safe and avoids catastrophic cancellation near w ~ 0.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidates, each scaled by 4*component^2 (>= 0).
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)

    # Pick the candidate whose pivot (diagonal term) is largest.
    pivots = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
         1 - m00 + m11 - m22, 1 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)[..., None]
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
