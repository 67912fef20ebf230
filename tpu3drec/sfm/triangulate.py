"""Batched triangulation (DLT), two-view and multi-view.

Part of the COLMAP-replacement core (SURVEY.md C3: "incremental
triangulation"). Everything is static-shape and vmapped: two-view
triangulation SVDs a (4,4) per point; multi-view accumulates the DLT normal
matrix over a fixed observation slot-count with a weight mask, then takes
the smallest eigenvector — so whole landmark blocks triangulate in one
device dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def projection_matrix(R: jnp.ndarray, t: jnp.ndarray, K: jnp.ndarray | None = None) -> jnp.ndarray:
    """World->camera (R, t) -> 3x4 projection (K [R|t] if K given)."""
    P = jnp.concatenate([R, t[..., None]], axis=-1)
    if K is not None:
        P = K @ P
    return P


def triangulate_two_view(
    P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
) -> jnp.ndarray:
    """DLT: projection matrices (3,4) + pixel coords (N,2) each -> (N,3).

    Linear system per point: [x*p3 - p1; y*p3 - p2] from both views.
    """

    def one(u1, u2):
        A = jnp.stack(
            [
                u1[0] * P1[2] - P1[0],
                u1[1] * P1[2] - P1[1],
                u2[0] * P2[2] - P2[0],
                u2[1] * P2[2] - P2[1],
            ]
        )
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        return X[:3] / X[3]

    return jax.vmap(one)(x1, x2)


def triangulate_two_view_np(P1, P2, x1, x2):
    """Host-numpy DLT, same math as `triangulate_two_view`.

    For the incremental-SfM glue (`sfm/incremental._triangulate_new`):
    per-registration triangulation groups have a DIFFERENT point count
    every call, so the device path compiles a fresh tiny executable per
    unique N — measured 2651 XLA:CPU compiles over a 160-frame run, and
    the accumulated JIT code sections crash LLVM on 500-frame sequences
    ("Unable to allocate section memory"). A few hundred 4x4 SVDs are
    host-glue scale; the batched device path stays for in-graph use.
    """
    import numpy as np

    P1 = np.asarray(P1)
    P2 = np.asarray(P2)
    x1 = np.asarray(x1)
    x2 = np.asarray(x2)
    A = np.stack(
        [
            x1[:, 0:1] * P1[2] - P1[0],
            x1[:, 1:2] * P1[2] - P1[1],
            x2[:, 0:1] * P2[2] - P2[0],
            x2[:, 1:2] * P2[2] - P2[1],
        ],
        axis=1,
    )  # (N, 4, 4)
    _, _, Vt = np.linalg.svd(A)
    X = Vt[:, -1]
    return X[:, :3] / X[:, 3:4]


def reprojection_errors_np(X, R, t, K, uv):
    """Host-numpy twin of `reprojection_errors` (see triangulate_two_view_np
    for why the incremental-SfM glue avoids per-shape device dispatches)."""
    import numpy as np

    X = np.asarray(X)
    uv = np.asarray(uv)
    Xc = X @ np.asarray(R).T + np.asarray(t)
    z = np.where(np.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
    u = Xc[:, 0] / z * K[0, 0] + K[0, 2]
    v = Xc[:, 1] / z * K[1, 1] + K[1, 2]
    return np.sqrt((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2)


def triangulate_multiview(
    Ps: jnp.ndarray,    # (V, 3, 4) projection matrices
    uvs: jnp.ndarray,   # (V, 2) observations of one landmark
    mask: jnp.ndarray,  # (V,) weight/validity
) -> jnp.ndarray:
    """One landmark from V observation slots (masked): smallest eigenvector
    of the accumulated DLT normal matrix. vmap over landmarks for blocks."""
    rows_x = uvs[:, 0:1] * Ps[:, 2] - Ps[:, 0]  # (V, 4)
    rows_y = uvs[:, 1:2] * Ps[:, 2] - Ps[:, 1]
    w = mask.astype(Ps.dtype)[:, None]
    A = jnp.concatenate([rows_x * w, rows_y * w], axis=0)  # (2V, 4)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[:, 0]
    return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])


def reprojection_errors(
    X: jnp.ndarray,    # (N, 3) world points
    R: jnp.ndarray, t: jnp.ndarray, K: jnp.ndarray,
    uv: jnp.ndarray,   # (N, 2)
) -> jnp.ndarray:
    """Pixel reprojection error magnitude (N,) for one camera."""
    Xc = X @ R.T + t
    z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
    u = Xc[:, 0] / z * K[0, 0] + K[0, 2]
    v = Xc[:, 1] / z * K[1, 1] + K[1, 2]
    return jnp.sqrt((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2)
