"""Perspective-n-Point camera registration with device-batched RANSAC.

The "register next view" step of the COLMAP-replacement (SURVEY.md C3).
Pipeline: DLT over minimal 6-point samples (vmapped SVDs, one dispatch for
all hypotheses) -> inlier scoring by reprojection -> weighted DLT refit ->
fixed-iteration Gauss-Newton polish on the se(3) parameters (lax.scan, so
the whole solver jits).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu3drec.core.se3 import axis_angle_to_matrix, matrix_to_axis_angle
from tpu3drec.sfm.triangulate import reprojection_errors


def _dlt_pose(X: jnp.ndarray, xn: jnp.ndarray, w: jnp.ndarray):
    """Weighted DLT for P = [R|t] from world points X (N,3) and normalized
    image coords xn (N,2). Returns (R, t) with R orthogonalized."""
    N = X.shape[0]
    Xh = jnp.concatenate([X, jnp.ones((N, 1), X.dtype)], axis=-1)  # (N,4)
    zeros = jnp.zeros_like(Xh)
    rows_u = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=-1)  # (N,12)
    rows_v = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([rows_u * w[:, None], rows_v * w[:, None]], axis=0)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    P = Vt[-1].reshape(3, 4)
    M = P[:, :3]
    # fix sign so points land in front (positive depth on the weighted mean)
    Xm = jnp.einsum("n,ni->i", w, X) / jnp.maximum(jnp.sum(w), 1e-12)
    sign = jnp.sign(M[2] @ Xm + P[2, 3])
    P = P * jnp.where(sign == 0, 1.0, sign)
    M = P[:, :3]
    # orthogonalize: R = UV^T of M, scale = mean singular value
    U, S, Vt2 = jnp.linalg.svd(M)
    D = jnp.diag(jnp.array([1.0, 1.0, jnp.linalg.det(U @ Vt2)], dtype=X.dtype))
    R = U @ D @ Vt2
    scale = jnp.mean(S)
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    return R, t


def _planar_pose(X: jnp.ndarray, xn: jnp.ndarray, w: jnp.ndarray):
    """Pose hypothesis for (nearly) COPLANAR world points: fit the sample's
    plane, estimate the world-plane->image homography, decompose it into
    [R|t] (the classic planar-PnP construction, IPPE-style).

    The 6-point DLT (`_dlt_pose`) is rank-deficient when the sample is
    coplanar — P then has a multi-parameter solution family and the SVD
    null vector is arbitrary. Piecewise-planar scenes (urban facades,
    ground planes — exactly the reference's mapping domain) put most
    samples on one face: measured on the 500-frame city-block corners,
    2D-3D sets that fit the TRUE pose at 92%/6px consensus were rejected
    at 17% by DLT-only hypotheses. Running BOTH solvers per sample and
    letting RANSAC score them repairs this at negligible cost (one extra
    9x9 SVD per hypothesis)."""
    wn = w / jnp.maximum(jnp.sum(w), 1e-12)
    Xm = jnp.einsum("n,ni->i", wn, X)
    Xc = X - Xm
    C = (Xc * w[:, None]).T @ Xc
    _, _, VtC = jnp.linalg.svd(C)
    e1, e2 = VtC[0], VtC[1]
    p = jnp.stack([Xc @ e1, Xc @ e2], axis=-1)          # plane coords (N,2)
    ph = jnp.concatenate([p, jnp.ones((X.shape[0], 1), X.dtype)], axis=-1)
    zeros = jnp.zeros_like(ph)
    rows_u = jnp.concatenate([ph, zeros, -xn[:, 0:1] * ph], axis=-1)
    rows_v = jnp.concatenate([zeros, ph, -xn[:, 1:2] * ph], axis=-1)
    A = jnp.concatenate([rows_u * w[:, None], rows_v * w[:, None]], axis=0)
    _, _, Vt9 = jnp.linalg.svd(A, full_matrices=False)
    H = Vt9[-1].reshape(3, 3)
    # scale so the rotation columns are unit; cheirality from the plane
    # origin's depth (H[:,2] z-component = depth of Xm)
    s = jnp.sqrt(jnp.linalg.norm(H[:, 0]) * jnp.linalg.norm(H[:, 1]))
    H = H / jnp.maximum(s, 1e-12)
    H = H * jnp.where(H[2, 2] < 0, -1.0, 1.0)
    a1, a2, a3 = H[:, 0], H[:, 1], H[:, 2]
    M = jnp.stack([a1, a2, jnp.cross(a1, a2)], axis=1)
    U, _, Vt3 = jnp.linalg.svd(M)
    D = jnp.diag(jnp.array([1.0, 1.0, jnp.linalg.det(U @ Vt3)],
                           dtype=X.dtype))
    Rp = U @ D @ Vt3                                     # plane -> camera
    E = jnp.stack([e1, e2, jnp.cross(e1, e2)], axis=1)   # world -> plane^T
    R = Rp @ E.T
    t = a3 - R @ Xm
    return R, t


def _gn_refine(R0, t0, X, xn, w, iters: int = 10):
    """Gauss-Newton on (axis-angle, t) minimizing weighted normalized-coords
    reprojection. Static iteration count under lax.scan."""
    aa0 = matrix_to_axis_angle(R0)
    params0 = jnp.concatenate([aa0, t0])

    def residual(params):
        R = axis_angle_to_matrix(params[:3])
        t = params[3:]
        Xc = X @ R.T + t
        z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
        proj = Xc[:, :2] / z[:, None]
        return ((proj - xn) * w[:, None]).reshape(-1)

    def step(params, _):
        r = residual(params)
        J = jax.jacfwd(residual)(params)  # (2N, 6)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=params.dtype)
        g = J.T @ r
        return params - jnp.linalg.solve(H, g), None

    params, _ = jax.lax.scan(step, params0, None, length=iters)
    return axis_angle_to_matrix(params[:3]), params[3:]


class PnPResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("num_hypotheses", "gn_iters"))
def pnp_ransac(
    X: jnp.ndarray,      # (N, 3) world points
    uv: jnp.ndarray,     # (N, 2) pixel observations
    valid: jnp.ndarray,  # (N,) bool
    K: jnp.ndarray,
    rng_key,
    num_hypotheses: int = 2048,
    inlier_px: float = 3.0,
    gn_iters: int = 10,
) -> PnPResult:
    """World->camera pose from 2D-3D correspondences.

    2048 hypotheses: a 6-point DLT sample is all-inlier with prob p^6, so at
    p=0.3 contamination 256 samples expect only ~0.2 clean draws (measured
    registration failures on the occluded urban sim); 2048 expects ~1.5 and
    the LO rounds grow them. The hypothesis solve is one vmapped batch of
    12x12 SVDs — raising the count is nearly free on TPU."""
    xn = jnp.stack(
        [(uv[:, 0] - K[0, 2]) / K[0, 0], (uv[:, 1] - K[1, 2]) / K[1, 1]], axis=-1
    )
    logits = jnp.where(valid, 0.0, -jnp.inf)
    samples = jax.random.categorical(rng_key, logits, shape=(num_hypotheses, 6))

    def solve(sample):
        # two hypothesis families per sample: general-position DLT and the
        # planar homography decomposition (coplanar samples break DLT —
        # see _planar_pose). RANSAC scoring picks whichever fits.
        ones = jnp.ones(6, X.dtype)
        Rd, td = _dlt_pose(X[sample], xn[sample], ones)
        Rp, tp = _planar_pose(X[sample], xn[sample], ones)
        return jnp.stack([Rd, Rp]), jnp.stack([td, tp])

    Rs, ts = jax.vmap(solve)(samples)
    Rs = Rs.reshape(-1, 3, 3)
    ts = ts.reshape(-1, 3)
    errs = jax.vmap(lambda R, t: reprojection_errors(X, R, t, K, uv))(Rs, ts)
    inl = (errs < inlier_px) & valid[None, :]
    best = jnp.argmax(jnp.sum(inl, axis=1))
    n_raw = jnp.sum(inl[best])
    R_raw, t_raw = Rs[best], ts[best]

    # local optimization: two rounds of (GN polish + re-score), keeping the
    # refined pose only if it beats the raw best hypothesis (an unguarded
    # refit over a contaminated inlier set can diverge — same failure mode
    # as twoview's LO step). GN-only on purpose: a full-set weighted DLT
    # refit inherits the coplanar degeneracy whenever the inlier set itself
    # is one facade, while GN is parametric in (R, t) and planar-safe.
    w = inl[best].astype(X.dtype)
    R, t = R_raw, t_raw
    for _ in range(2):
        R, t = _gn_refine(R, t, X, xn, w, iters=gn_iters)
        err = reprojection_errors(X, R, t, K, uv)
        w = ((err < inlier_px) & valid).astype(X.dtype)
    n_lo = jnp.sum(w).astype(jnp.int32)
    use_lo = n_lo >= n_raw
    R = jnp.where(use_lo, R, R_raw)
    t = jnp.where(use_lo, t, t_raw)
    final = reprojection_errors(X, R, t, K, uv)
    inliers = (final < inlier_px) & valid
    return PnPResult(R=R, t=t, inliers=inliers,
                     n_inliers=jnp.sum(inliers).astype(jnp.int32))
