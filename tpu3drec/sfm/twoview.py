"""Two-view relative geometry: essential matrix + pose recovery.

The initialization step of the COLMAP-replacement (SURVEY.md C3:
"incremental reconstruction" starts from a two-view seed). TPU-first
RANSAC: all hypotheses are drawn, solved (vmapped 8-point SVDs) and scored
(Sampson error against every correspondence) in one batched dispatch — no
sequential hypothesis loop. Pose disambiguation triangulates a fixed probe
subset under all four (R, t) candidates and picks the one with maximal
positive-depth count (cheirality), again fully batched.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu3drec.sfm.triangulate import projection_matrix, triangulate_two_view


def normalize_points(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> normalized camera coords (K^{-1} applied)."""
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y], axis=-1)


def eight_point(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point essential matrix from normalized correspondences.

    x1, x2: (N, 2) normalized coords; w: (N,) weights. Returns (3, 3) E with
    the essential singular-value structure (s, s, 0) enforced.
    """
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    ones = jnp.ones_like(u1)
    # epipolar constraint x2^T E x1 = 0, row per correspondence
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )
    A = A * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[0] + S[1]) * 0.5
    return U @ jnp.diag(jnp.array([s, s, 0.0], dtype=E.dtype)) @ Vt2


def sampson_error(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) epipolar error, (N,)."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    Ex1 = h1 @ E.T      # (N, 3)
    Etx2 = h2 @ E       # (N, 3)
    num = jnp.sum(h2 * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ], dtype=v.dtype)


def _signed_sampson(E, h1, h2):
    """Signed first-order geometric residual per correspondence (N,)."""
    Ex1 = h1 @ E.T
    Etx2 = h2 @ E
    num = jnp.sum(h2 * Ex1, axis=-1)
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.sqrt(jnp.maximum(den, 1e-18))


def refine_relative_pose(
    R: jnp.ndarray, t: jnp.ndarray,
    x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray,
    iters: int = 10,
    robust_sigma: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Manifold Gauss-Newton on the 5-DoF relative pose minimizing weighted
    Sampson error — the nonlinear polish COLMAP applies after the linear
    solve. Necessary, not cosmetic: the algebraic 8-point estimate is
    measurably biased at realistic keypoint noise (this scene class,
    200 GT correspondences, 1px noise: 18-21 deg rotation error even in
    f64; the ML estimate is sub-degree). Rotation updates are left-applied
    axis-angle; translation moves in its 2-DoF tangent plane and is
    renormalized (scale is unobservable).

    ``robust_sigma`` > 0 (normalized-coordinate units) turns each GN step
    into an IRLS step with Cauchy weights 1/(1+(r/sigma)^2) computed at the
    current pose. Hard inlier gates cannot reject mismatches lying near the
    epipolar line (a 1-D constraint): measured on the occluded arena orbit,
    ~15% of gate-passing matches were GT outliers and biased the polished
    rotation by 3-4 deg; Cauchy reweighting at sigma=thresh/2 cut it below
    1 deg without sacrificing the wide-baseline pairs a tighter gate kills.
    """
    from tpu3drec.core.se3 import axis_angle_to_matrix

    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)

    def residuals(params, R0, t0, B, sw):
        Rn = axis_angle_to_matrix(params[:3]) @ R0
        tn = t0 + B @ params[3:]
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        E = _skew(tn) @ Rn
        return sw * _signed_sampson(E, h1, h2)

    def step(carry, _):
        R0, t0 = carry
        # tangent basis at t0
        a = jnp.where(jnp.abs(t0[0]) < 0.9,
                      jnp.array([1.0, 0.0, 0.0], t0.dtype),
                      jnp.array([0.0, 1.0, 0.0], t0.dtype))
        b1 = jnp.cross(t0, a)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
        b2 = jnp.cross(t0, b1)
        B = jnp.stack([b1, b2], axis=-1)
        # robust_sigma may be a traced scalar (derived from K): keep the
        # branch in-graph
        ru = _signed_sampson(_skew(t0) @ R0, h1, h2)
        cauchy = w / (1.0 + (ru / jnp.maximum(robust_sigma, 1e-12)) ** 2)
        w_eff = jnp.where(robust_sigma > 0.0, cauchy, w)
        sw = jnp.sqrt(w_eff)
        z = jnp.zeros(5, x1.dtype)
        r = residuals(z, R0, t0, B, sw)
        J = jax.jacfwd(residuals)(z, R0, t0, B, sw)
        JtJ = jnp.dot(J.T, J, precision="highest")
        Jtr = jnp.dot(J.T, r, precision="highest")
        delta = jnp.linalg.solve(JtJ + 1e-8 * jnp.eye(5, dtype=x1.dtype), -Jtr)
        Rn = axis_angle_to_matrix(delta[:3]) @ R0
        tn = t0 + B @ delta[3:]
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        # keep the step only if it reduces the (fixed-weight) cost
        r_new = residuals(z, Rn, tn, B, sw)
        better = jnp.sum(r_new ** 2) < jnp.sum(r ** 2)
        Rn = jnp.where(better, Rn, R0)
        tn = jnp.where(better, tn, t0)
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


class TwoViewResult(NamedTuple):
    E: jnp.ndarray         # (3,3)
    R: jnp.ndarray         # (3,3) world(cam1)->cam2
    t: jnp.ndarray         # (3,) unit norm
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray


def decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate (R, t): (R1,+t), (R1,-t), (R2,+t), (R2,-t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _pose_from_E(E, x1, x2, inliers, probe):
    """Decompose E, resolve the 4-fold (R, t) ambiguity by cheirality on a
    probe subset of the lowest-error inliers."""
    err = sampson_error(E, x1, x2)
    probe_idx = jnp.argsort(jnp.where(inliers, err, jnp.inf))[:probe]
    Rs, ts = decompose_essential(E)
    I = jnp.eye(3, dtype=E.dtype)
    z0 = jnp.zeros(3, dtype=E.dtype)

    def count_front(R, t):
        P1 = projection_matrix(I, z0)
        P2 = projection_matrix(R, t)
        X = triangulate_two_view(P1, P2, x1[probe_idx], x2[probe_idx])
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        ok = (z1 > 0) & (z2 > 0) & inliers[probe_idx]
        return jnp.sum(ok)

    counts = jax.vmap(count_front)(Rs, ts)
    k = jnp.argmax(counts)
    return Rs[k], ts[k]


@partial(jax.jit, static_argnames=("num_hypotheses", "probe", "num_lo"))
def estimate_relative_pose(
    uv1: jnp.ndarray, uv2: jnp.ndarray, valid: jnp.ndarray, K: jnp.ndarray,
    rng_key,
    num_hypotheses: int = 2048,
    inlier_px: float = 1.5,
    probe: int = 64,
    num_lo: int = 4,
) -> TwoViewResult:
    """Batched LO-RANSAC essential matrix + cheirality-resolved pose.

    uv1/uv2 (N, 2) pixel matches with validity mask. The returned t has unit
    norm — scale is unobservable (the gap the reference fills with ICP,
    `ref/readme.md:24-25`; ours can too, plus GT-depth registration).

    Selection is MSAC-scored (truncated quadratic), not inlier counting:
    at ~1px keypoint noise the minimal 8-point solves are noisy enough that
    plain max-#inliers regularly picks a contaminated hypothesis (measured
    on this scene class: 10/12 trials >2 deg rotation error at 25% outliers;
    MSAC + per-candidate GN polish: 0/12). The ``num_lo`` best candidates
    are each decomposed, Sampson-GN-polished on their own inlier sets
    (refine_relative_pose), re-gated, and the final winner re-polished.
    Everything is one batched dispatch — no data-dependent control flow.
    """
    N = uv1.shape[0]
    x1 = normalize_points(uv1, K)
    x2 = normalize_points(uv2, K)
    thresh = (inlier_px / K[0, 0]) ** 2  # Sampson in normalized coords

    # draw minimal samples only from valid matches via masked categorical
    logits = jnp.where(valid, 0.0, -jnp.inf)
    samples = jax.random.categorical(
        rng_key, logits, shape=(num_hypotheses, 8)
    )  # (S, 8) indices

    def solve(sample):
        return eight_point(x1[sample], x2[sample], jnp.ones(8, x1.dtype))

    Es = jax.vmap(solve)(samples)  # (S, 3, 3)
    errs = jax.vmap(lambda E: sampson_error(E, x1, x2))(Es)  # (S, N)
    # MSAC: sum of min(err, thresh) over valid rows — lower is better
    msac = jnp.sum(jnp.where(valid[None, :], jnp.minimum(errs, thresh), 0.0),
                   axis=1)
    _, top = jax.lax.top_k(-msac, num_lo)

    sigma = (inlier_px / K[0, 0]) * 0.5  # Cauchy scale: half the gate

    def polish(E0):
        inl0 = (sampson_error(E0, x1, x2) < thresh) & valid
        R, t = _pose_from_E(E0, x1, x2, inl0, probe)
        inl = inl0
        for _ in range(2):
            R, t = refine_relative_pose(R, t, x1, x2, inl.astype(x1.dtype),
                                        robust_sigma=sigma)
            inl = (sampson_error(_skew(t) @ R, x1, x2) < thresh) & valid
        E = _skew(t) @ R
        score = jnp.sum(jnp.where(valid,
                                  jnp.minimum(sampson_error(E, x1, x2), thresh),
                                  0.0))
        return R, t, inl, score

    Rs_c, ts_c, inls_c, scores_c = jax.vmap(polish)(Es[top])
    best = jnp.argmin(scores_c)
    R_r, t_r, inliers = Rs_c[best], ts_c[best], inls_c[best]
    E_final = _skew(t_r) @ R_r
    return TwoViewResult(
        E=E_final, R=R_r, t=t_r, inliers=inliers,
        n_inliers=jnp.sum(inliers).astype(jnp.int32),
    )
