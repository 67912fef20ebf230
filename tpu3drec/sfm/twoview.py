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


@partial(jax.jit, static_argnames=("num_hypotheses", "probe"))
def estimate_relative_pose(
    uv1: jnp.ndarray, uv2: jnp.ndarray, valid: jnp.ndarray, K: jnp.ndarray,
    rng_key,
    num_hypotheses: int = 512,
    inlier_px: float = 1.5,
    probe: int = 64,
) -> TwoViewResult:
    """Batched-RANSAC essential matrix + cheirality-resolved pose.

    uv1/uv2 (N, 2) pixel matches with validity mask. The returned t has unit
    norm — scale is unobservable (the gap the reference fills with ICP,
    `ref/readme.md:24-25`; ours can too, plus GT-depth registration).
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
    inl = (errs < thresh) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)

    # LO-RANSAC: iterate weighted refit on the growing inlier set
    E_best = Es[best]
    w = inl[best].astype(x1.dtype)

    def refit(w, _):
        E = eight_point(x1, x2, w)
        err = sampson_error(E, x1, x2)
        return ((err < thresh) & valid).astype(x1.dtype), E

    w, Es_lo = jax.lax.scan(refit, w, None, length=3)
    # guard: a refit over a contaminated inlier set can diverge — keep the
    # refit only if it scores at least as many inliers as the raw best
    # hypothesis (measured: at ~50% precision / 18 matches the unguarded
    # refit returned a degenerate E with 0 inliers)
    E_lo = Es_lo[-1]
    n_lo = jnp.sum((sampson_error(E_lo, x1, x2) < thresh) & valid)
    n_raw = jnp.sum((sampson_error(E_best, x1, x2) < thresh) & valid)
    E = jnp.where(n_lo >= n_raw, E_lo, E_best)
    final_err = sampson_error(E, x1, x2)
    inliers = (final_err < thresh) & valid

    # cheirality on a probe subset (static size)
    probe_idx = jnp.argsort(jnp.where(inliers, final_err, jnp.inf))[:probe]
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
    return TwoViewResult(
        E=E, R=Rs[k], t=ts[k], inliers=inliers,
        n_inliers=jnp.sum(inliers).astype(jnp.int32),
    )
