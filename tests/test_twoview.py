"""Two-view geometry / triangulation / PnP tests on synthetic scenes."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyR

from tpu3drec.sfm.triangulate import (
    projection_matrix,
    triangulate_two_view,
    triangulate_multiview,
    reprojection_errors,
)
from tpu3drec.sfm.twoview import (
    normalize_points,
    eight_point,
    sampson_error,
    estimate_relative_pose,
)
from tpu3drec.sfm.pnp import pnp_ransac

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def _scene(rng, n=200):
    """Random points in front of two cameras with known relative pose."""
    X = rng.uniform([-2, -1.5, 4], [2, 1.5, 10], size=(n, 3)).astype(np.float32)
    R = ScipyR.from_rotvec([0.02, -0.25, 0.01]).as_matrix().astype(np.float32)
    t = np.array([1.0, 0.05, 0.1], np.float32)  # baseline mostly x
    return X, R, t


def _project(X, R, t):
    Xc = X @ R.T + t
    uv = Xc[:, :2] / Xc[:, 2:3]
    return (uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]).astype(np.float32)


class TestTriangulate:
    def test_two_view_roundtrip(self, rng):
        X, R, t = _scene(rng, 50)
        uv1 = _project(X, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        uv2 = _project(X, R, t)
        P1 = projection_matrix(jnp.eye(3), jnp.zeros(3), jnp.asarray(K))
        P2 = projection_matrix(jnp.asarray(R), jnp.asarray(t), jnp.asarray(K))
        Xr = np.asarray(triangulate_two_view(P1, P2, jnp.asarray(uv1), jnp.asarray(uv2)))
        np.testing.assert_allclose(Xr, X, atol=1e-2)

    def test_multiview_with_mask(self, rng):
        X, R, t = _scene(rng, 1)
        R2 = ScipyR.from_rotvec([0.1, 0.2, 0]).as_matrix().astype(np.float32)
        t2 = np.array([-1.0, 0.5, 0.2], np.float32)
        views = [
            (np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
            (R, t),
            (R2, t2),
        ]
        Ps = np.stack([np.asarray(projection_matrix(jnp.asarray(r), jnp.asarray(tt), jnp.asarray(K)))
                       for r, tt in views])
        uvs = np.stack([_project(X, r, tt)[0] for r, tt in views])
        # mask out the last view with garbage obs: result must be unaffected
        uvs_bad = uvs.copy()
        uvs_bad[2] = [9999, 9999]
        mask = np.array([1.0, 1.0, 0.0], np.float32)
        Xr = np.asarray(triangulate_multiview(jnp.asarray(Ps), jnp.asarray(uvs_bad), jnp.asarray(mask)))
        np.testing.assert_allclose(Xr, X[0], atol=1e-2)

    def test_reprojection_errors_zero(self, rng):
        X, R, t = _scene(rng, 20)
        uv = _project(X, R, t)
        e = np.asarray(reprojection_errors(jnp.asarray(X), jnp.asarray(R),
                                           jnp.asarray(t), jnp.asarray(K), jnp.asarray(uv)))
        assert e.max() < 1e-2


class TestEightPoint:
    def test_exact_epipolar(self, rng):
        X, R, t = _scene(rng, 64)
        uv1 = _project(X, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        uv2 = _project(X, R, t)
        x1 = normalize_points(jnp.asarray(uv1), jnp.asarray(K))
        x2 = normalize_points(jnp.asarray(uv2), jnp.asarray(K))
        E = eight_point(x1, x2, jnp.ones(64))
        err = np.asarray(sampson_error(E, x1, x2))
        assert err.max() < 1e-8
        # E should equal [t]_x R up to scale
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
        E_true = tx @ R
        E_np = np.array(E)
        E_np /= np.linalg.norm(E_np)
        E_true /= np.linalg.norm(E_true)
        if np.sign(E_np[2, 0]) != np.sign(E_true[2, 0]):
            E_np = -E_np
        np.testing.assert_allclose(E_np, E_true, atol=1e-4)


class TestRelativePose:
    def test_recover_pose_with_outliers(self, rng):
        X, R, t = _scene(rng, 300)
        uv1 = _project(X, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        uv2 = _project(X, R, t)
        # 25% outliers
        n_out = 75
        uv2[:n_out] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))
        valid = np.ones(300, bool)
        res = estimate_relative_pose(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), jnp.asarray(K),
            jax.random.PRNGKey(0),
        )
        # rotation recovered
        np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-2)
        # translation direction recovered (unit norm, sign fixed by cheirality)
        t_dir = t / np.linalg.norm(t)
        np.testing.assert_allclose(np.asarray(res.t), t_dir, atol=3e-2)
        assert int(res.n_inliers) > 200
        # most outliers excluded
        assert np.asarray(res.inliers)[:n_out].mean() < 0.1


class TestPnP:
    def test_pnp_exact(self, rng):
        X, R, t = _scene(rng, 100)
        uv = _project(X, R, t)
        res = pnp_ransac(jnp.asarray(X), jnp.asarray(uv), jnp.ones(100, bool),
                         jnp.asarray(K), jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-3)
        assert int(res.n_inliers) == 100

    def test_pnp_with_outliers_and_noise(self, rng):
        X, R, t = _scene(rng, 200)
        uv = _project(X, R, t) + rng.normal(0, 0.5, size=(200, 2)).astype(np.float32)
        uv[:40] = rng.uniform([0, 0], [640, 480], size=(40, 2))
        res = pnp_ransac(jnp.asarray(X), jnp.asarray(uv), jnp.ones(200, bool),
                         jnp.asarray(K), jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-2)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-2)
        assert int(res.n_inliers) > 140

    def test_pnp_coplanar_points(self, rng):
        """ALL world points on one plane (a building facade filling the
        view — the 500-frame city-block corner failure): the 6-point DLT
        is rank-deficient there, so the planar homography-decomposition
        hypothesis family must carry the solve (sfm/pnp.py::_planar_pose).
        Before that family existed, sets fitting the TRUE pose at 92%/6px
        were rejected at 17% consensus."""
        from scipy.spatial.transform import Rotation as ScipyR

        # a tilted plane in front of the camera
        n_pts = 120
        e1 = np.array([1.0, 0.1, 0.2]); e1 /= np.linalg.norm(e1)
        e2 = np.array([-0.1, 1.0, 0.1]); e2 -= e1 * (e2 @ e1)
        e2 /= np.linalg.norm(e2)
        origin = np.array([0.0, 0.0, 9.0])
        ab = rng.uniform(-3, 3, size=(n_pts, 2))
        X = (origin + ab[:, :1] * e1 + ab[:, 1:] * e2).astype(np.float32)
        R = ScipyR.from_rotvec([0.05, -0.15, 0.02]).as_matrix().astype(
            np.float32)
        t = np.array([0.4, -0.1, 0.3], np.float32)
        uv = _project(X, R, t) + rng.normal(
            0, 0.3, size=(n_pts, 2)).astype(np.float32)
        res = pnp_ransac(jnp.asarray(X), jnp.asarray(uv),
                         jnp.ones(n_pts, bool), jnp.asarray(K),
                         jax.random.PRNGKey(3))
        assert int(res.n_inliers) > 100, int(res.n_inliers)
        np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-2)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=8e-2)

    def test_pnp_mostly_planar_with_outliers(self, rng):
        """80% of points on one plane + 20% off-plane structure + gross
        outliers: both hypothesis families compete, the winner must still
        be the true pose."""
        from scipy.spatial.transform import Rotation as ScipyR

        n_pl, n_gen = 160, 40
        e1 = np.array([1.0, 0.0, 0.3]); e1 /= np.linalg.norm(e1)
        e2 = np.array([0.0, 1.0, 0.0])
        origin = np.array([0.0, 0.0, 10.0])
        ab = rng.uniform(-4, 4, size=(n_pl, 2))
        Xp = origin + ab[:, :1] * e1 + ab[:, 1:] * e2
        Xg = rng.uniform([-3, -2, 5], [3, 2, 14], size=(n_gen, 3))
        X = np.concatenate([Xp, Xg]).astype(np.float32)
        R = ScipyR.from_rotvec([0.02, 0.2, -0.03]).as_matrix().astype(
            np.float32)
        t = np.array([-0.5, 0.1, 0.2], np.float32)
        uv = _project(X, R, t) + rng.normal(
            0, 0.4, size=(len(X), 2)).astype(np.float32)
        uv[:30] = rng.uniform([0, 0], [640, 480], size=(30, 2))  # outliers
        res = pnp_ransac(jnp.asarray(X), jnp.asarray(uv),
                         jnp.ones(len(X), bool), jnp.asarray(K),
                         jax.random.PRNGKey(4))
        assert int(res.n_inliers) > 140, int(res.n_inliers)
        np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-2)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=8e-2)
