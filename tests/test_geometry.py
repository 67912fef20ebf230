"""Closed-form + property tests for core geometry (SURVEY.md §4 test plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyR

from tpu3drec.core import (
    quat_wxyz_to_matrix,
    quat_xyzw_to_matrix,
    matrix_to_quat_wxyz,
    quat_multiply,
    quat_conjugate,
    quat_wxyz_from_xyzw,
    SE3,
    se3_inverse,
    se3_compose,
    se3_apply,
    se3_matrix,
    axis_angle_to_matrix,
    matrix_to_axis_angle,
)
from tpu3drec.core.se3 import colmap_cam_to_world, colmap_world_to_cam


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_identity(self):
        np.testing.assert_allclose(
            quat_wxyz_to_matrix(jnp.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-6
        )

    def test_matches_scipy_xyzw(self, rng):
        """Our xyzw path must equal scipy.from_quat — the convention the
        reference's hot path uses (camera_to_world.py:53-55)."""
        q = random_quats(rng, 64)
        ours = np.asarray(quat_xyzw_to_matrix(jnp.asarray(q)))
        theirs = ScipyR.from_quat(q).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_90deg_about_z(self):
        # wxyz quaternion for +90° about z
        s = np.sqrt(0.5)
        R = np.asarray(quat_wxyz_to_matrix(jnp.array([s, 0, 0, s])))
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)

    def test_roundtrip_matrix(self, rng):
        q = random_quats(rng, 128)
        q *= np.where(q[:, :1] < 0, -1.0, 1.0)  # canonical sign, wxyz col 0
        # interpret as wxyz
        R = quat_wxyz_to_matrix(jnp.asarray(q))
        q2 = np.asarray(matrix_to_quat_wxyz(R))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_multiply_vs_matrix_product(self, rng):
        a, b = random_quats(rng, 8), random_quats(rng, 8)
        Rab = np.asarray(quat_wxyz_to_matrix(quat_multiply(jnp.asarray(a), jnp.asarray(b))))
        RaRb = np.einsum(
            "nij,njk->nik",
            np.asarray(quat_wxyz_to_matrix(jnp.asarray(a))),
            np.asarray(quat_wxyz_to_matrix(jnp.asarray(b))),
        )
        np.testing.assert_allclose(Rab, RaRb, atol=1e-5)

    def test_conjugate_is_inverse(self, rng):
        q = jnp.asarray(random_quats(rng, 8))
        prod = quat_multiply(q, quat_conjugate(q))
        np.testing.assert_allclose(prod[:, 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(prod[:, 1:], 0.0, atol=1e-6)


class TestSE3:
    def test_inverse(self, rng):
        q = random_quats(rng, 16)
        T = SE3(quat_wxyz_to_matrix(jnp.asarray(q)), jnp.asarray(rng.normal(size=(16, 3))))
        I = se3_compose(T, se3_inverse(T))
        np.testing.assert_allclose(I.R, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(I.t, 0.0, atol=1e-5)

    def test_compose_apply(self, rng):
        qa, qb = random_quats(rng, 1)[0], random_quats(rng, 1)[0]
        A = SE3(quat_wxyz_to_matrix(jnp.asarray(qa)), jnp.asarray(rng.normal(size=3)))
        B = SE3(quat_wxyz_to_matrix(jnp.asarray(qb)), jnp.asarray(rng.normal(size=3)))
        x = jnp.asarray(rng.normal(size=3))
        np.testing.assert_allclose(
            se3_apply(se3_compose(A, B), x), se3_apply(A, se3_apply(B, x)), atol=1e-5
        )

    def test_matrix_roundtrip(self, rng):
        q = random_quats(rng, 4)
        T = SE3(quat_wxyz_to_matrix(jnp.asarray(q)), jnp.asarray(rng.normal(size=(4, 3))))
        M = se3_matrix(T)
        assert M.shape == (4, 4, 4)
        T2 = SE3.from_matrix(M)
        np.testing.assert_allclose(T2.R, T.R, atol=1e-6)
        np.testing.assert_allclose(T2.t, T.t, atol=1e-6)

    def test_colmap_convention(self, rng):
        """p_w = R^{-1}(p_c - t), the reference math at
        camera_to_world.py:86-105, must equal our cam_to_world transform."""
        q = random_quats(rng, 1)[0]
        q_xyzw = np.array([q[1], q[2], q[3], q[0]])
        t = rng.normal(size=3)
        p_c = rng.normal(size=3)
        R = ScipyR.from_quat(q_xyzw).as_matrix()
        expected = np.linalg.inv(R) @ (p_c - t)
        got = se3_apply(colmap_cam_to_world(jnp.asarray(q_xyzw), jnp.asarray(t)), jnp.asarray(p_c))
        np.testing.assert_allclose(got, expected, atol=1e-5)
        # and world->cam is its inverse
        back = se3_apply(colmap_world_to_cam(jnp.asarray(q_xyzw), jnp.asarray(t)), got)
        np.testing.assert_allclose(back, p_c, atol=1e-5)


class TestAxisAngle:
    def test_roundtrip(self, rng):
        # keep |theta| < pi: matrix->axis-angle returns the principal angle
        aa = rng.normal(size=(32, 3))
        aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, size=(32, 1))
        R = axis_angle_to_matrix(jnp.asarray(aa))
        aa2 = np.asarray(matrix_to_axis_angle(R))
        np.testing.assert_allclose(aa2, aa, atol=1e-4)

    def test_matches_scipy(self, rng):
        aa = rng.normal(size=(16, 3))
        ours = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        theirs = ScipyR.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_small_angle_stable(self):
        aa = jnp.array([[1e-10, 0, 0], [0.0, 0, 0]])
        R = axis_angle_to_matrix(aa)
        assert np.all(np.isfinite(np.asarray(R)))
        g = jax.grad(lambda a: jnp.sum(axis_angle_to_matrix(a)))(aa)
        assert np.all(np.isfinite(np.asarray(g)))
