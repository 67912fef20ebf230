"""ICP + Umeyama alignment tests (closed-form ground truth)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyR

from tpu3drec.sfm.icp import (
    pairwise_sqdist,
    nearest_neighbors,
    umeyama,
    icp,
    icp_point_to_plane,
    icp_scale_correction,
    estimate_normals,
)


def _random_rigid(rng, scale=1.0):
    R = ScipyR.from_rotvec(rng.normal(size=3) * 0.3).as_matrix()
    t = rng.normal(size=3)
    T = np.eye(4)
    T[:3, :3] = scale * R
    T[:3, 3] = t
    return T


def test_pairwise_sqdist_exact(rng):
    a = rng.normal(size=(10, 3)).astype(np.float32)
    b = rng.normal(size=(7, 3)).astype(np.float32)
    d = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_nearest_neighbors_blocked(rng):
    q = rng.normal(size=(50, 3)).astype(np.float32)
    r = rng.normal(size=(333, 3)).astype(np.float32)
    idx, d2 = nearest_neighbors(jnp.asarray(q), jnp.asarray(r), block=64)
    ref = ((q[:, None] - r[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), ref.min(1), atol=1e-4)


def test_umeyama_exact_recovery(rng):
    src = rng.normal(size=(100, 3)).astype(np.float32)
    T = _random_rigid(rng, scale=2.5)
    dst = src @ (T[:3, :3]).T + T[:3, 3]
    s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.ones(100))
    np.testing.assert_allclose(float(s), 2.5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s * R), T[:3, :3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-4)


def test_umeyama_no_scale(rng):
    src = rng.normal(size=(60, 3)).astype(np.float32)
    T = _random_rigid(rng, scale=1.0)
    dst = src @ T[:3, :3].T + T[:3, 3]
    s, R, t = umeyama(jnp.asarray(src), jnp.asarray(dst), jnp.ones(60), with_scale=False)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)


def test_icp_recovers_similarity(rng):
    # structured cloud (grid + noise) so NN correspondences are informative
    g = np.stack(np.meshgrid(np.linspace(0, 2, 12), np.linspace(0, 1, 8),
                             np.linspace(0, 0.5, 4)), -1).reshape(-1, 3)
    src = (g + 0.01 * rng.normal(size=g.shape)).astype(np.float32)
    T_true = _random_rigid(rng, scale=1.8)
    dst = (src @ T_true[:3, :3].T + T_true[:3, 3]).astype(np.float32)
    res = icp(jnp.asarray(src), jnp.asarray(dst), iters=30, block=128)
    np.testing.assert_allclose(np.asarray(res.T), T_true, atol=5e-2)
    np.testing.assert_allclose(float(res.scale), 1.8, rtol=5e-2)
    assert float(res.rmse) < 1e-2


def test_icp_partial_overlap_trimming(rng):
    # irregular cloud: a regular lattice would alias under point-to-point NN
    g = rng.uniform([0, 0, 0], [2, 1, 0.5], size=(300, 3)).astype(np.float32)
    T_true = _random_rigid(rng, scale=1.0)
    dst_full = (g @ T_true[:3, :3].T + T_true[:3, 3]).astype(np.float32)
    # src only sees 80% of the scene
    src = g[: int(0.8 * len(g))]
    res = icp(jnp.asarray(src), jnp.asarray(dst_full), iters=30,
              with_scale=False, inlier_quantile=0.8, block=128)
    np.testing.assert_allclose(np.asarray(res.T), T_true, atol=5e-2)


def test_estimate_normals_plane(rng):
    # points on z=0 plane -> normals all +/- e_z
    pts = np.concatenate(
        [rng.uniform(0, 2, size=(200, 2)), np.zeros((200, 1))], axis=1
    ).astype(np.float32)
    nrm = np.asarray(estimate_normals(jnp.asarray(pts), k=8, block=64))
    assert np.abs(np.abs(nrm[:, 2]) - 1.0).max() < 1e-3
    assert np.abs(nrm[:, :2]).max() < 1e-3


def test_icp_point_to_plane_recovers_rigid(rng):
    # three mutually-orthogonal planes: fixes all 6 dof (a two-plane wedge
    # leaves sliding along the edge free under point-to-plane)
    a = np.concatenate([rng.uniform(0, 2, size=(200, 2)), np.zeros((200, 1))], 1)
    b = np.concatenate([rng.uniform(0, 2, size=(200, 1)), np.zeros((200, 1)),
                        rng.uniform(0, 1, size=(200, 1))], 1)
    c = np.concatenate([np.zeros((200, 1)), rng.uniform(0, 2, size=(200, 1)),
                        rng.uniform(0, 1, size=(200, 1))], 1)
    g = np.concatenate([a, b, c]).astype(np.float32)
    T_true = _random_rigid(rng, scale=1.0)
    dst = (g @ T_true[:3, :3].T + T_true[:3, 3]).astype(np.float32)
    res = icp_point_to_plane(jnp.asarray(g), jnp.asarray(dst), iters=20, block=128)
    np.testing.assert_allclose(np.asarray(res.T), T_true, atol=5e-2)
    assert float(res.rmse) < 1e-2
    assert float(res.scale) == 1.0


def test_icp_scale_correction_contract(rng, tmp_path):
    """The produced T must drop into the reference's fusion contract."""
    from tpu3drec.pipelines.icp_fusion import fuse_with_T
    from tpu3drec.utils.poseio import write_T_txt, read_T_txt

    g = rng.uniform(0, 1, size=(400, 3)).astype(np.float32)
    T_true = _random_rigid(rng, scale=0.7)
    cloud_a = (g @ T_true[:3, :3].T + T_true[:3, 3]).astype(np.float32)
    cloud_b = g
    T = np.asarray(icp_scale_correction(jnp.asarray(cloud_a), jnp.asarray(cloud_b),
                                        iters=100, block=128))
    p = str(tmp_path / "T_data.txt")
    write_T_txt(p, T)
    merged = fuse_with_T(cloud_a, cloud_b, read_T_txt(p))
    # after correction, transformed B should coincide with A
    err = np.abs(merged[len(cloud_a):] - cloud_a).max()
    assert err < 5e-2
