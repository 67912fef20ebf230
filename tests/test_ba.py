"""Bundle adjustment tests: synthetic multi-view scenes with known optimum."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as ScipyR

from tpu3drec.core.se3 import axis_angle_to_matrix, matrix_to_axis_angle
from tpu3drec.sfm.ba import BAProblem, ba_solve, residuals

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def _make_problem(rng, F=6, L=120, noise_px=0.0, perturb=0.0, outlier_frac=0.0):
    """Cameras on an arc looking at a point cloud; full visibility."""
    X = rng.uniform([-2, -2, 6], [2, 2, 12], size=(L, 3)).astype(np.float32)
    cams = []
    for f in range(F):
        angle = 0.08 * (f - F / 2)
        Rm = ScipyR.from_rotvec([0, angle, 0]).as_matrix()
        t = np.array([-1.5 * angle * 8, 0.02 * f, 0.05 * f])
        cams.append((Rm.astype(np.float32), t.astype(np.float32)))

    cam_idx, pt_idx, uvs = [], [], []
    for f, (Rm, t) in enumerate(cams):
        Xc = X @ Rm.T + t
        uv = Xc[:, :2] / Xc[:, 2:3]
        uv = uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        cam_idx += [f] * L
        pt_idx += list(range(L))
        uvs.append(uv)
    uv = np.concatenate(uvs).astype(np.float32)
    if noise_px:
        uv += rng.normal(0, noise_px, size=uv.shape).astype(np.float32)
    O = len(cam_idx)
    weight = np.ones(O, np.float32)
    if outlier_frac:
        n_out = int(outlier_frac * O)
        idx = rng.permutation(O)[:n_out]
        uv[idx] += rng.uniform(30, 120, size=(n_out, 2)).astype(np.float32)

    cam_params = np.stack([
        np.concatenate([
            np.asarray(matrix_to_axis_angle(jnp.asarray(Rm))), t
        ]) for Rm, t in cams
    ]).astype(np.float32)
    gt_cam_params = cam_params.copy()
    points = X.copy()
    if perturb:
        cam_params = cam_params + np.concatenate(
            [np.zeros((1, 6)), rng.normal(0, perturb, size=(F - 1, 6))]
        ).astype(np.float32)
        points = X + rng.normal(0, perturb * 10, size=X.shape).astype(np.float32)

    prob = BAProblem(
        cam_params=jnp.asarray(cam_params),
        points=jnp.asarray(points),
        cam_idx=jnp.asarray(cam_idx, dtype=jnp.int32),
        pt_idx=jnp.asarray(pt_idx, dtype=jnp.int32),
        uv=jnp.asarray(uv),
        weight=jnp.asarray(weight),
        K=jnp.asarray(K),
    )
    return prob, gt_cam_params, X


def test_residuals_zero_at_gt(rng):
    prob, _, _ = _make_problem(rng)
    r = np.asarray(residuals(prob))
    assert np.abs(r).max() < 1e-2


def test_ba_recovers_from_perturbation(rng):
    prob, gt_cams, gt_X = _make_problem(rng, perturb=0.01)
    r0 = np.abs(np.asarray(residuals(prob))).mean()
    assert r0 > 1.0  # perturbation is visible
    res = ba_solve(prob, max_lm_iters=25, cg_iters=30)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-4
    r1 = np.abs(np.asarray(residuals(prob._replace(
        cam_params=res.cam_params, points=res.points)))).mean()
    assert r1 < 1e-2
    # gauge-fixed camera stayed put
    np.testing.assert_allclose(np.asarray(res.cam_params)[0], gt_cams[0], atol=1e-6)


def test_ba_with_noise_converges_to_noise_floor(rng):
    prob, _, _ = _make_problem(rng, noise_px=0.5, perturb=0.005)
    res = ba_solve(prob, max_lm_iters=25, cg_iters=30)
    r = np.asarray(residuals(prob._replace(
        cam_params=res.cam_params, points=res.points)))
    rms = np.sqrt((r ** 2).mean())
    assert rms < 1.0  # close to the 0.5px noise floor


def test_ba_huber_downweights_outliers(rng):
    prob, gt_cams, gt_X = _make_problem(rng, perturb=0.005, outlier_frac=0.05)
    res = ba_solve(prob, max_lm_iters=30, cg_iters=30, huber_px=2.0)
    # inlier residuals should still be near zero despite 5% gross outliers
    r = np.asarray(residuals(prob._replace(
        cam_params=res.cam_params, points=res.points)))
    norms = np.linalg.norm(r, axis=-1)
    assert np.median(norms) < 0.5


def test_ba_respects_weights_mask(rng):
    prob, _, _ = _make_problem(rng, perturb=0.01)
    # corrupt a block of observations but zero their weights
    uv = np.asarray(prob.uv).copy()
    uv[:50] += 500.0
    w = np.asarray(prob.weight).copy()
    w[:50] = 0.0
    prob = prob._replace(uv=jnp.asarray(uv), weight=jnp.asarray(w))
    res = ba_solve(prob, max_lm_iters=25, cg_iters=30)
    r = np.asarray(residuals(prob._replace(
        cam_params=res.cam_params, points=res.points)))[50:]
    assert np.abs(r).mean() < 1e-2


def test_depth_prior_fixes_scale(rng):
    """Reprojection-only BA has a free scale gauge; with per-observation
    metric depth the scale is pinned. Shrink the whole problem by 0.7 and
    let the depth rows pull it back."""
    prob, gt_cams, gt_X = _make_problem(rng, F=4, L=80)
    # true camera-frame depths for each observation
    from tpu3drec.core.se3 import axis_angle_to_matrix
    cams = np.asarray(prob.cam_params)
    Xs = np.asarray(prob.points)
    ci = np.asarray(prob.cam_idx)
    pi = np.asarray(prob.pt_idx)
    z = np.empty(len(ci), np.float32)
    for o in range(len(ci)):
        R = np.asarray(axis_angle_to_matrix(jnp.asarray(cams[ci[o], :3])))
        z[o] = (R @ Xs[pi[o]] + cams[ci[o], 3:])[2]

    s = 0.7
    shrunk = prob._replace(
        cam_params=jnp.asarray(
            np.concatenate([cams[:, :3], cams[:, 3:] * s], axis=1)),
        points=jnp.asarray(Xs * s),
        depth=jnp.asarray(z),
        depth_weight=5.0,
    )
    # free everything except cam0 rotation+translation... keep cam0 frozen:
    # depth rows now carry the scale information
    res = ba_solve(shrunk, max_lm_iters=30, cg_iters=30)
    # recovered camera-frame depths must match the metric measurements
    new_cams = np.asarray(res.cam_params)
    new_X = np.asarray(res.points)
    z_new = np.empty(len(ci), np.float32)
    for o in range(len(ci)):
        R = np.asarray(axis_angle_to_matrix(jnp.asarray(new_cams[ci[o], :3])))
        z_new[o] = (R @ new_X[pi[o]] + new_cams[ci[o], 3:])[2]
    rel = np.abs(z_new - z) / z
    assert np.median(rel) < 0.02, np.median(rel)


def test_depth_prior_zero_depth_rows_inactive(rng):
    """depth=0 rows contribute nothing: the converged quality must match the
    no-depth path. (Raw parameters are compared loosely — the two programs
    sum in different orders and LM amplifies f32 noise along the 7-dof gauge
    null-space, where parameters move freely at equal cost.)"""
    prob, _, _ = _make_problem(rng, F=4, L=60, perturb=0.005)
    res_plain = ba_solve(prob, max_lm_iters=8, cg_iters=15)
    res_zero = ba_solve(
        prob._replace(depth=jnp.zeros(prob.uv.shape[0]), depth_weight=5.0),
        max_lm_iters=8, cg_iters=15,
    )
    np.testing.assert_allclose(
        float(res_zero.initial_cost), float(res_plain.initial_cost), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(res_zero.final_cost), float(res_plain.final_cost),
        rtol=1e-3, atol=1e-5,
    )
    r_zero = np.asarray(residuals(prob._replace(
        cam_params=res_zero.cam_params, points=res_zero.points)))
    assert np.abs(r_zero).mean() < 1e-2  # converged to the same quality


def test_pallas_blocks_path_converges_like_jacfwd(rng):
    """The Pallas assembly kernel + manifold update must reach the same
    converged quality as the jacfwd path (different parameterizations ->
    compare residual quality, not raw parameters)."""
    prob, _, _ = _make_problem(rng, F=5, L=80, perturb=0.008)
    res_ref = ba_solve(prob, max_lm_iters=20, cg_iters=25)
    res_pal = ba_solve(prob, max_lm_iters=20, cg_iters=25,
                       use_pallas_blocks=True)
    r_ref = np.abs(np.asarray(residuals(prob._replace(
        cam_params=res_ref.cam_params, points=res_ref.points)))).mean()
    r_pal = np.abs(np.asarray(residuals(prob._replace(
        cam_params=res_pal.cam_params, points=res_pal.points)))).mean()
    assert r_pal < 1e-2, r_pal
    assert r_pal < max(10 * r_ref, 1e-3)


def test_lm_early_exit_gates_iterations():
    """Noise-free problem starting AT the optimum: the first accepted step
    yields ~zero relative improvement, so the while_loop must stop after a
    couple of iterations instead of burning max_lm_iters (VERDICT r1
    item 8: the done flag has to gate work)."""
    rng = np.random.default_rng(0)
    prob, _, _ = _make_problem(rng, noise_px=0.0, perturb=0.0)
    res = ba_solve(prob, max_lm_iters=40, cg_iters=10)
    assert int(res.n_iters) <= 5, int(res.n_iters)
    # and a perturbed problem still converges (exit is not premature)
    prob2, _, _ = _make_problem(rng, noise_px=0.0, perturb=0.02)
    res2 = ba_solve(prob2, max_lm_iters=40, cg_iters=15)
    assert float(res2.final_cost) < 1e-2 * float(res2.initial_cost)
    assert int(res2.n_iters) < 40
