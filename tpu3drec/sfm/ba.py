"""Bundle adjustment: Levenberg-Marquardt with an iterative Schur complement.

The COLMAP/Ceres-class core the reference outsources (SURVEY.md C3:
"bundle adjustment ... poses with unknown scale"). TPU-first design:

* **Static sparsity**: observations are flat arrays (cam_idx, pt_idx, uv,
  weight); padded slots carry weight 0. No CSR, no dynamic structures.
* **Schur complement without materializing S**: the reduced camera system
  S dc = b~ is solved by preconditioned CG where each S.v product is four
  segment-gather/scatter passes over the observation array
  (U v - W V^{-1} W^T v). Landmark blocks V are 3x3 diagonal-block
  inverses, camera blocks U the 6x6 block-Jacobi preconditioner.
* **Distribution**: every reduction is a `segment_sum` over observations —
  shard the observation arrays over the mesh and XLA lowers the reductions
  to psums over ICI (the "distributed Schur-complement BA" of SURVEY.md
  §2.3/§7; the explicit shard_map harness lives in parallel/).
* **Robustness**: Huber weights re-evaluated each LM iteration (IRLS).
* Gauge: a per-camera update mask (default: camera 0 frozen).

Per-observation Jacobians come from vmapped `jacfwd` of the single-
observation projection — closed-form speed with none of the transcription
risk; the Pallas fused-assembly variant lives in `ops/ba_blocks.py`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu3drec.core.se3 import axis_angle_to_matrix, matrix_to_axis_angle


class BAProblem(NamedTuple):
    cam_params: jnp.ndarray  # (F, 6) [axis-angle | translation], world->cam
    points: jnp.ndarray      # (L, 3)
    cam_idx: jnp.ndarray     # (O,) int32
    pt_idx: jnp.ndarray      # (O,) int32
    uv: jnp.ndarray          # (O, 2) pixel observations
    weight: jnp.ndarray      # (O,) 0 = padding/invalid
    K: jnp.ndarray           # (3, 3) shared intrinsics
    depth: jnp.ndarray | None = None   # (O,) metric z per obs, 0 = none —
                                       # anchors the scale gauge (fixes the
                                       # forward-motion weak mode, design.md §7)
    depth_weight: float = 1.0          # residual weight (px-equivalent units)


class BAResult(NamedTuple):
    cam_params: jnp.ndarray
    points: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    n_iters: jnp.ndarray


def _project_one(cam, X, K):
    """One observation's residual basis: world point -> pixel coords."""
    R = axis_angle_to_matrix(cam[:3])
    Xc = R @ X + cam[3:]
    z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
    u = Xc[0] / z * K[0, 0] + K[0, 2]
    v = Xc[1] / z * K[1, 1] + K[1, 2]
    return jnp.stack([u, v])


def _residual_one_depth(cam, X, K, uv, d, wd):
    """Extended residual with a metric-depth prior row:
    [u - u_m, v - v_m, wd * has_depth * (z - d)]."""
    R = axis_angle_to_matrix(cam[:3])
    Xc = R @ X + cam[3:]
    z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
    u = Xc[0] / z * K[0, 0] + K[0, 2]
    v = Xc[1] / z * K[1, 1] + K[1, 2]
    has = (d > 1e-6).astype(cam.dtype)
    return jnp.stack([u - uv[0], v - uv[1], wd * has * (Xc[2] - d)])


def residuals(p: BAProblem) -> jnp.ndarray:
    """(O, 2) reprojection residuals — or (O, 3) with a depth-prior row when
    the problem carries per-observation metric depth."""
    cams = p.cam_params[p.cam_idx]
    pts = p.points[p.pt_idx]
    if p.depth is not None:
        wd = jnp.asarray(p.depth_weight, p.uv.dtype)
        return jax.vmap(_residual_one_depth, in_axes=(0, 0, None, 0, 0, None))(
            cams, pts, p.K, p.uv, p.depth, wd
        )
    pred = jax.vmap(_project_one, in_axes=(0, 0, None))(cams, pts, p.K)
    return pred - p.uv


def huber_weights(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weights for the Huber loss on the *pixel* residual norm, (O,)
    (the depth-prior row, if present, does not drive robustness)."""
    n = jnp.linalg.norm(r[..., :2], axis=-1)
    return jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, 1e-12))


def _obs_jacobians(p: BAProblem):
    """Per-observation Jacobians: (O,2,6) wrt camera, (O,2,3) wrt point."""
    cams = p.cam_params[p.cam_idx]
    pts = p.points[p.pt_idx]

    if p.depth is not None:
        wd = jnp.asarray(p.depth_weight, p.uv.dtype)

        def one_d(cam, X, uv, d):
            Jc = jax.jacfwd(
                lambda c: _residual_one_depth(c, X, p.K, uv, d, wd))(cam)
            Jp = jax.jacfwd(
                lambda x: _residual_one_depth(cam, x, p.K, uv, d, wd))(X)
            return Jc, Jp

        return jax.vmap(one_d)(cams, pts, p.uv, p.depth)

    def one(cam, X):
        Jc = jax.jacfwd(lambda c: _project_one(c, X, p.K))(cam)
        Jp = jax.jacfwd(lambda x: _project_one(cam, x, p.K))(X)
        return Jc, Jp

    return jax.vmap(one)(cams, pts)


def _seg_sum(vals, idx, num):
    return jax.ops.segment_sum(vals, idx, num_segments=num)


def _solve_spd_blocks(blocks, rhs):
    """Batched solve of small SPD systems (B, n, n) x (B, n)."""
    return jnp.linalg.solve(blocks, rhs[..., None])[..., 0]


@partial(jax.jit, static_argnames=("max_lm_iters", "cg_iters", "use_pallas_blocks"))
def ba_solve(
    p: BAProblem,
    max_lm_iters: int = 20,
    cg_iters: int = 20,
    huber_px: float = 2.0,
    init_lambda: float = 1e-3,
    fix_cam_mask: jnp.ndarray | None = None,
    use_pallas_blocks: bool = False,
    salt: jnp.ndarray | None = None,
) -> BAResult:
    """Run LM. `fix_cam_mask` (F,) 1.0 = free, 0.0 = frozen (default:
    camera 0 frozen for gauge).

    ``use_pallas_blocks=True`` swaps the jacfwd Jacobians for the fused
    Pallas assembly kernel (`ops/ba_blocks.py`, closed-form local-se(3)
    parameterization); the LM update is then applied on the manifold
    (R <- exp(w) R). Depth-prior rows are not supported on this path.

    ``salt`` (utils/relayguard.dispatch_salt): dead operand folded into
    the camera parameters so successive host-loop solves with bf16-close
    inputs hash as distinct dispatches on the memoizing relay runtime
    (docs/design.md §6). Bit-exact no-op on the result:
    x * (1 + 0*salt) == x."""
    if use_pallas_blocks and p.depth is not None:
        raise ValueError("use_pallas_blocks does not support depth priors")
    if salt is not None:
        p = p._replace(cam_params=p.cam_params * (1.0 + 0.0 * salt))
    F = p.cam_params.shape[0]
    L = p.points.shape[0]
    if fix_cam_mask is None:
        fix_cam_mask = jnp.concatenate([jnp.zeros(1), jnp.ones(F - 1)])
    # accept per-camera (F,) or per-parameter (F,6) masks; reprojection-only
    # BA has a 7-dof gauge (global SE3 + scale), so callers typically freeze
    # camera 0 fully and camera 1's translation (scale anchor)
    fix_cam_mask = jnp.asarray(fix_cam_mask)
    if fix_cam_mask.ndim == 1:
        cam_free = fix_cam_mask[:, None]  # (F,1) broadcasting over 6 params
    else:
        cam_free = fix_cam_mask  # (F,6)

    def cost_of(cam_params, points):
        r = residuals(p._replace(cam_params=cam_params, points=points))
        n = jnp.linalg.norm(r[..., :2], axis=-1)
        # Huber on the pixel part AND on the depth-prior row (depth lookups
        # at occlusion boundaries are gross outliers; quadratic penalties
        # let a single bad lookup bend the whole window)
        c = jnp.where(
            n <= huber_px, 0.5 * n ** 2, huber_px * (n - 0.5 * huber_px)
        )
        if r.shape[-1] > 2:
            a = jnp.abs(r[..., 2])
            c = c + jnp.where(
                a <= huber_px, 0.5 * a ** 2, huber_px * (a - 0.5 * huber_px)
            )
        return jnp.sum(c * p.weight)

    init_cost = cost_of(p.cam_params, p.points)

    def lm_step(carry):
        cam_params, points, lam, cost, done, it = carry
        prob = p._replace(cam_params=cam_params, points=points)
        r = residuals(prob)  # (O,2) or (O,3) with depth rows
        w = p.weight * huber_weights(r, huber_px)  # (O,)
        if r.shape[-1] > 2:
            # row-wise robustness for the depth prior: scale the depth row
            # of the residual (IRLS sqrt-weight); the matching Jacobian row
            # is scaled after it is computed below
            a = jnp.abs(r[..., 2])
            s_d = jnp.sqrt(
                jnp.where(a <= huber_px, 1.0, huber_px / jnp.maximum(a, 1e-12))
            )
            r = r.at[:, 2].multiply(s_d)
        if use_pallas_blocks:
            from tpu3drec.ops.ba_blocks import ba_blocks

            Rmat = axis_angle_to_matrix(cam_params[:, :3])[p.cam_idx]
            Xc = (
                jnp.einsum("oij,oj->oi", Rmat, points[p.pt_idx],
                           precision="highest")
                + cam_params[p.cam_idx, 3:]
            )
            blocks = ba_blocks(Xc, Rmat, p.uv, w, p.K)
            Jc, Jp = blocks["Jc"], blocks["Jp"]
        else:
            Jc, Jp = _obs_jacobians(prob)  # (O,i,6), (O,i,3)
        if Jc.shape[1] > 2:
            Jc = Jc.at[:, 2, :].multiply(s_d[:, None])
            Jp = Jp.at[:, 2, :].multiply(s_d[:, None])

        wJc = Jc * w[:, None, None]
        wJp = Jp * w[:, None, None]
        # normal-equation blocks
        U = _seg_sum(jnp.einsum("oia,oib->oab", wJc, Jc, precision="highest"), p.cam_idx, F)  # (F,6,6)
        V = _seg_sum(jnp.einsum("oia,oib->oab", wJp, Jp, precision="highest"), p.pt_idx, L)   # (L,3,3)
        b_c = -_seg_sum(jnp.einsum("oia,oi->oa", wJc, r, precision="highest"), p.cam_idx, F)  # (F,6)
        b_p = -_seg_sum(jnp.einsum("oia,oi->oa", wJp, r, precision="highest"), p.pt_idx, L)   # (L,3)

        # additive damping (Levenberg): U + lam I, V + lam I
        U_l = U + lam * jnp.eye(6)[None]
        V_l = V + lam * jnp.eye(3)[None]
        V_inv = jnp.linalg.inv(V_l + 1e-12 * jnp.eye(3)[None])

        # reduced RHS: b~ = b_c - W V^-1 b_p, assembled per observation
        y = jnp.einsum("lab,lb->la", V_inv, b_p, precision="highest")  # (L,3)
        Wy = jnp.einsum("oia,oib,ob->oa", wJc, Jp, y[p.pt_idx], precision="highest")  # (O,6)
        b_tilde = b_c - _seg_sum(Wy, p.cam_idx, F)  # (F,6)
        b_tilde = b_tilde * cam_free

        # preconditioner: block-Jacobi on U_l
        U_inv = jnp.linalg.inv(U_l + 1e-12 * jnp.eye(6)[None])

        def S_matvec(v):  # v (F,6)
            v = v * cam_free
            Uv = jnp.einsum("fab,fb->fa", U_l, v, precision="highest")
            # W^T v per landmark: sum over obs of Jp^T w Jc v_cam
            JcV = jnp.einsum("oib,ob->oi", Jc, v[p.cam_idx], precision="highest")        # (O,2)
            WtV = _seg_sum(jnp.einsum("oia,oi->oa", wJp, JcV, precision="highest"), p.pt_idx, L)  # (L,3)
            z = jnp.einsum("lab,lb->la", V_inv, WtV, precision="highest")                # (L,3)
            Jpz = jnp.einsum("oib,ob->oi", Jp, z[p.pt_idx], precision="highest")         # (O,2)
            WVWt = _seg_sum(jnp.einsum("oia,oi->oa", wJc, Jpz, precision="highest"), p.cam_idx, F)
            return (Uv - WVWt) * cam_free

        def M_inv(v):
            return jnp.einsum("fab,fb->fa", U_inv, v) * cam_free

        # PCG on S dc = b_tilde
        x0 = jnp.zeros_like(b_tilde)
        r0 = b_tilde
        z0 = M_inv(r0)
        p0 = z0

        def cg_body(carry, _):
            x, rr, z, pd, rz = carry
            Sp = S_matvec(pd)
            alpha = rz / jnp.maximum(jnp.sum(pd * Sp), 1e-20)
            x = x + alpha * pd
            rr = rr - alpha * Sp
            z = M_inv(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            pd = z + beta * pd
            return (x, rr, z, pd, rz_new), None

        (dc, _, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, r0, z0, p0, jnp.sum(r0 * z0)), None, length=cg_iters
        )

        # back-substitute landmarks: dp = V^-1 (b_p - W^T dc)
        Jcdc = jnp.einsum("oib,ob->oi", Jc, dc[p.cam_idx], precision="highest")  # (O,2)
        Wtdc = _seg_sum(jnp.einsum("oia,oi->oa", wJp, Jcdc, precision="highest"), p.pt_idx, L)
        dp = jnp.einsum("lab,lb->la", V_inv, b_p - Wtdc, precision="highest")

        if use_pallas_blocks:
            # manifold update: R <- exp(w) R, t <- exp(w) t + nu
            dcm = dc * cam_free
            dR = axis_angle_to_matrix(dcm[:, :3])
            R_new = jnp.einsum("fij,fjk->fik", dR,
                               axis_angle_to_matrix(cam_params[:, :3]),
                               precision="highest")
            new_cams = jnp.concatenate(
                [
                    matrix_to_axis_angle(R_new),
                    jnp.einsum("fij,fj->fi", dR, cam_params[:, 3:],
                               precision="highest") + dcm[:, 3:],
                ],
                axis=1,
            )
        else:
            new_cams = cam_params + (dc * cam_free).reshape(F, 6)
        new_points = points + dp
        new_cost = cost_of(new_cams, new_points)
        accept = new_cost < cost

        cam_params = jnp.where(accept, new_cams, cam_params)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9),
                        jnp.minimum(lam * 5.0, 1e6))
        cost_out = jnp.where(accept, new_cost, cost)
        rel = jnp.abs(cost - cost_out) / jnp.maximum(cost, 1e-12)
        # converged (tiny accepted improvement), at machine-precision cost
        # (relative improvement is meaningless in float noise there), or
        # stalled (damping saturated): stop paying for iterations
        cost_floor = 1e-8 * jnp.maximum(jnp.sum(p.weight), 1.0)
        done = (done | (accept & (rel < 1e-7)) | (cost_out <= cost_floor)
                | (~accept & (lam >= 1e6)))
        return (cam_params, points, lam, cost_out, done, it + 1)

    # early-exit LM (VERDICT r1 item 8: the done flag must gate work —
    # a while_loop skips the remaining iterations entirely, which at
    # COLMAP scale is most of the wall time once converged)
    def lm_cond(carry):
        *_, done, it = carry
        return (it < max_lm_iters) & ~done

    (cams, pts, _, final_cost, _, n_it) = jax.lax.while_loop(
        lm_cond, lm_step,
        (p.cam_params, p.points, jnp.asarray(init_lambda, p.cam_params.dtype),
         init_cost, jnp.asarray(False), jnp.asarray(0, jnp.int32)),
    )
    return BAResult(
        cam_params=cams, points=pts,
        initial_cost=init_cost, final_cost=final_cost,
        n_iters=n_it,
    )
