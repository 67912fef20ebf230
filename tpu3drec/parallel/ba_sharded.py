"""Landmark-sharded bundle adjustment — distributed Schur complement.

`sfm/ba.py` shards only the *observation* arrays: its segment-sums lower to
psums, but the landmark state (points, V-block inverses, back-substitution)
is replicated on every device, capping map size at single-device memory
(VERDICT r2: the §2.3 "keyframes/map blocks partitioned" claim only held at
the window level). This module lifts that cap: landmarks are PARTITIONED
over a mesh axis with `shard_map`, per SURVEY.md §2.3 "distributed BA"
(landmark blocks local, camera reduced system psum over ICI).

Layout (host-prepped by `prepare_landmark_shards`):

* landmark i lives on shard i // Ls (contiguous blocks, Ls = ceil(L/N));
* every observation is routed to its landmark's shard and carries a LOCAL
  landmark index — so V-block assembly, V^{-1}, and back-substitution are
  shard-local with zero communication;
* cameras are replicated: U, b_c, and each CG iteration's S·v product
  reduce with one `psum` of (F,6) over the axis — the only cross-shard
  traffic, riding ICI.

Same LM/PCG math as `sfm.ba.ba_solve` (Huber IRLS, additive damping,
block-Jacobi-preconditioned CG on the reduced camera system, early-exit
while_loop), INCLUDING per-observation metric depth-prior rows: a depth
residual is landmark-local exactly like a reprojection residual, so it
shards with its observation — the row count of the einsums changes from
2 to 3 and nothing about the communication pattern does (still one (F,6)
psum per CG iteration). This is what makes metric-scale reconstruction
possible at sharded-map scale (design.md §7). Replaces COLMAP's
single-node Ceres BA (reference workflow `ref/software_record/
colmap使用.docx` §2.5) with a multi-chip solver.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpu3drec.sfm.ba import (
    BAProblem,
    BAResult,
    _project_one,
    _residual_one_depth,
)


class _ShardedParts(NamedTuple):
    """Host-prepped, shard-ready arrays (leading dim = n_shards * per-shard)."""

    points: np.ndarray        # (N*Ls, 3) padded landmark blocks
    cam_idx: np.ndarray       # (N*Oc,) global camera ids
    pt_idx_local: np.ndarray  # (N*Oc,) LOCAL landmark ids in [0, Ls)
    uv: np.ndarray            # (N*Oc, 2)
    weight: np.ndarray        # (N*Oc,) 0 = padding
    L: int                    # original landmark count
    Ls: int                   # landmarks per shard
    Oc: int                   # observation capacity per shard
    depth: np.ndarray | None = None  # (N*Oc,) metric z per obs, 0 = none


def prepare_landmark_shards(p: BAProblem, n_shards: int) -> _ShardedParts:
    """Route observations to their landmark's shard; pad to static shapes.

    Per-shard observation capacity is the max over shards (rounded up to a
    lane-friendly multiple of 128); imbalance shows up as padded slots, not
    wrong answers.
    """
    pts = np.asarray(p.points)
    cam_idx = np.asarray(p.cam_idx)
    pt_idx = np.asarray(p.pt_idx)
    uv = np.asarray(p.uv)
    w = np.asarray(p.weight)

    L = pts.shape[0]
    Ls = -(-L // n_shards)
    pts_pad = np.zeros((n_shards * Ls, 3), pts.dtype)
    pts_pad[:L] = pts

    shard_of = pt_idx // Ls
    counts = np.bincount(shard_of, minlength=n_shards)
    Oc = int(-(-max(int(counts.max()), 1) // 128) * 128)

    ci = np.zeros((n_shards, Oc), cam_idx.dtype)
    pl = np.zeros((n_shards, Oc), pt_idx.dtype)
    ob = np.zeros((n_shards, Oc, 2), uv.dtype)
    ww = np.zeros((n_shards, Oc), w.dtype)
    dd = None
    if p.depth is not None:
        d_all = np.asarray(p.depth)
        dd = np.zeros((n_shards, Oc), d_all.dtype)
    for s in range(n_shards):
        sel = np.nonzero(shard_of == s)[0]
        n = sel.size
        ci[s, :n] = cam_idx[sel]
        pl[s, :n] = pt_idx[sel] - s * Ls
        ob[s, :n] = uv[sel]
        ww[s, :n] = w[sel]
        if dd is not None:
            dd[s, :n] = d_all[sel]

    return _ShardedParts(
        points=pts_pad, cam_idx=ci.reshape(-1), pt_idx_local=pl.reshape(-1),
        uv=ob.reshape(-1, 2), weight=ww.reshape(-1), L=L, Ls=Ls, Oc=Oc,
        depth=None if dd is None else dd.reshape(-1),
    )


def _jac_one(cam, X, K):
    Jc = jax.jacfwd(lambda c: _project_one(c, X, K))(cam)
    Jp = jax.jacfwd(lambda x: _project_one(cam, x, K))(X)
    return Jc, Jp


def _jac_one_depth(cam, X, K, uv, d, wd):
    Jc = jax.jacfwd(lambda c: _residual_one_depth(c, X, K, uv, d, wd))(cam)
    Jp = jax.jacfwd(lambda x: _residual_one_depth(cam, x, K, uv, d, wd))(X)
    return Jc, Jp


def ba_solve_landmark_sharded(
    p: BAProblem,
    mesh: Mesh,
    axis: str = "space",
    max_lm_iters: int = 20,
    cg_iters: int = 20,
    huber_px: float = 2.0,
    init_lambda: float = 1e-3,
    fix_cam_mask: jnp.ndarray | None = None,
) -> BAResult:
    """LM bundle adjustment with landmark state sharded over ``mesh[axis]``.

    Numerically equivalent to `sfm.ba.ba_solve` (observation contributions
    are the same sums, reassociated per shard), including metric depth-prior
    rows when ``p.depth`` is set; per-device landmark memory is L/N.
    Returns a BAResult with the full (unsharded) point array.
    """
    has_depth = p.depth is not None
    n_shards = mesh.shape[axis]
    F = p.cam_params.shape[0]
    parts = prepare_landmark_shards(p, n_shards)
    Ls, Oc = parts.Ls, parts.Oc

    if fix_cam_mask is None:
        fix_cam_mask = jnp.concatenate([jnp.zeros(1), jnp.ones(F - 1)])
    fix_cam_mask = jnp.asarray(fix_cam_mask)
    cam_free = fix_cam_mask[:, None] if fix_cam_mask.ndim == 1 else fix_cam_mask

    K = jnp.asarray(p.K)
    lam0 = jnp.asarray(init_lambda, p.cam_params.dtype)
    wd = jnp.asarray(p.depth_weight, p.cam_params.dtype)

    def shard_body(cams0, pts_l, cam_idx, pt_idx_l, uv, w_in, depth):
        # shapes per device: cams0 (F,6) replicated; pts_l (Ls,3);
        # obs arrays (Oc,) / (Oc,2). All scalars below are identical on
        # every device (they flow through psums), so the while_loop's
        # control is lockstep.
        def psum(x):
            return jax.lax.psum(x, axis)

        def resid(cams, pts):
            # (Oc,2) reprojection rows, or (Oc,3) with the depth-prior row —
            # the row is per-observation and landmark-local, so it shards
            # exactly like the reprojection rows (no extra communication)
            c = cams[cam_idx]
            x = pts[pt_idx_l]
            if has_depth:
                return jax.vmap(
                    _residual_one_depth, in_axes=(0, 0, None, 0, 0, None)
                )(c, x, K, uv, depth, wd)
            return jax.vmap(_project_one, in_axes=(0, 0, None))(c, x, K) - uv

        def cost_of(cams, pts):
            r = resid(cams, pts)
            n = jnp.linalg.norm(r[..., :2], axis=-1)
            c = jnp.where(
                n <= huber_px, 0.5 * n ** 2, huber_px * (n - 0.5 * huber_px)
            )
            if has_depth:
                # Huber on the depth row too (occlusion-boundary lookups are
                # gross outliers) — same as sfm.ba.ba_solve.cost_of
                a = jnp.abs(r[..., 2])
                c = c + jnp.where(
                    a <= huber_px, 0.5 * a ** 2,
                    huber_px * (a - 0.5 * huber_px))
            return psum(jnp.sum(c * w_in))

        init_cost = cost_of(cams0, pts_l)

        def seg_l(vals):  # landmark-local segment sum (no comm)
            return jax.ops.segment_sum(vals, pt_idx_l, num_segments=Ls)

        def seg_c(vals):  # camera segment sum + cross-shard reduce
            return psum(jax.ops.segment_sum(vals, cam_idx, num_segments=F))

        def lm_step(carry):
            cams, pts, lam, cost, done, it = carry
            r = resid(cams, pts)                    # (Oc,2) or (Oc,3)
            n = jnp.linalg.norm(r[..., :2], axis=-1)
            w = w_in * jnp.where(
                n <= huber_px, 1.0, huber_px / jnp.maximum(n, 1e-12))
            if has_depth:
                # row-wise IRLS sqrt-weight on the depth row (mirrors
                # sfm.ba.ba_solve): residual row + both Jacobian rows scale
                a = jnp.abs(r[..., 2])
                s_d = jnp.sqrt(jnp.where(
                    a <= huber_px, 1.0, huber_px / jnp.maximum(a, 1e-12)))
                r = r.at[:, 2].multiply(s_d)
                Jc, Jp = jax.vmap(
                    _jac_one_depth, in_axes=(0, 0, None, 0, 0, None)
                )(cams[cam_idx], pts[pt_idx_l], K, uv, depth, wd)
                Jc = Jc.at[:, 2, :].multiply(s_d[:, None])
                Jp = Jp.at[:, 2, :].multiply(s_d[:, None])
            else:
                Jc, Jp = jax.vmap(_jac_one, in_axes=(0, 0, None))(
                    cams[cam_idx], pts[pt_idx_l], K)  # (Oc,2,6), (Oc,2,3)
            wJc = Jc * w[:, None, None]
            wJp = Jp * w[:, None, None]

            U = seg_c(jnp.einsum("oia,oib->oab", wJc, Jc, precision="highest"))
            V = seg_l(jnp.einsum("oia,oib->oab", wJp, Jp, precision="highest"))
            b_c = -seg_c(jnp.einsum("oia,oi->oa", wJc, r, precision="highest"))
            b_p = -seg_l(jnp.einsum("oia,oi->oa", wJp, r, precision="highest"))

            U_l = U + lam * jnp.eye(6)[None]
            V_l = V + lam * jnp.eye(3)[None]
            V_inv = jnp.linalg.inv(V_l + 1e-12 * jnp.eye(3)[None])  # (Ls,3,3)

            y = jnp.einsum("lab,lb->la", V_inv, b_p, precision="highest")
            Wy = jnp.einsum("oia,oib,ob->oa", wJc, Jp, y[pt_idx_l],
                            precision="highest")
            b_tilde = (b_c - seg_c(Wy)) * cam_free

            U_inv = jnp.linalg.inv(U_l + 1e-12 * jnp.eye(6)[None])

            def S_matvec(v):
                v = v * cam_free
                Uv = jnp.einsum("fab,fb->fa", U_l, v, precision="highest")
                JcV = jnp.einsum("oib,ob->oi", Jc, v[cam_idx],
                                 precision="highest")
                WtV = seg_l(jnp.einsum("oia,oi->oa", wJp, JcV,
                                       precision="highest"))
                z = jnp.einsum("lab,lb->la", V_inv, WtV, precision="highest")
                Jpz = jnp.einsum("oib,ob->oi", Jp, z[pt_idx_l],
                                 precision="highest")
                WVWt = seg_c(jnp.einsum("oia,oi->oa", wJc, Jpz,
                                        precision="highest"))
                return (Uv - WVWt) * cam_free

            def M_inv(v):
                return jnp.einsum("fab,fb->fa", U_inv, v) * cam_free

            x0 = jnp.zeros_like(b_tilde)
            r0 = b_tilde
            z0 = M_inv(r0)

            def cg_body(c2, _):
                x, rr, z, pd, rz = c2
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
                cg_body, (x0, r0, z0, z0, jnp.sum(r0 * z0)), None,
                length=cg_iters)

            Jcdc = jnp.einsum("oib,ob->oi", Jc, dc[cam_idx],
                              precision="highest")
            Wtdc = seg_l(jnp.einsum("oia,oi->oa", wJp, Jcdc,
                                    precision="highest"))
            dp = jnp.einsum("lab,lb->la", V_inv, b_p - Wtdc,
                            precision="highest")

            new_cams = cams + (dc * cam_free).reshape(F, 6)
            new_pts = pts + dp
            new_cost = cost_of(new_cams, new_pts)
            accept = new_cost < cost

            cams = jnp.where(accept, new_cams, cams)
            pts = jnp.where(accept, new_pts, pts)
            lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9),
                            jnp.minimum(lam * 5.0, 1e6))
            cost_out = jnp.where(accept, new_cost, cost)
            rel = jnp.abs(cost - cost_out) / jnp.maximum(cost, 1e-12)
            cost_floor = 1e-8 * jnp.maximum(psum(jnp.sum(w_in)), 1.0)
            done = (done | (accept & (rel < 1e-7))
                    | (cost_out <= cost_floor) | (~accept & (lam >= 1e6)))
            return (cams, pts, lam, cost_out, done, it + 1)

        def lm_cond(carry):
            *_, done, it = carry
            return (it < max_lm_iters) & ~done

        (cams, pts, _, final_cost, _, n_it) = jax.lax.while_loop(
            lm_cond, lm_step,
            (cams0, pts_l, lam0, init_cost, jnp.asarray(False),
             jnp.asarray(0, jnp.int32)),
        )
        return cams, pts, init_cost, final_cost, n_it

    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(), P(), P()),
        check_vma=False,
    )
    fn = jax.jit(sharded)
    depth_arr = (jnp.asarray(parts.depth) if has_depth
                 else jnp.zeros(parts.weight.shape[0], p.cam_params.dtype))
    cams, pts_pad, init_cost, final_cost, n_it = fn(
        jnp.asarray(p.cam_params),
        jnp.asarray(parts.points),
        jnp.asarray(parts.cam_idx),
        jnp.asarray(parts.pt_idx_local),
        jnp.asarray(parts.uv),
        jnp.asarray(parts.weight),
        depth_arr,
    )
    return BAResult(
        cam_params=cams, points=pts_pad[:parts.L],
        initial_cost=init_cost, final_cost=final_cost, n_iters=n_it,
    )
