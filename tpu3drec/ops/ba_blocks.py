"""Pallas BA Jacobian/Hessian block-assembly kernel.

Computes, per observation and entirely in VMEM: the reprojection residual,
the closed-form Jacobians in the **local (left-multiplicative) se(3)
parameterization** — J_cam = dproj/dXc @ [-[Xc]_x | I], J_pt = dproj/dXc @ R
— and the weighted normal-equation blocks

    U_o = w J_c^T J_c  (6x6)   V_o = w J_p^T J_p  (3x3)
    W_o = w J_c^T J_p  (6x3)   b_c = -w J_c^T r   b_p = -w J_p^T r

leaving only the per-camera/per-landmark `segment_sum` to XLA. This is the
"BA Jacobian/Hessian assembly" kernel of the north star (BASELINE.json);
`sfm/ba.py`'s jacfwd path (global axis-angle parameterization) remains the
reference implementation.

Everything is (TILE, lanes)-shaped columnar math on the VPU; no gathers, no
transcendentals, ~220 fused FLOPs/observation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_O = 512


def _ba_blocks_kernel(xc_ref, rmat_ref, uv_ref, w_ref, k_ref,
                      res_ref, U_ref, V_ref, W_ref, bc_ref, bp_ref, J_ref):
    fx = k_ref[0, 0]
    fy = k_ref[0, 1]
    cx = k_ref[0, 2]
    cy = k_ref[0, 3]

    x = xc_ref[:, 0]
    y = xc_ref[:, 1]
    z = jnp.where(jnp.abs(xc_ref[:, 2]) < 1e-9, 1e-9, xc_ref[:, 2])
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    w = w_ref[:, 0]

    # residual
    ru = fx * x * inv_z + cx - uv_ref[:, 0]
    rv = fy * y * inv_z + cy - uv_ref[:, 1]
    res_ref[:, 0] = ru
    res_ref[:, 1] = rv

    # dproj/dXc rows: a = [fx/z, 0, -fx x/z^2], b = [0, fy/z, -fy y/z^2]
    a0 = fx * inv_z
    a2 = -fx * x * inv_z2
    b1 = fy * inv_z
    b2 = -fy * y * inv_z2

    # J_cam columns (2 x 6): rotation part = dproj/dXc @ (-[Xc]_x), then I
    #   -[Xc]_x = [[0, z, -y], [-z, 0, x], [y, -x, 0]]
    Ju = [
        a2 * y,                # d ru / d wx:  a·(0,-z,y) -> a0*0 + a2*y ... see below
        a0 * z - a2 * x,       # d ru / d wy
        -a0 * y,               # d ru / d wz
        a0, jnp.zeros_like(a0), a2,
    ]
    Jv = [
        -b1 * z + b2 * y,      # d rv / d wx
        -b2 * x,               # d rv / d wy
        b1 * x,                # d rv / d wz
        jnp.zeros_like(b1), b1, b2,
    ]
    # J_pt = dproj/dXc @ R  (columns of R are rmat[:, 3k + j])
    r00, r01, r02 = rmat_ref[:, 0], rmat_ref[:, 1], rmat_ref[:, 2]
    r10, r11, r12 = rmat_ref[:, 3], rmat_ref[:, 4], rmat_ref[:, 5]
    r20, r21, r22 = rmat_ref[:, 6], rmat_ref[:, 7], rmat_ref[:, 8]
    Pu = [a0 * r00 + a2 * r20, a0 * r01 + a2 * r21, a0 * r02 + a2 * r22]
    Pv = [b1 * r10 + b2 * r20, b1 * r11 + b2 * r21, b1 * r12 + b2 * r22]

    # weighted blocks
    for a in range(6):
        for b in range(6):
            U_ref[:, a * 6 + b] = w * (Ju[a] * Ju[b] + Jv[a] * Jv[b])
    for a in range(3):
        for b in range(3):
            V_ref[:, a * 3 + b] = w * (Pu[a] * Pu[b] + Pv[a] * Pv[b])
    for a in range(6):
        for b in range(3):
            W_ref[:, a * 3 + b] = w * (Ju[a] * Pu[b] + Jv[a] * Pv[b])
    for a in range(6):
        bc_ref[:, a] = -w * (Ju[a] * ru + Jv[a] * rv)
    for a in range(3):
        bp_ref[:, a] = -w * (Pu[a] * ru + Pv[a] * rv)
    # raw Jacobian rows for matrix-free Schur products: [Ju | Jv | Pu | Pv]
    for a in range(6):
        J_ref[:, a] = Ju[a]
        J_ref[:, 6 + a] = Jv[a]
    for a in range(3):
        J_ref[:, 12 + a] = Pu[a]
        J_ref[:, 15 + a] = Pv[a]


@partial(jax.jit, static_argnames=("interpret",))
def ba_blocks(
    Xc: jnp.ndarray,     # (O, 3) camera-frame points R X + t
    Rmat: jnp.ndarray,   # (O, 3, 3) world->cam rotations per observation
    uv: jnp.ndarray,     # (O, 2) measurements
    w: jnp.ndarray,      # (O,) robust weights
    K: jnp.ndarray,      # (3, 3)
    interpret: bool | None = None,
):
    """Returns dict of per-observation blocks (see module docstring):
    res (O,2), U (O,6,6), V (O,3,3), W (O,6,3), bc (O,6), bp (O,3)."""
    O = Xc.shape[0]
    pad = (-O) % TILE_O
    Xc_p = jnp.pad(Xc, ((0, pad), (0, 0)), constant_values=1.0)
    R_p = jnp.pad(Rmat.reshape(-1, 9), ((0, pad), (0, 0)))
    uv_p = jnp.pad(uv, ((0, pad), (0, 0)))
    w_p = jnp.pad(w[:, None], ((0, pad), (0, 0)))
    kvec = jnp.array([[K[0, 0], K[1, 1], K[0, 2], K[1, 2]]], jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = Xc_p.shape[0]
    grid = (n // TILE_O,)

    def spec(cols):
        return pl.BlockSpec((TILE_O, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _ba_blocks_kernel,
        grid=grid,
        in_specs=[
            spec(3), spec(9), spec(2), spec(1),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[spec(2), spec(36), spec(9), spec(18), spec(6), spec(3), spec(18)],
        out_shape=[
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 36), jnp.float32),
            jax.ShapeDtypeStruct((n, 9), jnp.float32),
            jax.ShapeDtypeStruct((n, 18), jnp.float32),
            jax.ShapeDtypeStruct((n, 6), jnp.float32),
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 18), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(260 * n), bytes_accessed=int(4 * n * (15 + 74)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(Xc_p, R_p, uv_p, w_p, kvec)
    res, U, V, W, bc, bp, J = outs
    # unpack raw Jacobians: Jc (O,2,6) rows [Ju; Jv], Jp (O,2,3) [Pu; Pv]
    Jc = jnp.stack([J[:O, 0:6], J[:O, 6:12]], axis=1)
    Jp = jnp.stack([J[:O, 12:15], J[:O, 15:18]], axis=1)
    return {
        "res": res[:O],
        "U": U[:O].reshape(O, 6, 6),
        "V": V[:O].reshape(O, 3, 3),
        "W": W[:O].reshape(O, 6, 3),
        "bc": bc[:O],
        "bp": bp[:O],
        "Jc": Jc,
        "Jp": Jp,
    }


def local_jacobians_reference(Xc, Rmat, uv, K):
    """Autodiff reference for the kernel's closed forms: jacfwd of the
    projection under the left-multiplicative perturbation
    Xc' = Xc + omega x Xc + nu, X' = X + eps (camera-frame rotation applied
    through R for the point side)."""

    def proj(xc):
        z = jnp.where(jnp.abs(xc[2]) < 1e-9, 1e-9, xc[2])
        return jnp.stack(
            [xc[0] / z * K[0, 0] + K[0, 2], xc[1] / z * K[1, 1] + K[1, 2]]
        )

    def res_of_delta(delta, xc, uvi):
        w_, v_ = delta[:3], delta[3:]
        return proj(xc + jnp.cross(w_, xc) + v_) - uvi

    def res_of_eps(eps, xc, Ri, uvi):
        return proj(xc + Ri @ eps) - uvi

    Jc = jax.vmap(
        lambda xc, uvi: jax.jacfwd(res_of_delta)(jnp.zeros(6), xc, uvi)
    )(Xc, uv)
    Jp = jax.vmap(
        lambda xc, Ri, uvi: jax.jacfwd(res_of_eps)(jnp.zeros(3), xc, Ri, uvi)
    )(Xc, Rmat, uv)
    return Jc, Jp
