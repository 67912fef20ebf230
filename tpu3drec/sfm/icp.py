"""Iterative Closest Point on device, with similarity (scale) alignment.

Replaces the reference's offline open3d ICP step: readme section 2(2)
(`ref/readme.md:24-25`) runs ICP between two frames' clouds to recover the
metric scale COLMAP can't, writing a 4x4 ``T_data.txt`` consumed by
`ref/other_tools/transfer_T_icp.py:33-43`. Here the whole loop runs in one
jit: nearest-neighbor search is a tiled |a|^2+|b|^2-2ab distance computed on
the MXU, the alignment solve is closed-form Umeyama (optionally with scale,
giving the scale-correction capability natively), iterations via lax.scan
with trimmed correspondences (static shapes, weight masks instead of
compaction).

Multi-device scaling (ring-sharded reference cloud with ppermute halo
exchange, SURVEY.md §5.7) lives in `tpu3drec/parallel/ring.py`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,3) x (M,3) -> (N,M) squared distances via the matmul identity
    (the MXU does the heavy lifting; elementwise terms fuse around it)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T
    # HIGHEST precision: this output feeds argmin (NN selection) and on TPU
    # the default bf16 matmul passes measurably flip NN results
    # (docs/design.md §6.2) — pinned here like the Pallas kernels.
    ab = jnp.dot(a, b.T, precision="highest")
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def nearest_neighbors(
    query: jnp.ndarray, ref: jnp.ndarray, block: int = 2048
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each query point, index + squared distance of its nearest ref
    point.

    On TPU this dispatches to the fused Pallas kernel (ops/icp_nn): VPU
    broadcast distances + in-VMEM running min/argmin — measured 23.9 ms at
    65k x 65k vs 36.4 ms for the XLA blocked scan (tools/remeasure_r3,
    round 3). Elsewhere (CPU tests) it runs the blocked-scan formulation,
    which is also the reference semantics the kernel is pinned against
    (tests/test_pallas_ops.py)."""
    if jax.default_backend() == "tpu":
        from tpu3drec.ops.icp_nn import nearest_neighbors_pallas

        return nearest_neighbors_pallas(query, ref)
    return _nearest_neighbors_scan(query, ref, block)


@partial(jax.jit, static_argnames=("block",))
def _nearest_neighbors_scan(
    query: jnp.ndarray, ref: jnp.ndarray, block: int = 2048
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """XLA blocked-scan NN: tiled over ref blocks with a running min so the
    (N, M) distance matrix never materializes (VMEM-sized tiles only)."""
    n = query.shape[0]
    m = ref.shape[0]
    nblocks = -(-m // block)
    pad = nblocks * block - m
    # pad with a large finite coordinate (inf would make a2+b2-2ab = nan)
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)), constant_values=1e9)
    ref_blocks = ref_p.reshape(nblocks, block, 3)

    def body(carry, rb_i):
        best_d, best_i = carry
        rb, i = rb_i
        d = pairwise_sqdist(query, rb)  # (N, block)
        dmin = jnp.min(d, axis=1)
        amin = jnp.argmin(d, axis=1) + i * block
        take = dmin < best_d
        return (jnp.where(take, dmin, best_d), jnp.where(take, amin, best_i)), None

    init = (jnp.full((n,), jnp.inf), jnp.zeros((n,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (ref_blocks, jnp.arange(nblocks, dtype=jnp.int32))
    )
    return best_i, best_d


def umeyama(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray,
    with_scale: bool = True,
):
    """Weighted similarity alignment: find (s, R, t) minimizing
    sum w |s R src + t - dst|^2 (Umeyama 1991). Returns (s, R, t)."""
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.einsum("n,ni->i", w, src)
    mu_d = jnp.einsum("n,ni->i", w, dst)
    sc = src - mu_s
    dc = dst - mu_d
    cov = jnp.einsum("n,ni,nj->ij", w, dc, sc)  # dst x src covariance
    U, S, Vt = jnp.linalg.svd(cov)
    # proper-rotation (det=+1) correction on the smallest singular vector
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    corr = jnp.diag(jnp.concatenate([jnp.ones(2, dtype=cov.dtype), d[None]]))
    R = U @ corr @ Vt
    if with_scale:
        var_s = jnp.einsum("n,ni->", w, sc * sc)
        s = (S[0] + S[1] + S[2] * d) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.float32(1.0)
    t = mu_d - s * R @ mu_s
    return s, R, t


class ICPResult(NamedTuple):
    T: jnp.ndarray        # (4,4) similarity transform (sR | t)
    scale: jnp.ndarray    # ()
    rmse: jnp.ndarray     # () final inlier RMSE
    n_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("iters", "with_scale", "block"))
def _icp_core(
    src: jnp.ndarray,          # (N,3) moving cloud (padded)
    src_valid: jnp.ndarray,    # (N,) bool — padded rows False
    dst: jnp.ndarray,          # (M,3) fixed cloud (padded rows far away)
    iters: int = 20,
    with_scale: bool = True,
    inlier_quantile: float = 0.9,
    block: int = 2048,
    init_T: jnp.ndarray | None = None,
) -> ICPResult:
    """Trimmed similarity ICP: src -> dst. Correspondences beyond the
    ``inlier_quantile`` distance each iteration are down-weighted to zero
    (trimming handles partial overlap). Returns the 4x4 T with scale folded
    into the rotation block — exactly the ``T_data.txt`` contract the
    reference's fusion step consumes (`transfer_T_icp.py:33-43`)."""
    wv = src_valid.astype(src.dtype)
    n_valid = jnp.maximum(jnp.sum(wv), 1.0)
    # dst validity: padded dst rows sit at the 1e9 sentinel
    dv = (jnp.abs(dst[:, 0]) < 1e8).astype(src.dtype)
    m_valid = jnp.maximum(jnp.sum(dv), 1.0)

    if init_T is None:
        # centroid + RMS-radius pre-alignment: gets translation and gross
        # scale into the NN search's basin of attraction
        mu_s = jnp.einsum("n,ni->i", wv, src) / n_valid
        mu_d = jnp.einsum("m,mi->i", dv, dst) / m_valid
        if with_scale:
            r_s = jnp.sqrt(jnp.einsum("n,n->", wv, jnp.sum((src - mu_s) ** 2, axis=-1)) / n_valid)
            r_d = jnp.sqrt(jnp.einsum("m,m->", dv, jnp.sum((dst - mu_d) ** 2, axis=-1)) / m_valid)
            s0 = r_d / jnp.maximum(r_s, 1e-12)
        else:
            s0 = jnp.asarray(1.0, src.dtype)
        T0 = jnp.eye(4, dtype=src.dtype)
        T0 = T0.at[:3, :3].set(s0 * jnp.eye(3, dtype=src.dtype))
        T0 = T0.at[:3, 3].set(mu_d - s0 * mu_s)
    else:
        T0 = init_T.astype(src.dtype)

    def step(T, _):
        cur = src @ T[:3, :3].T + T[:3, 3]
        idx, d2 = nearest_neighbors(cur, dst, block=block)
        # trimmed weights over VALID rows only (padded src rows excluded)
        thresh = jnp.nanquantile(
            jnp.where(src_valid, d2, jnp.nan), inlier_quantile
        )
        w = (d2 <= thresh).astype(src.dtype) * wv
        matched = dst[idx]
        s, R, t = umeyama(cur, matched, w, with_scale=with_scale)
        dT = jnp.eye(4, dtype=src.dtype)
        dT = dT.at[:3, :3].set(s * R)
        dT = dT.at[:3, 3].set(t)
        T_new = dT @ T
        rmse = jnp.sqrt(jnp.sum(w * d2) / jnp.maximum(jnp.sum(w), 1.0))
        return T_new, (rmse, jnp.sum(w))

    T, (rmses, n_in) = jax.lax.scan(step, T0, None, length=iters)
    A = T[:3, :3]
    scale = jnp.exp(jnp.log(jnp.maximum(jnp.linalg.det(A), 1e-20)) / 3.0)
    return ICPResult(T=T, scale=scale, rmse=rmses[-1], n_inliers=n_in[-1].astype(jnp.int32))


def icp(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    iters: int = 20,
    with_scale: bool = True,
    inlier_quantile: float = 0.9,
    block: int = 2048,
    init_T: jnp.ndarray | None = None,
    bucket: int = 256,
) -> ICPResult:
    """Public entry: pads both clouds to `bucket` multiples before the
    jitted core. Two reasons (both measured): odd shapes can compile
    pathologically slowly on TPU (188s vs 1.4s for one 107-point cloud),
    and bucketing makes repeat calls with nearby sizes reuse the cache."""
    src = jnp.asarray(src, dtype=jnp.float32)
    dst = jnp.asarray(dst, dtype=jnp.float32)
    n, m = src.shape[0], dst.shape[0]
    pad_n = (-n) % bucket
    pad_m = (-m) % bucket
    src_p = jnp.pad(src, ((0, pad_n), (0, 0)))
    valid = jnp.arange(n + pad_n) < n
    dst_p = jnp.pad(dst, ((0, pad_m), (0, 0)), constant_values=1e9)
    return _icp_core(
        src_p, valid, dst_p, iters=iters, with_scale=with_scale,
        inlier_quantile=inlier_quantile, block=block, init_T=init_T,
    )


# ---------------------------------------------------------------------------
# Point-to-plane ICP (open3d's preferred estimation mode — the reference's
# offline ICP tool, SURVEY.md C6). Converges in far fewer iterations than
# point-to-point on smooth surfaces because sliding along the tangent plane
# is free. Rigid-only (scale stays with the Umeyama point-to-point path).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k", "block"))
def estimate_normals(points: jnp.ndarray, valid: jnp.ndarray | None = None,
                     k: int = 16, block: int = 2048) -> jnp.ndarray:
    """Per-point unit normals by PCA over the k nearest neighbors
    (smallest-eigenvector of the local covariance). Static shapes: blocked
    distance tiles + top_k, eigh on (N, 3, 3) batched — all MXU/VPU work."""
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    far = jnp.where(valid[:, None], points, 1e9)
    nblocks = -(-n // block)
    pad = nblocks * block - n
    ref_p = jnp.pad(far, ((0, pad), (0, 0)), constant_values=1e9)
    ref_blocks = ref_p.reshape(nblocks, block, 3)

    def body(carry, rb_i):
        best_d, best_i = carry  # (N, k) running smallest distances (negated)
        rb, bi = rb_i
        d = pairwise_sqdist(points, rb)  # (N, block)
        cat_d = jnp.concatenate([best_d, -d], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(jnp.arange(block, dtype=jnp.int32)[None, :] + bi * block, d.shape)],
            axis=1,
        )
        nd, sel = jax.lax.top_k(cat_d, k)  # top_k of negated distance = kNN
        ni = jnp.take_along_axis(cat_i, sel, axis=1)
        return (nd, ni), None

    init = (jnp.full((n, k), -jnp.inf), jnp.zeros((n, k), jnp.int32))
    (_, knn_idx), _ = jax.lax.scan(
        body, init, (ref_blocks, jnp.arange(nblocks, dtype=jnp.int32))
    )
    nbrs = points[knn_idx]                      # (N, k, 3)
    mu = jnp.mean(nbrs, axis=1, keepdims=True)
    c = nbrs - mu
    cov = jnp.einsum("nki,nkj->nij", c, c, precision="highest")
    # eigh returns ascending eigenvalues: column 0 = normal direction
    _, vecs = jnp.linalg.eigh(cov)
    nrm = vecs[:, :, 0]
    return nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)


def _so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (3,) axis-angle -> (3,3) rotation (safe at theta -> 0)."""
    th = jnp.linalg.norm(w)
    K = jnp.array([[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]],
                  dtype=w.dtype)
    A = jnp.where(th > 1e-8, jnp.sin(th) / jnp.maximum(th, 1e-12), 1.0)
    B = jnp.where(th > 1e-8, (1.0 - jnp.cos(th)) / jnp.maximum(th * th, 1e-12), 0.5)
    return jnp.eye(3, dtype=w.dtype) + A * K + B * (K @ K)


@partial(jax.jit, static_argnames=("iters", "block"))
def _icp_plane_core(
    src: jnp.ndarray, src_valid: jnp.ndarray,
    dst: jnp.ndarray, dst_normals: jnp.ndarray,
    iters: int, inlier_quantile: float, block: int,
    init_T: jnp.ndarray,
) -> ICPResult:
    """Point-to-plane rigid ICP: each iteration solves the linearized 6x6
    normal equations for (omega, t) minimizing sum w ((Rp + t - q) . n)^2
    with R ~ exp([omega]x) about the current estimate."""
    wv = src_valid.astype(src.dtype)

    def step(T, _):
        cur = src @ T[:3, :3].T + T[:3, 3]
        idx, d2 = nearest_neighbors(cur, dst, block=block)
        thresh = jnp.nanquantile(jnp.where(src_valid, d2, jnp.nan), inlier_quantile)
        w = (d2 <= thresh).astype(src.dtype) * wv
        q = dst[idx]
        nq = dst_normals[idx]
        r = jnp.einsum("ni,ni->n", cur - q, nq)          # signed plane dist
        # J row = [ (p x n)^T , n^T ]  for residual ((Rp+t-q).n)
        J = jnp.concatenate([jnp.cross(cur, nq), nq], axis=1)  # (N, 6)
        Jw = J * w[:, None]
        H = jnp.dot(Jw.T, J, precision="highest")
        g = Jw.T @ r
        H = H + 1e-6 * jnp.trace(H) / 6.0 * jnp.eye(6, dtype=src.dtype)
        x = -jnp.linalg.solve(H, g)
        dR = _so3_exp(x[:3])
        dT = jnp.eye(4, dtype=src.dtype)
        dT = dT.at[:3, :3].set(dR)
        dT = dT.at[:3, 3].set(x[3:])
        T_new = dT @ T
        rmse = jnp.sqrt(jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0))
        return T_new, (rmse, jnp.sum(w))

    T, (rmses, n_in) = jax.lax.scan(step, init_T.astype(src.dtype), None, length=iters)
    return ICPResult(T=T, scale=jnp.float32(1.0), rmse=rmses[-1],
                     n_inliers=n_in[-1].astype(jnp.int32))


def icp_point_to_plane(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    dst_normals: jnp.ndarray | None = None,
    iters: int = 15,
    inlier_quantile: float = 0.9,
    block: int = 2048,
    init_T: jnp.ndarray | None = None,
    normal_k: int = 16,
    bucket: int = 256,
) -> ICPResult:
    """Rigid point-to-plane ICP src -> dst. Normals are estimated on dst by
    kNN PCA when not supplied. Same bucketing/padding discipline as `icp`."""
    src = jnp.asarray(src, dtype=jnp.float32)
    dst = jnp.asarray(dst, dtype=jnp.float32)
    n, m = src.shape[0], dst.shape[0]
    pad_n = (-n) % bucket
    pad_m = (-m) % bucket
    src_p = jnp.pad(src, ((0, pad_n), (0, 0)))
    valid = jnp.arange(n + pad_n) < n
    if dst_normals is None:
        dst_normals = estimate_normals(
            jnp.pad(dst, ((0, pad_m), (0, 0)), constant_values=1e9),
            valid=jnp.arange(m + pad_m) < m, k=min(normal_k, max(m - 1, 1)),
            block=block)
    else:
        dst_normals = jnp.pad(jnp.asarray(dst_normals, jnp.float32),
                              ((0, pad_m), (0, 0)))
    dst_p = jnp.pad(dst, ((0, pad_m), (0, 0)), constant_values=1e9)
    if init_T is None:
        # centroid pre-alignment (translation only; rigid => no scale seed)
        mu_s = jnp.mean(src, axis=0)
        mu_d = jnp.mean(dst, axis=0)
        T0 = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(mu_d - mu_s)
    else:
        T0 = jnp.asarray(init_T, jnp.float32)
    return _icp_plane_core(src_p, valid, dst_p, dst_normals,
                           iters=iters, inlier_quantile=inlier_quantile,
                           block=block, init_T=T0)


def icp_scale_correction(cloud_a: jnp.ndarray, cloud_b: jnp.ndarray, **kw) -> jnp.ndarray:
    """The reference's metric-scale-correction artifact: align cloud_b onto
    cloud_a with a similarity ICP and return the 4x4 T (readme §2(2),
    `ref/readme.md:24-25`) ready for `pipelines/icp_fusion.py` /
    ``write_T_txt``."""
    return icp(cloud_b, cloud_a, **kw).T
