"""Plane-sweep multi-view stereo depth — the dmrecon analogue.

MVE's dmrecon grows per-view depth maps by patch-based NCC stereo over
neighboring views (`ref/software_record/mve使用指南.docx`, step 3). The
TPU-native formulation is a plane sweep: hypothesize D fronto-parallel
planes in the reference view (uniform in INVERSE depth, matching pixel
disparity), warp every source view onto each plane with one homography per
(source, plane), and score photo-consistency with windowed ZNCC. Everything
is static-shaped and jit-compiled: the warp is a quad-packed bilinear
gather (`ops/quadpack.py`), the window statistics are `lax.reduce_window`
box sums (XLA fuses the five of them over one pass), and the sweep runs as
a `lax.scan` over plane chunks so VMEM holds only one chunk of warped
views at a time.

ZNCC (not SAD/SSD) because the ATE workloads carry per-frame exposure
gain/bias jitter (`tools/ate_benchmark.py`) — ZNCC is invariant to both.
Window default is 5: fronto-parallel sweeps pay a slant bias that grows
with window footprint (measured on the rendered urban scene: win=5 put
89% of fused-mesh vertices within 2 voxels of the true surface vs 78% for
win=7 and 64% for win=9 — the slanted ground/facade error dominates the
matching noise a bigger window would suppress).

Outputs per pixel: refined inverse-depth (3-point parabola around the
winning plane — standard sub-plane interpolation), the winning ZNCC score,
and the number of source views that observed the pixel. Downstream,
`geometric_consistency` cross-validates the per-view depth maps against
each other (MVE's scene2pset confidence filter) before TSDF fusion.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpu3drec.ops.quadpack import bilinear_sample_quad, quad_pack


def relative_pose(R_ref, t_ref, R_src, t_src):
    """(R, t) mapping ref-camera coords to src-camera coords.

    Both inputs are world->cam: x_s = R_s x_w + t_s, x_w = R_r^T (x_r - t_r)
    => x_s = (R_s R_r^T) x_r + (t_s - R_s R_r^T t_r).
    """
    R_rel = R_src @ R_ref.T
    t_rel = t_src - R_rel @ t_ref
    return R_rel, t_rel


def _plane_homographies(K, R_rel, t_rel, inv_depths):
    """(D, 3, 3) pixel homographies ref->src for fronto-parallel planes
    z_ref = 1/inv_depth: H(d) = K (R_rel + inv_d * t_rel n^T) K^{-1},
    n = [0,0,1] in the reference camera frame."""
    Kinv = jnp.linalg.inv(K)
    n = jnp.array([0.0, 0.0, 1.0], K.dtype)
    outer = t_rel[:, None] * n[None, :]                       # (3, 3)
    Hs = R_rel[None] + inv_depths[:, None, None] * outer[None]
    return K[None] @ Hs @ Kinv[None]


def _box_sum(x, window: int):
    """(..., H, W) -> same-shape windowed sum (zero-padded borders).

    Separable: a zero-padded box sum over a (window, window) rectangle is
    exactly the row-pass composed with the column-pass, so two 1D
    reduce_windows replace the 2D one — O(2k) adds/pixel instead of
    O(k^2) on the VPU (ZNCC runs 4 of these per plane x source).
    Measured effect on the full 480x640x96p/4src sweep: none (1150.2 vs
    1151 ms/view on the v5e) — the sweep is entirely gather-row-bound
    (quadpack.py's ~15M rows/s latency wall), so the window statistics
    ride in the gather shadow. Kept because it is strictly less VPU
    work and the CPU path (tests, smoke) does pay for the 2D window.
    """
    ones = (1,) * (x.ndim - 2)
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=ones + (window, 1),
        window_strides=(1,) * x.ndim,
        padding="SAME",
    )
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=ones + (1, window),
        window_strides=(1,) * x.ndim,
        padding="SAME",
    )


@partial(jax.jit, static_argnames=("n_planes", "window", "chunk"))
def plane_sweep_depth(
    ref_img: jnp.ndarray,        # (H, W) grayscale float [0,1]
    src_imgs: jnp.ndarray,       # (S, H, W)
    K: jnp.ndarray,              # (3, 3)
    R_ref: jnp.ndarray, t_ref: jnp.ndarray,    # world->cam, reference view
    Rs_src: jnp.ndarray, ts_src: jnp.ndarray,  # (S,3,3), (S,3) world->cam
    d_min: float, d_max: float,
    n_planes: int = 96,
    window: int = 5,
    chunk: int = 8,
):
    """Dense reference-view depth by plane-sweep ZNCC stereo.

    Returns (depth (H, W), zncc (H, W) winning score in [-1, 1],
    n_valid (H, W) int32 source views covering the winner). Pixels no
    source observed get depth 0.
    """
    H, W = ref_img.shape
    S = src_imgs.shape[0]
    if n_planes % chunk:
        raise ValueError(f"n_planes {n_planes} not divisible by chunk {chunk}")
    inv_ds = jnp.linspace(1.0 / d_max, 1.0 / d_min, n_planes,
                          dtype=ref_img.dtype)

    # homographies for every (source, plane): (S, D, 3, 3)
    rel = [relative_pose(R_ref, t_ref, Rs_src[s], ts_src[s])
           for s in range(S)]
    Hmats = jnp.stack(
        [_plane_homographies(K, R, t, inv_ds) for (R, t) in rel])

    # reference window statistics (shared across planes/sources)
    npix = _box_sum(jnp.ones_like(ref_img), window)
    ref_sum = _box_sum(ref_img, window)
    ref_sq = _box_sum(ref_img * ref_img, window)
    ref_mean = ref_sum / npix
    ref_var = jnp.maximum(ref_sq / npix - ref_mean**2, 0.0)

    qsrc = jnp.stack([quad_pack(im[..., None]) for im in src_imgs])

    u = jax.lax.broadcasted_iota(ref_img.dtype, (H, W), 1)
    v = jax.lax.broadcasted_iota(ref_img.dtype, (H, W), 0)
    ones = jnp.ones_like(u)
    pix = jnp.stack([u, v, ones], axis=-1)                    # (H, W, 3)

    def plane_cost(Hrow):
        """Hrow: (S, 3, 3) -> (cost, zncc, nvalid) for one plane."""
        def one_src(Hm, q):
            p = jnp.einsum("ij,hwj->hwi", Hm, pix)
            zw = p[..., 2]
            x = p[..., 0] / jnp.where(jnp.abs(zw) < 1e-9, 1e-9, zw)
            y = p[..., 1] / jnp.where(jnp.abs(zw) < 1e-9, 1e-9, zw)
            inb = (zw > 1e-6) & (x >= 0) & (x <= W - 1) & \
                  (y >= 0) & (y <= H - 1)
            warped = bilinear_sample_quad(
                q, jnp.clip(x, 0, W - 1), jnp.clip(y, 0, H - 1))[..., 0]
            warped = jnp.where(inb, warped, 0.0)
            w_sum = _box_sum(warped, window)
            w_sq = _box_sum(warped * warped, window)
            w_mean = w_sum / npix
            w_var = jnp.maximum(w_sq / npix - w_mean**2, 0.0)
            cross = _box_sum(ref_img * warped, window) / npix \
                - ref_mean * w_mean
            zncc = cross * jax.lax.rsqrt(ref_var * w_var + 1e-8)
            # a window must be mostly in-view to count
            frac_in = _box_sum(inb.astype(ref_img.dtype), window) / npix
            ok = frac_in > 0.8
            return jnp.where(ok, zncc, -1.0), ok

        znccs, oks = jax.vmap(one_src)(Hrow, qsrc)            # (S, H, W)
        nvalid = oks.sum(0).astype(jnp.int32)
        # mean ZNCC over observing sources; unobserved pixels -> -1
        z = jnp.where(oks, znccs, 0.0).sum(0) / jnp.maximum(nvalid, 1)
        z = jnp.where(nvalid > 0, z, -1.0)
        return 1.0 - z, z, nvalid

    # sweep in chunks: (D, S, 3, 3) -> scan over (D/chunk, chunk, S, 3, 3)
    D = n_planes
    Hseq = jnp.swapaxes(Hmats, 0, 1).reshape(D // chunk, chunk, S, 3, 3)

    def step(_, Hchunk):
        c, z, nv = jax.vmap(plane_cost)(Hchunk)
        return None, (c, z, nv)

    _, (cost, zncc, nvalid) = jax.lax.scan(step, None, Hseq)
    cost = cost.reshape(D, H, W)
    zncc = zncc.reshape(D, H, W)
    nvalid = nvalid.reshape(D, H, W)

    best = jnp.argmin(cost, axis=0)                           # (H, W)

    def take(vol, idx):
        return jnp.take_along_axis(vol, idx[None], axis=0)[0]

    c0 = take(cost, jnp.clip(best - 1, 0, D - 1))
    c1 = take(cost, best)
    c2 = take(cost, jnp.clip(best + 1, 0, D - 1))
    # 3-point parabola minimum in plane index (inverse depth is linear in
    # the index, so the offset applies directly)
    denom = c0 - 2 * c1 + c2
    off = jnp.where(jnp.abs(denom) > 1e-9,
                    0.5 * (c0 - c2) / jnp.where(jnp.abs(denom) > 1e-9,
                                                denom, 1.0),
                    0.0)
    off = jnp.clip(off, -0.5, 0.5)
    # interior planes only — at the sweep ends the parabola is one-sided
    off = jnp.where((best > 0) & (best < D - 1), off, 0.0)
    idx = best.astype(ref_img.dtype) + off
    step_id = (inv_ds[-1] - inv_ds[0]) / (D - 1)
    inv_d = inv_ds[0] + idx * step_id
    depth = 1.0 / jnp.maximum(inv_d, 1e-9)

    best_z = take(zncc, best)
    best_nv = take(nvalid, best)
    depth = jnp.where(best_nv > 0, depth, 0.0)
    return depth, best_z, best_nv


@partial(jax.jit, static_argnames=("rel_err",))
def _consistency_counts(depths, K, Rs, ts, ref_idx, rel_err=0.02):
    """For reference view ref_idx: project every pixel's depth into every
    other view and count views whose OWN depth map agrees within rel_err
    (relative). Returns (H, W) int32 counts."""
    F, H, W = depths.shape
    d_ref = depths[ref_idx]
    R_r, t_r = Rs[ref_idx], ts[ref_idx]
    Kinv = jnp.linalg.inv(K)

    u = jax.lax.broadcasted_iota(d_ref.dtype, (H, W), 1)
    v = jax.lax.broadcasted_iota(d_ref.dtype, (H, W), 0)
    rays = jnp.einsum("ij,hwj->hwi", Kinv,
                      jnp.stack([u, v, jnp.ones_like(u)], -1))
    pts_ref = rays * d_ref[..., None]                         # ref cam frame

    def check(R_s, t_s, d_s, is_self):
        R_rel = R_s @ R_r.T
        t_rel = t_s - R_rel @ t_r
        p_s = jnp.einsum("ij,hwj->hwi", R_rel, pts_ref) + t_rel
        z = p_s[..., 2]
        uv = jnp.einsum("ij,hwj->hwi", K, p_s)
        x = uv[..., 0] / jnp.where(jnp.abs(uv[..., 2]) < 1e-9, 1e-9,
                                   uv[..., 2])
        y = uv[..., 1] / jnp.where(jnp.abs(uv[..., 2]) < 1e-9, 1e-9,
                                   uv[..., 2])
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        d_obs = d_s[yi, xi]
        inb = (z > 1e-6) & (x >= 0) & (x <= W - 1) & (y >= 0) & \
              (y <= H - 1) & (d_obs > 0) & (d_ref > 0)
        ok = inb & (jnp.abs(d_obs - z) <= rel_err * z)
        return jnp.where(is_self, False, ok)

    is_self = jnp.arange(F) == ref_idx
    oks = jax.vmap(check)(Rs, ts, depths, is_self)
    return oks.sum(0).astype(jnp.int32)


def geometric_consistency(depths, K, Rs, ts, rel_err: float = 0.02,
                          min_consistent: int = 2):
    """Cross-view depth validation (scene2pset's confidence filter): a
    pixel's depth survives only if >= min_consistent OTHER views' depth
    maps agree with it within rel_err relative error.

    depths: (F, H, W); Rs/ts: (F,3,3)/(F,3) world->cam.
    Returns (F, H, W) bool mask.
    """
    import numpy as np

    depths = jnp.asarray(depths)
    K = jnp.asarray(K)
    Rs = jnp.asarray(Rs)
    ts = jnp.asarray(ts)
    masks = []
    for f in range(depths.shape[0]):
        cnt = _consistency_counts(depths, K, Rs, ts, f, rel_err=rel_err)
        masks.append(np.asarray(cnt) >= min_consistent)
    return np.stack(masks) & (np.asarray(depths) > 0)
