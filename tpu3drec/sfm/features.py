"""Feature detection + description: the SfM front end, batched on device.

TPU-native replacement for COLMAP's CPU SIFT stage (reference workflow:
`ref/software_record/colmap使用.docx` §2.2 — SIFT extraction with shared
PINHOLE intrinsics). Design constraints driving the implementation:

* **Static shapes everywhere**: detection returns a fixed top-K keypoint
  set per image (scores pad with -inf; a validity mask rides along), so the
  whole front end vmaps over frames and pjit-shards over the `data` axis.
* **Convolutions, not gathers, where possible**: the scale pyramid, DoG,
  and gradient fields are separable convolutions (MXU/VPU friendly); only
  descriptor patch sampling gathers, batched over keypoints.
* Upright or oriented descriptors: SIFT-style 4x4x8 gradient histograms
  with soft binning, L2->clip(0.2)->L2 normalization; orientation from the
  dominant gradient direction (36-bin histogram), optional for forward-
  motion video where upright suffices.

Scores are Hessian-of-DoG extrema over (x, y, scale) neighborhoods with
edge suppression, following Lowe's scheme numerically but organized as
dense tensor ops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu3drec.ops.quadpack import quad_gather, quad_pack


# ------------------------------------------------------------ scale pyramid

def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian on (H, W), reflect-padded."""
    radius = max(1, int(3.0 * sigma + 0.5))
    k = gaussian_kernel1d(sigma, radius)
    img = jnp.pad(img, ((radius, radius), (0, 0)), mode="reflect")
    img = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(img)
    img = jnp.pad(img, ((0, 0), (radius, radius)), mode="reflect")
    img = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(img)
    return img


def dog_stack(img: jnp.ndarray, num_scales: int = 4, sigma0: float = 1.6):
    """Single-octave Gaussian stack + DoG slices.

    Returns (gaussians (S+1,H,W), dogs (S,H,W), sigmas (S+1,)).
    """
    k = 2.0 ** (1.0 / max(num_scales - 1, 1))
    sigmas = [sigma0 * (k ** i) for i in range(num_scales + 1)]
    gs = [gaussian_blur(img, s) for s in sigmas]
    G = jnp.stack(gs)
    D = G[1:] - G[:-1]
    return G, D, jnp.asarray(sigmas)


def dog_stack_from_base(base: jnp.ndarray, num_scales: int = 5,
                        sigma0: float = 1.6):
    """Gaussian stack for one pyramid octave whose ``base`` image already
    carries exactly sigma0 blur (COLMAP-SIFT octave structure, ref workflow
    `ref/software_record/colmap使用.docx` §2.2).

    ``num_scales`` = number of DoG slices. The scale step is
    k = 2^(1/(num_scales-2)) so the *interior* DoG slices (the only ones
    extrema detection keeps) span exactly one doubling sigma0*k .. 2*sigma0
    — consecutive octaves tile scale space with no gap (Lowe's s+3
    construction). Blurs are applied from the base with
    delta_i = sigma0*sqrt(k^{2i}-1), so slice i's labeled sigma really is
    sigma0*k^i in octave pixels. The next octave's base is
    G[num_scales-2] (sigma = 2*sigma0) subsampled 2x.
    Returns (G (S+1,H,W), D (S,H,W), sigmas (S+1,))."""
    k = 2.0 ** (1.0 / max(num_scales - 2, 1))
    sigmas = [sigma0 * (k ** i) for i in range(num_scales + 1)]
    gs = [base]
    for i in range(1, num_scales + 1):
        delta = sigma0 * (k ** (2 * i) - 1.0) ** 0.5
        gs.append(gaussian_blur(base, delta))
    G = jnp.stack(gs)
    D = G[1:] - G[:-1]
    return G, D, jnp.asarray(sigmas)


# ---------------------------------------------------------------- detection

class Keypoints(NamedTuple):
    xy: jnp.ndarray      # (K, 2) pixel coords (x, y)
    scale: jnp.ndarray   # (K,) detection sigma
    angle: jnp.ndarray   # (K,) orientation in radians (0 if upright)
    score: jnp.ndarray   # (K,) detection response
    valid: jnp.ndarray   # (K,) bool


def _local_extrema(D: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """(S,H,W) DoG -> (S,H,W) bool: 26-neighborhood extrema above threshold.
    Borders (scale & space) excluded."""
    S, H, W = D.shape
    pad = jnp.pad(D, ((1, 1), (1, 1), (1, 1)), constant_values=0.0)
    center = jnp.abs(D)
    is_max = jnp.ones_like(D, dtype=bool)
    is_min = jnp.ones_like(D, dtype=bool)
    for ds in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == dy == dx == 0:
                    continue
                nb = jax.lax.dynamic_slice(pad, (1 + ds, 1 + dy, 1 + dx), (S, H, W))
                is_max &= D >= nb
                is_min &= D <= nb
    ext = (is_max | is_min) & (center > threshold)
    # exclude image borders and the outermost scale slices
    ext = ext.at[0].set(False).at[-1].set(False)
    border = 8
    mask = jnp.zeros((H, W), dtype=bool).at[border:-border, border:-border].set(True)
    return ext & mask


def _edge_response_ok(D: jnp.ndarray, edge_ratio: float = 10.0) -> jnp.ndarray:
    """Reject edge-like extrema via the 2x2 spatial Hessian trace/det test."""
    dxx = jnp.roll(D, -1, 2) + jnp.roll(D, 1, 2) - 2 * D
    dyy = jnp.roll(D, -1, 1) + jnp.roll(D, 1, 1) - 2 * D
    dxy = (
        jnp.roll(jnp.roll(D, -1, 1), -1, 2)
        - jnp.roll(jnp.roll(D, -1, 1), 1, 2)
        - jnp.roll(jnp.roll(D, 1, 1), -1, 2)
        + jnp.roll(jnp.roll(D, 1, 1), 1, 2)
    ) * 0.25
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    return (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)


@partial(jax.jit, static_argnames=("max_keypoints", "num_scales"))
def detect_keypoints(
    img: jnp.ndarray,                # (H, W) grayscale float [0,1]
    max_keypoints: int = 1024,
    num_scales: int = 4,
    threshold: float = 0.006,  # COLMAP SiftExtraction.peak_threshold 0.02/3
                               # (0.01 starved low-contrast scenes: 184/768
                               # keypoints on the occluded arena, match
                               # yield collapsed at 2-frame orbit gaps)
    sigma0: float = 1.6,
) -> Keypoints:
    """DoG extrema -> top-K keypoints (static K) with orientation."""
    H, W = img.shape
    G, D, sigmas = dog_stack(img, num_scales=num_scales, sigma0=sigma0)
    ext = _local_extrema(D, threshold) & _edge_response_ok(D)
    score = jnp.where(ext, jnp.abs(D), -jnp.inf)  # (S,H,W)

    flat = score.reshape(-1)
    # see detect_and_describe_pyramid: approx_max_k is one memory-bound
    # pass on TPU vs top_k's full sort
    vals, idx = jax.lax.approx_max_k(flat, max_keypoints, recall_target=0.95)
    s_idx = idx // (H * W)
    y_idx = (idx % (H * W)) // W
    x_idx = idx % W
    valid = jnp.isfinite(vals)

    # subpixel refinement: 2D quadratic fit on the DoG slice, offset
    # -H^{-1} g clamped to +-0.5 (a half-pixel bias would dominate the
    # epipolar signal at typical parallax magnitudes)
    def refine(s, y, x):
        c = D[s, y, x]
        gx = 0.5 * (D[s, y, x + 1] - D[s, y, x - 1])
        gy = 0.5 * (D[s, y + 1, x] - D[s, y - 1, x])
        hxx = D[s, y, x + 1] + D[s, y, x - 1] - 2 * c
        hyy = D[s, y + 1, x] + D[s, y - 1, x] - 2 * c
        hxy = 0.25 * (
            D[s, y + 1, x + 1] - D[s, y + 1, x - 1]
            - D[s, y - 1, x + 1] + D[s, y - 1, x - 1]
        )
        det = hxx * hyy - hxy * hxy
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        ox = -(hyy * gx - hxy * gy) / det
        oy = -(-hxy * gx + hxx * gy) / det
        return jnp.clip(jnp.stack([ox, oy]), -0.5, 0.5)

    # clamp indices so the +-1 stencils stay in range (borders are already
    # excluded from the extrema mask)
    y_c = jnp.clip(y_idx, 1, H - 2)
    x_c = jnp.clip(x_idx, 1, W - 2)
    offsets = jax.vmap(refine)(s_idx, y_c, x_c)
    xy = jnp.stack([x_idx, y_idx], axis=-1).astype(jnp.float32) + offsets
    kp_sigma = sigmas[s_idx + 1]  # DoG slice s uses gaussians s, s+1

    # orientation from the blurred image gradients at the keypoint scale
    gx = (jnp.roll(G, -1, 2) - jnp.roll(G, 1, 2)) * 0.5
    gy = (jnp.roll(G, -1, 1) - jnp.roll(G, 1, 1)) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)
    angle = _dominant_orientation(mag, ori, s_idx + 1, x_idx, y_idx)
    return Keypoints(
        xy=xy, scale=kp_sigma, angle=angle,
        score=jnp.where(valid, vals, 0.0), valid=valid,
    )


def _dominant_orientation(mag, ori, s_idx, x_idx, y_idx, radius: int = 8, bins: int = 36):
    """Histogram of gradient orientations in a (2r+1)^2 window (Gaussian
    weighted), vmapped over keypoints. Returns the peak-bin angle.

    Gather strategy (round-3 finding, tools/feat_profile.py): the window is
    fetched as POINT gathers from a flat 2-D operand with FOUR x-neighbors
    of (mag, ori) packed on the trailing dim — (2r+1) * ceil((2r+1)/4)
    8-vector rows per keypoint instead of (2r+1)^2 2-vector rows (the
    gather unit is row-latency-bound; ops/quadpack). Row SLICES would be
    fewer rows still, but vmapped dynamic_slice does NOT hit the fast
    gather unit: measured 130 ms/frame (~20x slower than point gathers),
    and a trailing-dim variant OOMs in a 64x-padded transposed copy."""
    offs = jnp.arange(-radius, radius + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    g = jnp.exp(-(dx ** 2 + dy ** 2) / (2.0 * (0.5 * radius) ** 2))
    S, H, W = mag.shape
    w = 2 * radius + 1
    nx = -(-w // 4)  # x-groups of 4 packed neighbors
    # pack mo[x], mo[x+1], mo[x+2], mo[x+3] on the trailing dim
    mo = jnp.stack([mag, ori], axis=-1)  # (S, H, W, 2)

    def shift_x(a, k):
        return jnp.concatenate([a[:, :, k:], jnp.repeat(a[:, :, -1:], k, 2)], 2)

    moq = jnp.concatenate([mo] + [shift_x(mo, k) for k in (1, 2, 3)], -1)
    flat = moq.reshape(S * H * W, 8)

    def one(s, x, y):
        ys = jnp.clip(y + offs, 0, H - 1)                       # (w,)
        xg = jnp.clip(x - radius + 4 * jnp.arange(nx), 0, W - 4)  # (nx,)
        idx = (s * H + ys[:, None]) * W + xg[None, :]           # (w, nx)
        # (j, k) merge is x-ascending: position = x - radius + 4j + k
        v = flat[idx.reshape(-1)].reshape(w, nx * 4, 2)[:, :w]  # (w, w, 2)
        m = v[..., 0] * g
        o = v[..., 1]
        b = jnp.floor((o + jnp.pi) / (2 * jnp.pi) * bins).astype(jnp.int32) % bins
        # one-hot reduction instead of scatter-add (TPU scatters serialize)
        onehot = b.reshape(-1)[:, None] == jnp.arange(bins,
                                                      dtype=jnp.int32)[None]
        hist = jnp.sum(m.reshape(-1)[:, None] * onehot, axis=0)
        # circular smoothing (Lowe) stabilizes the peak on symmetric corners
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        peak = jnp.argmax(hist)
        # parabolic peak interpolation: sub-bin accuracy (~1-2 deg) instead
        # of the 360/bins quantization — measurably tightens descriptor
        # repeatability under in-plane rotation
        hl = hist[(peak - 1) % bins]
        hc = hist[peak]
        hr = hist[(peak + 1) % bins]
        denom = hl - 2.0 * hc + hr
        off = jnp.where(jnp.abs(denom) > 1e-12,
                        0.5 * (hl - hr) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0),
                        0.0)
        off = jnp.clip(off, -0.5, 0.5)
        return ((peak.astype(jnp.float32) + 0.5 + off) / bins) * 2 * jnp.pi - jnp.pi

    return jax.vmap(one)(s_idx, x_idx, y_idx)


def _dominant_orientation_dense(mag, ori, s_idx, x_idx, y_idx,
                                radius: int = 8, bins: int = 36):
    """Dense reformulation of `_dominant_orientation`: compute the
    Gaussian-windowed orientation histogram DENSELY for every pixel with
    two separable depthwise convolutions over 36 one-hot bin planes, then
    gather ONE row per keypoint instead of 85.

    MEASURED AND REJECTED on hardware (round 4, tools/feat_profile.py):
    69.4 ms/frame cumulative vs 26.1 for the quad-packed gather form at
    384x1280/K=1024/3 octaves. The 36-group depthwise convolutions lower
    to VPU loops that do not amortize, and octave -1 (768x2560) makes the
    dense pass pay for 10M pixels to serve 1024 keypoints. Kept as the
    documented counter-experiment + numerical cross-check for the gather
    form (tests/test_features.py::TestDenseOrientation) — and because on
    a denser-keypoint regime (K ~ H*W/100) the crossover would flip.

    This closes the round-3 roofline question: the production front end is
    UPRIGHT (run_sfm/_detect_sequence pass upright=True — KITTI-style
    forward motion, design note in detect_and_describe), which skips
    orientation entirely and measures 28.8 ms/frame on hardware, under the
    30 ms target. The oriented variant stays at ~46 ms/frame with the
    85-row gather as its floor-setting stage.

    Border semantics: edge-replicate padding, matching the clip-to-edge
    gathers of the sparse form. Peak smoothing + parabolic interpolation
    are identical."""
    S, H, W = mag.shape
    w = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1).astype(mag.dtype)
    g1 = jnp.exp(-(offs ** 2) / (2.0 * (0.5 * radius) ** 2))  # separable

    b = jnp.floor((ori + jnp.pi) / (2 * jnp.pi) * bins).astype(jnp.int32) % bins

    def conv_scale(m_s, b_s):
        planes = m_s[..., None] * (
            b_s[..., None] == jnp.arange(bins, dtype=jnp.int32))  # (H,W,B)
        x = jnp.pad(planes, ((0, 0), (radius, radius), (0, 0)), mode="edge")
        x = jnp.moveaxis(x, -1, 0)[None]                      # (1,B,H,W+2r)
        kx = jnp.broadcast_to(g1[None, None, None, :], (bins, 1, 1, w))
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), "VALID", feature_group_count=bins)
        x = jnp.pad(x, ((0, 0), (0, 0), (radius, radius), (0, 0)),
                    mode="edge")
        ky = jnp.broadcast_to(g1[None, None, :, None], (bins, 1, w, 1))
        x = jax.lax.conv_general_dilated(
            x, ky, (1, 1), "VALID", feature_group_count=bins)
        return jnp.moveaxis(x[0], 0, -1)                      # (H,W,B)

    def per_scale(sb):
        # conv one scale, gather all K keypoint rows, mask to this scale —
        # avoids materializing the (S,H,W,B) stack (1.1 GB at octave -1)
        m_s, b_s, s = sb
        dense = conv_scale(m_s, b_s)                          # (H,W,B)
        hsel = dense[y_idx, x_idx]                            # (K,B)
        return jnp.where((s_idx == s)[:, None], hsel, 0.0)

    hist = jnp.sum(
        jax.lax.map(per_scale, (mag, b, jnp.arange(S))), axis=0)  # (K,B)

    hist = (jnp.roll(hist, 1, axis=1) + hist
            + jnp.roll(hist, -1, axis=1)) / 3.0
    peak = jnp.argmax(hist, axis=1)
    k = jnp.arange(hist.shape[0])
    hl = hist[k, (peak - 1) % bins]
    hc = hist[k, peak]
    hr = hist[k, (peak + 1) % bins]
    denom = hl - 2.0 * hc + hr
    off = jnp.where(jnp.abs(denom) > 1e-12,
                    0.5 * (hl - hr) / jnp.where(jnp.abs(denom) > 1e-12,
                                                denom, 1.0), 0.0)
    off = jnp.clip(off, -0.5, 0.5)
    return ((peak.astype(jnp.float32) + 0.5 + off) / bins) * 2 * jnp.pi - jnp.pi


# --------------------------------------------------------------- descriptor

def _hist_from_gradients(rgx, rgy, px, py, patch_grid: int, ori_bins: int):
    """Gradient samples -> SIFT histogram with Gaussian windowing and
    trilinear soft binning (Lowe §6): each sample's magnitude is split
    bilinearly over the 2x2 neighboring spatial cells and linearly over the
    2 neighboring orientation bins — kills the cell-boundary aliasing that
    hard binning suffers under sub-pixel shifts (the dominant descriptor
    noise at wide baseline). Returns the raw (cells^2 * ori_bins,) hist."""
    cell = patch_grid
    m = jnp.sqrt(rgx * rgx + rgy * rgy)
    # Gaussian window over the patch (sigma = half patch half-width)
    m = m * jnp.exp(-(px ** 2 + py ** 2) / (2.0 * 0.5 ** 2))
    o = jnp.arctan2(rgy, rgx)

    cfy = (py + 1.0) * 0.5 * cell - 0.5
    cfx = (px + 1.0) * 0.5 * cell - 0.5
    y0 = jnp.floor(cfy)
    x0 = jnp.floor(cfx)
    fy = cfy - y0
    fx = cfx - x0
    ofs = (o + jnp.pi) / (2 * jnp.pi) * ori_bins - 0.5
    b0 = jnp.floor(ofs)
    fb = ofs - b0

    # accumulate the 8 trilinear contributions as (bin, weight) pairs and
    # reduce them with a one-hot comparison instead of scatter-add: TPU
    # scatters serialize (measured as the descriptor hot spot), while the
    # (8*S, n_bins) equality-mask reduction is dense VPU work XLA fuses
    flats, ws = [], []
    for dy_, wy_ in ((0, 1.0 - fy), (1, fy)):
        yi = y0 + dy_
        in_y = (yi >= 0) & (yi <= cell - 1)
        yc = jnp.clip(yi, 0, cell - 1).astype(jnp.int32)
        for dx_, wx_ in ((0, 1.0 - fx), (1, fx)):
            xi = x0 + dx_
            in_x = (xi >= 0) & (xi <= cell - 1)
            xc = jnp.clip(xi, 0, cell - 1).astype(jnp.int32)
            for db_, wb_ in ((0, 1.0 - fb), (1, fb)):
                bc = (b0.astype(jnp.int32) + db_) % ori_bins
                w = m * wy_ * wx_ * wb_ * in_y * in_x
                flats.append(((yc * cell + xc) * ori_bins + bc).reshape(-1))
                ws.append(w.reshape(-1))
    flat = jnp.concatenate(flats)          # (8*S,)
    w = jnp.concatenate(ws)                # (8*S,)
    n_bins = cell * cell * ori_bins
    onehot = flat[:, None] == jnp.arange(n_bins, dtype=jnp.int32)[None, :]
    return jnp.sum(w[:, None] * onehot, axis=0)


def _finalize_descriptor(hist: jnp.ndarray) -> jnp.ndarray:
    """SIFT normalize-clip(0.2)-renormalize, then RootSIFT (L1 + sqrt,
    Arandjelovic & Zisserman 2012): dot products become the Hellinger
    kernel, a well-measured matching win at zero runtime cost."""
    v = hist / jnp.maximum(jnp.linalg.norm(hist), 1e-12)
    v = jnp.minimum(v, 0.2)
    v = v / jnp.maximum(jnp.sum(v), 1e-12)
    return jnp.sqrt(v)

@partial(jax.jit, static_argnames=("patch_grid", "ori_bins"))
def describe_keypoints(
    img: jnp.ndarray, kps: Keypoints, patch_grid: int = 4, ori_bins: int = 8
) -> jnp.ndarray:
    """SIFT-style descriptors: (K, patch_grid^2 * ori_bins) float32, L2
    normalized with 0.2 clipping. Patches are sampled on a rotated/scaled
    grid around each keypoint (bilinear), gradients soft-binned into a
    4x4 spatial x 8 orientation histogram."""
    H, W = img.shape
    # gx/gy interleaved on a trailing dim, then quad-packed (ops/quadpack):
    # all FOUR bilinear corners of both gradient channels arrive in ONE
    # point gather of an 8-vector. The gather unit is row-latency-bound,
    # so this is ~4x fewer rows than corner-wise gathers. (A 2x2x2 block
    # gather via lax.gather was tried and OOMs: XLA copies the operand
    # into a layout with the size-2 dims minor, a 64x padded 64 GB
    # allocation. Trailing-dim packing keeps the natural layout.)
    g_img = jnp.stack(
        [(jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)) * 0.5,
         (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)) * 0.5], axis=-1)
    g_q = quad_pack(g_img)  # (H, W, 8)

    # 16x16 sample grid in normalized patch coords [-1, 1)
    n = 4 * patch_grid
    lin = (jnp.arange(n) + 0.5) / n * 2.0 - 1.0
    py, px = jnp.meshgrid(lin, lin, indexing="ij")  # (n, n)

    def one(xy, sigma, angle):
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        rad = 6.0 * sigma  # patch half-width in pixels
        sx = (ca * px - sa * py) * rad + xy[0]
        sy = (sa * px + ca * py) * rad + xy[1]
        xs = jnp.clip(sx, 0, W - 1)
        ys = jnp.clip(sy, 0, H - 1)
        # corner pinned to W-2/H-2 so the 2x2 block stays in range; at the
        # top edge the weight saturates to 1, same value as corner clamping
        x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
        wx = (xs - x0)[..., None]
        wy = (ys - y0)[..., None]

        v00, v01, v10, v11 = quad_gather(g_q, y0, x0)
        g = (
            v00 * (1 - wx) * (1 - wy)
            + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy
            + v11 * wx * wy
        )  # (..., 2)
        gx = g[..., 0]
        gy = g[..., 1]
        # rotate gradients into the patch frame
        rgx = ca * gx + sa * gy
        rgy = -sa * gx + ca * gy
        return _finalize_descriptor(
            _hist_from_gradients(rgx, rgy, px, py, patch_grid, ori_bins))

    desc = jax.vmap(one)(kps.xy, kps.scale, kps.angle)
    return jnp.where(kps.valid[:, None], desc, 0.0)


def _describe_on_stack(G: jnp.ndarray, xy: jnp.ndarray, s_idx: jnp.ndarray,
                       sigma: jnp.ndarray, angle: jnp.ndarray,
                       valid: jnp.ndarray,
                       patch_grid: int = 4, ori_bins: int = 8) -> jnp.ndarray:
    """SIFT descriptors sampled from the *Gaussian stack* of one octave:
    each keypoint's gradients come from its own scale slice G[s], at octave
    coordinates — this is what makes descriptors scale-covariant across
    octaves (a blob twice as large, detected one octave up, sees the same
    patch)."""
    S1, H, W = G.shape
    # interleaved gx/gy, quad-packed per scale slice: the four bilinear
    # corners of both gradient channels in ONE point gather of an 8-vector
    # (see describe_keypoints / ops/quadpack for why NOT a block gather)
    g_st = jnp.stack(
        [(jnp.roll(G, -1, 2) - jnp.roll(G, 1, 2)) * 0.5,
         (jnp.roll(G, -1, 1) - jnp.roll(G, 1, 1)) * 0.5], axis=-1)
    g_q = jax.vmap(quad_pack)(g_st)  # (S1, H, W, 8)

    n = 4 * patch_grid
    lin = (jnp.arange(n) + 0.5) / n * 2.0 - 1.0
    py, px = jnp.meshgrid(lin, lin, indexing="ij")

    def one(xy1, s, sg, ang):
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        rad = 6.0 * sg
        sx = (ca * px - sa * py) * rad + xy1[0]
        sy = (sa * px + ca * py) * rad + xy1[1]
        xs = jnp.clip(sx, 0, W - 1)
        ys = jnp.clip(sy, 0, H - 1)
        x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
        wx = (xs - x0)[..., None]
        wy = (ys - y0)[..., None]

        v = g_q[s, y0, x0]  # (..., 8): one gather for all four corners
        v00, v01, v10, v11 = v[..., :2], v[..., 2:4], v[..., 4:6], v[..., 6:]
        g = (
            v00 * (1 - wx) * (1 - wy)
            + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy
            + v11 * wx * wy
        )  # (..., 2)
        gx = g[..., 0]
        gy = g[..., 1]
        rgx = ca * gx + sa * gy
        rgy = -sa * gx + ca * gy
        return _finalize_descriptor(
            _hist_from_gradients(rgx, rgy, px, py, patch_grid, ori_bins))

    desc = jax.vmap(one)(xy, s_idx, sigma, angle)
    return jnp.where(valid[:, None], desc, 0.0)


# ------------------------------------------------------------ multi-octave

@partial(jax.jit, static_argnames=(
    "max_keypoints", "num_octaves", "num_scales", "upright", "upsample_first"))
def detect_and_describe_pyramid(
    img: jnp.ndarray,
    max_keypoints: int = 1024,
    num_octaves: int = 3,
    num_scales: int = 5,
    threshold: float = 0.006,  # see detect_keypoints: COLMAP peak threshold
    sigma0: float = 1.6,
    upright: bool = False,
    upsample_first: bool = True,
) -> tuple[Keypoints, jnp.ndarray]:
    """Multi-octave DoG detection + per-octave descriptors — the COLMAP-SIFT
    octave structure (`ref/software_record/colmap使用.docx` §2.2) that a
    single-octave stack cannot reproduce: large-scale features on
    native-resolution imagery (e.g. KITTI 1241x376) only appear octaves up.

    Per octave o (image /2^o): DoG extrema -> per-octave top-K_o candidates
    (K_o = max_keypoints >> o, floor 64) -> descriptors sampled from that
    octave's Gaussian stack. Candidates from all octaves compete in one
    global top-``max_keypoints`` by DoG response. Coordinates/scales are
    reported in full-resolution pixels. Static shapes throughout, so the
    whole function vmaps over frames.

    ``upsample_first`` prepends a 2x-upsampled octave (-1) — COLMAP SIFT's
    ``first_octave=-1`` default — extending the detectable band one doubling
    *down* (full-res sigma ~1.0-1.6); without it, fine-scale features right
    at sigma0*k sit on the stack's scale border and drop out."""
    Hf, Wf = img.shape
    octaves = list(range(num_octaves))
    if upsample_first:
        octaves = [-1] + octaves
        # bilinear 2x upsample; the upsampled image carries ~1.0px blur in
        # its own pixels (0.5px native doubled), so top up to exactly sigma0
        base = jax.image.resize(img, (2 * Hf, 2 * Wf), "bilinear")
        base = gaussian_blur(base, max(sigma0 ** 2 - 1.0, 0.25) ** 0.5)
    else:
        # octave-0 base at exactly sigma0 (treat input as unblurred —
        # matches the round-1 single-octave stack, G[0] = blur(img, sigma0))
        base = gaussian_blur(img, sigma0)

    all_xy, all_scale, all_angle, all_score, all_valid, all_desc = \
        [], [], [], [], [], []
    for o in octaves:
        H, W = base.shape
        if min(H, W) < 32:
            break
        k_o = max(max_keypoints >> max(o, 0), 64)
        G, D, sigmas = dog_stack_from_base(base, num_scales=num_scales,
                                           sigma0=sigma0)
        ext = _local_extrema(D, threshold) & _edge_response_ok(D)
        score = jnp.where(ext, jnp.abs(D), -jnp.inf)
        flat = score.reshape(-1)
        # approx_max_k (TPU PartialReduce): one memory-bound pass instead
        # of lax.top_k's full sort — measured 34 ms/frame of the 74 ms
        # front end went to these per-octave top_k sorts (tools/
        # feat_profile.py). recall 0.95 means ~5% of the weakest selected
        # extrema swap for near-equal ones; keypoint selection is
        # threshold-arbitrary to begin with, and match quality is pinned
        # by tests/test_features.py.
        vals, idx = jax.lax.approx_max_k(flat, k_o, recall_target=0.95)
        s_idx = idx // (H * W)
        y_idx = (idx % (H * W)) // W
        x_idx = idx % W
        valid = jnp.isfinite(vals)

        def refine(s, y, x, D=D):
            c = D[s, y, x]
            gx = 0.5 * (D[s, y, x + 1] - D[s, y, x - 1])
            gy = 0.5 * (D[s, y + 1, x] - D[s, y - 1, x])
            hxx = D[s, y, x + 1] + D[s, y, x - 1] - 2 * c
            hyy = D[s, y + 1, x] + D[s, y - 1, x] - 2 * c
            hxy = 0.25 * (
                D[s, y + 1, x + 1] - D[s, y + 1, x - 1]
                - D[s, y - 1, x + 1] + D[s, y - 1, x - 1]
            )
            det = hxx * hyy - hxy * hxy
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            ox = -(hyy * gx - hxy * gy) / det
            oy = -(-hxy * gx + hxx * gy) / det
            return jnp.clip(jnp.stack([ox, oy]), -0.5, 0.5)

        y_c = jnp.clip(y_idx, 1, H - 2)
        x_c = jnp.clip(x_idx, 1, W - 2)
        offsets = jax.vmap(refine)(s_idx, y_c, x_c)
        xy_oct = jnp.stack([x_idx, y_idx], -1).astype(jnp.float32) + offsets
        sg_oct = sigmas[s_idx + 1]

        if upright:
            angle = jnp.zeros((k_o,), jnp.float32)
        else:
            gxs = (jnp.roll(G, -1, 2) - jnp.roll(G, 1, 2)) * 0.5
            gys = (jnp.roll(G, -1, 1) - jnp.roll(G, 1, 1)) * 0.5
            mag = jnp.sqrt(gxs * gxs + gys * gys)
            ori = jnp.arctan2(gys, gxs)
            angle = _dominant_orientation(mag, ori, s_idx + 1, x_idx, y_idx)

        desc = _describe_on_stack(G, xy_oct, s_idx + 1, sg_oct, angle, valid)

        f = float(2 ** o)
        all_xy.append((xy_oct + 0.5) * f - 0.5)   # pixel-center convention
        all_scale.append(sg_oct * f)
        all_angle.append(angle)
        all_score.append(jnp.where(valid, vals, -jnp.inf))
        all_valid.append(valid)
        all_desc.append(desc)
        # next octave base: the sigma=2*sigma0 slice, subsampled 2x
        base = G[num_scales - 2][::2, ::2]

    xy = jnp.concatenate(all_xy)
    scale = jnp.concatenate(all_scale)
    angle = jnp.concatenate(all_angle)
    score = jnp.concatenate(all_score)
    valid = jnp.concatenate(all_valid)
    desc = jnp.concatenate(all_desc)

    top_s, top_i = jax.lax.top_k(score, max_keypoints)
    sel_valid = valid[top_i] & jnp.isfinite(top_s)
    sel_xy = xy[top_i]

    # cross-octave non-max suppression: the same physical feature detected
    # in two octaves (esp. octave -1 duplicating octave 0) yields two
    # keypoints within ~a pixel. Downstream track building sees them as a
    # same-frame conflict and drops the track — so duplicates preferentially
    # kill the STRONGEST tracks. Greedy triangular NMS: a keypoint is
    # suppressed if any higher-scored one sits within 2px (top_k output is
    # score-sorted, so "higher-scored" == lower row index).
    d2 = jnp.sum((sel_xy[:, None, :] - sel_xy[None, :, :]) ** 2, -1)
    close = (d2 < 2.0 ** 2) & sel_valid[None, :]
    tri = jnp.tril(jnp.ones_like(close), k=-1)  # j < i
    suppressed = jnp.any(close & tri, axis=1)
    sel_valid = sel_valid & ~suppressed

    kps = Keypoints(
        xy=sel_xy, scale=scale[top_i], angle=angle[top_i],
        score=jnp.where(sel_valid, top_s, 0.0), valid=sel_valid,
    )
    return kps, jnp.where(sel_valid[:, None], desc[top_i], 0.0)


def detect_and_describe(
    img: jnp.ndarray, max_keypoints: int = 1024, upright: bool = False,
    num_octaves: int = 3, **kw
):
    """Convenience: grayscale (H,W) -> (Keypoints, descriptors (K,128)).

    Multi-octave by default (``num_octaves=3``); ``num_octaves=1`` recovers
    the round-1 single-octave stack. ``upright=True`` skips rotation
    normalization — more stable on forward-motion video (KITTI-style),
    where roll is negligible and dominant-orientation estimates flap on
    symmetric corners.
    """
    if num_octaves == 1:
        kps = detect_keypoints(img, max_keypoints=max_keypoints, **kw)
        if upright:
            kps = kps._replace(angle=jnp.zeros_like(kps.angle))
        return kps, describe_keypoints(img, kps)
    return detect_and_describe_pyramid(
        img, max_keypoints=max_keypoints, num_octaves=num_octaves,
        upright=upright, **kw)
