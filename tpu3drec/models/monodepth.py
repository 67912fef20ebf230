"""Monodepth2-class self-supervised monocular depth: model + losses.

Faithful to the reference training semantics (`ref/monodepth2/trainer.py`):

* disparity -> depth mapping with (min_depth, max_depth)=(0.1, 100)
  (upstream `disp_to_depth`, used at `trainer.py:377`).
* photometric reprojection loss 0.85*SSIM + 0.15*L1 (`trainer.py:403-415`),
  per-source min with identity-reprojection automasking
  (`trainer.py:442-492`).
* edge-aware smoothness on mean-normalized disparity, weighted
  1e-3 / 2^scale (`trainer.py:496-503`).
* multi-scale [0..3], each scale's disparity upsampled to full resolution
  before the loss (`trainer.py:364-372`).
* pose from a 2-frame pose net, or ground-truth axis-angle+translation when
  `use_GTpose` (the thesis modification, `trainer.py:267-274`,
  `ref/monodepth2/options.py:52-55`).

TPU-first: NHWC, all-static shapes, the warp is a batched bilinear gather
(vmapped flat gather — no grid_sample), loss assembled from vmappable
primitives so pjit shards the whole step over the `data` axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu3drec.core.se3 import axis_angle_to_matrix
from tpu3drec.ops.quadpack import bilinear_sample_quad, quad_pack
from tpu3drec.models.depth_decoder import DepthDecoder
from tpu3drec.models.pose_net import PoseNet
from tpu3drec.models.resnet import ResNetEncoder


# ---------------------------------------------------------------- depth math

def disp_to_depth(disp, min_depth: float = 0.1, max_depth: float = 100.0):
    """Sigmoid disparity -> (scaled_disp, depth), upstream monodepth2
    convention (used at `ref/monodepth2/trainer.py:377`)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


def transformation_from_parameters(axisangle, translation, invert: bool = False):
    """(N,3)+(N,3) -> cam_T_cam (N,4,4) (upstream `layers.py` semantics:
    the reference feeds GT poses through the same path, `trainer.py:267-327`)."""
    R = axis_angle_to_matrix(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, -1, -2)
        t = -jnp.einsum("nij,nj->ni", R, t)
    T = jnp.zeros(axisangle.shape[:-1] + (4, 4), dtype=axisangle.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


# ------------------------------------------------------------------- warping

def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Differentiable bilinear sampling with border clamping.

    img: (H, W, C); x, y: (H', W') absolute pixel coords. Equivalent to
    torch grid_sample(padding_mode="border") as used at `trainer.py:394-398`.
    Implemented as one quad-packed gather (see `quad_pack`).
    """
    return bilinear_sample_quad(quad_pack(img), x, y)


def warp_coords(depth: jnp.ndarray, T: jnp.ndarray, fx, fy, cx, cy):
    """Backproject target depth, transform by cam_T_cam, project into the
    source camera. depth (N,H,W); T (N,4,4) -> (px, py) each (N,H,W).

    The BackprojectDepth/Project3D pipeline of `trainer.py:150-160,379-393`.
    """
    N, H, W = depth.shape
    u = jax.lax.broadcasted_iota(depth.dtype, (H, W), 1)
    v = jax.lax.broadcasted_iota(depth.dtype, (H, W), 0)
    X = (u - cx) / fx * depth  # (N,H,W) broadcasting over frames
    Y = (v - cy) / fy * depth
    ones = jnp.ones_like(depth)
    P = jnp.stack([X, Y, depth, ones], axis=-1)  # (N,H,W,4)
    Pc = jnp.einsum("nij,nhwj->nhwi", T, P)
    z = jnp.maximum(Pc[..., 2], 1e-3)
    px = Pc[..., 0] / z * fx + cx
    py = Pc[..., 1] / z * fy + cy
    return px, py


def warp_frame(src: jnp.ndarray, depth: jnp.ndarray, T: jnp.ndarray,
               fx, fy, cx, cy) -> jnp.ndarray:
    """Backproject target depth, transform by cam_T_cam, project into the
    source camera, sample. src (N,H,W,C); depth (N,H,W); T (N,4,4).

    The BackprojectDepth/Project3D pipeline of `trainer.py:150-160,379-398`
    fused into one function.
    """
    px, py = warp_coords(depth, T, fx, fy, cx, cy)
    return jax.vmap(bilinear_sample)(src, px, py)


def warp_frame_quad(src_q: jnp.ndarray, depth: jnp.ndarray, T: jnp.ndarray,
                    fx, fy, cx, cy) -> jnp.ndarray:
    """`warp_frame` on a pre-quad-packed source (N,H,W,4C) — lets the loss
    pack each source image ONCE and reuse it across all scales' warps."""
    px, py = warp_coords(depth, T, fx, fy, cx, cy)
    return jax.vmap(bilinear_sample_quad)(src_q, px, py)


# --------------------------------------------------------------------- SSIM

def _avg_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 mean pool, stride 1, reflect pad — upstream SSIM's pooling."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    return s / 9.0


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """SSIM distance in [0,1]: clamp((1 - SSIM)/2) (upstream `layers.SSIM`,
    weighted 0.85 at `trainer.py:410-415`). NHWC."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x ** 2
    sigma_y = _avg_pool3(y * y) - mu_y ** 2
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    den = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return jnp.clip((1 - num / den) / 2, 0.0, 1.0)


def reprojection_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0.85*SSIM + 0.15*L1, mean over channels -> (N,H,W)
    (`trainer.py:403-415`)."""
    l1 = jnp.mean(jnp.abs(pred - target), axis=-1)
    s = jnp.mean(ssim(pred, target), axis=-1)
    return 0.85 * s + 0.15 * l1


def smoothness_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware first-order smoothness on mean-normalized disparity
    (upstream `get_smooth_loss`, applied at `trainer.py:496-500`)."""
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    norm_disp = disp / (mean_disp + 1e-7)
    dx = jnp.abs(norm_disp[:, :, 1:, :] - norm_disp[:, :, :-1, :])
    dy = jnp.abs(norm_disp[:, 1:, :, :] - norm_disp[:, :-1, :, :])
    ix = jnp.mean(jnp.abs(img[:, :, 1:, :] - img[:, :, :-1, :]), axis=-1, keepdims=True)
    iy = jnp.mean(jnp.abs(img[:, 1:, :, :] - img[:, :-1, :, :]), axis=-1, keepdims=True)
    dx = dx * jnp.exp(-ix)
    dy = dy * jnp.exp(-iy)
    return jnp.mean(dx) + jnp.mean(dy)


# --------------------------------------------------------------------- model

class MonodepthModel(nn.Module):
    """Depth encoder/decoder + pose net, mirroring the reference's model set
    (`trainer.py:54-88`)."""

    depth_layers: int = 18
    pose_layers: int = 18
    scales: Sequence[int] = (0, 1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ResNetEncoder(depth=self.depth_layers, dtype=self.dtype)
        self.decoder = DepthDecoder(
            num_ch_enc=self.encoder.num_ch_enc, scales=tuple(self.scales),
            dtype=self.dtype,
        )
        self.pose_net = PoseNet(depth=self.pose_layers, dtype=self.dtype)

    def depth(self, img, train: bool = False):
        """RGB (N,H,W,3) in [0,1] -> {scale: disparity (N,h,w,1)}."""
        return self.decoder(self.encoder(img, train=train))

    def pose(self, img_a, img_b, train: bool = False):
        return self.pose_net(img_a, img_b, train=train)

    def __call__(self, target, sources, train: bool = False):
        """Full forward: target (N,H,W,3), sources list of (N,H,W,3) in
        temporal order semantics (frame ids relative to target).

        Returns (disps, poses) where poses[i] = (axisangle, translation).
        """
        disps = self.depth(target, train=train)
        poses = [self.pose(target, s, train=train) for s in sources]
        return disps, poses

    def forward_train(self, target, prev, nxt, with_pose: bool = True):
        """One-apply training forward (keeps BatchNorm stat updates in a
        single mutable pass). Pose pairs follow the reference's temporal
        ordering (`trainer.py:289-302`): [prev, target] and [target, next].
        """
        disps = self.depth(target, train=True)
        if not with_pose:
            return disps, None, None
        pose_prev = self.pose(prev, target, train=True)
        pose_next = self.pose(target, nxt, train=True)
        return disps, pose_prev, pose_next


# --------------------------------------------------------------------- loss

@dataclass(frozen=True)
class MonodepthLossConfig:
    scales: tuple = (0, 1, 2, 3)
    min_depth: float = 0.1
    max_depth: float = 100.0
    smoothness_weight: float = 1e-3  # --disparity_smoothness default
    automask: bool = True            # not --disable_automasking
    fx: float = 0.9375 * 640         # InteriorNet-normalized K of the
    fy: float = 1.25 * 480           # reference (`interior_dataset.py:26-30`)
    cx: float = 0.5 * 640
    cy: float = 0.5 * 480


def monodepth_loss(
    disps: dict,
    frame_Ts: Sequence[jnp.ndarray],  # cam_T_cam (N,4,4) target->source
    target: jnp.ndarray,              # (N,H,W,3)
    sources: Sequence[jnp.ndarray],   # list of (N,H,W,3)
    cfg: MonodepthLossConfig,
    identity_noise: jnp.ndarray | None = None,
):
    """Multi-scale photometric + smoothness loss (`trainer.py:417-506`).

    `identity_noise` replaces the reference's `torch.randn*1e-5` automask
    tiebreak (`trainer.py:475-478`); pass jax.random noise of shape
    (len(sources), N, H, W) or None for deterministic behavior.
    """
    N, H, W, _ = target.shape
    total = 0.0
    aux = {}
    # quad-pack every source ONCE; each of the len(scales) warps of a
    # source then costs one point gather instead of four (see `quad_pack`)
    sources_q = [jax.vmap(quad_pack)(src) for src in sources]
    ident = None
    if cfg.automask:
        # identity reprojection is scale-independent (always full-res
        # src vs target, `trainer.py:459-466`): compute once, reuse per
        # scale — saves len(scales)-1 SSIM passes per source
        ident = jnp.stack(
            [reprojection_loss(src, target) for src in sources], axis=0
        )
        ident = ident + (identity_noise if identity_noise is not None
                         else 1e-5)
    for si, scale in enumerate(cfg.scales):
        disp = disps[scale]
        # upsample to full resolution for the photometric term
        disp_full = jax.image.resize(disp, (N, H, W, 1), method="bilinear")
        _, depth = disp_to_depth(disp_full[..., 0], cfg.min_depth, cfg.max_depth)

        reproj = []
        for src_q, T in zip(sources_q, frame_Ts):
            pred = warp_frame_quad(src_q, depth, T, cfg.fx, cfg.fy, cfg.cx, cfg.cy)
            reproj.append(reprojection_loss(pred, target))
        reproj = jnp.stack(reproj, axis=0)  # (S,N,H,W)

        if cfg.automask:
            combined = jnp.concatenate([ident, reproj], axis=0)
        else:
            combined = reproj
        photo = jnp.mean(jnp.min(combined, axis=0))

        smooth = smoothness_loss(disp, jax.image.resize(
            target, (N, disp.shape[1], disp.shape[2], 3), method="bilinear"))
        scale_loss = photo + cfg.smoothness_weight * smooth / (2 ** scale)
        total = total + scale_loss
        aux[f"loss/scale_{scale}"] = scale_loss
        if scale == 0:
            aux["loss/photometric"] = photo
            aux["loss/smooth"] = smooth
    total = total / len(cfg.scales)
    aux["loss/total"] = total
    return total, aux
