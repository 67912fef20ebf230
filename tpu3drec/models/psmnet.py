"""PSMNet-class stereo disparity network (cost volume + 3D convolutions).

The stereo-input configuration the reference names but ships no code for
(SURVEY.md C7; `ref/readme.md:5,29` — PSMNet supplies depth when stereo
pairs are available). Architecture follows the PSMNet recipe: shared
2D feature extractor at 1/4 resolution with pyramid context pooling, a
concatenation cost volume over disparities, 3D-conv regularization, and
soft-argmin disparity regression — re-dimensioned for TPU: NHWC/NDHWC
layouts, channel counts in MXU-friendly multiples, static disparity range.

Training: smooth-L1 against GT disparity (PSMNet's loss), or
photometric right->left warp loss for self-supervised use; depth follows
from depth = fx * baseline / disparity (the reference's stereo T baseline
is 0.1m, `ref/monodepth2/mono_dataset.py:203-209`).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBnRelu(nn.Module):
    ch: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.ch, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=self.dilation, use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)


class FeatureExtractor(nn.Module):
    """Shared-weight tower -> (N, H/4, W/4, C) features with SPP context."""

    ch: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnRelu(self.ch, stride=2, dtype=self.dtype)(x, train)
        x = ConvBnRelu(self.ch, dtype=self.dtype)(x, train)
        x = ConvBnRelu(self.ch, stride=2, dtype=self.dtype)(x, train)
        x = ConvBnRelu(self.ch * 2, dtype=self.dtype)(x, train)
        x = ConvBnRelu(self.ch * 2, dilation=2, dtype=self.dtype)(x, train)
        feat = ConvBnRelu(self.ch * 2, dilation=4, dtype=self.dtype)(x, train)

        # pyramid pooling: global + half context, upsampled and fused
        n, h, w, c = feat.shape
        def pooled(ph, pw):
            p = nn.avg_pool(feat, (max(h // ph, 1), max(w // pw, 1)),
                            strides=(max(h // ph, 1), max(w // pw, 1)))
            p = ConvBnRelu(self.ch, dtype=self.dtype)(p, train)
            return jax.image.resize(p, (n, h, w, self.ch), method="bilinear")

        spp = jnp.concatenate([feat, pooled(1, 1), pooled(2, 2), pooled(4, 4)], axis=-1)
        out = ConvBnRelu(self.ch * 2, dtype=self.dtype)(spp, train)
        return nn.Conv(self.ch, (1, 1), dtype=self.dtype)(out)


def build_cost_volume(fl: jnp.ndarray, fr: jnp.ndarray, max_disp4: int) -> jnp.ndarray:
    """Concat cost volume at 1/4 res: (N, D/4, H/4, W/4, 2C).

    Right features shift right by d so cost[d] aligns left pixel x with
    right pixel x-d. Out-of-range columns zero-padded (static shapes).
    """
    slices = []
    for d in range(max_disp4):
        if d == 0:
            shifted = fr
        else:
            shifted = jnp.pad(fr[:, :, :-d, :], ((0, 0), (0, 0), (d, 0), (0, 0)))
        slices.append(jnp.concatenate([fl, shifted], axis=-1))
    return jnp.stack(slices, axis=1)


class Hourglass3D(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda c, s: nn.Conv(c, (3, 3, 3), strides=(s, s, s), padding=1,
                                    use_bias=False, dtype=self.dtype)
        bn = lambda: nn.BatchNorm(use_running_average=not train, dtype=self.dtype)
        down1 = nn.relu(bn()(conv(self.ch * 2, 2)(x)))
        down1 = nn.relu(bn()(conv(self.ch * 2, 1)(down1)))
        up = jax.image.resize(down1, x.shape[:1] + x.shape[1:4] + (self.ch * 2,),
                              method="nearest")
        up = nn.relu(bn()(nn.Conv(self.ch, (3, 3, 3), padding=1, use_bias=False,
                                  dtype=self.dtype)(up)))
        return x + up


class PSMNet(nn.Module):
    """Stereo pair -> disparity map (full resolution, pixels)."""

    max_disp: int = 64          # full-res disparity range (static)
    feat_ch: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        f = FeatureExtractor(ch=self.feat_ch, dtype=self.dtype)
        fl = f(left, train)
        fr = f(right, train)
        d4 = self.max_disp // 4
        cost = build_cost_volume(fl, fr, d4)  # (N, D4, H4, W4, 2C)

        c = self.feat_ch
        x = nn.Conv(c, (3, 3, 3), padding=1, use_bias=False, dtype=self.dtype)(cost)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x))
        x = Hourglass3D(ch=c, dtype=self.dtype)(x, train)
        x = Hourglass3D(ch=c, dtype=self.dtype)(x, train)
        x = nn.Conv(1, (3, 3, 3), padding=1, dtype=self.dtype)(x)[..., 0]  # (N,D4,H4,W4)

        # soft-argmin disparity regression at 1/4 res, in 1/4-res units
        prob = jax.nn.softmax(-x, axis=1)
        disp_vals = jnp.arange(d4, dtype=self.dtype)[None, :, None, None]
        disp4 = jnp.sum(prob * disp_vals, axis=1)  # (N, H4, W4)

        # upsample x4 and rescale to full-res pixel units
        n, h4, w4 = disp4.shape
        disp = jax.image.resize(disp4[..., None], (n, h4 * 4, w4 * 4, 1),
                                method="bilinear")[..., 0] * 4.0
        return disp


def disparity_to_depth(disp: jnp.ndarray, fx: float, baseline: float = 0.1,
                       min_disp: float = 0.1) -> jnp.ndarray:
    """depth = fx * B / d (reference stereo baseline 0.1m,
    `mono_dataset.py:203-209`)."""
    return fx * baseline / jnp.maximum(disp, min_disp)


def smooth_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """PSMNet's training loss: smooth-L1 over valid-disparity pixels."""
    d = pred - gt
    ad = jnp.abs(d)
    l = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    return jnp.sum(l * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@partial(jax.jit, static_argnames=("model",))
def stereo_infer(model, variables, left, right):
    """Jitted inference entry."""
    return model.apply(variables, left, right, train=False)
