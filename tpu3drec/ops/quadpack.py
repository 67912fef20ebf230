"""Quad-packed bilinear gathers — the TPU formulation of image sampling.

The TPU gather unit is row-LATENCY-bound (~15M rows/s measured on this
v5e, docs/design.md §6): a bilinear sample implemented as four point
gathers pays 4x the rows. Packing the four corners of each pixel's 2x2
neighborhood onto the trailing dim turns a bilinear sample into ONE point
gather of a 4C-vector — identical numerics, ~4x fewer gather rows. The
pack itself is two elementwise shifts XLA fuses (HBM-bound, negligible
next to the gathers it deletes).

Why not lax.gather with slice_sizes=(2,2,...): XLA copies the operand
into a layout with the size-2 dims minor — a 64x padded allocation
(measured 64 GB OOM, round-2 notes). Trailing-dim packing keeps the
natural layout. This module is the shared home of the trick; users:
`models/monodepth.py` (photometric warps — the training hot loop,
`ref/monodepth2/trainer.py:351-401`) and `sfm/features.py` (descriptor
patch sampling — the SfM front-end hot loop).
"""

from __future__ import annotations

import jax.numpy as jnp


def quad_pack(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (H, W, 4C): channels [v(y,x), v(y,x+1), v(y+1,x),
    v(y+1,x+1)], edge-clamped (x+1 -> min(x+1, W-1), same for y).

    The clamping matches border-mode bilinear sampling: for x0 in
    [0, W-1], packed[y0, x0] holds exactly the four corner values
    bilinear interpolation needs, including at the image edge.
    """
    xp = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)    # x+1, clamped
    yp = jnp.concatenate([img[1:], img[-1:]], axis=0)          # y+1, clamped
    xyp = jnp.concatenate([xp[1:], xp[-1:]], axis=0)           # both
    return jnp.concatenate([img, xp, yp, xyp], axis=-1)


def quad_gather(qimg: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray):
    """Fetch the 4 bilinear corners in one point gather.

    qimg: (H, W, 4C) from `quad_pack`; y0, x0: integer arrays (any shape),
    y0 in [0, H-1], x0 in [0, W-1]. Returns (v00, v01, v10, v11), each
    shaped y0.shape + (C,).
    """
    H, W, C4 = qimg.shape
    C = C4 // 4
    flat = qimg.reshape(H * W, C4)
    idx = (y0 * W + x0).astype(jnp.int32)
    v = flat[idx.reshape(-1)].reshape(y0.shape + (C4,))
    return v[..., :C], v[..., C:2 * C], v[..., 2 * C:3 * C], v[..., 3 * C:]


def bilinear_sample_quad(qimg: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with border clamping from a quad-packed image.

    qimg: (H, W, 4C); x, y: absolute pixel coords (any shape). Bit-identical
    to 4-corner gathering from the unpacked image at 1/4 the gather rows.
    Equivalent to torch grid_sample(padding_mode="border") as used at
    `ref/monodepth2/trainer.py:394-398`.
    """
    H, W, _ = qimg.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    v00, v01, v10, v11 = quad_gather(qimg, y0, x0)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
