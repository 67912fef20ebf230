"""Batched target-detection kernels for autonomous flight.

Capability parity with the reference client's OpenCV detectors, redesigned
as static-shape XLA programs so a whole camera batch is one device
dispatch:

* `largest_blob` — threshold → connected components → largest-area
  centroid, the reference's `detect_squares_center` / `detect_squares_PARK`
  (`ref/airsim/main.cpp:449-593`: threshold 195, findContours,
  area-priority centroid). Their polygon-vertex-count gate (approxPolyDP
  size < 15/35) becomes a circularity gate — the same "reject ragged
  contours" intent without data-dependent contour walks.
* `detect_rings` — the ring-gate ("钻圈") ellipse detector
  (`main.cpp:903-1287`, external `Ellipse.h`): Sobel edge magnitude
  correlated with an annulus kernel bank on the MXU; argmax over
  (radius, y, x) gives center + radius, the ellipse detector's weighted
  0.3a+0.7b "largest circle" selection collapsing to score order.
* `match_templates` — the number-board template bank
  (`main.cpp:1628-1632`, 9 templates): normalized cross-correlation as one
  grouped convolution.

Everything is jit/vmap-compatible: no data-dependent shapes, components
labeled by iterative min-propagation inside `lax.while_loop` (converges in
O(geodesic diameter) cheap min-pools instead of a host contour walk).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST


def _min_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 min-pool with +inf edges over trailing (H, W)."""
    return jax.lax.reduce_window(
        x, jnp.inf, jax.lax.min,
        window_dimensions=(1,) * (x.ndim - 2) + (3, 3),
        window_strides=(1,) * x.ndim,
        padding=[(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)],
    )


@jax.jit
def label_components(mask: jnp.ndarray) -> jnp.ndarray:
    """Connected components (8-neighborhood) of a boolean mask (..., H, W).

    Returns int32 labels: the minimum linear index inside each component
    (a stable canonical id), H*W where mask is False. Fixed-point of
    masked 3x3 min-propagation; `lax.while_loop` exits as soon as no label
    changes, so cost scales with the largest component's geodesic
    diameter, not a worst-case bound.
    """
    H, W = mask.shape[-2], mask.shape[-1]
    sentinel = jnp.float32(H * W)
    idx = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    labels0 = jnp.where(mask, idx, jnp.inf)

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        labels, _ = carry
        new = jnp.where(mask, _min_pool3(labels), jnp.inf)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return jnp.where(mask, labels, sentinel).astype(jnp.int32)


class Blob(NamedTuple):
    cx: jnp.ndarray           # centroid x (pixels)
    cy: jnp.ndarray           # centroid y
    area: jnp.ndarray         # pixel count
    circularity: jnp.ndarray  # 4*pi*A / P^2 (1 = disk, ~0.785 = square)
    found: jnp.ndarray        # bool


@partial(jax.jit, static_argnames=("min_area",))
def largest_blob_from_mask(mask: jnp.ndarray, min_area: int = 16) -> Blob:
    """Largest connected component's centroid + shape stats (one image)."""
    H, W = mask.shape
    labels = label_components(mask).ravel()
    # area per candidate label; one extra bin collects the background
    areas = jnp.zeros(H * W + 1, jnp.int32).at[labels].add(1)
    areas = areas.at[H * W].set(0)
    best = jnp.argmax(areas)
    area = areas[best]
    sel = (labels == best).reshape(H, W) & mask

    ys, xs = jnp.mgrid[0:H, 0:W]
    n = jnp.maximum(area, 1).astype(jnp.float32)
    cx = jnp.sum(jnp.where(sel, xs, 0)) / n
    cy = jnp.sum(jnp.where(sel, ys, 0)) / n

    # perimeter = component pixels with a non-component 4-neighbor
    pad = jnp.pad(sel, 1)
    interior = (pad[:-2, 1:-1] & pad[2:, 1:-1] & pad[1:-1, :-2]
                & pad[1:-1, 2:])
    perim = jnp.sum(sel & ~interior).astype(jnp.float32)
    circ = 4.0 * jnp.pi * area.astype(jnp.float32) / jnp.maximum(
        perim * perim, 1.0)
    return Blob(cx, cy, area, circ, area >= min_area)


@partial(jax.jit, static_argnames=("min_area", "invert"))
def largest_blob(
    gray: jnp.ndarray,
    thresh: float = 195.0 / 255.0,
    min_area: int = 16,
    invert: bool = False,
) -> Blob:
    """Reference `detect_squares_*` semantics over a (B, H, W) gray batch
    in [0, 1]: 3x3 blur, binary threshold, largest-area blob centroid.
    Set `invert` for dark-on-light targets (fiducial squares)."""
    k = jnp.full((1, 1, 3, 3), 1.0 / 9.0, gray.dtype)
    blurred = jax.lax.conv_general_dilated(
        gray[:, None], k, (1, 1), "SAME", precision=_HIGHEST,
    )[:, 0]
    mask = blurred < thresh if invert else blurred > thresh
    return jax.vmap(partial(largest_blob_from_mask, min_area=min_area))(mask)


class Ring(NamedTuple):
    cx: jnp.ndarray
    cy: jnp.ndarray
    radius: jnp.ndarray
    score: jnp.ndarray  # mean edge magnitude on the best annulus, [0, ~1]


def _sobel_mag(gray: jnp.ndarray) -> jnp.ndarray:
    gx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], gray.dtype)
    k = jnp.stack([gx, gx.T])[:, None]  # (2, 1, 3, 3)
    g = jax.lax.conv_general_dilated(
        gray[:, None], k, (1, 1), "SAME", precision=_HIGHEST)
    return jnp.sqrt(g[:, 0] ** 2 + g[:, 1] ** 2)


def _annulus_bank(radii: tuple, width: float, dtype) -> np.ndarray:
    rmax = int(max(radii))
    size = 2 * rmax + 1
    ys, xs = np.mgrid[-rmax:rmax + 1, -rmax:rmax + 1].astype(np.float32)
    d = np.sqrt(ys ** 2 + xs ** 2)
    bank = np.stack([
        (np.abs(d - r) <= width).astype(np.float32) for r in radii
    ])
    bank /= np.maximum(bank.sum(axis=(1, 2), keepdims=True), 1.0)
    return bank.reshape(len(radii), 1, size, size).astype(dtype)


@partial(jax.jit, static_argnames=("radii", "width", "stride"))
def detect_rings(
    gray: jnp.ndarray,
    radii: tuple = (12, 16, 20, 26, 32, 40, 50, 60),
    width: float = 1.5,
    stride: int = 2,
) -> Ring:
    """Ring-gate detection over a (B, H, W) gray batch: edge magnitude
    correlated with normalized annulus templates (one conv, MXU), global
    argmax over (radius, y, x). `stride` trades sub-pixel center accuracy
    for 4x less conv work.

    `score` is the CONTRAST RATIO mean-edge-on-annulus / mean-edge-global:
    ~1 on structureless noise (edges spread evenly), >>1 when edges
    concentrate on a circle — so a fixed gate (e.g. score > 2) separates
    gates from noise regardless of image brightness."""
    B, H, W = gray.shape
    edges = _sobel_mag(gray)
    mean_edge = jnp.maximum(edges.mean(axis=(1, 2), keepdims=True), 1e-6)
    edges = edges / mean_edge
    bank = jnp.asarray(_annulus_bank(radii, width, np.float32))
    scores = jax.lax.conv_general_dilated(
        edges[:, None], bank, (stride, stride), "SAME", precision=_HIGHEST,
    )  # (B, R, H/s, W/s)
    flat = scores.reshape(B, -1)
    best = jnp.argmax(flat, axis=1)
    r_idx, rem = jnp.divmod(best, scores.shape[2] * scores.shape[3])
    cy, cx = jnp.divmod(rem, scores.shape[3])
    return Ring(
        cx.astype(jnp.float32) * stride,
        cy.astype(jnp.float32) * stride,
        jnp.asarray(radii, jnp.float32)[r_idx],
        jnp.take_along_axis(flat, best[:, None], 1)[:, 0],
    )


class TemplateMatch(NamedTuple):
    index: jnp.ndarray  # best template id per image
    cx: jnp.ndarray
    cy: jnp.ndarray
    score: jnp.ndarray  # NCC in [-1, 1]


@jax.jit
def match_templates(gray: jnp.ndarray, templates: jnp.ndarray) -> TemplateMatch:
    """Normalized cross-correlation of T templates (T, h, w) against a
    (B, H, W) batch — the reference's number-board bank
    (`ref/airsim/main.cpp:1628-1632`) as one conv dispatch."""
    B, H, W = gray.shape
    T, h, w = templates.shape
    t = templates - templates.mean(axis=(1, 2), keepdims=True)
    t_norm = jnp.sqrt(jnp.maximum((t ** 2).sum(axis=(1, 2)), 1e-12))
    corr = jax.lax.conv_general_dilated(
        gray[:, None], (t / t_norm[:, None, None])[:, None],
        (1, 1), "VALID", precision=_HIGHEST,
    )  # (B, T, H', W')
    ones = jnp.ones((1, 1, h, w), gray.dtype)
    s1 = jax.lax.conv_general_dilated(
        gray[:, None], ones, (1, 1), "VALID", precision=_HIGHEST)
    s2 = jax.lax.conv_general_dilated(
        gray[:, None] ** 2, ones, (1, 1), "VALID", precision=_HIGHEST)
    n = float(h * w)
    # floor the window energy at (0.01 intensity-units)^2 per pixel:
    # flat windows have var ~ float roundoff, and corr there is roundoff
    # too, so an unfloored ratio is garbage that can out-score true matches
    local_var = jnp.maximum(s2 - s1 ** 2 / n, 1e-4 * n)
    ncc = corr / jnp.sqrt(local_var)  # (B, T, H', W')
    flat = ncc.reshape(B, -1)
    best = jnp.argmax(flat, axis=1)
    ti, rem = jnp.divmod(best, ncc.shape[2] * ncc.shape[3])
    cy, cx = jnp.divmod(rem, ncc.shape[3])
    return TemplateMatch(
        ti.astype(jnp.int32),
        cx.astype(jnp.float32) + (w - 1) / 2.0,
        cy.astype(jnp.float32) + (h - 1) / 2.0,
        jnp.take_along_axis(flat, best[:, None], 1)[:, 0],
    )


class ColorBlob(NamedTuple):
    cx: jnp.ndarray
    cy: jnp.ndarray
    area: jnp.ndarray
    found: jnp.ndarray


@partial(jax.jit, static_argnames=("channel", "dominance", "min_area"))
def detect_color_blob(
    rgb: jnp.ndarray,
    channel: int = 1,
    dominance: float = 1.25,
    min_area: int = 32,
) -> ColorBlob:
    """Dominant-channel blob (the tree detector's capability,
    `ref/airsim/main.cpp:3693` / absent `detect_tree.h`): pixels where one
    channel exceeds `dominance` x both others, largest component centroid.
    rgb is (B, H, W, 3) in [0, 1]."""
    c = rgb[..., channel]
    others = jnp.stack(
        [rgb[..., i] for i in range(3) if i != channel], axis=-1)
    mask = (c > dominance * others[..., 0]) & (c > dominance * others[..., 1])
    blob = jax.vmap(partial(largest_blob_from_mask, min_area=min_area))(mask)
    return ColorBlob(blob.cx, blob.cy, blob.area, blob.found)
