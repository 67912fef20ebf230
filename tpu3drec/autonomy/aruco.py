"""Fiducial-marker (ArUco original) generation, detection, and decode.

The reference scans competition boards for ArUco markers with OpenCV
(`ref/airsim/main.cpp:816-902`: DICT_ARUCO_ORIGINAL, detectMarkers with
gamma/contrast-stretch retries, id checked against a 5-entry task list).
Here the whole decode path is a jittable XLA program: largest dark quad →
principal-axis corner extraction → exact 4-point homography → grid
sampling → per-row codeword decode under 4 rotations.

DICT_ARUCO_ORIGINAL structure (verified bit-exact against cv2.aruco in
`tests/test_autonomy.py`): 5x5 inner grid, each row encodes 2 id bits
(row 0 most significant) with codewords 00→10000, 01→10111, 10→01001,
11→01110 — so decode is 20 codeword comparisons, not a 1024-entry search,
and any bit flip surfaces as a nonzero hamming error.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drec.autonomy.detect import label_components

_CODEWORDS = np.array(
    [[1, 0, 0, 0, 0],
     [1, 0, 1, 1, 1],
     [0, 1, 0, 0, 1],
     [0, 1, 1, 1, 0]], np.float32)


def aruco_original_dictionary(n: int = 1024) -> np.ndarray:
    """First n DICT_ARUCO_ORIGINAL 5x5 bit grids, (n, 5, 5) uint8."""
    ids = np.arange(n)
    rows = np.stack(
        [(ids >> (2 * (4 - r))) & 3 for r in range(5)], axis=1)  # (n, 5)
    return _CODEWORDS[rows].astype(np.uint8)  # (n, 5, 5)


def render_marker(marker_id: int, cell_px: int = 8,
                  border_px: int = 0) -> np.ndarray:
    """Marker image in [0, 1]: 7x7 cells (1-cell black border + 5x5 code),
    optionally padded with a white quiet zone. Matches
    cv2.aruco.generateImageMarker up to resolution."""
    bits = aruco_original_dictionary(marker_id + 1)[marker_id]
    grid = np.zeros((7, 7), np.float32)
    grid[1:6, 1:6] = bits
    img = np.kron(grid, np.ones((cell_px, cell_px), np.float32))
    if border_px:
        img = np.pad(img, border_px, constant_values=1.0)
    return img


class MarkerDetection(NamedTuple):
    marker_id: jnp.ndarray  # int32, -1 when no acceptable decode
    hamming: jnp.ndarray    # codeword bit errors at the best rotation
    corners: jnp.ndarray    # (4, 2) xy, principal-axis order
    found: jnp.ndarray      # bool


def _quad_corners(sel: jnp.ndarray):
    """Corners of the largest quad component: extreme pixels along the
    component's principal diagonals (second-moment orientation + 45°),
    robust to in-plane rotation and mild perspective."""
    H, W = sel.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    n = jnp.maximum(jnp.sum(sel), 1).astype(jnp.float32)
    cx = jnp.sum(jnp.where(sel, xs, 0)) / n
    cy = jnp.sum(jnp.where(sel, ys, 0)) / n
    dx = jnp.where(sel, xs - cx, 0.0)
    dy = jnp.where(sel, ys - cy, 0.0)
    sxx = jnp.sum(dx * dx) / n
    syy = jnp.sum(dy * dy) / n
    sxy = jnp.sum(dx * dy) / n
    theta = 0.5 * jnp.arctan2(2 * sxy, sxx - syy)

    angles = theta + jnp.pi / 4 + jnp.arange(4) * (jnp.pi / 2)
    dirs = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=1)  # (4, 2)
    proj = dirs[:, 0][:, None, None] * (xs - cx) + \
        dirs[:, 1][:, None, None] * (ys - cy)
    proj = jnp.where(sel[None], proj, -jnp.inf)
    flat = proj.reshape(4, -1)
    idx = jnp.argmax(flat, axis=1)
    return jnp.stack([idx % W, idx // W], axis=1).astype(jnp.float32)


def _homography_from_unit_square(corners: jnp.ndarray) -> jnp.ndarray:
    """3x3 H mapping unit-square (u, v) -> image (x, y); corners ordered
    (0,0), (1,0), (1,1), (0,1)."""
    src = jnp.asarray(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], jnp.float32)
    rows = []
    for i in range(4):
        u, v = src[i, 0], src[i, 1]
        x, y = corners[i, 0], corners[i, 1]
        rows.append(jnp.stack(
            [u, v, 1.0, 0.0 * u, 0.0 * u, 0.0 * u, -u * x, -v * x]))
        rows.append(jnp.stack(
            [0.0 * u, 0.0 * u, 0.0 * u, u, v, 1.0, -u * y, -v * y]))
    A = jnp.stack(rows)
    b = corners.reshape(-1)
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones(1, jnp.float32)]).reshape(3, 3)


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def _sample_grid(gray: jnp.ndarray, corners: jnp.ndarray, cells: int = 7):
    """Mean intensity of each of cells x cells marker cells (the corners
    bound the OUTER black border), via a 3x3 subsample per cell."""
    Hm = _homography_from_unit_square(corners)
    sub = (jnp.arange(3, dtype=jnp.float32) + 1.0) / 4.0
    c = (jnp.arange(cells, dtype=jnp.float32)[:, None] + sub[None]) / cells
    u = c.reshape(-1)  # (cells*3,)
    uu, vv = jnp.meshgrid(u, u, indexing="xy")
    ones = jnp.ones_like(uu)
    p = Hm @ jnp.stack([uu.ravel(), vv.ravel(), ones.ravel()])
    x = p[0] / p[2]
    y = p[1] / p[2]
    vals = _bilinear(gray, x, y).reshape(cells * 3, cells * 3)
    # (row v, col u) cell means: vals is indexed [y-ish, x-ish]
    return vals.reshape(cells, 3, cells, 3).mean(axis=(1, 3))


def _decode_bits(bits: jnp.ndarray):
    """(5, 5) hard bits -> (id, hamming) minimized over the 4 rotations."""
    cw = jnp.asarray(_CODEWORDS)  # (4, 5)

    def one_rot(b):
        # per-row nearest codeword
        d = jnp.sum(jnp.abs(b[:, None, :] - cw[None]), axis=2)  # (5, 4)
        pair = jnp.argmin(d, axis=1)                            # (5,)
        err = jnp.sum(jnp.min(d, axis=1))
        weights = 4 ** jnp.arange(4, -1, -1)
        mid = jnp.sum(pair * weights)
        return mid.astype(jnp.int32), err

    rots = jnp.stack([jnp.rot90(bits, k) for k in range(4)])
    ids, errs = jax.vmap(one_rot)(rots)
    k = jnp.argmin(errs)
    return ids[k], errs[k]


@partial(jax.jit, static_argnames=("min_area",))
def decode_marker(
    gray: jnp.ndarray,
    thresh: float = 0.5,
    min_area: int = 64,
    max_hamming: int = 0,
) -> MarkerDetection:
    """Detect + decode the most prominent marker in each (H, W) gray image
    of a (B, H, W) batch. The marker's black border makes it the dominant
    dark component; its quad corners give the rectifying homography."""

    def one(img):
        mask = img < thresh
        labels = label_components(mask)
        H, W = img.shape
        areas = jnp.zeros(H * W + 1, jnp.int32).at[labels.ravel()].add(1)
        areas = areas.at[H * W].set(0)
        best = jnp.argmax(areas)
        area = areas[best]
        sel = (labels == best) & mask

        corners = _quad_corners(sel)
        cell_means = _sample_grid(img, corners, cells=7)
        border_ok = jnp.all(
            jnp.concatenate([
                cell_means[0], cell_means[-1],
                cell_means[1:-1, 0], cell_means[1:-1, -1],
            ]) < thresh)
        bits = (cell_means[1:6, 1:6] > thresh).astype(jnp.float32)
        mid, err = _decode_bits(bits)
        ok = (area >= min_area) & border_ok & (err <= max_hamming)
        return MarkerDetection(
            jnp.where(ok, mid, -1), err.astype(jnp.int32), corners, ok)

    return jax.vmap(one)(gray)


def match_task_list(detections: MarkerDetection,
                    task_ids: jnp.ndarray) -> jnp.ndarray:
    """The reference's aruco.txt task-list check (`main.cpp:1553-1563`):
    which of the wanted ids was seen in this batch. Returns a bool mask
    aligned with `task_ids`."""
    seen = jnp.where(detections.found, detections.marker_id, -1)
    return (task_ids[:, None] == seen[None, :]).any(axis=1)
