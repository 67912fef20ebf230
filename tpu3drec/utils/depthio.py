"""Depth decoding — one explicit config per dataset.

The reference decodes depth three inconsistent ways (grayscale 8-bit read at
`ref/transfer/camera_to_world.py:160`; green channel of a color read at
`ref/transfer/pixel_to_camera.py:133-134`; 16-bit InteriorNet PNGs resized
NEAREST at `ref/monodepth2/interior_dataset.py:107-117`; COLMAP-dense maps
resized+grayscaled to npy at `ref/other_tools/data_transfer.py:5-16`). Here
every decoding is a named mode so a pipeline states its depth contract once.

Host-side by design (PIL/numpy); the result feeds the device in one batch
transfer. cv2 is optional — PIL covers every mode.
"""

from __future__ import annotations

import numpy as np

try:  # cv2 exists in the image but keep PIL as the portable path
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image

DEPTH_MODES = (
    "gray8",        # 8-bit grayscale; pixel value IS metric depth (reference RGBD path)
    "green8",       # green channel of an RGB read (reference pixel_to_camera path)
    "uint16",       # 16-bit PNG, raw counts (InteriorNet GT depth)
    "uint16_mm",    # 16-bit PNG in millimetres -> metres
    "npy",          # .npy float array (reference data_transfer output)
    "float",        # float TIFF/EXR-style via PIL 'F' mode
)


def load_depth(
    path: str,
    mode: str = "gray8",
    scale: float = 1.0,
    size: tuple[int, int] | None = None,  # (width, height)
) -> np.ndarray:
    """Load one depth map as float32 (H, W), optionally NEAREST-resized.

    ``scale`` multiplies decoded values (e.g. 1/1000 for mm->m).
    """
    if mode not in DEPTH_MODES:
        raise ValueError(f"unknown depth mode {mode!r}; one of {DEPTH_MODES}")

    if mode == "npy":
        depth = np.load(path).astype(np.float32)
        if size is not None and depth.shape[::-1] != size:
            depth = _resize_nearest(depth, size)
        return depth * scale

    img = Image.open(path)
    if mode == "gray8":
        img = img.convert("L")
    elif mode == "green8":
        img = img.convert("RGB")
    elif mode in ("uint16", "uint16_mm"):
        if img.mode not in ("I", "I;16", "I;16B"):
            img = img.convert("I")
    elif mode == "float":
        img = img.convert("F")
    if size is not None:
        img = img.resize(size, Image.NEAREST)
    arr = np.asarray(img)
    if mode == "green8":
        arr = arr[..., 1]
    depth = arr.astype(np.float32)
    if mode == "uint16_mm":
        depth = depth / 1000.0
    return depth * scale


def _resize_nearest(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    w, h = size
    if _HAS_CV2:
        return cv2.resize(arr, (w, h), interpolation=cv2.INTER_NEAREST)
    ys = (np.arange(h) * arr.shape[0] / h).astype(np.int64)
    xs = (np.arange(w) * arr.shape[1] / w).astype(np.int64)
    return arr[ys][:, xs]


def load_depth_stack(
    paths: list[str], mode: str = "gray8", scale: float = 1.0,
    size: tuple[int, int] | None = None,
) -> np.ndarray:
    """Load a sequence into one (F, H, W) float32 stack (device-transfer ready)."""
    maps = [load_depth(p, mode=mode, scale=scale, size=size) for p in paths]
    return np.stack(maps, axis=0)


def load_image_rgb(path: str, size: tuple[int, int] | None = None) -> np.ndarray:
    """RGB image as uint8 (H, W, 3)."""
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize(size, Image.BILINEAR)
    return np.asarray(img)
