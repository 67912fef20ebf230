"""One typed, serializable config tree for every pipeline stage.

Replaces the reference's split-brain configuration: a 40-flag argparse
namespace for training (`ref/monodepth2/options.py:15-212`) plus hard-coded
constants edited in-place everywhere else (intrinsics at
`ref/transfer/pixel_to_camera.py:25-28`, paths at
`ref/transfer/camera_to_world.py:87,174,179`, octree resolution at
`ref/octomap/txt_transfer_octomap.py:33` — per `ref/readme.md:76-80,90` the
documented workflow is "edit the source"). Here every stage states its
config as a dataclass; the whole tree round-trips through JSON.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def from_dict(cls, d: dict):
    """Recursively build a dataclass from a plain dict (inverse of to_dict).

    Field types are resolved with ``get_type_hints`` — under
    ``from __future__ import annotations`` the raw ``f.type`` is a string,
    which silently skipped nested-dataclass conversion (found driving the
    CLI with a JSON config)."""
    import typing

    if not is_dataclass(cls):
        return d
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        ftype = hints.get(f.name, f.type)
        if is_dataclass(ftype) and isinstance(v, dict):
            v = from_dict(ftype, v)
        elif isinstance(v, list):
            v = list(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def save_json(cfg, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)


def load_json(cls, path: str):
    with open(path) as f:
        return from_dict(cls, json.load(f))


@dataclass
class CameraConfig:
    """Pinhole intrinsics (reference defaults: `ref/transfer/pixel_to_camera.py:25-28`)."""

    fx: float = 600.391
    fy: float = 600.079
    cx: float = 320.0
    cy: float = 240.0
    width: int = 640
    height: int = 480

    def to_camera(self):
        from tpu3drec.core.camera import PinholeCamera

        return PinholeCamera.create(self.fx, self.fy, self.cx, self.cy, self.width, self.height)


@dataclass
class DepthDecodeConfig:
    """Depth-decoding contract (see `utils/depthio.py` for modes)."""

    mode: str = "gray8"
    scale: float = 1.0


@dataclass
class MapConfig:
    """Map-building parameters."""

    voxel_res: float = 0.1  # octree resolution, reference default (`txt_transfer_octomap.py:33`)
    min_depth: float = 1e-3  # mask non-returns; 0.0 reproduces reference exactly
    max_depth: float = 1e9
    ply_binary: bool = False
    max_points: int = 0  # 0 = unlimited (reference caps at 5.4M, `ply_transfer_octomap.py:36-38`)


@dataclass
class MeshConfig:
    """Device-mesh layout for pjit/shard_map execution."""

    data: int = 1   # frame/batch-parallel axis
    space: int = 1  # point-block / map-shard axis
    model: int = 1  # tensor-parallel axis (off by default; nets are small)


@dataclass
class RGBDPipelineConfig:
    """Config for the RGBD mapping pipeline (reference configuration 1)."""

    camera: CameraConfig = field(default_factory=CameraConfig)
    depth: DepthDecodeConfig = field(default_factory=DepthDecodeConfig)
    map: MapConfig = field(default_factory=MapConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    pose_file: str = ""
    depth_dir: str = ""
    rgb_dir: str = ""  # optional: color the cloud from RGB frames
                       # (the reference's genply_RGB capability,
                       # `pixel_to_camera.py:92-124`, built correctly)
    out_ply: str = "out/map.ply"
    out_bt: str = ""  # empty = skip octree export
    batch_frames: int = 32  # frames fused per device dispatch
