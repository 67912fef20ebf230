"""Simulated-sensor capture: the AirSim-client capability without AirSim.

The reference's data source is a Windows C++ client pulling RGB + float
depth over msgpack-RPC and writing `front/N.jpg` + `depth/N.jpg` per
keypress (`ref/airsim/main.cpp:1369-1392`, SURVEY.md C1). The capability to
keep is "simulated-sensor ingestion producing RGB+depth frame streams in
the capture layout". This module synthesizes such streams from a random 3D
scene with a flyable camera path — producing datasets in the exact on-disk
contract (`front/`, `depth/`, plus the pose txt the transform stage reads),
used by tests, benchmarks, and end-to-end demos.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
from PIL import Image

from tpu3drec.core.quaternion import matrix_to_quat_wxyz, quat_xyzw_from_wxyz
from tpu3drec.utils.config import CameraConfig
from tpu3drec.utils.poseio import PoseRecord, write_pose_txt


@dataclass
class SimScene:
    """Random blob world: positions (N,3), per-blob radius + albedo, plus a
    per-blob procedural texture (random 2D sinusoid) so every splat has
    distinctive local gradient structure — flat discs are feature-detectable
    but descriptor-ambiguous."""

    points: np.ndarray
    radii: np.ndarray
    albedo: np.ndarray
    tex_freq: np.ndarray   # (N, 2) sinusoid frequency (cycles/px-at-1m)
    tex_phase: np.ndarray  # (N,)

    @staticmethod
    def random(rng, n: int = 300, extent=((-20, -5, 5), (20, 5, 45))) -> "SimScene":
        lo, hi = np.asarray(extent[0]), np.asarray(extent[1])
        return SimScene(
            points=rng.uniform(lo, hi, size=(n, 3)).astype(np.float32),
            radii=rng.uniform(0.3, 1.2, size=n).astype(np.float32),
            albedo=rng.uniform(0.3, 1.0, size=(n, 3)).astype(np.float32),
            tex_freq=rng.uniform(0.5, 2.5, size=(n, 2)).astype(np.float32)
            * rng.choice([-1, 1], size=(n, 2)),
            tex_phase=rng.uniform(0, 2 * np.pi, size=n).astype(np.float32),
        )

    @staticmethod
    def clustered(rng, n_landmarks: int = 150, sats: int = 4,
                  extent=((-20, -5, 8), (20, 5, 45)),
                  sat_spread: float = 0.6) -> "SimScene":
        """SfM-friendly scene: each landmark is an anchor blob plus a unique
        constellation of satellite blobs at fixed 3D offsets — local
        appearance is distinctive AND rigidly view-consistent (screen-space
        texture is not; see git history)."""
        lo, hi = np.asarray(extent[0]), np.asarray(extent[1])
        anchors = rng.uniform(lo, hi, size=(n_landmarks, 3))
        offs = rng.uniform(-sat_spread, sat_spread, size=(n_landmarks, sats, 3))
        pts = np.concatenate(
            [anchors[:, None, :], anchors[:, None, :] + offs], axis=1
        ).reshape(-1, 3)
        n = pts.shape[0]
        radii = np.concatenate(
            [np.full((n_landmarks, 1), 0.35),
             rng.uniform(0.12, 0.3, size=(n_landmarks, sats))], axis=1
        ).reshape(-1)
        albedo = rng.uniform(0.25, 1.0, size=(n, 3))
        return SimScene(
            points=pts.astype(np.float32),
            radii=radii.astype(np.float32),
            albedo=albedo.astype(np.float32),
            tex_freq=np.zeros((n, 2), np.float32),
            tex_phase=np.full(n, np.pi / 2, np.float32),  # sin -> 1: flat shading
        )


def render_frame(scene: SimScene, R: np.ndarray, t: np.ndarray,
                 cam: CameraConfig, max_depth: float = 60.0):
    """Splat-render RGB (H,W,3 uint8) + depth (H,W float32 metres) for a
    world->camera pose. Nearest-splat wins per pixel (z-buffer)."""
    H, W = cam.height, cam.width
    Xc = scene.points @ R.T + t
    vis = Xc[:, 2] > 0.5
    rgb = np.zeros((H, W, 3), np.float32)
    depth = np.full((H, W), max_depth, np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    order = np.argsort(-Xc[:, 2])  # far-to-near so near splats overwrite
    for m in order:
        if not vis[m]:
            continue
        z = Xc[m, 2]
        u = Xc[m, 0] / z * cam.fx + cam.cx
        v = Xc[m, 1] / z * cam.fy + cam.cy
        r_px = scene.radii[m] / z * cam.fx
        if u < -r_px or u > W + r_px or v < -r_px or v > H + r_px or r_px < 0.3:
            continue
        u0, u1 = max(int(u - 3 * r_px), 0), min(int(u + 3 * r_px) + 1, W)
        v0, v1 = max(int(v - 3 * r_px), 0), min(int(v + 3 * r_px) + 1, H)
        if u0 >= u1 or v0 >= v1:
            continue
        du = xx[v0:v1, u0:u1] - u
        dv = yy[v0:v1, u0:u1] - v
        hit = du * du + dv * dv < r_px * r_px
        closer = hit & (z < depth[v0:v1, u0:u1])
        depth[v0:v1, u0:u1][closer] = z
        # per-blob texture in splat-local metric coords (approximately
        # view-stable for modest viewpoint changes)
        fu, fv = scene.tex_freq[m]
        # normalize offsets by the projected radius: the pattern scales with
        # the splat across views instead of swimming with depth
        tex = 0.65 + 0.35 * np.sin(
            (du * fu + dv * fv) * (2.0 * np.pi / r_px) + scene.tex_phase[m]
        )
        rgb[v0:v1, u0:u1][closer] = (
            scene.albedo[m][None, :] * tex[closer][:, None]
        )
    rgb_u8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    # no-return pixels carry 0 (sensor convention; downstream min_depth
    # masks them) — a fake far plane would poison ICP/fusion statistics
    depth = np.where(depth >= max_depth, 0.0, depth).astype(np.float32)
    return rgb_u8, depth


@dataclass
class CaptureSim:
    """Generates capture-layout datasets from a camera trajectory."""

    scene: SimScene
    cam: CameraConfig = field(default_factory=lambda: CameraConfig(
        fx=269.5, fy=269.5, cx=319.5, cy=239.5, width=640, height=480,
    ))  # the AirSim client's intrinsics (`main.cpp:40-43`)

    def fly(self, n_frames: int, step=np.array([0.6, 0.0, 0.4]),
            yaw_rate: float = 0.01):
        """Straight-ish survey path; returns [(R, t) world->cam]."""
        from scipy.spatial.transform import Rotation as ScipyR

        poses = []
        for f in range(n_frames):
            R = ScipyR.from_rotvec([0, yaw_rate * f, 0]).as_matrix().astype(np.float32)
            C = (step * f).astype(np.float32)
            poses.append((R, (-R @ C).astype(np.float32)))
        return poses

    def capture(self, out_dir: str, poses, depth_scale: float = 1.0,
                write_pose_file: bool = True):
        """Write the reference capture layout: `front/N.jpg`, `depth/N.png`
        (16-bit mm; the reference's lossy depth-as-jpg is reproducible with
        depth_jpg=True at accuracy cost) and the pose txt contract."""
        os.makedirs(os.path.join(out_dir, "front"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
        records = []
        for f, (R, t) in enumerate(poses):
            rgb, depth = render_frame(self.scene, R, t, self.cam)
            Image.fromarray(rgb).save(os.path.join(out_dir, "front", f"{f}.jpg"))
            d16 = np.clip(depth * 1000.0 * depth_scale, 0, 65535).astype(np.uint16)
            Image.fromarray(d16.astype(np.int32), mode="I").save(
                os.path.join(out_dir, "depth", f"{f}.png")
            )
            import jax.numpy as jnp

            q_wxyz = np.asarray(matrix_to_quat_wxyz(jnp.asarray(R)))
            q_xyzw = np.asarray(quat_xyzw_from_wxyz(jnp.asarray(q_wxyz)))
            records.append(PoseRecord(f, t.astype(np.float64), q_xyzw, f"{f}.png"))
        if write_pose_file:
            write_pose_txt(os.path.join(out_dir, "poses.txt"), records)
        return records
