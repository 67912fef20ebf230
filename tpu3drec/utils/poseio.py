"""Pose-file IO: the reference's on-disk pose contracts.

Three formats consumed by the reference pipeline:

1. COLMAP-export pose txt — comma-separated rows
   ``id, tx, ty, tz, qx, qy, qz, qw, image.png`` with one header line
   (read at `ref/transfer/camera_to_world.py:149-158`; quaternion is xyzw,
   fed to scipy ``from_quat``). The (R|t) is the COLMAP **world->camera**
   convention.
2. 4x4 homogeneous ``T_data.txt`` produced by an external ICP run
   (read at `ref/other_tools/transfer_T_icp.py:33-43`).
3. InteriorNet ``cam0.ccam`` ground-truth poses — whitespace rows where
   cols[6:10] is a **wxyz** quaternion and cols[10:13] a translation,
   '#' comment lines skipped (`ref/monodepth2/interior_dataset.py:60-78`).

Also COLMAP's own ``images.txt`` (``IMAGE_ID qw qx qy qz tx ty tz CAMERA_ID
NAME`` + points2D line), since the reference workflow exports model txt from
the COLMAP GUI (`ref/software_record/colmap使用.docx` section 2.6).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PoseRecord:
    """One frame's pose: world->camera rotation (as xyzw quat) + translation."""

    frame_id: int
    t: np.ndarray  # (3,) float64
    q_xyzw: np.ndarray  # (4,) float64
    image_name: str


def read_pose_txt(path: str) -> list[PoseRecord]:
    """Parse the comma-separated pose txt contract
    (`ref/transfer/camera_to_world.py:149-158`). Skips the first line."""
    records = []
    with open(path) as f:
        lines = f.readlines()
    for line in lines[1:]:
        line = line.strip()
        if not line:
            continue
        cols = [c.strip() for c in line.split(",")]
        records.append(
            PoseRecord(
                frame_id=int(float(cols[0])),
                t=np.array([float(c) for c in cols[1:4]]),
                q_xyzw=np.array([float(c) for c in cols[4:8]]),
                image_name=cols[8],
            )
        )
    return records


def write_pose_txt(path: str, records: list[PoseRecord], header: str = "id,tx,ty,tz,qx,qy,qz,qw,name") -> None:
    with open(path, "w") as f:
        f.write(header + "\n")
        for r in records:
            vals = [str(r.frame_id)] + [repr(float(v)) for v in r.t] + [
                repr(float(v)) for v in r.q_xyzw
            ] + [r.image_name]
            f.write(",".join(vals) + "\n")


def poses_to_arrays(records: list[PoseRecord]):
    """Stack records into (F,3) t and (F,4) xyzw-quat float32 arrays."""
    t = np.stack([r.t for r in records]).astype(np.float32)
    q = np.stack([r.q_xyzw for r in records]).astype(np.float32)
    return q, t


def read_T_txt(path: str) -> np.ndarray:
    """4x4 homogeneous transform from a whitespace txt
    (`ref/other_tools/transfer_T_icp.py:33-43`)."""
    T = np.loadtxt(path, dtype=np.float64)
    if T.shape != (4, 4):
        raise ValueError(f"expected 4x4 T, got {T.shape} from {path}")
    return T


def write_T_txt(path: str, T: np.ndarray) -> None:
    np.savetxt(path, np.asarray(T).reshape(4, 4), fmt="%.9f")


def read_ccam(path: str) -> list[tuple[np.ndarray, np.ndarray]]:
    """InteriorNet ``cam0.ccam``: per-frame (q_wxyz (4,), t (3,)) in file
    order, '#' lines skipped (`ref/monodepth2/interior_dataset.py:60-78`)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            out.append((np.array(vals[6:10]), np.array(vals[10:13])))
    return out


def read_colmap_images_txt(path: str) -> list[PoseRecord]:
    """COLMAP sparse-model ``images.txt``: header comments, then per image two
    lines — ``IMAGE_ID qw qx qy qz tx ty tz CAMERA_ID NAME`` and the POINTS2D
    line. Returns records with the quaternion converted to xyzw to match
    :class:`PoseRecord`."""
    records = []
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    for img_line in lines[0::2]:
        cols = img_line.split()
        qw, qx, qy, qz = (float(c) for c in cols[1:5])
        records.append(
            PoseRecord(
                frame_id=int(cols[0]),
                t=np.array([float(c) for c in cols[5:8]]),
                q_xyzw=np.array([qx, qy, qz, qw]),
                image_name=cols[9] if len(cols) > 9 else "",
            )
        )
    return records
