"""Geometry + math foundation: pure JAX, fully vmappable/jittable."""

from tpu3drec.core.quaternion import (
    quat_wxyz_to_matrix,
    quat_xyzw_to_matrix,
    matrix_to_quat_wxyz,
    quat_multiply,
    quat_conjugate,
    quat_normalize,
    quat_wxyz_from_xyzw,
    quat_xyzw_from_wxyz,
)
from tpu3drec.core.se3 import (
    SE3,
    se3_from_rt,
    se3_inverse,
    se3_compose,
    se3_apply,
    se3_matrix,
    axis_angle_to_matrix,
    matrix_to_axis_angle,
)
from tpu3drec.core.camera import PinholeCamera
from tpu3drec.core.unproject import (
    depth_to_camera_points,
    camera_to_world_points,
    depth_to_world_points,
    fuse_depth_maps,
)
