"""Mapping: sharded point buffers, voxel dedup, octree export (.bt), PLY."""

from tpu3drec.mapping.voxel import (
    voxelize,
    unique_voxels,
    voxel_centers,
    dedup_voxels_host,
)
from tpu3drec.mapping.btio import write_bt, read_bt, OCTOMAP_TREE_DEPTH
