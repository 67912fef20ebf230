"""Dense multi-view stereo + surface reconstruction (SURVEY §2.2 C8).

The reference documents MVE (`ref/software_record/mve使用指南.docx`) as its
alternative dense pipeline: ``makescene -> sfmrecon -> dmrecon -> scene2pset
-> fssrecon -> meshclean``. The sparse half (makescene/sfmrecon) is this
repo's `sfm/` package; this package is the dense half, TPU-first:

- `plane_sweep`  — dmrecon analogue: per-view dense depth by plane-sweep
  ZNCC stereo (batched homography warps + box-filter statistics, one jit).
- `tsdf`         — scene2pset analogue: voxel-centric TSDF fusion of the
  per-view depth maps (gathers, not scatters — the TPU formulation).
- `marching`     — fssrecon analogue: marching-tetrahedra isosurface
  extraction (vectorized over active cells).
- `meshclean`    — meshclean analogue: connected-component floater removal
  + degenerate-face cleanup on the indexed mesh.

Pipeline driver: `tpu3drec.pipelines.mvs.run_mvs` / CLI `tpu3drec mvs`.
"""

from tpu3drec.mvs.plane_sweep import (  # noqa: F401
    geometric_consistency,
    plane_sweep_depth,
)
from tpu3drec.mvs.tsdf import TsdfGrid, integrate_depth_maps  # noqa: F401
from tpu3drec.mvs.marching import marching_tetrahedra, weld_mesh  # noqa: F401
from tpu3drec.mvs.meshclean import clean_mesh  # noqa: F401
