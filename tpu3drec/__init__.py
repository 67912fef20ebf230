"""tpu3drec — a TPU-native 3D reconstruction & mapping engine.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``rainfall1998/3D_reconstruction_system`` (see SURVEY.md): neural depth
(Monodepth2-class monocular, PSMNet-class stereo), COLMAP-style incremental
SfM with ICP metric-scale correction, fused pixel->camera->world
unprojection, and point-cloud / octree map export — built as one coherent
engine instead of filesystem-glued scripts.

Subpackage map (SURVEY.md section 7):
  core      geometry + math foundation (SO3/SE3, pinhole cameras, unprojection)
  utils     config tree, IO (PLY, poses, depth decoding), logging, profiling
  mapping   voxel/Morton dedup, octree builder, .bt writer, point buffers
  models    neural depth nets (monodepth-class, PSMNet-class) in flax
  ops       Pallas TPU kernels (matcher, ICP-NN, BA blocks, features)
  sfm       incremental SfM: two-view init, PnP, triangulation, BA, pose graph
  parallel  mesh/sharding setup, ring collectives, distributed runtime
  pipelines the five reference configurations as runnable pipelines
  data      dataset readers (KITTI, InteriorNet, AirSim capture format)
"""

__version__ = "0.1.0"
