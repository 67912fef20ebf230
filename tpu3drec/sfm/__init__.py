"""Incremental SfM: the TPU-native replacement for the reference's external
COLMAP + open3d dependency pair (SURVEY.md C3/C6).

features    DoG/Harris detection + descriptors (batched, static top-K)
matching    tiled descriptor matching (MXU distance tiles, mutual-NN + ratio)
twoview     essential-matrix estimation + relative-pose recovery
triangulate batched DLT triangulation
pnp         PnP registration with device-batched RANSAC
ba          bundle adjustment (Gauss-Newton, Schur complement, distributed)
posegraph   pose-graph optimization for loop closure
icp         batched point-to-point/point-to-plane ICP with Umeyama solve
incremental host-driven incremental reconstruction over the above
"""
