"""Mesh cleanup — the MVE `meshclean` analogue.

MVE's meshclean deletes small isolated surface components and degenerate
geometry from the fssrecon output (`ref/software_record/mve使用指南.docx`,
step 6). TSDF meshes have the same failure mode: noisy depth pixels that
survive the consistency filter fuse into small floating shells.

Host-side by design: connected components over a (V, E)-sparse graph is
irregular pointer-chasing — the one workload class that does NOT belong on
the TPU (SURVEY §2.2 C2 made the same call for the octree writer). The
union-find below is numpy-vectorized path-halving, O(E alpha) with ~10
passes over the edge list, so even million-face meshes clean in well under
a second.
"""

from __future__ import annotations

import numpy as np


def _connected_components(n_verts: int, edges: np.ndarray) -> np.ndarray:
    """Vertex component labels via vectorized union-find (path halving)."""
    parent = np.arange(n_verts, dtype=np.int64)
    if edges.size == 0:
        return parent
    a = edges[:, 0].astype(np.int64)
    b = edges[:, 1].astype(np.int64)
    # iterate hook-and-compress until stable: each pass links every edge's
    # current roots; converges in O(log V) passes
    for _ in range(64):
        ra, rb = parent[a], parent[b]
        changed = False
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        if np.any(lo != hi):
            # hook larger root to smaller (np.minimum.at resolves races
            # deterministically toward the minimum)
            np.minimum.at(parent, hi, lo)
            changed = True
        # path compression
        while True:
            gp = parent[parent]
            if np.array_equal(gp, parent):
                break
            parent = gp
        if not changed:
            break
    return parent


def clean_mesh(verts: np.ndarray, faces: np.ndarray,
               min_component_frac: float = 0.02,
               min_component_faces: int = 10):
    """Drop connected components smaller than max(min_component_frac of
    total faces, min_component_faces); drop unreferenced vertices.

    Returns (verts, faces) reindexed."""
    if faces.shape[0] == 0:
        return verts[:0], faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    labels = _connected_components(verts.shape[0], edges)
    face_label = labels[faces[:, 0]]
    uniq, counts = np.unique(face_label, return_counts=True)
    thresh = max(int(min_component_frac * faces.shape[0]),
                 int(min_component_faces))
    keep_labels = set(uniq[counts >= thresh].tolist())
    if not keep_labels:            # everything tiny: keep the largest
        keep_labels = {int(uniq[np.argmax(counts)])}
    keep = np.array([fl in keep_labels for fl in face_label])
    faces = faces[keep]
    used = np.unique(faces.reshape(-1))
    remap = np.full(verts.shape[0], -1, np.int64)
    remap[used] = np.arange(used.size)
    return verts[used], remap[faces].astype(np.int32)
