"""Marching-tetrahedra isosurface extraction — the fssrecon analogue.

MVE's fssrecon fits an implicit surface to the fused point set and
extracts a mesh; here the implicit surface already exists (the TSDF zero
crossing from `mvs/tsdf.py`), so extraction is the whole job. Marching
TETRAHEDRA instead of marching cubes: each cell splits into 6 tets
sharing the main diagonal, and a tet has only 16 sign configurations
whose triangulations follow from first principles (0/4 inside -> nothing,
1/3 inside -> one triangle, 2 inside -> a quad = two triangles) — the
case table is CONSTRUCTED programmatically below rather than transcribed,
so it is verifiable by reading ~20 lines. MT produces ~2x the triangles
of MC for the same grid; `weld_mesh` + `meshclean.clean_mesh` tidy up.

TPU shape discipline: sign-change detection is one fused elementwise pass
over the grid; the (data-dependent) active-cell set is compacted ONCE on
the host; triangle emission then runs as a single fixed-shape jit over the
padded active cells (gathers + elementwise interpolation, no scatter).
Surface cells are O(N^2) of an N^3 grid, so the compacted workload is a
tiny fraction of the volume.

Triangle orientation: each triangle is flipped, if needed, to point its
normal along the local TSDF gradient (outward, since TSDF is positive in
free space) — orientation consistency without a signed case table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# cube corners in (dx, dy, dz) offsets, the conventional MC ordering
_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int32)

# 6-tet decomposition of the cube around the main diagonal c0-c6
_TETS = np.array(
    [[0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
     [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6]], np.int32)

# the 6 edges of a tetrahedron as (vertex, vertex) index pairs
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)


def _build_case_table() -> np.ndarray:
    """(16, 2, 3) edge-index triangles per sign case, -1-padded.

    Case bit i set <=> tet vertex i is inside (value < iso). Derivation:
    - 0 or 4 inside: no surface crossing, no triangles.
    - 1 inside (vertex a): the 3 edges from a to the outside vertices
      cross the surface -> one triangle.
    - 3 inside (outside vertex d): the 3 edges from d cross -> one
      triangle.
    - 2 inside {a,b} / outside {c,d}: the 4 crossing edges (a,c),(a,d),
      (b,d),(b,c) bound a quad (in that cyclic order: consecutive quad
      corners share a tet vertex, so the quad is planar-convex in the
      interpolation sense) -> two triangles.
    """
    edge_id = {tuple(sorted(e)): i for i, e in enumerate(_TET_EDGES)}
    table = np.full((16, 2, 3), -1, np.int32)
    for case in range(16):
        inside = [v for v in range(4) if case & (1 << v)]
        outside = [v for v in range(4) if not case & (1 << v)]
        if len(inside) in (0, 4):
            continue
        if len(inside) == 1:
            a = inside[0]
            table[case, 0] = [edge_id[tuple(sorted((a, o)))]
                              for o in outside]
        elif len(inside) == 3:
            d = outside[0]
            table[case, 0] = [edge_id[tuple(sorted((d, i)))]
                              for i in inside]
        else:
            a, b = inside
            c, d = outside
            q = [edge_id[tuple(sorted((a, c)))],
                 edge_id[tuple(sorted((a, d)))],
                 edge_id[tuple(sorted((b, d)))],
                 edge_id[tuple(sorted((b, c)))]]
            table[case, 0] = [q[0], q[1], q[2]]
            table[case, 1] = [q[0], q[2], q[3]]
    return table


_CASE_TABLE = _build_case_table()


@partial(jax.jit, static_argnames=())
def _emit_triangles(cells_xyz, tsdf, origin, res, iso,
                    cell_offset=jnp.zeros(3, jnp.int32)):
    """cells_xyz: (A, 3) int32 active-cell coords. Returns
    (verts (A, 6, 2, 3, 3), valid (A, 6, 2)). ``cell_offset`` shifts the
    POSITION of every cell by whole voxels (the sharded path passes its
    slab's global x offset so vertex arithmetic is bit-identical to the
    full-grid path: (offset + corner) * res, never offset*res + corner*res)."""
    X, Y, Z = tsdf.shape
    flat = tsdf.reshape(-1)

    corners = cells_xyz[:, None, :] + _CORNERS[None]          # (A, 8, 3)
    cidx = (corners[..., 0] * Y + corners[..., 1]) * Z + corners[..., 2]
    vals = flat[cidx.reshape(-1)].reshape(corners.shape[:2])  # (A, 8)
    pos = origin[None, None] + (
        corners + cell_offset[None, None]).astype(jnp.float32) * res

    tet_vals = vals[:, _TETS]                                 # (A, 6, 4)
    tet_pos = pos[:, _TETS]                                   # (A, 6, 4, 3)
    bits = (tet_vals < iso).astype(jnp.int32)
    case = (bits * jnp.array([1, 2, 4, 8], jnp.int32)).sum(-1)  # (A, 6)

    tris = jnp.asarray(_CASE_TABLE)[case]                     # (A, 6, 2, 3)
    valid = tris[..., 0] >= 0                                 # (A, 6, 2)
    e = jnp.clip(tris, 0, 5)                                  # safe lookup
    ev = jnp.asarray(_TET_EDGES)[e]                           # (A,6,2,3,2)

    def corner(v):
        """v: (A, 6, 2, 3) tet-vertex ids in [0,4) -> (values, positions)."""
        tv = jnp.broadcast_to(tet_vals[:, :, None, None, :], v.shape + (4,))
        val = jnp.take_along_axis(tv, v[..., None], axis=-1)[..., 0]
        tp = jnp.broadcast_to(tet_pos[:, :, None, None, :, :],
                              v.shape + (4, 3))
        idx = jnp.broadcast_to(v[..., None, None], v.shape + (1, 3))
        p = jnp.take_along_axis(tp, idx, axis=-2)[..., 0, :]
        return val, p

    vA, pA = corner(ev[..., 0])
    vB, pB = corner(ev[..., 1])
    tdenom = vB - vA
    tt = (iso - vA) / jnp.where(jnp.abs(tdenom) < 1e-12, 1e-12, tdenom)
    tt = jnp.clip(tt, 0.0, 1.0)
    verts = pA + tt[..., None] * (pB - pA)                    # (A,6,2,3,3)

    # orient along the TSDF gradient (outward): flip when the face normal
    # disagrees with inside->outside direction (mean outside corner minus
    # mean inside corner of the tet)
    w_in = bits.astype(jnp.float32)
    w_out = 1.0 - w_in
    c_in = (tet_pos * w_in[..., None]).sum(2) / jnp.maximum(
        w_in.sum(-1), 1.0)[..., None]
    c_out = (tet_pos * w_out[..., None]).sum(2) / jnp.maximum(
        w_out.sum(-1), 1.0)[..., None]
    g = c_out - c_in                                          # (A, 6, 3)
    n = jnp.cross(verts[..., 1, :] - verts[..., 0, :],
                  verts[..., 2, :] - verts[..., 0, :])        # (A, 6, 2, 3)
    flip = (n * g[:, :, None, :]).sum(-1) < 0                 # (A, 6, 2)
    swapped = verts[..., jnp.array([0, 2, 1]), :]
    verts = jnp.where(flip[..., None, None], swapped, verts)
    return verts, valid


def marching_tetrahedra(tsdf, weight=None, origin=(0.0, 0.0, 0.0),
                        res: float = 1.0, iso: float = 0.0,
                        pad_to: int = 1024):
    """Extract the iso-surface triangle soup from a (X, Y, Z) TSDF.

    weight (optional): cells touching any weight-0 (unobserved) corner are
    skipped. Returns (T, 3, 3) float32 triangle vertices (world coords).
    """
    tsdf_np = np.asarray(tsdf)
    X, Y, Z = tsdf_np.shape
    inside = tsdf_np < iso
    # cell has a crossing iff its 8 corners are not all one sign
    def cellmax(a):
        return np.maximum.reduce([
            a[:-1, :-1, :-1], a[1:, :-1, :-1], a[1:, 1:, :-1],
            a[:-1, 1:, :-1], a[:-1, :-1, 1:], a[1:, :-1, 1:],
            a[1:, 1:, 1:], a[:-1, 1:, 1:]])

    def cellmin(a):
        return np.minimum.reduce([
            a[:-1, :-1, :-1], a[1:, :-1, :-1], a[1:, 1:, :-1],
            a[:-1, 1:, :-1], a[:-1, :-1, 1:], a[1:, :-1, 1:],
            a[1:, 1:, 1:], a[:-1, 1:, 1:]])

    active = cellmax(inside) & ~cellmin(inside)
    if weight is not None:
        w = np.asarray(weight) > 0
        active &= cellmin(w)                 # all 8 corners observed
    ax, ay, az = np.nonzero(active)
    if ax.size == 0:
        return np.zeros((0, 3, 3), np.float32)
    cells = np.stack([ax, ay, az], axis=1).astype(np.int32)

    # pad to a bucketed size so recompiles are bounded (one executable per
    # power-of-two-ish bucket, same discipline as the BA pad buckets)
    A = cells.shape[0]
    padded = pad_to
    while padded < A:
        padded *= 2
    cells_p = np.concatenate(
        [cells, np.zeros((padded - A, 3), np.int32)])

    verts, valid = _emit_triangles(
        jnp.asarray(cells_p), jnp.asarray(tsdf_np, jnp.float32),
        jnp.asarray(origin, jnp.float32), jnp.float32(res),
        jnp.float32(iso))
    verts = np.asarray(verts)
    valid = np.asarray(valid).copy()
    valid[A:] = False
    return verts[valid].astype(np.float32)


def marching_tetrahedra_sharded(
    tsdf, weight, origin, res: float, mesh, axis: str = "data",
    iso: float = 0.0, cells_per_shard: int = 4096,
):
    """Per-slab marching tetrahedra over an x-sharded TSDF grid — the
    sharded surface extraction the TSDF docstring promises (tsdf.py:
    "marching cubes later needs a one-plane halo, nothing else").

    Each device owns a contiguous x-slab of the grid (the same layout
    `integrate_depth_maps` shards over the mesh). Cells straddle voxel
    planes, so a slab's last cell layer needs the FIRST tsdf/weight plane
    of the next device: exactly one (Y, Z) plane, exchanged with a single
    `ppermute` around the ring — the whole surface extraction then runs
    with zero further communication. Active cells are compacted
    device-side to a fixed ``cells_per_shard`` capacity
    (jnp.nonzero(size=...) — static shapes, no host round-trip), and
    triangle emission reuses the exact `_emit_triangles` kernel of the
    host path, so the two paths agree triangle-for-triangle
    (tests/test_mvs.py::TestShardedMarching).

    Returns (verts (n_shards*cap, 6, 2, 3, 3), valid (...), n_active
    (n_shards,)) as host arrays; callers check n_active <= cap and re-run
    with a doubled cap on overflow (bucketed recompiles, same discipline
    as the BA pads).
    """
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    if isinstance(axis, (tuple, list)):
        n = int(np.prod([mesh.shape[a] for a in axis]))
        axis = tuple(axis)
    else:
        n = mesh.shape[axis]
    tsdf_np = np.asarray(tsdf)
    X, Y, Z = tsdf_np.shape
    w_np = (np.asarray(weight) if weight is not None
            else np.ones_like(tsdf_np))
    # pad X to a multiple of the shard count; padded planes are unobserved
    # (weight 0) so no padded cell can activate
    Xp = -(-X // n) * n
    if Xp != X:
        tsdf_np = np.concatenate(
            [tsdf_np, np.ones((Xp - X, Y, Z), tsdf_np.dtype)])
        w_np = np.concatenate([w_np, np.zeros((Xp - X, Y, Z), w_np.dtype)])
    Xl = Xp // n
    origin = np.asarray(origin, np.float32)

    def slab(t_l, w_l):
        idx = jax.lax.axis_index(axis)
        perm = [(i, (i - 1) % n) for i in range(n)]
        halo_t = jax.lax.ppermute(t_l[0], axis, perm)   # next shard's plane
        halo_w = jax.lax.ppermute(w_l[0], axis, perm)
        t_ext = jnp.concatenate([t_l, halo_t[None]], axis=0)  # (Xl+1, Y, Z)
        w_ext = jnp.concatenate([w_l, halo_w[None]], axis=0)

        inside = t_ext < iso

        def cmax(a):
            return jnp.maximum(
                jnp.maximum(jnp.maximum(a[:-1, :-1, :-1], a[1:, :-1, :-1]),
                            jnp.maximum(a[1:, 1:, :-1], a[:-1, 1:, :-1])),
                jnp.maximum(jnp.maximum(a[:-1, :-1, 1:], a[1:, :-1, 1:]),
                            jnp.maximum(a[1:, 1:, 1:], a[:-1, 1:, 1:])))

        def cmin(a):
            return jnp.minimum(
                jnp.minimum(jnp.minimum(a[:-1, :-1, :-1], a[1:, :-1, :-1]),
                            jnp.minimum(a[1:, 1:, :-1], a[:-1, 1:, :-1])),
                jnp.minimum(jnp.minimum(a[:-1, :-1, 1:], a[1:, :-1, 1:]),
                            jnp.minimum(a[1:, 1:, 1:], a[:-1, 1:, 1:])))

        active = cmax(inside) & ~cmin(inside) & cmin(w_ext > 0)
        # the wrap-around halo (last shard receives shard 0's plane) and
        # the X-pad must not emit: global cell x must be < X-1
        gx = idx * Xl + jnp.arange(Xl)
        active &= (gx < X - 1)[:, None, None]
        n_active = active.sum().astype(jnp.int32)
        (flat_idx,) = jnp.nonzero(active.reshape(-1),
                                  size=cells_per_shard, fill_value=-1)
        ok = flat_idx >= 0
        safe = jnp.maximum(flat_idx, 0)
        cy = (Y - 1) * (Z - 1)
        cells = jnp.stack(
            [safe // cy, (safe % cy) // (Z - 1), safe % (Z - 1)],
            axis=1).astype(jnp.int32)
        offset = jnp.array([1, 0, 0], jnp.int32) * (idx * Xl).astype(
            jnp.int32)
        verts, valid = _emit_triangles(
            cells, t_ext, jnp.asarray(origin), jnp.float32(res),
            jnp.float32(iso), cell_offset=offset)
        valid = valid & ok[:, None, None]
        return verts, valid, n_active[None]

    t_d = jax.device_put(jnp.asarray(tsdf_np, jnp.float32),
                         NamedSharding(mesh, P(axis)))
    w_d = jax.device_put(jnp.asarray(w_np, jnp.float32),
                         NamedSharding(mesh, P(axis)))
    verts, valid, n_active = shard_map(
        slab, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)))(t_d, w_d)
    return (np.asarray(verts), np.asarray(valid),
            np.asarray(n_active))


def marching_tetrahedra_sharded_soup(
    tsdf, weight, origin, res: float, mesh, axis: str = "data",
    iso: float = 0.0, cells_per_shard: int = 4096,
):
    """Convenience wrapper: sharded extraction -> (T, 3, 3) triangle soup
    (host), automatically doubling the per-shard capacity on overflow."""
    cap = cells_per_shard
    while True:
        verts, valid, n_active = marching_tetrahedra_sharded(
            tsdf, weight, origin, res, mesh, axis=axis, iso=iso,
            cells_per_shard=cap)
        if int(n_active.max()) <= cap:
            return verts[valid].astype(np.float32)
        cap *= 2


def weld_mesh(tri_soup: np.ndarray, tol: float = 1e-5):
    """(T, 3, 3) triangle soup -> indexed mesh (verts (V, 3), faces
    (T', 3) int32). Vertices are welded by quantizing to `tol`; faces with
    repeated vertices (degenerate after welding) are dropped."""
    if tri_soup.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    flat = tri_soup.reshape(-1, 3)
    q = np.round(flat / tol).astype(np.int64)
    uniq, inv = np.unique(q, axis=0, return_inverse=True)
    # representative positions: mean of welded originals (first is fine)
    verts = np.zeros((uniq.shape[0], 3), np.float64)
    counts = np.bincount(inv, minlength=uniq.shape[0]).astype(np.float64)
    for k in range(3):
        verts[:, k] = np.bincount(inv, weights=flat[:, k],
                                  minlength=uniq.shape[0]) / counts
    faces = inv.reshape(-1, 3).astype(np.int32)
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    return verts.astype(np.float32), faces[ok]
