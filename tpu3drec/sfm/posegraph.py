"""Pose-graph optimization: loop closure over keyframe poses.

The loop-closure capability the reference gets from COLMAP's vocab-tree
loop detection + incremental re-triangulation (workflow in
`ref/software_record/colmap使用.docx` §2.3-2.5). Here closures become
relative-pose edges and the graph is optimized directly: Gauss-Newton on
se(3) with the residual  r_ij = Log(T_ij^-1 T_i^-1 T_j)  per edge.

TPU-first: all edges evaluated in one vmapped pass, the (6F x 6F) normal
system is assembled by scatter-add of 6x6 blocks and solved dense — a
few-hundred-keyframe graph is a trivially small matrix for the MXU, so
unlike BA there is no need for iterative solvers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu3drec.core.se3 import axis_angle_to_matrix, matrix_to_axis_angle


def _se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist (6,) [rot|trans] -> 4x4 (first-order coupling: rotation
    via Rodrigues, translation applied directly — standard GN-on-manifold
    approximation, exact at convergence)."""
    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(axis_angle_to_matrix(xi[:3]))
    T = T.at[:3, 3].set(xi[3:])
    return T


def _se3_log(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([matrix_to_axis_angle(T[:3, :3]), T[:3, 3]])


def _pose_to_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    return _se3_exp(pose)


class PoseGraph(NamedTuple):
    poses: jnp.ndarray     # (F, 6) [axis-angle | t] (world->frame or any
                           # consistent convention)
    edge_i: jnp.ndarray    # (E,) int32 source node
    edge_j: jnp.ndarray    # (E,) int32 target node
    rel: jnp.ndarray       # (E, 6) measured relative pose: T_ij ~ T_i^-1 T_j
    weight: jnp.ndarray    # (E,) edge weights (0 = padding)


def edge_residuals(poses: jnp.ndarray, g: PoseGraph) -> jnp.ndarray:
    """(E, 6) residuals Log(T_ij^-1 T_i^-1 T_j)."""

    def one(i, j, rel):
        Ti = _pose_to_matrix(poses[i])
        Tj = _pose_to_matrix(poses[j])
        Tij = _pose_to_matrix(rel)
        M = jnp.linalg.inv(Tij) @ jnp.linalg.inv(Ti) @ Tj
        return _se3_log(M)

    return jax.vmap(one)(g.edge_i, g.edge_j, g.rel)


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    g: PoseGraph, iters: int = 15, damping: float = 1e-6,
    fix_node_mask: jnp.ndarray | None = None,
):
    """Gauss-Newton pose-graph optimization. Node 0 fixed by default.

    Returns (optimized poses (F,6), per-iteration cost (iters,)).
    """
    F = g.poses.shape[0]
    if fix_node_mask is None:
        fix_node_mask = jnp.concatenate([jnp.zeros(1), jnp.ones(F - 1)])
    free = jnp.repeat(fix_node_mask, 6)  # (6F,)

    def gn_step(poses, _):
        def r_of(flat):
            return (
                edge_residuals(flat.reshape(F, 6), g)
                * jnp.sqrt(jnp.maximum(g.weight, 0.0))[:, None]
            ).reshape(-1)

        flat = poses.reshape(-1)
        r = r_of(flat)
        J = jax.jacfwd(r_of)(flat)  # (6E, 6F) dense — small graphs
        J = J * free[None, :]
        H = J.T @ J + damping * jnp.eye(6 * F, dtype=flat.dtype)
        gvec = J.T @ r
        delta = -jnp.linalg.solve(H, gvec) * free
        cost = jnp.sum(r * r)
        return (flat + delta).reshape(F, 6), cost

    poses, costs = jax.lax.scan(gn_step, g.poses, None, length=iters)
    return poses, costs


def make_sequential_edges(rel_poses: jnp.ndarray) -> PoseGraph:
    """Odometry chain: rel_poses (F-1, 6) measured T_i^-1 T_{i+1}."""
    F = rel_poses.shape[0] + 1
    # integrate for the initial guess
    Ts = [jnp.eye(4)]
    for k in range(rel_poses.shape[0]):
        Ts.append(Ts[-1] @ _pose_to_matrix(rel_poses[k]))
    poses = jnp.stack([_se3_log(T) for T in Ts])
    return PoseGraph(
        poses=poses,
        edge_i=jnp.arange(F - 1, dtype=jnp.int32),
        edge_j=jnp.arange(1, F, dtype=jnp.int32),
        rel=rel_poses,
        weight=jnp.ones(F - 1),
    )


def add_loop_closure(g: PoseGraph, i: int, j: int, rel: jnp.ndarray,
                     weight: float = 1.0) -> PoseGraph:
    """Append one closure edge T_ij between nodes i and j."""
    return PoseGraph(
        poses=g.poses,
        edge_i=jnp.concatenate([g.edge_i, jnp.asarray([i], jnp.int32)]),
        edge_j=jnp.concatenate([g.edge_j, jnp.asarray([j], jnp.int32)]),
        rel=jnp.concatenate([g.rel, rel[None]], axis=0),
        weight=jnp.concatenate([g.weight, jnp.asarray([weight])]),
    )
