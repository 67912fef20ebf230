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
    rot_weight: float = 1.0,
):
    """Gauss-Newton pose-graph optimization. Node 0 fixed by default.

    ``rot_weight`` scales the rotation rows of every edge residual
    relative to translation. Raising it encodes that relative ROTATIONS
    are measured far more precisely than translations (true of SfM
    odometry) — and, critically, that rotation errors act through lever
    arms: a 6-dof residual with equal weights prices a trajectory fold
    (~pi of rotation spread over a few edges) cheaper than a few metres
    of translation, which lets one bad constraint bend the whole graph
    (measured in tests/test_global_refine.py's false-closure case).

    Returns (optimized poses (F,6), per-iteration cost (iters,)).
    """
    F = g.poses.shape[0]
    if fix_node_mask is None:
        fix_node_mask = jnp.concatenate([jnp.zeros(1), jnp.ones(F - 1)])
    free = jnp.repeat(fix_node_mask, 6)  # (6F,)
    r_scale = jnp.concatenate([
        jnp.full(3, rot_weight, g.poses.dtype),
        jnp.ones(3, g.poses.dtype)])

    def r_of(flat):
        return (
            edge_residuals(flat.reshape(F, 6), g)
            * jnp.sqrt(jnp.maximum(g.weight, 0.0))[:, None]
            * r_scale[None, :]
        ).reshape(-1)

    # Levenberg-Marquardt, not raw GN: a fixed 1e-6 damping diverges on
    # big graphs with large residuals (measured on the 500-frame loop:
    # costs 2e4 -> 7e14 -> NaN in seven raw-GN steps). Adaptive lambda
    # with accept/reject keeps every iteration monotone.
    def lm_step(carry, _):
        flat, lam, cost = carry
        r = r_of(flat)
        J = jax.jacfwd(r_of)(flat) * free[None, :]
        H = J.T @ J
        H = H + lam * jnp.diag(jnp.diagonal(H)) + damping * jnp.eye(
            6 * F, dtype=flat.dtype)
        delta = -jnp.linalg.solve(H, J.T @ r) * free
        cand = flat + delta
        new_cost = jnp.sum(r_of(cand) ** 2)
        accept = new_cost < cost
        flat = jnp.where(accept, cand, flat)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9),
                        jnp.minimum(lam * 10.0, 1e8))
        cost = jnp.where(accept, new_cost, cost)
        return (flat, lam, cost), cost

    cost0 = jnp.sum(r_of(g.poses.reshape(-1)) ** 2)
    (flat, _, _), costs = jax.lax.scan(
        lm_step, (g.poses.reshape(-1), jnp.asarray(1e-4, g.poses.dtype),
                  cost0), None, length=iters)
    return flat.reshape(F, 6), costs


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph_switchable(
    g: PoseGraph,
    switch_mask: jnp.ndarray,      # (E,) bool: edge carries a switch var
    iters: int = 15,
    damping: float = 1e-6,
    switch_prior: float = 10.0,    # lambda: cost of turning a closure OFF
    rot_weight: float = 1.0,       # see optimize_pose_graph — without it a
                                   # false closure folds the graph through
                                   # CHEAP rotation residuals and its
                                   # switch never collapses
    fix_node_mask: jnp.ndarray | None = None,  # (F,) 1 = free, 0 = frozen
                                   # (default: node 0 frozen). Callers
                                   # freeze nodes the edge set cannot
                                   # reach — a free node with no live
                                   # edges floats off to ~1/damping
):
    """Gauss-Newton with switchable constraints (Sünderhauf & Protzel,
    "Switchable Constraints for Robust Pose Graph SLAM", IROS 2012): each
    switched edge's residual is scaled by a variable s in [0,1] optimized
    JOINTLY with the poses, plus a prior residual sqrt(lambda)(1 - s).

    Why not residual gating or IRLS: a loop closure's residual at the
    initial (drifted) estimate IS the drift it removes — gating kills the
    cure, and one-shot IRLS converges to whatever basin the first solve
    lands in (a false closure that got satisfied then shows a SMALL
    residual and survives reweighting; measured in
    tests/test_global_refine.py). With switches the optimizer itself
    prices every closure: satisfying a TRUE closure redistributes the
    drift over the whole odometry chain (cheap, quadratic in drift/N), so
    its switch stays at 1; a FALSE closure can only be satisfied by
    deforming a short subchain (cost >> lambda), so its switch collapses
    to 0 and the edge pays the bounded prior instead.

    Returns (poses (F,6), switches (E,) — 1.0 for unswitched edges,
    per-iteration cost (iters,)).
    """
    F = g.poses.shape[0]
    E = g.edge_i.shape[0]
    if fix_node_mask is None:
        fix_node_mask = jnp.concatenate([jnp.zeros(1), jnp.ones(F - 1)])
    free = jnp.repeat(fix_node_mask.astype(g.poses.dtype), 6)
    sw = switch_mask.astype(g.poses.dtype)
    sqrt_lam = jnp.sqrt(jnp.asarray(switch_prior, g.poses.dtype))
    n_vars = 6 * F + E
    free_all = jnp.concatenate([free, jnp.ones(E)])  # switches always free
    r_scale = jnp.concatenate([
        jnp.full(3, rot_weight, g.poses.dtype),
        jnp.ones(3, g.poses.dtype)])

    def r_of(flat):
        poses = flat[: 6 * F].reshape(F, 6)
        s = flat[6 * F:]
        scale = jnp.where(switch_mask, jnp.clip(s, 0.0, 1.0), 1.0)
        r_edges = (
            edge_residuals(poses, g)
            * jnp.sqrt(jnp.maximum(g.weight, 0.0))[:, None]
            * scale[:, None]
            * r_scale[None, :]
        ).reshape(-1)
        r_prior = sqrt_lam * sw * (1.0 - s)
        return jnp.concatenate([r_edges, r_prior])

    # Levenberg-Marquardt (see optimize_pose_graph: raw GN diverges on
    # big graphs with large residuals)
    def lm_step(carry, _):
        flat, lam, cost = carry
        r = r_of(flat)
        J = jax.jacfwd(r_of)(flat) * free_all[None, :]
        H = J.T @ J
        H = H + lam * jnp.diag(jnp.diagonal(H)) + damping * jnp.eye(
            n_vars, dtype=flat.dtype)
        delta = -jnp.linalg.solve(H, J.T @ r) * free_all
        cand = flat + delta
        # keep switches in [0,1] (the residual clips too, but clamping the
        # state keeps the linearization honest)
        cand = cand.at[6 * F:].set(jnp.clip(cand[6 * F:], 0.0, 1.0))
        new_cost = jnp.sum(r_of(cand) ** 2)
        accept = new_cost < cost
        flat = jnp.where(accept, cand, flat)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-9),
                        jnp.minimum(lam * 10.0, 1e8))
        cost = jnp.where(accept, new_cost, cost)
        return (flat, lam, cost), cost

    flat0 = jnp.concatenate([g.poses.reshape(-1), jnp.ones(E, g.poses.dtype)])
    cost0 = jnp.sum(r_of(flat0) ** 2)
    (flat, _, _), costs = jax.lax.scan(
        lm_step, (flat0, jnp.asarray(1e-4, g.poses.dtype), cost0),
        None, length=iters)
    poses = flat[: 6 * F].reshape(F, 6)
    switches = jnp.where(switch_mask, jnp.clip(flat[6 * F:], 0.0, 1.0), 1.0)
    return poses, switches, costs


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
