"""Multi-host (multi-process) runtime: initialization, barriers, and
per-host sharded artifact writers.

SURVEY.md §5.8 names the three pieces a multi-HOST deployment needs beyond
in-graph collectives (which ride ICI automatically once arrays are sharded):

* `jax.distributed.initialize()` — one controller process per host, global
  device view. On a TPU pod slice the coordinator/process-id/process-count
  are discovered from the TPU environment (call with no args); anywhere
  else (CPU/GPU clusters, tests) they are passed explicitly.
* `multihost_utils.sync_global_devices(tag)` barriers around filesystem
  rendezvous points.
* Per-host sharded writers: every process writes ONLY its shard of an
  artifact (PLY point clouds, .bt octrees), then host 0 merges the parts
  into the single deliverable after a barrier. Artifacts land on a shared
  filesystem (pods mount one; the 2-process CPU test uses tmp).

The reference is strictly single-process (SURVEY §2.3: batch_size 1, no
torch.distributed anywhere) — this module is net-new capability.
"""

from __future__ import annotations

import glob
import os

import numpy as np

_INITIALIZED = False


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Initialize the multi-process runtime. No-op (returns False) when
    called twice or when running single-process with no coordinator.

    On TPU pods call with no arguments — jax discovers the topology. For
    CPU/GPU clusters and tests pass coordinator ("host:port"),
    num_processes, and process_id explicitly.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return False
    if coordinator is None and num_processes is None:
        # bare TPU-pod path: only meaningful when the TPU env is present;
        # single-process runs (the common case in this repo) skip silently
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
                "MEGASCALE_COORDINATOR_ADDRESS"):
            import jax

            try:
                jax.distributed.initialize()
            except RuntimeError:
                # backend already live (single-process run in a pod-shaped
                # env — e.g. this container's tunneled chip): stay local
                return False
            _INITIALIZED = True
            return True
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return True


def is_distributed() -> bool:
    import jax

    return jax.process_count() > 1


def barrier(tag: str) -> None:
    """Block until every process reaches the same tag (ordering for
    filesystem rendezvous: all shards written before the merge reads)."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def process_slice(n: int) -> slice:
    """This process's contiguous shard of n work items (balanced: first
    n % p processes take one extra)."""
    import jax

    p, i = jax.process_count(), jax.process_index()
    base, extra = divmod(n, p)
    start = i * base + min(i, extra)
    return slice(start, start + base + (1 if i < extra else 0))


def _part_path(path: str, pid: int, nproc: int) -> str:
    root, ext = os.path.splitext(path)
    return f"{root}.part{pid:04d}-of-{nproc:04d}{ext}"


def write_ply_sharded(
    path: str,
    points: np.ndarray,
    colors: np.ndarray | None = None,
    binary: bool = False,
    merge: bool = True,
) -> str:
    """Each process writes its OWN points as a part file; after a barrier,
    process 0 merges the parts into the single `path` deliverable (and
    removes the parts). With merge=False the parts are the artifact set
    (huge clouds: no single-host concatenation) and process 0 writes a
    `path.manifest` listing them.

    Returns the final artifact path (the manifest path when merge=False).
    """
    import jax

    from tpu3drec.utils.plyio import read_ply, write_ply

    pid, nproc = jax.process_index(), jax.process_count()
    if nproc <= 1:
        write_ply(path, points, colors=colors, binary=binary)
        return path

    part = _part_path(path, pid, nproc)
    write_ply(part, points, colors=colors, binary=binary)
    barrier("ply_parts:" + path)

    if not merge:
        manifest = path + ".manifest"
        if pid == 0:
            parts = sorted(
                glob.glob(_part_path(path, 0, nproc).replace(
                    "part0000", "part*")))
            with open(manifest, "w") as f:
                f.write("\n".join(os.path.basename(p) for p in parts) + "\n")
        barrier("ply_manifest:" + path)
        return manifest

    if pid == 0:
        pts, cols = [], []
        parts = [
            _part_path(path, i, nproc) for i in range(nproc)
        ]
        has_color = colors is not None
        for pp in parts:
            p_i, c_i = read_ply(pp)
            pts.append(np.asarray(p_i))
            if has_color:
                cols.append(np.asarray(c_i))
        write_ply(
            path,
            np.concatenate(pts) if pts else np.zeros((0, 3), np.float32),
            colors=np.concatenate(cols) if has_color else None,
            binary=binary,
        )
        for pp in parts:
            os.remove(pp)
    barrier("ply_merged:" + path)
    return path


def write_bt_sharded(
    path: str,
    voxel_keys: np.ndarray,
    res: float,
    free_keys: np.ndarray | None = None,
) -> int:
    """Octree artifact from per-host voxel shards: each process dumps its
    (M, 3) int keys as an .npy part; process 0 unions them (octrees merge
    by voxel-set union — occupied wins over free, like log-odds fusion
    saturated at the clamp) and writes the single .bt.

    Returns the node count on process 0, -1 elsewhere.
    """
    import jax

    from tpu3drec.mapping.btio import write_bt

    pid, nproc = jax.process_index(), jax.process_count()
    if nproc <= 1:
        return write_bt(path, voxel_keys, res, free_keys=free_keys)

    part = _part_path(path, pid, nproc) + ".npy"
    np.save(part, np.asarray(voxel_keys, np.int32))
    if free_keys is not None:
        np.save(part + ".free.npy", np.asarray(free_keys, np.int32))
    barrier("bt_parts:" + path)

    n_nodes = -1
    if pid == 0:
        occ, free = [], []
        for i in range(nproc):
            pp = _part_path(path, i, nproc) + ".npy"
            occ.append(np.load(pp))
            fp = pp + ".free.npy"
            if os.path.exists(fp):
                free.append(np.load(fp))
        occ_all = np.unique(np.concatenate(occ), axis=0) if occ else \
            np.zeros((0, 3), np.int32)
        fk = None
        if free:
            fk = np.unique(np.concatenate(free), axis=0)
            # occupied wins: drop free voxels any host observed occupied
            occ_set = {tuple(k) for k in occ_all}
            fk = np.asarray(
                [k for k in fk if tuple(k) not in occ_set], np.int32
            ).reshape(-1, 3)
            if not fk.size:
                fk = None
        n_nodes = write_bt(path, occ_all, res, free_keys=fk)
        for i in range(nproc):
            pp = _part_path(path, i, nproc) + ".npy"
            os.remove(pp)
            if os.path.exists(pp + ".free.npy"):
                os.remove(pp + ".free.npy")
    barrier("bt_merged:" + path)
    return n_nodes
