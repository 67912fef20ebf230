"""Device mesh + sharding setup.

The reference is entirely single-process/single-device (SURVEY.md section
2.3: batch_size 1, no torch.distributed anywhere), so every parallelism
strategy here is net-new. Axes:

  data   frame/batch parallelism (depth-net batches, frame-parallel fusion)
  space  point-block / map-shard parallelism (ICP halo search, BA blocks)
  model  tensor parallelism (available; off by default — the nets are small)

Collectives ride ICI within a slice via jax's standard psum/all_gather
lowering; nothing here speaks NCCL/MPI (the reference's only IPC was AirSim
msgpack-RPC, `ref/airsim/main.cpp:20` — not mirrored, see SURVEY.md §5.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "space", "model")


def make_mesh(data: int = 0, space: int = 1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, space, model) mesh. ``data=0`` means "all remaining
    devices on the data axis"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == 0:
        if n % (space * model):
            raise ValueError(f"{n} devices not divisible by space*model={space*model}")
        data = n // (space * model)
    use = data * space * model
    if use > n:
        raise ValueError(f"mesh {data}x{space}x{model} needs {use} devices, have {n}")
    arr = np.asarray(devices[:use]).reshape(data, space, model)
    return Mesh(arr, MESH_AXES)


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place an array with its leading dim sharded over ``axis`` (pads are the
    caller's job: leading dim must divide evenly)."""
    spec = P(axis)
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0, fill=0):
    """Pad axis 0 length to a multiple (static-shape sharding requirement).
    Returns (padded, original_length)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return np.pad(x, widths, constant_values=fill), n
