"""octomap ``.bt`` binary octree writer/reader (octovis-compatible).

Capability-parity with the reference's octomap converters
(`ref/octomap/txt_transfer_octomap.py:16-36`,
`ref/octomap/ply_transfer_octomap.py:16-48`): those stream millions of points
one-by-one through C++ ``OcTree.updateNode`` then ``writeBinary``. Since
every insert is ``occupied=True`` (no ray-casting), the resulting tree is
exactly "the set of touched voxels, pruned" — so we build it directly from
deduplicated voxel keys (see `mapping/voxel.py`) with vectorized
morton-sorted partitioning instead of per-point tree insertion.

File format (octomap AbstractOcTree::writeBinary):
  header:  ``# Octomap OcTree binary file`` first line, then ``id OcTree``,
           ``size <node count>``, ``res <meters>``, ``data``.
  payload: preorder node stream; each node is 2 bytes = 8 children x 2 bits
           (child i of 0-3 -> bits (2i, 2i+1) of byte 0, children 4-7 in
           byte 1): 00 none, 01 occupied leaf, 10 free leaf, 11 inner
           (recursed). Keys are ``floor(coord/res) + 2^15`` (depth-16 tree).
"""

from __future__ import annotations

import os

import numpy as np

OCTOMAP_TREE_DEPTH = 16
_KEY_OFFSET = 1 << 15
_HEADER_FIRST_LINE = "# Octomap OcTree binary file"


def _part1by2(v: np.ndarray) -> np.ndarray:
    """Spread each of the low 21 bits of v to every 3rd bit (uint64)."""
    v = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def morton_encode(keys_u16: np.ndarray) -> np.ndarray:
    """(N, 3) unsigned 16-bit keys -> uint64 morton codes, x least significant
    (matches octomap computeChildIdx: pos = x_bit + 2*y_bit + 4*z_bit)."""
    return (
        _part1by2(keys_u16[:, 0])
        | (_part1by2(keys_u16[:, 1]) << np.uint64(1))
        | (_part1by2(keys_u16[:, 2]) << np.uint64(2))
    )


def morton_decode(m: np.ndarray) -> np.ndarray:
    """uint64 morton codes -> (N, 3) uint32 keys."""
    out = np.zeros((m.shape[0], 3), dtype=np.uint32)
    mm = m.astype(np.uint64)
    for axis in range(3):
        v = (mm >> np.uint64(axis)) & np.uint64(0x1249249249249249)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v >> np.uint64(32))) & np.uint64(0x1FFFFF)
        out[:, axis] = v.astype(np.uint32)
    return out


def _build_nodes(morton_sorted: np.ndarray):
    """Preorder node byte stream + node count from sorted unique mortons.

    A child subtree containing its full 8^b voxel complement is pruned to a
    single occupied leaf (octomap prune() semantics for an all-occupied
    tree).
    """
    out = bytearray()
    n_nodes = 1  # root
    if morton_sorted.size == 0:
        return bytes(out), 0
    m = morton_sorted
    # Stack of (lo, hi, child_bit_level); emit bytes at pop => preorder.
    stack = [(0, len(m), OCTOMAP_TREE_DEPTH - 1)]
    while stack:
        lo, hi, b = stack.pop()
        node_size = np.uint64(1) << np.uint64(3 * (b + 1))
        child_size = np.uint64(1) << np.uint64(3 * b)
        start = m[lo] & ~(node_size - np.uint64(1))
        bounds = np.searchsorted(
            m[lo:hi], start + child_size * np.arange(9, dtype=np.uint64)
        ) + lo
        byte0 = 0
        byte1 = 0
        inner_children = []
        for i in range(8):
            clo, chi = int(bounds[i]), int(bounds[i + 1])
            cnt = chi - clo
            if cnt == 0:
                continue
            n_nodes += 1
            is_leaf = cnt == int(child_size)  # full subtree (or b==0 voxel)
            bits = 0b01 if is_leaf else 0b11
            if i < 4:
                byte0 |= bits << (2 * i)
            else:
                byte1 |= bits << (2 * (i - 4))
            if not is_leaf:
                inner_children.append((clo, chi, b - 1))
        out.append(byte0)
        out.append(byte1)
        # Push reversed so children pop (and emit) in 0..7 order.
        for child in reversed(inner_children):
            stack.append(child)
    return bytes(out), n_nodes


def write_bt(path: str, voxel_keys: np.ndarray, res: float,
             backend: str = "auto") -> int:
    """Write occupied voxel keys ((M, 3) int, signed floor(p/res) convention)
    as an octovis-compatible ``.bt``. Returns node count.

    ``backend``: "auto" uses the native C++ builder when built
    (`native/tpu3drec_native.cpp`, byte-identical output), "python" forces
    this module's implementation.
    """
    d0 = os.path.dirname(os.path.abspath(path))
    os.makedirs(d0, exist_ok=True)
    if backend == "auto":
        from tpu3drec.utils import native

        n = native.bt_write_keys(path, np.asarray(voxel_keys, np.int32), res)
        if n is not None:
            return n
    keys = np.asarray(voxel_keys, dtype=np.int64) + _KEY_OFFSET
    if keys.size and (keys.min() < 0 or keys.max() >= (1 << 16)):
        raise ValueError("voxel keys exceed octomap depth-16 key range")
    m = np.unique(morton_encode(keys.astype(np.uint64)))
    payload, n_nodes = _build_nodes(m)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(
            (
                f"{_HEADER_FIRST_LINE}\n"
                "# (feel free to add / change comments, but leave the first line as it is!)\n"
                "#\n"
                "id OcTree\n"
                f"size {n_nodes}\n"
                f"res {res}\n"
                "data\n"
            ).encode("ascii")
        )
        f.write(payload)
    return n_nodes


def read_bt(path: str):
    """Read a ``.bt`` (this module's or octomap's). Returns
    (occupied voxel keys (M, 3) int32 signed convention, res). Pruned
    occupied leaves are expanded to their constituent depth-16 voxels."""
    with open(path, "rb") as f:
        first = f.readline().decode("ascii").strip()
        if first != _HEADER_FIRST_LINE:
            raise ValueError(f"not a .bt file: {first!r}")
        res = None
        size = None
        while True:
            line = f.readline().decode("ascii").strip()
            if line == "data":
                break
            if line.startswith("res "):
                res = float(line.split()[1])
            elif line.startswith("size "):
                size = int(line.split()[1])
            elif line.startswith("id "):
                if line.split()[1] not in ("OcTree", "ColorOcTree"):
                    raise ValueError(f"unsupported tree id {line!r}")
        payload = f.read()

    occupied: list[np.ndarray] = []
    if size == 0 or not payload:
        return np.zeros((0, 3), dtype=np.int32), res
    pos = 0
    # (prefix morton, child_bit_level) preorder stack, mirroring the writer.
    stack = [(np.uint64(0), OCTOMAP_TREE_DEPTH - 1)]
    while stack:
        prefix, b = stack.pop()
        byte0, byte1 = payload[pos], payload[pos + 1]
        pos += 2
        inner = []
        for i in range(8):
            bits = (byte0 >> (2 * i)) & 0b11 if i < 4 else (byte1 >> (2 * (i - 4))) & 0b11
            if bits == 0:
                continue
            child_prefix = prefix | (np.uint64(i) << np.uint64(3 * b))
            if bits == 0b11:
                inner.append((child_prefix, b - 1))
            elif bits == 0b01:  # occupied leaf, possibly pruned
                n_vox = 1 << (3 * b)
                occupied.append(child_prefix + np.arange(n_vox, dtype=np.uint64))
            # 0b10 free leaf: tracked trees only; ignored for occupancy set
        for child in reversed(inner):
            stack.append(child)
    if not occupied:
        return np.zeros((0, 3), dtype=np.int32), res
    mortons = np.concatenate(occupied)
    keys = morton_decode(np.sort(mortons)).astype(np.int64) - _KEY_OFFSET
    return keys.astype(np.int32), res
