"""Device mesh setup, sharding helpers, ring collectives, distributed runtime."""

from tpu3drec.parallel.mesh import make_mesh, shard_batch, MESH_AXES
