"""One-shot TPU relay health probe: tiny matmul with a hard timeout.

The axon relay can wedge (round 2: a pathological Mosaic compile left even
trivial dispatches hanging; docs/design.md §6). This probe is the unit the
health loop and bench.py build on: run it in a SUBPROCESS with `timeout` so
a wedged relay never blocks the caller.

Exit code 0 = device responded; prints the round-trip seconds.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    t_init = time.time() - t0
    t0 = time.time()
    x = jnp.ones((8, 8), jnp.bfloat16)
    float((x @ x).sum())
    t_op = time.time() - t0
    print(f"ok init={t_init:.1f}s op={t_op:.1f}s devices={devs}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
