"""Relay-memoization guards for host-loop device dispatches.

This deployment's TPU relay memoizes dispatches on bf16-truncated content
hashes (measured, docs/design.md §6): two dispatches of the same
executable whose float inputs differ only below bf16 precision can return
the FIRST call's result. Harmless for timing loops; catastrophic for
host-loop SfM numerics — the measured failure is the PnP-after-BA retry:
BA polishes landmarks by sub-bf16 amounts, the retry dispatch hashes
equal to the pre-BA call, and the "retry" returns the exact pose it was
supposed to improve (500-frame runs on the relay: coverage 0.0, ATE inf —
VERDICT r4 weak 2).

Two defenses, both zero-cost on correctness:

* `dispatch_salt()` — a cycling bf16-distinct scalar to fold into one
  operand as ``x * (1 + 0 * salt)`` (the same discipline bench.py's
  timing loops use). The value never changes the result; the operand
  changes the content hash.
* `fold_dispatch(key)` — fold a global call counter into a PRNG key, so
  repeated randomized dispatches (PnP/RANSAC retries) are distinct at
  the inputs even when their float payloads are bf16-identical.

`memoization_canary()` detects the hazard directly (two sub-bf16-
different dispatches returning bit-identical results) for tools that
want to log or bail.
"""

from __future__ import annotations

import itertools
import threading

_counter = itertools.count()
_lock = threading.Lock()


def _next() -> int:
    with _lock:
        return next(_counter)


def dispatch_salt():
    """A float32 scalar distinct (in bf16) from the previous ~256 calls.
    Integers 1..256 are exactly representable in bf16, so every value
    yields a distinct content hash; fold into a dead operand as
    ``x * (1 + 0 * salt)`` (XLA keeps the multiply — float 0*x is not
    algebraically removable)."""
    import jax.numpy as jnp

    return jnp.float32(1 + (_next() % 256))


def fold_dispatch(key):
    """Fold the global dispatch counter into a PRNG key: repeated
    randomized dispatches get distinct uint32 inputs regardless of how
    bf16-close their float payloads are. Semantically free — callers
    already treat the key stream as arbitrary."""
    import jax

    return jax.random.fold_in(key, _next() % (1 << 30))


def memoization_canary() -> bool:
    """True if the active backend memoizes bf16-close dispatches.

    Dispatches ``sum(x * x)`` twice with inputs differing by 2**-20
    (invisible in bf16, visible in fp32). A correct backend returns
    different fp32 sums; a content-hash-memoizing relay returns the
    first result twice."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x * x, dtype=jnp.float32))
    base = jnp.full((64,), 1.5, jnp.float32)
    a = float(f(base))
    b = float(f(base + jnp.float32(2.0 ** -20)))
    return a == b
