"""Sequence-parallel selective scan over a device mesh.

New capability beyond the reference (SURVEY.md §5.7): the reference's
long-sequence mechanism is purely intra-device (CUDA chunked scan); here the
token axis L is sharded over the mesh's `seq` axis and the first-order
recurrence h[t] = a[t]·h[t-1] + b[t] is completed with one tiny collective:

  1. each shard runs the local (Pallas) chunked scan on its L/n tokens,
     producing h_local and the pair (A_prod = prod a, h_last)
  2. the (A_prod, h_last) pairs — shape (B, D), bytes ~ B·D·8 — are
     all-gathered over `seq` (rides ICI) and combined with the associative
     rule to form each shard's exclusive prefix carry h_in
  3. shards correct locally: h = h_local + cumprod(a) · h_in

Communication is O(B·D·n_shards) regardless of L — the carry exchange is the
only cross-chip traffic, exactly the inter-chunk prefix of the CUDA kernel
(selective_scan_oflex_rh.cpp:225) lifted from SMEM to ICI.

Use inside shard_map with the `seq` mesh axis mapping the L dimension.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

# --- opt-in model integration -------------------------------------------
# `with sequence_sharding(mesh):` around a model call (or its jit tracing)
# makes every selective-scan core (ops/selective_scan.py:_scan_bldn) run the
# L axis through shard_map(sequence_parallel_scan) over the mesh's `seq`
# axis. Everything around the scan stays a global pjit program — XLA moves
# the data to/from the P(None, 'seq', None) layout at the shard_map
# boundary; the scan itself is the only op that is sequential in L.
_ACTIVE: list = []


@contextlib.contextmanager
def sequence_sharding(mesh, axis_name: str = "seq"):
    """Activate sequence-parallel selective scans for model calls traced
    inside this context. `mesh` must carry `axis_name`.

    TRACE-TIME capture: jit traces a function once — a function first traced
    inside this context bakes the shard_map(seq) routing into its compiled
    executable for ALL later calls (and a function traced outside stays
    local forever, even if later called inside the context). Enter the
    context around the *first* (tracing) call of every jitted function that
    should ride the seq axis.

    Divisibility: a scan whose L is not divisible by the seq-axis size
    silently runs the LOCAL chunked kernel instead; a one-shot warning is
    emitted (warn_divisibility_fallback) so this can't masquerade as
    sequence parallelism.
    """
    _ACTIVE.append((mesh, axis_name))
    try:
        yield
    finally:
        _ACTIVE.pop()


_WARNED_FALLBACK: set = set()


def warn_divisibility_fallback(l: int, n_shards: int) -> None:
    """One warning per (L, shards) pair when an active sequence_sharding
    context could not engage because L % n_shards != 0 (the scan silently
    runs the local kernel — the user should know SP did not happen)."""
    key = (int(l), int(n_shards))
    if key in _WARNED_FALLBACK:
        return
    _WARNED_FALLBACK.add(key)
    import warnings

    warnings.warn(
        f"sequence_sharding active but scan length L={l} is not divisible "
        f"by the seq axis size {n_shards}; falling back to the LOCAL "
        "chunked scan (no sequence parallelism for this op)",
        RuntimeWarning,
        stacklevel=3,
    )


def active():
    """(mesh, axis_name) of the innermost sequence_sharding context, else
    None."""
    return _ACTIVE[-1] if _ACTIVE else None


def shard_mapped_scan(a, b, mesh, axis_name: str = "seq"):
    """Run sequence_parallel_scan over global (B, L, D) arrays by sharding
    L across `axis_name` of `mesh`. Composes with an enclosing jit."""
    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        functools.partial(sequence_parallel_scan, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(None, axis_name, None),
    )
    return fn(a, b)


def sequence_parallel_scan(a, b, axis_name: str = "seq"):
    """Distributed h[t]=a[t]h[t-1]+b[t] over axis 1 of (B, L_shard, D) arrays
    that are sharded along `axis_name`. Call under shard_map."""
    from accunet_tpu.ops.pallas.scan import chunked_linear_scan

    h_local = chunked_linear_scan(a, b)  # local inclusive scan
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    a_prod = jnp.prod(a, axis=1)  # (B, D)
    h_last = h_local[:, -1]  # (B, D)

    # gather all shard summaries: (n, B, D)
    a_all = lax.all_gather(a_prod, axis_name)
    h_all = lax.all_gather(h_last, axis_name)

    # exclusive prefix combine over shards: carry into shard i is the scan of
    # pairs 0..i-1 under (A2*A1, A2*h1 + h2)
    def combine(c, pair):
        ca, ch = c
        pa, ph = pair
        return (pa * ca, pa * ch + ph), (pa * ca, pa * ch + ph)

    init = (jnp.ones_like(a_prod), jnp.zeros_like(h_last))
    _, prefixes = lax.scan(combine, init, (a_all, h_all))
    # prefixes[i] = inclusive scan through shard i; exclusive = prefixes[i-1]
    zero = (jnp.ones_like(a_prod), jnp.zeros_like(h_last))
    h_in = jnp.where(
        idx == 0,
        zero[1],
        prefixes[1][jnp.maximum(idx - 1, 0)],
    )

    # local correction: h[t] += cumprod(a)[t] * h_in
    a_cum = jnp.cumprod(a, axis=1)
    return h_local + a_cum * h_in[:, None, :]
