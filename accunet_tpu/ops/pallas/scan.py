"""Pallas TPU chunked linear-recurrence scan.

The TPU-native counterpart of the reference's chunked CUDA selective scan
(/root/reference/kernels/selective_scan/csrc/selective_scan/
selective_scan_oflex_rh.cpp:225-252: L chunked at 2048, cub::BlockScan with a
first-order-recurrence combine, inter-chunk running prefix carried in shared
memory; backward via reverse_scan.cuh).

Computes h[t] = a[t]*h[t-1] + b[t] (h[-1] = 0) for (B, L, D) inputs:

  * grid (B, L/CHUNK); the chunk axis is the innermost grid dim, so chunks
    execute in order and the carry lives in a VMEM scratch that persists
    across grid steps (reset at chunk 0 of each batch row).
  * within a chunk: log2(CHUNK) Hillis-Steele passes over the (CHUNK, D)
    block — shift-down by s with identity padding (a=1, b=0), fully
    vectorized on the VPU.
  * one HBM read of (a, b) and one write of h — O(L) traffic, vs the
    O(L log L) materialization of lax.associative_scan.

Backward: dL/db[t] = G[t] with G[t] = g[t] + a[t+1]*G[t+1] — the same
recurrence run in reverse with a shifted decay — and dL/da[t] = G[t]*h[t-1];
implemented with the same kernel on flipped arrays (custom_vjp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from accunet_tpu.ops.platform import on_tpu
from jax import lax


def _scan_kernel(a_ref, b_ref, h_ref, carry_ref, *, chunk: int):
    import jax.experimental.pallas as pl

    chunk_idx = pl.program_id(1)

    @pl.when(chunk_idx == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    a = a_ref[0].astype(jnp.float32)  # (CHUNK, D)
    b = b_ref[0].astype(jnp.float32)

    s = 1
    while s < chunk:
        a_sh = jnp.pad(a, ((s, 0), (0, 0)), constant_values=1.0)[:chunk]
        b_sh = jnp.pad(b, ((s, 0), (0, 0)), constant_values=0.0)[:chunk]
        b = b + a * b_sh
        a = a * a_sh
        s *= 2

    h = b + a * carry_ref[0][None, :]
    carry_ref[...] = h[-1:]
    h_ref[0] = h.astype(h_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _chunked_scan_fwd(a, b, chunk: int = 128, interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, l, d = a.shape
    pad = (-l) % chunk
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
        b = jnp.pad(b, ((0, 0), (0, pad), (0, 0)))
    lp = l + pad

    h = pl.pallas_call(
        functools.partial(_scan_kernel, chunk=chunk),
        grid=(bsz, lp // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, d), lambda bi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d), lambda bi, ci: (bi, ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, d), lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, lp, d), a.dtype),
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
        interpret=interpret,
    )(a, b)
    return h[:, :l]


def _xla_scan(a, b):
    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a2 * a1, a2 * b1 + b2

    _, h = lax.associative_scan(combine, (a, b), axis=1)
    return h


@jax.custom_vjp
def chunked_linear_scan(a, b):
    """h[t] = a[t]*h[t-1] + b[t] along axis 1 of (B, L, D). Pallas on TPU,
    associative_scan elsewhere."""
    return _impl(a, b)


def _impl(a, b, interpret=False):
    if on_tpu():
        return _chunked_scan_fwd(a, b)
    return _xla_scan(a, b)


def _fwd(a, b):
    h = _impl(a, b)
    return h, (a, h)


def _bwd(res, g):
    a, h = res
    ones_tail = jnp.ones_like(a[:, :1])
    a_next = jnp.concatenate([a[:, 1:], ones_tail], axis=1)
    # G[t] = g[t] + a[t+1] * G[t+1]  — reverse recurrence
    G = _impl(a_next[:, ::-1], g[:, ::-1])[:, ::-1]
    h_prev = jnp.concatenate([jnp.zeros_like(h[:, :1]), h[:, :-1]], axis=1)
    return G * h_prev, G


chunked_linear_scan.defvjp(_fwd, _bwd)
