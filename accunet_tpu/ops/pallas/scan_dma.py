"""Hand-pipelined DMA variant of the chunked linear-recurrence scan.

VERDICT r4 weak #6 / next #4: the auto-pipelined scan kernel
(ops/pallas/scan.py) streams at 146-153 GB/s vs XLA's 192.6 GB/s pointwise
rate at the same shape (ROOFLINE §16) — and a bare pallas COPY is equally
slow, so the loss is the Mosaic outer-pipeline itself (per-grid-step
copy/semaphore overhead at ~1.6 us x 196 steps on the B8 L3136 D768 shape),
not the scan arithmetic. This kernel removes the outer pipeline entirely:

  * ONE program (grid=()), inputs left in HBM (memory_space=ANY);
  * an in-kernel fori_loop walks the B x L/CHUNK chunks in order with
    NBUF-deep rotating VMEM buffers;
  * explicit `make_async_copy` HBM->VMEM in-copies started NBUF-1 chunks
    ahead, h written back VMEM->HBM asynchronously, with per-slot DMA
    semaphores — so buffer depth and DMA issue order are under our control
    instead of the pipeliner's fixed double-buffer schedule;
  * the inter-chunk carry is a (1, D) VMEM scratch, reset at each batch
    row's first chunk (same recurrence as _scan_kernel, reference
    selective_scan_oflex_rh.cpp:225-252).

The compute body is the same Hillis-Steele log-pass block as scan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _dma_scan_kernel(a_hbm, b_hbm, h_hbm, a_buf, b_buf, h_buf, carry_ref,
                     in_sems, out_sems, *, chunk: int, nbuf: int,
                     nchunks: int, bsz: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    total = bsz * nchunks

    def in_copies(i, slot):
        bi = i // nchunks
        ci = lax.rem(i, nchunks)
        return (
            pltpu.make_async_copy(
                a_hbm.at[bi, pl.ds(ci * chunk, chunk)], a_buf.at[slot],
                in_sems.at[0, slot]),
            pltpu.make_async_copy(
                b_hbm.at[bi, pl.ds(ci * chunk, chunk)], b_buf.at[slot],
                in_sems.at[1, slot]),
        )

    def out_copy(i, slot):
        bi = i // nchunks
        ci = lax.rem(i, nchunks)
        return pltpu.make_async_copy(
            h_buf.at[slot], h_hbm.at[bi, pl.ds(ci * chunk, chunk)],
            out_sems.at[slot])

    # prologue: fill the pipeline NBUF-1 deep
    for i in range(min(nbuf - 1, total)):
        for dma in in_copies(i, i % nbuf):
            dma.start()
    carry_ref[...] = jnp.zeros_like(carry_ref)

    def body(i, _):
        slot = lax.rem(i, nbuf)
        ahead = i + nbuf - 1

        @pl.when(ahead < total)
        def _():
            for dma in in_copies(ahead, lax.rem(ahead, nbuf)):
                dma.start()

        for dma in in_copies(i, slot):
            dma.wait()

        a = a_buf[slot].astype(jnp.float32)  # (CHUNK, D)
        b = b_buf[slot].astype(jnp.float32)
        s = 1
        while s < chunk:
            a_sh = jnp.pad(a, ((s, 0), (0, 0)), constant_values=1.0)[:chunk]
            b_sh = jnp.pad(b, ((s, 0), (0, 0)), constant_values=0.0)[:chunk]
            b = b + a * b_sh
            a = a * a_sh
            s *= 2
        h = b + a * carry_ref[0][None, :]

        # row boundary: the NEXT chunk starts a new batch row iff this one
        # ends it; its carry must then be zero
        ci = lax.rem(i, nchunks)
        carry_ref[...] = jnp.where(ci == nchunks - 1, 0.0, h[-1:])

        # the h slot is recycled every nbuf chunks — its previous write-back
        # must have retired before we overwrite it
        @pl.when(i >= nbuf)
        def _():
            out_copy(i - nbuf, slot).wait()

        h_buf[slot] = h.astype(h_buf.dtype)
        out_copy(i, slot).start()
        return 0

    lax.fori_loop(0, total, body, 0)

    # epilogue: drain the outstanding write-backs
    tail = min(nbuf, total)
    for k in range(tail):
        i = total - tail + k
        out_copy(i, lax.rem(jnp.int32(i), nbuf)).wait()


@functools.partial(jax.jit, static_argnames=("chunk", "nbuf", "interpret"))
def dma_chunked_scan(a, b, chunk: int = 128, nbuf: int = 4,
                     interpret: bool = False):
    """h[t] = a[t]*h[t-1] + b[t] along axis 1 of (B, L, D) — hand-pipelined
    DMA kernel (see module docstring). Forward only; numerics identical to
    scan.chunked_linear_scan's forward."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, l, d = a.shape
    pad = (-l) % chunk
    if pad:
        a = jnp.pad(a, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
        b = jnp.pad(b, ((0, 0), (0, pad), (0, 0)))
    lp = l + pad
    nchunks = lp // chunk

    h = pl.pallas_call(
        functools.partial(_dma_scan_kernel, chunk=chunk, nbuf=nbuf,
                          nchunks=nchunks, bsz=bsz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, lp, d), a.dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, chunk, d), a.dtype),
            pltpu.VMEM((nbuf, chunk, d), a.dtype),
            pltpu.VMEM((nbuf, chunk, d), a.dtype),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nbuf)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(a, b)
    return h[:, :l]
