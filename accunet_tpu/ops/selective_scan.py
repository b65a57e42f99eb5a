"""Selective scan (Mamba SSM recurrence) — XLA associative-scan reference.

Replaces two CUDA kernels from the reference:
  * mamba_ssm's selective_scan_fn (consumed by MambaVisionMixer, flagship
    nets/segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba.py:688-698)
  * the modified `selective_scan_cuda_oflex_rh` "return-hidden" kernel
    (/root/reference/kernels/selective_scan/csrc/.../selective_scan_oflex_rh.cpp:
    225-252 — C removed, per-step hidden states (B,D,N,L) returned), consumed
    by SpatialMamba's StructureAwareSSM (nets/spatialmamba.py:282-323).

The recurrence h[l] = exp(Δ[l]·A)·h[l-1] + Δ[l]·B[l]·u[l] is a first-order
linear recurrence whose combine ((a1,b1),(a2,b2)) → (a2·a1, a2·b1+b2) is
associative, so it maps to jax.lax.associative_scan — a log-depth, fully
vectorized XLA program (the TPU-native counterpart of the reference's
cub::BlockScan chunked prefix scan). The fused chunked Pallas kernel lives in
ops/pallas/scan.py.

Layouts follow the torch API for drop-in porting: u/Δ (B,D,L), A (D,N),
B/C (B,N,L), D (D,), z (B,D,L).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _combine(x, y):
    a1, b1 = x
    a2, b2 = y
    return a2 * a1, a2 * b1 + b2


def _scan_bldn(a, b):
    """First-order scan over axis 1 of (B, L, D, N) tensors, via the Pallas
    chunked kernel on TPU (ops/pallas/scan.py) with custom VJP, or
    associative_scan elsewhere.

    Under an active parallel.seq_scan.sequence_sharding(mesh) context the L
    axis is sharded over the mesh's seq axis and completed with the
    carry-exchange collective (SURVEY §5.7) — the distributed analogue of
    the reference CUDA kernel's inter-chunk prefix
    (selective_scan_oflex_rh.cpp:225)."""
    from accunet_tpu.ops.pallas.scan import chunked_linear_scan
    from accunet_tpu.parallel import seq_scan

    bb, l, d, n = a.shape
    a2, b2 = a.reshape(bb, l, d * n), b.reshape(bb, l, d * n)
    ctx = seq_scan.active()
    if ctx is not None:
        mesh, axis = ctx
        if l % mesh.shape[axis] == 0:
            h = seq_scan.shard_mapped_scan(a2, b2, mesh, axis)
            return h.reshape(bb, l, d, n)
        seq_scan.warn_divisibility_fallback(l, mesh.shape[axis])
    h = chunked_linear_scan(a2, b2)
    return h.reshape(bb, l, d, n)


def selective_scan(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    z=None,
    delta_bias=None,
    delta_softplus=False,
    return_last_state=False,
):
    """Standard Mamba selective scan: returns y (B,D,L) [+ last state]."""
    dtype_in = u.dtype
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)

    # (B, L, D, N) internal layout: L is the scan axis, D*N vectorizes on VPU
    a = jnp.exp(jnp.einsum("bdl,dn->bldn", delta, A))
    bu = jnp.einsum("bdl,bnl,bdl->bldn", delta, B, u)
    h = _scan_bldn(a, bu)
    y = jnp.einsum("bldn,bnl->bdl", h, C)
    if D is not None:
        y = y + u * D.astype(jnp.float32)[None, :, None]
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    y = y.astype(dtype_in)
    if return_last_state:
        return y, h[:, -1].astype(dtype_in)
    return y


def selective_scan_rh(
    u,
    delta,
    A,
    B,
    delta_bias=None,
    delta_softplus=False,
):
    """Return-hidden variant (selective_scan_cuda_oflex_rh semantics):
    returns the full per-step hidden states h with shape (B, D, N, L)."""
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    a = jnp.exp(jnp.einsum("bdl,dn->bldn", delta, A.astype(jnp.float32)))
    bu = jnp.einsum("bdl,bnl,bdl->bldn", delta, B.astype(jnp.float32), u)
    h = _scan_bldn(a, bu)
    return h.transpose(0, 2, 3, 1)  # (B, D, N, L)
