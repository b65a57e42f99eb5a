"""Pallas chunked linear scan vs associative_scan + VJP checks."""

import numpy as np

import jax
import jax.numpy as jnp

import pytest

from accunet_tpu.ops.pallas.scan import (
    _chunked_scan_fwd,
    _xla_scan,
    chunked_linear_scan,
)

pytestmark = pytest.mark.quick


def _rand(shape, seed, lo=-0.5, hi=0.5):
    return jnp.asarray(
        np.random.RandomState(seed).uniform(lo, hi, shape).astype(np.float32)
    )


def test_pallas_scan_matches_xla():
    b, l, d = 2, 300, 128  # l not a multiple of the chunk → exercises padding
    a = _rand((b, l, d), 0, 0.2, 0.99)
    bb = _rand((b, l, d), 1)
    want = _xla_scan(a, bb)
    got = _chunked_scan_fwd(a, bb, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4)


def test_scan_vjp_matches_autodiff():
    b, l, d = 1, 64, 8
    a = _rand((b, l, d), 2, 0.2, 0.95)
    bb = _rand((b, l, d), 3)
    g = _rand((b, l, d), 4)

    def loss_custom(a, bb):
        return jnp.vdot(chunked_linear_scan(a, bb), g)

    def loss_ref(a, bb):
        return jnp.vdot(_xla_scan(a, bb), g)

    got = jax.grad(loss_custom, argnums=(0, 1))(a, bb)
    want = jax.grad(loss_ref, argnums=(0, 1))(a, bb)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=1e-4, rtol=1e-3)


def test_dma_scan_matches_xla():
    """Hand-pipelined DMA variant (ops/pallas/scan_dma.py): multi-batch,
    non-divisible L (padding), carry reset at row boundaries, both buffer
    depths."""
    from accunet_tpu.ops.pallas.scan_dma import dma_chunked_scan

    b, l, d = 2, 300, 16
    a = _rand((b, l, d), 2, 0.2, 0.99)
    bb = _rand((b, l, d), 3)
    want = _xla_scan(a, bb)
    for nbuf in (2, 4):
        got = dma_chunked_scan(a, bb, chunk=128, nbuf=nbuf, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4
        )
