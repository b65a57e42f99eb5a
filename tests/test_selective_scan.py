"""Selective-scan vs a step-by-step numpy oracle (the associative-scan
formulation must match the sequential recurrence exactly)."""

import numpy as np

import jax.numpy as jnp

from accunet_tpu.ops.selective_scan import selective_scan, selective_scan_rh
import pytest

pytestmark = pytest.mark.quick


def _oracle(u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False):
    b, d, l = u.shape
    n = A.shape[1]
    if delta_bias is not None:
        delta = delta + delta_bias[None, :, None]
    if delta_softplus:
        delta = np.log1p(np.exp(delta))
    h = np.zeros((b, d, n), np.float64)
    hs = np.zeros((b, d, n, l), np.float64)
    y = np.zeros((b, d, l), np.float64)
    for t in range(l):
        a = np.exp(delta[:, :, t, None] * A[None])
        h = a * h + delta[:, :, t, None] * B[:, None, :, t] * u[:, :, t, None]
        hs[..., t] = h
        if C is not None:
            y[:, :, t] = (h * C[:, None, :, t]).sum(-1)
    if D is not None:
        y = y + u * D[None, :, None]
    return y, hs


def _rand(shape, seed):
    return np.random.RandomState(seed).uniform(-0.5, 0.5, shape).astype(np.float32)


def test_selective_scan_matches_oracle():
    b, d, n, l = 2, 8, 4, 37
    u, delta = _rand((b, d, l), 0), _rand((b, d, l), 1)
    A = -np.exp(_rand((d, n), 2))
    B, C = _rand((b, n, l), 3), _rand((b, n, l), 4)
    D = _rand((d,), 5)
    bias = _rand((d,), 6)

    want, _ = _oracle(u, delta, A, B, C, D, bias, True)
    got = selective_scan(
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), jnp.asarray(D), delta_bias=jnp.asarray(bias),
        delta_softplus=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_selective_scan_rh_matches_oracle():
    b, d, n, l = 1, 6, 3, 29
    u, delta = _rand((b, d, l), 7), _rand((b, d, l), 8)
    A = -np.exp(_rand((d, n), 9))
    B = _rand((b, n, l), 10)
    bias = _rand((d,), 11)

    _, hs = _oracle(u, delta, A, B, None, None, bias, True)
    got = selective_scan_rh(
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A), jnp.asarray(B),
        delta_bias=jnp.asarray(bias), delta_softplus=True,
    )
    np.testing.assert_allclose(np.asarray(got), hs, atol=1e-4, rtol=1e-4)
