"""dwconv2d Pallas kernel vs lax reference (kernel-vs-lax tier of the test
pyramid, SURVEY.md §4): forward in interpreter mode, custom-VJP gradients vs
autodiff of the reference, and the reference repo's dilated-composition
identity check (kernels/dwconv2d/check.py:15-54 analogue)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

import jax
import jax.numpy as jnp

from accunet_tpu.ops.pallas.dwconv2d import (
    _dwconv2d_wgrad_pallas,
    dwconv2d,
    dwconv2d_reference,
)

# NOTE: round 1 also shipped a Pallas *forward*; it lost to XLA's grouped
# conv at every k in the reference's own sweep and was deleted in round 2
# (rationale in ops/pallas/dwconv2d.py's module docstring). The custom VJP
# (flipped-kernel dgrad + Pallas wgrad) remains and is tested below.


def test_pallas_wgrad_matches_autodiff():
    rs = np.random.RandomState(1)
    k = 5
    x = jnp.asarray(rs.rand(2, 8, 8, 128).astype(np.float32))
    w = jnp.asarray(rs.rand(k, k, 128).astype(np.float32) - 0.5)
    g = jnp.asarray(rs.rand(2, 8, 8, 128).astype(np.float32))

    def ref_loss(w):
        return jnp.vdot(dwconv2d_reference(x, w, None), g)

    want = jax.grad(ref_loss)(w)
    got = _dwconv2d_wgrad_pallas(x, g, k, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_custom_vjp_matches_autodiff():
    rs = np.random.RandomState(2)
    k = 3
    x = jnp.asarray(rs.rand(1, 8, 8, 128).astype(np.float32))
    w = jnp.asarray(rs.rand(k, k, 128).astype(np.float32) - 0.5)
    b = jnp.asarray(rs.rand(128).astype(np.float32))

    def loss_custom(x, w, b):
        return jnp.sum(dwconv2d(x, w, b) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(dwconv2d_reference(x, w, b) ** 2)

    got = jax.grad(loss_custom, argnums=(0, 1, 2))(x, w, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt), atol=1e-4, rtol=1e-4)


def test_dilated_composition_identity():
    """Composing 3x3 depthwise convs with dilations 1,3,5 equals one 11x11
    depthwise conv whose kernel embeds the three at their dilation offsets —
    the identity the reference uses to validate its CUDA kernel
    (kernels/dwconv2d/check.py), reproduced against the lax path."""
    rs = np.random.RandomState(3)
    c = 32
    x = jnp.asarray(rs.rand(1, 24, 24, c).astype(np.float32))
    k1 = rs.rand(3, 3, c).astype(np.float32) - 0.5

    # dilation-3 3x3 == 7x7 sparse; dilation-5 3x3 == 11x11 sparse
    def dilate(k3, d):
        size = 2 * d + 1
        k = np.zeros((size, size, c), np.float32)
        k[::d, ::d] = k3
        return k

    k2 = dilate(rs.rand(3, 3, c).astype(np.float32) - 0.5, 3)
    k3_ = dilate(rs.rand(3, 3, c).astype(np.float32) - 0.5, 5)

    y = dwconv2d_reference(x, jnp.asarray(k1))
    y = dwconv2d_reference(y, jnp.asarray(k2))
    y = dwconv2d_reference(y, jnp.asarray(k3_))

    # compose into one 11+... window: conv of kernels (full correlation)
    # sequential same-pad convs == single conv with the correlation of kernels
    # (valid within the interior; compare centre crop)
    from scipy.signal import convolve2d

    # sequential correlations compose as correlation with conv(k1, k2, k3):
    # composite size 3+7-1+11-1 = 19, centres add (1+3+5 = 9 = centre of 19)
    comp = np.zeros((19, 19, c), np.float32)
    for ch in range(c):
        t = convolve2d(k1[:, :, ch], k2[:, :, ch], mode="full")
        comp[:, :, ch] = convolve2d(t, k3_[:, :, ch], mode="full")
    y2 = dwconv2d_reference(x, jnp.asarray(comp))
    crop = 10
    np.testing.assert_allclose(
        np.asarray(y)[:, crop:-crop, crop:-crop],
        np.asarray(y2)[:, crop:-crop, crop:-crop],
        atol=1e-4,
        rtol=1e-3,
    )


def test_wgrad_pallas_dispatch_policy():
    """The one-pass Pallas wgrad engages at the wide-decoder train geometry
    (cnv72: 56^2, C=4352 — per-tap XLA is ~9x compulsory traffic there,
    ROOFLINE §22) and stays off at the small shapes where the forms tie."""
    from accunet_tpu.ops.pallas.dwconv2d import _wgrad_pallas_ok

    cnv72 = jnp.zeros((8, 56, 56, 4352), jnp.bfloat16)
    small = jnp.zeros((8, 64, 64, 384), jnp.float32)
    assert _wgrad_pallas_ok(cnv72)
    assert not _wgrad_pallas_ok(small)
    # env overrides win in both directions
    import os

    os.environ["ACCUNET_DWCONV_WGRAD"] = "taps"
    try:
        assert not _wgrad_pallas_ok(cnv72)
    finally:
        os.environ["ACCUNET_DWCONV_WGRAD"] = "pallas"
    try:
        assert _wgrad_pallas_ok(small)
    finally:
        del os.environ["ACCUNET_DWCONV_WGRAD"]


def test_pallas_wgrad_matches_autodiff_k3():
    """k=3 (the production kernel size) one-pass wgrad vs autodiff."""
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.rand(2, 10, 12, 128).astype(np.float32))
    w = jnp.asarray(rs.rand(3, 3, 128).astype(np.float32) - 0.5)
    g = jnp.asarray(rs.rand(2, 10, 12, 128).astype(np.float32))

    def ref_loss(w):
        return jnp.vdot(dwconv2d_reference(x, w, None), g)

    want = jax.grad(ref_loss)(w)
    got = _dwconv2d_wgrad_pallas(x, g, 3, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-4)
