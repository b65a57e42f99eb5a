"""Hybrid HANCBlock front-half kernel (ops/pallas/expand_dw.py) — NHWC
expand+BN+lrelu+dwconv+BN+lrelu, interpret-mode Pallas vs the XLA ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.nn.acc_blocks import HANCBlock

pytestmark = pytest.mark.quick


def test_expand_dw_matches_xla():
    from accunet_tpu.ops.pallas.expand_dw import expand_dw_nhwc

    cin, e, b, h, w = 8, 128, 2, 12, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    w1 = jax.random.normal(ks[1], (cin, e)) * 0.3
    b1 = jax.random.normal(ks[2], (e,)) * 0.1
    wd = jax.random.normal(ks[3], (3, 3, e)) * 0.3
    bd = jax.random.normal(ks[4], (e,)) * 0.1
    bn1 = (1.0 + 0.1 * jax.random.normal(ks[5], (e,)),
           0.1 * jax.random.normal(ks[5], (e,)))
    bn2 = (1.0 + 0.1 * jax.random.normal(ks[6], (e,)),
           0.1 * jax.random.normal(ks[6], (e,)))

    got = expand_dw_nhwc(x, w1, b1, wd, bd, bn1, bn2, interpret=True)

    def lrelu(t):
        return jax.nn.leaky_relu(t, 0.01)

    # reference: conv bias -> folded-BN affine -> lrelu, then SAME dwconv
    y = (x.reshape(-1, cin) @ w1 + b1).reshape(b, h, w, e)
    y = lrelu(y * bn1[0] + bn1[1])
    want = jax.lax.conv_general_dilated(
        y, wd.reshape(3, 3, 1, e), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=e,
    ) + bd
    want = lrelu(want * bn2[0] + bn2[1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("th", [2, 4])
def test_expand_dw_tilings_agree(th):
    from accunet_tpu.ops.pallas.expand_dw import expand_dw_nhwc

    cin, e, b, h, w = 4, 128, 1, 8, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    args = (
        x,
        jax.random.normal(ks[1], (cin, e)) * 0.3,
        jax.random.normal(ks[2], (e,)) * 0.1,
        jax.random.normal(ks[3], (3, 3, e)) * 0.3,
        jax.random.normal(ks[4], (e,)) * 0.1,
        (jnp.ones((e,)), jnp.zeros((e,))),
        (jnp.ones((e,)), jnp.zeros((e,))),
    )
    base = expand_dw_nhwc(*args, interpret=True, th=8)
    got = expand_dw_nhwc(*args, interpret=True, th=th)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=1e-6, rtol=1e-6)


def test_hybrid_block_matches_unfused():
    """HANCBlock nhwc inference with the hybrid front half (fuse='force')
    equals the plain XLA path, same variable tree."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 8), jnp.float32)
    kw = dict(n_filts=8, out_channels=12, k=3, inv_fctr=16)  # e=128, aligned
    mod_u = HANCBlock(**kw, fuse="off")
    mod_f = HANCBlock(**kw, fuse="force")
    variables = mod_u.init(jax.random.PRNGKey(3), x, True)
    _, mut = mod_u.apply(variables, x, True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": mut["batch_stats"]}
    yu = mod_u.apply(variables, x, False)
    yf = mod_f.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                               atol=5e-5, rtol=5e-5)
