"""Fused ResPath level kernel (ops/pallas/respath.py) vs the unfused frame
path — same variable tree, interpret-mode Pallas on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.nn.acc_blocks import ResPath
from accunet_tpu.ops import s2d

pytestmark = pytest.mark.quick


def _jitter(tree, key, scale=0.3):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = [l + scale * jax.random.normal(k, l.shape, l.dtype)
           for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("n_lvl", [1, 3, 4])
def test_fused_matches_unfused(n_lvl):
    cin, b, hlog = 32, 2, 16  # 4*cin = 128 frame lanes (the L1 shape)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hlog, hlog, cin))
    xf = s2d.pack(x)
    mod_u = ResPath(cin, n_lvl, layout="s2d", fuse="off")
    mod_f = ResPath(cin, n_lvl, layout="s2d", fuse="force")

    variables = mod_u.init(jax.random.PRNGKey(1), xf, True)
    params = _jitter(variables["params"], jax.random.PRNGKey(2))
    _, mut = mod_u.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        xf, True, mutable=["batch_stats"],
    )
    variables = {"params": params, "batch_stats": mut["batch_stats"]}

    yu = mod_u.apply(variables, xf, False)
    yf = mod_f.apply(variables, xf, False)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                               atol=5e-5, rtol=5e-5)


def test_param_trees_identical():
    xf = s2d.pack(jnp.zeros((1, 8, 8, 32)))
    tu = ResPath(32, 2, layout="s2d", fuse="off").init(
        jax.random.PRNGKey(0), xf, False)
    tf = ResPath(32, 2, layout="s2d", fuse="force").init(
        jax.random.PRNGKey(0), xf, False)
    su = jax.tree_util.tree_structure(tu)
    sf = jax.tree_util.tree_structure(tf)
    assert su == sf
    for (pu, lu), (pf, lf) in zip(
        jax.tree_util.tree_leaves_with_path(tu),
        jax.tree_util.tree_leaves_with_path(tf),
    ):
        assert pu == pf and lu.shape == lf.shape
