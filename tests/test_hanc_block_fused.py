"""Fused whole-HANCBlock kernel (ops/pallas/hanc_block.py) vs the unfused
frame path — same variables, interpret-mode Pallas on CPU.

The fused path folds every BatchNorm to an inference affine and runs the
block body in one kernel; it must match the op-by-op frame path to fp
reassociation tolerance, including the SAME-padding semantics at image
edges (halo rows are post-activation zeros) and the row-tiled pooling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.nn.acc_blocks import HANCBlock
from accunet_tpu.ops import s2d

pytestmark = pytest.mark.quick


def _jitter(tree, key, scale=0.3):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        out.append(leaf + scale * jax.random.normal(k, leaf.shape, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def _compare(k, cin, inv, cout, hlog=16, wlog=16, b=2):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hlog, wlog, cin), jnp.float32)
    xf = s2d.pack(x)
    kw = dict(n_filts=cin, out_channels=cout, k=k, inv_fctr=inv, layout="s2d")
    mod_u = HANCBlock(**kw, fuse="off")
    mod_f = HANCBlock(**kw, fuse="force")

    variables = mod_u.init(jax.random.PRNGKey(1), xf, True)
    # make the BN affines non-trivial: jitter params, then run a real train
    # step so batch_stats move off their init values
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    params = _jitter(variables["params"], jax.random.PRNGKey(2))
    _, mut = mod_u.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        xf, True, mutable=["batch_stats"],
    )
    variables = {"params": params, "batch_stats": mut["batch_stats"]}

    yu = mod_u.apply(variables, xf, False)
    yf = mod_f.apply(variables, xf, False)
    np.testing.assert_allclose(
        np.asarray(yu), np.asarray(yf), atol=5e-4, rtol=5e-4
    )
    return yu


def test_fused_matches_unfused_k3():
    _compare(k=3, cin=8, inv=3, cout=12)


def test_fused_matches_unfused_k2():
    _compare(k=2, cin=8, inv=2, cout=8)


def test_fused_matches_unfused_k1():
    _compare(k=1, cin=8, inv=3, cout=8)


def test_fused_multi_tile_rows():
    # Hf = 16 -> tiles of 8: exercises halo recompute at interior tile edges
    _compare(k=3, cin=8, inv=3, cout=8, hlog=32, wlog=16)


def test_fused_cnv91_geometry():
    # the real decoder-block shape family (scaled down): cin=16, E=48
    _compare(k=3, cin=16, inv=3, cout=8, hlog=16, wlog=16)


def test_fused_identical_tree():
    """The fused branch must create the exact variable tree of the unfused
    branch (checkpoint compatibility both ways)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 8), jnp.float32)
    xf = s2d.pack(x)
    kw = dict(n_filts=8, out_channels=8, k=3, inv_fctr=3, layout="s2d")
    vu = HANCBlock(**kw, fuse="off").init(jax.random.PRNGKey(1), xf, False)
    vf = HANCBlock(**kw, fuse="force").init(jax.random.PRNGKey(1), xf, False)
    pu = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vu)
    pf = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vf)
    assert jax.tree_util.tree_structure(pu) == jax.tree_util.tree_structure(pf)
    assert jax.tree_util.tree_leaves(pu) == jax.tree_util.tree_leaves(pf)


def test_se_chained_pair_matches_unchained():
    """SE-chained pair (block1 defers its SE apply into block2's in-VMEM
    input read — ROOFLINE §13.2/§13.4) vs the plain two-block pipeline:
    identical variable tree, outputs to fp tolerance. Also covers the
    clamped-halo staging of the parts input path at tile boundaries
    (hlog=32 -> two row tiles)."""
    import flax.linen as nn

    class Pair(nn.Module):
        fuse: str
        defer: bool

        @nn.compact
        def __call__(self, xf, train=False):
            y = HANCBlock(8, 8, k=3, inv_fctr=3, layout="s2d",
                          fuse=self.fuse, defer_se=self.defer, name="a")(
                              xf, train)
            return HANCBlock(8, 12, k=3, inv_fctr=3, layout="s2d",
                             fuse=self.fuse, name="b")(y, train)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16, 8), jnp.float32)
    xf = s2d.pack(x)
    ref_mod = Pair(fuse="off", defer=False)
    variables = ref_mod.init(jax.random.PRNGKey(1), xf, True)
    params = _jitter(variables["params"], jax.random.PRNGKey(2))
    _, mut = ref_mod.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        xf, True, mutable=["batch_stats"],
    )
    variables = {"params": params, "batch_stats": mut["batch_stats"]}

    ref = ref_mod.apply(variables, xf, False)
    for defer in (False, True):
        got = Pair(fuse="force", defer=defer).apply(variables, xf, False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3
        )
    # tree parity: the deferred pair creates the exact same variables
    vd = Pair(fuse="force", defer=True).init(jax.random.PRNGKey(1), xf, False)
    t1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), variables)
    t2 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vd)
    assert jax.tree_util.tree_structure(t1) == jax.tree_util.tree_structure(t2)
    assert jax.tree_util.tree_leaves(t1) == jax.tree_util.tree_leaves(t2)


def test_gb_image_batching_matches_gb1():
    """Multiple images per program (pick_gb / ACCUNET_FUSED_HANC_GB) is a
    pure grid re-shaping: outputs must be identical to gb=1."""
    from accunet_tpu.ops.pallas.hanc_block import hanc_block_frame

    k, cin, inv, cout, b = 3, 8, 3, 12, 4
    e = cin * inv
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (b, 16, 16, cin), jnp.float32)
    xf = s2d.pack(x)
    w1 = jax.random.normal(ks[1], (cin, e)) * 0.3
    b1 = jax.random.normal(ks[2], (e,)) * 0.1
    wd = jax.random.normal(ks[3], (3, 3, e)) * 0.3
    bd = jax.random.normal(ks[4], (e,)) * 0.1
    wh = jax.random.normal(ks[5], (e, 2 * k - 1, cin)) * 0.1
    bh = jax.random.normal(ks[6], (cin,)) * 0.1
    w3 = jax.random.normal(ks[7], (cin, cout)) * 0.3
    b3 = jax.random.normal(ks[8], (cout,)) * 0.1
    bns = {
        nm: (1.0 + 0.1 * jax.random.normal(kk, (dim,)),
             0.1 * jax.random.normal(kk, (dim,)))
        for nm, dim, kk in [
            ("norm1", e, ks[9]), ("norm2", e, ks[10]), ("hnc", cin, ks[11]),
            ("norm", cin, ks[9]), ("norm3", cout, ks[10]),
        ]
    }
    args = (xf, w1, b1, wd, bd, wh, bh, w3, b3, bns, k)
    y1, s1 = hanc_block_frame(*args, interpret=True, gb=1, emit_sums=True)
    for gb in (2, 4):
        yg, sg = hanc_block_frame(*args, interpret=True, gb=gb,
                                  emit_sums=True)
        np.testing.assert_allclose(np.asarray(yg), np.asarray(y1),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sg), np.asarray(s1),
                                   atol=1e-5, rtol=1e-5)
    # the sums output must equal the per-tile/per-position channel sums of
    # the returned frame (the SE squeeze contract)
    b_, hf, wf, _ = y1.shape
    th = hf // s1.shape[1]
    yt = np.asarray(y1, np.float32).reshape(b_, s1.shape[1], th, wf, 4, cout)
    ref_sums = yt.sum(axis=(2, 3))
    np.testing.assert_allclose(np.asarray(s1), ref_sums, atol=1e-4, rtol=1e-4)
