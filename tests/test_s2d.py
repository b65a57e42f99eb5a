"""Exactness of the s2d execution frame (ops/s2d.py) vs standard layout.

The frame is a pure re-layout: every op must match its NHWC counterpart to
fp-reassociation tolerance, and the ACC-UNet s2d fast path must produce the
same outputs from the SAME variables as the standard path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from accunet_tpu.ops import s2d

pytestmark = pytest.mark.quick


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_pack_unpack_roundtrip():
    x = _rand(0, (2, 8, 12, 5))
    np.testing.assert_array_equal(np.asarray(s2d.unpack(s2d.pack(x))), np.asarray(x))


def test_pack_layout_position_major():
    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    f = np.asarray(s2d.pack(jnp.asarray(x)))
    c = 3
    for po in range(4):
        di, dj = po // 2, po % 2
        np.testing.assert_array_equal(
            f[:, 1, 1, po * c : (po + 1) * c], x[:, 2 + di, 2 + dj, :]
        )


def test_conv3x3_matches_lax():
    x = _rand(1, (2, 16, 16, 5))
    w = _rand(2, (3, 3, 5, 7)) * 0.2
    b = _rand(3, (7,))
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    got = s2d.unpack(s2d.conv3x3(s2d.pack(x), w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_conv1x1_matches():
    x = _rand(4, (2, 8, 8, 6))
    w = _rand(5, (6, 9)) * 0.3
    b = _rand(6, (9,))
    ref = jnp.einsum("bhwc,co->bhwo", x, w) + b
    got = s2d.unpack(s2d.conv1x1(s2d.pack(x), w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_dwconv3x3_matches():
    x = _rand(7, (2, 12, 12, 6))
    w = _rand(8, (3, 3, 6)) * 0.3
    b = _rand(9, (6,))
    ref = lax.conv_general_dilated(
        x, w[:, :, None, :], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=6,
    ) + b
    got = s2d.unpack(s2d.dwconv3x3(s2d.pack(x), w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_dwconv3x3_custom_vjp_grads():
    """Hand-written dwconv3x3 transpose (ROOFLINE §22) == XLA autodiff, f64.

    Compares value+grads of a scalar loss through the custom-VJP path vs the
    raw slice-form impl differentiated by XLA (ACCUNET_DWCONV_VJP=0 path),
    odd sizes + nonuniform cotangent so every tap/halo case is exercised."""
    import os

    from jax import config as _c

    assert os.environ.get("ACCUNET_DWCONV_VJP", "1") != "0"
    _c.update("jax_enable_x64", True)
    try:
        x = jax.random.normal(jax.random.PRNGKey(20), (2, 5, 7, 4 * 6),
                              jnp.float64)
        w = jax.random.normal(jax.random.PRNGKey(21), (3, 3, 6),
                              jnp.float64) * 0.3
        b = jax.random.normal(jax.random.PRNGKey(22), (6,), jnp.float64)
        cot = jax.random.normal(jax.random.PRNGKey(23), (2, 5, 7, 3),
                                jnp.float64)

        def loss(fn, x, w, b):
            y = fn(x, w, b)
            # nonuniform weighting broadcast over the 4C frame channels
            return jnp.sum(y * jnp.tile(cot, (1, 1, 1, 8)))

        def raw(x, w, b):
            return s2d._dwconv3x3_impl(x, w) + s2d.tile4(b)

        v0, g0 = jax.value_and_grad(
            lambda *a: loss(raw, *a), argnums=(0, 1, 2))(x, w, b)
        v1, g1 = jax.value_and_grad(
            lambda *a: loss(s2d.dwconv3x3, *a), argnums=(0, 1, 2))(x, w, b)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-12)
        for a, c in zip(g0, g1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), atol=1e-11, rtol=1e-11)
    finally:
        _c.update("jax_enable_x64", False)


def test_pool_and_broadcast():
    from accunet_tpu.ops.pooling import avg_pool2d, max_pool2d, upsample_nearest

    x = _rand(10, (2, 8, 8, 3))
    xf = s2d.pack(x)
    np.testing.assert_allclose(
        np.asarray(s2d.avg_positions(xf)), np.asarray(avg_pool2d(x, 2)), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(s2d.max_positions(xf)), np.asarray(max_pool2d(x, 2))
    )
    lo = _rand(11, (2, 4, 4, 3))
    np.testing.assert_array_equal(
        np.asarray(s2d.unpack(s2d.broadcast_positions(lo))),
        np.asarray(upsample_nearest(lo, 2)),
    )


def test_conv_transpose_to_frame_matches():
    from accunet_tpu.ops.conv import conv_transpose_2x2

    x = _rand(12, (2, 6, 6, 5))
    w = _rand(13, (2, 2, 5, 4)) * 0.3
    b = _rand(14, (4,))
    ref = conv_transpose_2x2(x, w, b)
    got = s2d.unpack(s2d.conv_transpose_2x2_to_frame(x, w, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_concat_channels():
    a = _rand(15, (2, 4, 4, 3))
    b = _rand(16, (2, 4, 4, 5))
    ref = jnp.concatenate([a, b], -1)
    got = s2d.unpack(s2d.concat_channels(s2d.pack(a), s2d.pack(b)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_hanc_mix_frame_matches():
    from accunet_tpu.ops.pallas.hanc import _xla_hanc_mix

    for k in (1, 2, 3):
        x = _rand(17, (2, 16, 16, 6))
        w = _rand(18, (6, 2 * k - 1, 4)) * 0.3
        b = _rand(19, (4,))
        ref = _xla_hanc_mix(x, w, b, k)
        got = s2d.unpack(s2d.hanc_mix_frame(s2d.pack(x), w, b, k))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("mode", ["full", "w"])
def test_mlfc_frame_lvl0_matches(mode):
    """full/w MLFC with the level-1 map in the s2d frame (ROOFLINE §17)
    equals the all-NHWC MLFC: identical param tree, outputs to fp tolerance.
    The w-mode blend scalar is perturbed from its 0 init so the merge conv
    actually contributes."""
    from accunet_tpu.nn.acc_blocks import MLFC

    filts = (8, 16, 32, 64)
    xs = [
        _rand(40, (2, 16, 16, 8)),
        _rand(41, (2, 8, 8, 16)),
        _rand(42, (2, 4, 4, 32)),
        _rand(43, (2, 2, 2, 64)),
    ]
    std = MLFC(filts, 1, mode)
    fast = MLFC(filts, 1, mode, layouts=("s2d", "nhwc", "nhwc", "nhwc"))
    var = std.init(jax.random.PRNGKey(0), *xs)
    var_fast = fast.init(
        jax.random.PRNGKey(0), s2d.pack(xs[0]), xs[1], xs[2], xs[3]
    )
    assert jax.tree.map(lambda a: a.shape, var) == jax.tree.map(
        lambda a: a.shape, var_fast
    )
    if mode == "w":
        var = jax.tree_util.tree_map_with_path(
            lambda p, a: jnp.full_like(a, 0.7)
            if getattr(p[-1], "key", None) == "W" else a, var,
        )
    ref = std.apply(var, *xs, train=False)
    got = fast.apply(var, s2d.pack(xs[0]), xs[1], xs[2], xs[3], train=False)
    np.testing.assert_allclose(
        np.asarray(s2d.unpack(got[0])), np.asarray(ref[0]), atol=3e-5
    )
    for g, r in zip(got[1:], ref[1:]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=3e-5)


@pytest.mark.parametrize("variant", ["lite", "base", "w"])
@pytest.mark.parametrize("lv", [1, 2, 3])
def test_acc_unet_s2d_path_matches(variant, lv):
    from accunet_tpu.models.acc_unet import ACCUNet

    x = _rand(20, (1, 32, 32, 3))
    std = ACCUNet(3, 1, n_filts=8, variant=variant)
    fast = ACCUNet(3, 1, n_filts=8, variant=variant, s2d_levels=lv)
    var = std.init(jax.random.PRNGKey(0), x)

    # identical parameter trees (the frame path mirrors every param)
    var_fast = fast.init(jax.random.PRNGKey(0), x)
    t1 = jax.tree.map(lambda a: a.shape, var)
    t2 = jax.tree.map(lambda a: a.shape, var_fast)
    assert t1 == t2

    ref = std.apply(var, x, train=False)
    got = fast.apply(var, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_hancblock_s2d_wide_interior_matches():
    """n_filts=32 -> interior e=96 (the production level-1 width)."""
    from accunet_tpu.nn.acc_blocks import HANCBlock

    x = _rand(30, (2, 16, 16, 32))
    std = HANCBlock(32, 32, k=3, inv_fctr=3)
    fast = HANCBlock(32, 32, k=3, inv_fctr=3, layout="s2d")
    var = std.init(jax.random.PRNGKey(0), x)
    var2 = fast.init(jax.random.PRNGKey(0), s2d.pack(x))
    assert jax.tree.map(lambda a: a.shape, var) == jax.tree.map(
        lambda a: a.shape, var2
    )
    ref = std.apply(var, x, train=False)
    got = s2d.unpack(fast.apply(var, s2d.pack(x), train=False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_hancblock_s2d_train_grads_match_f64():
    """Train-mode gradient parity of the frame path, asserted where it is
    DECIDABLE: one production-width HANCBlock in float64 (subprocess —
    jax_enable_x64 is process-global), grads vs the standard layout tight
    to 1e-9.

    Why not the whole model: std-vs-frame run legitimately different op
    orders, and the tiny-geometry train-mode BN chain amplifies rounding
    ~10x per block (measured in f64: first-block stats agree to ~1e-10,
    the 12-blocks-later output only to ~7e-3 — same growth from any 1-ulp
    seed, e.g. XLA fusion regrouping within ONE layout). Whole-model
    train-path claims are pinned by test_acc_unet_s2d_train_stats_match
    (stats, rtol 1e-3) + the eval parity suite; this test pins the
    fwd+bwd MATH of the frame ops themselves. Justifies BASELINE config 2
    running s2d_levels=2 in bench.py."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from accunet_tpu.nn.acc_blocks import HANCBlock
from accunet_tpu.ops import s2d

x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 32), jnp.float64)
g_out = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 32), jnp.float64)

std = HANCBlock(32, 32, k=3, inv_fctr=3, dtype=jnp.float64)
fast = HANCBlock(32, 32, k=3, inv_fctr=3, dtype=jnp.float64, layout="s2d")
var = std.init(jax.random.PRNGKey(0), x)
var = jax.tree.map(lambda a: a.astype(jnp.float64), var)

def run_std(p, x):
    out, upd = std.apply({"params": p, "batch_stats": var["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
    return (out * g_out).sum(), (out, upd["batch_stats"])

def run_fast(p, x):
    out, upd = fast.apply({"params": p, "batch_stats": var["batch_stats"]},
                          s2d.pack(x), train=True, mutable=["batch_stats"])
    return (s2d.unpack(out) * g_out).sum(), (s2d.unpack(out),
                                             upd["batch_stats"])

(l1, (o1, s1)), g1 = jax.jit(jax.value_and_grad(run_std, has_aux=True))(
    var["params"], x)
(l2, (o2, s2)), g2 = jax.jit(jax.value_and_grad(run_fast, has_aux=True))(
    var["params"], x)
np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-11)
jax.tree.map(lambda a, b: np.testing.assert_allclose(
    np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12), s1, s2)
jax.tree.map(lambda a, b: np.testing.assert_allclose(
    np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-9), g1, g2)
print("F64-BLOCK-GRAD-PARITY-OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd="/root/repo",
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0 and "F64-BLOCK-GRAD-PARITY-OK" in proc.stdout, (
        proc.stdout[-2000:] + proc.stderr[-2000:])


@pytest.mark.parametrize("variant", ["lite", "base", "w"])
def test_acc_unet_s2d_train_stats_match(variant):
    """BN batch statistics computed through the frame equal the standard
    ones — incl. the frame-layout full/w MLFC level-1 path (ROOFLINE §17.1),
    whose BNs reduce over frame positions."""
    from accunet_tpu.models.acc_unet import ACCUNet

    x = _rand(21, (2, 16, 16, 3))
    std = ACCUNet(3, 1, n_filts=8, variant=variant)
    fast = ACCUNet(3, 1, n_filts=8, variant=variant, s2d_levels=1)
    var = std.init(jax.random.PRNGKey(0), x)

    _, upd_std = std.apply(var, x, train=True, mutable=["batch_stats"])
    _, upd_fast = fast.apply(var, x, train=True, mutable=["batch_stats"])
    # atol 1e-3: at this deliberately tiny geometry train-mode BN amplifies
    # any fp reassociation ~10x per block (measured in f64, ROOFLINE §15.4);
    # the full/w variants' deep-decoder means (cnv72/cnv82) accumulate
    # ~3-4e-4 of that chaos while whole-model EVAL parity holds at 3e-5
    # (test_acc_unet_s2d_path_matches).
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-3
        ),
        upd_std["batch_stats"],
        upd_fast["batch_stats"],
    )
