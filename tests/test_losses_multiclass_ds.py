"""multiclass_dice_ce must apply deep-supervision aux-head weighting like the
binary ds_adapter (ADVICE r2: aux heads were silently discarded when training
Segmamba *_ds variants with --n-classes>1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.train import losses as L

pytestmark = pytest.mark.quick


def _data(k=4, hw=16, b=2, seed=0):
    rs = np.random.RandomState(seed)
    main = jnp.asarray(rs.randn(b, hw, hw, k).astype(np.float32))
    ds1 = jnp.asarray(rs.randn(b, hw // 2, hw // 2, k).astype(np.float32))
    ds2 = jnp.asarray(rs.randn(b, hw // 4, hw // 4, k).astype(np.float32))
    tgt = jnp.asarray(rs.randint(0, k, (b, hw, hw)).astype(np.float32))
    return main, ds1, ds2, tgt


def test_ds_tuple_weighting_matches_adapter():
    main, ds1, ds2, tgt = _data()
    got = L.multiclass_dice_ce((main, ds1, ds2), tgt)
    want = L.ds_adapter((main, ds1, ds2), tgt, base_loss=L.multiclass_dice_ce)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    # aux heads actually contribute: perturbing ds1 changes the loss (one
    # channel only — a constant shift over all logits is softmax-invariant)
    got2 = L.multiclass_dice_ce((main, ds1.at[..., 0].add(3.0), ds2), tgt)
    assert abs(float(got2) - float(got)) > 1e-4


def test_ds_tuple_gradients_reach_aux_heads():
    main, ds1, ds2, tgt = _data(seed=1)

    g = jax.grad(lambda p: L.multiclass_dice_ce((p[0], p[1], p[2]), tgt))(
        (main, ds1, ds2)
    )
    assert all(float(jnp.abs(x).max()) > 0 for x in g)


def test_plain_array_unchanged():
    main, _, _, tgt = _data(seed=2)
    a = L.multiclass_dice_ce(main, tgt)
    b = L.multiclass_dice_ce((main,), tgt)  # single-head tuple == main only
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
