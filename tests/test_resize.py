"""resize ops vs torch F.interpolate (CPU oracle) + fast-path equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from accunet_tpu.ops.resize import (
    _axis_weights,
    _resize_axis,
    resize_bilinear,
    upsample_bilinear_2x,
)


def _rand(seed, shape):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


@pytest.mark.quick
@pytest.mark.parametrize("hw", [(7, 5), (8, 8), (16, 12)])
def test_upsample2_matches_torch(hw):
    import torch
    import torch.nn.functional as F

    x = _rand(0, (2, *hw, 3))
    got = np.asarray(upsample_bilinear_2x(jnp.asarray(x)))
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            scale_factor=2, mode="bilinear", align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.quick
def test_fast_path_bitexact_vs_gather_path():
    """The shifted-slice 2x fast path must equal the generic gather+lerp
    form bit-for-bit (same product/sum ordering)."""
    x = jnp.asarray(_rand(1, (2, 9, 11, 4)))

    def gather_axis(x, axis, out_size):
        lo, hi, frac = _axis_weights(x.shape[axis], out_size, False)
        a = jnp.take(x, lo, axis=axis)
        b = jnp.take(x, hi, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        frac = frac.reshape(shape).astype(x.dtype)
        return a * (1 - frac) + b * frac

    fast = _resize_axis(_resize_axis(x, 1, 18, False), 2, 22, False)
    slow = gather_axis(gather_axis(x, 1, 18), 2, 22)
    assert (np.asarray(fast) == np.asarray(slow)).all()


@pytest.mark.quick
def test_resize_arbitrary_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    x = _rand(2, (1, 10, 14, 2))
    got = np.asarray(
        resize_bilinear(jnp.asarray(x), (17, 9), align_corners=True)
    )
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=(17, 9), mode="bilinear", align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.quick
def test_upsample2_to_frame_matches_unpacked():
    from accunet_tpu.ops import s2d
    from accunet_tpu.ops.resize import upsample2_to_frame

    x = jnp.asarray(_rand(3, (2, 6, 10, 8)))
    frame = upsample2_to_frame(x)
    ref = upsample_bilinear_2x(x)
    np.testing.assert_allclose(
        np.asarray(s2d.unpack(frame)), np.asarray(ref), atol=1e-6
    )
