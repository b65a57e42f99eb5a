"""Golden-output parity: TinyU-Net (exercises bicubic resize exactness)."""

import numpy as np

import jax
import jax.numpy as jnp

from accunet_tpu.models.tiny_unet import TinyUNet
from accunet_tpu.port import import_torch_state
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def test_bicubic_matches_torch():
    import torch
    import torch.nn.functional as F

    from accunet_tpu.ops.resize import resize_bicubic

    x = np.random.RandomState(0).rand(1, 3, 9, 9).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bicubic", align_corners=False
    ).numpy()
    got = resize_bicubic(jnp.asarray(to_nhwc(x)), (18, 18), align_corners=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_tiny_unet_parity():
    import torch

    mod = load_ref_module("Experiments", "nets.archs.TinyU_Net")
    torch.manual_seed(0)
    ref = mod.TinyUNet(in_channels=3, num_classes=2).eval()
    randomize_bn_stats(ref, 0)

    x = np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = TinyUNet(3, 2)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(
        template,
        ref.state_dict(),
        rename=lambda n: n.replace("_cmrf.", ".cmrf."),
        strict=True,
    )
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
