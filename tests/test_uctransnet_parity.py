"""Golden-output parity: UCTransNet (+ UNet_base) vs the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.models.uctransnet import UCTransNet
from accunet_tpu.models.unet import UNetBase
from accunet_tpu.port import import_torch_state
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def test_unet_base_parity():
    import torch

    mod = load_ref_module("Experiments", "nets.UNet_base")
    torch.manual_seed(0)
    ref = mod.UNet_base(n_channels=3, n_classes=1).eval()
    randomize_bn_stats(ref, 0)

    x = np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = UNetBase(3, 1)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(template, ref.state_dict(), strict=True)
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_uctransnet_parity():
    import torch
    import ml_collections

    mod = load_ref_module("Experiments", "nets.UCTransNet")

    cfg = ml_collections.ConfigDict()
    cfg.transformer = ml_collections.ConfigDict()
    cfg.KV_size = 16 + 32 + 64 + 128
    cfg.transformer.num_heads = 4
    cfg.transformer.num_layers = 2
    cfg.expand_ratio = 4
    cfg.transformer.embeddings_dropout_rate = 0.0
    cfg.transformer.attention_dropout_rate = 0.0
    cfg.transformer.dropout_rate = 0.0
    cfg.patch_sizes = [16, 8, 4, 2]
    cfg.base_channel = 16
    cfg.n_classes = 1

    torch.manual_seed(0)
    ref = mod.UCTransNet(cfg, n_channels=3, n_classes=1, img_size=64).eval()
    randomize_bn_stats(ref, 0)

    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = UCTransNet(3, 1, img_size=64, base_channel=16, num_layers=2)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(template, ref.state_dict(), strict=True)
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
