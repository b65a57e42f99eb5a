"""Golden-output parity: MultiResUNet and UNet++ vs the reference."""

import numpy as np

import jax
import jax.numpy as jnp

from accunet_tpu.models.multires_unet import MultiResUnet
from accunet_tpu.models.unetpp import UNetPlusPlus
from accunet_tpu.port import import_torch_state
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def _parity(ref, model, x):
    import torch

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(template, ref.state_dict(), strict=True)
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_multires_unet_parity():
    import torch

    mod = load_ref_module("Experiments", "nets.MResUNet1")
    torch.manual_seed(0)
    ref = mod.MultiResUnet(3, 1, nfilt=8).eval()
    randomize_bn_stats(ref, 0)
    x = np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32)
    _parity(ref, MultiResUnet(3, 1, nfilt=8), x)


def test_unetpp_parity():
    import torch

    mod = load_ref_module("Experiments", "nets.Unetpp")
    torch.manual_seed(0)
    ref = mod.UNetPlusPlus(3, 1).eval()
    randomize_bn_stats(ref, 0)
    x = np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32)
    _parity(ref, UNetPlusPlus(3, 1), x)
