"""Golden-output parity: U-KAN vs the reference (includes B-spline KANLinear
numerics end-to-end)."""

import numpy as np

import jax
import jax.numpy as jnp

from accunet_tpu.models.u_kan import UKAN
from accunet_tpu.port import import_torch_state
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def test_ukan_parity():
    import torch

    mod = load_ref_module("Experiments", "nets.archs.u_kan")
    torch.manual_seed(0)
    ref = mod.UKAN(n_classes=1, n_channels=3, img_size=64, embed_dims=[32, 40, 64]).eval()
    randomize_bn_stats(ref, 0)

    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = UKAN(3, 1, embed_dims=(32, 40, 64))
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(template, ref.state_dict(), strict=True)
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
