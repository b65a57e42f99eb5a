"""Golden-output parity: UNeXt vs the reference PyTorch model."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

import jax
import jax.numpy as jnp

from accunet_tpu.models.unext import UNext
from accunet_tpu.port import import_torch_state
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def test_unext_forward_parity():
    import torch

    mod = load_ref_module("Experiments/nets", "UNext")
    torch.manual_seed(0)
    ref = mod.UNext(n_channels=3, n_classes=1, img_size=64).eval()
    randomize_bn_stats(ref, 0)

    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = UNext(3, 1)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(template, ref.state_dict(), strict=True)
    got = model.apply(variables, xj, train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
