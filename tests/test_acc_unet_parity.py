"""Golden-output parity: ACC-UNet family vs the reference PyTorch models.

Ports randomly-initialized reference weights into the flax models and checks
forward outputs agree to <=1e-5 (BASELINE.md numerical-fidelity target).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.models.acc_unet import ACCUNet
from accunet_tpu.port import import_torch_state
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def _build_ref(variant, n_channels, n_classes, n_filts, seed):
    import torch

    torch.manual_seed(seed)
    if variant == "base":
        mod = load_ref_module("ACC_UNet", "ACC_UNet")
        model = mod.ACC_UNet(n_channels, n_classes, n_filts=n_filts)
    elif variant == "lite":
        mod = load_ref_module("ACC_UNet", "ACC_UNet_lite")
        model = mod.ACC_UNet_Lite(n_channels, n_classes, n_filts=n_filts)
    else:
        mod = load_ref_module("ACC_UNet", "ACC_UNet_w")
        model = mod.ACC_UNet_W(n_channels, n_classes, n_filts=n_filts)
    randomize_bn_stats(model, seed)
    # give the W blend a non-trivial value
    for name, p in model.named_parameters():
        if name.endswith(".W"):
            with torch.no_grad():
                p.fill_(0.3)
    return model.eval()


@pytest.mark.quick
@pytest.mark.parametrize(
    "variant,n_classes", [("base", 1), ("lite", 1), ("w", 1), ("base", 3)]
)
def test_acc_unet_forward_parity(variant, n_classes):
    import torch

    n_channels, n_filts, hw = 3, 8, 32
    ref = _build_ref(variant, n_channels, n_classes, n_filts, seed=0)

    x = np.random.RandomState(1).rand(1, n_channels, hw, hw).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = ACCUNet(n_channels, n_classes, n_filts, variant=variant)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(template, ref.state_dict(), strict=True)
    got = model.apply(variables, xj, train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_acc_unet_train_step_runs():
    """Train-mode apply with mutable batch_stats + grad flows end to end."""
    model = ACCUNet(3, 1, 8)
    x = jnp.ones((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean((out - 0.5) ** 2), updates

    (loss, updates), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), grads, 0.0
    )
    assert float(gnorm) > 0
