"""Port a reference-format .pth.tar (as written by train_model.py:125-145)
through load_torch_checkpoint + import_torch_state and verify the JAX model
reproduces the torch model's outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from accunet_tpu.models.unet import UNetBase
from accunet_tpu.port import import_torch_state, load_torch_checkpoint
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def test_pth_tar_roundtrip(tmp_path):
    import torch

    mod = load_ref_module("Experiments", "nets.UNet_base")
    torch.manual_seed(0)
    ref = mod.UNet_base(n_channels=3, n_classes=1).eval()
    randomize_bn_stats(ref, 0)

    # save exactly like the reference harness (incl. DataParallel-style
    # 'module.' prefixes, which the loader must strip — test_model.py:221-224)
    state = {"module." + k: v for k, v in ref.state_dict().items()}
    path = tmp_path / "best_model-UNet_base.pth.tar"
    torch.save({"epoch": 7, "state_dict": state, "val_dice": 0.9}, str(path))

    x = np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = UNetBase(3, 1)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(
        template, load_torch_checkpoint(str(path)), strict=True
    )
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
