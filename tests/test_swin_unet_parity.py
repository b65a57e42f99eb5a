"""Golden-output parity: Swin-Unet vs the reference SwinTransformerSys."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.models.swin_unet import SwinUnet
from accunet_tpu.port import import_torch_state
from tests.torch_ref import load_ref_module, to_nhwc


def _rename(n: str) -> str:
    n = re.sub(r"^layers_(\d)_blocks\.", r"layers.\1.blocks.", n)
    n = re.sub(r"^layers_(\d)_downsample\.", r"layers.\1.downsample.", n)
    n = re.sub(r"^layers_up_(\d)_blocks\.", r"layers_up.\1.blocks.", n)
    n = re.sub(r"^layers_up_(\d)_upsample\.", r"layers_up.\1.upsample.", n)
    n = n.replace("patch_embed_proj.", "patch_embed.proj.")
    n = n.replace("patch_embed_norm.", "patch_embed.norm.")
    n = n.replace("mlp_fc1.", "mlp.fc1.").replace("mlp_fc2.", "mlp.fc2.")
    return n


def test_swin_unet_parity():
    import torch

    mod = load_ref_module("Experiments", "nets.SwinUnet")
    torch.manual_seed(0)
    ref = mod.SwinTransformerSys(
        img_size=224, embed_dim=24, num_classes=1, depths=[2, 2, 2, 2],
        depths_decoder=[2, 2, 2, 1], num_heads=[3, 6, 12, 24],
        drop_path_rate=0.0,
    ).eval()

    x = np.random.RandomState(1).rand(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = SwinUnet(3, 1, img_size=224, embed_dim=24, final_sigmoid=True)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(
        template, ref.state_dict(), rename=_rename, strict=True
    )
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
