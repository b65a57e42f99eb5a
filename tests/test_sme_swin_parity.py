"""Golden-output parity: SMESwinUnet (Swin core + mcct channel transformer +
external attention over skips) vs the reference.

The reference computes its superpixel-boundary support image on the host via
skimage slic+mark_boundaries (swin_transformer_unet_skip_expand_decoder_sys
.py:806-809); this framework replaces that with an in-graph Sobel boundary
overlay (models/sme_swin_unet.py:47-64 — the documented TPU-native
substitution). For the parity test skimage is stubbed so BOTH sides consume
the same (Sobel) support image, making everything else — Swin encoder,
mcct, EA, decoder — a strict numeric comparison.
"""

import re
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.models.sme_swin_unet import SMESwinUnet, boundary_support_image
from accunet_tpu.port import import_torch_state
from tests.torch_ref import REF, _install_fake, _install_stub_deps, to_nhwc


def _install_skimage_stub():
    if "skimage" in sys.modules:
        return

    def slic(img, n_segments=100, compactness=10):
        return np.zeros(img.shape[:2], np.int64)

    def mark_boundaries(img, seg):
        out = boundary_support_image(jnp.asarray(img, jnp.float32)[None])[0]
        return np.asarray(out, np.float64)

    sk = _install_fake("skimage")
    seg = _install_fake(
        "skimage.segmentation", {"slic": slic, "mark_boundaries": mark_boundaries}
    )
    sk.segmentation = seg


def _rename(n: str) -> str:
    n = re.sub(r"^layers_(\d)_blocks\.", r"layers.\1.blocks.", n)
    n = re.sub(r"^layers_(\d)_downsample\.", r"layers.\1.downsample.", n)
    n = re.sub(r"^layers_up_(\d)_blocks\.", r"layers_up.\1.blocks.", n)
    n = re.sub(r"^layers_up_(\d)_upsample\.", r"layers_up.\1.upsample.", n)
    n = re.sub(r"^layers_up_0\.", "layers_up.0.", n)
    n = n.replace("patch_embed_proj.", "patch_embed.proj.")
    n = n.replace("patch_embed_norm.", "patch_embed.norm.")
    n = n.replace("mlp_fc1.", "mlp.fc1.").replace("mlp_fc2.", "mlp.fc2.")
    return "swin_unet." + n


def test_sme_swin_unet_parity():
    import importlib

    import torch

    _install_stub_deps()
    _install_skimage_stub()
    for root in (f"{REF}/Experiments",):
        if root not in sys.path:
            sys.path.insert(0, root)
    try:
        mod = importlib.import_module("nets.SMESwinUnet")
    except Exception as e:
        pytest.skip(f"cannot import reference SMESwinUnet: {e}")

    torch.manual_seed(0)
    ref = mod.SMESwinUnet(n_channels=3, n_classes=1).eval()

    x = np.random.RandomState(1).rand(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = SMESwinUnet(3, 1, img_size=224, final_sigmoid=True)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(
        template, ref.state_dict(), rename=_rename, strict=True
    )
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)
