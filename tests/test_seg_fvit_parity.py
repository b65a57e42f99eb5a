"""WHOLE-MODEL golden parity: SegViT_fKAN vs the reference
(/root/reference/Experiments/nets/seg_fViT.py:12-284) — R50-ViT hybrid stem
with fKAN MLP transformer blocks, tokens_to_map bottleneck, res_proj skips,
bilinear skip alignment, 2D UNETR decoder. Upgrades the seg_fViT row from
'structural' to 'parity' (VERDICT r2 missing #2).

Needs the real vendored MONAI UNETR blocks (2D here) — reuses the fixture
from test_flagship_assembly_parity.py.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.port import import_torch_state
from tests.test_flagship_assembly_parity import real_monai  # noqa: F401
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def _rename(n: str) -> str:
    # ViT/hybrid part (same keys as TransUNet's VisionTransformer, nested
    # under `transformer.`)
    n = re.sub(r"^hybrid_model\.root_conv\.", "hybrid_model.root.conv.", n)
    n = re.sub(r"^hybrid_model\.root_gn\.", "hybrid_model.root.gn.", n)
    n = re.sub(
        r"^hybrid_model\.block(\d)_unit(\d+)\.", r"hybrid_model.body.block\1.unit\2.", n
    )
    if n.startswith("hybrid_model."):
        n = "transformer.embeddings." + n
    if n.startswith(("patch_embeddings.", "position_embeddings")):
        n = "transformer.embeddings." + n
    n = re.sub(r"^layer\.(\d+)\.attn_(query|key|value|out)\.",
               r"transformer.encoder.layer.\1.attn.\2.", n)
    n = n.replace(".ffn_kan.", ".ffn.kan.")
    n = n.replace(".ffn_pre_norm.", ".ffn.pre_norm.")
    n = re.sub(r"^layer\.(\d+)\.", r"transformer.encoder.layer.\1.", n)
    n = re.sub(r"^encoder_norm\.", "transformer.encoder.encoder_norm.", n)
    # UNETR decoder: MONAI Convolution wrapper nests one more '.conv' —
    # scoped to the UNETR modules (the ResNet units also have conv1/conv2/3)
    if re.match(r"^(encoder\d|decoder\d|out)\.", n):
        n = re.sub(r"\.(conv1|conv2|conv3|transp_conv)\.(weight|bias)$",
                   r".\1.conv.\2", n)
        n = re.sub(r"^out\.conv\.(weight|bias)$", r"out.conv.conv.\1", n)
    return n


def test_seg_fvit_whole_model_parity(real_monai):
    import torch

    mod = load_ref_module("Experiments", "nets.seg_fViT")
    vit_mod = load_ref_module("Experiments", "nets.vit_seg_modeling_KAN_fJNB")
    cfg = vit_mod.CONFIGS["R50-ViT-B_16"]
    cfg.transformer.num_layers = 2
    cfg.pretrained_path = None
    cfg.patches.grid = (4, 4)  # img 64 -> 64/16 = 4x4 resnet grid, 1x1 patch

    torch.manual_seed(0)
    ref = mod.SegViT_fKAN(
        in_chans=1, out_chans=1, img_size=64, feat_size=(8, 16, 24, 32)
    ).eval()
    randomize_bn_stats(ref, 0)

    x = np.random.RandomState(3).rand(1, 1, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    from accunet_tpu.models.seg_fvit import SegViTfKAN

    model = SegViTfKAN(
        in_chans=1, out_chans=1, img_size=64, num_layers=2,
        feat_size=(8, 16, 24, 32),
    )
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(
        template, ref.state_dict(), rename=_rename, strict=True
    )
    got = np.transpose(
        np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2)
    )
    assert got.shape == want.shape
    # 5e-5 abs: f32 accumulation noise through the deepest stack in the zoo
    # (R50 stem + ViT + UNETR chain), same tolerance as the SME/SpatialMamba
    # whole-model parities
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
