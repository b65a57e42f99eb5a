"""Golden-output parity: TransUNet (R50-ViT hybrid) vs the reference."""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.models.transunet import TransUNet
from accunet_tpu.port import import_torch_state
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def _rename(computed: str) -> str:
    """Map flax-derived names onto the reference VisionTransformer keys."""
    n = computed
    n = re.sub(r"^hybrid_model\.root_conv\.", "hybrid_model.root.conv.", n)
    n = re.sub(r"^hybrid_model\.root_gn\.", "hybrid_model.root.gn.", n)
    n = re.sub(
        r"^hybrid_model\.block(\d)_unit(\d+)\.", r"hybrid_model.body.block\1.unit\2.", n
    )
    if n.startswith("hybrid_model."):
        n = "transformer.embeddings." + n
    if n.startswith(("patch_embeddings.", "position_embeddings")):
        n = "transformer.embeddings." + n
    n = re.sub(r"^layer\.(\d+)\.attn_(query|key|value|out)\.", r"transformer.encoder.layer.\1.attn.\2.", n)
    n = re.sub(r"^layer\.(\d+)\.ffn_fc(\d)\.", r"transformer.encoder.layer.\1.ffn.fc\2.", n)
    n = re.sub(r"^layer\.(\d+)\.", r"transformer.encoder.layer.\1.", n)
    n = re.sub(r"^encoder_norm\.", "transformer.encoder.encoder_norm.", n)
    n = re.sub(r"^conv_more\.", "decoder.conv_more.", n)
    n = re.sub(r"^blocks\.", "decoder.blocks.", n)
    n = re.sub(r"^segmentation_head\.", "segmentation_head.0.", n)
    return n


def test_transunet_hybrid_parity():
    import torch

    mod = load_ref_module("Experiments", "nets.vit_seg_modelling")
    cfg = mod.CONFIGS["R50-ViT-B_16"]
    cfg.n_classes = 1
    cfg.transformer.num_layers = 2
    cfg.pretrained_path = None
    cfg.patches.grid = (4, 4)  # img 64 → 64/16/4 = 1x1 patches over resnet out

    torch.manual_seed(0)
    ref = mod.VisionTransformer(cfg, img_size=64).eval()
    randomize_bn_stats(ref, 0)

    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = TransUNet(3, 1, img_size=64, num_layers=2, final_sigmoid=False)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(
        template, ref.state_dict(), rename=_rename, strict=True
    )
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_transunet_fkan_parity():
    """TransUNet_KAN_fJNB (fractional-Jacobi KAN FFN) vs the reference."""
    import torch

    mod = load_ref_module("Experiments", "nets.vit_seg_modeling_KAN_fJNB")
    cfg = mod.CONFIGS["R50-ViT-B_16"]
    cfg.n_classes = 1
    cfg.transformer.num_layers = 2
    cfg.pretrained_path = None
    cfg.patches.grid = (4, 4)
    cfg.use_kan_ffn = True

    torch.manual_seed(0)
    ref = mod.VisionTransformer(cfg, img_size=64).eval()
    randomize_bn_stats(ref, 0)

    x = np.random.RandomState(2).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    model = TransUNet(
        3, 1, img_size=64, num_layers=2, mlp_type="fkan", final_sigmoid=False
    )
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj, train=False)

    def rename(n):
        n = re.sub(r"\.ffn_pre_norm\.", ".ffn.pre_norm.", "." + n)[1:] \
            if n.find("ffn_pre_norm") >= 0 else n
        n = _rename(n)
        n = n.replace(".ffn_kan.", ".ffn.kan.")
        n = n.replace(".ffn.pre_norm.", ".ffn.pre_norm.")
        return n

    variables = import_torch_state(
        template, ref.state_dict(), rename=rename, strict=True
    )
    got = np.transpose(np.asarray(model.apply(variables, xj, train=False)), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
