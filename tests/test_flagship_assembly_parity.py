"""WHOLE-MODEL golden parity for the flagship SegMamba assembly vs the
PyTorch reference (VERDICT r2 missing #1): the 1,451-LoC
segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba.py assembly
(:1109-1451) — MambaEncoder, 5 UnetrBasicBlocks, 5 HSLCA text-fusion sites,
UNETR decoder chain, FinalKANRefine3D, main head + all 3 DS heads — at a tiny
feat_size, with fixed fake text embeddings on both sides and the python-loop
scan oracles from tests/test_flagship_blocks_parity.py.

Unlike the sub-block tests this needs the REAL vendored MONAI UNETR blocks
(/root/reference/Experiments/nets/monai/networks/blocks/{dynunet_block,
unetr_block}.py), not the import stubs, so the fixture below loads them and
swaps them into the already-imported flagship module namespace.
"""

from __future__ import annotations

import importlib
import re
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_flagship_blocks_parity import ref_mod  # noqa: F401 (fixture)
from tests.torch_ref import REF, from_nhwc, to_nhwc

NETS = f"{REF}/Experiments/nets"


@pytest.fixture(scope="module")
def real_monai():
    """Import the real vendored MONAI UNETR blocks, displacing the stub
    modules test_flagship_blocks_parity.py installs when it runs first."""
    pytest.importorskip("torch")
    if NETS not in sys.path:
        sys.path.insert(0, NETS)
    mon = sys.modules.get("monai")
    if mon is not None and not getattr(mon, "__file__", None):
        for k in [k for k in sys.modules
                  if k == "monai" or k.startswith("monai.")]:
            del sys.modules[k]
    try:
        dyn = importlib.import_module("monai.networks.blocks.dynunet_block")
        unetr = importlib.import_module("monai.networks.blocks.unetr_block")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"vendored monai unavailable: {e}")
    return dyn, unetr


def _fake_text_encoder(torch, emb: np.ndarray):
    class FakeClinicalTextEncoder(torch.nn.Module):
        """profile_model.py:88-104-style stub: fixed (B,T,768) embeddings."""

        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, text):
            return torch.from_numpy(emb)

    return FakeClinicalTextEncoder


def _assembly_rename(n: str, stage_wrap: bool = True) -> str:
    """flax-computed torch key -> actual reference key for the assembly."""
    n = n.replace("final_refine_kan_mlp.", "final_refine.kan_mlp.")
    n = re.sub(r"^vit\.stem\.", "vit.downsample_layers.0.0.", n)
    n = re.sub(r"^vit\.downsample\.(\d)\.", r"vit.downsample_layers.\1.1.", n)
    if stage_wrap:
        # SpatialMambaSliceBlock wraps the block (flagship :895-925); the tmb
        # rungs put TransformerMambaBlock directly in the stage Sequential
        n = re.sub(r"^vit\.stages\.(\d)\.(\d)\.", r"vit.stages.\1.\2.block.", n)
    # CA rung: CAB3D stores its convs in a Sequential `cab` and the channel
    # attention in `attention` (…_gsc_CA.py:390-460)
    n = re.sub(r"\.cab\.conv1\.(weight|bias)$", r".cab.cab.0.\1", n)
    n = re.sub(r"\.cab\.conv2\.(weight|bias)$", r".cab.cab.2.\1", n)
    n = re.sub(r"\.cab\.ca\.squeeze\.(weight|bias)$",
               r".cab.cab.3.attention.1.\1", n)
    n = re.sub(r"\.cab\.ca\.expand\.(weight|bias)$",
               r".cab.cab.3.attention.3.\1", n)
    # VSS rung: TokenVSSM wraps a VSSMBlock level (…_gsc_vss.py:593-720)
    n = re.sub(r"\.vssm\.(top_|bottom_|out_linear)", r".vssm.vssm_block.\1", n)
    # SPATIAL rung: the mixer's fusion attr is `spatial_fusion`
    # (…_ds_SPATIAL.py:243)
    n = n.replace(".spatial_fusion_mod.", ".spatial_fusion.")
    # MONAI get_conv_layer returns a Convolution wrapper Sequential: the
    # torch key nests one more '.conv' (dynunet_block.py get_conv_layer).
    # Scoped to the UNETR modules — other blocks (e.g. CAB) have their own
    # conv1/conv2 that must NOT be rewritten.
    if re.match(r"^(encoder\d|decoder\d|out|ds_head\d)\.", n):
        n = re.sub(r"\.(conv1|conv2|conv3|transp_conv)\.(weight|bias)$",
                   r".\1.conv.\2", n)
        n = re.sub(r"^(out|ds_head\d)\.conv\.(weight|bias)$",
                   r"\1.conv.conv.\2", n)
    return n


def _flagship_rename(n: str) -> str:
    return _assembly_rename(n, stage_wrap=True)


def test_flagship_whole_model_parity(real_monai, ref_mod, monkeypatch):
    import torch

    dyn, unetr = real_monai
    # the flagship module was imported (possibly) against stub classes —
    # its __init__ resolves these names from module globals at call time
    monkeypatch.setattr(ref_mod, "UnetOutBlock", dyn.UnetOutBlock)
    monkeypatch.setattr(ref_mod, "UnetrBasicBlock", unetr.UnetrBasicBlock)
    monkeypatch.setattr(ref_mod, "UnetrUpBlock", unetr.UnetrUpBlock)

    text_emb = np.random.RandomState(42).rand(1, 5, 768).astype(np.float32)
    monkeypatch.setattr(ref_mod, "ClinicalTextEncoder",
                        _fake_text_encoder(torch, text_emb))

    torch.manual_seed(0)
    # feat_size[0] must be 48: the reference hardcodes the main head as
    # UnetOutBlock(in_channels=48) (flagship :1274)
    ref = ref_mod.SegMamba(
        in_chans=3, out_chans=1, depths=[1, 1, 1, 1],
        feat_size=[48, 16, 24, 32], hidden_size=40,
    ).eval()

    captured = {}
    for nm in ("ds_head1", "ds_head2", "ds_head3"):
        getattr(ref, nm).register_forward_hook(
            lambda m, i, o, nm=nm: captured.__setitem__(nm, o)
        )

    x = np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) - 0.5
    with torch.no_grad():
        want_main = ref(torch.from_numpy(x), ["fake prompt"])
        # the shipped forward computes the DS heads but returns only main
        # (flagship :1440-1451); replicate its own upsample lines (:1410-1427)
        tsize = (1,) + tuple(want_main.shape[2:])
        want_ds = [
            torch.nn.functional.interpolate(
                captured[f"ds_head{i}"], size=tsize, mode="trilinear",
                align_corners=False,
            ).squeeze(2).numpy()
            for i in (1, 2, 3)
        ]
        want_main = want_main.numpy()

    from accunet_tpu.models.segmamba import build_segmamba
    from accunet_tpu.port import import_torch_state

    kwargs = dict(in_chans=3, out_chans=1, depths=(1, 1, 1, 1),
                  feat_size=(48, 16, 24, 32), hidden_size=40)
    model = build_segmamba(
        "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba", **kwargs
    )
    xj = jnp.asarray(to_nhwc(x))
    tj = jnp.asarray(text_emb)
    template = model.init(jax.random.PRNGKey(0), xj, tj)
    variables = import_torch_state(
        template, ref.state_dict(), rename=_flagship_rename, strict=True
    )

    got_main = from_nhwc(np.asarray(model.apply(variables, xj, tj)))
    np.testing.assert_allclose(got_main, want_main, atol=2e-5, rtol=1e-4)

    # DS heads: same params, ds_in_output=True returns (main, ds1, ds2, ds3)
    model_ds = build_segmamba(
        "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba",
        ds_in_output=True, **kwargs,
    )
    outs = model_ds.apply(variables, xj, tj)
    assert len(outs) == 4
    np.testing.assert_allclose(
        from_nhwc(np.asarray(outs[0])), want_main, atol=2e-5, rtol=1e-4
    )
    for got_ds, want in zip(outs[1:], want_ds):
        np.testing.assert_allclose(
            from_nhwc(np.asarray(got_ds)), want, atol=2e-5, rtol=1e-4
        )


@pytest.mark.parametrize(
    "key,ref_name",
    [
        ("Segmamba_hybrid_gsc_KAN_PE_ds", "nets.segmamba_hybrid_gsc_KAN_PE_ds"),
        ("Segmamba_hybrid_gsc_KAN_PE_ds_flip",
         "nets.segmamba_hybrid_gsc_KAN_PE_ds_flip"),
    ],
)
def test_kan_pe_rung_whole_model_parity(real_monai, ref_mod, monkeypatch,
                                        key, ref_name):
    """Whole-model parity for the CPU-runnable non-text hybrid rungs
    (…_KAN_PE_ds.py:751-1080 and the _flip bidirectional variant, which is
    the one reference assembly that RETURNS its DS tuple, _flip:1097)."""
    import torch

    rung = importlib.import_module(ref_name)
    dyn, unetr = real_monai
    monkeypatch.setattr(rung, "UnetOutBlock", dyn.UnetOutBlock)
    monkeypatch.setattr(rung, "UnetrBasicBlock", unetr.UnetrBasicBlock)
    monkeypatch.setattr(rung, "UnetrUpBlock", unetr.UnetrUpBlock)

    torch.manual_seed(0)
    ref = rung.SegMamba(
        in_chans=3, out_chans=1, depths=[1, 1, 1, 1],
        feat_size=[48, 16, 24, 32], hidden_size=40,
    ).eval()

    captured = {}
    for nm in ("ds_head1", "ds_head2", "ds_head3"):
        getattr(ref, nm).register_forward_hook(
            lambda m, i, o, nm=nm: captured.__setitem__(nm, o)
        )

    x = np.random.RandomState(11).rand(1, 3, 32, 32).astype(np.float32) - 0.5
    with torch.no_grad():
        out = ref(torch.from_numpy(x))
        if isinstance(out, tuple):  # _flip ships the DS return uncommented
            want_main = out[0].numpy()
            want_ds = [o.numpy() for o in out[1:]]
        else:
            want_main = out
            tsize = (1,) + tuple(want_main.shape[2:])
            want_ds = [
                torch.nn.functional.interpolate(
                    captured[f"ds_head{i}"], size=tsize, mode="trilinear",
                    align_corners=False,
                ).squeeze(2).numpy()
                for i in (1, 2, 3)
            ]
            want_main = want_main.numpy()

    from accunet_tpu.models.segmamba import build_segmamba
    from accunet_tpu.port import import_torch_state

    kwargs = dict(in_chans=3, out_chans=1, depths=(1, 1, 1, 1),
                  feat_size=(48, 16, 24, 32), hidden_size=40)
    model = build_segmamba(key, ds_in_output=True, **kwargs)
    xj = jnp.asarray(to_nhwc(x))
    template = model.init(jax.random.PRNGKey(0), xj)
    variables = import_torch_state(
        template, ref.state_dict(),
        rename=lambda n: _assembly_rename(n, stage_wrap=False), strict=True,
    )

    outs = model.apply(variables, xj)
    assert len(outs) == 4
    np.testing.assert_allclose(
        from_nhwc(np.asarray(outs[0])), want_main, atol=2e-5, rtol=1e-4
    )
    for got_ds, want in zip(outs[1:], want_ds):
        np.testing.assert_allclose(
            from_nhwc(np.asarray(got_ds)), want, atol=2e-5, rtol=1e-4
        )
