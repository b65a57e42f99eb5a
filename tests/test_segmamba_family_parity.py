"""WHOLE-MODEL golden parity across the segmamba hybrid FAMILY — every
CPU-runnable reference assembly (the ~28-file ablation ladder the registry
parameterizes), not just the flagship: tmb-block rungs with their
CA/SWAttn/VSS/rm_fkan/EffKan/MLP_PE/SPATIAL/flip axes, the text-fusion
ladder (film / CrossAttn / TGDC / HSLCA / Dual), and the SpatialMamba-block
combos. Reuses the stub/oracle machinery from test_flagship_blocks_parity
and the real vendored MONAI blocks from test_flagship_assembly_parity.

Each case: load the reference file, build at feat_size=(48,16,24,32) (the
head hardcodes in_channels=48, e.g. _KAN_PE_ds.py:888), port weights
strictly, compare main output (+ the DS tuple where the file ships it
uncommented) at 32x32.
"""

from __future__ import annotations

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_flagship_assembly_parity import (  # noqa: F401 (fixtures)
    _assembly_rename,
    _fake_text_encoder,
    real_monai,
    ref_mod,
)
from tests.torch_ref import from_nhwc, to_nhwc

KW = dict(in_chans=3, out_chans=1, depths=(1, 1, 1, 1), hidden_size=40)

# registry key -> (reference module, needs_text)
CASES = {
    "Segmamba_hybrid": ("nets.segmamba_hybrid", False),
    "Segmamba_hybrid_gsc": ("nets.segmamba_hybrid_gsc", False),
    "Segmamba_hybrid_gsc_CA": ("nets.segmamba_hybrid_gsc_CA", False),
    "Segmamba_hybrid_gsc_VSS": ("nets.segmamba_hybrid_gsc_vss", False),
    "Segmamba_hybrid_gsc_rm_fkan": ("nets.segmamba_hybrid_gsc_rm_fkan", False),
    "Segmamba_hybrid_gsc_ds": ("nets.segmamba_hybrid_gsc_ds", False),
    "Segmamba_hybrid_gsc_KAN_PE": ("nets.segmamba_hybrid_gsc_KAN_PE", False),
    "segmamba_hybrid_gsc_KAN_PE_EffKan":
        ("nets.segmamba_hybrid_gsc_KAN_PE_EffKan", False),
    "Segmamba_hybrid_gsc_KAN_PE_rm_fkan":
        ("nets.segmamba_hybrid_gsc_KAN_PE_rm_fkan", False),
    "Segmamba_hybrid_gsc_KAN_PE_rm_fkan_ds":
        ("nets.segmamba_hybrid_gsc_KAN_PE_rm_fkan_ds", False),
    "Segmamba_hybrid_gsc_KAN_PE_ds_SPATIAL":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_SPATIAL", False),
    "Segmamba_hybrid_gsc_MLP_PE_ds":
        ("nets.segmamba_hybrid_gsc_MLP_PE_ds", False),
    "Segmamba_hybrid_gsc_KAN_PE_ds_text":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_text", True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn", True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_TGDC":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_TGDC", True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA", True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_Dual":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_Dual", True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_SpatialMamba":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_SpatialMamba", True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_Dual_SpatialMamba":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_Dual_SpatialMamba", True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba_KAN":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba_KAN",
         True),
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba_no_text":
        ("nets.segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba_no_text",
         False),
}


def _run_case(key, ref_name, needs_text, real_monai_blocks, monkeypatch,
              atol=5e-5, feat_size=(48, 16, 24, 32), pooled_text=False,
              img=32):
    import torch

    from accunet_tpu.models.segmamba import VARIANTS, build_segmamba
    from accunet_tpu.port import import_torch_state

    rung = importlib.import_module(ref_name)
    dyn, unetr = real_monai_blocks
    for nm, cls in (("UnetOutBlock", dyn.UnetOutBlock),
                    ("UnetrBasicBlock", unetr.UnetrBasicBlock),
                    ("UnetrUpBlock", unetr.UnetrUpBlock)):
        if hasattr(rung, nm):
            monkeypatch.setattr(rung, nm, cls)

    text_emb = np.random.RandomState(17).rand(1, 5, 768).astype(np.float32)
    if hasattr(rung, "ClinicalTextEncoder"):
        # the film rung's encoder mean-pools to (B,768) (…_ds_text.py:29-53);
        # the flax SkipFiLM pools its (B,T,768) input the same way
        ref_emb = text_emb.mean(axis=1) if pooled_text else text_emb
        monkeypatch.setattr(rung, "ClinicalTextEncoder",
                            _fake_text_encoder(torch, ref_emb))

    torch.manual_seed(0)
    ref = rung.SegMamba(
        in_chans=3, out_chans=1, depths=[1, 1, 1, 1],
        feat_size=list(feat_size), hidden_size=40,
    ).eval()

    variant = VARIANTS[key]
    has_ds = variant.get("deep_supervision", True)
    captured = {}
    if has_ds:
        for nm in ("ds_head1", "ds_head2", "ds_head3"):
            if hasattr(ref, nm):
                getattr(ref, nm).register_forward_hook(
                    lambda m, i, o, nm=nm: captured.__setitem__(nm, o)
                )

    x = np.random.RandomState(23).rand(1, 3, img, img).astype(np.float32) - 0.5
    with torch.no_grad():
        args = (torch.from_numpy(x), ["prompt"]) if needs_text \
            else (torch.from_numpy(x),)
        out = ref(*args)

    want_ds = []
    if isinstance(out, tuple):
        want_main = out[0].numpy()
        want_ds = [o.numpy() for o in out[1:]]
    else:
        want_main = out
        if captured:
            tsize = (1,) + tuple(want_main.shape[2:])
            want_ds = [
                torch.nn.functional.interpolate(
                    captured[f"ds_head{i}"], size=tsize, mode="trilinear",
                    align_corners=False,
                ).squeeze(2).numpy()
                for i in (1, 2, 3)
            ]
        want_main = want_main.numpy()

    overrides = dict(KW, feat_size=feat_size)
    if has_ds:
        overrides["ds_in_output"] = True
    model = build_segmamba(key, **overrides)
    xj = jnp.asarray(to_nhwc(x))
    margs = (xj, jnp.asarray(text_emb)) if needs_text else (xj,)
    template = model.init(jax.random.PRNGKey(0), *margs)
    stage_wrap = "spatial" in variant.get("block", "")
    sd = {}
    for k, v in ref.state_dict().items():
        # The VSS rung's SS2D (inside TokenVSSM) flattens its 4-direction
        # A_logs/Ds to (K*D, N)/(K*D,); the flax params keep the (K, D, ...)
        # structure (same preprocessing as the MedMamba whole-model parity,
        # test_archs_parity_sweep.py:584). Scoped to top_ssm — the
        # SpatialMamba rungs' StructureAwareSSM keeps the flat layout on
        # both sides.
        if ".top_ssm." in k:
            if k.endswith("A_logs"):
                v = v.reshape(4, -1, v.shape[-1])
            elif k.endswith(".Ds"):
                v = v.reshape(4, -1)
        sd[k] = v
    variables = import_torch_state(
        template, sd,
        rename=lambda n: _assembly_rename(n, stage_wrap=stage_wrap),
        strict=True,
    )

    outs = model.apply(variables, *margs)
    if not isinstance(outs, tuple):
        outs = (outs,)
    np.testing.assert_allclose(
        from_nhwc(np.asarray(outs[0])), want_main, atol=atol, rtol=1e-4
    )
    for got_ds, want in zip(outs[1:], want_ds):
        np.testing.assert_allclose(
            from_nhwc(np.asarray(got_ds)), want, atol=atol, rtol=1e-4
        )
    assert len(outs) - 1 == len(want_ds), (len(outs), len(want_ds))


@pytest.mark.parametrize("key", sorted(CASES))
def test_family_whole_model_parity(key, real_monai, ref_mod, monkeypatch):
    ref_name, needs_text = CASES[key]
    kw = {}
    if key.endswith("_CA"):
        # the reference CAB compresses channels by //16 — dims below 16
        # produce a 0-channel conv, so this rung needs wider stages
        kw["feat_size"] = (48, 32, 32, 32)
    if key.endswith("_ds_text"):
        kw["pooled_text"] = True
    _run_case(key, ref_name, needs_text, real_monai, monkeypatch, **kw)


def test_swattn_whole_model_parity(real_monai, ref_mod, monkeypatch):
    """The SWAttn rung hardcodes window_size=7 with divisibility asserts
    (…_gsc_SWAttn.py:545,581), so it runs at img 112 (stages 56/28/14/7 are
    all multiples of 7) — the only rung needing a non-32 input."""
    _run_case("Segmamba_hybrid_gsc_SWAttn", "nets.segmamba_hybrid_gsc_SWAttn",
              False, real_monai, monkeypatch, img=112)
