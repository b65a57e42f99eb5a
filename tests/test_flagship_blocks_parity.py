"""Golden parity for the flagship SegMamba sub-blocks vs the PyTorch
reference (CPU oracle, ported weights, ≤1e-5) — upgrades the mamba-family
rows from 'structural' to 'parity' (VERDICT round-1 item 6).

Reference: /root/reference/Experiments/nets/
segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba.py — imported with
mamba_ssm's selective_scan_fn replaced by a sequential python-loop oracle
(the CUDA kernel is unavailable on this image; the loop IS the defining
recurrence) and monai/transformers stubs for symbols the sub-blocks never
touch.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.torch_ref import (
    REF,
    _install_stub_deps,
    from_nhwc,
    randomize_bn_stats,
    to_nhwc,
)

FLAGSHIP = "nets.segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba"


def _loop_selective_scan(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                         delta_softplus=False, return_last_state=False):
    """Sequential reference of mamba_ssm.selective_scan_fn (standard form):
    u/delta (B,D,L), A (D,N), B/C (B,N,L), D (D,) — y (B,D,L)."""
    import torch

    b, d, l = u.shape
    n = A.shape[1]
    if delta_bias is not None:
        delta = delta + delta_bias[None, :, None]
    if delta_softplus:
        delta = torch.nn.functional.softplus(delta)
    h = torch.zeros(b, d, n, dtype=torch.float32)
    ys = []
    uf, df, Af = u.float(), delta.float(), A.float()
    Bf, Cf = B.float(), C.float()
    # grouped ("variable") B/C: (b, G, n, l) with D/G channels per group
    # (mamba_ssm selective_scan_fn semantics; SS2D passes G=1 4-D B/C)
    if Bf.dim() == 4:
        Bf = Bf.repeat_interleave(d // Bf.shape[1], dim=1)  # (b, d, n, l)
    if Cf.dim() == 4:
        Cf = Cf.repeat_interleave(d // Cf.shape[1], dim=1)
    for t in range(l):
        bt = Bf[:, :, :, t] if Bf.dim() == 4 else Bf[:, None, :, t]
        h = torch.exp(df[:, :, t, None] * Af[None]) * h + (
            df[:, :, t, None] * bt * uf[:, :, t, None]
        )
        if Cf.dim() == 4:
            ys.append(torch.einsum("bdn,bdn->bd", h, Cf[:, :, :, t]))
        else:
            ys.append(torch.einsum("bdn,bn->bd", h, Cf[:, :, t]))
    y = torch.stack(ys, dim=-1)
    if D is not None:
        y = y + D.float()[None, :, None] * uf
    if z is not None:
        y = y * torch.nn.functional.silu(z.float())
    out = y.to(u.dtype)
    if return_last_state:
        return out, h
    return out


def _loop_selective_scan_rh(u, delta, A, B, C=None, z=None, delta_bias=None,
                            delta_softplus=False, return_last_state=False):
    """Return-hidden form (the custom selective_scan_cuda_oflex_rh kernel,
    kernels/selective_scan/...oflex_rh.cpp:225-252): returns h (B,D,N,L)."""
    import torch

    b, d, l = u.shape
    n = A.shape[1]
    if delta_bias is not None:
        delta = delta + delta_bias[None, :, None]
    if delta_softplus:
        delta = torch.nn.functional.softplus(delta)
    h = torch.zeros(b, d, n, dtype=torch.float32)
    hs = []
    uf, df, Af, Bf = u.float(), delta.float(), A.float(), B.float()
    for t in range(l):
        h = torch.exp(df[:, :, t, None] * Af[None]) * h + (
            df[:, :, t, None] * Bf[:, None, :, t] * uf[:, :, t, None]
        )
        hs.append(h)
    return torch.stack(hs, dim=-1).to(u.dtype)  # (B, D, N, L)


@pytest.fixture(scope="module")
def ref_mod():
    torch = pytest.importorskip("torch")
    _install_stub_deps()

    # mamba_ssm stub with the python-loop scan
    if "mamba_ssm" not in sys.modules:
        ms = types.ModuleType("mamba_ssm")
        ms.Mamba = type("Mamba", (torch.nn.Module,), {})
        ops = types.ModuleType("mamba_ssm.ops")
        ssi = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
        ssi.selective_scan_fn = _loop_selective_scan
        ssi.mamba_inner_fn = None
        ops.selective_scan_interface = ssi
        ms.ops = ops
        sys.modules["mamba_ssm"] = ms
        sys.modules["mamba_ssm.ops"] = ops
        sys.modules["mamba_ssm.ops.selective_scan_interface"] = ssi

    # monai stubs (sub-block tests never instantiate UNETR blocks)
    if "monai" not in sys.modules:
        monai = types.ModuleType("monai")
        networks = types.ModuleType("monai.networks")
        blocks = types.ModuleType("monai.networks.blocks")
        dyn = types.ModuleType("monai.networks.blocks.dynunet_block")
        unetr = types.ModuleType("monai.networks.blocks.unetr_block")
        dyn.UnetOutBlock = type("UnetOutBlock", (torch.nn.Module,), {})
        unetr.UnetrBasicBlock = type("UnetrBasicBlock", (torch.nn.Module,), {})
        unetr.UnetrUpBlock = type("UnetrUpBlock", (torch.nn.Module,), {})
        blocks.dynunet_block = dyn
        blocks.unetr_block = unetr
        networks.blocks = blocks
        monai.networks = networks
        for name, mod in [
            ("monai", monai), ("monai.networks", networks),
            ("monai.networks.blocks", blocks),
            ("monai.networks.blocks.dynunet_block", dyn),
            ("monai.networks.blocks.unetr_block", unetr),
        ]:
            sys.modules[name] = mod

    # fvcore stub (spatialmamba.py:23 imports flop counters it only uses in
    # its .flops() reporting path)
    if "fvcore" not in sys.modules:
        import importlib.machinery as _mach

        fv = types.ModuleType("fvcore")
        fvnn = types.ModuleType("fvcore.nn")
        for _m in (fv, fvnn):
            _m.__spec__ = _mach.ModuleSpec(_m.__name__, None)
        fvnn.flop_count = lambda *a, **k: ({}, {})
        fvnn.parameter_count = lambda *a, **k: {}
        fv.nn = fvnn
        sys.modules["fvcore"] = fv
        sys.modules["fvcore.nn"] = fvnn

    for root in (f"{REF}/Experiments",):
        if root not in sys.path:
            sys.path.insert(0, root)

    # spatialmamba.py pulls the RH scan + Stem/DownSampling from utils, where
    # the reference ships them commented out (Experiments/utils.py:845-1012)
    import importlib

    utils = importlib.import_module("utils")
    if not hasattr(utils, "selective_scan_fn"):
        utils.selective_scan_fn = _loop_selective_scan_rh
        utils.selective_scan_state_flop_jit = lambda *a, **k: 0
        utils.Stem = type("Stem", (torch.nn.Module,), {})
        utils.DownSampling = type("DownSampling", (torch.nn.Module,), {})

    try:
        return importlib.import_module(FLAGSHIP)
    except Exception as e:
        pytest.skip(f"cannot import flagship reference: {e}")


def _port(template, torch_module, rename=None):
    from accunet_tpu.port import import_torch_state

    return import_torch_state(
        template, torch_module.state_dict(), rename=rename or (lambda n: n),
        strict=True,
    )


def _assert_close(got, want, tol=1e-5):
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want.astype(np.float32), atol=tol, rtol=1e-4
    )


@pytest.mark.quick  # quick-tier representative of the flagship-block parity family
def test_token_mdta_parity(ref_mod):
    import torch

    torch.manual_seed(0)
    ref = ref_mod.TokenMDTA(dim=16, num_heads=4, bias=True).eval()
    x = np.random.RandomState(1).rand(2, 64, 16).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x))

    from accunet_tpu.nn.attention import TokenMDTA

    model = TokenMDTA(16, 4)
    xj = jnp.asarray(x)
    template = model.init(jax.random.PRNGKey(0), xj)
    variables = _port(template, ref)
    _assert_close(model.apply(variables, xj), want.numpy())


def test_fkanmlp_parity(ref_mod):
    import torch

    torch.manual_seed(0)
    ref = ref_mod.FKANMLP(dim=12, mlp_dim=24).eval()
    x = np.random.RandomState(2).rand(2, 9, 12).astype(np.float32) - 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.nn.kan import FKANMLP

    model = FKANMLP(12, 24)
    xj = jnp.asarray(x)
    template = model.init(jax.random.PRNGKey(0), xj)
    variables = _port(template, ref)
    _assert_close(model.apply(variables, xj), want.numpy())


def test_gsc_parity(ref_mod):
    import torch

    torch.manual_seed(0)
    ref = ref_mod.GSC(in_channles=8).eval()
    x = np.random.RandomState(3).rand(1, 8, 1, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()[:, :, 0]  # NCDHW -> NCHW

    from accunet_tpu.models.segmamba import GSC

    model = GSC(8)
    xj = jnp.asarray(to_nhwc(x[:, :, 0]))
    template = model.init(jax.random.PRNGKey(0), xj)
    variables = _port(template, ref)
    got = from_nhwc(np.asarray(model.apply(variables, xj)))
    _assert_close(got, want)


def test_hslca_fusion_parity(ref_mod):
    import torch

    torch.manual_seed(0)
    ref = ref_mod.HSLCAFusion(img_dim=16, text_dim=24).eval()
    x = np.random.RandomState(4).rand(2, 16, 1, 8, 8).astype(np.float32)
    t = np.random.RandomState(5).rand(2, 6, 24).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()[:, :, 0]

    from accunet_tpu.nn.attention import HSLCAFusion

    model = HSLCAFusion(16, text_dim=24)
    xj = jnp.asarray(to_nhwc(x[:, :, 0]))
    tj = jnp.asarray(t)
    template = model.init(jax.random.PRNGKey(0), xj, tj)
    variables = _port(template, ref)
    got = from_nhwc(np.asarray(model.apply(variables, xj, tj)))
    _assert_close(got, want)


def test_tgdc_fusion_parity(ref_mod):
    import torch

    torch.manual_seed(0)
    ref = ref_mod.TGDCFusion(img_dim=12, text_dim=20).eval()
    x = np.random.RandomState(6).rand(2, 12, 1, 8, 8).astype(np.float32)
    t = np.random.RandomState(7).rand(2, 5, 20).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()[:, :, 0]

    from accunet_tpu.nn.attention import TGDCFusion

    model = TGDCFusion(12, text_dim=20)
    xj = jnp.asarray(to_nhwc(x[:, :, 0]))
    tj = jnp.asarray(t)
    template = model.init(jax.random.PRNGKey(0), xj, tj)
    variables = _port(template, ref)
    got = from_nhwc(np.asarray(model.apply(variables, xj, tj)))
    _assert_close(got, want)


def test_mamba_vision_mixer_parity(ref_mod):
    import torch

    torch.manual_seed(0)
    ref = ref_mod.MambaVisionMixer(
        d_model=16, d_state=8, d_conv=3, expand=1
    ).eval()
    x = np.random.RandomState(8).rand(2, 25, 16).astype(np.float32) - 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    from accunet_tpu.nn.ssm import MambaVisionMixer

    model = MambaVisionMixer(16, d_state=8, d_conv=3, expand=1)
    xj = jnp.asarray(x)
    template = model.init(jax.random.PRNGKey(0), xj)
    variables = _port(template, ref)
    _assert_close(model.apply(variables, xj), want, tol=2e-5)


def test_transformer_mamba_block_parity(ref_mod):
    import torch

    torch.manual_seed(0)
    ref = ref_mod.TransformerMambaBlock(
        dim=16, num_heads=4, mlp_ratio=2.0, d_state=8, d_conv=3, expand=1
    ).eval()
    x = np.random.RandomState(9).rand(1, 16, 1, 8, 8).astype(np.float32) - 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()[:, :, 0]

    from accunet_tpu.models.segmamba import TransformerMambaBlock

    model = TransformerMambaBlock(16, num_heads=4, mlp_ratio=2.0, d_state=8)
    xj = jnp.asarray(to_nhwc(x[:, :, 0]))
    template = model.init(jax.random.PRNGKey(0), xj)
    variables = _port(template, ref)
    got = from_nhwc(np.asarray(model.apply(variables, xj)))
    _assert_close(got, want, tol=2e-5)


def test_spatial_mamba_block_parity(ref_mod):
    """SpatialMambaBlock incl. StructureAwareSSM + StateFusion, driven by the
    RH python-loop scan injected into the reference's utils."""
    import torch

    sp = pytest.importorskip("spatialmamba") if False else None
    import importlib

    spm = importlib.import_module("nets.spatialmamba")
    torch.manual_seed(0)
    ref = spm.SpatialMambaBlock(hidden_dim=8, d_state=4).eval()
    x = np.random.RandomState(10).rand(1, 8, 8, 8).astype(np.float32) - 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (B,H,W,C) layout already

    from accunet_tpu.nn.ssm import SpatialMambaBlock

    model = SpatialMambaBlock(8, d_state=4)
    xj = jnp.asarray(x)
    template = model.init(jax.random.PRNGKey(0), xj)
    variables = _port(template, ref)
    _assert_close(model.apply(variables, xj), want, tol=2e-5)


def test_spatial_mamba_classifier_parity(ref_mod):
    """Full SpatialMamba classifier vs the reference, with the reference's
    OWN Stem/ConvLayer/DownSampling recovered from the commented block it
    ships in Experiments/utils.py:912-1012 (exec'd after stripping the
    comment markers) and the RH python-loop scan."""
    import importlib
    import re as _re

    import torch
    from einops import rearrange

    src = open(f"{REF}/Experiments/utils.py").read().splitlines()
    start = next(i for i, l in enumerate(src) if l.startswith("# class ConvLayer"))
    end = max(i for i, l in enumerate(src) if l.rstrip() == "#         return x")
    block = "\n".join(
        _re.sub(r"^# ?", "", l) for l in src[start : end + 1]
    )
    ns = {
        "torch": torch, "nn": torch.nn, "rearrange": rearrange,
        "to_2tuple": lambda v: v if isinstance(v, tuple) else (v, v),
    }
    exec(compile(block, "utils_commented.py", "exec"), ns)

    utils = importlib.import_module("utils")
    utils.Stem = ns["Stem"]
    utils.DownSampling = ns["DownSampling"]
    spm = importlib.reload(importlib.import_module("nets.spatialmamba"))

    torch.manual_seed(0)
    ref = spm.SpatialMamba(
        img_size=32, in_chans=3, num_classes=5, depths=[1, 1], dims=[16, 32],
        d_state=4, drop_path_rate=0.0,
    ).eval()
    randomize_bn_stats(ref, 0)
    x = np.random.RandomState(21).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    from accunet_tpu.models.medmamba import SpatialMamba

    model = SpatialMamba(3, 5, depths=(1, 1), dims=(16, 32), d_state=4)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)

    def rename(n):
        import re as _re2

        n = _re2.sub(r"layers_(\d+)_blocks\.(\d+)\.", r"layers.\1.blocks.\2.", n)
        n = _re2.sub(r"layers_(\d+)_downsample\.", r"layers.\1.downsample.", n)
        return n

    variables = _port(tpl, ref, rename=rename)
    got = np.asarray(model.apply(variables, xj, train=False))
    _assert_close(got, want, tol=5e-5)
