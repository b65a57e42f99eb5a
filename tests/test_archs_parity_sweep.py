"""Golden parity vs the torch reference for the archs/ building blocks that
round 1 had only at 'structural' status (CPU oracle, ported weights).

Covers: ODConv2d, CSSE, BSConvU/BSRB, TopFormer injection modules +
PyramidPoolAgg, EGE-UNet GAB + GHPA, the static Haar wavelet pool (pywt
stubbed with the real Haar filter bank), InceptionNeXt's InceptionDWConv2d,
and MedMamba's SS2D (selective scan stubbed with the defining python loop).
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
    _install_fake,
    _install_stub_deps,
    from_nhwc,
    randomize_bn_stats,
    to_nhwc,
)


def _ref_archs(module):
    import importlib

    _install_stub_deps()
    _install_pywt_stub()
    for root in (f"{REF}/Experiments/nets", f"{REF}/Experiments"):
        if root not in sys.path:
            sys.path.insert(0, root)
    try:
        return importlib.import_module(f"archs.{module}")
    except Exception as e:
        pytest.skip(f"cannot import reference archs.{module}: {e}")


def _install_pywt_stub():
    """pywt is not in this image; the models only use pywt.Wavelet('haar')
    .filter_bank (wavelet_pool2d.py:169). Provide the real Haar bank."""
    if "pywt" in sys.modules:
        return
    s = 2.0 ** -0.5

    class Wavelet:
        def __init__(self, name):
            assert name == "haar", name
            self.name = name
            self.dec_lo, self.dec_hi = [s, s], [-s, s]
            self.rec_lo, self.rec_hi = [s, s], [s, -s]
            self.filter_bank = (self.dec_lo, self.dec_hi, self.rec_lo, self.rec_hi)
            self.dec_len = 2
            self.rec_len = 2

    _install_fake("pywt", {"Wavelet": Wavelet})


def _port(template, torch_module, rename=None, strict=True):
    from accunet_tpu.port import import_torch_state

    return import_torch_state(
        template, torch_module.state_dict(), rename=rename or (lambda n: n),
        strict=strict,
    )


def _close(got, want, tol=2e-5):
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=1e-3,
    )


# ------------------------------------------------------------------ odconv


def test_odconv2d_parity():
    import torch

    m = _ref_archs("odconv")
    torch.manual_seed(0)
    ref = randomize_bn_stats(
        m.ODConv2d(16, 24, 3, padding=1, reduction=0.25, kernel_num=4)
    ).eval()
    x = np.random.RandomState(0).rand(2, 16, 12, 12).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.nn.cmrf_blocks import ODConv2d

    model = ODConv2d(16, 24, 3, reduction=0.25, kernel_num=4)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)
    var = _port(tpl, ref)
    got = from_nhwc(np.asarray(model.apply(var, xj, train=False)))
    _close(got, want.numpy())


# -------------------------------------------------------------------- csse


def test_csse_parity():
    import torch

    m = _ref_archs("squeeze_and_excitation")
    torch.manual_seed(0)
    ref = m.ChannelSpatialSELayer(16, reduction_ratio=2).eval()
    x = np.random.RandomState(1).rand(2, 16, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.nn.cmrf_blocks import ChannelSpatialSE

    model = ChannelSpatialSE(16, 2)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)
    var = _port(tpl, ref, rename=lambda n: n.replace("cSE.", "cSE.").replace("sSE.conv.", "sSE.conv."))
    got = from_nhwc(np.asarray(model.apply(var, xj)))
    _close(got, want.numpy())


# -------------------------------------------------------------------- bsdn


def test_bsconvu_bsrb_parity():
    import torch

    m = _ref_archs("BSDN")
    torch.manual_seed(0)
    ref = m.BSRB(in_channels=12, out_channels=12).eval()
    x = np.random.RandomState(2).rand(2, 12, 10, 10).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.nn.cmrf_blocks import BSRB

    model = BSRB(12)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)
    var = _port(tpl, ref)
    got = from_nhwc(np.asarray(model.apply(var, xj)))
    _close(got, want.numpy())


# --------------------------------------------------------------- topformer


def test_injection_multisum_parity():
    import torch

    m = _ref_archs("Topformer")
    torch.manual_seed(0)
    ref = randomize_bn_stats(m.InjectionMultiSum(16, 24)).eval()
    xl = np.random.RandomState(3).rand(2, 16, 16, 16).astype(np.float32)
    xg = np.random.RandomState(4).rand(2, 16, 4, 4).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(xl), torch.from_numpy(xg))

    from accunet_tpu.nn.cmrf_blocks import InjectionMultiSum

    model = InjectionMultiSum(24)
    a, b = jnp.asarray(to_nhwc(xl)), jnp.asarray(to_nhwc(xg))
    tpl = model.init(jax.random.PRNGKey(0), a, b)
    var = _port(tpl, ref)
    got = from_nhwc(np.asarray(model.apply(var, a, b, train=False)))
    _close(got, want.numpy())


def test_pyramid_pool_agg_parity():
    import torch

    m = _ref_archs("Topformer")
    ref = m.PyramidPoolAgg(stride=2).eval()
    xs = [
        np.random.RandomState(10 + i).rand(2, 8, 32 // (2 ** i), 32 // (2 ** i)).astype(np.float32)
        for i in range(4)
    ]
    with torch.no_grad():
        want = ref([torch.from_numpy(x) for x in xs])

    from accunet_tpu.models.unext_cmrf import _adaptive_avg_pool

    # reference: cat([avgpool(t, ((H-1)//s+1, (W-1)//s+1)) for t in inputs])
    h, w = xs[-1].shape[2], xs[-1].shape[3]
    oh, ow = (h - 1) // 2 + 1, (w - 1) // 2 + 1
    outs = [
        _adaptive_avg_pool(jnp.asarray(to_nhwc(x)), (oh, ow)) for x in xs
    ]
    got = from_nhwc(np.asarray(jnp.concatenate(outs, axis=-1)))
    _close(got, want.numpy())


# --------------------------------------------------------------------- ege


def test_gab_parity():
    import torch

    m = _ref_archs("ege_unet")
    torch.manual_seed(0)
    ref = m.group_aggregation_bridge(dim_xh=24, dim_xl=16).eval()
    xh = np.random.RandomState(5).rand(2, 24, 4, 4).astype(np.float32)
    xl = np.random.RandomState(6).rand(2, 16, 8, 8).astype(np.float32)
    mask = np.random.RandomState(7).rand(2, 1, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(xh), torch.from_numpy(xl), torch.from_numpy(mask))

    from accunet_tpu.nn.cmrf_blocks import GroupAggregationBridge

    model = GroupAggregationBridge(16)
    a, b, c = (jnp.asarray(to_nhwc(t)) for t in (xh, xl, mask))
    tpl = model.init(jax.random.PRNGKey(0), a, b, c)

    def rename(n):
        for i in range(4):
            n = n.replace(f"g{i}_ln.", f"g{i}.0.").replace(f"g{i}_conv.", f"g{i}.1.")
        n = n.replace("tail_ln.", "tail_conv.0.")
        if n in ("tail_conv.weight", "tail_conv.bias"):
            n = "tail_conv.1." + n.split(".")[-1]
        return n

    var = _port(tpl, ref, rename=rename)
    got = from_nhwc(np.asarray(model.apply(var, a, b, c, train=False)))
    _close(got, want.numpy())


def test_ghpa_parity():
    import torch

    m = _ref_archs("ege_unet")
    torch.manual_seed(0)
    ref = m.Grouped_multi_axis_Hadamard_Product_Attention(dim_in=16, dim_out=16).eval()
    with torch.no_grad():
        for p in (ref.params_xy, ref.params_zx, ref.params_zy):
            p.copy_(torch.rand(p.shape))
    x = np.random.RandomState(8).rand(2, 16, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.nn.cmrf_blocks import GHPA

    model = GHPA(16, 16)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)

    sd = {k: v for k, v in ref.state_dict().items()}
    # torch params_xy (1, c4, gx, gy) -> ours (1, gx, gy, c4)
    sd["params_xy"] = sd["params_xy"].permute(0, 2, 3, 1)
    # torch params_zx/zy (1, 1, c4, g) -> ours (1, c4, g, 1)
    sd["params_zx"] = sd["params_zx"].permute(0, 2, 3, 1)
    sd["params_zy"] = sd["params_zy"].permute(0, 2, 3, 1)
    from accunet_tpu.port import import_torch_state

    var = import_torch_state(tpl, sd, rename=lambda n: n, strict=True)
    got = from_nhwc(np.asarray(model.apply(var, xj)))
    _close(got, want.numpy())


# ------------------------------------------------------------------ wavelet


def test_haar_wavelet_pool_parity():
    import torch

    m = _ref_archs("wavelet_pool2d")
    import pywt

    ref = m.StaticWaveletPool2d(wavelet=pywt.Wavelet("haar"), scales=1).eval()
    x = np.random.RandomState(9).rand(2, 6, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.nn.cmrf_blocks import haar_wavelet_pool2d

    got = from_nhwc(np.asarray(haar_wavelet_pool2d(jnp.asarray(to_nhwc(x)))))
    _close(got, want.numpy())


@pytest.mark.parametrize(
    "lo,hi",
    [
        ([2.0 ** -0.5, 2.0 ** -0.5], [-(2.0 ** -0.5), 2.0 ** -0.5]),  # Haar
        ([0.55, 0.83], [-0.8, 0.6]),  # trained-away, asymmetric (flip test)
    ],
)
def test_adaptive_wavelet_pool_parity(lo, hi):
    """AdaptiveWaveletPool2d (wavelet_pool2d.py:105-130) — VERDICT r3
    missing #5. The class is instantiated nowhere in the reference tree, so
    parity is pinned at the class level at the family's used geometry
    (filt_len=2, scales=1), with a learnable Haar-init wavelet stub AND an
    asymmetric filter set that catches the flip=True convolution
    semantics."""
    import torch

    m = _ref_archs("wavelet_pool2d")

    class _LearnableWavelet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dec_lo = torch.nn.Parameter(torch.tensor(lo))
            self.dec_hi = torch.nn.Parameter(torch.tensor(hi))
            self.rec_lo = torch.nn.Parameter(torch.tensor(lo))
            self.rec_hi = torch.nn.Parameter(torch.tensor(list(reversed(hi))))

        @property
        def filter_bank(self):
            return (self.dec_lo, self.dec_hi, self.rec_lo, self.rec_hi)

        def wavelet_loss(self):
            return torch.zeros(())

    ref = m.AdaptiveWaveletPool2d(
        wavelet=_LearnableWavelet(), use_scale_weights=True, scales=1)
    x = np.random.RandomState(10).rand(2, 5, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.nn.cmrf_blocks import AdaptiveWaveletPool2d

    ours = AdaptiveWaveletPool2d()
    params = {
        "params": {
            "dec_lo": jnp.asarray(lo),
            "dec_hi": jnp.asarray(hi),
            "scales_weights": jnp.ones((1,)),
        }
    }
    got = from_nhwc(np.asarray(ours.apply(params, jnp.asarray(to_nhwc(x)))))
    _close(got, want.numpy())


# ------------------------------------------------------------ inceptionnext


def _extend_timm_stub():
    """inceptionnext.py needs timm symbols beyond the base stub."""
    import torch

    _install_stub_deps()
    timm = sys.modules["timm"]
    models = sys.modules["timm.models"]
    layers = sys.modules["timm.models.layers"]
    models.checkpoint_seq = lambda fns, x: x
    models.register_model = lambda f: f
    if "timm.layers" not in sys.modules:
        tl = _install_fake("timm.layers", {
            "trunc_normal_": layers.trunc_normal_,
            "DropPath": layers.DropPath,
            "to_2tuple": layers.to_2tuple,
        })
        helpers = _install_fake("timm.layers.helpers", {"to_2tuple": layers.to_2tuple})
        tl.helpers = helpers
        timm.layers = tl
    if "timm.data" not in sys.modules:
        td = _install_fake("timm.data", {
            "IMAGENET_DEFAULT_MEAN": (0.485, 0.456, 0.406),
            "IMAGENET_DEFAULT_STD": (0.229, 0.224, 0.225),
        })
        timm.data = td


def test_inception_dwconv2d_parity():
    import torch

    _extend_timm_stub()
    m = _ref_archs("inceptionnext")
    torch.manual_seed(0)
    ref = m.InceptionDWConv2d(32).eval()
    x = np.random.RandomState(11).rand(2, 32, 12, 12).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.models.unext_inceptionnext import InceptionDWConv2d

    model = InceptionDWConv2d(32)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)
    var = _port(tpl, ref)
    got = from_nhwc(np.asarray(model.apply(var, xj)))
    _close(got, want.numpy())


# --------------------------------------------------------------- medmamba


def _loop_selective_scan(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                         delta_softplus=False, return_last_state=False):
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
    grouped = Bf.dim() == 4  # (B, G, N, L) variable-B/C form
    for t in range(l):
        if grouped:
            g = Bf.shape[1]
            rep = d // g
            Bt = Bf[:, :, :, t].repeat_interleave(rep, dim=1)  # (B, D, N)
            h = torch.exp(df[:, :, t, None] * Af[None]) * h + (
                df[:, :, t, None] * Bt * uf[:, :, t, None]
            )
            Ct = Cf[:, :, :, t].repeat_interleave(rep, dim=1)
            ys.append(torch.einsum("bdn,bdn->bd", h, Ct))
        else:
            h = torch.exp(df[:, :, t, None] * Af[None]) * h + (
                df[:, :, t, None] * Bf[:, None, :, t] * uf[:, :, t, None]
            )
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


def _install_mamba_stub():
    import torch

    if "mamba_ssm" in sys.modules:
        return
    ms = types.ModuleType("mamba_ssm")
    ms.Mamba = type("Mamba", (torch.nn.Module,), {})
    ops = types.ModuleType("mamba_ssm.ops")
    ssi = types.ModuleType("mamba_ssm.ops.selective_scan_interface")
    ssi.selective_scan_fn = _loop_selective_scan
    ssi.selective_scan_ref = _loop_selective_scan
    ssi.mamba_inner_fn = None
    ops.selective_scan_interface = ssi
    ms.ops = ops
    for name, mod in [
        ("mamba_ssm", ms), ("mamba_ssm.ops", ops),
        ("mamba_ssm.ops.selective_scan_interface", ssi),
    ]:
        sys.modules[name] = mod


def _medmamba_mod():
    """Load reference MedMamba defs (the file instantiates .to("cuda") models
    at module level, :760-764 — execute only the definitions above that)."""
    _install_stub_deps()
    _install_mamba_stub()
    src = open(f"{REF}/Experiments/nets/MedMamba.py").read()
    cut = src.index("medmamba_t =")
    m = types.ModuleType("medmamba_ref")
    try:
        exec(compile(src[:cut], "MedMamba.py", "exec"), m.__dict__)
    except Exception as e:
        pytest.skip(f"cannot exec reference MedMamba: {e}")
    return m


def test_medmamba_ss2d_parity():
    import importlib

    import torch

    m = _medmamba_mod()

    torch.manual_seed(0)
    ref = m.SS2D(d_model=16, d_state=8, d_conv=3, expand=2).eval()
    x = np.random.RandomState(12).rand(1, 8, 8, 16).astype(np.float32)  # NHWC in ref
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.nn.ss2d import SS2D

    model = SS2D(16, d_state=8, d_conv=3, expand=2)
    xj = jnp.asarray(x)
    tpl = model.init(jax.random.PRNGKey(0), xj)
    sd = {k: v for k, v in ref.state_dict().items()}
    K, D, N = 4, 32, 8
    sd["A_logs"] = sd["A_logs"].reshape(K, D, N)
    sd["Ds"] = sd["Ds"].reshape(K, D)
    from accunet_tpu.port import import_torch_state

    var = import_torch_state(tpl, sd, rename=lambda n: n, strict=True)
    _close(np.asarray(model.apply(var, xj)), want.numpy(), tol=3e-5)


def test_medmamba_ss_conv_ssm_parity():
    import torch

    m = _medmamba_mod()
    torch.manual_seed(0)
    ref = randomize_bn_stats(m.SS_Conv_SSM(hidden_dim=16, d_state=8)).eval()
    x = np.random.RandomState(13).rand(1, 8, 8, 16).astype(np.float32)  # NHWC
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.nn.ss2d import SSConvSSM

    model = SSConvSSM(16, d_state=8)
    xj = jnp.asarray(x)
    tpl = model.init(jax.random.PRNGKey(0), xj)
    sd = {k: v for k, v in ref.state_dict().items()}
    K, D, N = 4, 16, 8
    sd["self_attention.A_logs"] = sd["self_attention.A_logs"].reshape(K, D, N)
    sd["self_attention.Ds"] = sd["self_attention.Ds"].reshape(K, D)
    from accunet_tpu.port import import_torch_state

    var = import_torch_state(
        tpl, sd,
        rename=lambda n: n.replace("conv.", "conv33conv33conv11."),
        strict=True,
    )
    _close(np.asarray(model.apply(var, xj, train=False)), want.numpy(), tol=3e-5)


@pytest.mark.quick  # quick-tier representative of the CMRF-combo parity family
def test_unext_cmrf_whole_model_parity():
    """Full UNext_CMRF forward vs the reference at 64^2 — upgrades the
    UNext_CMRF family base from structural to golden parity."""
    import torch

    m = _ref_archs("UNext_CMRF")
    torch.manual_seed(0)
    ref = randomize_bn_stats(m.UNext_CMRF(n_channels=3, n_classes=1)).eval()
    x = np.random.RandomState(14).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.models.unext_cmrf import build_unext_cmrf

    model = build_unext_cmrf("UNext_CMRF", n_channels=3, n_classes=1)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)
    var = _port(tpl, ref)
    got = from_nhwc(np.asarray(model.apply(var, xj, train=False)))
    _close(got, want.numpy(), tol=3e-5)


def test_unext_cmrf_gs_wavelet_rkan_whole_model_parity():
    """The most composite CMRF variant — GS semantic injection + Haar wavelet
    pooling + rational-KAN token blocks — full forward vs the reference."""
    import torch

    m = _ref_archs("UNext_CMRF_GS_wavelet_rkan")
    torch.manual_seed(0)
    ref = randomize_bn_stats(
        m.UNext_CMRF_GS_Wavelet_rKAN(n_channels=3, n_classes=1, img_size=64)
    ).eval()  # img_size fixes gs_size=img//32 at construction (ref :262)
    x = np.random.RandomState(15).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.models.unext_cmrf import build_unext_cmrf

    model = build_unext_cmrf("UNext_CMRF_GS_Wavelet_rKAN", n_channels=3, n_classes=1)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)
    var = _port(tpl, ref)
    got = from_nhwc(np.asarray(model.apply(var, xj, train=False)))
    _close(got, want.numpy(), tol=5e-5)


def test_unext_cmrf_gs_wavelet_whole_model_parity():
    import torch

    m = _ref_archs("UNext_CMRF_GS_wavelet")
    torch.manual_seed(0)
    ref = randomize_bn_stats(
        m.UNext_CMRF_GS_Wavelet(n_channels=3, n_classes=1, img_size=64)
    ).eval()
    x = np.random.RandomState(16).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.models.unext_cmrf import build_unext_cmrf

    model = build_unext_cmrf("UNext_CMRF_GS_Wavelet", n_channels=3, n_classes=1)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)
    var = _port(tpl, ref)
    got = from_nhwc(np.asarray(model.apply(var, xj, train=False)))
    _close(got, want.numpy(), tol=5e-5)


def test_injection_multisum_cbr_parity():
    import torch

    m = _ref_archs("Topformer")
    torch.manual_seed(0)
    ref = randomize_bn_stats(m.InjectionMultiSumCBR(16, 16)).eval()
    xl = np.random.RandomState(17).rand(2, 16, 16, 16).astype(np.float32)
    xg = np.random.RandomState(18).rand(2, 16, 4, 4).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(xl), torch.from_numpy(xg))

    from accunet_tpu.nn.cmrf_blocks import InjectionMultiSumCBR

    model = InjectionMultiSumCBR(16)
    a, b = jnp.asarray(to_nhwc(xl)), jnp.asarray(to_nhwc(xg))
    tpl = model.init(jax.random.PRNGKey(0), a, b)
    var = _port(tpl, ref)
    got = from_nhwc(np.asarray(model.apply(var, a, b, train=False)))
    _close(got, want.numpy())


def test_medmamba_vssm_whole_model_parity():
    """Full MedMamba VSSM classifier forward vs the reference (tiny config)."""
    import torch

    m = _medmamba_mod()
    torch.manual_seed(0)
    ref = m.VSSM(
        patch_size=4, in_chans=3, num_classes=5, depths=[1, 1], dims=[16, 32],
        d_state=8, drop_path_rate=0.0,
    ).eval()
    randomize_bn_stats(ref, 0)
    x = np.random.RandomState(19).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    from accunet_tpu.models.medmamba import VSSM

    model = VSSM(3, 5, depths=(1, 1), dims=(16, 32), d_state=8)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)

    sd = {}
    for k, v in ref.state_dict().items():
        if k.endswith("A_logs"):
            v = v.reshape(4, -1, 8)
        elif k.endswith(".Ds"):
            v = v.reshape(4, -1)
        sd[k] = v
    from accunet_tpu.port import import_torch_state

    def rename(n):
        import re as _re

        n = n.replace("patch_embed_proj.", "patch_embed.proj.")
        n = n.replace("patch_embed_norm.", "patch_embed.norm.")
        n = _re.sub(r"layers_(\d+)_blocks\.(\d+)\.", r"layers.\1.blocks.\2.", n)
        n = _re.sub(r"layers_(\d+)_downsample\.", r"layers.\1.downsample.", n)
        return n.replace(".conv.", ".conv33conv33conv11.")

    var = import_torch_state(tpl, sd, rename=rename, strict=True)
    got = np.asarray(model.apply(var, xj, train=False))
    _close(got, want, tol=5e-5)


@pytest.mark.parametrize(
    "ref_file,ref_cls,our_name",
    [
        ("UNext_CMRF_GAB_wavelet", "UNext_CMRF_GAB_Wavelet", "UNext_CMRF_GAB_wavelet"),
        ("UNext_CMRF_BSRB_GS_wavelet", "UNext_CMRF_BSRB_GS_Wavelet", "UNext_CMRF_BSRB_GS_Wavelet"),
        ("UNext_CMRF_enc_dec_MLFC", "UNext_CMRF_enc_dec_MLFC", "UNext_CMRF_enc_dec_MLFC"),
        ("UNext_CMRF_dense_skip", "UNext_CMRF_Dense_Skip", "UNext_CMRF_dense_skip"),
        ("UNext_CMRF_enc_dec", "UNext_CMRF_enc_dec", "UNext_CMRF_enc_dec"),
        ("UNext_CMRF_enc_MLFC", "UNext_CMRF_enc_MLFC", "UNext_CMRF_enc_MLFC"),
        # round-3 completion: the remaining combos with reference files
        ("UNext_CMRF_enc_CSSE", "UNext_CMRF_enc_CSSE", "UNext_CMRF_enc_CSSE"),
        ("UNext_CMRF_GS", "UNext_CMRF_GS", "UNext_CMRF_GS"),
        ("UNext_CMRF_GAB", "UNext_CMRF_GAB", "UNext_CMRF_GAB"),
        ("UNext_CMRF_PP", "UNext_CMRF_PP", "UNext_CMRF_PP"),
        ("UNext_CMRF_BSRB_GS", "UNext_CMRF_BSRB_GS", "UNext_CMRF_BSRB_GS"),
        # UNext_CMRF_BS_GS_wavelet is NOT here: the reference's CMRF_BS
        # block is shipped broken (references a nonexistent attribute 'm',
        # archs/BSDN.py CMRF_BS) so the torch side cannot run — structural
        # coverage is the ceiling (see COVERAGE.md BSDN row)
        ("UNext_CMRF_GS_wavelet_OD", "UNext_CMRF_GS_Wavelet_OD",
         "UNext_CMRF_GS_Wavelet_OD"),
        ("UNext_CMRF_GAB_wavelet_OD", "UNext_CMRF_GAB_Wavelet_OD",
         "UNext_CMRF_GAB_wavelet_OD"),
        ("UNext_CMRF_GS_wavelet_hd", "UNext_CMRF_GS_Wavelet_hd",
         "UNext_CMRF_GS_Wavelet_hd"),
    ],
)
def test_unext_cmrf_combo_whole_model_parity(ref_file, ref_cls, our_name):
    import torch

    m = _ref_archs(ref_file)
    torch.manual_seed(0)
    kwargs = dict(n_channels=3, n_classes=1)
    import inspect

    if "img_size" in inspect.signature(getattr(m, ref_cls).__init__).parameters:
        kwargs["img_size"] = 64
    ref = randomize_bn_stats(getattr(m, ref_cls)(**kwargs)).eval()
    x = np.random.RandomState(20).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    from accunet_tpu.models.unext_cmrf import build_unext_cmrf

    model = build_unext_cmrf(our_name, n_channels=3, n_classes=1)
    xj = jnp.asarray(to_nhwc(x))
    tpl = model.init(jax.random.PRNGKey(0), xj)

    def rename(n):
        import re as _re

        # enc_CSSE names its ChannelSpatialSELayers se1..se4
        n = _re.sub(r"^csse(\d)\.", r"se\1.", n)
        # EGE GAB internals live under GABn. prefixes in these models
        n = _re.sub(r"g(\d)_ln\.", r"g\1.0.", n)
        n = _re.sub(r"g(\d)_conv\.", r"g\1.1.", n)
        n = n.replace(".tail_ln.", ".tail_conv.0.")
        n = _re.sub(r"\.tail_conv\.(weight|bias)$", r".tail_conv.1.\1", n)
        # dense-skip heads: reference ConvBNReLU = Sequential(conv, BN, ReLU)
        n = _re.sub(r"H(\d)_(\d)_conv\.", r"H\1_\2.block.0.", n)
        n = _re.sub(r"H(\d)_(\d)_bn\.", r"H\1_\2.block.1.", n)
        return n

    var = _port(tpl, ref, rename=rename)
    got = from_nhwc(np.asarray(model.apply(var, xj, train=False)))
    out = got if not isinstance(want, (tuple, list)) else got
    _close(out, (want[-1] if isinstance(want, (tuple, list)) else want).numpy(), tol=5e-5)
