"""KNUnet/KMUNet golden parity vs the loaded reference (VERDICT r3 Missing #2).

The reference (/root/reference/Experiments/nets/KNUnet.py:1488-1511) needs
timm (only DropPath/trunc_normal_, stubbed by tests/torch_ref.py) and
mamba_ssm (its import is wrapped in try/except, leaving selective_scan_fn
undefined at forward time — injected here as the sequential loop oracle).
With those two stubs the reference constructs and runs: the round-3 claim
that its channel plans are "internally inconsistent" was wrong — the decoder
COMMENTS are wrong (":1469-1472" say 12/96/192/384 channels) but the code
traces coherently at hidden_dims=[64,128,256,512] because the patch-embed
KANLinear hardcodes 64 outputs (PatchbedLayer, :406-411).

This upgrades the KNUnet COVERAGE row from structural to whole-model parity.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_flagship_blocks_parity import _loop_selective_scan
from tests.torch_ref import load_ref_module

torch = pytest.importorskip("torch")


def _load_ref_knunet():
    mod = load_ref_module("Experiments/nets", "KNUnet")
    # mamba_ssm's import is try/except'd away (KNUnet.py:12-15); the scan
    # symbol is resolved as a module global at forward time
    if not hasattr(mod, "selective_scan_fn"):
        mod.selective_scan_fn = _loop_selective_scan
    return mod


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)

    def u(p, lo, hi):
        p.copy_(torch.empty_like(p).uniform_(lo, hi, generator=g))

    with torch.no_grad():
        for name, p in model.named_parameters():
            if "A_logs" in name:
                u(p, -3.0, 0.5)  # keep the scan decays stable
            elif "dt_projs_bias" in name:
                u(p, -2.0, -1.0)
            elif p.dim() == 1 and name.endswith(".weight"):
                u(p, 0.8, 1.2)  # LayerNorm scales
            elif name.endswith(".bias"):
                u(p, -0.1, 0.1)
            else:
                u(p, -0.3, 0.3)
    return model


@pytest.mark.parametrize("depths", [(1, 2, 1, 2)])
def test_kmunet_whole_model_parity(depths):
    """Full KMUNet (encoder + KAN_SCA bridge + VSS decoder + final expand)
    vs the loaded reference, eval mode, <=3e-5. depths up blocks with
    depth 2 exercise the reference's recompute-loop quirk (only the LAST
    block's output survives, KNUnet.py:1067-1075)."""
    mod = _load_ref_knunet()
    ref = mod.KMUNet(input_channels=3, num_classes=2, depths=list(depths),
                     hidden_dims=[64, 128, 256, 512], bridge=True).eval()
    _randomize(ref)

    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32) - 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (1, 2, 64, 64)

    from accunet_tpu.models.knunet import KMUNet
    from accunet_tpu.port import import_torch_state

    model = KMUNet(3, 2, depths=depths, hidden_dims=(64, 128, 256, 512))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), xj)
    # torch SS2D flattens the K=4 scan-direction axis into A_logs/Ds
    # (KNUnet.py:forward_corev0 views them back); flax keeps (K, D, ...)
    sd = {}
    for k, v in ref.state_dict().items():
        if k.endswith("A_logs"):
            v = v.reshape(4, -1, v.shape[-1])
        elif k.endswith(".Ds"):
            v = v.reshape(4, -1)
        sd[k] = v
    variables = import_torch_state(template, sd, strict=True)
    got = np.asarray(model.apply(variables, xj)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_kan_sca_bridge_parity():
    """The SCA bridge alone (spatial + channel gates, double residual)."""
    mod = _load_ref_knunet()
    c_list = [8, 16, 32, 64]
    ref = _randomize(mod.KAN_SCA(c_list, split_att="KAN").eval(), seed=1)

    rng = np.random.RandomState(1)
    ts_nchw = [rng.rand(2, c, s, s).astype(np.float32) - 0.5
               for c, s in zip(c_list, (16, 8, 4, 2))]
    with torch.no_grad():
        want = [t.numpy() for t in
                ref([torch.from_numpy(t) for t in ts_nchw])]

    from accunet_tpu.models.knunet import KANSCABridge
    from accunet_tpu.port import import_torch_state

    model = KANSCABridge(c_list)
    ts = [jnp.asarray(t.transpose(0, 2, 3, 1)) for t in ts_nchw]
    template = model.init(jax.random.PRNGKey(0), ts)
    variables = import_torch_state(template, ref.state_dict(), strict=True)
    got = model.apply(variables, ts)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w,
                                   atol=2e-5, rtol=1e-4)
