"""Smoke tests for the long-tail zoo: InceptionNeXt-UNeXt, SegViT_fKAN,
rational-KAN activations, ExternalAttention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.models.seg_fvit import SegViTfKAN
from accunet_tpu.models.unext_inceptionnext import UNextInceptionNextMLFC
from accunet_tpu.nn.attention import ExternalAttention
from accunet_tpu.nn.kan import JacobiRKAN, KANLinear, PadeRKAN


def test_unext_inceptionnext_mlfc():
    m = UNextInceptionNextMLFC(3, 1)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(var, x, train=False)
    assert y.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_seg_fvit_fkan():
    m = SegViTfKAN(in_chans=1, out_chans=1, img_size=64, num_layers=1,
                   feat_size=(8, 16, 24, 32), hidden=64, heads=4, mlp_dim=128)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 1), jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(var, x, train=False)
    assert y.shape[0] == 1 and y.shape[-1] == 1
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("act", ["rkan", "pade"])
def test_rational_kan_linear(act):
    m = KANLinear(8, 4, base_activation=act)
    x = jnp.asarray(np.random.RandomState(2).randn(16, 8), jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(var, x)
    assert y.shape == (16, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_external_attention_parity():
    import torch

    from accunet_tpu.port import import_torch_state
    from tests.torch_ref import load_ref_module

    mod = load_ref_module("Experiments", "nets.mcct")
    torch.manual_seed(0)
    ref = mod.ExternalAttention(d_model=16, S=8).eval()
    x = np.random.RandomState(3).rand(2, 10, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    m = ExternalAttention(16, 8)
    xj = jnp.asarray(x)
    template = m.init(jax.random.PRNGKey(0), xj)
    variables = import_torch_state(template, ref.state_dict(), strict=True)
    got = np.asarray(m.apply(variables, xj))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
