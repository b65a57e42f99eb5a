"""UNeXt-CMRF family: structural smoke tests (shapes/finiteness) for every
variant axis, plus a CMRF-block golden parity test vs the reference
TinyU_Net CMRF."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.models.unext_cmrf import UNextCMRF, build_unext_cmrf
from accunet_tpu.nn.cmrf_blocks import CMRF
from accunet_tpu.port import import_torch_state
from tests.torch_ref import load_ref_module, randomize_bn_stats, to_nhwc


def test_cmrf_block_parity():
    import torch

    mod = load_ref_module("Experiments", "nets.archs.TinyU_Net")
    torch.manual_seed(0)
    ref = mod.CMRF(16, 32).eval()
    randomize_bn_stats(ref, 0)

    x = np.random.RandomState(1).rand(2, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    block = CMRF(16, 32)
    xj = jnp.asarray(to_nhwc(x))
    template = block.init(jax.random.PRNGKey(0), xj, train=False)
    variables = import_torch_state(template, ref.state_dict(), strict=True)
    got = np.transpose(
        np.asarray(block.apply(variables, xj, train=False)), (0, 3, 1, 2)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "name",
    [
        "UNext_CMRF",
        "UNext_CMRF_enc_dec",
        "UNext_CMRF_enc_MLFC",
        "UNext_CMRF_enc_CSSE",
        "UNext_CMRF_GS_Wavelet",
        "UNext_CMRF_GAB",
    ],
)
def test_variant_forward(name):
    model = build_unext_cmrf(name)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    var = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(var, x, train=False)
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()
