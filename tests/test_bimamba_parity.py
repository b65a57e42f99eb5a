"""BiMamba-v2 oracle parity (VERDICT r3 Missing #1).

The SegMamba baseline's mixer is ``mamba_ssm.Mamba(..., bimamba_type="v2")``
(/root/reference/Experiments/nets/segmamba.py:49-76) — a CUDA-only package
that fails to import on this image. The block's math, however, is published
(the Vim-style fork's mamba_simple.py bimamba-v2 branch):

  xz = in_proj(x)                                  # (B, L, 2*d_inner)
  fwd : x̂,z = chunk(xz); x̂ = silu(conv1d(x̂)[...,:L]);
        (dt,B,C) = x_proj(x̂); dt = dt_proj.weight @ dt;
        y = selective_scan(x̂, dt, -exp(A_log), B, C, D, z=z,
                           delta_bias=dt_proj.bias, delta_softplus=True)
  bwd : the same ops on time-flipped xz with the *_b parameters
        (A_b_log, conv1d_b, x_proj_b, dt_proj_b, D_b), output flipped back
  out = out_proj(y_fwd + flip(y_bwd))              # if_devide_out=False —
                                                   # the fork's default and
                                                   # segmamba passes nothing

This file encodes that forward as a hand-written torch module driven by the
sequential python-loop selective scan (the defining recurrence), ports its
weights into accunet_tpu.nn.ssm.BiMamba, and asserts <=2e-5 — upgrading the
'Segmamba baseline' COVERAGE row from struct to oracle-parity.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_flagship_blocks_parity import _loop_selective_scan

torch = pytest.importorskip("torch")


class BiMambaV2Oracle(torch.nn.Module):
    """Hand-written bimamba-v2 Mamba block (parameter names match the
    mamba_ssm fork's state_dict so import_torch_state maps 1:1)."""

    def __init__(self, d_model, d_state=16, d_conv=4, expand=2):
        super().__init__()
        d_inner = expand * d_model
        self.d_inner, self.d_state = d_inner, d_state
        self.dt_rank = math.ceil(d_model / 16)
        self.in_proj = torch.nn.Linear(d_model, 2 * d_inner, bias=False)
        self.out_proj = torch.nn.Linear(d_inner, d_model, bias=False)
        for sfx in ("", "_b"):
            setattr(self, f"conv1d{sfx}", torch.nn.Conv1d(
                d_inner, d_inner, d_conv, groups=d_inner,
                padding=d_conv - 1, bias=True,
            ))
            setattr(self, f"x_proj{sfx}", torch.nn.Linear(
                d_inner, self.dt_rank + 2 * d_state, bias=False))
            setattr(self, f"dt_proj{sfx}", torch.nn.Linear(
                self.dt_rank, d_inner, bias=True))
        a_init = torch.log(torch.arange(1, d_state + 1, dtype=torch.float32)
                           .repeat(d_inner, 1))
        self.A_log = torch.nn.Parameter(a_init.clone())
        self.A_b_log = torch.nn.Parameter(a_init.clone())
        self.D = torch.nn.Parameter(torch.ones(d_inner))
        self.D_b = torch.nn.Parameter(torch.ones(d_inner))

    def _branch(self, xz, sfx):
        L = xz.shape[-1]
        x, z = xz.chunk(2, dim=1)                     # (B, d_inner, L) each
        conv = getattr(self, f"conv1d{sfx}")
        x = torch.nn.functional.silu(conv(x)[..., :L])
        x_dbl = getattr(self, f"x_proj{sfx}")(x.transpose(1, 2))
        dt, B, C = torch.split(
            x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1)
        dt_proj = getattr(self, f"dt_proj{sfx}")
        # fused-path semantics: weight only; the bias enters as delta_bias
        dt = (dt @ dt_proj.weight.t()).transpose(1, 2)  # (B, d_inner, L)
        A = -torch.exp(getattr(self, f"A{sfx}_log" if sfx else "A_log").float())
        return _loop_selective_scan(
            x, dt, A, B.transpose(1, 2), C.transpose(1, 2),
            D=getattr(self, f"D{sfx}"), z=z,
            delta_bias=dt_proj.bias.float(), delta_softplus=True,
        )

    def forward(self, x):                             # (B, L, C)
        xz = self.in_proj(x).transpose(1, 2)          # (B, 2*d_inner, L)
        y = self._branch(xz, "")
        y_b = self._branch(xz.flip(-1), "_b").flip(-1)
        return self.out_proj((y + y_b).transpose(1, 2))


def _randomized(ref):
    g = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.8, 0.8, generator=g))
        # keep the decays stable: A = -exp(A_log) in [-e^0.5, -e^-3]
        ref.A_log.uniform_(-3.0, 0.5, generator=g)
        ref.A_b_log.uniform_(-3.0, 0.5, generator=g)
    return ref


def _port(template, ref):
    from accunet_tpu.port import import_torch_state

    return import_torch_state(template, ref.state_dict(), strict=True)


@pytest.mark.quick  # quick-tier representative: bimamba-v2 oracle parity
def test_bimamba_v2_parity():
    ref = _randomized(BiMambaV2Oracle(16, d_state=16, d_conv=4, expand=2)).eval()
    x = np.random.RandomState(0).rand(2, 25, 16).astype(np.float32) - 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    from accunet_tpu.nn.ssm import BiMamba

    model = BiMamba(16, d_state=16, d_conv=4, expand=2)
    xj = jnp.asarray(x)
    variables = _port(model.init(jax.random.PRNGKey(0), xj), ref)
    got = np.asarray(model.apply(variables, xj))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_plain_mamba_layer_parity():
    """The baseline MambaLayer wrapper (segmamba.py:49-76): token LayerNorm
    + bimamba mixer + residual on a (B, C, H, W) map."""

    class MambaLayerOracle(torch.nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.norm = torch.nn.LayerNorm(dim)
            self.mamba = BiMambaV2Oracle(dim, d_state=16, d_conv=4, expand=2)

        def forward(self, x):                        # (B, C, H, W)
            b, c, h, w = x.shape
            x_flat = x.reshape(b, c, h * w).transpose(-1, -2)
            out = self.mamba(self.norm(x_flat))
            return (x_flat + out).transpose(-1, -2).reshape(b, c, h, w)

    ref = MambaLayerOracle(8).eval()
    _randomized(ref.mamba)
    x = np.random.RandomState(1).rand(1, 8, 6, 6).astype(np.float32) - 0.5
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    from accunet_tpu.models.segmamba import PlainMambaLayer

    model = PlainMambaLayer(8)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = _port(model.init(jax.random.PRNGKey(0), xj), ref)
    got = np.asarray(model.apply(variables, xj)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
