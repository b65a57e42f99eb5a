"""KAN (Kolmogorov-Arnold Network) stack: B-spline KANLinear + fractional
Jacobi neural block base activation.

Parity targets:
  * jacobi_polynomial — closed-form Jacobi polynomials of x^gamma on [a,b]
    (/root/reference/Experiments/nets/archs/jacobi_polynomials.py:410-...;
    degrees 1..3 are the ones the zoo instantiates, fJNB uses degree 3)
  * FractionalJacobiNeuralBlock — learnable alpha,beta (elu+1), gamma
    (sigmoid), evaluated on sigmoid(x) over [0,1]
    (/root/reference/Experiments/nets/archs/fJNB.py:8-54)
  * KANLinear — base path W_b·act(x) plus spline path: B-spline bases of x
    (Cox-de-Boor recursion on a fixed uniform grid buffer) matmul'd against
    per-(out,in) spline weights with standalone scaler
    (/root/reference/Experiments/nets/archs/kan_fJNB.py:6-180; the SiLU-base
    variant is archs/kan.py)
  * KAN — sequential KANLinear layers (archs/kan_fJNB.py:238-282)

TPU notes: the spline path is evaluated as one (batch, in*(grid+order)) x
(in*(grid+order), out) matmul — MXU-friendly; the Cox-de-Boor recursion is
`spline_order` VPU passes over static-shaped tensors.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def jacobi_polynomial(x, n: int, alpha, beta, gamma, a: float, b: float):
    """Closed-form Jacobi polynomial P_n^(alpha,beta) of (2x^gamma-a-b)/(b-a),
    matching jacobi_polynomials.py:410+ (degrees 1..6 supported there; 1..3
    implemented here — the zoo only uses degree 3)."""
    t = (2 * x ** gamma - a - b) / (b - a)
    if n == 0:
        return x / (x + 1e-7)
    if n == 1:
        return (alpha - beta + (alpha + beta + 2) * t) / 2
    u = t - 1
    if n == 2:
        return (
            (alpha + 1) * (alpha + 2) / 2
            + (alpha + 2) * (3 + alpha + beta) * u / 2
            + (3 + alpha + beta) * (4 + alpha + beta) * u ** 2 / 8
        )
    if n == 3:
        return (
            (alpha + 1) * (alpha + 2) * (3 + alpha) / 6
            + (alpha + 2) * (3 + alpha) * (4 + alpha + beta) * u / 4
            + (3 + alpha) * (4 + alpha + beta) * (5 + alpha + beta) * u ** 2 / 8
            + (4 + alpha + beta) * (5 + alpha + beta) * (6 + alpha + beta) * u ** 3 / 48
        )
    ab = alpha + beta
    if n == 4:
        return (
            (alpha + 1) * (alpha + 2) * (3 + alpha) * (4 + alpha) / 24
            + (alpha + 2) * (3 + alpha) * (4 + alpha) * (5 + ab) * u / 12
            + (3 + alpha) * (4 + alpha) * (5 + ab) * (6 + ab) * u ** 2 / 16
            + (4 + alpha) * (5 + ab) * (6 + ab) * (7 + ab) * u ** 3 / 48
            + (5 + ab) * (6 + ab) * (7 + ab) * (8 + ab) * u ** 4 / 384
        )
    if n == 5:
        return (
            (alpha + 1) * (alpha + 2) * (alpha + 3) * (alpha + 4) * (alpha + 5) / 120
            + (alpha + 2) * (alpha + 3) * (alpha + 4) * (alpha + 5) * (6 + ab) * u / 48
            + (alpha + 3) * (alpha + 4) * (alpha + 5) * (6 + ab) * (7 + ab) * u ** 2 / 48
            + (alpha + 4) * (alpha + 5) * (6 + ab) * (7 + ab) * (8 + ab) * u ** 3 / 96
            + (alpha + 5) * (6 + ab) * (7 + ab) * (8 + ab) * (9 + ab) * u ** 4 / 384
            + (6 + ab) * (7 + ab) * (8 + ab) * (9 + ab) * (10 + ab) * u ** 5 / 3840
        )
    raise NotImplementedError(f"jacobi degree {n}")


def rational_jacobi_polynomial(x, n: int, alpha, beta, zeta, iota):
    """Rational Jacobi polynomial with argument x^z/sqrt(x^2z + iota^2) - 1
    (jacobi_polynomials.py:1-195, degrees 1..3 implemented)."""
    u = x ** zeta / jnp.sqrt(x ** (2 * zeta) + iota ** 2) - 1
    if n == 1:
        return (alpha - beta + (alpha + beta + 2) * u) / 2
    if n == 2:
        return (
            (alpha + 1) * (alpha + 2) / 2
            + (alpha + 2) * (3 + alpha + beta) * u / 2
            + (3 + alpha + beta) * (4 + alpha + beta) * u ** 2 / 8
        )
    if n == 3:
        return (
            (alpha + 1) * (alpha + 2) * (3 + alpha) / 6
            + (alpha + 2) * (3 + alpha) * (4 + alpha + beta) * u / 4
            + (3 + alpha) * (4 + alpha + beta) * (5 + alpha + beta) * u ** 2 / 8
            + (4 + alpha + beta) * (5 + alpha + beta) * (6 + alpha + beta) * u ** 3 / 48
        )
    raise NotImplementedError(f"rational jacobi degree {n}")


# shifted_jacobi_polynomial (jacobi_polynomials.py:196+) matches
# jacobi_polynomial's closed forms exactly
shifted_jacobi_polynomial = jacobi_polynomial


class JacobiRKAN(nn.Module):
    """Rational Jacobi activation (archs/rkan.py:93-129)."""

    degree: int = 3

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
        beta = self.param("beta", nn.initializers.ones, (1,), jnp.float32)
        iota = self.param("iota", nn.initializers.ones, (1,), jnp.float32)
        return rational_jacobi_polynomial(
            x, self.degree, jax.nn.elu(alpha, 1.0), jax.nn.elu(beta, 1.0),
            1.0, jax.nn.softplus(iota),
        )


class PadeRKAN(nn.Module):
    """Pade [p/q] rational of shifted Jacobi polynomials (archs/rkan.py:8-90)."""

    degree_p: int = 2
    degree_q: int = 6

    @nn.compact
    def __call__(self, x):
        ap = self.param("alpha_p", nn.initializers.ones, (1,), jnp.float32)
        bp = self.param("beta_p", nn.initializers.ones, (1,), jnp.float32)
        zp = self.param("zeta_p", nn.initializers.zeros, (1,), jnp.float32)
        wp = self.param("w_p", nn.initializers.ones, (self.degree_p,), jnp.float32)
        aq = self.param("alpha_q", nn.initializers.ones, (1,), jnp.float32)
        bq = self.param("beta_q", nn.initializers.ones, (1,), jnp.float32)
        zq = self.param("zeta_q", nn.initializers.zeros, (1,), jnp.float32)
        wq = self.param("w_q", nn.initializers.ones, (self.degree_q,), jnp.float32)

        s = jax.nn.sigmoid(x)

        def poly(w, a, b, z, degree):
            out = w[0] + w[1] * s
            for deg in range(2, degree):
                out = out + w[deg] * shifted_jacobi_polynomial(
                    s, deg, jax.nn.elu(a, 1.0), jax.nn.elu(b, 1.0),
                    jax.nn.sigmoid(z), 0.0, 1.0,
                )
            return out

        return poly(wp, ap, bp, zp, self.degree_p) / poly(wq, aq, bq, zq, self.degree_q)


class FractionalJacobiNeuralBlock(nn.Module):
    degree: int = 3

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
        beta = self.param("beta", nn.initializers.ones, (1,), jnp.float32)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        na = jax.nn.elu(alpha, 1.0)
        nb = jax.nn.elu(beta, 1.0)
        ng = jax.nn.sigmoid(gamma)
        return jacobi_polynomial(jax.nn.sigmoid(x), self.degree, na, nb, ng, 0.0, 1.0)


def b_splines(x, grid, spline_order: int):
    """Cox-de-Boor B-spline bases. x (batch, in), grid (in, G+2K+1) →
    (batch, in, G+K)."""
    x = x[..., None]
    bases = ((x >= grid[:, :-1]) & (x < grid[:, 1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (x - grid[:, : -(k + 1)]) / (grid[:, k:-1] - grid[:, : -(k + 1)])
        right = (grid[:, k + 1 :] - x) / (grid[:, k + 1 :] - grid[:, 1:-k])
        bases = left * bases[:, :, :-1] + right * bases[:, :, 1:]
    return bases


class KANLinear(nn.Module):
    in_features: int
    out_features: int
    grid_size: int = 5
    spline_order: int = 3
    base_activation: str = "fjnb"  # 'fjnb' | 'silu'
    grid_range: tuple = (-1.0, 1.0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g, k = self.grid_size, self.spline_order
        h = (self.grid_range[1] - self.grid_range[0]) / g
        grid = (
            jnp.arange(-k, g + k + 1, dtype=jnp.float32) * h + self.grid_range[0]
        )
        grid = jnp.broadcast_to(grid, (self.in_features, g + 2 * k + 1))

        base_weight = self.param(
            "base_weight",
            nn.initializers.he_uniform(),
            (self.out_features, self.in_features),
            jnp.float32,
        )
        spline_weight = self.param(
            "spline_weight",
            nn.initializers.normal(0.1 / g),
            (self.out_features, self.in_features, g + k),
            jnp.float32,
        )
        spline_scaler = self.param(
            "spline_scaler",
            nn.initializers.he_uniform(),
            (self.out_features, self.in_features),
            jnp.float32,
        )

        xf = x.astype(jnp.float32)
        if self.base_activation == "fjnb":
            act = FractionalJacobiNeuralBlock(3, name="base_activation")(xf)
        elif self.base_activation == "rkan":  # kan_r.py:54 JacobiRKAN(3)
            act = JacobiRKAN(3, name="base_activation")(xf)
        elif self.base_activation == "pade":
            act = PadeRKAN(2, 6, name="base_activation")(xf)
        else:
            act = jax.nn.silu(xf)
        base_out = act @ base_weight.T

        bases = b_splines(xf, grid, k)  # (batch, in, g+k)
        scaled = spline_weight * spline_scaler[..., None]
        spline_out = bases.reshape(x.shape[0], -1) @ scaled.reshape(
            self.out_features, -1
        ).T
        return (base_out + spline_out).astype(self.dtype)


class KAN(nn.Module):
    """Sequential KANLinear stack over flattened feature vectors."""

    layers_hidden: Sequence[int]
    grid_size: int = 5
    spline_order: int = 3
    base_activation: str = "fjnb"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dims = list(self.layers_hidden)
        for i, (fin, fout) in enumerate(zip(dims[:-1], dims[1:])):
            x = KANLinear(
                fin,
                fout,
                self.grid_size,
                self.spline_order,
                self.base_activation,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x)
        return x


class FKANMLP(nn.Module):
    """LayerNorm → KAN([dim, mlp_dim, dim]) over tokens (B, N, C)
    (flagship :424-452); dropout inert at eval."""

    dim: int
    mlp_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        y = KAN((self.dim, self.mlp_dim, self.dim), dtype=self.dtype, name="kan")(
            y.reshape(b * n, c)
        )
        return y.reshape(b, n, c)
