"""SS2D — 4-direction 2D selective scan (VMamba-style) and the MedMamba
SS_Conv_SSM block (NHWC).

Parity targets:
  * SS2D.forward_corev0 — scan directions [row-major, col-major, and their
    reverses], shared per-direction projections, outputs re-aligned and
    summed (/root/reference/Experiments/nets/MedMamba.py:378-415, 455-473)
  * SS_Conv_SSM — channel-split conv/SSM branches + channel shuffle
    (MedMamba.py:492-528)
The same SS2D is used by KNUnet (nets/KNUnet.py:582).

All four directional scans are batched into ONE call of the Pallas chunked
scan (K folded into the batch axis) — the TPU replacement for the CUDA
kernel's K-way batching.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.ops.selective_scan import selective_scan

Dtype = Any


class SS2D(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: int = 2
    dt_rank: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        l = h * w
        K = 4

        xz = nn.Dense(2 * d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        xs_map, z = xz[..., :d_inner], xz[..., d_inner:]
        xs_map = nn.Conv(
            d_inner, (self.d_conv, self.d_conv), padding="SAME",
            feature_group_count=d_inner, dtype=self.dtype, name="conv2d",
        )(xs_map)
        xs_map = jax.nn.silu(xs_map)

        x_proj_weight = self.param(
            "x_proj_weight", nn.initializers.lecun_normal(),
            (K, dt_rank + 2 * self.d_state, d_inner), jnp.float32,
        )
        dt_projs_weight = self.param(
            "dt_projs_weight", nn.initializers.lecun_normal(),
            (K, d_inner, dt_rank), jnp.float32,
        )
        dt_projs_bias = self.param(
            "dt_projs_bias",
            lambda key, shape: jnp.log(jnp.expm1(jnp.full(shape, 0.01))),
            (K, d_inner),
        )
        a_logs = self.param(
            "A_logs",
            lambda key, shape: jnp.log(
                jnp.broadcast_to(
                    jnp.arange(1, self.d_state + 1, dtype=jnp.float32), shape
                )
            ),
            (K, d_inner, self.d_state),
        )
        ds = self.param("Ds", nn.initializers.ones, (K, d_inner), jnp.float32)

        # build the 4 directional sequences (B, K, D, L)
        x_bdl = xs_map.reshape(b, l, d_inner).transpose(0, 2, 1)
        x_wh = (
            xs_map.transpose(0, 2, 1, 3).reshape(b, l, d_inner).transpose(0, 2, 1)
        )
        xs = jnp.stack(
            [x_bdl, x_wh, x_bdl[..., ::-1], x_wh[..., ::-1]], axis=1
        )  # (B,K,D,L)

        x_dbl = jnp.einsum(
            "bkdl,kcd->bkcl", xs, x_proj_weight.astype(xs.dtype)
        )
        dts = x_dbl[:, :, :dt_rank]
        bs = x_dbl[:, :, dt_rank : dt_rank + self.d_state]
        cs = x_dbl[:, :, dt_rank + self.d_state :]
        dts = jnp.einsum("bkrl,kdr->bkdl", dts, dt_projs_weight.astype(dts.dtype))

        As = -jnp.exp(a_logs)  # (K, D, N)
        from accunet_tpu.parallel import seq_scan as _seq

        if _seq.active() is not None:
            # sequence-parallel mode: shard_map (inside the scan core) does
            # not compose with vmap, so unroll the K=4 directions — same
            # math, each direction's scan L-axis rides the mesh's seq axis
            y = jnp.stack(
                [
                    selective_scan(
                        xs[:, k], dts[:, k], As[k], bs[:, k], cs[:, k],
                        ds[k], delta_bias=dt_projs_bias[k],
                        delta_softplus=True,
                    )
                    for k in range(K)
                ],
                axis=1,
            )  # (B, K, D, L)
        else:
            y = jax.vmap(
                lambda xk, dk, bk, ck, ak, dsk, biask: selective_scan(
                    xk, dk, ak, bk, ck, dsk, delta_bias=biask,
                    delta_softplus=True
                ),
                in_axes=(1, 1, 1, 1, 0, 0, 0),
                out_axes=1,
            )(
                xs, dts, bs, cs, As, ds, dt_projs_bias
            )  # (B, K, D, L)

        y0 = y[:, 0]
        inv = y[:, 2:4][..., ::-1]
        y_inv0 = inv[:, 0]
        wh = y[:, 1].reshape(b, d_inner, w, h).transpose(0, 1, 3, 2).reshape(b, d_inner, l)
        wh_inv = inv[:, 1].reshape(b, d_inner, w, h).transpose(0, 1, 3, 2).reshape(b, d_inner, l)

        yy = y0 + y_inv0 + wh + wh_inv
        yy = yy.transpose(0, 2, 1).reshape(b, h, w, d_inner)
        yy = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(yy)
        yy = yy * jax.nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(yy)


def channel_shuffle(x, groups: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    return x.transpose(0, 1, 2, 4, 3).reshape(b, h, w, c)


class SSConvSSM(nn.Module):
    """MedMamba SS_Conv_SSM (MedMamba.py:492-528)."""

    hidden_dim: int
    d_state: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.hidden_dim // 2
        left, right = x[..., :half], x[..., half:]
        r = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln__1")(right)
        r = SS2D(half, self.d_state, dtype=self.dtype, name="self_attention")(r)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        y = bn("conv_0")(left)
        y = jax.nn.relu(bn("conv_2")(nn.Conv(half, (3, 3), padding="SAME", dtype=self.dtype, name="conv_1")(y)))
        y = jax.nn.relu(bn("conv_5")(nn.Conv(half, (3, 3), padding="SAME", dtype=self.dtype, name="conv_4")(y)))
        y = jax.nn.relu(nn.Conv(half, (1, 1), dtype=self.dtype, name="conv_7")(y))
        out = jnp.concatenate([y, r], axis=-1)
        return channel_shuffle(out, 2) + x
