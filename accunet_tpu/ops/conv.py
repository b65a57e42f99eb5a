"""Convolution primitives, NHWC / HWIO, TPU-first.

Notes on design (vs the PyTorch reference):
  * 2x2-stride-2 transposed conv (the only transposed conv the model zoo uses,
    e.g. ACC_UNet/ACC_UNet.py:578-590) is implemented as a 1x1 matmul to
    (kH*kW*Cout) followed by depth-to-space. This is mathematically identical
    to torch.nn.ConvTranspose2d(k=2, s=2) — each input pixel independently
    emits a 2x2 output block — but it runs entirely on the MXU with no
    scatter/overlap logic.
  * depthwise conv uses lax.conv_general_dilated with
    feature_group_count=C; the large-kernel Pallas path lives in
    ops/pallas/dwconv2d.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))


def _same_pad(k: int) -> tuple[int, int]:
    # torch padding='same' for odd kernels; even kernels pad one extra on the
    # left/top in torch — handled explicitly where needed.
    lo = (k - 1) // 2
    return (lo, k - 1 - lo) if k % 2 == 0 else (lo, lo)


def conv2d(
    x: jax.Array,
    kernel: jax.Array,  # (kH, kW, Cin, Cout)
    bias: jax.Array | None = None,
    stride: int | Sequence[int] = 1,
    padding: str | Sequence[tuple[int, int]] = "SAME",
    feature_group_count: int = 1,
) -> jax.Array:
    if isinstance(stride, int):
        stride = (stride, stride)
    if padding == "SAME":
        kh, kw = kernel.shape[0], kernel.shape[1]
        padding = [_same_pad(kh), _same_pad(kw)]
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=dn,
        feature_group_count=feature_group_count,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def depthwise_conv2d(
    x: jax.Array,
    kernel: jax.Array,  # (kH, kW, 1, C)
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: str | Sequence[tuple[int, int]] = "SAME",
) -> jax.Array:
    c = x.shape[-1]
    return conv2d(x, kernel, bias, stride, padding, feature_group_count=c)


def conv_transpose_2x2(
    x: jax.Array,
    kernel: jax.Array,  # (2, 2, Cin, Cout)  — torch layout (Cin,Cout,2,2).T(2,3,0,1)
    bias: jax.Array | None = None,
) -> jax.Array:
    """torch.nn.ConvTranspose2d(Cin, Cout, kernel_size=2, stride=2) (NHWC).

    out[b, 2i+ki, 2j+kj, o] = sum_c x[b,i,j,c] * w[ki,kj,c,o] (+ bias).
    Implemented as matmul + depth-to-space.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    wmat = kernel.astype(x.dtype).transpose(2, 0, 1, 3).reshape(cin, kh * kw * cout)
    y = x.reshape(b * h * w, cin) @ wmat  # (BHW, kh*kw*cout)
    y = y.reshape(b, h, w, kh, kw, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * kh, w * kw, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
