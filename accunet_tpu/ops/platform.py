"""Target-platform probe for kernel dispatch.

Pallas kernels dispatch on "are we lowering for a real TPU?". The ambient
check ``jax.devices()[0].platform == "tpu"`` is wrong in one important
setting: offline AOT compilation (``benchmarks/aot_check.py``) traces on CPU
(``JAX_PLATFORMS=cpu``) but lowers against a deviceless TPU topology — there
the ambient probe says "cpu", every env-gated kernel silently falls back to
its XLA/interpret path, and the checker validates nothing (this exact hole
let the fused-ResPath tiling bug and the gb>1 scoped-VMEM OOM reach the
measured 2026-08-18 window unseen — ROOFLINE §10).

``ACCUNET_FORCE_TPU_PATH=1`` asserts "the lowering target is TPU" regardless
of the ambient backend. It is set by the offline checker only; production
code paths never need it.
"""

from __future__ import annotations

import os

import jax


def on_tpu() -> bool:
    """True when compute should take the real-TPU (Mosaic) path."""
    if os.environ.get("ACCUNET_FORCE_TPU_PATH") == "1":
        return True
    return jax.devices()[0].platform == "tpu"
