"""Seg-Grad-CAM — class activation maps for segmentation.

Replaces /root/reference/Experiments/gradcam_segmentation.py:152-279. The
reference registers forward/backward hooks on a torch layer; here the same
quantity is computed functionally: the target module's output A is captured
once, then the score is differentiated w.r.t. an additive perturbation on A
injected through flax's `nn.intercept_methods` — giving exactly dScore/dA.

    score = mean(logits)                   (binary; gradcam_segmentation.py:197)
          | mean(logits[argmax channel])   (multi-class; :204-214)
    CAM   = ReLU( sum_c mean_hw(dScore/dA_c) · A_c )   (:218-229)

resized bilinearly to the input and min-max normalized to [0,1] (:233-247).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from accunet_tpu.ops.resize import resize_bilinear


def _score(logits, class_idx):
    if logits.shape[-1] == 1:
        return logits.mean()
    if class_idx is not None:
        return logits[..., class_idx].mean()
    idx = jnp.argmax(logits.sum(axis=(1, 2)), axis=-1)  # per-sample argmax class
    sel = jnp.take_along_axis(logits, idx[:, None, None, None], axis=-1)
    return sel.mean()


def seg_grad_cam(model, variables, x, layer_path, class_idx=None, **apply_kwargs):
    """CAM heatmaps (B, H, W) in [0,1] for the module whose flax path equals
    `layer_path` (tuple of names, e.g. ('cnv92',) or ('vit', 'gscs_3')).
    """
    layer_path = tuple(layer_path)

    # 1. capture the target activation A
    _, state = model.apply(
        variables,
        x,
        capture_intermediates=lambda mdl, _: tuple(mdl.path) == layer_path,
        **apply_kwargs,
    )
    tree = state["intermediates"]
    for p in layer_path:
        tree = tree[p]
    act = tree["__call__"][0]

    # 2. score as a function of an additive perturbation at that point
    def score_fn(delta):
        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            if (
                tuple(context.module.path) == layer_path
                and isinstance(out, jax.Array)
                and out.shape == delta.shape
            ):
                out = out + delta
            return out

        with nn.intercept_methods(interceptor):
            logits = model.apply(variables, x, **apply_kwargs)
        if isinstance(logits, (tuple, list)):
            logits = logits[0]
        return _score(logits, class_idx)

    grads = jax.grad(score_fn)(jnp.zeros_like(act))

    # 3. weight channels by mean gradient, ReLU, resize, normalize
    weights = grads.mean(axis=(1, 2), keepdims=True)
    cam = jax.nn.relu((weights * act).sum(-1))
    cam = resize_bilinear(cam[..., None], x.shape[1:3], align_corners=False)[..., 0]
    cmin = cam.min(axis=(1, 2), keepdims=True)
    cmax = cam.max(axis=(1, 2), keepdims=True)
    return (cam - cmin) / (cmax - cmin + 1e-8)
