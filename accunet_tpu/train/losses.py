"""Segmentation losses (pure jnp, jit-safe).

Behavioral parity with /root/reference/Experiments/utils.py:
  * weighted_bce            — utils.py:21-74   (WeightedBCE; class-balanced
                              BCE-with-logits, weighted *sum*)
  * weighted_dice           — utils.py:109-138 (WeightedDiceLoss; applies
                              sigmoid to its input, pos/neg weighting)
  * weighted_dice_bce       — utils.py:140-171 (WeightedDiceBCE; harness uses
                              dice_weight=0.5, BCE_weight=0.5,
                              train_model.py:720)
  * binary_dice_bce         — utils.py:212-267 (BinaryDiceBCE)
  * gt_bce_dice             — utils.py:269-278 (GT_BceDiceLoss, 5 aux heads)
  * ds_adapter              — utils.py:320-390 (DSAdapterLoss; flat
                              (main, ds1..) or legacy ((gt4..gt1), pred);
                              aux heads upsampled bilinear align_corners=True)
  * hausdorff_dt            — utils.py:392-463 (HausdorffDTLoss; distance
                              transform on host via pure_callback)

Note the reference's quirk: for models whose binary head already applies
sigmoid (e.g. ACC-UNet, ACC_UNet/ACC_UNet.py:594-596), WeightedDiceBCE still
treats the input as logits in the BCE term and re-sigmoids in the dice term.
These functions reproduce that behavior — they are faithful drop-ins, not
"fixed" versions. `soft_dice_show` mirrors `_show_dice` for logging.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bce_with_logits(logit, target):
    # log(1+exp(-|x|)) formulation — numerically stable
    return jnp.maximum(logit, 0) - logit * target + jnp.log1p(jnp.exp(-jnp.abs(logit)))


def weighted_bce(logit, truth, weights=(0.5, 0.5)):
    logit = logit.astype(jnp.float32).reshape(-1)
    truth = truth.astype(jnp.float32).reshape(-1)
    truth = jnp.where(jnp.max(truth) > 1.0, (truth > 0).astype(jnp.float32), truth)
    loss = _bce_with_logits(logit, truth)
    pos = (truth > 0.5).astype(jnp.float32)
    neg = 1.0 - pos
    pos_weight = jnp.clip(pos.sum(), 1.0)
    neg_weight = jnp.clip(neg.sum(), 1.0)
    weighted = weights[0] * pos * loss / pos_weight + weights[1] * neg * loss / neg_weight
    return weighted.sum()


def weighted_dice(logit, truth, weights=(0.5, 0.5), smooth=1e-5):
    b = logit.shape[0]
    logit = logit.astype(jnp.float32).reshape(b, -1)
    truth = truth.astype(jnp.float32).reshape(b, -1)
    p = jax.nn.sigmoid(logit)
    w = jax.lax.stop_gradient(truth) * (weights[1] - weights[0]) + weights[0]
    p = w * p
    t = w * truth
    intersection = (p * t).sum(-1)
    union = (p * p).sum(-1) + (t * t).sum(-1)
    dice = 1 - (2 * intersection + smooth) / (union + smooth)
    return dice.mean()


def weighted_dice_bce(pred, target, dice_weight=0.5, bce_weight=0.5):
    return dice_weight * weighted_dice(pred, target) + bce_weight * weighted_bce(
        pred, target
    )


def soft_dice_show(pred, target):
    """Hard-dice logging metric (WeightedDiceBCE._show_dice, utils.py:149-158):
    sigmoid → 0.5 threshold, binarize target, 1 - weighted_dice(hard)."""
    hard = (jax.nn.sigmoid(pred.astype(jnp.float32)) >= 0.5).astype(jnp.float32)
    t = (target > 0).astype(jnp.float32)
    return 1.0 - weighted_dice(hard, t)


def binary_dice_bce(logits, targets, dice_weight=0.5, bce_weight=0.5, smooth=1e-5):
    targets = targets.astype(jnp.float32)
    if targets.ndim == logits.ndim - 1:  # (B,H,W) -> (B,H,W,1) in NHWC
        targets = targets[..., None]
    targets = targets.reshape(logits.shape)
    bce = _bce_with_logits(logits.astype(jnp.float32), targets).mean()
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    axes = tuple(range(1, logits.ndim))
    intersection = (probs * targets).sum(axes)
    denom = probs.sum(axes) + targets.sum(axes) + smooth
    dice_score = (2.0 * intersection + smooth) / denom
    return dice_weight * (1.0 - dice_score.mean()) + bce_weight * bce


def binary_dice_show(logits, targets, smooth=1e-5):
    """BinaryDiceBCE._show_dice (utils.py:252-267): soft dice on sigmoid probs."""
    targets = targets.astype(jnp.float32).reshape(logits.shape)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    axes = tuple(range(1, logits.ndim))
    intersection = (probs * targets).sum(axes)
    denom = probs.sum(axes) + targets.sum(axes) + smooth
    return ((2.0 * intersection + smooth) / denom).mean()


def gt_bce_dice(gt_pre, out, target, wb=1.0, wd=1.0):
    """5-head GT deep supervision (utils.py:269-278)."""
    base = functools.partial(weighted_dice_bce, dice_weight=wb, bce_weight=wd)
    loss = base(out, target)
    gt5, gt4, gt3, gt2, gt1 = gt_pre
    loss += (
        base(gt5, target) * 0.1
        + base(gt4, target) * 0.2
        + base(gt3, target) * 0.3
        + base(gt2, target) * 0.4
        + base(gt1, target) * 0.5
    )
    return loss


def ds_adapter(
    preds,
    target,
    base_loss=weighted_dice_bce,
    ds_weights=(0.5, 0.3, 0.2),
    main_weight=1.0,
):
    """Deep-supervision wrapper (utils.py:320-375). `preds` is either a plain
    array, a flat tuple (main, ds1, ds2, ...), or legacy ((gt4..gt1), pred).
    Aux heads at lower resolution are upsampled with bilinear
    align_corners=True to match the target (utils.py:360-366), NHWC here."""
    from accunet_tpu.ops.resize import resize_bilinear

    if not isinstance(preds, (tuple, list)):
        return base_loss(preds, target)
    if len(preds) == 2 and isinstance(preds[0], (tuple, list)):
        ds_list, final_pred = list(preds[0]), preds[1]
    else:
        final_pred, ds_list = preds[0], list(preds[1:])

    spatial = target.shape[1:3] if target.ndim == 4 else target.shape[1:3]
    loss = 0.0
    for w, p in zip(ds_weights, ds_list):
        if p.ndim == 4 and p.shape[1:3] != tuple(spatial):
            p = resize_bilinear(p, tuple(spatial), align_corners=True)
        loss = loss + w * base_loss(p, target)
    return loss + main_weight * base_loss(final_pred, target)


def _edt_field(img: np.ndarray) -> np.ndarray:
    """Per-sample foreground+background Euclidean distance transform
    (HausdorffDTLoss.distance_field, utils.py:400-414). Host-side numpy."""
    from scipy.ndimage import distance_transform_edt as edt

    field = np.zeros_like(img, dtype=np.float32)
    for b in range(img.shape[0]):
        fg = img[b] > 0.5
        if fg.any():
            field[b] = edt(fg) + edt(~fg)
    return field


def hausdorff_dt(pred, target, alpha=2.0):
    """Distance-transform Hausdorff loss (utils.py:392-463). The distance
    fields are computed on host (scipy) through pure_callback, mirroring the
    reference's .cpu().numpy() round-trip; they carry no gradient."""
    pred32 = pred.astype(jnp.float32)
    target32 = target.astype(jnp.float32).reshape(pred.shape)
    shape = jax.ShapeDtypeStruct(pred.shape, jnp.float32)
    pred_dt = jax.pure_callback(
        _edt_field, shape, jax.lax.stop_gradient(pred32), vmap_method="sequential"
    )
    target_dt = jax.pure_callback(
        _edt_field, shape, jax.lax.stop_gradient(target32), vmap_method="sequential"
    )
    pred_error = (pred32 - target32) ** 2
    distance = pred_dt ** alpha + target_dt ** alpha
    return (pred_error * distance).mean()


def weighted_dice_bce_hausdorff(
    pred, target, dice_weight=0.4, bce_weight=0.4, hausdorff_weight=0.2
):
    """WeightedDiceBCEHausdorff (utils.py:173-209)."""
    if target.ndim == pred.ndim - 1:
        target = target[..., None]
    return (
        dice_weight * weighted_dice(pred, target)
        + bce_weight * weighted_bce(pred, target)
        + hausdorff_weight * hausdorff_dt(pred, target)
    )


def multiclass_dice_ce(logits, targets, dice_weight=0.5, ce_weight=0.5,
                       smooth=1e-5):
    """Softmax cross-entropy + mean per-class soft dice for (n_classes+1)-way
    heads. The reference's utils.py losses implement only the n_labels==1
    branch (utils.py:33,117 — multi-class falls through to None), so this is
    new capability: the training-side counterpart of the reference's
    multi-class eval argmax (test_model.py head semantics, ACC_UNet.py:654-658).

    logits (B,H,W,K); targets (B,H,W) or (B,H,W,1) integer class ids.
    Deep-supervision tuples get the same aux-head weighting as the binary
    path's ds_adapter (the heads would otherwise be silently discarded when
    training e.g. Segmamba *_ds variants with --n-classes>1)."""
    if isinstance(logits, (tuple, list)):
        base = functools.partial(
            multiclass_dice_ce, dice_weight=dice_weight, ce_weight=ce_weight,
            smooth=smooth,
        )
        return ds_adapter(logits, targets, base_loss=base)
    if targets.ndim == logits.ndim:
        targets = targets[..., 0]
    k = logits.shape[-1]
    targets = targets.astype(jnp.int32)
    onehot = jax.nn.one_hot(targets, k, dtype=logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -(onehot * logp).sum(-1).mean()
    p = jax.nn.softmax(logits, axis=-1)
    inter = (p * onehot).sum(axis=(1, 2))
    union = p.sum(axis=(1, 2)) + onehot.sum(axis=(1, 2))
    dice = 1.0 - ((2 * inter + smooth) / (union + smooth)).mean()
    return ce_weight * ce + dice_weight * dice


def multiclass_dice_show(logits, targets, smooth=1e-5):
    """Hard mean-foreground-dice metric for multi-class heads."""
    if isinstance(logits, (tuple, list)):
        logits = logits[0]
    if targets.ndim == logits.ndim:
        targets = targets[..., 0]
    k = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    dices = []
    for c in range(1, k):  # foreground classes
        pc = (pred == c).astype(jnp.float32)
        tc = (targets == c).astype(jnp.float32)
        inter = (pc * tc).sum(axis=(1, 2))
        dices.append((2 * inter + smooth) / (pc.sum((1, 2)) + tc.sum((1, 2)) + smooth))
    return jnp.stack(dices).mean()


LOSSES = {
    "weighted_dice_bce": weighted_dice_bce,
    "binary_dice_bce": binary_dice_bce,
    "weighted_dice_bce_hausdorff": weighted_dice_bce_hausdorff,
    "gt_bce_dice": gt_bce_dice,
    "multiclass_dice_ce": multiclass_dice_ce,
}
