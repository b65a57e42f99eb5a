"""Segmentation metrics.

Two tiers:
  * jnp (in-graph) metrics for the jitted train/eval step — no host syncs in
    the hot loop, unlike the reference's per-batch `.item()` round-trips
    (Experiments/Train_one_epoch.py:134-135).
  * numpy (host) per-image metrics matching the eval scripts exactly:
      - iou_on_batch / dice_on_batch: sigmoid → 0.5 threshold, binarize mask
        (Experiments/utils.py:478-519)
      - show_image_with_dice: 0.5 threshold on given probs
        (Experiments/test_model.py:31-39)
      - confusion-matrix metrics: sensitivity/specificity/precision/recall/
        F1/accuracy (Experiments/test_model_flop.py:917-937)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SMOOTH = 1e-5


# ---------------------------------------------------------------- in-graph


def hard_masks(pred, target, apply_sigmoid=True, threshold=0.5):
    p = jax.nn.sigmoid(pred) if apply_sigmoid else pred
    p = (p >= threshold).astype(jnp.float32)
    t = (target > 0).astype(jnp.float32)
    return p, t


def batch_iou(pred, target, apply_sigmoid=True):
    """Mean per-image Jaccard (matches sklearn jaccard_score on flat binary
    arrays, utils.py:484-494)."""
    p, t = hard_masks(pred, target, apply_sigmoid)
    b = p.shape[0]
    p = p.reshape(b, -1)
    t = t.reshape(b, -1)
    inter = (p * t).sum(-1)
    union = p.sum(-1) + t.sum(-1) - inter
    return jnp.where(union > 0, inter / union, 1.0).mean()


def multiclass_batch_iou(logits, target, smooth=1e-7):
    """Mean foreground IoU for (n_classes+1)-way heads (argmax semantics of
    the reference eval, test_model.py:46 / evaluate.py multi-class branch)."""
    if isinstance(logits, (tuple, list)):
        logits = logits[0]
    if target.ndim == logits.ndim:
        target = target[..., 0]
    k = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    target = target.astype(pred.dtype)
    ious = []
    for c in range(1, k):
        pc = (pred == c).astype(jnp.float32)
        tc = (target == c).astype(jnp.float32)
        inter = (pc * tc).sum(axis=(1, 2))
        union = pc.sum((1, 2)) + tc.sum((1, 2)) - inter
        ious.append((inter + smooth) / (union + smooth))
    return jnp.stack(ious).mean()


def batch_dice(pred, target, apply_sigmoid=True):
    """Mean per-image dice with smooth 1e-5 (utils.py:496-519)."""
    p, t = hard_masks(pred, target, apply_sigmoid)
    b = p.shape[0]
    p = p.reshape(b, -1)
    t = t.reshape(b, -1)
    inter = (p * t).sum(-1)
    return ((2 * inter + _SMOOTH) / (p.sum(-1) + t.sum(-1) + _SMOOTH)).mean()


def confusion_counts(pred, target, apply_sigmoid=True):
    p, t = hard_masks(pred, target, apply_sigmoid)
    tp = (p * t).sum()
    fp = (p * (1 - t)).sum()
    fn = ((1 - p) * t).sum()
    tn = ((1 - p) * (1 - t)).sum()
    return tp, fp, fn, tn


# ---------------------------------------------------------------- host-side


def np_dice(pred_bin: np.ndarray, gt_bin: np.ndarray) -> float:
    a = pred_bin.reshape(-1).astype(np.float64)
    b = gt_bin.reshape(-1).astype(np.float64)
    inter = float((a * b).sum())
    return (2 * inter + _SMOOTH) / (a.sum() + b.sum() + _SMOOTH)


def np_iou(pred_bin: np.ndarray, gt_bin: np.ndarray) -> float:
    a = pred_bin.reshape(-1) > 0
    b = gt_bin.reshape(-1) > 0
    union = float(np.logical_or(a, b).sum())
    if union == 0:
        return 1.0
    return float(np.logical_and(a, b).sum()) / union


def np_confusion_metrics(pred_bin: np.ndarray, gt_bin: np.ndarray) -> dict:
    p = pred_bin.reshape(-1) > 0
    t = gt_bin.reshape(-1) > 0
    tp = float(np.logical_and(p, t).sum())
    fp = float(np.logical_and(p, ~t).sum())
    fn = float(np.logical_and(~p, t).sum())
    tn = float(np.logical_and(~p, ~t).sum())
    eps = 1e-12
    sens = tp / (tp + fn + eps)
    spec = tn / (tn + fp + eps)
    prec = tp / (tp + fp + eps)
    f1 = 2 * prec * sens / (prec + sens + eps)
    acc = (tp + tn) / (tp + tn + fp + fn + eps)
    return {
        "sensitivity": sens,
        "specificity": spec,
        "precision": prec,
        "recall": sens,
        "f1": f1,
        "accuracy": acc,
    }


def np_auc(gt: np.ndarray, probs: np.ndarray) -> float:
    """ROC AUC by rank statistic (equivalent to sklearn roc_auc_score for
    binary labels; utils.py:467-476 analogue without the sklearn dep)."""
    y = gt.reshape(-1) > 0
    s = probs.reshape(-1).astype(np.float64)
    n_pos = int(y.sum())
    n_neg = y.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty_like(s)
    ranks[order] = np.arange(1, s.size + 1)
    # average ranks over ties
    sorted_s = s[order]
    uniq, inv, counts = np.unique(sorted_s, return_inverse=True, return_counts=True)
    cum = np.cumsum(counts)
    avg_rank_per_val = cum - (counts - 1) / 2.0
    ranks[order] = avg_rank_per_val[inv]
    rank_sum_pos = ranks[y].sum()
    return float((rank_sum_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
