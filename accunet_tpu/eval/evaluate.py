"""Evaluation harness — per-image dice/IoU + extended confusion metrics.

Replaces /root/reference/Experiments/test_model.py:31-265 and
test_model_flop.py:917-985:
  * 0.5-threshold per-image dice and IoU (test_model.py:31-46)
  * sensitivity/specificity/precision/recall/F1/accuracy + per-image device
    time (test_model_flop.py:192,917-937)
  * artifacts: `test.result`-style text append, metrics CSV, optional
    per-image .npz dumps (replacing the reference's pickle dumps,
    test_model.py:57-65)

TPU redesign: instead of the reference's batch-1 DataParallel loop, images
are evaluated in sharded batches through one jitted forward; only the final
per-image binary masks come back to host.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from accunet_tpu.train import metrics as M


@dataclasses.dataclass
class EvalResult:
    n_images: int
    dice: float
    iou: float
    extended: dict
    per_image: list
    seconds_per_image: float

    def summary_line(self, model_name: str, task_name: str) -> str:
        return (
            f"model={model_name} task={task_name} n={self.n_images} "
            f"dice={self.dice:.4f} iou={self.iou:.4f} "
            + " ".join(f"{k}={v:.4f}" for k, v in self.extended.items())
        )


def evaluate_model(
    apply_fn,
    variables,
    loader: Iterable,
    threshold: float = 0.5,
    apply_sigmoid: bool = False,
    dump_dir: str | None = None,
    result_file: str | None = None,
    csv_file: str | None = None,
    model_name: str = "model",
    task_name: str = "task",
) -> EvalResult:
    """apply_fn(variables, images) -> probability/logit maps (NHWC).
    `apply_sigmoid` mirrors the eval scripts re-sigmoiding raw-logit models."""

    fwd = jax.jit(apply_fn)
    per_image = []
    t_total = 0.0
    n = 0
    for batch in loader:
        imgs = jnp.asarray(batch["image"])
        t0 = time.perf_counter()
        preds = fwd(variables, imgs)
        preds = jax.block_until_ready(preds)
        t_total += time.perf_counter() - t0
        preds = np.asarray(preds, np.float32)
        if apply_sigmoid:
            preds = 1.0 / (1.0 + np.exp(-preds))
        masks = np.asarray(batch["mask"], np.float32)
        count = batch.get("count", preds.shape[0])
        for i in range(count):
            g = masks[i, ..., 0] if masks.ndim == 4 else masks[i]
            if preds.shape[-1] == 1:
                p = preds[i, ..., 0]
                pb = (p > threshold).astype(np.uint8)
                gb = (g > 0).astype(np.uint8)
                entry = {
                    "name": batch["names"][i] if "names" in batch else str(n),
                    "dice": M.np_dice(pb, gb),
                    "iou": M.np_iou(pb, gb),
                    **M.np_confusion_metrics(pb, gb),
                }
            else:
                # multi-class: argmax labels, macro-average the binary
                # metrics over foreground classes (reference eval semantics
                # extended — its scripts only wire the binary path)
                p = preds[i].argmax(-1)
                gi = g.astype(np.int64)
                per_cls = []
                for c in range(1, preds.shape[-1]):
                    pc = (p == c).astype(np.uint8)
                    gc = (gi == c).astype(np.uint8)
                    if pc.sum() == 0 and gc.sum() == 0:
                        continue
                    per_cls.append(
                        {"dice": M.np_dice(pc, gc), "iou": M.np_iou(pc, gc),
                         **M.np_confusion_metrics(pc, gc)}
                    )
                keys = ["dice", "iou", "sensitivity", "specificity",
                        "precision", "recall", "f1", "accuracy"]
                entry = {
                    "name": batch["names"][i] if "names" in batch else str(n),
                    **{
                        k: float(np.mean([e[k] for e in per_cls]))
                        if per_cls else 1.0
                        for k in keys
                    },
                }
                pb, gb = p, gi  # for the npz dump below
            per_image.append(entry)
            if dump_dir:
                os.makedirs(dump_dir, exist_ok=True)
                np.savez_compressed(
                    os.path.join(dump_dir, f"{os.path.splitext(entry['name'])[0]}.npz"),
                    input=np.asarray(batch["image"][i]),
                    output=preds[i],
                    gt=g,
                    dice=entry["dice"],
                    iou=entry["iou"],
                )
            n += 1

    dice = float(np.mean([e["dice"] for e in per_image])) if per_image else 0.0
    iou = float(np.mean([e["iou"] for e in per_image])) if per_image else 0.0
    ext_keys = ["sensitivity", "specificity", "precision", "recall", "f1", "accuracy"]
    extended = {
        k: float(np.mean([e[k] for e in per_image])) if per_image else 0.0
        for k in ext_keys
    }
    result = EvalResult(n, dice, iou, extended, per_image, t_total / max(n, 1))

    if result_file:
        with open(result_file, "a") as f:
            f.write(result.summary_line(model_name, task_name) + "\n")
    if csv_file:
        import csv

        with open(csv_file, "w", newline="") as f:
            writer = csv.DictWriter(
                f, fieldnames=["name", "dice", "iou", *ext_keys]
            )
            writer.writeheader()
            for e in per_image:
                writer.writerow({k: e[k] for k in ["name", "dice", "iou", *ext_keys]})
    return result
