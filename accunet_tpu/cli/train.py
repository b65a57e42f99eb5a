"""Training entry point.

Replaces /root/reference/Experiments/train_model.py (which selects everything
by editing Config.py globals) with flags + presets:

    python -m accunet_tpu.cli.train --model ACC_UNet --task ISIC18 \
        --train-dir /data/ISIC18/Train_Folder --val-dir /data/ISIC18/Val_Folder \
        [--set train.lr=3e-4 data.batch_size=16 ...]

Covers the reference behaviors: seeding (train_model.py:837-848), model
factory (:351-640), Adam/SGD select (:642-647), WeightedDiceBCE /
BinaryDiceBCE / DS-adapter loss select (:700-737), cosine warm restarts
(:738), best-dice checkpointing + early stopping (:782-831), resume
(:672-689), epoch logging (Train_one_epoch.py:169-198).
"""

from __future__ import annotations

import argparse
import functools
import logging
import os
import sys


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        try:
            out[k] = eval(v, {}, {})  # numbers/bools/strings
        except Exception:
            out[k] = v
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ACC_UNet")
    ap.add_argument("--task", default="ISIC18")
    ap.add_argument("--train-dir", required=True)
    ap.add_argument("--val-dir", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--resume", default=None, help="checkpoint path to resume")
    ap.add_argument("--set", nargs="*", default=[], help="dotted config overrides")
    ap.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args(argv)

    from accunet_tpu.config import get_config
    from accunet_tpu.data.dataset import SegmentationDataset
    from accunet_tpu.data.loader import BatchLoader
    from accunet_tpu.data.transforms import RandomGenerator, ValGenerator
    from accunet_tpu.models import build as build_model
    from accunet_tpu.train import losses as L
    from accunet_tpu.train.engine import fit, make_train_fns, restore_checkpoint

    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = get_config(args.model, args.task)
    cfg.data.train_dir, cfg.data.val_dir = args.train_dir, args.val_dir
    if args.epochs:
        cfg.train.epochs = args.epochs
    if args.ckpt_dir:
        cfg.train.ckpt_dir = args.ckpt_dir
    cfg = cfg.override(parse_overrides(args.set))

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    np.random.seed(cfg.train.seed)

    train_ds = SegmentationDataset(cfg.data.train_dir, cfg.data.img_size)
    val_ds = SegmentationDataset(cfg.data.val_dir, cfg.data.img_size)
    train_tf = RandomGenerator((cfg.data.img_size, cfg.data.img_size))
    val_tf = ValGenerator((cfg.data.img_size, cfg.data.img_size))
    train_loader = BatchLoader(
        train_ds, cfg.data.batch_size, train_tf, shuffle=True,
        seed=cfg.train.seed, drop_last=True,
    )
    val_loader = BatchLoader(val_ds, cfg.data.batch_size, val_tf, pad_last=True)

    sample, _ = train_ds[0]
    n_ch = sample["image"].shape[-1]
    model = build_model(
        args.model,
        n_channels=n_ch,
        n_classes=1,
        dtype=jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32,
    ) if not args.model.startswith("Segmamba") else build_model(
        args.model, in_chans=n_ch, out_chans=1
    )

    loss_fn = L.LOSSES[cfg.train.loss]
    example = next(iter(val_loader))
    example = {"image": jnp.asarray(example["image"]), "mask": jnp.asarray(example["mask"])}
    fns = make_train_fns(
        model,
        example,
        loss_fn=loss_fn,
        learning_rate=cfg.train.lr,
        optimizer_name=cfg.train.optimizer,
        steps_per_epoch=max(len(train_loader), 1),
        rng=jax.random.PRNGKey(cfg.train.seed),
    )
    if args.resume:
        state, meta = restore_checkpoint(args.resume, fns.state)
        fns = fns.__class__(fns.train_step, fns.eval_step, state, fns.optimizer)
        logging.info("resumed from %s at epoch %s", args.resume, meta.get("epoch"))

    def device_batches(loader):
        def gen():
            for b in loader:
                yield {"image": jnp.asarray(b["image"]), "mask": jnp.asarray(b["mask"])}
        return gen()

    state, history = fit(
        fns,
        functools.partial(device_batches, train_loader),
        functools.partial(device_batches, val_loader),
        epochs=cfg.train.epochs,
        ckpt_dir=cfg.train.ckpt_dir,
        early_stop_patience=cfg.train.early_stop_patience,
    )
    logging.info("done: best val dice %.4f",
                 max((h["val"].get("dice", 0) for h in history), default=0))


if __name__ == "__main__":
    main()
