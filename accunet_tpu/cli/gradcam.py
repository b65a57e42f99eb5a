"""Seg-Grad-CAM evaluation entry point.

Replaces /root/reference/Experiments/test_model_gradcam.py: loads a trained
checkpoint, computes a Seg-Grad-CAM heatmap per test image at a chosen layer,
and writes per-image artifacts (heatmap .npz always; overlay .png when PIL is
available — the reference saves matplotlib overlays, gradcam_segmentation.py
:289-340).

    python -m accunet_tpu.cli.gradcam --model ACC_UNet --test-dir ... \
        --ckpt ... --layer cnv92 --out-dir cam_out
"""

from __future__ import annotations

import argparse
import logging
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ACC_UNet")
    ap.add_argument("--task", default="ISIC18")
    ap.add_argument("--test-dir", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--torch-ckpt", default=None, help="reference .pth.tar")
    ap.add_argument("--layer", default=None,
                    help="dotted flax module path, e.g. cnv92 or vit.gscs_3 "
                         "(default: the model's last conv-ish block)")
    ap.add_argument("--class-idx", type=int, default=None)
    ap.add_argument("--n-classes", type=int, default=1)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--out-dir", default="gradcam_out")
    ap.add_argument("--limit", type=int, default=None,
                    help="stop after this many images")
    args = ap.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from accunet_tpu.config import get_config
    from accunet_tpu.data.dataset import SegmentationDataset
    from accunet_tpu.data.loader import BatchLoader
    from accunet_tpu.data.transforms import ValGenerator
    from accunet_tpu.eval.gradcam import seg_grad_cam
    from accunet_tpu.models import build as build_model

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    cfg = get_config(args.model, args.task)
    if args.img_size:
        cfg.data.img_size = args.img_size

    ds = SegmentationDataset(
        args.test_dir, cfg.data.img_size, binarize_mask=args.n_classes == 1
    )
    loader = BatchLoader(
        ds, args.batch, ValGenerator((cfg.data.img_size, cfg.data.img_size)),
        pad_last=True,
    )
    sample, _ = ds[0]
    n_ch = sample["image"].shape[-1]
    model = build_model(args.model, n_channels=n_ch, n_classes=args.n_classes)

    x0 = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, n_ch))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    if args.torch_ckpt:
        from accunet_tpu.port import import_torch_state, load_torch_checkpoint

        variables = import_torch_state(
            variables, load_torch_checkpoint(args.torch_ckpt), strict=False
        )
    elif args.ckpt:
        from accunet_tpu.train.engine import make_train_fns, restore_checkpoint

        example = next(iter(loader))
        fns = make_train_fns(
            model,
            {"image": jnp.asarray(example["image"]),
             "mask": jnp.asarray(example["mask"])},
        )
        state, _ = restore_checkpoint(args.ckpt, fns.state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.layer:
        layer_path = tuple(args.layer.split("."))
    else:
        # default: last top-level param-bearing module (decoder-adjacent)
        layer_path = (sorted(variables["params"].keys())[-1],)
    logging.info("CAM layer: %s", "/".join(layer_path))

    os.makedirs(args.out_dir, exist_ok=True)
    n_done = 0
    for batch in loader:
        x = jnp.asarray(batch["image"])
        cams = np.asarray(
            seg_grad_cam(
                model, variables, x, layer_path, class_idx=args.class_idx,
                train=False,
            )
        )
        for i, name in enumerate(batch["names"]):
            stem = os.path.splitext(os.path.basename(name))[0]
            np.savez(
                os.path.join(args.out_dir, f"{stem}_cam.npz"),
                cam=cams[i],
                image=np.asarray(batch["image"][i]),
                mask=np.asarray(batch["mask"][i]),
            )
            try:  # overlay png (reference saves jet-overlay figures)
                from PIL import Image

                img = np.asarray(batch["image"][i])
                img = (img - img.min()) / (img.max() - img.min() + 1e-8)
                heat = cams[i]
                rgb = np.stack(
                    [np.clip(1.5 * heat, 0, 1),
                     np.clip(1.5 * (1 - abs(2 * heat - 1)), 0, 1),
                     np.clip(1.5 * (1 - heat), 0, 1)],
                    axis=-1,
                )
                base = np.repeat(img.mean(-1, keepdims=True), 3, -1)
                overlay = np.uint8(255 * (0.5 * base + 0.5 * rgb))
                Image.fromarray(overlay).save(
                    os.path.join(args.out_dir, f"{stem}_cam.png")
                )
            except ImportError:
                pass
            n_done += 1
            if args.limit and n_done >= args.limit:
                logging.info("wrote %d CAMs to %s", n_done, args.out_dir)
                return
    logging.info("wrote %d CAMs to %s", n_done, args.out_dir)


if __name__ == "__main__":
    main()
