"""Evaluation entry point (replaces Experiments/test_model.py /
test_model_flop.py).

    python -m accunet_tpu.cli.eval --model ACC_UNet --task ISIC18 \
        --test-dir /data/ISIC18/Test_Folder --ckpt checkpoints/epoch_0012 \
        [--torch-ckpt best_model-ACC_UNet.pth.tar] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ACC_UNet")
    ap.add_argument("--task", default="ISIC18")
    ap.add_argument("--test-dir", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--torch-ckpt", default=None, help="reference .pth.tar to port")
    ap.add_argument("--n-classes", type=int, default=1,
                    help=">1 evaluates an (n+1)-way argmax head "
                         "(e.g. ACC_UNet_W 9-class @512, BASELINE config 4)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=None,
                    help="override the preset image size")
    ap.add_argument("--split", default=None,
                    help="frozen split file (one sample id per line, e.g. "
                         "Reproducibility/dataset_split/ISIC18/exp1/Test.txt)"
                         " restricting --test-dir")
    ap.add_argument("--csv", default="metrics_results.csv")
    ap.add_argument("--result", default="test.result")
    ap.add_argument("--dump-dir", default=None)
    ap.add_argument("--s2d", type=int, default=None,
                    help="ACC-UNet family: run the top-N levels in the s2d "
                         "frame (checkpoints are layout-independent — the "
                         "frame path mirrors the parameter tree exactly)")
    ap.add_argument("--model-kwargs", default=None,
                    help="python dict literal of extra model kwargs, must "
                         "match the trained checkpoint (e.g. "
                         "\"{'n_filts': 8}\")")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from accunet_tpu.config import get_config
    from accunet_tpu.data.dataset import SegmentationDataset
    from accunet_tpu.data.loader import BatchLoader
    from accunet_tpu.data.transforms import ValGenerator
    from accunet_tpu.eval.evaluate import evaluate_model
    from accunet_tpu.models import build as build_model
    from accunet_tpu.train.engine import make_train_fns, restore_checkpoint

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    cfg = get_config(args.model, args.task)
    if args.img_size:
        cfg.data.img_size = args.img_size

    test_ids = None
    if args.split:
        from accunet_tpu.data.dataset import list_split_ids

        test_ids = list_split_ids(args.split)
    ds = SegmentationDataset(
        args.test_dir, cfg.data.img_size, ids=test_ids,
        binarize_mask=args.n_classes == 1,
    )
    loader = BatchLoader(
        ds, args.batch, ValGenerator((cfg.data.img_size, cfg.data.img_size)),
        pad_last=True,
    )
    sample, _ = ds[0]
    n_ch = sample["image"].shape[-1]
    ekw = {} if args.s2d is None else {"s2d_levels": args.s2d}
    if args.model_kwargs:
        import ast

        ekw.update(ast.literal_eval(args.model_kwargs))
    model = build_model(args.model, n_channels=n_ch, n_classes=args.n_classes,
                        **ekw)

    x0 = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, n_ch))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    if args.torch_ckpt:
        from accunet_tpu.port import import_torch_state, load_torch_checkpoint

        variables = import_torch_state(
            variables, load_torch_checkpoint(args.torch_ckpt), strict=False
        )
    elif args.ckpt:
        example = next(iter(loader))
        fns = make_train_fns(
            model,
            {"image": jnp.asarray(example["image"]), "mask": jnp.asarray(example["mask"])},
        )
        state, _ = restore_checkpoint(args.ckpt, fns.state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    res = evaluate_model(
        lambda v, img: model.apply(v, img, train=False),
        variables,
        loader,
        result_file=args.result,
        csv_file=args.csv,
        dump_dir=args.dump_dir,
        model_name=args.model,
        task_name=args.task,
    )
    logging.info(res.summary_line(args.model, args.task))
    logging.info("%.2f ms/image on device", res.seconds_per_image * 1e3)


if __name__ == "__main__":
    main()
