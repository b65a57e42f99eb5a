"""Training entry point.

Replaces /root/reference/Experiments/train_model.py (which selects everything
by editing Config.py globals) with flags + presets:

    python -m accunet_tpu.cli.train --model ACC_UNet --task ISIC18 \
        --train-dir /data/ISIC18/Train_Folder --val-dir /data/ISIC18/Val_Folder \
        [--mesh data=4,model=2] [--n-classes 9] [--text] \
        [--set train.lr=3e-4 data.batch_size=16 ...]

Covers the reference behaviors: seeding (train_model.py:837-848), model
factory (:351-640), Adam/SGD select (:642-647), WeightedDiceBCE /
BinaryDiceBCE / DS-adapter loss select (:700-737), cosine warm restarts
(:738), best-dice checkpointing + early stopping (:782-831), resume
(:672-689), text-prompt loading for TEXT_MODELS (:271-291), epoch logging
(Train_one_epoch.py:169-198).

Beyond the reference: --mesh runs true SPMD data(+tensor)-parallel training
over a jax.sharding.Mesh (the reference trains single-GPU), and --n-classes
trains the (n_classes+1)-way heads with a softmax dice+CE loss (the
reference's losses only implement their binary branch, utils.py:33,117).
"""

from __future__ import annotations

import argparse
import functools
import logging
import os


# TEXT_MODELS set (train_model.py:271-283)
TEXT_MODELS = {
    "Segmamba_hybrid_gsc_KAN_PE_ds_text",
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn",
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_TGDC",
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA",
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_Dual",
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba",
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba_KAN",
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_SpatialMamba",
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_Dual_SpatialMamba",
    "Segmamba_hybrid_gsc_KAN_PE_ds_CrossAttn_HSLCA_SpatialMamba_no_text",
}


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        try:
            out[k] = eval(v, {}, {})  # numbers/bools/strings
        except Exception:
            out[k] = v
    return out


def parse_mesh(spec: str | None):
    """'data=4,model=2' -> MeshSpec; None -> no mesh (single device)."""
    if not spec:
        return None
    from accunet_tpu.parallel.mesh import MeshSpec, make_mesh

    kw = {}
    for part in spec.split(","):
        k, v = part.split("=")
        kw[k.strip()] = int(v)
    return make_mesh(MeshSpec(**kw))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ACC_UNet")
    ap.add_argument("--task", default="ISIC18")
    ap.add_argument("--train-dir", default=None)
    ap.add_argument("--val-dir", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="train on a generated random dataset (no dirs needed)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--n-classes", type=int, default=1,
                    help=">1 trains an (n+1)-way softmax head")
    ap.add_argument("--mesh", default=None,
                    help="SPMD mesh, e.g. data=8 or data=4,model=2")
    ap.add_argument("--text", action="store_true",
                    help="force-enable text prompts (auto for TEXT_MODELS "
                         "when prompt files are present)")
    ap.add_argument("--s2d", type=int, default=None,
                    help="ACC-UNet family: train with the top-N levels in "
                         "the space-to-depth frame (ops/s2d.py) — exact "
                         "(frame BatchNorm reduces over positions), same "
                         "parameter tree, faster on TPU")
    ap.add_argument("--check-numerics", action="store_true",
                    help="abort on the first non-finite train loss (per-batch "
                         "host sync; the sanitizer analogue, SURVEY 5.2)")
    ap.add_argument("--resume", default=None,
                    help="checkpoint path to resume, or 'auto' to pick up "
                         "the newest checkpoint in --ckpt-dir (restart "
                         "resilience; fresh run if none)")
    ap.add_argument("--distributed", nargs="?", const="auto", default=None,
                    help="multi-host SPMD: call jax.distributed.initialize() "
                         "and shard the input pipeline per process — each "
                         "host loads only its slice of every global batch. "
                         "With no value the coordinator is env-configured "
                         "(TPU/Slurm/OMPI per JAX docs); an explicit "
                         "'ADDR:PORT,PROCESS_ID,NUM_PROCESSES' value "
                         "bootstraps any cluster (e.g. the 2-process CPU "
                         "smoke test in tests/test_multihost_sharding.py)")
    ap.add_argument("--vis-dir", default=None,
                    help="save input/gt/pred PNGs from the first val batch "
                         "every --vis-frequency epochs "
                         "(Train_one_epoch.py:139-144 analogue)")
    ap.add_argument("--vis-frequency", type=int, default=10)
    ap.add_argument("--train-split", default=None,
                    help="frozen split file (one sample id per line, e.g. "
                         "Reproducibility/dataset_split/ISIC18/exp1/"
                         "Train.txt) restricting --train-dir")
    ap.add_argument("--val-split", default=None,
                    help="frozen split file restricting --val-dir")
    ap.add_argument("--set", nargs="*", default=[], help="dotted config overrides")
    ap.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args(argv)

    from accunet_tpu.config import get_config
    from accunet_tpu.data.dataset import SegmentationDataset
    from accunet_tpu.data.loader import BatchLoader
    from accunet_tpu.data.transforms import RandomGenerator, ValGenerator
    from accunet_tpu.models import build as build_model
    from accunet_tpu.train import losses as L
    from accunet_tpu.train import metrics as M
    from accunet_tpu.train.engine import (
        fit, list_checkpoints, make_train_fns, restore_checkpoint,
    )

    import dataclasses

    import jax

    # this image pre-imports jax at interpreter startup with the ambient
    # JAX_PLATFORMS (axon), so a later `JAX_PLATFORMS=cpu` export arrives too
    # late; honor the cpu-forcing case here (tests/conftest.py does the same)
    # so cpu + xla_force_host_platform_device_count drives the virtual mesh.
    # Only the cpu direction is forced — never flip an explicitly-configured
    # cpu session back to the accelerator.
    if os.environ.get("JAX_PLATFORMS") == "cpu" and jax.config.jax_platforms != "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized
    import jax.numpy as jnp
    import numpy as np

    if args.synthetic:
        import numpy as _np
        import tempfile

        root = tempfile.mkdtemp(prefix="accunet_synth_")
        rng0 = _np.random.RandomState(0)
        size = args.img_size or 64
        for split, n in (("train", 8), ("val", 4)):
            d = os.path.join(root, split)
            os.makedirs(os.path.join(d, "images"))
            os.makedirs(os.path.join(d, "masks"))
            for i in range(n):
                img = rng0.rand(4, size, size).astype(_np.float32)
                msk = (rng0.rand(size, size) > 0.5).astype(_np.float32)
                if args.n_classes > 1:
                    msk = rng0.randint(
                        0, args.n_classes + 1, (size, size)
                    ).astype(_np.float32)
                _np.save(os.path.join(d, "images", f"s{i:03d}.npy"), img)
                _np.save(os.path.join(d, "masks", f"s{i:03d}.npy"), msk)
        args.train_dir = os.path.join(root, "train")
        args.val_dir = os.path.join(root, "val")
    if not args.train_dir or not args.val_dir:
        ap.error("--train-dir/--val-dir required (or pass --synthetic)")

    cfg = get_config(args.model, args.task)
    cfg.data.train_dir, cfg.data.val_dir = args.train_dir, args.val_dir
    if args.img_size:
        cfg.data.img_size = args.img_size
    if args.batch:
        cfg.data.batch_size = args.batch
    if args.epochs:
        cfg.train.epochs = args.epochs
    if args.ckpt_dir:
        cfg.train.ckpt_dir = args.ckpt_dir
    cfg = cfg.override(parse_overrides(args.set))

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    np.random.seed(cfg.train.seed)

    proc_idx, proc_cnt = 0, 1
    if args.distributed:
        if args.distributed == "auto":
            jax.distributed.initialize()  # env-configured (multi-slice DP)
        else:
            addr, pid, nproc = args.distributed.rsplit(",", 2)
            jax.distributed.initialize(
                coordinator_address=addr,
                process_id=int(pid),
                num_processes=int(nproc),
            )
        proc_idx, proc_cnt = jax.process_index(), jax.process_count()
        logging.info("distributed: process %d/%d", proc_idx, proc_cnt)

    mesh = parse_mesh(args.mesh)
    if mesh is not None:
        logging.info("SPMD mesh: %s", dict(mesh.shape))

    binarize = args.n_classes == 1  # multi-class keeps integer label ids
    from accunet_tpu.data.dataset import list_split_ids

    train_ids = list_split_ids(args.train_split) if args.train_split else None
    val_ids = list_split_ids(args.val_split) if args.val_split else None
    train_ds = SegmentationDataset(
        cfg.data.train_dir, cfg.data.img_size, ids=train_ids,
        binarize_mask=binarize,
    )
    val_ds = SegmentationDataset(
        cfg.data.val_dir, cfg.data.img_size, ids=val_ids,
        binarize_mask=binarize,
    )
    train_tf = RandomGenerator((cfg.data.img_size, cfg.data.img_size))
    val_tf = ValGenerator((cfg.data.img_size, cfg.data.img_size))
    from accunet_tpu.data.loader import PrefetchLoader

    train_loader = PrefetchLoader(BatchLoader(
        train_ds, cfg.data.batch_size, train_tf, shuffle=True,
        seed=cfg.train.seed, drop_last=True,
        process_index=proc_idx, process_count=proc_cnt,
    ))
    val_loader = PrefetchLoader(
        BatchLoader(val_ds, cfg.data.batch_size, val_tf, pad_last=True,
                    process_index=proc_idx, process_count=proc_cnt)
    )

    # ---- text prompts (train_model.py:286-291; xlsx/csv per split dir) ----
    use_text = args.text or args.model in TEXT_MODELS
    text_encoder, train_text, val_text = None, None, None
    if use_text:
        from accunet_tpu.data.text_prompts import read_text
        from accunet_tpu.nn.text import ClinicalTextEncoder

        train_text = read_text(cfg.data.train_dir)
        val_text = read_text(cfg.data.val_dir)
        if train_text is None and not args.text:
            use_text = False  # TEXT_MODEL trained image-only (no prompt files)
        else:
            text_encoder = ClinicalTextEncoder()
            logging.info("text prompts enabled (%d train entries)",
                         len(train_text or {}))

    sample, _ = train_ds[0]
    n_ch = sample["image"].shape[-1]
    n_cls = args.n_classes
    mkw = dict(cfg.model.kwargs)
    if args.s2d is not None:
        mkw["s2d_levels"] = args.s2d
    model = build_model(
        args.model,
        n_channels=n_ch,
        n_classes=n_cls,
        dtype=jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32,
        **mkw,
    ) if not args.model.lower().startswith("segmamba") else build_model(
        args.model, in_chans=n_ch, out_chans=n_cls, **mkw
    )

    if n_cls > 1:
        loss_fn = L.multiclass_dice_ce
        dice_show = L.multiclass_dice_show
        iou_fn = M.multiclass_batch_iou
    else:
        loss_fn = L.LOSSES[cfg.train.loss]
        dice_show = L.soft_dice_show
        iou_fn = M.batch_iou

    def embed_texts(names):
        if not use_text or text_encoder is None:
            return None
        prompts = [
            (train_text or {}).get(n) or (val_text or {}).get(n) or "" for n in names
        ]
        return text_encoder(prompts)

    def device_batches(loader, texts):
        def gen():
            for b in loader:
                out = {
                    "image": jnp.asarray(b["image"]),
                    "mask": jnp.asarray(b["mask"]),
                }
                if use_text and text_encoder is not None:
                    emb = embed_texts(b.get("names", []))
                    if emb is not None:
                        out["text_emb"] = jnp.asarray(emb)
                yield out
        return gen()

    example = next(device_batches(val_loader, val_text))
    fns = make_train_fns(
        model,
        example,
        loss_fn=loss_fn,
        learning_rate=cfg.train.lr,
        optimizer_name=cfg.train.optimizer,
        steps_per_epoch=max(len(train_loader), 1),
        rng=jax.random.PRNGKey(cfg.train.seed),
        dice_show=dice_show,
        iou_fn=iou_fn,
        mesh=mesh,
    )
    meta = None
    if args.resume == "auto":
        # restart-resilience: pick up the newest COMPLETED checkpoint in
        # ckpt_dir if one exists (fresh run otherwise) — lets a supervisor
        # just relaunch the same command after a preemption/crash. Candidates
        # are filtered to the epoch_NNNN name pattern (an interrupted orbax
        # save leaves epoch_NNNN.orbax-checkpoint-tmp-* which must never be
        # picked) and a restore failure falls back to the next-newest.
        candidates = list_checkpoints(cfg.train.ckpt_dir)
        args.resume = None
        for path in reversed(candidates):
            try:
                state, meta = restore_checkpoint(path, fns.state)
            except Exception as e:  # corrupt/incomplete save
                logging.warning("--resume auto: %s unrestorable (%s), "
                                "trying next-newest", path, e)
                continue
            args.resume = path
            fns = dataclasses.replace(fns, state=state)
            break
        if args.resume is None:
            logging.info("--resume auto: no checkpoint found, fresh run")
    elif args.resume:
        state, meta = restore_checkpoint(args.resume, fns.state)
        fns = dataclasses.replace(fns, state=state)
    if args.resume and meta is not None:
        logging.info("resumed from %s at epoch %s (best dice %.4f @ epoch %s)",
                     args.resume, meta.get("epoch"),
                     meta.get("best_dice", -1.0), meta.get("best_epoch"))

    resume_kw = {}
    if meta is not None:
        # reference resume semantics (train_model.py:672-689): continue the
        # epoch numbering and keep best-dice / early-stop state
        resume_kw = dict(
            start_epoch=int(meta.get("epoch", 0)),
            best_dice=float(meta.get("best_dice", -1.0)),
            best_epoch=int(meta.get("best_epoch", meta.get("epoch", 0))),
        )
    state, history = fit(
        fns,
        functools.partial(device_batches, train_loader, train_text),
        functools.partial(device_batches, val_loader, val_text),
        epochs=cfg.train.epochs,
        ckpt_dir=cfg.train.ckpt_dir,
        early_stop_patience=cfg.train.early_stop_patience,
        check_numerics=args.check_numerics,
        vis_dir=args.vis_dir,
        vis_frequency=args.vis_frequency,
        **resume_kw,
    )
    logging.info("done: best val dice %.4f",
                 max((h["val"].get("dice", 0) for h in history), default=0))
    return state, history


if __name__ == "__main__":
    main()
