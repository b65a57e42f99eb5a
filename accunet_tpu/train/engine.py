"""Training engine: jitted SPMD train/eval steps + epoch driver.

TPU-native redesign of the reference's epoch loop
(/root/reference/Experiments/Train_one_epoch.py:48-201 and
train_model.py:782-831):

  * one jitted, donated train_step — forward, loss, grad, optimizer update,
    batch-stat update, and in-graph metrics in a single XLA program (the
    reference does per-batch `.item()` host syncs and empty_cache() calls;
    here the only host sync is the per-epoch metric fetch)
  * pass `mesh=` to run SPMD: params/opt_state are placed by
    accunet_tpu.parallel.param_sharding_rules (large kernels over the
    `model` axis, rest replicated), each batch is sharded over the mesh
    `data` axis via fns.shard_batch, and XLA inserts the gradient
    all-reduce. BatchNorm statistics are then computed over the *global*
    batch (sync-BN by construction). Without a mesh the same step runs
    single-device.
  * checkpoint/resume via orbax (replaces torch.save of
    {epoch, state_dict, optimizer}, train_model.py:125-145, 672-689), with
    best-val-dice retention and early stopping (train_model.py:799-831)
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
import os
import re
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from accunet_tpu.train import losses as L
from accunet_tpu.train import metrics as M
from accunet_tpu.train.schedules import cosine_warm_restarts

logger = logging.getLogger("accunet_tpu")


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class TrainStepFns:
    train_step: Callable
    eval_step: Callable
    state: TrainState
    optimizer: optax.GradientTransformation
    mesh: Any = None
    shard_batch: Callable = lambda batch: batch  # identity when mesh is None
    predict_step: Callable | None = None  # (state, batch) -> main output


def _main_output(preds):
    if isinstance(preds, (tuple, list)):
        if len(preds) == 2 and isinstance(preds[0], (tuple, list)):
            return preds[1]
        return preds[0]
    return preds


def make_train_fns(
    model,
    example_batch,
    loss_fn: Callable = L.weighted_dice_bce,
    learning_rate: float = 1e-3,
    optimizer_name: str = "adam",
    steps_per_epoch: int = 1,
    rng: jax.Array | None = None,
    dice_show: Callable = L.soft_dice_show,
    iou_fn: Callable = M.batch_iou,
    donate: bool = True,
    mesh=None,
) -> TrainStepFns:
    """Build jitted train/eval steps + initial state for `model`.

    loss_fn(preds, targets) where preds is whatever the model returns
    (array or deep-supervision tuple). With `mesh`, the returned state is
    placed per accunet_tpu.parallel.param_sharding_rules and
    `fns.shard_batch` shards host batches over the mesh `data` axis.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    images = example_batch["image"]
    # text-conditioned models (train_model.py TEXT_MODELS, :271-283) receive
    # per-sample prompt embeddings under batch["text_emb"]
    uses_text = "text_emb" in example_batch
    init_args = (images, example_batch["text_emb"]) if uses_text else (images,)
    variables = model.init(rng, *init_args, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())

    schedule = cosine_warm_restarts(
        learning_rate, t_0=10, t_mult=1, eta_min=1e-5, steps_per_epoch=steps_per_epoch
    )
    if optimizer_name == "adam":
        optimizer = optax.adam(schedule)
    elif optimizer_name == "sgd":
        # Swin family uses SGD momentum 0.9 wd 1e-4 (train_model.py:644-646)
        optimizer = optax.chain(
            optax.add_decayed_weights(1e-4), optax.sgd(schedule, momentum=0.9)
        )
    else:
        raise ValueError(optimizer_name)
    opt_state = optimizer.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )

    shard_batch_fn = lambda batch: batch
    if mesh is not None:
        from accunet_tpu.parallel import mesh as pmesh

        rules = pmesh.param_sharding_rules(mesh)
        param_sh = rules(params)
        repl = pmesh.replicate(mesh)

        def opt_rule(x):
            # shard optimizer moments like their parameters (same policy)
            if hasattr(x, "ndim") and x.ndim >= 2:
                return rules({"x": x})["x"]
            return repl

        state = TrainState(
            step=jax.device_put(state.step, repl),
            params=jax.device_put(params, param_sh),
            batch_stats=jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), batch_stats
            ),
            opt_state=jax.tree_util.tree_map(
                lambda x: jax.device_put(x, opt_rule(x)), opt_state
            ),
        )
        shard_batch_fn = lambda batch: pmesh.shard_batch(mesh, batch)

    def _model_args(batch):
        return (batch["image"], batch["text_emb"]) if uses_text else (batch["image"],)

    def loss_and_metrics(params, batch_stats, batch):
        preds, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            *_model_args(batch),
            train=True,
            mutable=["batch_stats"],
        )
        loss = loss_fn(preds, batch["mask"])
        return loss, (updates.get("batch_stats", batch_stats), preds)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch):
        (loss, (new_stats, preds)), grads = jax.value_and_grad(
            loss_and_metrics, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        main = _main_output(preds)
        stats = {
            "loss": loss,
            "dice": dice_show(main, batch["mask"]),
            "iou": iou_fn(main, batch["mask"]),
            "lr": schedule(state.step),
        }
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            stats,
        )

    @jax.jit
    def eval_step(state: TrainState, batch):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *_model_args(batch),
            train=False,
        )
        main = _main_output(preds)
        return {
            "loss": loss_fn(preds, batch["mask"]),
            "dice": dice_show(main, batch["mask"]),
            "iou": iou_fn(main, batch["mask"]),
        }

    @jax.jit
    def predict_step(state: TrainState, batch):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *_model_args(batch),
            train=False,
        )
        return _main_output(preds)

    return TrainStepFns(
        train_step, eval_step, state, optimizer, mesh, shard_batch_fn,
        predict_step,
    )


def run_epoch(step_fn, state, loader: Iterable, train: bool, shard_batch=None,
              check_numerics: bool = False):
    """One epoch. `check_numerics` is the framework's sanitizer analogue
    (SURVEY §5.2 — the reference has none): a per-batch host sync that
    aborts on the first non-finite loss with the batch index, instead of
    silently training on NaNs for the rest of the epoch. Costs one device
    round-trip per batch, so it is opt-in."""
    agg, n = None, 0
    t0 = time.time()
    for batch in loader:
        if shard_batch is not None:
            batch = shard_batch(batch)
        if train:
            state, stats = step_fn(state, batch)
        else:
            stats = step_fn(state, batch)
        if check_numerics and "loss" in stats:
            loss = float(stats["loss"])
            if not math.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss {loss} at batch {n} "
                    f"({'train' if train else 'eval'})"
                )
        agg = stats if agg is None else jax.tree_util.tree_map(jnp.add, agg, stats)
        n += 1
    agg = jax.tree_util.tree_map(lambda x: float(x) / n, agg) if n else {}
    agg["time"] = time.time() - t0
    agg["batches"] = n
    return state, agg


# ------------------------------------------------------------- checkpointing


CKPT_NAME_RE = re.compile(r"epoch_(\d{4})")


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    best_dice: float, best_epoch: int | None = None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(ckpt_dir), f"epoch_{epoch:04d}")
    ckptr.save(
        path,
        {
            "state": jax.tree_util.tree_map(lambda x: x, state),
            "meta": {"epoch": epoch, "best_dice": best_dice,
                     "best_epoch": epoch if best_epoch is None else best_epoch},
        },
        force=True,
    )
    ckptr.wait_until_finished()
    return path


def prune_checkpoints(ckpt_dir: str, keep_epochs) -> None:
    """Retention policy (the reference keeps a single rolling best file,
    train_model.py:811-819; round 2 kept every improvement forever): keep
    only `keep_epochs` (best + latest) and clear interrupted-save leftovers
    (`*.orbax-checkpoint-tmp-*` dirs from a crash mid-save)."""
    import shutil

    keep = {int(e) for e in keep_epochs}
    for name in os.listdir(ckpt_dir):
        full = os.path.join(ckpt_dir, name)
        m = CKPT_NAME_RE.fullmatch(name)
        if (m and int(m.group(1)) not in keep) or (
            ".orbax-checkpoint-tmp" in name
        ):
            shutil.rmtree(full, ignore_errors=True)


def list_checkpoints(ckpt_dir: str):
    """Completed checkpoints in `ckpt_dir`, oldest->newest. Filters to the
    expected epoch_NNNN names so interrupted orbax saves
    (epoch_NNNN.orbax-checkpoint-tmp-*, which sort AFTER their completed
    sibling — exactly the preemption case --resume auto targets) are never
    selected."""
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return []
    names = [n for n in os.listdir(ckpt_dir) if CKPT_NAME_RE.fullmatch(n)]
    return [os.path.join(ckpt_dir, n) for n in sorted(names)]


def restore_checkpoint(path: str, state_template: TrainState):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {
        "state": state_template,
        "meta": {"epoch": 0, "best_dice": 0.0, "best_epoch": 0},
    }
    try:
        restored = ckptr.restore(os.path.abspath(path), target)
    except Exception:
        # round-2 checkpoints carry no best_epoch in meta
        target["meta"] = {"epoch": 0, "best_dice": 0.0}
        restored = ckptr.restore(os.path.abspath(path), target)
        restored["meta"]["best_epoch"] = restored["meta"]["epoch"]
    return restored["state"], restored["meta"]


def fit(
    fns: TrainStepFns,
    train_loader_factory: Callable[[], Iterable],
    val_loader_factory: Callable[[], Iterable],
    epochs: int,
    ckpt_dir: str | None = None,
    early_stop_patience: int = 100,
    log_every: bool = True,
    tensorboard_dir: str | None = None,
    check_numerics: bool = False,
    start_epoch: int = 0,
    best_dice: float = -1.0,
    best_epoch: int = 0,
    vis_dir: str | None = None,
    vis_frequency: int = 10,
):
    """Epoch driver with best-dice checkpointing and early stopping
    (train_model.py:782-831). `tensorboard_dir` enables epoch-scalar logging
    (Train_one_epoch.py:193-198 equivalent) when tensorboardX is present.

    Resume semantics match the reference (train_model.py:672-689): pass the
    restored checkpoint's meta as `start_epoch`/`best_dice`/`best_epoch` and
    training continues at epoch start_epoch+1 with the early-stop counter and
    best-model tracking intact (a worse post-resume epoch never overwrites
    best). Checkpoints: the latest epoch is always saved (preemption
    resilience — the reference only saves improvements) and retention keeps
    best + latest (prune_checkpoints)."""
    writer = None
    if tensorboard_dir:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(tensorboard_dir)
        except ImportError:
            logger.warning("tensorboardX unavailable; skipping TB logging")
    state = fns.state
    history = []
    for epoch in range(start_epoch + 1, epochs + 1):
        state, tr = run_epoch(
            fns.train_step, state, train_loader_factory(), True,
            fns.shard_batch, check_numerics=check_numerics,
        )
        _, va = run_epoch(
            fns.eval_step, state, val_loader_factory(), False, fns.shard_batch
        )
        history.append({"epoch": epoch, "train": tr, "val": va})
        if log_every:
            logger.info(
                "epoch %d train loss %.4f dice %.4f | val loss %.4f dice %.4f",
                epoch, tr.get("loss", 0), tr.get("dice", 0),
                va.get("loss", 0), va.get("dice", 0),
            )
        if writer is not None:
            for split, stats in (("train", tr), ("val", va)):
                for k in ("loss", "dice", "iou"):
                    if k in stats:
                        writer.add_scalar(f"{split}/{k}", stats[k], epoch)
        if vis_dir and fns.predict_step is not None and epoch % vis_frequency == 0:
            # reference saves val predictions every vis_frequency epochs
            # (Train_one_epoch.py:139-144); first val batch, up to 4 triples
            from accunet_tpu.eval.visualize import save_prediction_images

            batch = next(iter(val_loader_factory()), None)
            if batch is not None:
                if fns.shard_batch is not None:
                    batch = fns.shard_batch(batch)
                preds = fns.predict_step(state, batch)
                save_prediction_images(
                    vis_dir, epoch,
                    jax.device_get(batch["image"]),
                    jax.device_get(batch["mask"]),
                    jax.device_get(preds),
                    names=batch.get("names"),
                )
        if va.get("dice", 0) > best_dice:
            best_dice, best_epoch = va["dice"], epoch
        if ckpt_dir:
            save_checkpoint(ckpt_dir, state, epoch, best_dice, best_epoch)
            prune_checkpoints(ckpt_dir, {best_epoch, epoch})
        if va.get("dice", 0) <= best_dice and epoch - best_epoch >= early_stop_patience:
            logger.info("early stopping at epoch %d (best %d)", epoch, best_epoch)
            break
    if writer is not None:
        writer.close()
    return state, history
