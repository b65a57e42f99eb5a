"""Reference-fidelity resume semantics (train_model.py:672-689, 799-819):
epoch numbering continues across --resume auto, best-dice/early-stop state
survives, interrupted orbax saves are never selected, and retention keeps
best + latest only."""

import os

import numpy as np
import pytest

from tests.test_cli_integration import _make_dataset


@pytest.mark.quick
def test_list_checkpoints_filters_interrupted_saves(tmp_path):
    from accunet_tpu.train.engine import list_checkpoints

    (tmp_path / "epoch_0002").mkdir()
    # an interrupted orbax save sorts lexicographically AFTER its completed
    # sibling — exactly the preemption case --resume auto exists for
    (tmp_path / "epoch_0003.orbax-checkpoint-tmp-123456").mkdir()
    (tmp_path / "epoch_0001").mkdir()
    (tmp_path / "notes.txt").write_text("x")
    got = list_checkpoints(str(tmp_path))
    assert [os.path.basename(p) for p in got] == ["epoch_0001", "epoch_0002"]
    assert list_checkpoints(str(tmp_path / "missing")) == []


@pytest.mark.quick
def test_prune_checkpoints_keeps_best_and_latest(tmp_path):
    from accunet_tpu.train.engine import prune_checkpoints

    for n in ("epoch_0001", "epoch_0002", "epoch_0005",
              "epoch_0006.orbax-checkpoint-tmp-9"):
        (tmp_path / n).mkdir()
    prune_checkpoints(str(tmp_path), {2, 5})
    assert sorted(os.listdir(tmp_path)) == ["epoch_0002", "epoch_0005"]


def test_resume_continues_epoch_numbering_and_best(tmp_path):
    """Train 3 epochs, 'preempt', relaunch with a larger budget: epoch
    numbering continues (no epoch_0001 re-save that a later auto-resume
    would sort below the pre-preemption epoch), and the restored best_dice
    means a worse post-resume epoch does not overwrite best."""
    train_dir, val_dir = tmp_path / "train", tmp_path / "val"
    for d, n in ((train_dir, 6), (val_dir, 3)):
        _make_dataset(d, n)

    from accunet_tpu.cli import train as train_cli
    from accunet_tpu.train.engine import restore_checkpoint  # noqa: F401

    ckpt_dir = tmp_path / "ckpt"

    def run(epochs):
        return train_cli.main([
            "--model", "UNet_base",
            "--train-dir", str(train_dir),
            "--val-dir", str(val_dir),
            "--epochs", str(epochs),
            "--ckpt-dir", str(ckpt_dir),
            "--resume", "auto",
            "--set", "data.img_size=32", "data.batch_size=3",
            "model.kwargs={'base_width': 4}",
        ])

    _, hist1 = run(3)
    assert [h["epoch"] for h in hist1] == [1, 2, 3]
    names1 = sorted(os.listdir(ckpt_dir))
    assert names1 and names1[-1] == "epoch_0003"  # latest is always saved
    assert len(names1) <= 2  # retention: best + latest only

    _, hist2 = run(5)  # "relaunch after preemption" with a larger budget
    assert [h["epoch"] for h in hist2] == [4, 5]  # numbering continues
    names2 = sorted(os.listdir(ckpt_dir))
    assert names2[-1] == "epoch_0005"
    assert len(names2) <= 2

    # the surviving best checkpoint's meta tracks the true best epoch: its
    # recorded best_dice is the max over the whole (resumed) run
    from accunet_tpu.train import engine as E
    import orbax.checkpoint as ocp  # noqa: F401

    all_dices = [h["val"]["dice"] for h in hist1 + hist2]
    # read meta via restore on the latest checkpoint
    from accunet_tpu.config import get_config  # noqa: F401
    meta_path = os.path.join(str(ckpt_dir), names2[-1])
    ckptr_meta = _read_meta(meta_path)
    assert ckptr_meta["epoch"] == 5
    assert ckptr_meta["best_dice"] == pytest.approx(max(all_dices), abs=1e-6)
    best_epoch = int(np.argmax(all_dices)) + 1
    assert ckptr_meta["best_epoch"] == best_epoch

    # a third no-op relaunch (budget already exhausted) trains 0 epochs and
    # must not touch the checkpoints
    _, hist3 = run(5)
    assert hist3 == []
    assert sorted(os.listdir(ckpt_dir)) == names2


def _read_meta(path):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    return restored["meta"]


@pytest.mark.quick
def test_fit_worse_resume_does_not_overwrite_best(tmp_path, monkeypatch):
    """Directly drive fit() with scripted val dices: after resuming with a
    high best_dice, a worse epoch keeps best_epoch/best_dice intact."""
    from accunet_tpu.train import engine as E

    saves = []

    def fake_save(ckpt_dir, state, epoch, best_dice, best_epoch=None):
        saves.append((epoch, round(float(best_dice), 4), best_epoch))
        (tmp_path / f"epoch_{epoch:04d}").mkdir(exist_ok=True)
        return str(tmp_path / f"epoch_{epoch:04d}")

    monkeypatch.setattr(E, "save_checkpoint", fake_save)

    dices = iter([0.3, 0.2])  # both worse than the restored 0.9

    def run_epoch_stub(step_fn, state, loader, train, shard=None, **kw):
        stats = {"loss": 0.5, "dice": 0.5 if train else next(dices)}
        return state, stats

    monkeypatch.setattr(E, "run_epoch", run_epoch_stub)
    fns = E.TrainStepFns(
        train_step=lambda s, b: (s, {}), eval_step=lambda s, b: {},
        state=None, optimizer=None,
    )
    E.fit(
        fns, lambda: [1], lambda: [1], epochs=7, ckpt_dir=str(tmp_path),
        start_epoch=5, best_dice=0.9, best_epoch=4,
    )
    # epochs 6 and 7 ran, both saved as latest, best stayed at epoch 4 / 0.9
    assert saves == [(6, 0.9, 4), (7, 0.9, 4)]
