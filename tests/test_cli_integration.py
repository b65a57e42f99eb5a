"""End-to-end CLI integration: train a tiny model on a synthetic npy dataset
folder, then evaluate it with the eval CLI (checkpoint round trip included)."""

import os

import numpy as np
import pytest


def _make_dataset(root, n, hw=32, seed=0):
    os.makedirs(root / "images")
    os.makedirs(root / "masks")
    rs = np.random.RandomState(seed)
    for i in range(n):
        img = rs.rand(4, hw, hw).astype(np.float32) * 0.1
        cy, cx = rs.randint(8, hw - 8, 2)
        yy, xx = np.mgrid[:hw, :hw]
        blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 36
        img[0] += blob
        np.save(root / "images" / f"s{i}.npy", img)
        np.save(root / "masks" / f"s{i}.npy", blob.astype(np.uint8))


def test_train_then_eval_cli(tmp_path):
    train_dir = tmp_path / "train"
    val_dir = tmp_path / "val"
    test_dir = tmp_path / "test"
    for d, n in ((train_dir, 8), (val_dir, 4), (test_dir, 4)):
        _make_dataset(d, n)

    from accunet_tpu.cli import eval as eval_cli
    from accunet_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "ckpt"
    train_cli.main([
        "--model", "UNet_base",
        "--train-dir", str(train_dir),
        "--val-dir", str(val_dir),
        "--epochs", "2",
        "--ckpt-dir", str(ckpt_dir),
        "--set", "data.img_size=32", "data.batch_size=4",
        "model.kwargs={}",
    ])
    ckpts = sorted(os.listdir(ckpt_dir))
    assert ckpts, "no checkpoint written"

    csv = tmp_path / "metrics.csv"
    eval_cli.main([
        "--model", "UNet_base",
        "--test-dir", str(test_dir),
        "--ckpt", str(ckpt_dir / ckpts[-1]),
        "--batch", "4",
        "--csv", str(csv),
        "--result", str(tmp_path / "test.result"),
        "--img-size", "32",
        "--task", "ISIC18",
    ])
    lines = csv.read_text().strip().splitlines()
    assert len(lines) == 5  # header + 4 images
    assert (tmp_path / "test.result").exists()


def test_train_then_eval_cli_s2d(tmp_path):
    """--s2d trains ACC_UNet_Lite in the frame layout and the checkpoint
    round-trips into a frame-layout eval (identical parameter trees)."""
    train_dir = tmp_path / "train"
    val_dir = tmp_path / "val"
    test_dir = tmp_path / "test"
    for d, n in ((train_dir, 6), (val_dir, 3), (test_dir, 3)):
        _make_dataset(d, n)

    from accunet_tpu.cli import eval as eval_cli
    from accunet_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "ckpt"
    train_cli.main([
        "--model", "ACC_UNet_Lite",
        "--train-dir", str(train_dir),
        "--val-dir", str(val_dir),
        "--epochs", "1",
        "--s2d", "1",
        "--ckpt-dir", str(ckpt_dir),
        "--set", "data.img_size=32", "data.batch_size=3",
        "model.kwargs={'n_filts': 8}",
    ])
    ckpts = sorted(os.listdir(ckpt_dir))
    assert ckpts, "no checkpoint written"

    csv = tmp_path / "metrics.csv"
    eval_cli.main([
        "--model", "ACC_UNet_Lite",
        "--test-dir", str(test_dir),
        "--ckpt", str(ckpt_dir / ckpts[-1]),
        "--batch", "3",
        "--s2d", "1",
        "--model-kwargs", "{'n_filts': 8}",
        "--csv", str(csv),
        "--result", str(tmp_path / "test.result"),
        "--img-size", "32",
        "--task", "ISIC18",
    ])
    lines = csv.read_text().strip().splitlines()
    assert len(lines) == 4  # header + 3 images


def test_resume_auto(tmp_path):
    """--resume auto restarts from the newest checkpoint (and is a no-op on
    a fresh directory)."""
    train_dir = tmp_path / "train"
    val_dir = tmp_path / "val"
    for d, n in ((train_dir, 6), (val_dir, 3)):
        _make_dataset(d, n)

    from accunet_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "ckpt"
    common = [
        "--model", "UNet_base",
        "--train-dir", str(train_dir),
        "--val-dir", str(val_dir),
        "--epochs", "1",
        "--ckpt-dir", str(ckpt_dir),
        "--resume", "auto",
        "--set", "data.img_size=32", "data.batch_size=3",
        "model.kwargs={'base_width': 4}",
    ]
    train_cli.main(common)          # fresh run (no checkpoint yet)
    first = sorted(os.listdir(ckpt_dir))
    assert first
    train_cli.main(common)          # resumes from the newest checkpoint
