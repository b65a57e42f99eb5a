"""Validation visualization dumps (Train_one_epoch.py:139-144 analogue)."""

import os

import numpy as np
import pytest

from tests.test_cli_integration import _make_dataset


@pytest.mark.quick
def test_save_prediction_images(tmp_path):
    from accunet_tpu.eval.visualize import save_prediction_images

    rs = np.random.RandomState(0)
    out = save_prediction_images(
        str(tmp_path), 10,
        images=rs.rand(3, 16, 16, 3).astype(np.float32),
        masks=(rs.rand(3, 16, 16, 1) > 0.5).astype(np.float32),
        preds=rs.randn(3, 16, 16, 1).astype(np.float32),
        names=["a.npy", "b.npy", "c.npy"],
        max_images=2,
    )
    assert os.path.basename(out) == "epoch_0010"
    files = sorted(os.listdir(out))
    assert files == ["gt_a.png", "gt_b.png", "input_a.png", "input_b.png",
                     "pred_a.png", "pred_b.png"]
    from PIL import Image

    im = np.asarray(Image.open(os.path.join(out, "pred_a.png")))
    assert im.shape == (16, 16) and set(np.unique(im)) <= {0, 255}


@pytest.mark.quick
def test_multiclass_logits_become_class_map(tmp_path):
    from accunet_tpu.eval.visualize import save_prediction_images

    rs = np.random.RandomState(1)
    out = save_prediction_images(
        str(tmp_path), 1,
        images=rs.rand(1, 8, 8, 3).astype(np.float32),
        masks=rs.randint(0, 4, (1, 8, 8, 1)).astype(np.float32),
        preds=rs.randn(1, 8, 8, 4).astype(np.float32),  # 4-class logits
    )
    from PIL import Image

    im = np.asarray(Image.open(os.path.join(out, "pred_sample0.png")))
    assert len(np.unique(im)) > 2  # argmax class map, not a binary threshold


def test_train_cli_writes_vis_dumps(tmp_path):
    train_dir, val_dir = tmp_path / "train", tmp_path / "val"
    for d, n in ((train_dir, 6), (val_dir, 3)):
        _make_dataset(d, n)

    from accunet_tpu.cli import train as train_cli

    vis_dir = tmp_path / "vis"
    train_cli.main([
        "--model", "UNet_base",
        "--train-dir", str(train_dir),
        "--val-dir", str(val_dir),
        "--epochs", "2",
        "--vis-dir", str(vis_dir),
        "--vis-frequency", "2",
        "--set", "data.img_size=32", "data.batch_size=3",
        "model.kwargs={'base_width': 4}",
    ])
    assert sorted(os.listdir(vis_dir)) == ["epoch_0002"]
    dumped = os.listdir(vis_dir / "epoch_0002")
    assert any(f.startswith("pred_") for f in dumped)
    assert any(f.startswith("input_") for f in dumped)
