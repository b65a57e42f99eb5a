"""Eval harness + Seg-Grad-CAM tests."""

import numpy as np

import jax
import jax.numpy as jnp

from accunet_tpu.data.loader import BatchLoader
from accunet_tpu.eval.evaluate import evaluate_model
from accunet_tpu.eval.gradcam import seg_grad_cam
from accunet_tpu.models.unet import UNetBase


class _ToyDataset:
    def __init__(self, n=6, hw=32):
        rs = np.random.RandomState(0)
        self.items = [
            (
                {
                    "image": rs.rand(hw, hw, 3).astype(np.float32),
                    "label": (rs.rand(hw, hw) > 0.5).astype(np.int32),
                },
                f"img_{i}.npy",
            )
            for i in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _small_model():
    model = UNetBase(3, 1, base_width=4)
    x = jnp.zeros((1, 32, 32, 3))
    var = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, var


def test_evaluate_model(tmp_path):
    model, var = _small_model()
    loader = BatchLoader(_ToyDataset(), batch_size=4, pad_last=True)

    res = evaluate_model(
        lambda v, img: model.apply(v, img, train=False),
        var,
        loader,
        result_file=str(tmp_path / "test.result"),
        csv_file=str(tmp_path / "metrics.csv"),
    )
    assert res.n_images == 6
    assert 0.0 <= res.dice <= 1.0
    assert (tmp_path / "test.result").exists()
    lines = (tmp_path / "metrics.csv").read_text().strip().splitlines()
    assert len(lines) == 7  # header + 6 rows


def test_seg_grad_cam():
    model, var = _small_model()
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    cam = seg_grad_cam(model, var, x, layer_path=("up1",), train=False)
    cam = np.asarray(cam)
    assert cam.shape == (2, 32, 32)
    assert np.isfinite(cam).all()
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    assert cam.max() > 0  # non-degenerate
