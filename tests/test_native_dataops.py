"""Native C++ data kernels vs numpy/torch references + dataset round-trip."""

import numpy as np
import pytest

from accunet_tpu.data import native_loader


pytestmark = [
    pytest.mark.skipif(not native_loader.available(), reason="no C++ toolchain"),
    pytest.mark.quick,
]


def test_native_bilinear_matches_torch():
    import torch
    import torch.nn.functional as F

    img = np.random.RandomState(0).rand(37, 53).astype(np.float32)
    got = native_loader.resize2d(img, 64, nearest=False)
    want = F.interpolate(
        torch.from_numpy(img)[None, None], size=(64, 64), mode="bilinear",
        align_corners=False,
    )[0, 0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_native_standardize():
    import torch

    x = np.random.RandomState(1).rand(64, 64).astype(np.float32) * 7 + 3
    got = native_loader.standardize(x.copy())
    t = torch.from_numpy(x)
    want = ((t - t.mean()) / (t.std() + 1e-8)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_native_binarize():
    x = np.asarray([[-1.0, 0.0, 0.5, 3.0]], np.float32)
    got = native_loader.binarize(x)
    np.testing.assert_array_equal(got, [[0, 0, 1, 1]])


def test_dataset_npy_roundtrip(tmp_path):
    from accunet_tpu.data.dataset import SegmentationDataset

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    rs = np.random.RandomState(0)
    for i in range(3):
        np.save(tmp_path / "images" / f"s{i}.npy", rs.rand(4, 40, 40).astype(np.float32))
        np.save(tmp_path / "masks" / f"s{i}.npy", (rs.rand(40, 40) > 0.5).astype(np.uint8))
    ds = SegmentationDataset(str(tmp_path), image_size=32)
    assert len(ds) == 3
    sample, fname = ds[0]
    assert sample["image"].shape == (32, 32, 1)
    assert sample["label"].shape == (32, 32)
    assert abs(float(sample["image"].mean())) < 1e-4  # standardized
    assert set(np.unique(sample["label"])) <= {0, 1}
