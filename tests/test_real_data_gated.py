"""Availability-gated end-to-end paths (VERDICT r4 missing #3/#4).

Two reference paths are environment-capped in this image (no dataset ships,
no network egress for HF weights). These tests run the REAL paths the day
the assets are mounted, and skip with a loud reason until then:

  * ISIC-2018 layout -> 2-epoch train -> eval CSV (the full
    train_model.py:782-831 / test_model.py pipeline on real data). Gate:
    ``ACCUNET_ISIC_DATA_DIR`` pointing at a dir with ``images/*.npy`` +
    ``masks/*.npy`` (README "Reproducing the ISIC-2018 baseline" layout).
  * real ClinicalBERT tokenizer/padding/last_hidden_state plumbing
    (nn/text.py) — the FakeTextEncoder fallback otherwise masks it. Gate:
    loadable ``medicalai/ClinicalBERT`` weights (local HF cache or egress).
"""

from __future__ import annotations

import csv
import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ISIC_DIR = os.environ.get("ACCUNET_ISIC_DATA_DIR", "")


def _isic_available():
    return (
        ISIC_DIR
        and glob.glob(os.path.join(ISIC_DIR, "images", "*.npy"))
        and glob.glob(os.path.join(ISIC_DIR, "masks", "*.npy"))
    )


@pytest.mark.skipif(
    not _isic_available(),
    reason=(
        "SKIPPED (environment): no ISIC-2018 data mounted — set "
        "ACCUNET_ISIC_DATA_DIR to a dir with images/*.npy + masks/*.npy "
        "(README ISIC recipe layout) to run the real-data train->eval->CSV "
        "pipeline"
    ),
)
def test_isic_real_data_train_eval_csv(tmp_path):
    """Full pipeline on mounted real data: 2-epoch train (frozen-split
    selection if split files exist), then eval writing the per-image
    dice/IoU CSV — the BASELINE accuracy artifact."""
    ids = sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(ISIC_DIR, "images", "*.npy"))
    )
    assert len(ids) >= 4, f"need >=4 samples under {ISIC_DIR}, got {len(ids)}"
    # tiny frozen splits derived from the mounted data keep the gated test
    # bounded; the full-recipe splits are the Reproducibility files
    train_split = tmp_path / "Train.txt"
    val_split = tmp_path / "Val.txt"
    train_split.write_text("\n".join(ids[: max(2, len(ids) // 2)]))
    val_split.write_text("\n".join(ids[max(2, len(ids) // 2):][:4]))
    ckpt_dir = tmp_path / "ckpt"

    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-m", "accunet_tpu.cli.train",
         "--model", "ACC_UNet_Lite", "--task", "ISIC18",
         "--train-dir", ISIC_DIR, "--val-dir", ISIC_DIR,
         "--train-split", str(train_split), "--val-split", str(val_split),
         "--epochs", "2", "--batch", "2", "--img-size", "224",
         "--ckpt-dir", str(ckpt_dir)],
        capture_output=True, text=True, timeout=3600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ckpts = glob.glob(str(ckpt_dir / "*"))
    assert ckpts, "train produced no checkpoint"

    csv_path = tmp_path / "per_image.csv"
    r = subprocess.run(
        [sys.executable, "-m", "accunet_tpu.cli.eval",
         "--model", "ACC_UNet_Lite", "--task", "ISIC18",
         "--test-dir", ISIC_DIR, "--split", str(val_split),
         "--ckpt", ckpts[0], "--img-size", "224",
         "--csv", str(csv_path)],
        capture_output=True, text=True, timeout=1800, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert rows, "eval CSV is empty"
    dice_col = next(c for c in rows[0] if "dice" in c.lower())
    vals = [float(row[dice_col]) for row in rows]
    assert all(0.0 <= v <= 1.0 for v in vals)


def _clinicalbert_loadable():
    try:
        from transformers import AutoTokenizer

        os.environ.setdefault("HF_HUB_OFFLINE",
                              os.environ.get("HF_HUB_OFFLINE", "1"))
        AutoTokenizer.from_pretrained("medicalai/ClinicalBERT")
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _clinicalbert_loadable(),
    reason=(
        "SKIPPED (environment): medicalai/ClinicalBERT weights not loadable "
        "(no egress and no local HF cache) — the ClinicalTextEncoder "
        "tokenizer/padding path needs the real model"
    ),
)
def test_clinicalbert_real_path():
    """The REAL encoder path: tokenize with max_length padding, run the
    frozen BERT, return (B, 128, 768) float32 last_hidden_state — and no
    FakeTextEncoder fallback engaged (flagship ref :58-96 semantics)."""
    from accunet_tpu.nn.text import ClinicalTextEncoder

    enc = ClinicalTextEncoder()
    assert enc._fallback is None, "fallback engaged despite loadable weights"
    out = enc(["melanoma on the left arm", "benign nevus"])
    assert out.shape == (2, 128, 768)
    assert out.dtype == np.float32
    # deterministic (frozen weights, no dropout in eval mode)
    out2 = enc(["melanoma on the left arm", "benign nevus"])
    np.testing.assert_allclose(out, out2, atol=0)
    # distinct prompts produce distinct embeddings
    assert np.abs(out[0] - out[1]).max() > 1e-4


def test_fake_text_fallback_warns_loudly():
    """When weights are NOT loadable the fallback must announce itself
    (VERDICT r4: silent substitution masqueraded as the real path)."""
    if _clinicalbert_loadable():
        pytest.skip("real weights present — fallback never engages here")
    import warnings

    from accunet_tpu.nn.text import ClinicalTextEncoder

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        enc = ClinicalTextEncoder()
    assert enc._fallback is not None
    msgs = [str(w.message) for w in rec if w.category is RuntimeWarning]
    assert any("FakeTextEncoder" in m and "NOT" in m for m in msgs), msgs
