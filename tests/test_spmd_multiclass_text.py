"""SPMD training CLI, multi-class path, text-conditioned training, and the
Swin pretrained-checkpoint surgery (VERDICT round-1 items 2 and 8)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _make_dataset(root, n, hw=32, seed=0, n_classes=1):
    os.makedirs(root / "images")
    os.makedirs(root / "masks")
    rs = np.random.RandomState(seed)
    for i in range(n):
        img = rs.rand(4, hw, hw).astype(np.float32) * 0.1
        if n_classes > 1:
            msk = rs.randint(0, n_classes + 1, (hw, hw)).astype(np.uint8)
        else:
            msk = (rs.rand(hw, hw) > 0.5).astype(np.uint8)
        np.save(root / "images" / f"s{i}.npy", img)
        np.save(root / "masks" / f"s{i}.npy", msk)


@pytest.mark.quick  # quick-tier representative of the SPMD e2e family
def test_spmd_train_cli_uses_mesh(tmp_path):
    """cli/train --mesh data=4,model=2 runs a sharded train step end to end
    on the 8-virtual-device CPU mesh and the resulting params live on it."""
    train_dir, val_dir = tmp_path / "train", tmp_path / "val"
    _make_dataset(train_dir, 8)
    _make_dataset(val_dir, 4)

    from accunet_tpu.cli import train as train_cli

    state, history = train_cli.main([
        "--model", "UNet_base",
        "--train-dir", str(train_dir),
        "--val-dir", str(val_dir),
        "--epochs", "1",
        "--mesh", "data=4,model=2",
        "--ckpt-dir", str(tmp_path / "ckpt"),
        "--set", "data.img_size=32", "data.batch_size=8",
        "model.base_width=8",
    ])
    assert history and np.isfinite(history[0]["train"]["loss"])
    shardings = {
        str(x.sharding)
        for x in jax.tree_util.tree_leaves(state.params)
        if hasattr(x, "sharding")
    }
    # at least one leaf must be placed on the named mesh (not single-device)
    assert any("data" in s or "model" in s or "Named" in s for s in shardings), (
        shardings
    )


def test_multiclass_train_cli(tmp_path):
    """--n-classes 3 trains a 4-way softmax head (BASELINE config-4 shape)."""
    train_dir, val_dir = tmp_path / "train", tmp_path / "val"
    _make_dataset(train_dir, 8, n_classes=3)
    _make_dataset(val_dir, 4, n_classes=3)

    from accunet_tpu.cli import train as train_cli

    state, history = train_cli.main([
        "--model", "ACC_UNet_W",
        "--train-dir", str(train_dir),
        "--val-dir", str(val_dir),
        "--epochs", "1",
        "--n-classes", "3",
        "--ckpt-dir", str(tmp_path / "ckpt"),
        "--set", "data.img_size=32", "data.batch_size=4",
        "model.n_filts=8",
    ])
    assert np.isfinite(history[0]["train"]["loss"])
    assert 0.0 <= history[0]["val"]["dice"] <= 1.0


def test_text_conditioned_train_cli(tmp_path):
    """TEXT_MODELS path: prompts csv + ClinicalTextEncoder (fake fallback)
    feed (B,T,768) embeddings into the jitted train step
    (train_model.py:271-291, Train_one_epoch.py:104-107)."""
    train_dir, val_dir = tmp_path / "train", tmp_path / "val"
    _make_dataset(train_dir, 4)
    _make_dataset(val_dir, 2)
    for d, n in ((train_dir, 4), (val_dir, 2)):
        rows = ["Image,Description"] + [
            f"s{i}.npy,benign lesion in the upper left quadrant" for i in range(n)
        ]
        (d / "prompts.csv").write_text("\n".join(rows))

    from accunet_tpu.cli import train as train_cli

    state, history = train_cli.main([
        "--model", "Segmamba_hybrid_gsc_KAN_PE_ds_text",
        "--train-dir", str(train_dir),
        "--val-dir", str(val_dir),
        "--epochs", "1",
        "--text",
        "--ckpt-dir", str(tmp_path / "ckpt"),
        "--set", "data.img_size=32", "data.batch_size=2",
        "model.depths=(1,1,1,1)", "model.feat_size=(8,16,24,32)",
        "model.hidden_size=40",
    ])
    assert np.isfinite(history[0]["train"]["loss"])
    # FiLM fusion params exist only when text actually flowed through init
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("skip_film" in n for n in names), sorted(names)[:20]


def test_swin_load_from_surgery():
    """swin_load_from applies the encoder→decoder key remap of
    nets/SwinUnet.py:836-869 and skips shape-incompatible entries."""
    from accunet_tpu.models.swin_unet import SwinUnet
    from accunet_tpu.port.torch_state import swin_load_from

    model = SwinUnet(3, 1, img_size=224, embed_dim=24)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), x, train=False)

    rs = np.random.RandomState(0)
    qkv0 = template["params"]["layers_0_blocks_0"]["attn"]["qkv"]["kernel"]
    dim0 = qkv0.shape[0]
    pretrained = {
        "model": {
            # encoder block weight that must also land in layers_up.3
            "layers.0.blocks.0.attn.qkv.weight": rs.rand(
                qkv0.shape[1], dim0
            ).astype(np.float32),
            # patch embed conv (O,I,kh,kw)
            "patch_embed.proj.weight": rs.rand(24, 3, 4, 4).astype(np.float32),
            # shape-incompatible entry must be skipped, not crash
            "patch_embed.norm.weight": rs.rand(999).astype(np.float32),
            # shape-incompatible 2D (Linear) weight: _convert_leaf transposes
            # these, and before round 3 returned WITHOUT a shape check — a
            # mismatched checkpoint weight slipped past the strict=False
            # filter and exploded at apply time (ADVICE r2)
            "layers.0.blocks.0.attn.proj.weight": rs.rand(7, 7).astype(
                np.float32
            ),
        }
    }
    filled = swin_load_from(template, pretrained)

    got_enc = np.asarray(
        filled["params"]["layers_0_blocks_0"]["attn"]["qkv"]["kernel"]
    )
    want = pretrained["model"]["layers.0.blocks.0.attn.qkv.weight"].T
    np.testing.assert_allclose(got_enc, want)
    # decoder remap: layers.0 -> layers_up.3
    got_dec = np.asarray(
        filled["params"]["layers_up_3_blocks_0"]["attn"]["qkv"]["kernel"]
    )
    np.testing.assert_allclose(got_dec, want)
    # incompatible entries kept their init (1D scale AND transposed 2D linear)
    np.testing.assert_allclose(
        np.asarray(filled["params"]["patch_embed_norm"]["scale"]),
        np.asarray(template["params"]["patch_embed_norm"]["scale"]),
    )
    np.testing.assert_allclose(
        np.asarray(filled["params"]["layers_0_blocks_0"]["attn"]["proj"]["kernel"]),
        np.asarray(template["params"]["layers_0_blocks_0"]["attn"]["proj"]["kernel"]),
    )
