"""PyTorch → accunet_tpu checkpoint porting.

Lets users of the reference repo load their trained `.pth.tar` checkpoints
(saved by /root/reference/Experiments/train_model.py:125-145 as
{'state_dict': ...}) into the flax models here, and powers the golden-parity
test suite.

The mapping is structural: flax submodule names mirror the torch attribute
names, with two mechanical rewrites:
  * flax uses `foo_3` where torch ModuleList indexing gives `foo.3`
  * tensor layout transposes (OIHW→HWIO for conv, (I,O,kh,kw)→(kh,kw,I,O) for
    transposed conv, out-major→in-major for Linear)
  * BatchNorm: weight/bias → scale/bias (params), running_mean/running_var →
    mean/var (batch_stats)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _rewrite_indices(piece: str) -> str:
    """Recursively turn trailing _<int> suffixes into torch ModuleList
    indices: 'stages_0_1' -> 'stages.0.1'."""
    m = re.match(r"^(.*)_(\d+)$", piece)
    if m:
        return f"{_rewrite_indices(m.group(1))}.{m.group(2)}"
    return piece


def _torch_key(path: tuple[str, ...]) -> str:
    parts = []
    for p in path:
        # '__' marks a literal underscore in the torch name (no indexing):
        # 'embeddings__1' -> 'embeddings_1'
        parts.append("_".join(_rewrite_indices(seg) for seg in p.split("__")))
    return ".".join(parts)


_BN_STAT = {"mean": "running_mean", "var": "running_var"}
_BN_PARAM = {"scale": "weight", "bias": "bias"}


def _convert_leaf(leaf_name: str, flax_shape, torch_val: np.ndarray) -> np.ndarray:
    v = np.asarray(torch_val, dtype=np.float32)
    if leaf_name == "kernel_t":
        if v.ndim == 5:  # convT3d (I,O,kd,kh,kw) on unit-depth input -> 2D:
            v = v[:, :, v.shape[2] // 2]  # only the center depth tap sees data
        v = v.transpose(2, 3, 0, 1)  # convT (I,O,kh,kw) -> (kh,kw,I,O)
    elif leaf_name == "kernel":
        if v.ndim == 5:  # conv3d (O,I,kd,kh,kw) on unit-depth input -> 2D:
            # with 'same' depth padding only the center tap multiplies real
            # data (GSC's 3x3x3 convs; kd=1 stems keep slice 0 == center)
            v = v[:, :, v.shape[2] // 2]
        if v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)  # conv OIHW -> HWIO
        elif v.ndim == 3:
            v = v.transpose(2, 1, 0)  # conv1d (O, I/g, K) -> (K, I/g, O)
        elif v.ndim == 2:
            v = v.T  # Linear (out,in) -> (in,out)
    # the check runs on EVERY path (incl. after the transposes): callers like
    # swin_load_from rely on ValueError for their load_state_dict(strict=False)
    # shape filter — installing a mismatched weight would fail at apply time
    if v.shape != tuple(flax_shape):
        raise ValueError(
            f"shape mismatch for {leaf_name}: torch {v.shape} vs flax {tuple(flax_shape)}"
        )
    return v


def import_torch_state(
    variables: Mapping[str, Any],
    torch_state: Mapping[str, np.ndarray],
    prefix: str = "",
    rename: Dict[str, str] | None = None,
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax variables template {'params', 'batch_stats', ...} from a flat
    torch state_dict (tensor values may be torch tensors or numpy arrays).

    `rename` maps computed torch keys to actual torch keys for irregular cases.
    Unused torch entries are allowed (e.g. the Lite model's dead MLFC convs,
    /root/reference/ACC_UNet/ACC_UNet_lite.py:389-418).
    """
    torch_np = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in torch_state.items()
    }
    if rename is None:
        rename = {}

    def build(tree, path, collection):
        if isinstance(tree, Mapping):
            return {
                k: build(v, path + (k,), collection) for k, v in tree.items()
            }
        leaf_name = path[-1]
        mod_path, leaf = path[:-1], path[-1]
        if collection == "batch_stats":
            tname = _torch_key(mod_path) + "." + _BN_STAT[leaf]
        elif leaf in ("scale",):
            tname = _torch_key(mod_path) + "." + _BN_PARAM[leaf]
        elif leaf in ("kernel", "kernel_t"):
            tname = _torch_key(mod_path) + ".weight"
        elif leaf == "bias":
            # could be conv/linear bias or BN bias — same torch name either way
            tname = _torch_key(mod_path) + ".bias"
        else:  # scalar params like MLFC 'W'
            tname = _torch_key(path)
        tname = prefix + tname
        if callable(rename):
            tname = rename(tname)
        else:
            tname = rename.get(tname, tname)
        if tname not in torch_np:
            if strict:
                raise KeyError(f"torch state_dict missing {tname!r} for flax {path}")
            return tree
        return jnp.asarray(_convert_leaf(leaf_name, np.shape(tree), torch_np[tname]))

    out = {}
    for coll, tree in variables.items():
        out[coll] = build(tree, (), coll)
    return out


def swin_rename(n: str) -> str:
    """flax-computed torch key → actual SwinTransformerSys key (the flax Swin
    modules use flattened names; nets/SwinUnet.py attribute layout)."""
    n = re.sub(r"^layers_(\d)_blocks\.", r"layers.\1.blocks.", n)
    n = re.sub(r"^layers_(\d)_downsample\.", r"layers.\1.downsample.", n)
    n = re.sub(r"^layers_up_(\d)_blocks\.", r"layers_up.\1.blocks.", n)
    n = re.sub(r"^layers_up_(\d)_upsample\.", r"layers_up.\1.upsample.", n)
    n = n.replace("patch_embed_proj.", "patch_embed.proj.")
    n = n.replace("patch_embed_norm.", "patch_embed.norm.")
    n = n.replace("mlp_fc1.", "mlp.fc1.").replace("mlp_fc2.", "mlp.fc2.")
    return n


def swin_load_from(variables: Mapping[str, Any], ckpt) -> Dict[str, Any]:
    """Swin pretrained-checkpoint surgery for SwinUnet/SMESwinUnet — the
    TPU-side equivalent of `SwinUnet.load_from()`
    (/root/reference/Experiments/nets/SwinUnet.py:836-869):

      * a raw backbone checkpoint ({'model': ...}, e.g.
        swin_tiny_patch4_window7_224.pth) loads the encoder, and every
        encoder key `layers.{n}...` is also remapped to the decoder as
        `layers_up.{3-n}...`
      * a full-model dump (no 'model' key) has its first 17 chars stripped
        and 'output' keys dropped (:56-62)
      * loading is non-strict: missing keys and shape mismatches (e.g.
        relative-position tables at a different window size, heads) keep the
        initialized value, mirroring `load_state_dict(..., strict=False)`

    `variables` is the flax template from `model.init`; returns filled
    variables."""
    if isinstance(ckpt, Mapping) and "model" in ckpt:
        sd = dict(ckpt["model"])
        for k, v in list(sd.items()):
            if k.startswith("layers."):
                n_layer = 3 - int(k[7:8])
                sd[f"layers_up.{n_layer}" + k[8:]] = v
    else:
        sd = {k[17:]: v for k, v in dict(ckpt).items() if "output" not in k}

    # keep only entries the template can absorb (shape-compatible after the
    # layout transform) — `strict=False` skips the rest
    flat = {}

    def collect(tree, path, coll):
        if isinstance(tree, Mapping):
            for k, v in tree.items():
                collect(v, path + (k,), coll)
            return
        leaf = path[-1]
        mod_path = path[:-1]
        if coll == "batch_stats":
            tname = _torch_key(mod_path) + "." + _BN_STAT[leaf]
        elif leaf == "scale" or leaf in ("kernel", "kernel_t"):
            tname = _torch_key(mod_path) + ".weight"
        elif leaf == "bias":
            tname = _torch_key(mod_path) + ".bias"
        else:
            tname = _torch_key(path)
        tname = swin_rename(tname)
        if tname in sd:
            v = sd[tname]
            v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            try:
                _convert_leaf(leaf, np.shape(tree), v)
                flat[tname] = v
            except ValueError:
                pass  # incompatible shape — keep init (strict=False semantics)

    for coll, tree in variables.items():
        collect(tree, (), coll)
    return import_torch_state(variables, flat, rename=swin_rename, strict=False)


def load_torch_checkpoint(path: str):
    """Load a reference-format .pth.tar and return its flat state_dict
    (train_model.py saves {'state_dict': model.state_dict(), ...})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    # strip DataParallel 'module.' prefixes (test_model.py:221-224)
    return {k.removeprefix("module."): v for k, v in state.items()}
