"""Every registered model constructs and runs a forward pass (scaled-down
configs; keeps the public registry API honest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accunet_tpu.models import registry, build

# per-model scaled-down kwargs + input spec
TINY = dict(hw=64, ch=3)
SPECS = {
    "ACC_UNet": dict(kw=dict(n_filts=8)),
    "ACC_UNet_Lite": dict(kw=dict(n_filts=8)),
    "ACC_UNet_W": dict(kw=dict(n_filts=8)),
    "UNet_base": dict(kw=dict(base_width=4)),
    "UNext": dict(kw={}),
    "UNext_S": dict(kw={}),
    "UCTransNet": dict(kw=dict(img_size=64, base_channel=8, num_layers=1)),
    "MultiResUnet": dict(kw=dict(nfilt=8)),
    "Unetpp": dict(kw={}),
    "UKAN": dict(kw=dict(embed_dims=(16, 24, 32))),
    "TinyUNet": dict(kw={}, out_ch=2),
    "SwinUnet": dict(kw=dict(img_size=224, embed_dim=24), hw=224),
    "SMESwinUnet": dict(kw=dict(img_size=224, embed_dim=24), hw=224),
    "TransUNet": dict(kw=dict(img_size=64, num_layers=1), hw=64),
    "TransUnet_fKAN": dict(kw=dict(img_size=64, num_layers=1), hw=64),
    "TransUNet_Vit_fKAN": dict(kw=dict(img_size=64, num_layers=1), hw=64),
    "MedMamba": dict(kw=dict(num_classes=3, depths=(1, 1), dims=(16, 32), d_state=4),
                     clf=True),
    "SpatialMamba": dict(kw=dict(num_classes=3, depths=(1, 1), dims=(16, 32), d_state=2),
                         clf=True),
    "Backbone_SpatialMamba": dict(kw=dict(num_classes=3, depths=(1, 1),
                                          dims=(16, 32), d_state=2), clf=True),
    "KNUnet": dict(kw=dict(depths=(1, 1, 1, 1), hidden_dims=(8, 16, 32, 64),
                           d_state=4), out_ch=2),
    "SegViT_fKAN": dict(kw=dict(img_size=64, num_layers=1, feat_size=(8, 16, 24, 32),
                                hidden=64, heads=4, mlp_dim=128),
                        hw=64, ch=1, segmamba=True),
}

SEGMAMBA_KW = dict(depths=(1, 1, 1, 1), feat_size=(8, 16, 24, 32), hidden_size=40)
# window attention needs stage resolutions divisible by 7
SPECS["Segmamba_hybrid_gsc_SWAttn"] = dict(hw=112)
CMRF_NAMES = [n for n in registry if n.startswith("UNext_CMRF")]
SEGMAMBA_NAMES = [
    n for n in registry if n.lower().startswith("segmamba")
]  # incl. the reference's lowercase 'segmamba_hybrid_gsc_KAN_PE_EffKan'


@pytest.mark.parametrize("name", sorted(registry))
def test_model_forward(name):
    spec = SPECS.get(name, {})
    hw = spec.get("hw", 64)
    ch = spec.get("ch", 3)
    kw = dict(spec.get("kw", {}))

    if name in SEGMAMBA_NAMES:
        model = build(name, in_chans=1, out_chans=1, **SEGMAMBA_KW)
        ch = 1
    elif name == "SegViT_fKAN":
        model = build(name, in_chans=1, out_chans=1, **kw)
    elif spec.get("clf"):
        model = build(name, n_channels=ch, **kw)
    elif name.startswith("UNext_InceptionNext"):
        model = build(name, n_channels=3, n_classes=1)
    else:
        model = build(name, n_channels=ch, n_classes=spec.get("out_ch", 1), **kw)

    x = jnp.asarray(np.random.RandomState(0).rand(1, hw, hw, ch), jnp.float32)
    var = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(var, x, train=False)
    main = out[0] if isinstance(out, (tuple, list)) else out
    assert np.isfinite(np.asarray(main)).all(), name
    if not spec.get("clf"):
        assert main.shape[1] == hw and main.shape[2] == hw, (name, main.shape)


@pytest.mark.quick
def test_reference_factory_keys_resolve():
    """Every `model_type == '<name>'` string in the reference train factory
    (train_model.py:351-640, incl. commented ablation rungs) resolves to a
    registered constructor."""
    import os
    import re

    ref = "/root/reference/Experiments/train_model.py"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not present")
    src = open(ref).read()
    keys = list(dict.fromkeys(re.findall(r"model_type == '([^']+)'", src)))
    assert len(keys) >= 50
    for k in keys:
        if k.startswith("MultiResUnet"):
            m = build(k, n_channels=3, n_classes=1)  # name-parsing path
        else:
            assert k in registry, k
