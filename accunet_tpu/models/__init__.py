"""Model zoo registry.

The reference selects models via a giant if/elif chain keyed on
`config.model_name` (/root/reference/Experiments/train_model.py:351-640).
Here every architecture registers a constructor under the same public name so
configs stay compatible.
"""

from __future__ import annotations

from typing import Callable, Dict

registry: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        registry[name] = fn
        return fn
    return deco


def build(name: str, **kwargs):
    if name not in registry:
        # 'MultiResUnet1_<nfilt>_<alpha>' model-name strings
        # (train_model.py:386-387)
        import re

        m = re.match(r"^MultiResUnet1?_(\d+)_([\d.]+)$", name)
        if m:
            kwargs.setdefault("nfilt", int(m.group(1)))
            kwargs.setdefault("alpha", float(m.group(2)))
            return registry["MultiResUnet"](**kwargs)
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(registry)}"
        )
    return registry[name](**kwargs)


from accunet_tpu.models.acc_unet import ACC_UNet, ACC_UNet_Lite, ACC_UNet_W, ACCUNet
from accunet_tpu.models.unext import UNext, UNext_S

register("ACC_UNet")(ACC_UNet)
register("ACC_UNet_Lite")(ACC_UNet_Lite)
register("ACC_UNet_W")(ACC_UNet_W)
register("UNext")(UNext)
register("UNeXt")(UNext)  # exact factory spelling (train_model.py:389)
register("UNext_S")(UNext_S)

from accunet_tpu.models.unet import UNet_base

register("UNet_base")(UNet_base)

from accunet_tpu.models.uctransnet import UCTransNet

register("UCTransNet")(UCTransNet)

from accunet_tpu.models.multires_unet import MultiResUnet
from accunet_tpu.models.unetpp import UNetPlusPlus

register("MultiResUnet")(MultiResUnet)
register("Unetpp")(UNetPlusPlus)

from accunet_tpu.models.u_kan import UKAN

register("UKAN")(UKAN)
register("U-KAN")(UKAN)  # exact factory spelling (train_model.py:401)

from accunet_tpu.models.tiny_unet import TinyUNet

register("TinyUNet")(TinyUNet)

from accunet_tpu.models.medmamba import VSSM, SpatialMamba, Backbone_SpatialMamba

register("MedMamba")(VSSM)
register("SpatialMamba")(SpatialMamba)
register("Backbone_SpatialMamba")(Backbone_SpatialMamba)

from accunet_tpu.models.unext_inceptionnext import UNextInceptionNextMLFC

register("UNext_InceptionNext_MLFC")(UNextInceptionNextMLFC)
register("UNext_InceptionNext_MLFC_fKAN")(
    lambda **kw: UNextInceptionNextMLFC(use_fkan=True, **kw)
)

from accunet_tpu.models.seg_fvit import SegViTfKAN

register("SegViT_fKAN")(SegViTfKAN)


from accunet_tpu.models.sme_swin_unet import SMESwinUnet

register("SMESwinUnet")(SMESwinUnet)

from accunet_tpu.models.knunet import KMUNet

register("KNUnet")(KMUNet)

from accunet_tpu.models.swin_unet import SwinUnet

register("SwinUnet")(SwinUnet)

from accunet_tpu.models.transunet import TransUNet

register("TransUNet")(TransUNet)
register("TransUnet_fKAN")(
    lambda **kw: TransUNet(mlp_type="fkan", **kw)
)
register("TransUNet_Vit_fKAN")(
    lambda **kw: TransUNet(backbone="ViT-B_16", mlp_type="fkan", **kw)
)
# TransUNet_KAN_fJNB (train_model.py:626, vit_seg_modeling_KAN_fJNB.py) — the
# fKAN MLP here IS the fractional-Jacobi (fJNB) KAN, so the same constructor
register("TransUNet_fJNB")(
    lambda **kw: TransUNet(mlp_type="fkan", **kw)
)

from accunet_tpu.models.unext_cmrf import (
    VARIANTS as _CMRF_VARIANTS,
    build_unext_cmrf,
)

for _name in _CMRF_VARIANTS:
    register(_name)(
        (lambda n: lambda **kw: build_unext_cmrf(n, **kw))(_name)
    )

from accunet_tpu.models.segmamba import VARIANTS as _SEGMAMBA_VARIANTS, build_segmamba

for _name in _SEGMAMBA_VARIANTS:
    register(_name)(
        (lambda n: lambda **kw: build_segmamba(n, **kw))(_name)
    )
