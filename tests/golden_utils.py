"""Shared setup for golden-parity tests: import the read-only reference
with its heavy/unavailable dependencies stubbed (diffusers, ConsistentID,
insightface, omegaconf, torchvision)."""

import sys
import types


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def stub_reference_deps():
    class _Any:
        pass

    _stub("diffusers", StableDiffusionPipeline=_Any,
          UNet2DConditionModel=_Any, DDIMScheduler=_Any,
          DPMSolverSinglestepScheduler=_Any, AutoencoderKL=_Any,
          StableDiffusionImg2ImgPipeline=_Any, LCMScheduler=_Any)
    _stub("diffusers.models")
    _stub("diffusers.models.unets")
    _stub("diffusers.models.unets.unet_2d_condition",
          UNet2DConditionOutput=_Any)
    _stub("ConsistentID")
    _stub("ConsistentID.lib")
    _stub("ConsistentID.lib.pipeline_ConsistentID",
          ConsistentIDPipeline=_Any)
    _stub("insightface")
    _stub("insightface.app", FaceAnalysis=_Any)

    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tvu = _stub("torchvision.utils",
                    make_grid=lambda *a, **k: None,
                    draw_bounding_boxes=lambda *a, **k: None)
        tv.utils = tvu
        tvt = _stub("torchvision.transforms")
        tv.transforms = tvt

    if "omegaconf" not in sys.modules:
        class ListConfig(list):
            pass

        class DictConfig(dict):
            pass

        oc = _stub("omegaconf", ListConfig=ListConfig, DictConfig=DictConfig,
                   OmegaConf=_Any)
        lc = _stub("omegaconf.listconfig", ListConfig=ListConfig)
        oc.listconfig = lc

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
