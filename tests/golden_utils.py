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


def stub_reference_ddpm_deps():
    """Extra stubs so the reference `ldm.models.diffusion.ddpm` module
    itself imports — unlocking its comp-distill orchestration methods
    (`prime_x_start_for_comp_prompts`, `comp_distill_multistep_denoise`)
    as golden oracles. Import `transformers` for real first: its import
    probes optional deps (peft/torchvision) via importlib and chokes on
    spec-less stubs."""
    import importlib.machinery

    import torch
    import transformers  # noqa: F401 — must import before stubbing peft

    def _specced(name, **attrs):
        mod = _stub(name, **attrs)
        if getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return mod

    class _Any:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return None

    stub_reference_deps()
    _specced("pytorch_lightning", LightningModule=torch.nn.Module)
    _specced("pytorch_lightning.utilities", rank_zero_only=lambda f: f)
    _specced("muon", MuonWithAuxAdam=_Any)
    _specced("peft", LoraConfig=_Any, get_peft_model=lambda *a, **k: None)
    _specced("peft.utils")
    _specced("peft.utils.constants", DUMMY_TARGET_MODULES="dummy")
    _specced("peft.tuners")
    _specced("peft.tuners.lora", LoraLayer=_Any)
    _specced("peft.tuners.lora.dora", DoraLinearLayer=_Any)
    _specced("peft.tuners.tuners_utils", BaseTunerLayer=_Any)
    _specced("safetensors")
    _specced("safetensors.torch", load_file=lambda *a, **k: {},
             save_file=lambda *a, **k: None)

    class _Logging:
        @staticmethod
        def get_logger(*a, **k):
            import logging as _l

            return _l.getLogger("stub")

    dm = sys.modules["diffusers.models"]
    _specced("diffusers.models.attention_processor", Attention=_Any,
             AttnProcessor2_0=_Any)
    dm.attention_processor = sys.modules["diffusers.models.attention_processor"]
    _specced("diffusers.utils", logging=_Logging(),
             is_torch_version=lambda *a, **k: True,
             deprecate=lambda *a, **k: None)
    _specced("diffusers.loaders")
    _specced("diffusers.loaders.peft", PeftAdapterMixin=_Any)
    _specced("retinaface", )
    _specced("retinaface.pre_trained_models", get_model=lambda *a, **k: None)
    if "easydict" not in sys.modules:
        class EasyDict(dict):
            # must raise AttributeError (not KeyError) so hasattr() works —
            # the reference GMA probes `hasattr(config, 'corr_levels')`
            # (`/root/reference/gma/network.py:25`)
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            __setattr__ = dict.__setitem__

        _specced("easydict", EasyDict=EasyDict)
    try:
        import cv2  # noqa: F401
    except Exception:
        _specced("cv2")
