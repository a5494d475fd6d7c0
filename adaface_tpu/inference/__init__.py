from adaface_tpu.inference.pipeline import DiffusionPipeline, PipelineModules
from adaface_tpu.inference.wrapper import AdaFaceWrapper
