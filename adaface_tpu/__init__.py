"""AdaFace-TPU: a TPU-native zero-shot face-personalization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
askerlee/AdaFace-dev (reference layout documented in SURVEY.md):

- `models/`   : SD1.5 UNet, VAE, CLIP-L text/vision encoders, ArcFace — pure
                functional JAX modules (params are pytrees of jnp arrays).
- `ops/`      : numerical core — noise schedules, samplers (lax.scan DDIM),
                flash attention (Pallas TPU kernel + XLA fallback).
- `id2ada/`   : identity → ada-prompt encoders (SubjBasisGenerator,
                FaceID2AdaPrompt family, UNet teachers).
- `text/`     : tokenizer and embedding manager (explicit dataflow, no
                monkey-patching).
- `train/`    : losses, iteration planner, optimizers, train steps.
- `parallel/` : device meshes + sharding rules (pjit data/tensor parallel).
- `data/`     : host-side training data pipeline.
- `inference/`: AdaFaceWrapper-equivalent user API.
- `evaluation/`: CLIP/DINO/ArcFace metric harness.
"""

__version__ = "0.1.0"
