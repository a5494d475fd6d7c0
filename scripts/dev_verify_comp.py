"""Dev drive: run the rewritten comp-distill trainer path end-to-end
outside pytest — 4 real optimizer steps with comp iterations on every other
step, loss finiteness + decreasing recon trend, on the chosen platform.

    python scripts/dev_verify_comp.py cpu   # CPU (fast check)
    python scripts/dev_verify_comp.py tpu   # real chip
"""

import json
import os as _os
import sys
import tempfile

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, _os.path.join(_repo, "tests"))

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

from adaface_tpu.data.personalized import PersonalizedBase
from adaface_tpu.id2ada.face_backends import DeterministicBackend
from adaface_tpu.id2ada.face_id_to_ada_prompt import Arc2FaceID2AdaPrompt
from adaface_tpu.id2ada.teachers import UNetTeacher
from adaface_tpu.models.clip import init_text_params
from adaface_tpu.models.unet import init_unet_params
from adaface_tpu.text.embedding_manager import EmbeddingManager, PlaceholderSpec
from adaface_tpu.text.tokenizer import CLIPTokenizer
from adaface_tpu.train.comp_step import CompDistillConfig
from adaface_tpu.train.train_step import TrainConfig
from adaface_tpu.train.trainer import Trainer, TrainerConfig

from test_id2ada import SMALL_CLIP, SMALL_VISION, D  # noqa: E402
from test_train import UNET_CFG  # noqa: E402


def main():
    print("platform:", jax.devices()[0].platform)
    root = tempfile.mkdtemp(prefix="toydata_")
    import os

    for name in ("alice", "bob"):
        d = os.path.join(root, name)
        os.makedirs(d)
        rs = np.random.RandomState(hash(name) % 99)
        for i in range(2):
            Image.fromarray(
                rs.randint(0, 255, (64, 64, 3), np.uint8)
            ).save(os.path.join(d, f"{i}.png"))
    with open(os.path.join(root, "metainfo.json"), "w") as f:
        json.dump({"alice": {"cls_delta_string": "woman"},
                   "bob": {"cls_delta_string": "man"}}, f)

    rng = jax.random.PRNGKey(0)
    tok = CLIPTokenizer.character_fallback()
    k_id = 16
    em = EmbeddingManager(tok, [PlaceholderSpec("z", k_id)])
    encoder = Arc2FaceID2AdaPrompt(
        jax.random.fold_in(rng, 1), face_backend=DeterministicBackend(),
        clip_vision_cfg=SMALL_VISION, sbg_clip_cfg=SMALL_CLIP,
        text_cfg=SMALL_CLIP, output_dim=D, is_training=True)
    unet = init_unet_params(jax.random.fold_in(rng, 3), UNET_CFG)
    text = init_text_params(jax.random.fold_in(rng, 4), SMALL_CLIP)
    frozen = {"unet": unet, "text_encoder": text,
              "sbg_buffers": encoder.subj_basis_generator["buffers"]}
    trainable = {"sbg": encoder.subj_basis_generator["params"]}

    logdir = tempfile.mkdtemp(prefix="logs_")
    cfg = TrainerConfig(
        log_dir=logdir, batch_size=2, max_steps=4, accum_steps=1,
        ckpt_every=100, optimizer="adamw", lr=1e-4, warmup_steps=1,
        comp_distill_iter_gap=2, unet_distill_iter_gap=0,
        image_size=128, num_vectors_per_subj_token=k_id)
    train_cfg = TrainConfig(unet=UNET_CFG, sbg=encoder.sbg_cfg,
                            clip_text=SMALL_CLIP)
    teacher = UNetTeacher(unet_params=unet, unet_cfg=UNET_CFG)
    comp_cfg = CompDistillConfig(num_priming_steps=2, num_denoising_steps=2)
    trainer = Trainer(cfg, train_cfg, frozen, trainable, encoder, em,
                      vae_params=None, teacher=teacher, comp_cfg=comp_cfg)
    ds = PersonalizedBase(root, num_vectors_per_subj_token=k_id,
                          size=128, seed=0)
    metrics = trainer.fit(ds, num_steps=4)
    print("final metrics:", {k: float(v) for k, v in metrics.items()
                             if np.isscalar(v) or getattr(v, "ndim", 1) == 0})
    assert np.isfinite(float(metrics["loss"])), "loss not finite"
    assert trainer.planner.comp_iters >= 2, "comp iterations did not run"
    print("OK: comp-distill trainer path ran",
          trainer.planner.comp_iters, "comp iters,",
          trainer.planner.recon_iters, "recon iters")


if __name__ == "__main__":
    main()
