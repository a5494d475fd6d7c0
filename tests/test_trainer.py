import json

import jax
import numpy as np
import pytest
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
from adaface_tpu.train.iteration_plan import IterationPlanner
from adaface_tpu.train.train_step import TrainConfig
from adaface_tpu.train.trainer import Trainer, TrainerConfig

from tests.test_id2ada import SMALL_CLIP, SMALL_VISION, D
from tests.test_train import UNET_CFG


def test_iteration_planner_round_robin():
    p = IterationPlanner(comp_distill_iter_gap=4, unet_distill_iter_gap=5)
    types = [p.plan(i).iter_type for i in range(20)]
    assert types[0] == "comp_distill"
    assert types[4] == "comp_distill" and types[8] == "comp_distill"
    assert "unet_distill" in types and "recon" in types
    # deterministic seeds per (rank, epoch, batch)
    assert p.plan(3, epoch=1).seed == p.plan(3, epoch=1).seed
    assert p.plan(3, epoch=1).seed != p.plan(3, epoch=2).seed


def test_iteration_planner_weight_switch():
    p = IterationPlanner(comp_distill_iter_gap=2, has_comp_unet_weights=True)
    f0 = p.plan(0)  # comp
    f1 = p.plan(1)  # non-comp
    f2 = p.plan(2)  # comp
    assert f0.use_comp_distill_weights and f0.switch_weights
    assert not f1.use_comp_distill_weights and f1.switch_weights
    assert f2.use_comp_distill_weights and f2.switch_weights


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("toydata")
    for name in ("alice", "bob"):
        d = root / name
        d.mkdir()
        rs = np.random.RandomState(hash(name) % 99)
        for i in range(2):
            Image.fromarray(
                rs.randint(0, 255, (64, 64, 3), np.uint8)).save(d / f"{i}.png")
    (root / "metainfo.json").write_text(json.dumps(
        {"alice": {"cls_delta_string": "woman"},
         "bob": {"cls_delta_string": "man"}}))
    return str(root)


def test_trainer_runs_all_iteration_types(toy_dataset, tmp_path):
    rng = jax.random.PRNGKey(0)
    tok = CLIPTokenizer.character_fallback()
    k_id = 16  # arc2face always emits 16 img-prompt tokens
    em = EmbeddingManager(tok, [PlaceholderSpec("z", k_id)])
    encoder = Arc2FaceID2AdaPrompt(
        jax.random.fold_in(rng, 1),
        face_backend=DeterministicBackend(),
        clip_vision_cfg=SMALL_VISION, sbg_clip_cfg=SMALL_CLIP,
        text_cfg=SMALL_CLIP, output_dim=D, is_training=True)

    unet = init_unet_params(jax.random.fold_in(rng, 3), UNET_CFG)
    text = init_text_params(jax.random.fold_in(rng, 4), SMALL_CLIP)
    frozen = {"unet": unet, "text_encoder": text,
              "sbg_buffers": encoder.subj_basis_generator["buffers"]}
    trainable = {"sbg": encoder.subj_basis_generator["params"]}

    from adaface_tpu.train.recon_step import ReconStepConfig

    cfg = TrainerConfig(
        log_dir=str(tmp_path / "logs"), batch_size=2, max_steps=6,
        accum_steps=1, ckpt_every=6, optimizer="adamw", lr=1e-4,
        warmup_steps=1, comp_distill_iter_gap=3, unet_distill_iter_gap=2,
        image_size=128, num_vectors_per_subj_token=k_id,
        # keep the toy run to two recon graph shapes with short loops
        recon_cfg=ReconStepConfig(num_denoising_steps=1,
                                  num_priming_steps=1,
                                  compute_dtype="float32"))
    # image 128 → x_start 16x16 (no VAE → size/8)
    train_cfg = TrainConfig(unet=UNET_CFG, sbg=encoder.sbg_cfg,
                            clip_text=SMALL_CLIP)
    teacher = UNetTeacher(unet_params=unet, unet_cfg=UNET_CFG)
    # p_init_fg=1.0 forces the fg-seeded comp x_start path (init_x.py)
    comp_cfg = CompDistillConfig(num_priming_steps=1, num_denoising_steps=2,
                                 p_init_fg_from_training_image=1.0)

    trainer = Trainer(cfg, train_cfg, frozen, trainable, encoder, em,
                      vae_params=None, teacher=teacher, comp_cfg=comp_cfg)
    ds = PersonalizedBase(toy_dataset, num_vectors_per_subj_token=k_id,
                          size=128, seed=0)
    metrics = trainer.fit(ds, num_steps=6)
    assert np.isfinite(float(metrics["loss"]))
    # all three iteration types ran
    assert trainer.planner.comp_iters >= 1
    assert trainer.planner.unet_distill_iters >= 1
    assert trainer.planner.recon_iters >= 1
    # metrics CSV + checkpoint written
    import os

    assert os.path.exists(os.path.join(cfg.log_dir, "metrics.csv"))
    ckpts = os.listdir(os.path.join(cfg.log_dir, "checkpoints"))
    assert any(c.startswith("embeddings_gs-") for c in ckpts)
    # resume path: newest ckpt found and warm-started into the trainer
    ck = Trainer.latest_ckpt(cfg.log_dir)
    assert ck is not None and ck.endswith("embeddings_gs-6")
    assert trainer.load(ck) == 6


def test_sample_logger(tmp_path):
    import os
    import time

    import numpy as np

    from adaface_tpu.utils.sample_logger import SampleLogger, _to_grid

    grid = _to_grid(np.random.rand(5, 3, 16, 16), cols=3,
                    color=(200, 64, 64))
    assert grid.shape == (2 * 24, 3 * 24, 3)
    # border pixels carry the iteration-type color
    assert tuple(grid[0, 0]) == (200, 64, 64)

    sl = SampleLogger(str(tmp_path))
    ok = sl.log(7, "recon", np.random.rand(2, 3, 8, 8))
    assert ok
    sl.close()
    files = os.listdir(os.path.join(str(tmp_path), "samples"))
    assert files == ["0000007_recon.png"]


def test_trainer_unfreeze_unet(toy_dataset, tmp_path):
    """`unfreeze_unet` (v1-finetune-unet.yaml): UNet joins the trainable
    set, receives updates, and checkpoints export unet_fp16.safetensors."""
    import os

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

    cfg = TrainerConfig(
        log_dir=str(tmp_path / "logs"), batch_size=2, max_steps=2,
        accum_steps=1, ckpt_every=2, optimizer="adamw", lr=1e-3,
        warmup_steps=1, image_size=128, num_vectors_per_subj_token=k_id,
        unfreeze_unet=True)
    train_cfg = TrainConfig(unet=UNET_CFG, sbg=encoder.sbg_cfg,
                            clip_text=SMALL_CLIP)
    trainer = Trainer(cfg, train_cfg, frozen, trainable, encoder, em)
    assert "unet" in trainer.state.params
    before = np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params["unet"])[0]).copy()
    ds = PersonalizedBase(toy_dataset, num_vectors_per_subj_token=k_id,
                          size=128, seed=0)
    trainer.fit(ds, num_steps=2)
    after = np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params["unet"])[0])
    assert not np.allclose(before, after)  # UNet actually updated
    ck = Trainer.latest_ckpt(cfg.log_dir)
    assert os.path.exists(os.path.join(ck, "unet_fp16.safetensors"))


def test_trainer_load_extend_mkv(toy_dataset, tmp_path):
    """Round-2 warm start: `--extend_prompt2token_proj_attention_multiplier`
    replicates prompt2token_proj K/V shapes 2x on load (`README.md:72`), the
    optimizer state is rebuilt for the new tree, and training still steps."""
    rng = jax.random.PRNGKey(0)
    tok = CLIPTokenizer.character_fallback()
    k_id = 16
    em = EmbeddingManager(tok, [PlaceholderSpec("z", k_id)])
    encoder = Arc2FaceID2AdaPrompt(
        jax.random.fold_in(rng, 1),
        face_backend=DeterministicBackend(),
        clip_vision_cfg=SMALL_VISION, sbg_clip_cfg=SMALL_CLIP,
        text_cfg=SMALL_CLIP, output_dim=D, is_training=True)
    unet = init_unet_params(jax.random.fold_in(rng, 3), UNET_CFG)
    text = init_text_params(jax.random.fold_in(rng, 4), SMALL_CLIP)
    frozen = {"unet": unet, "text_encoder": text,
              "sbg_buffers": encoder.subj_basis_generator["buffers"]}
    trainable = {"sbg": encoder.subj_basis_generator["params"]}
    cfg = TrainerConfig(
        log_dir=str(tmp_path / "logs"), batch_size=2, max_steps=2,
        accum_steps=1, ckpt_every=2, optimizer="adamw", lr=1e-4,
        warmup_steps=1, comp_distill_iter_gap=0, unet_distill_iter_gap=0,
        image_size=128, num_vectors_per_subj_token=k_id)
    train_cfg = TrainConfig(unet=UNET_CFG, sbg=encoder.sbg_cfg,
                            clip_text=SMALL_CLIP)
    trainer = Trainer(cfg, train_cfg, frozen, trainable, encoder, em,
                      vae_params=None)
    ds = PersonalizedBase(toy_dataset, num_vectors_per_subj_token=k_id,
                          size=128, seed=0)
    trainer.fit(ds, num_steps=2)
    ck = Trainer.latest_ckpt(cfg.log_dir)

    def kv_dim(params):
        return params["sbg"]["prompt2token_proj"]["layers"][0]["attn"]["k"][
            "w"].shape[-1]

    base = kv_dim(trainer.state.params)
    assert trainer.load(ck, extend_mkv_multiplier=2) == 2
    assert kv_dim(trainer.state.params) == 2 * base
    metrics = trainer.fit(ds, num_steps=2)
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_unet_distill_randomization(toy_dataset, tmp_path):
    """unet-distill iteration randomization (`ddpm.py:1131-1263`): with
    p_perturb_face_id_embs=1 the batch becomes same-subject with noised
    img-prompt embs; with p_gen_rand_id_for_id2img=1 identities are drawn
    at random. Both must train with finite loss."""
    rng = jax.random.PRNGKey(0)
    tok = CLIPTokenizer.character_fallback()
    k_id = 16
    em = EmbeddingManager(tok, [PlaceholderSpec("z", k_id)])
    encoder = Arc2FaceID2AdaPrompt(
        jax.random.fold_in(rng, 1),
        face_backend=DeterministicBackend(),
        clip_vision_cfg=SMALL_VISION, sbg_clip_cfg=SMALL_CLIP,
        text_cfg=SMALL_CLIP, output_dim=D, is_training=True)
    unet = init_unet_params(jax.random.fold_in(rng, 3), UNET_CFG)
    text = init_text_params(jax.random.fold_in(rng, 4), SMALL_CLIP)
    frozen = {"unet": unet, "text_encoder": text,
              "sbg_buffers": encoder.subj_basis_generator["buffers"]}
    trainable = {"sbg": encoder.subj_basis_generator["params"]}
    train_cfg = TrainConfig(unet=UNET_CFG, sbg=encoder.sbg_cfg,
                            clip_text=SMALL_CLIP)
    teacher = UNetTeacher(unet_params=unet, unet_cfg=UNET_CFG)
    ds = PersonalizedBase(toy_dataset, num_vectors_per_subj_token=k_id,
                          size=128, seed=0)

    for kw in ({"p_perturb_face_id_embs": 1.0},
               {"p_gen_rand_id_for_id2img": 1.0}):
        cfg = TrainerConfig(
            log_dir=str(tmp_path / "logs"), batch_size=2, max_steps=2,
            accum_steps=1, ckpt_every=99, optimizer="adamw", lr=1e-4,
            warmup_steps=1, comp_distill_iter_gap=0, unet_distill_iter_gap=1,
            image_size=128, num_vectors_per_subj_token=k_id, **kw)
        trainer = Trainer(cfg, train_cfg, frozen, trainable, encoder, em,
                          vae_params=None, teacher=teacher)
        metrics = trainer.fit(ds, num_steps=2)
        assert np.isfinite(float(metrics["loss"])), kw
        assert trainer.planner.unet_distill_iters >= 1


def test_iteration_planner_distill_steps_range():
    """unet-distill step counts stay inside the configured bucket range
    (`--max_num_unet_distill_denoising_steps`)."""
    p = IterationPlanner(unet_distill_iter_gap=1,
                         unet_distill_steps_range=(2, 3))
    # plan() is stateful (round-robin counters): call it ONCE per step
    flags = [p.plan(i) for i in range(40)]
    steps = [f.num_denoising_steps for f in flags
             if f.iter_type == "unet_distill"]
    assert steps and all(2 <= s <= 3 for s in steps)
    assert {2, 3} == set(steps)  # both buckets exercised


def test_batch_prefetch_deterministic(toy_dataset, tmp_path):
    """The background prefetch thread (TrainerConfig.prefetch) must yield
    the same (step, flags, batch) stream as inline preparation."""
    rng = jax.random.PRNGKey(0)
    tok = CLIPTokenizer.character_fallback()
    k_id = 16
    em = EmbeddingManager(tok, [PlaceholderSpec("z", k_id)])
    encoder = Arc2FaceID2AdaPrompt(
        jax.random.fold_in(rng, 1),
        face_backend=DeterministicBackend(),
        clip_vision_cfg=SMALL_VISION, sbg_clip_cfg=SMALL_CLIP,
        text_cfg=SMALL_CLIP, output_dim=D, is_training=True)
    unet = init_unet_params(jax.random.fold_in(rng, 3), UNET_CFG)
    text = init_text_params(jax.random.fold_in(rng, 4), SMALL_CLIP)
    frozen = {"unet": unet, "text_encoder": text,
              "sbg_buffers": encoder.subj_basis_generator["buffers"]}
    trainable = {"sbg": encoder.subj_basis_generator["params"]}
    train_cfg = TrainConfig(unet=UNET_CFG, sbg=encoder.sbg_cfg,
                            clip_text=SMALL_CLIP)
    def collect(prefetch):
        # fresh dataset per run: __getitem__ advances the augmentation RNG
        # per call (reference DataLoader-worker semantics), so comparing
        # the two paths needs identical dataset state, not a shared one
        ds = PersonalizedBase(toy_dataset, num_vectors_per_subj_token=k_id,
                              size=128, seed=0)
        cfg = TrainerConfig(
            log_dir=str(tmp_path / f"logs{prefetch}"), batch_size=2,
            max_steps=3, accum_steps=1, ckpt_every=99, optimizer="adamw",
            lr=1e-4, warmup_steps=1, comp_distill_iter_gap=0,
            unet_distill_iter_gap=0, image_size=128,
            num_vectors_per_subj_token=k_id, prefetch=prefetch)
        trainer = Trainer(cfg, train_cfg, frozen, trainable, encoder, em,
                          vae_params=None, teacher=None)
        return list(trainer._batch_iterator(ds, 3))

    inline, threaded = collect(0), collect(2)
    assert len(inline) == len(threaded) == 3
    for (s0, f0, b0), (s1, f1, b1) in zip(inline, threaded):
        assert s0 == s1 and f0.iter_type == f1.iter_type
        assert f0.seed == f1.seed
        assert sorted(b0) == sorted(b1)
        for k in b0:
            np.testing.assert_array_equal(np.asarray(b0[k]),
                                          np.asarray(b1[k]), err_msg=k)


def test_trainer_fit_start_step_resume_numbering(toy_dataset, tmp_path):
    """`fit(start_step=N)` (the `-r` resume path in train.py) continues
    the global-step numbering: metric rows and checkpoint names pick up
    where the interrupted run stopped instead of colliding with its
    `embeddings_gs-*` dirs."""
    import csv
    import os

    rng = jax.random.PRNGKey(0)
    tok = CLIPTokenizer.character_fallback()
    k_id = 16
    em = EmbeddingManager(tok, [PlaceholderSpec("z", k_id)])
    encoder = Arc2FaceID2AdaPrompt(
        jax.random.fold_in(rng, 1),
        face_backend=DeterministicBackend(),
        clip_vision_cfg=SMALL_VISION, sbg_clip_cfg=SMALL_CLIP,
        text_cfg=SMALL_CLIP, output_dim=D, is_training=True)
    unet = init_unet_params(jax.random.fold_in(rng, 3), UNET_CFG)
    text = init_text_params(jax.random.fold_in(rng, 4), SMALL_CLIP)
    frozen = {"unet": unet, "text_encoder": text,
              "sbg_buffers": encoder.subj_basis_generator["buffers"]}
    trainable = {"sbg": encoder.subj_basis_generator["params"]}
    cfg = TrainerConfig(
        log_dir=str(tmp_path / "logs"), batch_size=2, max_steps=2,
        accum_steps=1, ckpt_every=2, optimizer="adamw", lr=1e-4,
        warmup_steps=1, comp_distill_iter_gap=0, unet_distill_iter_gap=0,
        image_size=128, num_vectors_per_subj_token=k_id)
    train_cfg = TrainConfig(unet=UNET_CFG, sbg=encoder.sbg_cfg,
                            clip_text=SMALL_CLIP)
    trainer = Trainer(cfg, train_cfg, frozen, trainable, encoder, em,
                      vae_params=None)
    ds = PersonalizedBase(toy_dataset, num_vectors_per_subj_token=k_id,
                          size=128, seed=0)
    trainer.fit(ds, num_steps=2)
    ck = Trainer.latest_ckpt(cfg.log_dir)
    assert ck.endswith("embeddings_gs-2")

    # resumed run: warm-start, continue at global step 2
    trainer2 = Trainer(cfg, train_cfg, frozen, trainable, encoder, em,
                       vae_params=None)
    start = trainer2.load(ck)
    assert start == 2
    metrics = trainer2.fit(ds, num_steps=2, start_step=start)
    assert np.isfinite(float(metrics["loss"]))
    assert Trainer.latest_ckpt(cfg.log_dir).endswith("embeddings_gs-4")
    with open(os.path.join(cfg.log_dir, "metrics.csv")) as f:
        steps = [int(r["step"]) for r in csv.DictReader(f)]
    assert steps[-2:] == [2, 3]


def test_trainer_fit_overlap_recon_collect(toy_dataset, tmp_path, monkeypatch):
    """Trainer.fit with overlap_recon_collect=True: consecutive two-phase
    recon steps stream through make_pipelined_recon_runner. Regression for
    the r4 advisor finding — `_post_step(*done)` passed a 3-tuple into the
    4-arg signature, so the first completed overlapped step raised
    TypeError. Every step's metrics row must land in metrics.csv."""
    import adaface_tpu.train.trainer as trainer_mod

    from adaface_tpu.models.arcface import init_arcface_params
    from adaface_tpu.models.vae import VAEConfig, init_vae_params
    from adaface_tpu.train.face_detect import HostFaceDetector
    from adaface_tpu.train.recon_step import ReconStepConfig

    # force the callback-less (two-phase) recon choreography on CPU
    monkeypatch.setattr(trainer_mod, "backend_supports_callbacks",
                        lambda: False)

    rng = jax.random.PRNGKey(0)
    tok = CLIPTokenizer.character_fallback()
    k_id = 16
    em = EmbeddingManager(tok, [PlaceholderSpec("z", k_id)])
    encoder = Arc2FaceID2AdaPrompt(
        jax.random.fold_in(rng, 1),
        face_backend=DeterministicBackend(),
        clip_vision_cfg=SMALL_VISION, sbg_clip_cfg=SMALL_CLIP,
        text_cfg=SMALL_CLIP, output_dim=D, is_training=True)
    unet = init_unet_params(jax.random.fold_in(rng, 3), UNET_CFG)
    text = init_text_params(jax.random.fold_in(rng, 4), SMALL_CLIP)
    vae_cfg = VAEConfig(base_ch=16, ch_mult=(1, 2, 2), num_res_blocks=1,
                        norm_groups=8)
    frozen = {"unet": unet, "text_encoder": text,
              "sbg_buffers": encoder.subj_basis_generator["buffers"],
              "vae": init_vae_params(jax.random.fold_in(rng, 5), vae_cfg),
              "arcface": init_arcface_params(jax.random.fold_in(rng, 6),
                                             use_se=False)}
    trainable = {"sbg": encoder.subj_basis_generator["params"]}

    def bright_det(img):
        g = img.astype(np.float32).mean(-1)
        h, w = g.shape
        y, x = np.unravel_index(np.argmax(g), g.shape)
        x0 = np.clip(x - 12, 0, w - 24)
        y0 = np.clip(y - 12, 0, h - 24)
        return [(np.asarray((x0, y0, x0 + 24, y0 + 24), np.float32), 1.0)]

    cfg = TrainerConfig(
        log_dir=str(tmp_path / "logs_overlap"), batch_size=2, max_steps=4,
        accum_steps=1, ckpt_every=0, optimizer="adamw", lr=1e-4,
        warmup_steps=1, comp_distill_iter_gap=0, unet_distill_iter_gap=0,
        image_size=128, num_vectors_per_subj_token=k_id,
        # pin the recon graph key so consecutive steps share one runner
        p_normal_recon_on_pure_noise=0.0, p_do_adv_attack=0.0,
        overlap_recon_collect=True,
        recon_cfg=ReconStepConfig(num_denoising_steps=1,
                                  num_priming_steps=1, vae_cfg=vae_cfg,
                                  compute_dtype="float32",
                                  recon_face_align_loss_thres=-1.0))
    train_cfg = TrainConfig(unet=UNET_CFG, sbg=encoder.sbg_cfg,
                            clip_text=SMALL_CLIP)
    trainer = Trainer(cfg, train_cfg, frozen, trainable, encoder, em,
                      vae_params=None, teacher=None,
                      host_detector=HostFaceDetector(detector_fn=bright_det))
    ds = PersonalizedBase(toy_dataset, num_vectors_per_subj_token=k_id,
                          size=128, seed=0)
    metrics = trainer.fit(ds, num_steps=4)
    assert np.isfinite(float(metrics["loss"]))
    # the pipelined runner must have delivered a _post_step for EVERY
    # step (the r4 bug dropped/crashed them): 4 metric rows, steps 0..3
    import csv
    import os

    with open(os.path.join(cfg.log_dir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4
    assert sorted(int(r["step"]) for r in rows) == [0, 1, 2, 3]
