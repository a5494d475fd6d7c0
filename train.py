"""Training CLI — `python train.py --base configs/stage1-distill-joint.yaml
--data_roots <subject folders> [key.path=value …]`.

Rebuild of the reference trainer entry (`main.py:492-976`): YAML config +
dot-list overrides (`main.py:609-613`), builds the model stack, and runs
the Trainer. Checkpoints land in `<log_dir>/checkpoints/embeddings_gs-N`.
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import yaml

# persistent XLA compile cache: a resumed/re-launched run reloads its
# train graphs instead of recompiling (minutes each) where the backend
# supports executable serialization (utils/compile_cache.py)
from adaface_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def apply_dotlist(cfg: dict, overrides: list[str]) -> dict:
    for ov in overrides:
        key, _, val = ov.partition("=")
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    return cfg


def build_and_train(cfg: dict, args):
    import numpy as np

    from adaface_tpu.id2ada.face_id_to_ada_prompt import create_id2ada_prompt_encoder
    from adaface_tpu.id2ada.teachers import create_unet_teacher
    from adaface_tpu.data.personalized import PersonalizedBase
    from adaface_tpu.models.clip import init_text_params
    from adaface_tpu.models.unet import SD15_UNET, init_unet_params
    from adaface_tpu.models.vae import init_vae_params
    from adaface_tpu.text.embedding_manager import EmbeddingManager, PlaceholderSpec
    from adaface_tpu.text.tokenizer import default_tokenizer
    from adaface_tpu.train.comp_step import CompDistillConfig
    from adaface_tpu.train.train_step import TrainConfig
    from adaface_tpu.train.trainer import Trainer, TrainerConfig

    tcfg_dict = cfg.get("trainer", {})
    tc_fields = {f.name for f in dataclasses.fields(TrainerConfig)}
    trainer_cfg = TrainerConfig(
        data_roots=args.data_roots, log_dir=args.log_dir,
        **{k: v for k, v in tcfg_dict.items() if k in tc_fields})
    if args.scale_lr:
        # lr = accum x n_devices x batch x base_lr (`main.py:911-915`)
        n_dev = trainer_cfg.dp or 1
        trainer_cfg.lr = (trainer_cfg.accum_steps * n_dev
                          * trainer_cfg.batch_size * trainer_cfg.lr)
        print(f"scaled lr: {trainer_cfg.lr}")

    rng = jax.random.PRNGKey(trainer_cfg.seed)
    print("Initializing model stack (host)...", flush=True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        unet = init_unet_params(jax.random.fold_in(rng, 1), SD15_UNET)
        text = init_text_params(jax.random.fold_in(rng, 2))
        vae = init_vae_params(jax.random.fold_in(rng, 3))
        model_cfg = cfg.get("model", {})
        enc_name = model_cfg.get("id2ada_encoder", "arc2face")
        enc_kw = {}
        scales = model_cfg.get("out_id_embs_cfg_scales")
        if scales:
            if enc_name in ("jointIDs", "joint"):
                enc_kw["out_id_embs_cfg_scales"] = tuple(scales)
            else:
                enc_kw["out_id_embs_cfg_scale"] = scales[0]
        if model_cfg.get("enable_static_img_suffix_embs"):
            # 4 learnable suffix embeddings (`subj_basis_generator.py:371-562`)
            enc_kw["num_static_img_suffix_embs"] = int(
                model_cfg.get("num_static_img_suffix_embs", 4))
        encoder = create_id2ada_prompt_encoder(
            enc_name, jax.random.fold_in(rng, 4), is_training=True, **enc_kw)

    if args.base_model:
        # load converted SD1.5 towers (LDM single-file or diffusers UNet);
        # mirrors the reference's `load_model_from_config` (`ldm/util.py:130`)
        from adaface_tpu.tools.convert_sd import load_sd_towers

        towers = load_sd_towers(args.base_model)
        unet = towers.get("unet", unet)
        vae = towers.get("vae", vae)
        text = towers.get("text_encoder", text)
        print(f"loaded base model weights from {args.base_model}: "
              f"{sorted(towers)}")

    tok = default_tokenizer()
    # placeholder width follows the encoder (16 arc2face / 4 consistentID /
    # 20 joint); the YAML value only overrides when it matches a single
    # encoder ablation (`main.py:272` num_vectors_per_token)
    n_vec = encoder.num_id_vecs
    if trainer_cfg.num_vectors_per_subj_token != n_vec:
        print(f"num_vectors_per_subj_token {trainer_cfg.num_vectors_per_subj_token}"
              f" -> {n_vec} (encoder {encoder.name})")
    em = EmbeddingManager(tok, [PlaceholderSpec(args.subject_string, n_vec)])

    encs = encoder.encoders if hasattr(encoder, "encoders") else [encoder]
    enc0 = encs[0]
    if len(encs) == 1:
        frozen = {"unet": unet, "text_encoder": text,
                  "sbg_buffers": enc0.subj_basis_generator["buffers"]}
        trainable = {"sbg": enc0.subj_basis_generator["params"]}
        sbg_cfg = enc0.sbg_cfg
    else:
        # joint encoder: one SubjBasisGenerator per sub-encoder, ada token
        # segments concatenated (`Joint_FaceID2AdaPrompt:868-1302`)
        frozen = {"unet": unet, "text_encoder": text,
                  "sbg_buffers": [e.subj_basis_generator["buffers"]
                                  for e in encs]}
        trainable = {"sbg": [e.subj_basis_generator["params"] for e in encs]}
        sbg_cfg = tuple(e.sbg_cfg for e in encs)

    # ArcFace identity-loss tower (`ddpm.py:664-672` wires ArcFaceWrapper
    # when the align-loss weights are nonzero; without it the trainer
    # gates the whole identity family off). `model.arcface_ckpt` loads
    # converted real weights (models/arcface-resnet18_110.pth via
    # convert_arcface_state_dict); absent that, random-init keeps the
    # loss plumbing live — meaningful only once real weights land.
    model_cfg2 = cfg.get("model", {})
    if model_cfg2.get("use_identity_losses", True):
        from adaface_tpu.models.arcface import (convert_arcface_state_dict,
                                                init_arcface_params)

        arc_path = model_cfg2.get("arcface_ckpt")
        with jax.default_device(cpu):
            if arc_path:
                from adaface_tpu.tools.ckpt_lib import load_state_dict

                frozen["arcface"] = convert_arcface_state_dict(
                    load_state_dict(arc_path))
                print(f"loaded arcface tower from {arc_path}")
            else:
                frozen["arcface"] = init_arcface_params(
                    jax.random.fold_in(rng, 6))
                print("WARNING: no model.arcface_ckpt — identity losses "
                      "run with a RANDOM-INIT ArcFace tower (plumbing "
                      "only; pass the converted arcface-resnet18 ckpt "
                      "for meaningful identity gradients)")

    if args.comp_unet_weight_path:
        # separate UNet weights for comp-distill iterations, hot-swapped on
        # iteration-type switch (`ddpm.py:472-483`; e.g. SAR/RealisticVision)
        from adaface_tpu.tools.convert_sd import load_sd_towers

        frozen["comp_unet"] = load_sd_towers(args.comp_unet_weight_path)["unet"]
        print(f"loaded comp-distill UNet from {args.comp_unet_weight_path}")

    teacher = None
    if cfg.get("teacher"):
        teacher = create_unet_teacher(
            "simple_unet", unet_params=unet,
            p_uses_cfg=cfg["teacher"].get("p_uses_cfg", 0.0),
            cfg_scale_range=tuple(cfg["teacher"].get("cfg_scale_range", (1.3, 2.0))))

    comp_fields = {f.name for f in dataclasses.fields(CompDistillConfig)}
    comp_cfg = CompDistillConfig(**{
        k: v for k, v in cfg.get("comp_distill", {}).items()
        if k in comp_fields})
    if comp_cfg.use_face_flow:
        # GMA latent flow for the elastic-matching loss
        # (`--use_face_flow_for_sc_matching_loss`, `main.py:261-262`)
        from adaface_tpu.models.gma import init_gma_params

        gma_path = cfg.get("comp_distill", {}).get("gma_ckpt")
        with jax.default_device(cpu):
            if gma_path:
                # torch gma-sintel.pth (frozen in the reference,
                # `ddpm.py:652-660`) or a flat npz of converted params
                from adaface_tpu.models.gma import convert_gma_state_dict
                from adaface_tpu.tools.ckpt_lib import load_state_dict

                frozen["flow"] = {
                    "gma": convert_gma_state_dict(load_state_dict(gma_path))}
            else:
                frozen["flow"] = {
                    "gma": init_gma_params(jax.random.fold_in(rng, 5))}
        print("GMA latent flow enabled for elastic matching")

    # wire the YAML `model:` loss weights / skip weights into TrainConfig
    # (the reference funnels these via `instantiate_from_config` into the
    # LatentDiffusion ctor, `main.py:609-613` + `ddpm.py:507`)
    tf_fields = {f.name for f in dataclasses.fields(TrainConfig)}
    model_overrides = {
        k: tuple(v) if isinstance(v, list) else v
        for k, v in cfg.get("model", {}).items() if k in tf_fields}
    train_cfg = TrainConfig(sbg=sbg_cfg, **model_overrides)
    if model_overrides:
        print(f"model config overrides: {sorted(model_overrides)}")
    dataset = PersonalizedBase(
        trainer_cfg.data_roots, mix_subj_data_roots=args.mix_subj_data_roots,
        subject_string=args.subject_string,
        default_cls_delta_string=args.default_cls_delta_string,
        num_vectors_per_subj_token=n_vec, size=trainer_cfg.image_size,
        seed=trainer_cfg.seed)
    print(f"{dataset.num_subjects()} subjects, {len(dataset)} images")

    trainer = Trainer(trainer_cfg, train_cfg, frozen, trainable, encoder, em,
                      vae_params=vae, teacher=teacher, comp_cfg=comp_cfg)
    start_step = 0
    if args.resume:
        # `-r logdir` resume: warm-start from the newest ckpt in log_dir
        # (`main.py:547-565`; optimizer restarts by design, README.md:72).
        # Global-step numbering continues from the ckpt so the iteration
        # plan resumes in place and checkpoints never collide.
        ck = Trainer.latest_ckpt(args.log_dir)
        if ck is None:
            print(f"no checkpoint under {args.log_dir}, starting fresh")
        else:
            start_step = trainer.load(
                ck, extend_mkv_multiplier=args.extend_mkv_multiplier)
    elif args.adaface_ckpt_path:
        trainer.load(args.adaface_ckpt_path,
                     extend_mkv_multiplier=args.extend_mkv_multiplier)
    trainer.fit(dataset, num_steps=args.max_steps or trainer_cfg.max_steps,
                start_step=start_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="YAML config path")
    ap.add_argument("--base_model", default=None,
                    help="SD1.5 checkpoint (.safetensors/.ckpt); random "
                         "weights if omitted")
    ap.add_argument("--data_roots", nargs="+", required=True)
    ap.add_argument("--mix_subj_data_roots", nargs="+", default=None,
                    help="FFHQ-style folders where every image is a "
                         "different person (reference --mix_subj_data_roots)")
    ap.add_argument("--comp_unet_weight_path", default=None,
                    help="UNet checkpoint used during comp-distill "
                         "iterations (hot-swapped; reference "
                         "--comp_unet_weight_path)")
    ap.add_argument("--subject_string", default="z",
                    help="subject placeholder token (reference --subject_string)")
    ap.add_argument("--default_cls_delta_string", default="person",
                    help="class word standing in for the subject in class "
                         "prompts when metainfo.json gives none")
    ap.add_argument("--log_dir", default="logs/run")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--scale_lr", action="store_true",
                    help="lr = accum * n_devices * batch * base_lr")
    ap.add_argument("-r", "--resume", action="store_true",
                    help="resume from the newest checkpoint in --log_dir")
    ap.add_argument("--adaface_ckpt_path", default=None,
                    help="warm-start trainable params from this checkpoint")
    ap.add_argument("--extend_mkv_multiplier",
                    "--extend_prompt2token_proj_attention_multiplier",
                    type=int, default=1, dest="extend_mkv_multiplier",
                    help="replicate prompt2token_proj K/V projections Nx on "
                         "warm start (round-2 training recipe)")
    ap.add_argument("overrides", nargs="*", help="dot.key=value overrides")
    args = ap.parse_args()

    with open(args.base) as f:
        cfg = yaml.safe_load(f)
    cfg = apply_dotlist(cfg, args.overrides)
    build_and_train(cfg, args)


if __name__ == "__main__":
    main()
