"""FaceID2AdaPrompt family: face images → ada text-token embeddings.

Rebuild of `adaface/face_id_to_ada_prompt.py` with an explicit host/device
split: detection + CLIP preprocessing run host-side (pluggable
`face_backends`); all embedding math (teacher text-encoder mapping,
SubjBasisGenerator, CFG mixing, perturbation) runs as jitted JAX.

Pipeline (`FaceID2AdaPrompt`, reference `:56-578`):
1. extract_init_id_embeds_from_images — largest-face 512-d embedding per
   image (+ masked fg/bg CLIP features [B, 514, Dclip]).
2. map_init_id_to_img_prompt_embs — encoder-specific mapping into the
   teacher's "image prompt" space:
   - Arc2Face (`:580-724`): pad id emb 512→768, replace the `id` token of
     a tokenized "photo of a id person" (len 22), run the Arc2Face
     CLIP text encoder, slice the 16 id tokens.
   - ConsistentID (`:727-865`): fg CLIP features as queries into the
     ProjPlusModel with the 512-d id embedding; 4 tokens; also generates
     negative img prompts from a zero id + neg CLIP features.
3. generate_adaface_embeddings (`:503-578`) — averaging stages
   (id_emb / img_prompt_emb / None), perturbation stages, random-ID path,
   SubjBasisGenerator forward with per-encoder out_id_embs_cfg_scale.

Joint_FaceID2AdaPrompt (`:868-1302`): concatenates both encoders' ada
embeddings (20 vecs), per-encoder dropout during training, zero-filled
embeddings for dropped or face-undetected encoders.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.id2ada import layers as L
from adaface_tpu.id2ada.face_backends import DeterministicBackend, FaceBackend, default_backend
from adaface_tpu.id2ada.subj_basis_generator import (
    SubjBasisConfig,
    init_subj_basis_generator,
    subj_basis_forward,
)
from adaface_tpu.models import clip as clip_mod
from adaface_tpu.text.tokenizer import CLIPTokenizer, default_tokenizer
from adaface_tpu.utils.tensor import perturb_tensor

Params = dict[str, Any]

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(images: Sequence[np.ndarray], size: int = 224) -> np.ndarray:
    """HWC uint8 RGB images → [B, 3, size, size] normalized fp32 (host)."""
    import cv2

    out = []
    for im in images:
        im = cv2.resize(im, (size, size), interpolation=cv2.INTER_CUBIC)
        im = im.astype(np.float32) / 255.0
        im = (im - CLIP_MEAN) / CLIP_STD
        out.append(im.transpose(2, 0, 1))
    return np.stack(out)


class FaceID2AdaPrompt:
    """Base class; subclasses define the teacher img-prompt mapping."""

    name = "base"
    num_id_vecs = 16
    default_enable_static_img_suffix_embs = False
    gen_neg_img_prompt = False
    use_clip_embs = False
    clip_embedding_dim = 1024

    def __init__(
        self,
        rng: jax.Array,
        tokenizer: CLIPTokenizer | None = None,
        face_backend: FaceBackend | None = None,
        out_id_embs_cfg_scale: float = -1.0,
        num_static_img_suffix_embs: int = 0,
        is_training: bool = False,
        clip_vision_params: Params | None = None,
        clip_vision_cfg: clip_mod.CLIPVisionConfig | None = None,
        sbg_clip_cfg: clip_mod.CLIPTextConfig | None = None,
        output_dim: int = 768,
    ):
        self.rng = rng
        self.tokenizer = tokenizer or default_tokenizer()
        self.face_backend = face_backend or default_backend()
        self.is_training = is_training
        self.out_id_embs_cfg_scale = out_id_embs_cfg_scale
        self.num_static_img_suffix_embs = num_static_img_suffix_embs

        self.clip_vision_cfg = clip_vision_cfg or clip_mod.CLIP_L_VISION
        # the CLIP feature dim always follows the configured vision tower
        self.clip_embedding_dim = self.clip_vision_cfg.hidden_size
        k1, k2 = jax.random.split(rng)
        self.clip_vision_params = clip_vision_params or clip_mod.init_vision_params(
            k1, self.clip_vision_cfg
        )
        self.sbg_cfg = SubjBasisConfig(
            num_id_vecs=self.num_id_vecs,
            num_static_img_suffix_embs=num_static_img_suffix_embs,
            output_dim=output_dim,
            clip=sbg_clip_cfg or clip_mod.CLIP_L_TEXT,
        )
        self.subj_basis_generator = init_subj_basis_generator(
            k2, self.sbg_cfg, tokenizer=self.tokenizer
        )
        self._neg_clip_features = None

    # ---------------------------------------------------------------- hooks
    def map_init_id_to_img_prompt_embs(
        self, faceid_embs: jax.Array, clip_features=None,
        called_for_neg_img_prompt=False,
    ) -> jax.Array:
        raise NotImplementedError

    # ------------------------------------------------------------- pipeline
    def _clip_fgbg_features(self, images: Sequence[np.ndarray], fg_masks=None):
        """Masked fg + inverse-masked bg CLIP features, concat token-wise
        → [B, 2*257, Dclip] (`extract_init_id_embeds_from_images:268-313`)."""
        px = jnp.asarray(clip_preprocess(images))
        if fg_masks is not None:
            fg = jnp.asarray(np.stack(fg_masks))[:, None]  # [B,1,H,W]
        else:
            fg = jnp.ones((px.shape[0], 1, 224, 224), jnp.float32)
        fg_out = clip_mod.vision_encode(
            self.clip_vision_params, px, self.clip_vision_cfg, image_mask=fg
        )["last_hidden_state"]
        bg_out = clip_mod.vision_encode(
            self.clip_vision_params, px, self.clip_vision_cfg, image_mask=1.0 - fg
        )["last_hidden_state"]
        return jnp.concatenate([fg_out, bg_out], axis=1)

    def get_clip_neg_features(self, batch_size: int) -> jax.Array:
        if self._neg_clip_features is None:
            black = [np.zeros((224, 224, 3), np.uint8)]
            px = jnp.asarray(clip_preprocess(black))
            self._neg_clip_features = clip_mod.vision_encode(
                self.clip_vision_params, px, self.clip_vision_cfg
            )["last_hidden_state"]
        f = self._neg_clip_features
        return jnp.broadcast_to(f, (batch_size, *f.shape[1:]))

    def extract_init_id_embeds_from_images(
        self,
        images: Sequence[np.ndarray],
        fg_masks=None,
        calc_avg: bool = False,
        skip_non_faces: bool = True,
        return_clip_embs: bool | None = None,
    ):
        """→ (faceless_count, id_embs [B,512], clip_fgbg_features|None)."""
        if return_clip_embs is None:
            return_clip_embs = self.use_clip_embs
        embs, kept, faceless = [], [], 0
        rs = np.random.RandomState(0)
        for i, im in enumerate(images):
            e = self.face_backend.detect_and_embed(im)
            if e is None:
                faceless += 1
                if skip_non_faces:
                    continue
                e = rs.randn(512).astype(np.float32)
                e /= np.linalg.norm(e)
            embs.append(e)
            kept.append(i)
        if not embs:
            return faceless, None, None
        id_embs = jnp.asarray(np.stack(embs))
        clip_feats = None
        if return_clip_embs:
            kept_images = [images[i] for i in kept]
            kept_masks = [fg_masks[i] for i in kept] if fg_masks is not None else None
            clip_feats = self._clip_fgbg_features(kept_images, kept_masks)
        if calc_avg:
            id_embs = id_embs.mean(axis=0, keepdims=True)
            id_embs = id_embs / (jnp.linalg.norm(id_embs, axis=-1, keepdims=True) + 1e-8)
            if clip_feats is not None:
                clip_feats = clip_feats.mean(axis=0, keepdims=True)
        return faceless, id_embs, clip_feats

    def get_img_prompt_embs(
        self,
        init_id_embs=None,
        pre_clip_features=None,
        images: Sequence[np.ndarray] | None = None,
        fg_masks=None,
        id_batch_size: int = 1,
        skip_non_faces: bool = True,
        avg_at_stage: str | None = None,
        perturb_at_stage: str | None = None,
        perturb_std: float = 0.0,
        rng: jax.Array | None = None,
    ):
        """→ (face_image_count, faceid_embs, pos_prompt_embs, neg_prompt_embs)
        (`get_img_prompt_embs:368-470`)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        face_image_count = 0
        if init_id_embs is None:
            if images is None:
                # random-ID path
                k1, k2 = jax.random.split(rng)
                faceid = jax.random.normal(k1, (id_batch_size, 512))
                clip_feats = (
                    jax.random.normal(k2, (id_batch_size, 514, self.clip_embedding_dim))
                    if self.use_clip_embs else None
                )
            else:
                faceless, faceid, clip_feats = self.extract_init_id_embeds_from_images(
                    images, fg_masks=fg_masks,
                    calc_avg=(avg_at_stage == "id_emb"),
                    skip_non_faces=skip_non_faces,
                )
                face_image_count = len(images) - faceless
                if faceid is None:
                    return 0, None, None, None
        else:
            faceid = init_id_embs
            clip_feats = pre_clip_features
            if faceid.shape[0] == 1 and id_batch_size > 1:
                faceid = jnp.repeat(faceid, id_batch_size, axis=0)
                if clip_feats is not None:
                    clip_feats = jnp.repeat(clip_feats, id_batch_size, axis=0)

        if perturb_at_stage == "id_emb" and perturb_std > 0:
            rng, sub = jax.random.split(rng)
            faceid = perturb_tensor(sub, faceid, perturb_std, keep_norm=True)
            if clip_feats is not None and self.use_clip_embs:
                rng, sub = jax.random.split(rng)
                clip_feats = perturb_tensor(sub, clip_feats, perturb_std, keep_norm=True)

        faceid = faceid / (jnp.linalg.norm(faceid, axis=-1, keepdims=True) + 1e-8)
        pos = jax.lax.stop_gradient(
            self.map_init_id_to_img_prompt_embs(faceid, clip_feats)
        )

        if avg_at_stage == "img_prompt_emb":
            pos = pos.mean(axis=0, keepdims=True)
            faceid = faceid.mean(axis=0, keepdims=True)

        if perturb_at_stage == "img_prompt_emb" and perturb_std > 0:
            rng, sub = jax.random.split(rng)
            pos = perturb_tensor(sub, pos, perturb_std, keep_norm=True)

        if images is not None and avg_at_stage is not None:
            faceid = jnp.repeat(faceid, id_batch_size, axis=0)
            pos = jnp.repeat(pos, id_batch_size, axis=0)

        neg = None
        if self.gen_neg_img_prompt:
            neg_feats = self.get_clip_neg_features(pos.shape[0])
            neg = jax.lax.stop_gradient(
                self.map_init_id_to_img_prompt_embs(
                    jnp.zeros_like(faceid), neg_feats,
                    called_for_neg_img_prompt=True,
                )
            )
        return face_image_count, faceid, pos, neg

    def get_batched_img_prompt_embs(self, batch_size, init_id_embs,
                                    pre_clip_features, rng=None):
        return self.get_img_prompt_embs(
            init_id_embs=init_id_embs, pre_clip_features=pre_clip_features,
            id_batch_size=batch_size, skip_non_faces=False,
            avg_at_stage=None, rng=rng,
        )

    def generate_adaface_embeddings(
        self,
        images: Sequence[np.ndarray] | None = None,
        face_id_embs=None,
        img_prompt_embs=None,
        fg_masks=None,
        p_dropout: float = 0.0,
        return_zero_embs_for_dropped_encoders: bool = True,
        avg_at_stage: str | None = "id_emb",
        perturb_at_stage: str | None = None,
        perturb_std: float = 0.0,
        enable_static_img_suffix_embs: bool | None = None,
        rng: jax.Array | None = None,
    ):
        """→ (ada_embs, img_prompt_embs, lens_subj_emb_segments)."""
        if enable_static_img_suffix_embs is None:
            enable_static_img_suffix_embs = self.default_enable_static_img_suffix_embs
        lens = [self.num_id_vecs
                + int(enable_static_img_suffix_embs) * self.num_static_img_suffix_embs]

        if avg_at_stage is not None and avg_at_stage.lower() == "none":
            avg_at_stage = None

        if img_prompt_embs is None:
            bs = 1 if avg_at_stage is not None else (
                face_id_embs.shape[0] if face_id_embs is not None
                else (len(images) if images is not None else 1)
            )
            count, _, img_prompt_embs, _ = self.get_img_prompt_embs(
                init_id_embs=face_id_embs, images=images, fg_masks=fg_masks,
                id_batch_size=bs, avg_at_stage=avg_at_stage,
                perturb_at_stage=perturb_at_stage, perturb_std=perturb_std,
                rng=rng,
            )
            if img_prompt_embs is None:
                return None, None, lens
        elif avg_at_stage is not None:
            img_prompt_embs = img_prompt_embs.mean(axis=0, keepdims=True)

        ada = subj_basis_forward(
            self.subj_basis_generator, img_prompt_embs, self.sbg_cfg,
            out_id_embs_cfg_scale=self.out_id_embs_cfg_scale,
            is_face=True,
            enable_static_img_suffix_embs=enable_static_img_suffix_embs,
        )
        if avg_at_stage is not None:
            ada = ada[0]
        return ada, img_prompt_embs, lens

    # trainable params for the optimizer
    def trainable_params(self):
        return self.subj_basis_generator["params"]


class Arc2FaceID2AdaPrompt(FaceID2AdaPrompt):
    name = "arc2face"
    num_id_vecs = 16
    use_clip_embs = True
    gen_neg_img_prompt = False
    clip_embedding_dim = 1024
    id_img_prompt_max_length = 22

    def __init__(self, rng, text_encoder_params: Params | None = None,
                 text_cfg: clip_mod.CLIPTextConfig | None = None, **kw):
        super().__init__(rng, **kw)
        if self.out_id_embs_cfg_scale == -1:
            self.out_id_embs_cfg_scale = 1.0
        k = jax.random.fold_in(rng, 7)
        # Arc2Face-finetuned CLIP-L text encoder (`models/arc2face/encoder`)
        self.text_cfg = text_cfg or clip_mod.CLIP_L_TEXT
        self.text_encoder_params = text_encoder_params or clip_mod.init_text_params(
            k, self.text_cfg)
        # template "photo of a id person", padded to 22 tokens with the real
        # vocab; under a fallback vocab the `id` word lands later, so make
        # room for the 16 sliced tokens past its position
        probe = self.tokenizer(["photo of a id person"], max_length=77)[0]
        id_tok = self.tokenizer.encode_text("id")
        matches = np.where(probe == id_tok[0])[0]
        self._id_pos = int(matches[0])
        max_len = max(self.id_img_prompt_max_length, self._id_pos + 16 + 2)
        self._template_ids = self.tokenizer(
            ["photo of a id person"], max_length=max_len)[0]

    def map_init_id_to_img_prompt_embs(self, faceid_embs, clip_features=None,
                                       called_for_neg_img_prompt=False):
        b = faceid_embs.shape[0]
        d = self.text_cfg.hidden_size
        ids = jnp.broadcast_to(jnp.asarray(self._template_ids),
                               (b, len(self._template_ids)))
        if d >= faceid_embs.shape[-1]:
            face_padded = jnp.pad(
                faceid_embs, ((0, 0), (0, d - faceid_embs.shape[-1])))
        else:  # toy configs with hidden < 512
            face_padded = faceid_embs[:, :d]
        token_embs = clip_mod.token_embeddings(self.text_encoder_params, ids)
        token_embs = token_embs.at[:, self._id_pos].set(
            face_padded.astype(token_embs.dtype))
        out = clip_mod.text_encode(
            self.text_encoder_params, ids, self.text_cfg, input_embs=token_embs
        )["last_hidden_state"]
        # 16 id tokens starting at the `id` position (4:20 with the real vocab,
        # `face_id_to_ada_prompt.py:718-723`)
        return out[:, self._id_pos:self._id_pos + 16]


class ConsistentIDID2AdaPrompt(FaceID2AdaPrompt):
    name = "consistentID"
    num_id_vecs = 4
    use_clip_embs = True
    gen_neg_img_prompt = True
    clip_embedding_dim = 1280

    def __init__(self, rng, image_proj_params: Params | None = None,
                 image_proj_path: str | None = None, **kw):
        kw.setdefault("clip_vision_cfg", clip_mod.CLIP_H_VISION)
        super().__init__(rng, **kw)
        if self.out_id_embs_cfg_scale == -1:
            self.out_id_embs_cfg_scale = 6.0
        if image_proj_params is None and image_proj_path is not None:
            # trained ConsistentID-v1.bin image_proj weights
            # (`face_id_to_ada_prompt.py:747-749`)
            from adaface_tpu.tools.convert_consistentid import (
                load_consistentid_proj)

            image_proj_params = load_consistentid_proj(image_proj_path)
        k = jax.random.fold_in(rng, 11)
        self.image_proj_params = image_proj_params or L.init_proj_plus(
            k, id_dim=512, clip_dim=self.clip_embedding_dim,
            out_dim=self.sbg_cfg.output_dim, num_tokens=4,
        )
        self.s_scale = 1.0
        self.shortcut = False

    def map_init_id_to_img_prompt_embs(self, faceid_embs, clip_features=None,
                                       called_for_neg_img_prompt=False):
        assert clip_features is not None
        if not called_for_neg_img_prompt:
            # [B, 514, D] = fg ‖ bg token-wise; only fg used
            fg, _ = jnp.split(clip_features, 2, axis=1)
            clip_embs = fg
        else:
            clip_embs = clip_features
            faceid_embs = jnp.zeros_like(faceid_embs)
        return L.apply_proj_plus(
            self.image_proj_params, faceid_embs, clip_embs,
            shortcut=self.shortcut, scale=self.s_scale,
        )


class JointFaceID2AdaPrompt:
    """Concatenates arc2face + consistentID ada embeddings (20 vecs),
    per-encoder dropout, zero-filling (`Joint_FaceID2AdaPrompt:868-1302`)."""

    name = "jointIDs"

    def __init__(self, rng, encoders=None, p_dropout=(0.1, 0.1),
                 out_id_embs_cfg_scales=(1.0, 6.0), is_training=False, **kw):
        k1, k2 = jax.random.split(rng)
        if encoders is None:
            text_cfg = kw.pop("text_cfg", None)
            # toy configs: the arc2face teacher text encoder must produce
            # embeddings in the SBG's output space
            if text_cfg is None and kw.get("sbg_clip_cfg") is not None:
                text_cfg = kw["sbg_clip_cfg"]
            encoders = [
                Arc2FaceID2AdaPrompt(
                    k1, out_id_embs_cfg_scale=out_id_embs_cfg_scales[0],
                    is_training=is_training, text_cfg=text_cfg, **kw),
                ConsistentIDID2AdaPrompt(
                    k2, out_id_embs_cfg_scale=out_id_embs_cfg_scales[1],
                    is_training=is_training, **kw),
            ]
        self.encoders = encoders
        self.p_dropout = p_dropout
        self.is_training = is_training
        self.num_id_vecs = sum(e.num_id_vecs for e in encoders)
        self.num_static_img_suffix_embs = sum(
            e.num_static_img_suffix_embs for e in encoders)

    def extract_init_id_embeds_from_images(self, images, fg_masks=None,
                                           calc_avg=False, skip_non_faces=True):
        """Per-encoder extraction; id embs concatenated feature-wise
        (face_id_dim 1024), clip features concatenated channel-wise."""
        results = [
            e.extract_init_id_embeds_from_images(
                images, fg_masks=fg_masks, calc_avg=calc_avg,
                skip_non_faces=skip_non_faces)
            for e in self.encoders
        ]
        faceless = max(r[0] for r in results)
        id_embs = [r[1] for r in results]
        clip_feats = [r[2] for r in results]
        if any(e is None for e in id_embs):
            return faceless, None, None
        return faceless, id_embs, clip_feats

    def get_img_prompt_embs(self, init_id_embs=None, pre_clip_features=None,
                            images=None, fg_masks=None, id_batch_size: int = 1,
                            skip_non_faces: bool = True, avg_at_stage=None,
                            perturb_at_stage=None, perturb_std=0.0, rng=None):
        """Per-encoder img-prompt embeddings concatenated along the token
        axis → [B, 16+4, 768]. The reference notes Joint's interface "is
        fully compatible with FaceID2AdaPrompt.get_batched_img_prompt_embs"
        (`face_id_to_ada_prompt.py:1184-1186`); init_id_embs /
        pre_clip_features are per-encoder lists here (or None)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        pos, neg = [], []
        count = 0
        for i, enc in enumerate(self.encoders):
            sub_id = (init_id_embs[i]
                      if isinstance(init_id_embs, (list, tuple)) else init_id_embs)
            sub_clip = (pre_clip_features[i]
                        if isinstance(pre_clip_features, (list, tuple))
                        else pre_clip_features)
            rng, sub = jax.random.split(rng)
            c, _, p, n = enc.get_img_prompt_embs(
                init_id_embs=sub_id, pre_clip_features=sub_clip,
                images=images, fg_masks=fg_masks, id_batch_size=id_batch_size,
                skip_non_faces=skip_non_faces, avg_at_stage=avg_at_stage,
                perturb_at_stage=perturb_at_stage, perturb_std=perturb_std,
                rng=sub)
            if p is None:
                return 0, None, None, None
            count = max(count, c)
            pos.append(p)
            neg.append(n if n is not None else jnp.zeros_like(p))
        return (count, init_id_embs, jnp.concatenate(pos, axis=1),
                jnp.concatenate(neg, axis=1))

    def get_batched_img_prompt_embs(self, batch_size, init_id_embs,
                                    pre_clip_features, rng=None):
        return self.get_img_prompt_embs(
            init_id_embs=init_id_embs, pre_clip_features=pre_clip_features,
            id_batch_size=batch_size, skip_non_faces=False,
            avg_at_stage=None, rng=rng)

    def generate_adaface_embeddings(
        self, images=None, face_id_embs=None, img_prompt_embs=None,
        fg_masks=None, p_dropout: float | None = None,
        return_zero_embs_for_dropped_encoders: bool = True,
        avg_at_stage="id_emb", perturb_at_stage=None, perturb_std=0.0,
        enable_static_img_suffix_embs=None, rng=None,
    ):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        drop = []
        for i, enc in enumerate(self.encoders):
            p = (p_dropout if p_dropout is not None else
                 (self.p_dropout[i] if self.is_training else 0.0))
            rng, sub = jax.random.split(rng)
            drop.append(bool(jax.random.bernoulli(sub, p)) if p > 0 else False)
        if all(drop):  # never drop all encoders (`:1228-1241`)
            drop[int(jax.random.bernoulli(rng, 0.5))] = False

        ada_list, img_list, lens = [], [], []
        for i, enc in enumerate(self.encoders):
            sub_face = face_id_embs[i] if isinstance(face_id_embs, (list, tuple)) else face_id_embs
            sub_imgp = img_prompt_embs[i] if isinstance(img_prompt_embs, (list, tuple)) else None
            if drop[i]:
                if return_zero_embs_for_dropped_encoders:
                    n = enc.num_id_vecs
                    d = enc.sbg_cfg.output_dim
                    z = jnp.zeros((n, d)) if avg_at_stage is not None else None
                    ada_list.append(z)
                    lens.append(n)
                continue
            rng, sub = jax.random.split(rng)
            ada, imgp, l = enc.generate_adaface_embeddings(
                images=images, face_id_embs=sub_face, img_prompt_embs=sub_imgp,
                fg_masks=fg_masks, avg_at_stage=avg_at_stage,
                perturb_at_stage=perturb_at_stage, perturb_std=perturb_std,
                enable_static_img_suffix_embs=enable_static_img_suffix_embs,
                rng=sub,
            )
            if ada is None:
                return None, None, lens
            ada_list.append(ada)
            img_list.append(imgp)
            lens.extend(l)
        axis = 0 if avg_at_stage is not None else 1
        ada = jnp.concatenate([a for a in ada_list if a is not None], axis=axis)
        return ada, img_list, lens

    def trainable_params(self):
        return {e.name: e.trainable_params() for e in self.encoders}


def create_id2ada_prompt_encoder(name: str, rng=None, **kw):
    """`create_id2ada_prompt_encoder` (`face_id_to_ada_prompt.py:20-53`)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if name == "arc2face":
        return Arc2FaceID2AdaPrompt(rng, **kw)
    if name == "consistentID":
        return ConsistentIDID2AdaPrompt(rng, **kw)
    if name in ("jointIDs", "joint"):
        return JointFaceID2AdaPrompt(rng, **kw)
    raise ValueError(f"unknown id2ada encoder '{name}'")
