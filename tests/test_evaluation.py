import os

import jax
import numpy as np
import pytest
from PIL import Image

from adaface_tpu.evaluation.clip_eval import CLIPEvaluator
from adaface_tpu.evaluation.dino_eval import DINOEvaluator
from adaface_tpu.evaluation.eval_utils import (
    append_score_row,
    compare_face_folders,
    compare_folders,
    format_prompt_list,
    parse_range_str,
)
from adaface_tpu.evaluation.face_sim import calc_faces_similarities, embed_images
from adaface_tpu.id2ada.face_backends import DeterministicBackend
from adaface_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from adaface_tpu.models.vit import ViTConfig, init_vit_params

TINY_TEXT = CLIPTextConfig(hidden_size=64, num_layers=2, num_heads=2,
                           intermediate_size=128)
TINY_VISION = CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=2,
                               intermediate_size=128, patch_size=32,
                               projection_dim=32)
TINY_VIT = ViTConfig(hidden_size=64, num_layers=2, num_heads=2, patch_size=32)


def _imgs(n, seed=0):
    rs = np.random.RandomState(seed)
    return [rs.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(n)]


def test_parse_range_str():
    assert parse_range_str("1,3-5,8") == [1, 3, 4, 5, 8]
    assert parse_range_str(None) is None


def test_format_prompt_list():
    subj, cls = format_prompt_list("z", "person", ["a photo of {}", "{} at night"])
    assert subj == ["a photo of z", "z at night"]
    assert cls == ["a photo of person", "person at night"]


def test_parse_subject_file(tmp_path):
    """Fish-syntax subject tables (`info-subjects-celebrity.sh` format,
    `ldm/util.py:246-288`), incl. $var aliasing."""
    from adaface_tpu.evaluation.eval_utils import parse_subject_file

    p = tmp_path / "info-subjects.sh"
    p.write_text(
        "#!/usr/bin/fish\n"
        "set -g subjects  alice    bob\n"
        "set -g subj_types woman   man\n"
        "set -g cls_delta_strings $subj_types\n"
        "set -g data_folder subjects-celebrity\n")
    info, attr = parse_subject_file(str(p))
    assert info["subjects"] == ["alice", "bob"]
    assert info["data_folder"] == ["subjects-celebrity"]
    assert attr["subj_types"] == {"alice": "woman", "bob": "man"}
    assert attr["cls_delta_strings"] == {"alice": "woman", "bob": "man"}


def test_bundled_reference_fixtures(tmp_path):
    """The bundled 22-subject celebrity fixture set resolves end-to-end
    through the orchestrator's --list_only smoke path: the real
    info-subjects-celebrity.sh parses, every subject folder exists with
    images, and a scores-CSV skeleton is written."""
    import os
    import subprocess
    import sys

    if not os.path.isdir("/root/reference/subjects-celebrity"):
        pytest.skip("reference fixtures not present")
    csv_path = tmp_path / "scores.csv"
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "gen_prompts_and_eval.py")
    out = subprocess.run(
        [sys.executable, script, "--list_only",
         "--scores_csv", str(csv_path)],
        capture_output=True, text=True, check=True)
    assert "22 subjects resolved" in out.stdout
    assert csv_path.exists()
    header = csv_path.read_text().splitlines()[0]
    assert header.startswith("subject,")


@pytest.fixture(scope="module")
def clip_eval():
    return CLIPEvaluator(text_cfg=TINY_TEXT, vision_cfg=TINY_VISION,
                         rng=jax.random.PRNGKey(0))


def test_clip_evaluator_scores(clip_eval):
    a, b = _imgs(2, 0), _imgs(2, 1)
    s_ab = clip_eval.img_to_img_similarity(a, b)
    s_aa = clip_eval.img_to_img_similarity(a, a)
    assert -1.0 <= s_ab <= 1.0
    assert s_aa > s_ab  # self-similarity (incl. diag=1) beats cross
    t = clip_eval.txt_to_img_similarity(["a photo"], a)
    assert -1.0 <= t <= 1.0


def test_dino_evaluator(clip_eval):
    ev = DINOEvaluator(cfg=TINY_VIT, rng=jax.random.PRNGKey(1))
    a = _imgs(2, 0)
    assert ev.img_to_img_similarity(a, a) > ev.img_to_img_similarity(a, _imgs(2, 5))


def test_face_sim_deterministic_backend():
    be = DeterministicBackend()
    a = _imgs(3, 0)
    ea = embed_images(a, be)
    assert ea.shape == (3, 512)
    # same images → identical embeddings → high self-sim diagonal
    sim_self = calc_faces_similarities(ea, ea)
    sim_cross = calc_faces_similarities(ea, embed_images(_imgs(3, 9), be))
    assert sim_self > sim_cross


def test_compare_folders_and_csv(tmp_path, clip_eval):
    d1, d2 = tmp_path / "samples", tmp_path / "gt"
    d1.mkdir(), d2.mkdir()
    for i, im in enumerate(_imgs(2, 0)):
        Image.fromarray(im).save(d1 / f"{i}.png")
    for i, im in enumerate(_imgs(2, 1)):
        Image.fromarray(im).save(d2 / f"{i}.png")
    scores = compare_folders(str(d1), str(d2), prompt="a photo",
                             clip_evaluator=clip_eval,
                             dino_evaluator=DINOEvaluator(
                                 cfg=TINY_VIT, rng=jax.random.PRNGKey(1)))
    assert set(scores) >= {"clip_t", "clip_i", "dino", "n_samples"}
    face = compare_face_folders(str(d1), str(d2),
                                backend=DeterministicBackend())
    assert "face_sim" in face and face["n_faces_a"] == 2

    csv_path = tmp_path / "scores.csv"
    append_score_row(str(csv_path), {"subject": "alice", **scores})
    append_score_row(str(csv_path), {"subject": "bob", **scores})
    lines = csv_path.read_text().strip().split("\n")
    assert len(lines) == 3  # header + 2 rows


def test_freeu_prompt_set():
    from adaface_tpu.evaluation.prompt_sets import FREEU_PROMPTS, PROMPT_SETS

    assert PROMPT_SETS["freeu"] is FREEU_PROMPTS
    assert len(FREEU_PROMPTS) >= 15
    # subject-free: no format slot in any prompt
    assert all("{}" not in p for p in FREEU_PROMPTS)
    # subject sets keep exactly one slot
    assert all(p.count("{}") == 1 for p in PROMPT_SETS["all"])


def test_extract_frames_script(tmp_path):
    import cv2

    sys_path = str(tmp_path)
    vid = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 8, (32, 32))
    for i in range(12):
        frame = np.full((32, 32, 3), i * 20, np.uint8)
        w.write(frame)
    w.release()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "extract_frames", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "extract_frames.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out_prefix = str(tmp_path / "frame")
    assert mod.extract_frames(vid, out_prefix, 4)
    outs = sorted(p for p in os.listdir(tmp_path) if p.startswith("frame_"))
    assert outs == [f"frame_{i}.png" for i in range(4)]
    # evenly spaced: first frame dark, last frame bright
    first = cv2.imread(str(tmp_path / "frame_0.png"))
    last = cv2.imread(str(tmp_path / "frame_3.png"))
    assert last.mean() > first.mean() + 50
    # refuses when the video is too short
    assert not mod.extract_frames(vid, sys_path + "/no", 999)
