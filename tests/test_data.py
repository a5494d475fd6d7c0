import json
import os

import numpy as np
import pytest
from PIL import Image

from adaface_tpu.data.compositions import sample_compositions
from adaface_tpu.data.personalized import (
    PersonalizedBase,
    SubjectSampler,
    collate_batch,
    pad_image_to_square,
)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("subjects")
    for name, n_imgs, face in [("alice", 3, True), ("bob", 2, True),
                               ("statue", 1, False)]:
        d = root / name
        d.mkdir()
        rs = np.random.RandomState(hash(name) % 1000)
        for i in range(n_imgs):
            img = rs.randint(0, 255, (40, 60, 3), np.uint8)
            Image.fromarray(img).save(d / f"img{i}.png")
            if i == 0:
                mask = np.zeros((40, 60), np.uint8)
                mask[10:30, 20:50] = 255
                Image.fromarray(mask).save(d / f"img{i}_mask.png")
                (d / f"img{i}.txt").write_text(f"a nice photo of {name}")
    (root / "metainfo.json").write_text(json.dumps({
        "alice": {"cls_delta_string": "woman"},
        "bob": {"cls_delta_string": "man"},
        "statue": {"is_face": False, "cls_delta_string": "statue"},
    }))
    return str(root)


def test_sample_compositions_shapes():
    prompts, mods = sample_compositions(10, "animal",
                                        rng=np.random.RandomState(0))
    assert len(prompts) == 10 and len(mods) == 10
    assert all(isinstance(p, str) and p for p in prompts)
    # lighting always present in modifiers
    assert all("light" in m or "glow" in m or "moonlight" in m for m in mods)
    # object type excludes animal actions
    op, _ = sample_compositions(20, "object", rng=np.random.RandomState(1))
    assert not any("eating" in p or "wearing" in p for p in op)


def test_pad_image_to_square():
    img = Image.fromarray(np.zeros((40, 60, 3), np.uint8))
    sq = pad_image_to_square(img)
    assert sq.size == (60, 60)


def test_dataset_scan(dataset_dir):
    ds = PersonalizedBase(dataset_dir, num_vectors_per_subj_token=4, size=64,
                          seed=0)
    assert ds.num_subjects() == 3
    assert sorted(ds.subject_names) == ["alice", "bob", "statue"]
    assert len(ds) == 6
    alice = ds.subjects[[s.name for s in ds.subjects].index("alice")]
    assert alice.cls_delta_string == "woman"
    assert alice.mask_paths[0] is not None
    assert alice.caption_paths[0] is not None


def test_dataset_item(dataset_dir):
    ds = PersonalizedBase(dataset_dir, num_vectors_per_subj_token=4, size=64,
                          seed=0)
    ex = ds[0]
    assert ex["image"].shape == (64, 64, 3)
    assert -1.0 <= ex["image"].min() and ex["image"].max() <= 1.0
    assert ex["fg_mask"].shape == (64, 64)
    assert ex["aug_mask"].shape == (64, 64)
    # prompt variants present and filler-expanded
    assert "z, , , " in ex["subj_single_prompt"]
    assert ex["subj_comp_prompt"].startswith(ex["subj_single_prompt"])
    assert ex["cls_single_prompt"].count(",") >= 3
    for tag in ("fp", "p"):
        assert f"portrait" in ex[f"subj_single_prompt_{tag}"]
    # delta-prompt alignment: subj and cls comp prompts share the suffix
    suffix = ex["compos_partial_prompt"]
    assert ex["subj_comp_prompt"].endswith(suffix)
    assert ex["cls_comp_prompt"].endswith(suffix)


def test_subject_sampler_one_subject_per_batch(dataset_dir):
    ds = PersonalizedBase(dataset_dir, size=64, seed=0)
    sampler = SubjectSampler(ds, batch_size=4, num_batches=10, seed=0)
    idx = list(iter(sampler))
    assert len(idx) == 40
    for b in range(10):
        batch = idx[b * 4:(b + 1) * 4]
        assert len({si for si, _ in batch}) == 1
    # non-face subject never sampled
    assert all(ds.subjects[si].is_face for si, _ in idx)


def test_collate(dataset_dir):
    ds = PersonalizedBase(dataset_dir, size=64, seed=0)
    batch = collate_batch([ds[0], ds[1]])
    assert batch["image"].shape == (2, 64, 64, 3)
    assert len(batch["subj_single_prompt"]) == 2


def test_mix_subj_data_roots(tmp_path):
    """FFHQ-style mixed folder: one Subject entry, is_mix flag propagated
    to examples (reference `personalized.py:130-168,529-534`)."""
    import numpy as np
    from PIL import Image

    from adaface_tpu.data.personalized import PersonalizedBase

    subj_root = tmp_path / "subjects" / "alice"
    subj_root.mkdir(parents=True)
    mix_root = tmp_path / "ffhq"
    mix_root.mkdir()
    rng = np.random.default_rng(0)
    for d, n in ((subj_root, 2), (mix_root, 3)):
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
                d / f"{i:05d}.png")
    Image.fromarray((np.ones((64, 64), np.uint8)) * 255).save(
        mix_root / "00000_mask.png")

    ds = PersonalizedBase(
        [str(tmp_path / "subjects")], mix_subj_data_roots=str(mix_root),
        size=64, seed=0, use_native=False)
    assert ds.num_subjects() == 2
    mix = [s for s in ds.subjects if s.is_mix]
    assert len(mix) == 1 and len(mix[0].image_paths) == 3
    assert mix[0].mask_paths.count(None) == 2  # only 00000 has a mask

    ex_single = ds[(0, 0)]
    ex_mix = ds[(1, 0)]
    assert ex_single["is_in_mix_subj_folder"] is False
    assert ex_mix["is_in_mix_subj_folder"] is True
