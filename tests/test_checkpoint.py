import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.train.checkpoint import (
    load_adaface_ckpt,
    load_checkpoint,
    save_adaface_ckpt,
    save_checkpoint,
)


def test_save_load_roundtrip(tmp_path):
    state = {
        "a": jnp.arange(6.0).reshape(2, 3),
        "nested": {"b": jnp.ones((4,)), "c": jnp.zeros((1,), jnp.int32)},
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, step=42, manifest_extra={"note": "x"})
    restored, manifest = load_checkpoint(d, target=state)
    assert manifest["step"] == 42 and manifest["note"] == "x"
    np.testing.assert_allclose(np.asarray(restored["a"]), np.asarray(state["a"]))
    np.testing.assert_allclose(np.asarray(restored["nested"]["b"]), 1.0)


def test_adaface_ckpt_mkv_reextension(tmp_path):
    from adaface_tpu.models.clip import (
        CLIPTextConfig, init_text_params, layer_multipliers, text_encode)

    cfg = CLIPTextConfig(hidden_size=64, num_layers=2, num_heads=2,
                         intermediate_size=128)
    ctp = init_text_params(jax.random.PRNGKey(0), cfg)
    sbg = {"prompt2token_proj": {"layers": ctp["layers"],
                                 "final_ln": ctp["final_ln"]}}
    d = str(tmp_path / "ada")
    save_adaface_ckpt(d, 500, {"arc2face": sbg},
                      mkv_multipliers={"arc2face": [1, 1]})
    # request x2 multipliers on load → attention re-extended
    state, manifest = load_adaface_ckpt(
        d, want_mkv_multipliers={"arc2face": [2, 2]})
    loaded = state["subj_basis_generators"]["arc2face"]["prompt2token_proj"]
    mults = [l["attn"]["k"]["w"].shape[1] // cfg.hidden_size
             for l in loaded["layers"]]
    assert mults == [2, 2]
    assert manifest["kind"] == "adaface"
