"""Golden parity for the comp-distill ORCHESTRATION against the reference
`LatentDiffusion` methods, run unbound on a minimal fake `self`.

Covers the two semantic layers above the (already golden-tested) UNet:

1. `prime_x_start_for_comp_prompts` (`ddpm.py:1923-1985`) driven through
   the real `UNetEnsembleTeacher` (`adaface/unet_teachers.py`) with the
   tiny torch LDM UNet as the priming net — two instances (subj-single,
   cls-mix-comp), CFG vs the uncond context, power-law t chain.
2. `comp_distill_multistep_denoise` + `guided_denoise` +
   `sliced_apply_model` (`ddpm.py:1560-2092`) — the 4-block sliced
   denoising with CFG 2.5 and detached x_start chaining.

Both reference methods draw randomness internally (torch.randn_like /
rand_like / randint, np.random.uniform). The tests monkeypatch those to
RECORD every draw, then inject the recorded values into our
`sample_comp_rand`-shaped dict, so both sides consume identical numbers.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from adaface_tpu.models.unet import UNetConfig
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.tools.convert_ldm_unet import convert_ldm_unet
from adaface_tpu.train.comp_step import (
    CompDistillConfig,
    comp_distill_denoise,
    prime_comp_x_start,
)

from tests.golden_utils import stub_reference_ddpm_deps

CFG = UNetConfig(
    in_channels=4,
    out_channels=4,
    block_channels=(32, 64),
    layers_per_block=1,
    cross_attn_dim=16,
    num_heads=2,
    norm_groups=32,
    down_has_attn=(True, False),
    up_has_attn=(False, True),
    time_embed_dim=128,
)
S, D, HW = 8, 16, 16


@pytest.fixture(scope="module")
def ref():
    stub_reference_ddpm_deps()
    try:
        import ldm.models.diffusion.ddpm as ddpm_mod
        from ldm.modules.diffusionmodules.openaimodel import UNetModel
        from adaface.unet_teachers import UNetEnsembleTeacher
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"reference import failed: {e}")

    torch.manual_seed(0)
    net = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1], dropout=0.0, channel_mult=(1, 2),
        num_heads=2, use_spatial_transformer=True, transformer_depth=1,
        context_dim=D, use_checkpoint=False, legacy=False,
    ).eval()
    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in net.state_dict().items()}
    params = convert_ldm_unet(sd, CFG)
    return ddpm_mod, UNetEnsembleTeacher, net, params


class _LDMAdapter(torch.nn.Module):
    """Presents the LDM UNetModel through the diffusers call convention the
    teacher uses: `unet(sample=..., timestep=..., encoder_hidden_states=...,
    return_dict=False)[0]`."""

    def __init__(self, net):
        super().__init__()
        self.net = net
        self.dtype = torch.float32
        self.config = {}

    @property
    def device(self):
        return torch.device("cpu")

    def forward(self, sample=None, timestep=None, encoder_hidden_states=None,
                return_dict=False, **kw):
        out = self.net(sample, timestep, encoder_hidden_states, extra_info={})
        return (out,) if not return_dict else out


def _make_fake_ddpm(ddpm_mod, net, uncond_emb, teacher=None):
    """Minimal `self` for the unbound LatentDiffusion orchestration
    methods: the SD schedule buffers + a plain-UNet apply_model."""
    from ldm.modules.diffusionmodules.util import make_beta_schedule
    import types as _t

    betas = torch.tensor(
        make_beta_schedule("linear", 1000, linear_start=0.00085,
                           linear_end=0.012), dtype=torch.float64)
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)

    class Fake:
        prime_x_start_for_comp_prompts = \
            ddpm_mod.LatentDiffusion.prime_x_start_for_comp_prompts
        comp_distill_multistep_denoise = \
            ddpm_mod.LatentDiffusion.comp_distill_multistep_denoise
        guided_denoise = ddpm_mod.LatentDiffusion.guided_denoise
        sliced_apply_model = ddpm_mod.LatentDiffusion.sliced_apply_model
        q_sample = ddpm_mod.DDPM.q_sample
        predict_start_from_noise = ddpm_mod.DDPM.predict_start_from_noise

        def apply_model(self, x_noisy, t, cond_context, use_attn_lora=False,
                        use_ffn_lora=False, ffn_lora_adapter_name=None):
            prompt_emb, prompt_in, extra_info = cond_context
            extra_info["ca_layers_activations"] = {}
            return net(x_noisy, t, prompt_emb, extra_info={})

    f = Fake()
    ac = alphas_cumprod.float()
    f.sqrt_alphas_cumprod = torch.sqrt(ac)
    f.sqrt_one_minus_alphas_cumprod = torch.sqrt(1.0 - ac)
    f.sqrt_recip_alphas_cumprod = torch.sqrt(1.0 / ac)
    f.sqrt_recipm1_alphas_cumprod = torch.sqrt(1.0 / ac - 1.0)
    f.num_timesteps = 1000
    f.res_hidden_states_gradscale = 0.5
    f.uncond_context = (uncond_emb, [""], {})
    f.comp_distill_priming_unet = teacher
    f.trainer = _t.SimpleNamespace(global_rank=0)
    f.global_step = 0
    return f


class _Recorder:
    """Monkeypatch torch.randn_like / rand_like / randint and
    np.random.uniform to record every draw by name."""

    def __init__(self, monkeypatch):
        self.draws = {"randn_like": [], "rand_like": [], "randint": [],
                      "np_uniform": []}
        orig = {"randn_like": torch.randn_like, "rand_like": torch.rand_like,
                "randint": torch.randint, "np_uniform": np.random.uniform}

        def wrap(name):
            def fn(*a, **k):
                out = orig[name](*a, **k)
                self.draws[name].append(
                    out.clone() if torch.is_tensor(out) else out)
                return out
            return fn

        monkeypatch.setattr(torch, "randn_like", wrap("randn_like"))
        monkeypatch.setattr(torch, "rand_like", wrap("rand_like"))
        monkeypatch.setattr(torch, "randint", wrap("randint"))
        monkeypatch.setattr(np.random, "uniform", wrap("np_uniform"))


def test_prime_x_start_matches_reference(ref, monkeypatch):
    ddpm_mod, UNetEnsembleTeacher, net, params = ref
    torch.manual_seed(11)
    rs = np.random.RandomState(11)
    np.random.seed(11)
    b = 1
    n_prime = 3
    ss = torch.randn(b, S, D)
    sc = torch.randn(b, S, D)
    sr = torch.randn(b, S, D)
    cc = torch.randn(b, S, D)
    uncond = torch.randn(1, S, D)
    x_start = torch.randn(b, 4, HW, HW)
    noise = torch.randn(b, 4, HW, HW)

    teacher = UNetEnsembleTeacher(
        unets=[_LDMAdapter(net)], unet_types=None, extra_unet_dirpaths=None,
        unet_weights_in_ensemble=[1], p_uses_cfg=1, cfg_scale_range=[2, 4],
        device="cpu", torch_dtype=torch.float32)
    fake = _make_fake_ddpm(ddpm_mod, net, uncond, teacher=teacher)

    rec = _Recorder(monkeypatch)
    prompt_emb = torch.cat([ss, sc, sr, cc], dim=0)
    subj_context = (prompt_emb, ["p"] * (4 * b), {})
    with torch.no_grad():
        want = fake.prime_x_start_for_comp_prompts(
            subj_context, x_start, noise, n_prime, 0.8, BLOCK_SIZE=b)
    want_single, want_comp = want.chunk(2)

    # map the recorded draws into our sample_comp_rand layout
    # (`comp_step.py:115-157`): prime draws are randn x_start_2, randint
    # t_rear, np.uniform cfg_scale, then per chain step rand_like rel_ts
    # followed by randn_like noise
    randn = rec.draws["randn_like"]
    assert len(randn) == 1 + (n_prime - 1)
    rand = {
        "prime_x0": jnp.asarray(randn[0][:b].numpy()),
        "prime_t0": jnp.int32(int(rec.draws["randint"][0].item())),
        "prime_cfg_scale": jnp.float32(rec.draws["np_uniform"][0]),
        "prime_noises": jnp.stack(
            [jnp.asarray(noise[:1].numpy())]
            + [jnp.asarray(r[:1].numpy()) for r in randn[1:]]),
        "prime_rel_ts": jnp.asarray(
            np.array([r.numpy()[0] for r in rec.draws["rand_like"]],
                     np.float32)),
    }

    sched = DiffusionSchedule.create()
    ccfg = CompDistillConfig(num_priming_steps=n_prime,
                             compute_dtype="float32")
    ctx_mix_prime = jnp.asarray((sc * 0.2 + cc * 0.8).numpy())
    got_single, got_comp = prime_comp_x_start(
        params, CFG, sched, jnp.asarray(ss.numpy()), ctx_mix_prime,
        jnp.asarray(uncond.numpy()), rand, ccfg)

    np.testing.assert_allclose(np.asarray(got_single), want_single.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_comp), want_comp.numpy(),
                               atol=2e-3, rtol=1e-3)


def test_multistep_denoise_matches_reference(ref, monkeypatch):
    ddpm_mod, _, net, params = ref
    torch.manual_seed(23)
    np.random.seed(23)
    b = 1
    n_steps = 3
    ctx4 = torch.randn(4 * b, S, D)
    uncond = torch.randn(1, S, D)
    x4 = torch.randn(4 * b, 4, HW, HW)
    noise0 = torch.randn(b, 4, HW, HW).repeat(4, 1, 1, 1)
    t0 = torch.tensor([521] * (4 * b), dtype=torch.long)

    fake = _make_fake_ddpm(ddpm_mod, net, uncond)
    rec = _Recorder(monkeypatch)
    subj_context = (ctx4.clone(), ["p"] * (4 * b), {})
    want_preds, _, want_recons, _, want_ts, _ = \
        fake.comp_distill_multistep_denoise(
            [x4.clone()], [noise0.clone()], [t0.clone()], subj_context,
            uncond_emb=uncond.repeat(4 * b, 1, 1),
            all_subj_indices_1b=None, normalize_cross_attn=False,
            mix_sc_mc_attn=False, cfg_scale=2.5,
            num_denoising_steps=n_steps, old_x_starts_mix_ratio=0,
            use_attn_lora=False, use_ffn_lora=False,
            ffn_lora_adapter_name="comp_distill",
            batch_part_has_grad="subject-compos")

    # reference chain draws per step: randn_like noise (4-block of a
    # 1-block draw) then rand_like rel_ts (`ddpm.py:2055-2076`)
    rand = {
        "den_t0": jnp.asarray(t0[:b].numpy()),
        "den_noises": jnp.stack(
            [jnp.asarray(noise0[:b].numpy())]
            + [jnp.asarray(r[:b].numpy()) for r in rec.draws["randn_like"]]),
        "den_rel_ts": jnp.asarray(
            np.stack([r.numpy()[:b] for r in rec.draws["rand_like"]])
            .astype(np.float32)),
        "den_ffn_gates": jnp.zeros((n_steps,), jnp.float32),
    }

    sched = DiffusionSchedule.create()
    ccfg = CompDistillConfig(num_denoising_steps=n_steps,
                             use_attn_lora=False, use_ffn_lora=False,
                             normalize_cross_attn=False,
                             compute_dtype="float32")
    _, got_recons, got_ts, _ = comp_distill_denoise(
        params, CFG, sched, jnp.asarray(x4.numpy()),
        jnp.asarray(ctx4.numpy()), jnp.asarray(uncond.numpy()),
        jnp.zeros((4 * b, S), jnp.float32), rand, cfg=ccfg)

    for i in range(n_steps):
        np.testing.assert_array_equal(np.asarray(got_ts[i]),
                                      want_ts[i].numpy())
        np.testing.assert_allclose(
            np.asarray(got_recons[i]), want_recons[i].detach().numpy(),
            atol=3e-3, rtol=1e-3, err_msg=f"x_recon step {i}")
