"""Golden parity against the reference LDM VAE and beta schedules.

Imports `ldm.modules.diffusionmodules.model` (torch Encoder/Decoder —
the masked-encoder AutoencoderKL internals, `autoencoder.py:49-59`) and
`ldm.modules.diffusionmodules.util.make_beta_schedule` from the
read-only reference as oracles, with torchvision stubbed.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from adaface_tpu.models.vae import (
    VAEConfig,
    vae_decode,
    vae_encode_moments,
)
from adaface_tpu.ops.schedules import DiffusionSchedule
from adaface_tpu.tools.convert_sd import convert_vae_ldm


@pytest.fixture(scope="module")
def ref_model_mod():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tvu.draw_bounding_boxes = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    try:
        from ldm.modules.diffusionmodules import model
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    return model


CFG = VAEConfig(base_ch=32, ch_mult=(1, 2), num_res_blocks=1,
                norm_groups=32)


@pytest.fixture(scope="module")
def vae_pair(ref_model_mod):
    """(torch encoder, decoder, quant convs, our converted params)."""
    m = ref_model_mod
    torch.manual_seed(0)
    kw = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[], dropout=0.0, in_channels=3,
              resolution=32, z_channels=4)
    enc = m.Encoder(double_z=True, **kw).eval()
    dec = m.Decoder(**kw).eval()
    quant = torch.nn.Conv2d(8, 8, 1)
    post_quant = torch.nn.Conv2d(4, 4, 1)
    sd = {}
    sd.update({f"encoder.{k}": v for k, v in enc.state_dict().items()})
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd.update({f"quant_conv.{k}": v for k, v in quant.state_dict().items()})
    sd.update({f"post_quant_conv.{k}": v
               for k, v in post_quant.state_dict().items()})
    params = convert_vae_ldm({k: v.numpy() for k, v in sd.items()}, CFG)
    return enc, dec, quant, post_quant, params


def test_vae_encoder_matches_reference(vae_pair):
    enc, _, quant, _, params = vae_pair
    rs = np.random.RandomState(0)
    x = rs.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = quant(enc(torch.from_numpy(x))).numpy()
    got = np.asarray(vae_encode_moments(params, jnp.asarray(x), CFG))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_vae_decoder_matches_reference(vae_pair):
    _, dec, _, post_quant, params = vae_pair
    rs = np.random.RandomState(1)
    z = rs.randn(1, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = dec(post_quant(torch.from_numpy(z))).numpy()
    got = np.asarray(vae_decode(params, jnp.asarray(z), CFG, scale=1.0))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_beta_schedule_matches_reference(ref_model_mod):
    """Linear beta schedule + derived buffers (`ddpm.py:294-345` via
    `make_beta_schedule`, `diffusionmodules/util.py`)."""
    from ldm.modules.diffusionmodules.util import make_beta_schedule

    betas = make_beta_schedule("linear", 1000, linear_start=0.00085,
                               linear_end=0.0120)
    betas = np.asarray(betas, np.float64)
    ours = DiffusionSchedule.create()
    np.testing.assert_allclose(np.asarray(ours.betas), betas, rtol=1e-6)
    ac = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(np.asarray(ours.alphas_cumprod), ac,
                               rtol=1e-5)
    # q_sample: sqrt(ac_t) x0 + sqrt(1-ac_t) eps (`ddpm.py:395`)
    rs = np.random.RandomState(2)
    x0 = rs.randn(2, 4, 8, 8).astype(np.float32)
    eps = rs.randn(2, 4, 8, 8).astype(np.float32)
    t = np.asarray([13, 750])
    want = (np.sqrt(ac[t])[:, None, None, None] * x0
            + np.sqrt(1 - ac[t])[:, None, None, None] * eps)
    got = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t),
                                   jnp.asarray(eps)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # predict_start_from_noise inverts q_sample (`ddpm.py:389`)
    back = np.asarray(ours.predict_start_from_noise(
        jnp.asarray(want), jnp.asarray(t), jnp.asarray(eps)))
    np.testing.assert_allclose(back, x0, atol=1e-4)


def test_ddim_schedule_matches_reference(ref_model_mod):
    """LDM DDIMSampler schedule (`ddim.py` via make_ddim_timesteps /
    make_ddim_sampling_parameters, uniform spacing): timestep grid,
    alpha/alpha_prev tables, and eta sigmas."""
    from ldm.modules.diffusionmodules.util import (
        make_ddim_sampling_parameters, make_ddim_timesteps)

    from adaface_tpu.ops.samplers import DDIMConfig, _alpha_tables

    sched = DiffusionSchedule.create()
    ac = np.asarray(sched.alphas_cumprod)
    n = 50
    ref_ts = make_ddim_timesteps("uniform", n, 1000, verbose=False)
    sig, al, al_prev = make_ddim_sampling_parameters(
        ac, ref_ts, eta=1.0, verbose=False)

    cfg = DDIMConfig(num_inference_steps=n, spacing="uniform",
                     set_alpha_to_one=False)
    ts, a_t, a_p = _alpha_tables(sched, cfg)
    # ours is stored descending (sampling order); the reference ascending
    np.testing.assert_array_equal(np.asarray(ts)[::-1], ref_ts)
    np.testing.assert_allclose(np.asarray(a_t)[::-1], al, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a_p)[::-1], al_prev, rtol=1e-6)
    ours_sig = np.sqrt((1 - np.asarray(a_p)) / (1 - np.asarray(a_t))
                       * (1 - np.asarray(a_t) / np.asarray(a_p)))
    np.testing.assert_allclose(ours_sig[::-1], sig, rtol=1e-5)
