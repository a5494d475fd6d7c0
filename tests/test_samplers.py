import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops.samplers import DDIMConfig, ddim_sample, multistep_denoise
from adaface_tpu.ops.schedules import DiffusionSchedule, extract


def _oracle_model(schedule, x0_true):
    """Model that returns the exact eps consistent with x_t and x0_true."""

    def fn(x, t, ctx):
        del ctx
        b = x.shape[0]
        x0 = jnp.broadcast_to(x0_true, x.shape)
        a = extract(schedule.sqrt_recip_alphas_cumprod, t[:b], x.shape)
        s = extract(schedule.sqrt_recipm1_alphas_cumprod, t[:b], x.shape)
        return (a * x - x0) / s

    return fn


def test_ddim_converges_to_oracle_x0():
    sched = DiffusionSchedule.create()
    x0_true = jnp.full((1, 4, 8, 8), 0.5)
    model = _oracle_model(sched, x0_true)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    # set_alpha_to_one=True makes the last step land exactly on pred_x0;
    # the diffusers default (False) deliberately keeps ~sqrt(1-alpha_0)
    # residual noise.
    cfg = DDIMConfig(
        num_inference_steps=20, guidance_scale=1.0, set_alpha_to_one=True,
        steps_offset=0,
    )
    x0 = ddim_sample(model, sched, x_T, cond_ctx=jnp.zeros((1, 1)), cfg=cfg)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_true), atol=0.02)


def test_ddim_cfg_batches_contexts():
    sched = DiffusionSchedule.create()
    calls = {}

    def model(x, t, ctx):
        calls["batch"] = x.shape[0]
        calls["ctx"] = ctx.shape[0]
        return jnp.zeros_like(x)

    x_T = jnp.zeros((2, 4, 8, 8))
    cfg = DDIMConfig(num_inference_steps=2, guidance_scale=5.0)
    ddim_sample(
        model,
        sched,
        x_T,
        cond_ctx=jnp.ones((2, 3)),
        uncond_ctx=jnp.zeros((2, 3)),
        cfg=cfg,
    )
    assert calls["batch"] == 4 and calls["ctx"] == 4


def test_ddim_dual_scale_runs_jitted():
    sched = DiffusionSchedule.create()

    def model(x, t, ctx):
        return 0.1 * x

    cfg = DDIMConfig(num_inference_steps=5, guidance_scale=4.0, guidance_scale_min=1.0)

    @jax.jit
    def run(x_T):
        return ddim_sample(
            model, sched, x_T, cond_ctx=jnp.ones((1, 1)),
            uncond_ctx=jnp.zeros((1, 1)), cfg=cfg,
        )

    out = run(jnp.ones((1, 4, 8, 8)))
    assert np.isfinite(np.asarray(out)).all()


def test_multistep_denoise_shapes_and_progress():
    sched = DiffusionSchedule.create()
    x0_true = jnp.full((2, 4, 8, 8), -0.3)
    model3 = _oracle_model(sched, x0_true)

    def model(x, t, ctx):
        return model3(x, t, ctx)

    x_start = jnp.zeros((2, 4, 8, 8))
    noises = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 4, 8, 8))
    ts = jnp.array([[800, 800], [500, 500], [200, 200]], jnp.int32)
    preds, x_starts, x_ts = multistep_denoise(model, sched, x_start, noises, ts)
    assert preds.shape == (3, 2, 4, 8, 8)
    # oracle model recovers x0_true at every step
    np.testing.assert_allclose(
        np.asarray(x_starts[-1]), np.asarray(jnp.broadcast_to(x0_true, x_start.shape)),
        atol=1e-3,
    )
