import jax
import jax.numpy as jnp
import numpy as np

from adaface_tpu.ops.schedules import DiffusionSchedule, ddim_timesteps, make_beta_schedule


def test_linear_schedule_matches_sd15():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    # sqrt-space linearity
    s = np.sqrt(betas)
    diffs = np.diff(s)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-6)


def test_q_sample_predict_roundtrip():
    sched = DiffusionSchedule.create()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 4, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 100, 500, 999])
    x_t = sched.q_sample(x0, t, noise)
    x0_rec = sched.predict_start_from_noise(x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    eps_rec = sched.predict_noise_from_start(x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-3)


def test_posterior_buffers_finite():
    sched = DiffusionSchedule.create()
    for name in [
        "posterior_variance",
        "posterior_log_variance_clipped",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
    ]:
        assert np.isfinite(np.asarray(getattr(sched, name))).all(), name


def test_ddim_timesteps_leading_diffusers_semantics():
    ts = ddim_timesteps(1000, 50, steps_offset=1, spacing="leading")
    assert ts.shape == (50,)
    assert ts[0] == 981 and ts[-1] == 1
    assert np.all(np.diff(ts) == -20)


def test_ddim_timesteps_uniform_ldm_semantics():
    ts = ddim_timesteps(1000, 50, spacing="uniform")
    assert ts[0] == 981 and ts[-1] == 1 and len(ts) == 50


def test_schedule_is_pytree():
    sched = DiffusionSchedule.create()
    leaves = jax.tree_util.tree_leaves(sched)
    assert len(leaves) == 11

    @jax.jit
    def f(s: DiffusionSchedule):
        return s.betas.sum()

    assert np.isfinite(float(f(sched)))
