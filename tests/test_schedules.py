"""Schedule tables vs. reference constants (morphable_diffusion.py:428-450,658-672)."""

import numpy as np

from morphablediffusion_tpu.ops import schedules


def test_beta_schedule_endpoints():
    s = schedules.make_diffusion_schedule()
    betas = np.asarray(s.betas)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.0120, rtol=1e-6)
    # scaled-linear: sqrt(beta) is linear
    sq = np.sqrt(betas)
    np.testing.assert_allclose(np.diff(sq), np.diff(sq)[0], rtol=1e-4)


def test_alphas_cumprod_monotone():
    s = schedules.make_diffusion_schedule()
    acp = np.asarray(s.alphas_cumprod)
    assert np.all(np.diff(acp) < 0)
    np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)


def test_posterior_variance_matches_formula():
    s = schedules.make_diffusion_schedule()
    betas = np.asarray(s.betas, dtype=np.float64)
    acp = np.cumprod(1 - betas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    expect = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(s.posterior_variance), expect, rtol=1e-5)


def test_ddim_timesteps_uniform_offset():
    ts = schedules.make_ddim_timesteps(50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[1] == 21 and ts[-1] == 981


def test_ddim_tables():
    s = schedules.make_diffusion_schedule()
    d = schedules.make_ddim_schedule(s, 50, eta=1.0)
    acp = np.asarray(s.alphas_cumprod, dtype=np.float64)
    ts = np.asarray(d.timesteps)
    np.testing.assert_allclose(np.asarray(d.alphas), acp[ts], rtol=1e-5)
    expect_prev = np.concatenate([acp[0:1], acp[ts[:-1]]])
    np.testing.assert_allclose(np.asarray(d.alphas_prev), expect_prev, rtol=1e-5)
    a, ap = acp[ts], expect_prev
    sig = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(np.asarray(d.sigmas), sig, rtol=1e-4)


def test_add_noise_matches_closed_form(rng):
    import jax.numpy as jnp

    s = schedules.make_diffusion_schedule()
    x = jnp.asarray(rng.normal(size=(2, 3, 4, 4)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(2, 3, 4, 4)).astype(np.float32))
    t = jnp.asarray([0, 999])
    out = schedules.add_noise(x, n, t, s)
    acp = np.asarray(s.alphas_cumprod)
    for b, tb in enumerate([0, 999]):
        expect = np.sqrt(acp[tb]) * np.asarray(x[b]) + np.sqrt(1 - acp[tb]) * np.asarray(n[b])
        np.testing.assert_allclose(np.asarray(out[b]), expect, rtol=1e-5, atol=1e-6)


def test_ddim_step_reconstructs_x0_at_eta0(rng):
    """With eta=0 and exact noise, stepping recovers sqrt(a_prev)*x0 + dir."""
    import jax.numpy as jnp

    s = schedules.make_diffusion_schedule()
    d = schedules.make_ddim_schedule(s, 50, eta=0.0)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(1, 4, 4, 2)).astype(np.float32))
    idx = 10
    a_t = np.asarray(d.alphas)[idx]
    x_t = np.sqrt(a_t) * x0 + np.sqrt(1 - a_t) * eps
    x_prev = schedules.ddim_step(jnp.asarray(x_t), eps, idx, d)
    a_prev = np.asarray(d.alphas_prev)[idx]
    expect = np.sqrt(a_prev) * np.asarray(x0) + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x_prev), expect, rtol=1e-4, atol=1e-5)
