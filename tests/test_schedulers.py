"""Scheduler numerics: DDPM forward process and DPM-Solver++(2M) sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixofshow_tpu.diffusion import DPMSolverMultistep, make_ddpm_schedule


def test_ddpm_tables_match_closed_form():
    sched = make_ddpm_schedule()
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-5)
    # endpoints sanity: t=0 nearly clean, t=999 nearly pure noise
    assert float(sched.sqrt_alphas_cumprod[0]) > 0.999
    assert float(sched.sqrt_alphas_cumprod[-1]) < 0.1


def test_ddpm_add_noise_and_velocity():
    sched = make_ddpm_schedule()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    t = jnp.array([10, 500])
    xt = sched.add_noise(x0, noise, t)
    a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
    s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(a * x0 + s * noise),
                               rtol=1e-5)
    v = sched.get_velocity(x0, noise, t)
    np.testing.assert_allclose(np.asarray(v), np.asarray(a * noise - s * x0),
                               rtol=1e-5)
    # identity: alpha*x_t - sigma*v == x0 exactly (fp32)
    np.testing.assert_allclose(np.asarray(a * xt - s * v), np.asarray(x0),
                               atol=1e-5)


def test_dpm_timesteps_linspace():
    solver = DPMSolverMultistep.create()
    ts = solver.timesteps(50)
    assert ts[0] == 999 and ts[-1] > 0 and len(ts) == 50
    assert np.all(np.diff(ts) < 0)
    np.testing.assert_array_equal(
        ts, np.linspace(0, 999, 51).round()[::-1][:-1].astype(np.int32))


@pytest.mark.parametrize('num_steps', [10, 50])
def test_dpm_solver_exact_for_constant_epsilon_oracle(num_steps):
    """With a constant-epsilon oracle, every DPM-Solver++ step is exact.

    If the model always returns eps, then x0_pred is constant (so the 2nd-order
    difference term vanishes) and each step maps alpha_s x0 + sigma_s eps to
    alpha_t x0 + sigma_t eps exactly. The loop must land on the t=0 point of
    the discrete schedule: alpha_0 x0 + sigma_0 eps (sigma_0 = sqrt(beta_0)).
    """
    solver = DPMSolverMultistep.create()
    key = jax.random.PRNGKey(42)
    x0 = jax.random.normal(key, (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))

    coeffs = solver.step_coeffs(num_steps)
    t0 = int(coeffs.timestep[0])
    sample = solver.alpha_t[t0] * x0 + solver.sigma_t[t0] * eps

    def body(carry, i):
        s, m_prev = carry
        new_s, m0 = solver.step(s, m_prev, eps, coeffs, i)
        return (new_s, m0), None

    (final, _), _ = jax.lax.scan(body, (sample, jnp.zeros_like(sample)),
                                 jnp.arange(num_steps))
    expected = solver.alpha_t[0] * x0 + solver.sigma_t[0] * eps
    np.testing.assert_allclose(np.asarray(final), np.asarray(expected),
                               atol=5e-4)
    # and the x0 prediction itself is recovered to fp32 accuracy
    m0 = solver.to_x0(eps, sample, coeffs.alpha_s0[0], coeffs.sigma_s0[0])
    np.testing.assert_allclose(np.asarray(m0), np.asarray(x0), atol=5e-4)


def test_dpm_solver_order_ramp():
    solver = DPMSolverMultistep.create()
    c = solver.step_coeffs(50)
    assert not bool(c.use_order2[0])
    assert bool(c.use_order2[1]) and bool(c.use_order2[-1])  # 50 >= 15: final stays order 2
    c10 = solver.step_coeffs(10)
    assert not bool(c10.use_order2[-1])  # lower_order_final under 15 steps
