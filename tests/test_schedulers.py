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


def _coeffs_for_grid(solver, ts: np.ndarray, t_end: int):
    """StepCoeffs over an arbitrary descending integer-timestep grid, same
    construction as DPMSolverMultistep.step_coeffs but with a custom final
    target. The production linspace-to-0 grid is GEOMETRIC in lambda near
    t=0 (lambda ~ -log(t)/2), so the tail quadrature error never shrinks at
    order 2 — convergence-order measurements need a grid that stays in the
    smooth region."""
    from mixofshow_tpu.diffusion.dpm_solver import StepCoeffs
    n = len(ts)
    alpha = np.asarray(solver.alpha_t)
    sigma = np.asarray(solver.sigma_t)
    lam = np.asarray(solver.lambda_t)
    t_prev = np.concatenate([ts[1:], np.asarray([t_end], np.int32)])
    t_s1 = np.concatenate([ts[:1], ts[:-1]])
    h = lam[t_prev] - lam[ts]
    h0 = lam[ts] - lam[t_s1]
    r0 = np.where(np.arange(n) == 0, 1.0, h0 / np.where(h == 0, 1.0, h))
    return StepCoeffs(
        timestep=jnp.asarray(ts), alpha_s0=jnp.asarray(alpha[ts]),
        sigma_s0=jnp.asarray(sigma[ts]), alpha_t=jnp.asarray(alpha[t_prev]),
        sigma_t=jnp.asarray(sigma[t_prev]), h=jnp.asarray(h),
        r0=jnp.asarray(r0), use_order2=jnp.asarray(np.arange(n) >= 1))


def _run_time_varying_oracle(solver, num_steps, a=0.7, t_end=100,
                             force_order1=False):
    """Integrate the probability-flow ODE with a state-independent but
    time-varying x0 oracle g(lambda) = exp(a*lambda), from t=999 down to a
    smooth-region target t_end.

    The epsilon the model must emit so that to_x0 recovers g is
    eps(x, t) = (x - alpha_t g(lambda_t)) / sigma_t — it depends on the
    current sample, so integration error feeds back through the update
    exactly as with a real UNet, yet the true solution is closed-form:

        x(lam_T) = (sigma_T / sigma_s) x_s
                   + sigma_T [e^{(1+a)lam} / (1+a)]_{lam_s}^{lam_T}

    (exact-solution formula of DPM-Solver++, Lu et al. 2022 eq. (3.3);
    matches the reference's diffusers DPMSolverMultistepScheduler semantics,
    /root/reference/mixofshow/pipelines/pipeline_edlora.py:290).
    """
    import dataclasses
    ts = np.linspace(999, t_end + 1, num_steps).round().astype(np.int32)
    coeffs = _coeffs_for_grid(solver, ts, t_end)
    if force_order1:
        coeffs = dataclasses.replace(
            coeffs, use_order2=jnp.zeros_like(coeffs.use_order2))
    lam = np.asarray(solver.lambda_t, np.float64)
    alpha = np.asarray(solver.alpha_t, np.float64)
    sigma = np.asarray(solver.sigma_t, np.float64)

    x = jnp.full((4,), 1.3, jnp.float32)
    m_prev = jnp.zeros_like(x)
    x_start = 1.3
    for i in range(num_steps):
        t = int(ts[i])
        g = np.exp(a * lam[t])
        eps = (x - np.float32(alpha[t] * g)) / np.float32(sigma[t])
        x, m_prev = solver.step(x, m_prev, eps, coeffs, jnp.int32(i))

    lam_s, lam_T = lam[ts[0]], lam[t_end]
    antider = lambda l: np.exp((1 + a) * l) / (1 + a)
    exact = (sigma[t_end] / sigma[ts[0]]) * x_start \
        + sigma[t_end] * (antider(lam_T) - antider(lam_s))
    return float(np.abs(np.asarray(x, np.float64) - exact).max())


def test_dpm_solver_second_order_convergence():
    """Step-halving pins the 2M second-order math: global error must shrink
    ~4x when steps double (order 2). A perturbed r0 or a wrong 0.5*D1
    coefficient degrades the method to order 1 and fails the ratio bound
    (diffusion/dpm_solver.py:140-144)."""
    solver = DPMSolverMultistep.create()
    e40 = _run_time_varying_oracle(solver, 40)
    e80 = _run_time_varying_oracle(solver, 80)
    assert e80 > 1e-6, 'oracle too easy — error is at fp32 noise floor'
    ratio = e40 / e80
    assert ratio > 3.0, f'order-2 convergence broken: e40={e40}, e80={e80}, ' \
                        f'ratio={ratio:.2f} (expected ~4)'
    # the order-2 correction must actually beat order 1 at equal step count
    e40_o1 = _run_time_varying_oracle(solver, 40, force_order1=True)
    assert e40 < 0.25 * e40_o1, (
        f'2nd-order term not helping: order2 err {e40} vs order1 {e40_o1}')
    # order-1 run halves its error when steps double (sanity on the harness)
    e80_o1 = _run_time_varying_oracle(solver, 80, force_order1=True)
    o1_ratio = e40_o1 / e80_o1
    assert 1.5 < o1_ratio < 3.0, f'order-1 ratio {o1_ratio:.2f} (expected ~2)'


def test_dpm_solver_order_ramp():
    solver = DPMSolverMultistep.create()
    c = solver.step_coeffs(50)
    assert not bool(c.use_order2[0])
    assert bool(c.use_order2[1]) and bool(c.use_order2[-1])  # 50 >= 15: final stays order 2
    c10 = solver.step_coeffs(10)
    assert not bool(c10.use_order2[-1])  # lower_order_final under 15 steps
