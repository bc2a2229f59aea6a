"""DPM-Solver++(2M) multistep sampler as pure-JAX precomputed tables + step fn.

TPU-native equivalent of the diffusers `DPMSolverMultistepScheduler` the
reference uses for all sampling (reference: train_edlora.py:182,
gradient_fusion.py:176, pipeline_edlora.py:290). Instead of a stateful Python
object stepped 50 times, everything data-dependent is precomputed into
per-step coefficient tables so the entire denoise loop compiles as a single
`lax.scan` with carry = (sample, previous model output).

Algorithm: DPM-Solver++ (Lu et al. 2022, arXiv:2211.01095), multistep variant,
order 2, "midpoint" correction, epsilon- or v-prediction models, matching the
reference's scheduler configuration (solver_order=2, algorithm dpmsolver++,
linspace timestep spacing, lower-order-final only below 15 steps).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mixofshow_tpu.diffusion.ddpm import make_betas


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepCoeffs:
    """Per-step scalar tables, each of shape (num_steps,). Used as scan xs."""
    timestep: jnp.ndarray       # int32 t fed to the UNet
    alpha_s0: jnp.ndarray       # sqrt(acp) at current t
    sigma_s0: jnp.ndarray       # sqrt(1-acp) at current t
    alpha_t: jnp.ndarray        # at the step target (prev) timestep
    sigma_t: jnp.ndarray
    h: jnp.ndarray              # lambda_t - lambda_s0
    r0: jnp.ndarray             # h0 / h where h0 = lambda_s0 - lambda_s1
    use_order2: jnp.ndarray     # bool: apply second-order correction


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DPMSolverMultistep:
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))
    alpha_t: jnp.ndarray  # (T,) sqrt(alphas_cumprod)
    sigma_t: jnp.ndarray  # (T,) sqrt(1 - alphas_cumprod)
    lambda_t: jnp.ndarray  # (T,) log(alpha/sigma)

    @staticmethod
    def create(num_train_timesteps: int = 1000,
               beta_start: float = 0.00085,
               beta_end: float = 0.012,
               beta_schedule: str = 'scaled_linear',
               prediction_type: str = 'epsilon') -> 'DPMSolverMultistep':
        betas = make_betas(num_train_timesteps, beta_start, beta_end,
                           beta_schedule)
        acp = jnp.cumprod(1.0 - betas)
        alpha = jnp.sqrt(acp)
        sigma = jnp.sqrt(1.0 - acp)
        return DPMSolverMultistep(
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
            alpha_t=alpha,
            sigma_t=sigma,
            lambda_t=jnp.log(alpha) - jnp.log(sigma),
        )

    # ------------------------------------------------------------------ setup
    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending sample timesteps ('linspace' spacing)."""
        ts = np.linspace(0, self.num_train_timesteps - 1,
                         num_inference_steps + 1).round()[::-1][:-1]
        return ts.astype(np.int32)

    def step_coeffs(self, num_inference_steps: int,
                    lower_order_final: bool = True) -> StepCoeffs:
        """Precompute every per-step scalar the scan body needs."""
        ts = self.timesteps(num_inference_steps)
        n = len(ts)
        alpha = np.asarray(self.alpha_t)
        sigma = np.asarray(self.sigma_t)
        lam = np.asarray(self.lambda_t)

        # Step target: next timestep in the list, 0 for the final step.
        t_prev = np.concatenate([ts[1:], np.zeros((1,), np.int32)])
        # Second-order lookback: the current-t of the previous step.
        t_s1 = np.concatenate([ts[:1], ts[:-1]])

        h = lam[t_prev] - lam[ts]
        h0 = lam[ts] - lam[t_s1]
        # r0 guarded against the dummy first step (h0 == 0 there).
        r0 = np.where(np.arange(n) == 0, 1.0, h0 / np.where(h == 0, 1.0, h))
        use_order2 = np.arange(n) >= 1  # order ramps 1 -> 2 after first step
        if lower_order_final and n < 15:
            use_order2[-1] = False  # diffusers' lower_order_final rule

        return StepCoeffs(
            timestep=jnp.asarray(ts),
            alpha_s0=jnp.asarray(alpha[ts]),
            sigma_s0=jnp.asarray(sigma[ts]),
            alpha_t=jnp.asarray(alpha[t_prev]),
            sigma_t=jnp.asarray(sigma[t_prev]),
            h=jnp.asarray(h),
            r0=jnp.asarray(r0),
            use_order2=jnp.asarray(use_order2),
        )

    # ------------------------------------------------------------------- step
    def to_x0(self, model_output: jnp.ndarray, sample: jnp.ndarray,
              alpha_s0: jnp.ndarray, sigma_s0: jnp.ndarray) -> jnp.ndarray:
        """Convert the model output to a data (x0) prediction (DPM-Solver++)."""
        if self.prediction_type == 'epsilon':
            return (sample - sigma_s0 * model_output) / alpha_s0
        if self.prediction_type == 'v_prediction':
            return alpha_s0 * sample - sigma_s0 * model_output
        raise ValueError(f'Unknown prediction type {self.prediction_type}')

    def step(self, sample: jnp.ndarray, m_prev: jnp.ndarray,
             model_output: jnp.ndarray, c: StepCoeffs,
             i: jnp.ndarray | None = None):
        """One DPM-Solver++(2M) update.

        Args:
          sample: current latent x_s0.
          m_prev: x0 prediction from the previous step (any value at step 0).
          model_output: raw UNet output at (sample, c.timestep[i]).
          c: either the full StepCoeffs (then `i` indexes into it) or a
             single-step slice (i=None), as produced inside `lax.scan`.
        Returns:
          (new_sample, m0) — m0 is this step's x0 prediction, to be carried.
        """
        get = (lambda a: a) if i is None else (lambda a: a[i])
        alpha_s0, sigma_s0 = get(c.alpha_s0), get(c.sigma_s0)
        alpha_t, sigma_t = get(c.alpha_t), get(c.sigma_t)
        h, r0, use2 = get(c.h), get(c.r0), get(c.use_order2)

        x = sample.astype(jnp.float32)
        m0 = self.to_x0(model_output.astype(jnp.float32), x, alpha_s0, sigma_s0)

        emh = jnp.expm1(-h)  # exp(-h) - 1
        first = (sigma_t / sigma_s0) * x - alpha_t * emh * m0
        d1 = (m0 - m_prev.astype(jnp.float32)) / r0
        second = first - 0.5 * alpha_t * emh * d1
        new_sample = jnp.where(use2, second, first).astype(sample.dtype)
        return new_sample, m0.astype(sample.dtype)

    def init_noise_sigma(self) -> float:
        """DPM-Solver++ operates on unscaled latents (scale_model_input = id)."""
        return 1.0
