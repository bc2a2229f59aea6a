"""Training-side DDPM noise schedule as a pure-JAX table.

TPU-native equivalent of the diffusers `DDPMScheduler` usage in the reference
trainer (reference: mixofshow/pipelines/trainer_edlora.py:50,218,243): the
only operations the training loop needs are `add_noise` (forward diffusion)
and `get_velocity` (v-prediction target). Both are elementwise gathers from a
precomputed alphas-cumprod table, so the whole scheduler is a frozen pytree of
two 1-D arrays that lives on device and fuses into the loss computation under
jit — no Python-side stepping state.
"""
from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Frozen forward-diffusion schedule.

    sqrt_alphas_cumprod / sqrt_one_minus_alphas_cumprod: (num_train_timesteps,)
    float32 tables indexed by integer timestep.
    """

    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray

    def add_noise(self, samples: jnp.ndarray, noise: jnp.ndarray,
                  timesteps: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(acp_t) * x_0 + sqrt(1 - acp_t) * eps.

        `timesteps` is an int array of shape (B,); broadcast over trailing dims.
        """
        shape = (-1,) + (1,) * (samples.ndim - 1)
        sqrt_acp = self.sqrt_alphas_cumprod[timesteps].reshape(shape)
        sqrt_omacp = self.sqrt_one_minus_alphas_cumprod[timesteps].reshape(shape)
        return (sqrt_acp * samples.astype(jnp.float32)
                + sqrt_omacp * noise.astype(jnp.float32)).astype(samples.dtype)

    def get_velocity(self, samples: jnp.ndarray, noise: jnp.ndarray,
                     timesteps: jnp.ndarray) -> jnp.ndarray:
        """v_t = sqrt(acp_t) * eps - sqrt(1 - acp_t) * x_0."""
        shape = (-1,) + (1,) * (samples.ndim - 1)
        sqrt_acp = self.sqrt_alphas_cumprod[timesteps].reshape(shape)
        sqrt_omacp = self.sqrt_one_minus_alphas_cumprod[timesteps].reshape(shape)
        return (sqrt_acp * noise.astype(jnp.float32)
                - sqrt_omacp * samples.astype(jnp.float32)).astype(samples.dtype)

    def target(self, samples: jnp.ndarray, noise: jnp.ndarray,
               timesteps: jnp.ndarray) -> jnp.ndarray:
        """Loss target per `prediction_type` (trainer_edlora.py:240-245)."""
        if self.prediction_type == 'epsilon':
            return noise
        if self.prediction_type == 'v_prediction':
            return self.get_velocity(samples, noise, timesteps)
        raise ValueError(f'Unknown prediction type {self.prediction_type}')


def make_betas(num_train_timesteps: int,
               beta_start: float,
               beta_end: float,
               beta_schedule: Literal['linear', 'scaled_linear']) -> jnp.ndarray:
    if beta_schedule == 'linear':
        return jnp.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=jnp.float32)
    if beta_schedule == 'scaled_linear':
        # SD 1.x default: linear in sqrt-beta space.
        return jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=jnp.float32) ** 2
    raise ValueError(f'Unknown beta schedule {beta_schedule}')


def make_ddpm_schedule(num_train_timesteps: int = 1000,
                       beta_start: float = 0.00085,
                       beta_end: float = 0.012,
                       beta_schedule: str = 'scaled_linear',
                       prediction_type: str = 'epsilon') -> DDPMSchedule:
    """Build the SD1.x training schedule (defaults match the SD1.5 config)."""
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    return DDPMSchedule(
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        betas=betas,
        alphas_cumprod=alphas_cumprod,
        sqrt_alphas_cumprod=jnp.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=jnp.sqrt(1.0 - alphas_cumprod),
    )
