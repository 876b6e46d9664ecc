"""DDIM/DDPM noise schedule utilities, jit-friendly.

Rebuild of the diffusers DDIMScheduler functionality used by the reference
(reference: thre3d_atom/thre3d_reprs/sd.py:87-100,206-207,255-257): the
scaled-linear beta schedule, alphas_cumprod, `add_noise`, and the DDIM
sampling `step` (deterministic eta=0 and stochastic eta>0 variance). Everything
is precomputed into arrays so the whole schedule lives on-device and indexes
by traced timestep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DDIMScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        steps_offset: int = 1,
    ):
        self.num_train_timesteps = num_train_timesteps
        # the SD DDIMScheduler config ships steps_offset=1: inference
        # timesteps are [981, 961, ..., 1] rather than [980, ..., 0]
        self.steps_offset = steps_offset
        # "scaled_linear": betas linear in sqrt-space (the SD schedule)
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
        )
        alphas = 1.0 - betas
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas), dtype=jnp.float32)
        self.final_alpha_cumprod = jnp.asarray(1.0, dtype=jnp.float32)

    def add_noise(self, latents, noise, t):
        """q(x_t | x_0): sqrt(a_t) x0 + sqrt(1-a_t) eps. `t` may be traced."""
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise

    def step(self, noise_pred, t, t_prev, latents, eta: float = 0.0, key=None):
        """DDIM update x_t -> x_{t_prev}.

        eta=0 (the reference's sampling mode) is fully deterministic; eta>0
        adds the DDIM paper's sigma_t noise term (eta=1 recovers DDPM-like
        variance) and requires a PRNG `key`.
        """
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(
            t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], self.final_alpha_cumprod
        )
        x0_pred = (latents - jnp.sqrt(1.0 - a_t) * noise_pred) / jnp.sqrt(a_t)
        if eta > 0.0:
            assert key is not None, "stochastic DDIM (eta > 0) needs a PRNG key"
            # sigma_t = eta sqrt((1-a_prev)/(1-a_t)) sqrt(1 - a_t/a_prev)
            variance = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
            sigma = eta * jnp.sqrt(variance)
            dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * noise_pred
            noise = jax.random.normal(key, latents.shape, latents.dtype)
            return jnp.sqrt(a_prev) * x0_pred + dir_xt + sigma * noise
        dir_xt = jnp.sqrt(1.0 - a_prev) * noise_pred
        return jnp.sqrt(a_prev) * x0_pred + dir_xt

    def timesteps(self, num_inference_steps: int):
        """Evenly-spaced descending timesteps for sampling, shifted by
        steps_offset like the diffusers scheduler the checkpoints were tuned
        for (set_timesteps: ts = arange(N) * (T // N) + steps_offset)."""
        step = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(np.int64)
        ts = np.clip(ts + self.steps_offset, 0, self.num_train_timesteps - 1)
        return jnp.asarray(ts.astype(np.int32))
