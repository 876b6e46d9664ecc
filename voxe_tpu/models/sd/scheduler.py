"""DDIM/DDPM noise schedule utilities, jit-friendly.

Rebuild of the diffusers DDIMScheduler functionality used by the reference
(reference: thre3d_atom/thre3d_reprs/sd.py:87-100,206-207,255-257): the
scaled-linear beta schedule, alphas_cumprod, `add_noise`, and the DDIM
sampling `step`. Everything is precomputed into arrays so the whole schedule
lives on-device and indexes by traced timestep.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class DDIMScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
    ):
        self.num_train_timesteps = num_train_timesteps
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

    def step(self, noise_pred, t, t_prev, latents, eta: float = 0.0):
        """Deterministic DDIM update x_t -> x_{t_prev}."""
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(
            t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], self.final_alpha_cumprod
        )
        x0_pred = (latents - jnp.sqrt(1.0 - a_t) * noise_pred) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev) * noise_pred
        return jnp.sqrt(a_prev) * x0_pred + dir_xt

    def timesteps(self, num_inference_steps: int):
        """Evenly-spaced descending timesteps for sampling."""
        step = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(np.int32)
        return jnp.asarray(ts.copy())
