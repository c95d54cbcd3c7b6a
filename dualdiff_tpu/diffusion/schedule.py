"""DDPM noise schedule (training-time forward process).

TPU-native equivalent of the diffusers ``DDPMScheduler`` the reference trains
with (reference ``magicdrive/runner/base_runner.py:116-123`` loads the SD v1.5
scheduler config: scaled_linear betas 0.00085..0.012, 1000 steps, epsilon
prediction).  Pure ``jnp``; everything is shape-static and jit-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax.numpy as jnp

__all__ = ["DiffusionSchedule"]


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable container of the forward-process constants."""

    betas: jnp.ndarray  # (T,)
    alphas_cumprod: jnp.ndarray  # (T,)
    num_train_timesteps: int = 1000
    prediction_type: str = "epsilon"

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: Literal["linear", "scaled_linear"] = "scaled_linear",
        prediction_type: str = "epsilon",
    ) -> "DiffusionSchedule":
        if beta_schedule == "scaled_linear":
            betas = (
                jnp.linspace(
                    beta_start**0.5, beta_end**0.5, num_train_timesteps,
                    dtype=jnp.float64 if False else jnp.float32,
                )
                ** 2
            )
        elif beta_schedule == "linear":
            betas = jnp.linspace(
                beta_start, beta_end, num_train_timesteps, dtype=jnp.float32
            )
        else:
            raise ValueError(f"unknown beta schedule {beta_schedule}")
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        return cls(
            betas=betas,
            alphas_cumprod=alphas_cumprod,
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
        )

    # -- helpers ----------------------------------------------------------
    def _gather(self, arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """arr[t] broadcast against a tensor with ``ndim`` dims; t may have
        any leading shape that prefixes the target shape."""
        out = arr[t]
        while out.ndim < ndim:
            out = out[..., None]
        return out

    def sqrt_alpha_cumprod(self, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        return jnp.sqrt(self._gather(self.alphas_cumprod, t, ndim))

    def sqrt_one_minus_alpha_cumprod(self, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        return jnp.sqrt(1.0 - self._gather(self.alphas_cumprod, t, ndim))

    # -- forward process ---------------------------------------------------
    def add_noise(
        self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """q(x_t | x_0) sample.  ``t`` broadcasts over leading dims, so the
        reference's per-view timesteps (``train_with_same_t: false``,
        t shape (B, N_cam)) work without reshaping."""
        a = self.sqrt_alpha_cumprod(t, x0.ndim)
        s = self.sqrt_one_minus_alpha_cumprod(t, x0.ndim)
        return a * x0.astype(jnp.float32) + s * noise.astype(jnp.float32)

    def velocity(
        self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """v-prediction target (diffusers ``get_velocity``)."""
        a = self.sqrt_alpha_cumprod(t, x0.ndim)
        s = self.sqrt_one_minus_alpha_cumprod(t, x0.ndim)
        return a * noise.astype(jnp.float32) - s * x0.astype(jnp.float32)

    def training_target(
        self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "v_prediction":
            return self.velocity(x0, noise, t)
        raise ValueError(f"Unknown prediction type {self.prediction_type}")

    def pred_x0_from_eps(
        self, x_t: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        a = self.sqrt_alpha_cumprod(t, x_t.ndim)
        s = self.sqrt_one_minus_alpha_cumprod(t, x_t.ndim)
        return (x_t.astype(jnp.float32) - s * eps.astype(jnp.float32)) / a
