"""EDM/Karras diffusion: preconditioning, schedules, samplers
(ref: Modules/diffusion/sampler.py).

Pure functions with explicit PRNG keys.  The denoise function is supplied by
the caller (a closure over the denoiser params + conditioning), so the whole
sampling loop jit-compiles into one XLA program; step counts are static and
the per-step randomness is derived with ``fold_in`` for reproducibility.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Sigma distributions (training)
# ---------------------------------------------------------------------------

def log_normal_sigmas(key, batch: int, mean: float = -3.0, std: float = 1.0) -> jnp.ndarray:
    """LogNormal sigma sampling (ref: sampler.py:24-33)."""
    return jnp.exp(mean + std * jax.random.normal(key, (batch,)))


def uniform_sigmas(key, batch: int) -> jnp.ndarray:
    return jax.random.uniform(key, (batch,))


# ---------------------------------------------------------------------------
# K-diffusion (EDM) preconditioning
# ---------------------------------------------------------------------------

def k_scale_weights(sigmas: jnp.ndarray, sigma_data) -> Tuple[jnp.ndarray, ...]:
    """(c_skip, c_out, c_in, c_noise) per Karras et al. (ref: sampler.py:184-191)."""
    c_noise = jnp.log(sigmas) * 0.25
    s = sigmas[:, None, None]
    c_skip = (sigma_data ** 2) / (s ** 2 + sigma_data ** 2)
    c_out = s * sigma_data * (sigma_data ** 2 + s ** 2) ** -0.5
    c_in = (s ** 2 + sigma_data ** 2) ** -0.5
    return c_skip, c_out, c_in, c_noise


def k_denoise_fn(net: Callable, sigma_data) -> Callable:
    """Wrap a raw network into the preconditioned denoiser
    ``x0_hat = c_skip*x + c_out*net(c_in*x, c_noise)`` (ref: sampler.py:193-208)."""

    def fn(x_noisy: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
        c_skip, c_out, c_in, c_noise = k_scale_weights(sigmas, sigma_data)
        x_pred = net(c_in * x_noisy, c_noise)
        return c_skip * x_noisy + c_out * x_pred

    return fn


def k_diffusion_loss(
    key,
    net: Callable,
    x: jnp.ndarray,                   # (B, 1, C) clean latents
    sigma_data,
    dist_mean: float = -3.0,
    dist_std: float = 1.0,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """EDM weighted denoising loss (ref: sampler.py:214-233)."""
    k_sig, k_noise = jax.random.split(key)
    sigmas = log_normal_sigmas(k_sig, x.shape[0], dist_mean, dist_std)
    if noise is None:
        noise = jax.random.normal(k_noise, x.shape)
    x_noisy = x + sigmas[:, None, None] * noise
    x_denoised = k_denoise_fn(net, sigma_data)(x_noisy, sigmas)
    losses = jnp.mean(jnp.square(x_denoised - x), axis=tuple(range(1, x.ndim)))
    weight = (sigmas ** 2 + sigma_data ** 2) * (sigmas * sigma_data) ** -2
    return jnp.mean(losses * weight)


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

def karras_schedule(num_steps: int, sigma_min: float = 1e-4, sigma_max: float = 3.0,
                    rho: float = 9.0) -> jnp.ndarray:
    """Karras et al. eq. 5, padded with a trailing 0 (ref: sampler.py:318-336)."""
    rho_inv = 1.0 / rho
    steps = jnp.arange(num_steps, dtype=jnp.float32)
    sigmas = (
        sigma_max ** rho_inv
        + (steps / (num_steps - 1)) * (sigma_min ** rho_inv - sigma_max ** rho_inv)
    ) ** rho
    return jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)])


def linear_schedule(num_steps: int) -> jnp.ndarray:
    return jnp.linspace(1.0, 0.0, num_steps + 1)[:-1]


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

def _batched(fn: Callable, x: jnp.ndarray, sigma) -> jnp.ndarray:
    sig = jnp.full((x.shape[0],), sigma, dtype=x.dtype)
    return fn(x, sig)


def adpm2_step(key, x: jnp.ndarray, fn: Callable, sigma, sigma_next,
               rho: float = 1.0) -> jnp.ndarray:
    """One DPM-2 ancestral step (ref: sampler.py:489-509)."""
    sigma_up = jnp.sqrt(sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2) / sigma ** 2)
    sigma_down = jnp.sqrt(sigma_next ** 2 - sigma_up ** 2)
    sigma_mid = ((sigma ** (1.0 / rho) + sigma_down ** (1.0 / rho)) / 2.0) ** rho

    d = (x - _batched(fn, x, sigma)) / sigma
    x_mid = x + d * (sigma_mid - sigma)
    d_mid = (x_mid - _batched(fn, x_mid, sigma_mid)) / sigma_mid
    x = x + d_mid * (sigma_down - sigma)
    return x + jax.random.normal(key, x.shape) * sigma_up


def adpm2_sample(key, noise: jnp.ndarray, fn: Callable, sigmas: jnp.ndarray,
                 num_steps: int, rho: float = 1.0, clamp: bool = True) -> jnp.ndarray:
    """ADPM2 sampling loop — the sampler training & demos use
    (ref: sampler.py:511-518, train_second.py:418-423).

    ``lax.scan`` over the step index: the two denoiser passes per step trace
    and compile ONCE instead of ``num_steps-1`` times (the steps share no
    fusion opportunity — each depends on the previous — so the scan costs
    nothing at runtime and cuts the dominant compile cost of every sampling
    graph by ~num_steps x)."""
    x = sigmas[0] * noise

    def body(x, inp):
        i, sigma, sigma_next = inp
        return adpm2_step(jax.random.fold_in(key, i), x, fn, sigma,
                          sigma_next, rho), None

    x, _ = jax.lax.scan(
        body, x, (jnp.arange(num_steps - 1), sigmas[: num_steps - 1],
                  sigmas[1:num_steps]))
    return jnp.clip(x, -1.0, 1.0) if clamp else x


def aeuler_step(key, x, fn, sigma, sigma_next):
    sigma_up = jnp.sqrt(sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2) / sigma ** 2)
    sigma_down = jnp.sqrt(sigma_next ** 2 - sigma_up ** 2)
    d = (x - _batched(fn, x, sigma)) / sigma
    x = x + d * (sigma_down - sigma)
    return x + jax.random.normal(key, x.shape) * sigma_up


def aeuler_sample(key, noise, fn, sigmas, num_steps, clamp: bool = True):
    x = sigmas[0] * noise

    def body(x, inp):
        i, sigma, sigma_next = inp
        return aeuler_step(jax.random.fold_in(key, i), x, fn, sigma,
                           sigma_next), None

    x, _ = jax.lax.scan(
        body, x, (jnp.arange(num_steps - 1), sigmas[: num_steps - 1],
                  sigmas[1:num_steps]))
    return jnp.clip(x, -1.0, 1.0) if clamp else x


def karras_sample(key, noise, fn, sigmas, num_steps,
                  s_tmin: float = 0.0, s_tmax: float = float("inf"),
                  s_churn: float = 0.0, s_noise: float = 1.0, clamp: bool = True):
    """Karras algorithm-2 heun sampler (ref: sampler.py:393-447)."""
    x = sigmas[0] * noise
    gamma_val = min(s_churn / num_steps, math.sqrt(2.0) - 1.0)
    for i in range(num_steps - 1):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        gamma = jnp.where((sigma >= s_tmin) & (sigma <= s_tmax), gamma_val, 0.0)
        sigma_hat = sigma + gamma * sigma
        eps = s_noise * jax.random.normal(jax.random.fold_in(key, i), x.shape)
        x_hat = x + jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0)) * eps
        d = (x_hat - _batched(fn, x_hat, sigma_hat)) / sigma_hat
        x_next = x_hat + (sigma_next - sigma_hat) * d
        # second-order correction for non-terminal steps
        def correct(xn):
            d_prime = (xn - _batched(fn, xn, sigma_next)) / sigma_next
            return x_hat + 0.5 * (sigma - sigma_hat) * (d + d_prime)
        x = jax.lax.cond(sigma_next != 0, correct, lambda xn: xn, x_next)
    return jnp.clip(x, -1.0, 1.0) if clamp else x


class SamplerConfig(NamedTuple):
    """Static sampling configuration (defaults = the reference's use sites)."""
    num_steps: int = 5
    sigma_min: float = 1e-4
    sigma_max: float = 3.0
    rho: float = 9.0          # schedule rho
    sampler_rho: float = 1.0  # ADPM2 rho
    clamp: bool = True


def sample_style(key, fn: Callable, noise: jnp.ndarray,
                 cfg: SamplerConfig = SamplerConfig()) -> jnp.ndarray:
    """KarrasSchedule + ADPM2 — the end-to-end style sampling entrypoint."""
    sigmas = karras_schedule(cfg.num_steps, cfg.sigma_min, cfg.sigma_max, cfg.rho)
    return adpm2_sample(key, noise, fn, sigmas, cfg.num_steps, cfg.sampler_rho, cfg.clamp)
