"""Additional diffusion formulations and samplers
(ref: Modules/diffusion/sampler.py:119-162, 236-295, 363-390, 520-543,
588-654).

The training path uses KDiffusion + ADPM2 (in ``sampler.py``); these variants
complete the reference's surface: VDiffusion / VKDiffusion objectives, the
VSampler, the VK sigma distribution, and the inpainting utilities
(DiffusionInpainter / SpanBySpanComposer).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .sampler import adpm2_step, karras_schedule


# ---------------------------------------------------------------------------
# V-diffusion
# ---------------------------------------------------------------------------

def v_alpha_beta(sigmas: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    angle = sigmas * (math.pi / 2.0)
    return jnp.cos(angle), jnp.sin(angle)


def v_diffusion_loss(key, net: Callable, x: jnp.ndarray,
                     noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """VDiffusion.forward (ref: sampler.py:145-162): uniform sigmas, predict
    the velocity target."""
    k_sig, k_noise = jax.random.split(key)
    sigmas = jax.random.uniform(k_sig, (x.shape[0],))
    sp = sigmas[:, None, None]
    if noise is None:
        noise = jax.random.normal(k_noise, x.shape)
    alpha, beta = v_alpha_beta(sp)
    x_noisy = x * alpha + noise * beta
    x_target = noise * alpha - x * beta
    return jnp.mean(jnp.square(net(x_noisy, sigmas) - x_target))


def v_sample(noise: jnp.ndarray, fn: Callable, sigmas: jnp.ndarray,
             num_steps: int) -> jnp.ndarray:
    """VSampler.forward (ref: sampler.py:363-390)."""
    x = sigmas[0] * noise
    alpha, beta = v_alpha_beta(sigmas[0])
    x_pred = x
    for i in range(num_steps - 1):
        sig = jnp.full((x.shape[0],), sigmas[i], x.dtype)
        x_denoised = fn(x, sig)
        x_pred = x * alpha - x_denoised * beta
        x_eps = x * beta + x_denoised * alpha
        alpha, beta = v_alpha_beta(sigmas[i + 1])
        x = x_pred * alpha + x_eps * beta
    return x_pred


# ---------------------------------------------------------------------------
# VK-diffusion
# ---------------------------------------------------------------------------

def vk_scale_weights(sigmas: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    s = sigmas[:, None, None]
    c_skip = 1.0 / (s ** 2 + 1.0)
    c_out = -s * (1.0 + s ** 2) ** -0.5
    c_in = (s ** 2 + 1.0) ** -0.5
    return c_skip, c_out, c_in


def vk_sigma_to_t(sigmas):
    return jnp.arctan(sigmas) / math.pi * 2.0


def vk_denoise_fn(net: Callable) -> Callable:
    def fn(x_noisy, sigmas):
        c_skip, c_out, c_in = vk_scale_weights(sigmas)
        x_pred = net(c_in * x_noisy, vk_sigma_to_t(sigmas))
        return c_skip * x_noisy + c_out * x_pred

    return fn


def vk_sigma_distribution(key, num_samples: int, sigma_data: float = 1.0,
                          min_value: float = 0.0,
                          max_value: float = float("inf")) -> jnp.ndarray:
    """VKDistribution (ref: sampler.py:41-59): inverse-tan-CDF transform of a
    *normal* draw — the reference uses ``torch.randn`` (not ``rand``) here, a
    quirk we mirror exactly for parity."""
    min_cdf = math.atan(min_value / sigma_data) * 2.0 / math.pi
    max_cdf = math.atan(max_value / sigma_data) * 2.0 / math.pi
    u = (max_cdf - min_cdf) * jax.random.normal(key, (num_samples,)) + min_cdf
    return jnp.tan(u * math.pi / 2.0) * sigma_data


def vk_diffusion_loss(key, net: Callable, x: jnp.ndarray,
                      sigma_data: float = 1.0,
                      noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """VKDiffusion.forward (ref: sampler.py:275-295) with the VK sigma
    distribution (ref: sampler.py:41-59)."""
    k_sig, k_noise = jax.random.split(key)
    sigmas = vk_sigma_distribution(k_sig, x.shape[0], sigma_data)
    sp = sigmas[:, None, None]
    if noise is None:
        noise = jax.random.normal(k_noise, x.shape)
    x_noisy = x + sp * noise
    c_skip, c_out, c_in = vk_scale_weights(sigmas)
    x_pred = net(c_in * x_noisy, vk_sigma_to_t(sigmas))
    v_target = (x - c_skip * x_noisy) / (c_out + 1e-7)
    return jnp.mean(jnp.square(x_pred - v_target))


# ---------------------------------------------------------------------------
# Inpainting (ref: sampler.py:520-543, 588-654)
# ---------------------------------------------------------------------------

def adpm2_inpaint(key, source: jnp.ndarray, mask: jnp.ndarray, fn: Callable,
                  sigmas: jnp.ndarray, num_steps: int,
                  num_resamples: int) -> jnp.ndarray:
    """ADPM2Sampler.inpaint: keep ``mask`` region from ``source``."""
    x = sigmas[0] * jax.random.normal(jax.random.fold_in(key, 0), source.shape)
    for i in range(num_steps - 1):
        src_noisy = source + sigmas[i] * jax.random.normal(
            jax.random.fold_in(key, 1000 + i), source.shape)
        for r in range(num_resamples):
            x = src_noisy * mask + x * (1 - mask)
            x = adpm2_step(jax.random.fold_in(key, i * 97 + r), x, fn,
                           sigmas[i], sigmas[i + 1])
            if r < num_resamples - 1:
                sig = jnp.sqrt(sigmas[i] ** 2 - sigmas[i + 1] ** 2)
                x = x + sig * jax.random.normal(
                    jax.random.fold_in(key, 5000 + i * 97 + r), x.shape)
    return source * mask + x * (1 - mask)


def span_by_span_compose(key, start: jnp.ndarray, fn: Callable,
                         sigmas: jnp.ndarray, num_steps: int,
                         num_resamples: int, num_spans: int,
                         keep_start: bool = False) -> jnp.ndarray:
    """SpanBySpanComposer: iteratively inpaint second halves to extend a
    sequence (ref: sampler.py:625-654)."""
    half = start.shape[2] // 2
    spans = [start[:, :, :half], start[:, :, half:]] if keep_start else []
    inpaint = jnp.concatenate(
        [start[:, :, half:], jnp.zeros_like(start[:, :, half:])], axis=2)
    mask = jnp.concatenate(
        [jnp.ones_like(start[:, :, :half]), jnp.zeros_like(start[:, :, half:])],
        axis=2)
    for i in range(num_spans):
        span = adpm2_inpaint(jax.random.fold_in(key, i), inpaint, mask, fn,
                             sigmas, num_steps, num_resamples)
        second = span[:, :, half:]
        inpaint = jnp.concatenate([second, jnp.zeros_like(second)], axis=2)
        spans.append(second)
    return jnp.concatenate(spans, axis=2)
