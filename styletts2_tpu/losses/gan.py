"""GAN losses: LSGAN + feature matching + TPRLS relativistic median losses
(ref: losses.py:99-192).

The TPRLS losses select elements with the data-dependent predicate
``dr < dg + median(dr - dg)``; on TPU this becomes a masked mean (uniform
control flow, identical value).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

TAU = 0.04


def feature_loss(fmap_r: Sequence, fmap_g: Sequence) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            # f32 accumulation: fmaps may be bf16 under mixed precision
            loss = loss + jnp.mean(jnp.abs(rl - gl), dtype=jnp.float32)
    return loss * 2.0


def discriminator_loss(real_outputs: Sequence, generated_outputs: Sequence) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(real_outputs, generated_outputs):
        dr, dg = dr.astype(jnp.float32), dg.astype(jnp.float32)
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_loss(generated_outputs: Sequence) -> jnp.ndarray:
    loss = 0.0
    for dg in generated_outputs:
        loss = loss + jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
    return loss


def _tprls(dr: jnp.ndarray, dg: jnp.ndarray) -> jnp.ndarray:
    dr, dg = dr.astype(jnp.float32), dg.astype(jnp.float32)
    diff = dr - dg
    m_dg = jnp.median(diff)
    mask = dr < dg + m_dg
    sq = ((diff - m_dg) ** 2) * mask
    count = jnp.maximum(mask.sum(), 1)
    l_rel = sq.sum() / count
    return TAU - jnp.maximum(TAU - l_rel, 0.0)


def discriminator_tprls_loss(real_outputs: Sequence, generated_outputs: Sequence) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(real_outputs, generated_outputs):
        loss = loss + _tprls(dr, dg)
    return loss


def generator_tprls_loss(real_outputs: Sequence, generated_outputs: Sequence) -> jnp.ndarray:
    # ref swaps the zip order but computes the same statistic (losses.py:142-149)
    return discriminator_tprls_loss(real_outputs, generated_outputs)


def generator_loss_full(mpd_out, msd_out) -> jnp.ndarray:
    """GeneratorLoss.forward (ref: losses.py:151-170): LSGAN + FM + TPRLS over
    both discriminator families.  ``*_out`` are (y_d_rs, y_d_gs, fmap_rs,
    fmap_gs) tuples from the discriminator applies."""
    y_df_r, y_df_g, fmap_f_r, fmap_f_g = mpd_out
    y_ds_r, y_ds_g, fmap_s_r, fmap_s_g = msd_out
    loss = (
        generator_loss(y_df_g) + generator_loss(y_ds_g)
        + feature_loss(fmap_f_r, fmap_f_g) + feature_loss(fmap_s_r, fmap_s_g)
        + generator_tprls_loss(y_df_r, y_df_g) + generator_tprls_loss(y_ds_r, y_ds_g)
    )
    return loss


def discriminator_loss_full(mpd_out, msd_out) -> jnp.ndarray:
    """DiscriminatorLoss.forward (ref: losses.py:172-192)."""
    y_df_r, y_df_g, _, _ = mpd_out
    y_ds_r, y_ds_g, _, _ = msd_out
    return (
        discriminator_loss(y_df_r, y_df_g) + discriminator_loss(y_ds_r, y_ds_g)
        + discriminator_tprls_loss(y_df_r, y_df_g)
        + discriminator_tprls_loss(y_ds_r, y_ds_g)
    )
