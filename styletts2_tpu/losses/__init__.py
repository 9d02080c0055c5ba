from .stft_loss import multi_resolution_stft_loss
from .gan import (
    feature_loss,
    discriminator_loss,
    generator_loss,
    discriminator_tprls_loss,
    generator_tprls_loss,
    generator_loss_full,
    discriminator_loss_full,
)

__all__ = [
    "multi_resolution_stft_loss",
    "feature_loss",
    "discriminator_loss",
    "generator_loss",
    "discriminator_tprls_loss",
    "generator_tprls_loss",
    "generator_loss_full",
    "discriminator_loss_full",
]
