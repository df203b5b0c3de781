"""Oracle T-F masks and sequence masking utilities.

Reference: `get_oracle_iam` / `get_oracle_ipsm`
(`/root/reference/av_speech_inpainting/audio_processing.py:167-184`) and the
`tf.sequence_mask` uses throughout models.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, maxlen: int, dtype=jnp.float32) -> jax.Array:
    """(B,) lengths -> (B, maxlen) 0/1 mask, like tf.sequence_mask."""
    pos = jnp.arange(maxlen)[None, :]
    return (pos < lengths[:, None]).astype(dtype)


def oracle_iam(target_stft: jax.Array, mixed_stft: jax.Array, clip_value: float = 10.0):
    """Ideal amplitude mask (audio_processing.py:167-173)."""
    iam = jnp.abs(target_stft) / jnp.abs(mixed_stft)
    return jnp.clip(iam, 0.0, clip_value).astype(jnp.float32)


def oracle_ipsm(
    target_stft: jax.Array,
    mixed_stft: jax.Array,
    min_clip_value: float = 0.0,
    max_clip_value: float = 10.0,
):
    """Ideal phase-sensitive mask (audio_processing.py:176-184)."""
    t_mag = jnp.abs(target_stft)
    m_mag = jnp.abs(mixed_stft)
    t_ang = jnp.angle(target_stft)
    m_ang = jnp.angle(mixed_stft)
    ipsm = t_mag * jnp.cos(m_ang - t_ang) / m_mag
    return jnp.clip(ipsm, min_clip_value, max_clip_value)
