"""Oracle T-F masks and sequence masking utilities.

Reference: `get_oracle_iam` / `get_oracle_ipsm`
(`/root/reference/av_speech_inpainting/audio_processing.py:167-184`) and the
`tf.sequence_mask` uses throughout models.py.

Deliberate deviation (reference-bug policy, SURVEY.md §7.3 #5): the
reference divides |target|/|mixed| with no guard, so frames where both
signals are digital silence (common at utterance edges) produce 0/0 = NaN,
which `clip` propagates into any loss trained against the mask.  Here the
division is guarded — a silent mixture frame yields mask 0 — and the
gradient is NaN-free (the `where` is applied to the denominator before the
divide, not after).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, maxlen: int, dtype=jnp.float32) -> jax.Array:
    """(B,) lengths -> (B, maxlen) 0/1 mask, like tf.sequence_mask."""
    pos = jnp.arange(maxlen)[None, :]
    return (pos < lengths[:, None]).astype(dtype)


def _safe_div(num: jax.Array, denom: jax.Array) -> jax.Array:
    """num/denom with 0 where denom == 0 (NaN-free in value and grad)."""
    nonzero = denom > 0
    safe = jnp.where(nonzero, denom, 1.0)
    return jnp.where(nonzero, num / safe, 0.0)


def oracle_iam(target_stft: jax.Array, mixed_stft: jax.Array, clip_value: float = 10.0):
    """Ideal amplitude mask (audio_processing.py:167-173)."""
    iam = _safe_div(jnp.abs(target_stft), jnp.abs(mixed_stft))
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
    ipsm = _safe_div(t_mag * jnp.cos(m_ang - t_ang), m_mag)
    return jnp.clip(ipsm, min_clip_value, max_clip_value)
