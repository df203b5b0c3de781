"""Phase reconstruction for the inpainted hole (jit-able Griffin-Lim).

The reference runs the C `lws` library per utterance on the host
(`/root/reference/av_speech_inpainting/inference.py:119,142-154`), blending:
keep the known-region phase (mask==1), fill the hole with the
LWS-estimated phase.  Here the same blend semantics are implemented as
Griffin-Lim iterations (iterative STFT <-> iSTFT projection) with the known
phase clamped every iteration — fully jittable, so the whole
model->reconstruction path is one compiled function and batches run on the
MXU (each iteration is two DFT matmuls) instead of a serial host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avsi.ops import stft as stft_ops


def griffin_lim_blend(
    mag: jax.Array,
    known_phase: jax.Array,
    known_mask: jax.Array,
    num_samples: int,
    n_iters: int = 50,
    frame_length: int = 384,
    frame_step: int = 192,
    fft_length: int = 512,
    momentum: float = 0.99,
) -> jax.Array:
    """Reconstruct a waveform from magnitudes with partially-known phase.

    mag/known_phase/known_mask: (B, T, F).  Wherever known_mask==1 the phase
    is held at known_phase; the hole phase is iterated (fast Griffin-Lim
    with momentum).  Returns (B, num_samples).
    """
    total = (mag.shape[-2] - 1) * frame_step + frame_length

    def istft_(re, im):
        return stft_ops.istft_real_imag(re, im, frame_length, frame_step, fft_length, total)

    def stft_(x):
        return stft_ops.stft_real_imag(x, frame_length, frame_step, fft_length)

    def project(phase):
        """One STFT->iSTFT consistency projection; returns new phase."""
        re = mag * jnp.cos(phase)
        im = mag * jnp.sin(phase)
        x = istft_(re, im)
        re2, im2 = stft_(x)
        re2, im2 = re2[..., : mag.shape[-2], : mag.shape[-1]], im2[..., : mag.shape[-2], : mag.shape[-1]]
        return jnp.arctan2(im2, re2)

    def body(carry, _):
        phase, prev = carry
        new = project(phase)
        # momentum acceleration (fast GL) applied on the unit circle
        accel = jnp.arctan2(
            jnp.sin(new) + momentum * (jnp.sin(new) - jnp.sin(prev)),
            jnp.cos(new) + momentum * (jnp.cos(new) - jnp.cos(prev)),
        )
        blended = known_mask * known_phase + (1 - known_mask) * accel
        return (blended, new), None

    init = known_mask * known_phase
    (phase, _), _ = jax.lax.scan(body, (init, init), None, length=n_iters)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    return istft_(re, im)[..., :num_samples]
