"""Shared inference helpers: waveform reconstruction + per-sample losses.

Single implementation of the enhanced-waveform path (oracle phase /
masked phase / Griffin-Lim hole fill) parameterized by the MODEL's STFT
geometry from the registry — the BLSTM family is 24 ms/12 ms/512 while the
unet is 16 ms/8 ms/256, and hardcoding either breaks the other.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avsi.ops import passthrough as passthrough_ops
from avsi.ops import phase as phase_ops


def reconstruct_waveform(
    model, outputs: dict, batch: dict, config: dict, stats_j: tuple,
    oracle_phase: bool, phase_recon: str, gl_iters: int,
    gl_opts: dict | None = None,
) -> jax.Array:
    if oracle_phase or phase_recon == "none":
        return model.enhanced_sources(outputs, batch, config, stats_j, oracle_phase)
    mean, std = stats_j
    mag = jnp.exp(outputs["prediction"] * std + mean)
    known_phase = jnp.arctan2(outputs["stft_im"], outputs["stft_re"])
    masks = batch["masks"]
    # models whose feature dim drops the top bins (unet: 128 of 129) need
    # zero-padding back to the full bin count before reconstruction
    nbins = model.fft_length // 2 + 1
    pad = nbins - mag.shape[-1]
    if pad > 0:
        zp = ((0, 0), (0, 0), (0, pad))
        mag = jnp.pad(mag, zp)
        known_phase = jnp.pad(known_phase, zp)
        masks = jnp.pad(masks, zp, constant_values=1.0)
    return phase_ops.griffin_lim_blend(
        mag, known_phase, masks,
        num_samples=int(config["audio_len"]),
        n_iters=gl_iters,
        frame_length=model.frame_length,
        frame_step=model.frame_step,
        fft_length=model.fft_length,
        **(gl_opts or {}),
    )


def apply_passthrough(model, wav: jax.Array, batch: dict) -> jax.Array:
    """Opt-in deployment lever (`--passthrough`): keep the original samples
    on fully-known frames, the model's output inside gaps, raised-cosine
    crossfade confined to the known region (avsi/ops/passthrough.py — the
    waveform analogue of the composite prediction at models.py:1012).
    Reference-faithful full resynthesis stays the default."""
    return passthrough_ops.known_region_passthrough(
        wav, batch["target_sources"], batch["masks"], model.frame_step
    )


def per_sample_losses(outputs: dict, batch: dict) -> tuple[jax.Array, jax.Array]:
    """Per-sample (mean-all, hole) L1 losses — padded-batch-safe reporting."""
    masks = batch["masks"]
    diff = jnp.abs(outputs["target_spec_norm"] - outputs["prediction"])
    hole = jnp.sum(diff * (1 - masks), axis=(1, 2)) / jnp.maximum(
        jnp.sum(1 - masks, axis=(1, 2)), 1.0
    )
    total = jnp.mean(diff, axis=(1, 2))
    return total, hole
