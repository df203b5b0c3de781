"""Known-region waveform passthrough (opt-in deployment lever).

The reference's non-composite families — plain BLSTM (`models.py:128-138`),
`av-blstm-twosteps`, `unet` — resynthesize the ENTIRE utterance through
predicted magnitude + reconstructed phase, which caps PESQ below even the
masked baseline when intelligibility improves (BASELINE.md twosteps/unet
anchors).  This op is the waveform-domain analogue of the composite
prediction the ssnn/emb/ctc families apply in the spectrogram domain
(`models.py:1012`): keep the ORIGINAL samples wherever the frame is fully
known, use the model's output inside gaps, and join the two with a
raised-cosine crossfade that lives ENTIRELY in the known region — gap
samples are always 100% model output, so no ground-truth gap content can
leak into the result.

Reference-faithful full-resynthesis output stays the default everywhere;
`--passthrough` opts in (inference / inference_siasr / serve / streaming).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def passthrough_weight(
    frame_known: jax.Array,
    frame_step: int,
    num_samples: int,
    xfade: int | None = None,
) -> jax.Array:
    """Sample-level blend weight w in [0, 1]: 1 on every sample of a gap
    frame, 0 deep inside known regions, raised-cosine ramps of width
    2*xfade confined to the known side of each gap boundary.

    frame_known: (B, T) float, 1.0 where the frame is fully known.
    Returns (B, num_samples).
    """
    # None -> default half-frame crossfade; an explicit 0 means hard cut
    # (`if xfade else` would swallow 0 into the default)
    xfade = frame_step // 2 if xfade is None else int(xfade)
    gap = 1.0 - frame_known.astype(jnp.float32)  # (B, T)
    w = jnp.repeat(gap, frame_step, axis=1)  # (B, T*hop)
    n = w.shape[1]
    if n >= num_samples:
        w = w[:, :num_samples]
    else:
        # trailing samples beyond the last frame follow the last frame
        w = jnp.pad(w, ((0, 0), (0, num_samples - n)), mode="edge")
    if xfade <= 0:
        return w
    # 1) dilate the gap indicator by `xfade` samples on each side;
    # 2) smooth with a normalized Hann kernel of the same support.
    # The smoothing ramp of a step convolved with a (2L+1)-tap kernel spans
    # L samples on each side of the DILATED edge, i.e. exactly
    # [gap_edge, gap_edge + 2L] — w == 1 on every true gap sample and the
    # crossfade never reaches into the gap.
    width = 2 * xfade + 1
    dil = jax.lax.reduce_window(
        w, 0.0, jax.lax.max, (1, width), (1, 1), "SAME"
    )
    kern = np.hanning(width + 2)[1:-1]  # strictly positive taps
    kern = (kern / kern.sum()).astype(np.float32)
    # edge-REPLICATED pad before smoothing: a gap touching the utterance
    # edge stays w == 1 all the way to sample 0 / num_samples-1 (zero-pad
    # would drag it below 1 and blend ground truth into the gap there)
    dil = jnp.pad(dil, ((0, 0), (xfade, xfade)), mode="edge")
    out = jax.lax.conv_general_dilated(
        dil[:, None, :],
        jnp.asarray(kern)[None, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    # convolution of values in [0,1] with a sum-1 kernel stays in [0,1];
    # clip guards float round-off so gap samples are exactly 1
    return jnp.clip(out, 0.0, 1.0)


def passthrough_weight_np(
    frame_known: np.ndarray,
    frame_step: int,
    num_samples: int,
    xfade: int | None = None,
) -> np.ndarray:
    """Numpy twin of `passthrough_weight` for the streaming host path
    (one short segment per emitted chunk — no device round-trip).  The
    weight at sample t depends on the gap indicator within
    +-2*xfade = +-frame_step samples, so one frame of mask context on each
    side of an emitted chunk reproduces the whole-utterance weight exactly
    (asserted in tests/test_passthrough.py)."""
    xfade = frame_step // 2 if xfade is None else int(xfade)
    gap = 1.0 - np.asarray(frame_known, np.float32).reshape(-1)
    w = np.repeat(gap, frame_step)
    if len(w) >= num_samples:
        w = w[:num_samples]
    else:
        w = np.pad(w, (0, num_samples - len(w)), mode="edge")
    if xfade <= 0:
        return w
    width = 2 * xfade + 1
    padded = np.pad(w, (xfade, xfade), constant_values=0.0)
    dil = np.lib.stride_tricks.sliding_window_view(padded, width).max(axis=-1)
    kern = np.hanning(width + 2)[1:-1]
    kern = (kern / kern.sum()).astype(np.float32)
    out = np.convolve(np.pad(dil, (xfade, xfade), mode="edge"), kern,
                      mode="valid")
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def known_region_passthrough(
    enhanced: jax.Array,
    original: jax.Array,
    masks: jax.Array,
    frame_step: int,
    xfade: int | None = None,
) -> jax.Array:
    """Blend: original samples on fully-known frames, `enhanced` inside
    gaps, raised-cosine crossfade on the known side of each boundary.

    masks: (B, T, F) known-bin indicator (1=known).  A frame counts as
    known only when EVERY bin is known — on free-form T-F hole corpora a
    partially-corrupted frame keeps the model's output.
    """
    frame_known = jnp.min(masks, axis=-1)
    num = enhanced.shape[-1]
    w = passthrough_weight(frame_known, frame_step, num, xfade)
    orig = original.astype(enhanced.dtype)[:, :num]
    if orig.shape[-1] < num:
        orig = jnp.pad(orig, ((0, 0), (0, num - orig.shape[-1])))
    return orig * (1.0 - w) + enhanced * w
