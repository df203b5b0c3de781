"""Gap-attenuation postfilter (opt-in, `--gap_atten`).

Round-3 finding (gap_sweep_r3.json): at 1600 ms gaps the envelope-video
flagship hallucinates phone content — per_enhanced 0.587 > per_masked
0.559 — while STOI/PESQ improve massively.  The ctc-weight ladder
(ctc_ladder_r4.json) shrinks but does not close the inversion, and the
informative-video sweep (informative_gap_sweep_r4.json) shows video with
phonetic content eliminates it: the model is information-starved deep
inside long gaps, not mis-trained.

This postfilter acts on that diagnosis directly: the model is reliable
NEAR gap edges (acoustic context) and unreliable DEEP inside a long gap,
so attenuate the predicted magnitude as a function of the frame's
distance to the nearest known frame:

    depth <= trust           -> gain 1        (unchanged)
    trust < depth < trust+r  -> linear ramp
    depth >= trust + r       -> gain alpha

With the reference's single-intrusion protocol (dataset_generator.py:23,
n_max_intr=1) a 800 ms hole is ~67 frames deep at most (depth <= 34), so
`trust=34` leaves every gap size <= 800 ms bit-identical by construction;
only the deep interior of 1600 ms holes is touched.  Attenuation is
applied in normalized log-magnitude space on GAP bins only — known bins
(composite prediction, models.py:1012) are never scaled.

No reference counterpart (the reference ships the inversion); default off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.int32(1_000_000)


def gap_depth(frame_known: jax.Array) -> jax.Array:
    """(B, T) known indicator -> (B, T) int32 distance (in frames) to the
    nearest fully-known frame; 0 on known frames.  Utterance edges count
    as unknown, so a gap touching the edge is 'deep' from that side —
    conservative for a postfilter that suppresses unreliable content."""
    known = (frame_known > 0.5).T  # (T, B), scan over time

    def step(carry, k):
        d = jnp.where(k, 0, jnp.minimum(carry + 1, _BIG))
        return d, d

    init = jnp.full((known.shape[1],), _BIG, jnp.int32)
    _, fwd = jax.lax.scan(step, init, known)
    _, bwd = jax.lax.scan(step, init, known, reverse=True)
    return jnp.minimum(fwd, bwd).T


def gap_attenuation_gain(
    frame_known: jax.Array, alpha: float, trust: int = 34, ramp: int = 16
) -> jax.Array:
    """(B, T) per-frame amplitude gain in [alpha, 1]."""
    depth = gap_depth(frame_known).astype(jnp.float32)
    g = jnp.clip((depth - float(trust)) / float(max(ramp, 1)), 0.0, 1.0)
    return 1.0 - (1.0 - float(alpha)) * g


def causal_window_gain(
    win_known: jax.Array,
    left_dist: jax.Array,
    alpha: float,
    trust: int = 34,
    ramp: int = 16,
) -> jax.Array:
    """Gap-attenuation gain for one streaming LC window (B, W).

    The causal twin of `gap_attenuation_gain`: the LEFT gap-edge distance
    is exact (carried across windows as `left_dist` (B,) int32, the
    distance-since-last-known state after the frame preceding the
    window), and the RIGHT edge is visible only within the window's
    lookahead — beyond it the nearest known frame is assumed absent
    (reverse-scan init _BIG), so deep-gap frames whose gap END lies past
    the lookahead stay attenuated where the offline filter would already
    be ramping back up.  That error direction is deliberate: it only ever
    suppresses MORE of the content the r4 ladder proved harmful
    (atten_ladder_r4.json), never less, and vanishes whenever the gap end
    is within the lookahead.  At a whole-utterance window with
    left_dist=_BIG this equals `gap_attenuation_gain` exactly
    (tests/test_postfilter.py)."""
    known = (win_known > 0.5).T  # (W, B)

    def step(carry, k):
        d = jnp.where(k, 0, jnp.minimum(carry + 1, _BIG))
        return d, d

    _, fwd = jax.lax.scan(step, left_dist.astype(jnp.int32), known)
    init = jnp.full((known.shape[1],), _BIG, jnp.int32)
    _, bwd = jax.lax.scan(step, init, known, reverse=True)
    depth = jnp.minimum(fwd, bwd).T.astype(jnp.float32)
    g = jnp.clip((depth - float(trust)) / float(max(ramp, 1)), 0.0, 1.0)
    return 1.0 - (1.0 - float(alpha)) * g


def left_distances_np(frame_known):
    """Host-side causal left-distance ladder: (B, T) known -> (B, T) int32
    distance-since-last-known AFTER each frame (the `left_dist` carry a
    window starting at frame t+1 consumes).  Frame -1 counts as unknown
    (_BIG init), matching `gap_depth`'s utterance-edge convention."""
    import numpy as np

    fk = np.asarray(frame_known) > 0.5
    b, t = fk.shape
    out = np.empty((b, t), np.int32)
    d = np.full((b,), int(_BIG), np.int32)
    for i in range(t):
        d = np.where(fk[:, i], 0, np.minimum(d + 1, int(_BIG)))
        out[:, i] = d
    return out


def apply_gap_attenuation(
    outputs: dict, batch: dict, stats_j: tuple,
    alpha: float, trust: int = 34, ramp: int = 16,
) -> dict:
    """Scale the predicted magnitude by the per-frame gain on gap bins.

    `outputs["prediction"]` is normalized log-magnitude
    ((log mag - mean) / std), so an amplitude gain g is an additive
    log(g)/std shift; the (1 - masks) factor confines it to gap bins.
    alpha = 0 maps to a -120 dB floor (effective silence, finite logs)."""
    masks = batch["masks"]
    frame_known = jnp.min(masks, axis=-1)
    gain = gap_attenuation_gain(frame_known, alpha, trust, ramp)
    _, std = stats_j
    nbins = outputs["prediction"].shape[-1]
    delta = jnp.log(jnp.maximum(gain, 1e-6))[:, :, None] / std[None, None, :nbins]
    pred = outputs["prediction"] + delta * (1.0 - masks[:, :, :nbins])
    return dict(outputs, prediction=pred)
