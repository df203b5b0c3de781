"""Phase reconstruction for the inpainted hole (jit-able Griffin-Lim).

The reference runs the C `lws` library per utterance on the host
(`/root/reference/av_speech_inpainting/inference.py:119,142-154`), blending:
keep the known-region phase (mask==1), fill the hole with the
LWS-estimated phase.  Here the same blend semantics are implemented as
Griffin-Lim iterations (iterative STFT <-> iSTFT projection) with the known
phase clamped every iteration — fully jittable, so the whole
model->reconstruction path is one compiled function and batches run on the
MXU (each iteration is two DFT matmuls) instead of a serial host loop.

The hole phase is initialized by phase-vocoder linear extrapolation from
the gap boundaries (`extrapolate_phase`) rather than zeros: each bin's
instantaneous per-hop phase advance is measured at the last known frame
pair and continued linearly across the gap from both sides (nearest
boundary wins).  For quasi-harmonic speech this starts GL close to the
consistent-phase manifold; measured phase-only (oracle magnitudes, 800 ms
gaps), extrapolate+30 iters beats zero-init+50 (STOI 0.975/PESQ 4.42 vs
0.971/4.37), and at equal 30 iters the gain is +0.008 STOI / +0.10 PESQ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avsi.ops import stft as stft_ops


def _princarg(x: jax.Array) -> jax.Array:
    """Wrap to the principal value (-pi, pi]."""
    return (x + jnp.pi) % (2 * jnp.pi) - jnp.pi


def extrapolate_phase(
    known_phase: jax.Array,
    known_mask: jax.Array,
    frame_step: int = 192,
    fft_length: int = 512,
) -> jax.Array:
    """Phase-vocoder linear extrapolation of phase into unknown bins.

    known_phase/known_mask: (B, T, F); mask==1 where the phase is trusted.
    Per bin, the instantaneous per-hop phase advance is measured at each
    known consecutive frame pair (unwrapped toward the bin's nominal
    advance 2*pi*k*hop/n_fft) and continued linearly into unknown frames
    from both the left and the right boundary; each unknown bin takes the
    extrapolation from its nearest known frame.  Known bins pass through
    unchanged.  Two T-step elementwise scans — negligible next to one GL
    iteration's DFT matmuls.
    """
    b, t, f = known_phase.shape
    omega = 2 * jnp.pi * jnp.arange(f) * frame_step / fft_length  # (F,)

    prev = jnp.concatenate([known_phase[:, :1], known_phase[:, :-1]], axis=1)
    adv = omega + _princarg(known_phase - prev - omega)  # (B,T,F)
    prev_known = jnp.concatenate([known_mask[:, :1], known_mask[:, :-1]], axis=1)
    adv_ok = known_mask * prev_known  # advance valid: both frames known
    # frame 0 has no genuine previous frame (prev above duplicates it, so
    # the "measured" advance there is ~0 mod 2pi, not the bin's hop
    # advance); without this a gap starting at frame 1 would be continued
    # with a frozen phase instead of the nominal advance
    adv_ok = adv_ok.at[:, 0].set(0.0)

    def step(sign):
        def body(carry, inp):
            ph, a, d = carry  # (B,F) each: phase, advance, dist-to-known
            p_t, k_t, adv_t, ok_t = inp
            a = jnp.where(ok_t > 0, adv_t, a)
            ph = jnp.where(k_t > 0, p_t, ph + sign * a)
            d = jnp.where(k_t > 0, 0.0, d + 1.0)
            return (ph, a, d), (ph, d)

        return body

    tm = lambda x: jnp.moveaxis(x, 1, 0)  # (B,T,F) -> (T,B,F)
    init_a = jnp.broadcast_to(omega, (b, f))
    # distance starts beyond any genuine in-sequence distance (< t), NOT at
    # 0: a hole touching the sequence edge has no known frame on that side,
    # and a 0-start would make its synthetic zero-phase anchor win the
    # nearest-boundary vote over the only genuine boundary on the other
    # side (leading/trailing gaps do occur — onset 0 is a legal draw)
    far = jnp.full((b, f), float(t + 1))

    # left-to-right: continue each bin forward past its last known frame
    (_, _, _), (left, d_left) = jax.lax.scan(
        step(+1.0), (known_phase[:, 0], init_a, far),
        (tm(known_phase), tm(known_mask), tm(adv), tm(adv_ok)),
    )
    # right-to-left: the advance into frame t is measured at (t, t+1)
    adv_b = omega + _princarg(
        jnp.concatenate([known_phase[:, 1:], known_phase[:, -1:]], axis=1)
        - known_phase - omega
    )
    next_known = jnp.concatenate([known_mask[:, 1:], known_mask[:, -1:]], axis=1)
    adv_b_ok = known_mask * next_known
    adv_b_ok = adv_b_ok.at[:, -1].set(0.0)  # mirror of the frame-0 guard
    rev = lambda x: tm(x)[::-1]
    (_, _, _), (right, d_right) = jax.lax.scan(
        step(-1.0), (known_phase[:, -1], init_a, far),
        (rev(known_phase), rev(known_mask), rev(adv_b), rev(adv_b_ok)),
    )
    left, d_left = tm(left), tm(d_left)  # back to (B,T,F); scans emit (T,B,F)
    right, d_right = tm(right)[:, ::-1], tm(d_right)[:, ::-1]

    filled = jnp.where(d_left <= d_right, left, right)
    return jnp.where(known_mask > 0, known_phase, filled)


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
    init: str = "extrapolate",
    hole_mag_relax: float = 0.0,
) -> jax.Array:
    """Reconstruct a waveform from magnitudes with partially-known phase.

    mag/known_phase/known_mask: (B, T, F).  Wherever known_mask==1 the phase
    is held at known_phase; the hole phase is iterated (fast Griffin-Lim
    with momentum) from `init` — "extrapolate" (phase-vocoder continuation
    from the gap boundaries, the default) or "zero".  Returns
    (B, num_samples).

    hole_mag_relax (0..1, default 0 = classic clamped GL): lets the HOLE
    magnitudes drift toward the consistency projection's magnitudes by a
    per-iteration factor — `m <- (1-r)*model_mag + r*|proj|` on hole bins —
    so the final synthesis uses a spectrogram that trades model-magnitude
    fidelity for STFT consistency.  Known-region magnitudes stay clamped.
    Opt-in (scripts/phase_study.py measures whether it pays).
    """
    total = (mag.shape[-2] - 1) * frame_step + frame_length

    def istft_(re, im):
        return stft_ops.istft_real_imag(re, im, frame_length, frame_step, fft_length, total)

    def stft_(x):
        return stft_ops.stft_real_imag(x, frame_length, frame_step, fft_length)

    def project(m, phase):
        """One STFT->iSTFT consistency projection; returns (phase, |proj|)."""
        re = m * jnp.cos(phase)
        im = m * jnp.sin(phase)
        x = istft_(re, im)
        re2, im2 = stft_(x)
        re2, im2 = re2[..., : mag.shape[-2], : mag.shape[-1]], im2[..., : mag.shape[-2], : mag.shape[-1]]
        return jnp.arctan2(im2, re2), jnp.sqrt(re2 * re2 + im2 * im2)

    relax = float(hole_mag_relax)

    def body(carry, _):
        phase, prev, m = carry
        new, proj_mag = project(m, phase)
        # momentum acceleration (fast GL) applied on the unit circle
        accel = jnp.arctan2(
            jnp.sin(new) + momentum * (jnp.sin(new) - jnp.sin(prev)),
            jnp.cos(new) + momentum * (jnp.cos(new) - jnp.cos(prev)),
        )
        blended = known_mask * known_phase + (1 - known_mask) * accel
        if relax:  # python-level: the relax==0 graph is untouched
            drift = (1.0 - relax) * mag + relax * proj_mag
            m = known_mask * mag + (1 - known_mask) * drift
        return (blended, new, m), None

    if init == "extrapolate":
        phase0 = extrapolate_phase(
            known_mask * known_phase, known_mask, frame_step, fft_length
        )
    elif init == "zero":
        phase0 = known_mask * known_phase
    else:
        raise ValueError(f"unknown phase init {init!r}")
    (phase, _, mag_f), _ = jax.lax.scan(
        body, (phase0, phase0, mag), None, length=n_iters
    )
    re = mag_f * jnp.cos(phase)
    im = mag_f * jnp.sin(phase)
    return istft_(re, im)[..., :num_samples]
