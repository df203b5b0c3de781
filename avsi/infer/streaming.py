"""Streaming (latency-controlled) speech inpainting.

The reference has no streaming path at all — `inference.py:20-170` is batch
whole-utterance only, and its BLSTM is bidirectional, which naively requires
the full utterance before any output.  This module adds a real-time serving
mode using the standard latency-controlled BLSTM construction (LC-BLSTM,
Zhang & Glass 2016 / Xue & Yan 2017): audio arrives in C-frame chunks, each
chunk is processed over a window of C + L frames (L = lookahead), the
forward direction carries exact recurrent state across chunks, and the
backward direction runs zero-initialized over the limited window.
Algorithmic latency = (C + L) * 12 ms; the defaults (C=8, L=16) give 288 ms.

TPU mapping: ONE fixed-shape jitted step per window — normalization, the
ssnn running-average fold, the LC-BLSTM stack, the inpainting head,
magnitude denormalization AND the overlap-add resynthesis fuse into a
single device program (the same compiled program serves every window,
including the zero-padded flush windows); the per-stream recurrent state
(h, c per layer, ssnn running sums, the previous OLA frame) never leaves
the device.  One dispatch + one small fetch (C*192 samples) per window
matters: under a relayed host<->device link every extra round trip costs
more than the compute itself.

Semantics vs the offline path (`avsi/infer/inpaint.py`):
  * With a window covering the whole utterance (C >= T) the output equals
    the offline `phase_recon="none"` path exactly (tests/test_streaming.py).
  * With a short window the forward direction is still exact; only the
    backward context is truncated to L frames (the LC approximation).
  * Phase: masked phase (known-region phase, zero in the hole) — the
    streaming analogue of the reference's pre-LWS output, and the exact
    twin of the offline `phase_recon="none"` path.  `phase_fill=True`
    instead fills the hole by causal phase-vocoder extrapolation (the
    forward half of `avsi.ops.phase.extrapolate_phase`, zero added
    latency, carry on device) — measured NEGATIVE result, hence off by
    default: on the trained informative flagship the fill is sample-exact
    with the offline forward-only extrapolation (STOI 0.8832 == 0.8832 at
    a whole-utterance window) yet LOSES to masked phase (0.8945) at
    gl_iters=0; extrapolation pays only as a Griffin-Lim INIT
    (offline gl10: 0.9046 extrapolate-init vs 0.8942 zero-init), and GL
    over a chunk window sees too little context to help.  Use the offline
    path when phase reconstruction matters.
  * SSNN speaker embeddings are estimated causally: the masked average
    (models.py:800-842, +1 denominator) accumulates a frame once its delta
    features are final (2 frames after arrival; exact at flush) and it is
    visible to the window being processed, instead of over the whole
    utterance at once — a deterministic function of the window sequence,
    independent of push sizing.  Delta edge handling (replicate-clamp,
    matching the reference's iterative SYMMETRIC re-pad —
    audio_processing.py:85-94) is exact at the stream start and at flush.
  * Video features must be supplied already at frame rate (one 136-vector
    per 12 ms frame); the offline 75->250 interpolation (`avsync.py`) is a
    whole-utterance operation a live caller performs upstream.

Supported models: the BLSTM family (a/v/av x {-, ssnn, emb} x {-, ctc}).
With `transcript=True` on a -ctc model the window program also evaluates
the ASR head over every emitted chunk and the class maintains an
incremental greedy CTC decode (argmax -> collapse repeats -> drop blanks,
with the collapse state carried across chunk boundaries), so the live
path emits audio AND transcripts at the same 288 ms-class latency.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from avsi.models import blstm as blstm_lib
from avsi.models import core
from avsi.ops import pallas_lstm
from avsi.ops import passthrough as passthrough_ops
from avsi.ops import postfilter as postfilter_ops
from avsi.ops import stft as stft_ops
from avsi.ops.phase import _princarg

FRAME_LENGTH = blstm_lib.FRAME_LENGTH  # 384
FRAME_STEP = blstm_lib.FRAME_STEP  # 192
FFT_LENGTH = blstm_lib.FFT_LENGTH  # 512
_DELTA_N = 2  # delta(N=2): a frame's delta needs frames t-2 .. t+2
_WINDOW_FN = stft_ops.hann_window(FRAME_LENGTH).astype(np.float32)


def _cut_frames(buf: np.ndarray, n: int) -> np.ndarray:
    """First n hop-aligned analysis frames of a sample buffer."""
    return np.stack(
        [buf[i * FRAME_STEP : i * FRAME_STEP + FRAME_LENGTH] for i in range(n)]
    )


def _lc_bilstm_layer(params, x, carry_h, carry_c, emit, compute_dtype,
                     gate_dtype=None):
    """One LC-BLSTM layer over a (B, W, D) window.

    Forward direction starts from the carried state; backward direction is
    zero-initialized at frame W-1 (the lookahead truncation).  Returns the
    full-window output and the forward state after frame `emit - 1`, the
    carry for the next window (whose frame 0 is this window's frame
    `emit`).  Layout matches `core.bilstm_layer` (direction axis folded
    into the batched recurrent matmul)."""
    if gate_dtype is None:  # follows compute dtype (core.blstm_stack rule)
        gate_dtype = compute_dtype
    xc = x.astype(compute_dtype)
    x2 = jnp.stack([xc, jnp.flip(xc, axis=1)], axis=0)  # (2, B, W, D)
    wx = params["wx"].astype(compute_dtype)
    wh = params["wh"].astype(compute_dtype)
    bias = params["b"].astype(jnp.float32)
    # stored at compute dtype like core.bilstm_layer / core._lc_layer_pair:
    # under bf16 the trained function's gates see bf16-rounded xw, so the
    # served function must quantize identically (train == serve exactness)
    xw = (
        jnp.einsum("dbti,dig->dbtg", x2, wx, preferred_element_type=jnp.float32)
        + bias[:, None, None, :]
    ).astype(compute_dtype)
    xw_t = jnp.moveaxis(xw, 2, 0)  # (W, 2, B, 4H)

    h0 = jnp.stack([carry_h, jnp.zeros_like(carry_h)], axis=0)
    c0 = jnp.stack([carry_c, jnp.zeros_like(carry_c)], axis=0)

    def cell(carry, xw_step):
        (new_h, new_c), _ = core._lstm_cell(
            carry, xw_step, wh, gate_dtype=gate_dtype
        )
        return (new_h, new_c), (new_h, new_c)

    _, (hs, cs) = jax.lax.scan(jax.checkpoint(cell), (h0, c0), xw_t)
    fwd = jnp.moveaxis(hs[:, 0], 0, 1)  # (B, W, H)
    bwd = jnp.flip(jnp.moveaxis(hs[:, 1], 0, 1), axis=1)
    out = jnp.concatenate([fwd, bwd], axis=-1).astype(x.dtype)
    return out, hs[emit - 1, 0], cs[emit - 1, 0]


def _layer_list(params: dict, spec, int_layer: int):
    """Flatten the (blstm | blstm1+blstm2) param layout into
    (layer_params, inject_embedding_before) pairs, mirroring
    `blstm.forward`'s integration_layer handling."""
    if "blstm" in params:
        inject_first = spec.conditioning is not None and int_layer == 0
        return [(p, inject_first and i == 0) for i, p in enumerate(params["blstm"])]
    out = [(p, False) for p in params["blstm1"]]
    out += [(p, i == 0) for i, p in enumerate(params["blstm2"])]
    return out


def _ssnn_update(params, deltas, mask, n_valid, ssnn_sum, ssnn_cnt):
    """Fold <= W finalized frames into the masked running sums
    (models.py:800-842; the +1 mean denominator is applied at read).
    Pure in params + arrays — one jitted program serves every stream."""
    h = core.dense(params["ssnn"][0], deltas)
    h = jax.nn.leaky_relu(h, 0.3)
    h = core.dense(params["ssnn"][1], h)
    h = jax.nn.leaky_relu(h, 0.3)
    h = core.dense(params["ssnn"][2], h)  # (1, W, 200)
    pos = jnp.arange(h.shape[1], dtype=jnp.float32)[None, :]
    fm = mask * (pos < n_valid).astype(jnp.float32)
    return (
        ssnn_sum + (h * fm[:, :, None]).sum(axis=1),
        ssnn_cnt + fm.sum(axis=1),
    )


_SSNN_STEP = jax.jit(_ssnn_update)


def resolve_window(config: dict, chunk_frames, lookahead_frames) -> tuple[int, int]:
    """Resolve (chunk, lookahead): None defaults to the model's TRAINED
    window when the config carries lc_chunk/lc_lookahead — serving an
    LC-trained model at its training latency is the train==serve
    contract — and to the 288 ms C=8/L=16 defaults otherwise.  Shared by
    every streaming entry point (single stream, lockstep fleet, HTTP)."""
    lc_c = int(config.get("lc_chunk", 0) or 0)
    if chunk_frames is None:
        chunk_frames = lc_c if lc_c > 0 else 8
    if lookahead_frames is None:
        lookahead_frames = (
            int(config.get("lc_lookahead", 0) or 0) if lc_c > 0 else 16
        )
    chunk, look = int(chunk_frames), int(lookahead_frames)
    if chunk < 1:
        raise ValueError(f"chunk_frames must be >= 1, got {chunk_frames}")
    if look < 0:
        raise ValueError(f"lookahead_frames must be >= 0, got {lookahead_frames}")
    return chunk, look


def resolve_stream_impl(
    requested: str | None, gate_dtype=None, mesh=None
) -> str:
    """Streaming's own `lstm_impl` policy, distinct from the full-sequence
    `pallas_lstm.resolve_impl` (callers must pass the USER'S raw request,
    never a bundle-resolved config value).

    "auto" picks the fused LC window kernel
    (`pallas_lstm.lc_bilstm_window_pallas`) exactly where it is measured
    faster AND serves the trained function bit-for-bit: a TPU backend
    with f32 gates (window-shape device timing, scripts/stream_impl_ab.py
    -> lc_pallas_r4.json re-measured r5: 0.094 -> 0.055 ms/window at
    B=16, 0.272 -> 0.244 at B=128).  It falls back to the scan under
    bf16-gate configs — in-kernel gates are always f32 (they never leave
    VMEM), so under bf16 gates the kernel deviates ~bf16-roundoff/step
    from the scan-trained function, and auto never trades train==serve
    quantization for speed (explicit "pallas" may, documented).  Fleet
    meshes ride the kernel too via shard_map over the `data` axis
    (`pallas_lstm.lc_window_pallas_sharded`); tensor-parallel meshes keep
    the scan (the kernel wants whole params — explicit "pallas" is
    refused there)."""
    import jax.numpy as _jnp

    req = (requested or "scan").lower()
    tp = (
        mesh is not None
        and "model" in getattr(mesh, "axis_names", ())
        and mesh.shape["model"] > 1
    )
    if req == "scan":
        return "scan"
    bf16_gates = gate_dtype is not None and (
        _jnp.dtype(gate_dtype) == _jnp.dtype(_jnp.bfloat16)
    )
    if req == "auto":
        if jax.default_backend() == "tpu" and not bf16_gates and not tp:
            return "pallas"
        return "scan"
    if req == "pallas":
        if tp:
            raise ValueError(
                "lstm_impl='pallas' needs whole parameters; tensor-parallel "
                "fleet meshes keep lstm_impl='scan'"
            )
        return "pallas"
    raise ValueError(f"unknown lstm_impl {requested!r} "
                     "(expected auto/scan/pallas)")


def _norm_gap_atten(gap_atten) -> tuple | None:
    """Validate/normalize a gap-atten request to (alpha, trust, ramp) —
    the hashable static form the program cache keys on — or None (off,
    incl. alpha >= 1, the CLI's 'disabled' convention)."""
    if not gap_atten:
        return None
    alpha = float(gap_atten["alpha"])
    if alpha >= 1.0:
        return None
    if not 0.0 <= alpha:
        raise ValueError(f"gap_atten alpha must be in [0, 1), got {alpha}")
    return (alpha, int(gap_atten.get("trust", 34)),
            int(gap_atten.get("ramp", 16)))


def ctc_blank_id(params) -> int:
    """Blank label = last output of the ASR head (the reference trains CTC
    with blank as the extra final class; config.py adds the +1)."""
    return int(params["head_asr"]["b"].shape[0]) - 1


def greedy_collapse(ids, blank: int, prev: int, out: list) -> int:
    """Incremental greedy CTC collapse: append each non-blank, non-repeat
    label in `ids` to `out`; return the new collapse state (the last raw
    label), so chains of calls across chunk boundaries decode identically
    to one offline pass.  The single source of truth for every streaming
    decode path (per-stream, flush, lockstep fleet)."""
    for label in ids:
        label = int(label)
        if label != blank and label != prev:
            out.append(label)
        prev = label
    return prev


class _ProgSpec:
    """The static inputs of the jitted window program — a deliberately
    small object so the compiled step (which outlives any one stream via
    the program cache) pins only these fields, never a whole
    StreamingInpainter with its live buffers."""

    __slots__ = ("spec", "int_layer", "chunk", "compute_dtype", "gate_dtype",
                 "stats", "transcript", "phase_fill", "lstm_impl",
                 "gap_atten", "mesh")

    def __init__(self, spec, int_layer, chunk, compute_dtype, stats,
                 transcript=False, gate_dtype=None, phase_fill=False,
                 lstm_impl="scan", gap_atten=None, mesh=None):
        self.spec = spec
        self.int_layer = int_layer
        self.chunk = chunk
        self.compute_dtype = compute_dtype
        # None follows compute_dtype (core.blstm_stack convention) — a
        # config gate_dtype override must reach the served function too
        self.gate_dtype = compute_dtype if gate_dtype is None else gate_dtype
        self.stats = stats
        self.transcript = transcript  # also emit CTC argmax ids per chunk
        self.phase_fill = phase_fill  # causal hole-phase extrapolation
        self.lstm_impl = lstm_impl  # "scan" | "pallas" (LC window kernel)
        # None or (alpha, trust, ramp): causal deep-gap attenuation; the
        # window input then carries a "gap_ld" (B,) left-distance plane
        self.gap_atten = gap_atten
        # fleet mesh (lockstep only): with lstm_impl="pallas" the window
        # kernel partitions over its data axis via shard_map
        self.mesh = mesh


def _causal_fill(phase, known, carry):
    """Causal hole-phase extrapolation over one chunk of frames — the
    forward half of `avsi.ops.phase.extrapolate_phase`, with the scan carry
    exposed so it composes exactly across window boundaries.

    phase: (B, C, F) masked phase (true where known, anything in the hole);
    known: (B, C) 1 = frame intact; carry: (last output phase (B, F),
    per-bin advance (B, F), last frame knownness (B,)).  Returns the filled
    (B, C, F) phase and the new (advance, knownness) carry — the new last
    phase is the filled chunk's final frame, which the caller already
    keeps as the OLA left context."""
    f = phase.shape[-1]
    omega = 2 * jnp.pi * jnp.arange(f) * FRAME_STEP / FFT_LENGTH

    def fill_cell(c, inp):
        ph_prev, adv, pk = c
        ph_t, k_t = inp
        both = (k_t * pk)[:, None]
        adv = jnp.where(both > 0, omega + _princarg(ph_t - ph_prev - omega), adv)
        ph_out = jnp.where(k_t[:, None] > 0, ph_t, ph_prev + adv)
        return (ph_out, adv, k_t), ph_out

    (_, adv, pk), ph_f = jax.lax.scan(
        fill_cell, carry, (jnp.moveaxis(phase, 1, 0), known.T)
    )
    return jnp.moveaxis(ph_f, 0, 1), (adv, pk)


def _window_step(prog, params, window, carries, prev, ssnn_sum, ssnn_cnt):
    """Jitted: one LC window -> emitted samples + chunk mag/phase + new
    recurrent state, all in one device program (one dispatch, one small
    fetch per window).

    window: spec_norm/re/im (1, W, af), mask (1, W), video (1, W, vf),
    plus — for ssnn models — the fused running-average fold inputs
    ssnn_feats (1, W, 2*af), ssnn_mask (1, W), ssnn_n (scalar)."""
    spec = prog.spec
    mask_bins = window["mask"][:, :, None]  # broadcast over the 257 bins
    spec_norm = window["spec_norm"]
    audio_feat = spec_norm * mask_bins

    emb = None
    if spec.conditioning == "ssnn":
        ssnn_sum, ssnn_cnt = _ssnn_update(
            params, window["ssnn_feats"], window["ssnn_mask"],
            window["ssnn_n"], ssnn_sum, ssnn_cnt,
        )
        emb = ssnn_sum / (ssnn_cnt + 1.0)[:, None]
    elif spec.conditioning == "emb":
        emb = window["embedding"]

    if spec.input_type == "a":
        net_in = audio_feat
    elif spec.input_type == "v":
        net_in = window["video"]
    else:
        net_in = jnp.concatenate([audio_feat, window["video"]], axis=2)

    layers = _layer_list(params, spec, prog.int_layer)
    x = net_in
    new_carries = []
    for (layer_params, inject), (ch, cc) in zip(layers, carries):
        if inject and emb is not None:
            tiled = jnp.broadcast_to(
                emb[:, None, :], (x.shape[0], x.shape[1], emb.shape[-1])
            )
            x = jnp.concatenate([x, tiled], axis=2)
        if prog.lstm_impl == "pallas":
            if prog.mesh is not None:
                x, nh, nc = pallas_lstm.lc_window_pallas_sharded(
                    layer_params, x, ch, cc, prog.chunk, prog.mesh,
                    prog.compute_dtype,
                )
            else:
                x, nh, nc = pallas_lstm.lc_bilstm_window_pallas(
                    layer_params, x, ch, cc, prog.chunk, prog.compute_dtype
                )
        else:
            x, nh, nc = _lc_bilstm_layer(
                layer_params, x, ch, cc, prog.chunk, prog.compute_dtype,
                prog.gate_dtype,
            )
        new_carries.append((nh, nc))

    # incremental transcripts: CTC argmax over the emitted chunk frames
    # (models.py:1599-1604's dual head carried into the live path; the
    # repeat/blank collapse is incremental host state, _CtcCollapse)
    if prog.transcript:
        asr_logits = core.dense(params["head_asr"], x[:, : prog.chunk]).astype(
            jnp.float32
        )
        ids = jnp.argmax(asr_logits, axis=-1).astype(jnp.int32)  # (B, C)
    else:
        ids = jnp.zeros((x.shape[0], 0), jnp.int32)

    # only the emitted chunk is consumed downstream — with C=8/L=16 running
    # the head/blend/exp over the full window wasted 2/3 of that work
    x_emit = x[:, : prog.chunk]
    sn_emit = spec_norm[:, : prog.chunk]
    m_emit = mask_bins[:, : prog.chunk]
    inference = core.dense(params["head_ipt"], x_emit).astype(jnp.float32)
    if spec.restore_unmasked:
        prediction = sn_emit * m_emit + inference * (1 - m_emit)
    else:
        prediction = inference

    mean, std = prog.stats
    if prog.gap_atten is not None:
        # causal deep-gap attenuation (ops/postfilter.py): exact left
        # distance carried by the host ("gap_ld"), right edge visible
        # within the lookahead; additive log(gain)/std on GAP bins only —
        # the streaming twin of apply_gap_attenuation.  Rows past the real
        # stream ("gap_valid": flush-window fill rows, lockstep pad
        # frames) count as UNKNOWN for depth — the offline gap_depth edge
        # convention — else their known-fill would fake a gap-terminating
        # edge and un-attenuate the tail of an end-of-utterance gap
        # (r5 review finding).
        alpha, trust, ramp = prog.gap_atten
        w_len = window["mask"].shape[1]
        known = window["mask"] * (
            jnp.arange(w_len) < window["gap_valid"]
        )[None, :]
        gain = postfilter_ops.causal_window_gain(
            known, window["gap_ld"], alpha, trust, ramp
        )[:, : prog.chunk]
        nb = prediction.shape[-1]
        delta = jnp.log(jnp.maximum(gain, 1e-6))[:, :, None] / std[None, None, :nb]
        prediction = prediction + delta * (1.0 - m_emit)
    mag = jnp.exp(prediction * std + mean)  # (B, C, af)
    re = window["re"][:, : prog.chunk]
    im = window["im"][:, : prog.chunk]
    phase = jnp.arctan2(im * m_emit, re * m_emit)  # masked phase: 0 in the hole

    # fused OLA: resynthesize [prev_frame, chunk frames] on device and
    # return only the samples the chunk finalizes.  Batch-generic: the
    # same program serves one live stream (B=1) or a lockstep fleet.
    # prev also carries the causal phase-extrapolation state: the last
    # emitted frame's (filled) phase doubles as the extrapolation anchor.
    prev_mag, prev_phase, ph_adv, prev_known = prev  # (B,af)x3 + (B,)
    if prog.phase_fill:
        k_emit = window["mask"][:, : prog.chunk]  # (B, C)
        phase, (ph_adv, prev_known) = _causal_fill(
            phase, k_emit, (prev_phase, ph_adv, prev_known)
        )
    frames_mag = jnp.concatenate([prev_mag[:, None], mag], axis=1)
    frames_ph = jnp.concatenate([prev_phase[:, None], phase], axis=1)
    wav = stft_ops.waveform_from_mag_phase(
        frames_mag,
        frames_ph,
        num_samples=prog.chunk * FRAME_STEP + FRAME_LENGTH,
        frame_length=FRAME_LENGTH,
        frame_step=FRAME_STEP,
        fft_length=FFT_LENGTH,
    )[:, FRAME_STEP : FRAME_STEP + prog.chunk * FRAME_STEP]
    new_prev = (mag[:, -1], phase[:, -1], ph_adv, prev_known)
    return wav, mag, phase, new_carries, new_prev, ssnn_sum, ssnn_cnt, ids


_EXT_CTX = 4  # left-context frames in a raw window (the fold's delta +-2)


def _window_step_raw(prog, params, raw, carries, prev, ssnn_sum, ssnn_cnt):
    """Raw-sample window step: the STFT -> log -> normalize front-end (and,
    for ssnn, the fold's delta features) run IN-GRAPH via the matmul-DFT
    ops, so the host ships raw samples instead of f32 feature tensors —
    ~6x fewer bytes per window, the lever that matters when many lockstep
    streams share one link.

    raw: samples (B, (EXT+W-1)*192+384) covering frames [t0-EXT, t0+W),
    mask_ext (B, EXT+W), video (B, W, vf), optional embedding (B, E),
    t_valid (scalar: first window-relative frame past the stream — rows
    beyond it are zeroed so tail windows see the same zero-FEATURE padding
    the single-stream class uses, not silence features from zero samples);
    ssnn scalars (window-relative frame indices): fold_lo, fold_n,
    clamp_lo, clamp_hi."""
    mean, std = prog.stats
    n_ext = raw["mask_ext"].shape[1]
    w_len = n_ext - _EXT_CTX
    logmag, re, im = stft_ops.log_magnitude_spectrogram(
        raw["samples"], FRAME_LENGTH, FRAME_STEP, FFT_LENGTH
    )
    af = mean.shape[-1]
    valid = (jnp.arange(n_ext) < raw["t_valid"])[None, :, None]
    logmag = jnp.where(valid, logmag[:, :n_ext, :af], 0.0)
    re = jnp.where(valid, re[:, :n_ext, :af], 0.0)
    im = jnp.where(valid, im[:, :n_ext, :af], 0.0)
    sn_ext = jnp.where(valid, (logmag - mean) / std, 0.0)
    window = {
        "spec_norm": sn_ext[:, _EXT_CTX:],
        "re": re[:, _EXT_CTX:],
        "im": im[:, _EXT_CTX:],
        "mask": raw["mask_ext"][:, _EXT_CTX:],
        "video": raw["video"],
    }
    if "embedding" in raw:
        window["embedding"] = raw["embedding"]
    if "gap_ld" in raw:
        window["gap_ld"] = raw["gap_ld"]
        window["gap_valid"] = raw["gap_valid"]
    if prog.spec.conditioning == "ssnn":
        masked_ext = sn_ext * raw["mask_ext"][:, :, None]
        # w_len + _DELTA_N fold rows, not w_len: at the non-final->final
        # transition the host marks chunk + _DELTA_N NEW frames done in one
        # window (the class drains the same burst via _advance_ssnn's loop),
        # and with lookahead < _DELTA_N that exceeds the window length —
        # rows past fold_n are masked out by _ssnn_update, so the extra
        # capacity is free in the steady state.
        pos = raw["fold_lo"] + jnp.arange(w_len + _DELTA_N)  # traced rel idx
        lo_c, hi_c = raw["clamp_lo"], raw["clamp_hi"]

        def g(arr, idx):
            return jnp.take(
                arr, jnp.clip(idx, 0, n_ext - 1).astype(jnp.int32), axis=1
            )

        denom = 2.0 * sum(i * i for i in range(1, _DELTA_N + 1))
        base = g(masked_ext, jnp.clip(pos, lo_c, hi_c))
        d = jnp.zeros_like(base)
        for i in range(1, _DELTA_N + 1):
            f = jnp.clip(pos + i, lo_c, hi_c)
            b = jnp.clip(pos - i, lo_c, hi_c)
            d = d + i * (g(masked_ext, f) - g(masked_ext, b))
        window["ssnn_feats"] = jnp.concatenate([base, d / denom], axis=2)
        window["ssnn_mask"] = g(
            raw["mask_ext"][:, :, None], jnp.clip(pos, lo_c, hi_c)
        )[..., 0]
        window["ssnn_n"] = raw["fold_n"]
    return _window_step(prog, params, window, carries, prev, ssnn_sum, ssnn_cnt)


def _clamped_deltas(masked: np.ndarray, lo: int, hi: int, t_end: int | None):
    """Reference-exact regression deltas for absolute frames [lo, hi).

    masked: (n, 257) masked features for absolute frames [0, n) — already
    truncated streams pass a view whose row 0 is absolute frame `base`
    via the caller subtracting base from lo/hi.  Edge handling replicates
    the reference's iterative SYMMETRIC pad (audio_processing.py:85-94):
    index clamp at 0 and, once the end is known (t_end), at t_end - 1."""
    denom = 2.0 * sum(i * i for i in range(1, _DELTA_N + 1))
    n = masked.shape[0]
    top = (t_end if t_end is not None else n) - 1
    idx = np.arange(lo, hi)
    out = np.zeros((hi - lo, masked.shape[1]), np.float32)
    for i in range(1, _DELTA_N + 1):
        fwd = np.clip(idx + i, 0, top)
        bwd = np.clip(idx - i, 0, top)
        out += i * (masked[fwd] - masked[bwd])
    return out / denom


class StreamingInpainter:
    """One live stream.  Feed waveform (+ per-frame hole masks / video
    features) with `push`, read enhanced int16-scale samples back as they
    become available; `flush` drains the tail.  All device shapes are
    fixed, so every window — including zero-padded flush windows — reuses
    one compiled program."""

    def __init__(
        self,
        config: dict,
        stats: tuple,
        params: dict,
        chunk_frames: int | None = None,
        lookahead_frames: int | None = None,
        embedding: np.ndarray | None = None,
        program_cache: dict | None = None,
        transcript: bool = False,
        phase_fill: bool = False,
        passthrough: bool = False,
        lstm_impl: str = "auto",
        gap_atten: dict | None = None,
    ):
        """chunk_frames/lookahead_frames default (None) to the model's
        TRAINED window when the config carries lc_chunk/lc_lookahead —
        serving an LC-trained model at its training latency is exactly the
        train==serve contract — and to the 288 ms C=8/L=16 defaults
        otherwise.

        program_cache: optional dict shared by streams of the SAME model
        (same config/stats/params provenance): jitted window programs are
        reused across instances keyed by (chunk, lookahead, transcript), so
        a new live stream skips re-tracing (the step reads only static
        model config, identical across such streams).

        transcript=True (CTC models only) additionally runs the ASR head
        over every emitted chunk and maintains an incremental greedy
        decode; read it via the `transcript` attribute (collapsed label
        ids so far).

        passthrough=True keeps the ORIGINAL pushed samples on fully-known
        frames with a raised-cosine crossfade confined to the known side of
        each gap boundary (ops/passthrough.py) — a pure host-side blend per
        emitted chunk, causal (one frame of mask context each side), and
        sample-identical to the offline `--passthrough` path whenever the
        next frame's mask is in the buffer at emit time.  That is always
        true for lookahead >= 1, and at lookahead 0 for any push coarser
        than one hop (a frame's mask arrives with the samples that complete
        its 384-sample window, which already cover the next frame's hop).
        Only strictly frame-granular pushes at lookahead 0 can leave the
        next mask unseen when a gap starts EXACTLY at a chunk boundary;
        then the pre-gap crossfade ramp — which lives in the last emitted
        frame but depends on that unseen mask — is causally unavailable:
        those known samples stay 100 % original and the gap stays 100 %
        model output (a hard splice instead of a fade —
        tests/test_passthrough.py pins both behaviors).

        lstm_impl: "auto" (default) | "scan" | "pallas".  "auto" serves
        the fused LC window kernel on a TPU backend with f32 gates —
        measured faster at window shapes (0.094 -> 0.055 ms/window at
        B=16; scripts/stream_impl_ab.py -> lc_pallas_r4.json) and
        bit-identical to the scan there — and the scan everywhere else.
        Numerics caveat for an explicit "pallas" under bf16-gate configs
        (gate_dtype follows a bfloat16 compute_dtype): in-kernel gates
        are always evaluated f32 (they never leave VMEM —
        ops/pallas_lstm.py:_cell), so the served function deviates from
        the scan-trained one by ~bf16 roundoff per step; "auto" therefore
        keeps the scan under bf16 gates (train==serve gate quantization
        preserved) and only an explicit "pallas" trades it for speed.

        gap_atten: None (off) or {"alpha": a, "trust": t, "ramp": r} —
        the causal deep-gap attenuation postfilter, the live twin of the
        offline `--gap_atten` lever (ops/postfilter.py; mitigates the
        1600 ms PER inversion, atten_ladder_r4.json).  Left gap-edge
        distance is exact (carried across windows); the right edge is
        seen within the lookahead, beyond which frames stay attenuated
        where offline would ramp back up — suppressing strictly MORE of
        the proven-harmful deep-gap content, never less.  Identical to
        the offline postfilter at whole-utterance windows
        (tests/test_postfilter.py)."""
        self.spec = blstm_lib.parse_model_name(config["model"])
        self.want_transcript = bool(transcript)
        if self.want_transcript and not self.spec.ctc:
            raise ValueError(
                f"model {config['model']} has no CTC head; transcripts need "
                "a -ctc variant"
            )
        self.config = config
        self.chunk, self.look = resolve_window(config, chunk_frames, lookahead_frames)
        self.window = self.chunk + self.look
        self.af = int(config["audio_feat_dim"])
        self.vf = int(config["video_feat_dim"])
        self.int_layer = (
            int(config.get("integration_layer", 0)) if self.spec.conditioning else 0
        )
        self.params = params
        # host copy for the per-push front-end: np.asarray on a device array
        # would be a blocking device->host fetch on EVERY push (the tunnel
        # floor is ~34 ms per fetch — CLAUDE.md), straight on the latency path
        self._stats_np = (
            np.asarray(stats[0], dtype=np.float32),
            np.asarray(stats[1], dtype=np.float32),
        )
        if self.spec.conditioning == "emb":
            if embedding is None:
                raise ValueError("model needs an external speaker embedding")
            self._ext_emb = jnp.asarray(embedding, jnp.float32).reshape(1, -1)
        else:
            self._ext_emb = None
        self._hidden = [
            p["wh"].shape[1] for p, _ in _layer_list(params, self.spec, self.int_layer)
        ]
        self._ctc_blank = ctc_blank_id(params) if self.spec.ctc else -1
        self.phase_fill = bool(phase_fill)
        self.passthrough = bool(passthrough)
        self.gap_atten = _norm_gap_atten(gap_atten)
        cdt, gdt = blstm_lib._dtypes(config)
        self.lstm_impl = resolve_stream_impl(lstm_impl, gate_dtype=gdt)
        key = (self.chunk, self.look, self.want_transcript, self.phase_fill,
               self.lstm_impl, self.gap_atten)
        if program_cache is not None and key in program_cache:
            self._step = program_cache[key]
        else:
            prog = _ProgSpec(
                spec=self.spec,
                int_layer=self.int_layer,
                chunk=self.chunk,
                compute_dtype=cdt,
                gate_dtype=gdt,
                # device upload only on the cache-miss branch: a cache hit
                # uses the stats captured at first trace, so uploading per
                # stream-open would be dead tunnel traffic
                stats=(
                    jnp.asarray(stats[0], jnp.float32),
                    jnp.asarray(stats[1], jnp.float32),
                ),
                transcript=self.want_transcript,
                phase_fill=self.phase_fill,
                lstm_impl=self.lstm_impl,
                gap_atten=self.gap_atten,
            )
            self._step = jax.jit(partial(_window_step, prog))
            if program_cache is not None:
                program_cache[key] = self._step
        self.reset()

    # ------------------------------------------------------------------ state

    def reset(self):
        self._sample_buf = np.zeros((0,), np.float32)
        self._mask_buf = np.zeros((0,), np.float32)
        self._video_buf = np.zeros((0, self.vf), np.float32)
        self._masked_buf = np.zeros((0, self.af), np.float32)  # ssnn inputs
        # per-frame features awaiting a full window (rows retire on emit)
        self._frames = {
            "spec_norm": np.zeros((0, self.af), np.float32),
            "re": np.zeros((0, self.af), np.float32),
            "im": np.zeros((0, self.af), np.float32),
        }
        self._carry = [
            (jnp.zeros((1, h), jnp.float32), jnp.zeros((1, h), jnp.float32))
            for h in self._hidden
        ]
        self._ssnn_sum = jnp.zeros((1, blstm_lib.SSNN_DIM), jnp.float32)
        self._ssnn_cnt = jnp.zeros((1,), jnp.float32)
        # previous emitted frame (mag, phase): the left OLA context.  Zeros
        # behave exactly like the offline iSTFT's nonexistent frame -1.
        # Device copy feeds the fused on-device OLA; the host mirror serves
        # the short terminal flush window.  Slots 3/4 are the causal
        # phase-extrapolation carry: per-bin advance (init: the bin's
        # nominal hop advance) and whether the last frame was known.
        omega = (
            2 * np.pi * np.arange(self.af) * FRAME_STEP / FFT_LENGTH
        ).astype(np.float32)
        self._prev_dev = (
            jnp.zeros((1, self.af), jnp.float32),
            jnp.zeros((1, self.af), jnp.float32),
            jnp.asarray(omega[None]),
            jnp.zeros((1,), jnp.float32),
        )
        self._frames_in = 0  # featurized
        self._frames_out = 0  # emitted
        self._closed = False  # set by flush(); push() then needs reset()
        self._deltas_done = 0  # frames whose ssnn contribution is summed
        self._buf_base = 0  # absolute frame index of mask/video/masked row 0
        self.transcript: list[int] = []  # collapsed CTC label ids so far
        self._ctc_prev = self._ctc_blank  # collapse state across chunks
        # passthrough state: raw pushed samples not yet emitted (+ absolute
        # sample index of row 0) and the last emitted frame's known flag
        self._orig = np.zeros((0,), np.float32)
        self._orig_base = 0
        self._pt_prev_known = 1.0
        # causal gap-atten carry: distance-since-last-known after the last
        # emitted frame (frame -1 counts as unknown, postfilter.gap_depth
        # edge convention)
        self._gap_ld = 1_000_000

    # ------------------------------------------------------------------- api

    def push(self, wave, frame_masks, video=None):
        """Feed samples plus the per-frame hole masks (1 = intact,
        0 = hole) for the 12 ms frames those samples complete; `video` adds
        one 136-vector per frame for visual models.  Returns whatever
        enhanced samples became ready (np.float32, possibly empty)."""
        if self._closed:
            # the terminal flush window already ran through the device state
            # (short-window pad rows poison the carries/prev frame), so
            # continuing would silently corrupt output
            raise RuntimeError("stream is flushed; call reset() to reuse")
        wave = np.asarray(wave, np.float32).reshape(-1)
        buf = np.concatenate([self._sample_buf, wave])
        n_frames = max(0, (len(buf) - FRAME_LENGTH) // FRAME_STEP + 1)
        frame_masks = np.asarray(frame_masks, np.float32).reshape(-1)
        if video is not None:
            video = np.asarray(video, np.float32).reshape(-1, self.vf)
        # validate BEFORE touching stream state: a rejected push must leave
        # the buffers exactly as they were so the caller can retry
        total = self._frames_in + n_frames
        if total > self._buf_base + len(self._mask_buf) + len(frame_masks):
            raise ValueError(
                f"{total} frames completed but only "
                f"{self._buf_base + len(self._mask_buf) + len(frame_masks)} "
                "mask values supplied"
            )
        if self.spec.input_type != "a" and total > (
            self._buf_base + len(self._video_buf) + (len(video) if video is not None else 0)
        ):
            raise ValueError("not enough video feature rows supplied")
        self._mask_buf = np.concatenate([self._mask_buf, frame_masks])
        if self.passthrough:
            self._orig = np.concatenate([self._orig, wave])
        if self.spec.input_type != "a" and video is not None:
            self._video_buf = np.concatenate([self._video_buf, video])
        if n_frames:
            self._featurize(_cut_frames(buf, n_frames))
            self._sample_buf = buf[n_frames * FRAME_STEP :]
        else:
            self._sample_buf = buf
        return self._drain(final=False)

    def flush(self):
        """End of stream: pad the tail with zeros exactly like the offline
        pad_end=True STFT (total frames = ceil(total_samples / 192)),
        process every buffered frame with zero-padded lookahead, and return
        the final enhanced samples.  Idempotent: a second flush() returns
        empty; push() after flush() raises until reset()."""
        if self._closed:
            return np.zeros((0,), np.float32)
        n_rem = len(self._sample_buf)
        if n_rem > 0:
            n_frames = -(-n_rem // FRAME_STEP)  # ceil
            need = (n_frames - 1) * FRAME_STEP + FRAME_LENGTH
            buf = np.concatenate(
                [self._sample_buf, np.zeros(need - n_rem, np.float32)]
            )
            total = self._frames_in + n_frames
            short = total - self._buf_base - len(self._mask_buf)
            if short > 0:  # pad_end frames default to intact
                self._mask_buf = np.concatenate(
                    [self._mask_buf, np.ones(short, np.float32)]
                )
            if self.spec.input_type != "a":
                short = total - self._buf_base - len(self._video_buf)
                if short > 0:
                    tail = (
                        self._video_buf[-1:]
                        if len(self._video_buf)
                        else np.zeros((1, self.vf), np.float32)
                    )
                    self._video_buf = np.concatenate(
                        [self._video_buf, np.repeat(tail, short, axis=0)]
                    )
            self._featurize(_cut_frames(buf, n_frames))
            self._sample_buf = np.zeros((0,), np.float32)
        out = self._drain(final=True)
        self._closed = True
        return out

    # ------------------------------------------------------------- internals

    def _featurize(self, frames):
        """Raw 384-sample frames -> (spec_norm, re, im) buffer rows, with
        the same windowed-rDFT + log(|X| + 1e-6) chain as the offline
        front-end (ops/stft.py)."""
        spec = np.fft.rfft(frames * _WINDOW_FN, n=FFT_LENGTH, axis=-1)
        re = spec.real.astype(np.float32)[:, : self.af]
        im = spec.imag.astype(np.float32)[:, : self.af]
        logmag = np.log(np.sqrt(re * re + im * im) + 1e-6)
        mean, std = self._stats_np
        spec_norm = ((logmag - mean) / std).astype(np.float32)
        self._frames["spec_norm"] = np.concatenate(
            [self._frames["spec_norm"], spec_norm]
        )
        self._frames["re"] = np.concatenate([self._frames["re"], re])
        self._frames["im"] = np.concatenate([self._frames["im"], im])
        if self.spec.conditioning == "ssnn":
            lo = self._frames_in - self._buf_base
            masks = self._mask_buf[lo : lo + len(frames), None]
            self._masked_buf = np.concatenate(
                [self._masked_buf, spec_norm * masks]
            )
        self._frames_in += len(frames)

    def _fold_chunk(self, lo, hi, t_end):
        """Build one <= W-frame fold (feats, mask, n_valid) for frames
        [lo, hi), zero-padded to the fixed window shape."""
        base = self._buf_base
        d = _clamped_deltas(
            self._masked_buf, lo - base, hi - base,
            None if t_end is None else t_end - base,
        )
        feats = np.concatenate([self._masked_buf[lo - base : hi - base], d], axis=1)
        n_valid = hi - lo
        if n_valid < self.window:
            feats = np.concatenate(
                [feats,
                 np.zeros((self.window - n_valid, feats.shape[1]), np.float32)]
            )
        masks = self._mask_buf[lo - base : hi - base]
        if len(masks) < self.window:
            masks = np.concatenate(
                [masks, np.zeros(self.window - len(masks), np.float32)]
            )
        return feats, masks, float(n_valid)

    def _advance_ssnn(self, final, visible_end):
        """Fold frames into the running masked average.  A frame enters the
        sum once its delta features are final within the visible range —
        a function of the window sequence alone, so outputs do not depend
        on how the caller sizes its pushes.  The LAST (usually only) fold
        is returned for fusion into the main window step; any excess folds
        (a burst arrival) dispatch through the standalone `_ssnn_step`."""
        if self.spec.conditioning != "ssnn":
            return None
        upto = visible_end if final else max(0, visible_end - _DELTA_N)
        t_end = self._frames_in if final else None
        lo = self._deltas_done
        if lo >= upto:  # nothing new: a zero-count fold keeps shapes fixed
            z = np.zeros((self.window, 2 * self.af), np.float32)
            return z, np.zeros(self.window, np.float32), 0.0
        while upto - lo > self.window:
            hi = lo + self.window
            feats, masks, n_valid = self._fold_chunk(lo, hi, t_end)
            self._ssnn_sum, self._ssnn_cnt = _SSNN_STEP(
                self.params, jnp.asarray(feats)[None], jnp.asarray(masks)[None],
                jnp.asarray(n_valid), self._ssnn_sum, self._ssnn_cnt,
            )
            lo = hi
        self._deltas_done = upto
        return self._fold_chunk(lo, upto, t_end)

    def _drain(self, final):
        out = []
        while True:
            buffered = len(self._frames["spec_norm"])
            if buffered >= self.window:
                fold = self._advance_ssnn(final, self._frames_out + self.window)
                out.append(self._run_window(self.window, fold))
            elif final and buffered > 0:
                fold = self._advance_ssnn(True, self._frames_out + buffered)
                out.append(self._run_window(buffered, fold))
            else:
                break
        if not out:
            return np.zeros((0,), np.float32)
        return np.concatenate(out)

    def _run_window(self, buffered, fold):
        n_emit = min(self.chunk, buffered)
        pad = self.window - buffered
        fr = self._frames
        base = self._frames_out - self._buf_base

        def take(arr, fill=0.0):
            w = arr[:buffered]
            if pad:
                w = np.concatenate(
                    [w, np.full((pad,) + arr.shape[1:], fill, np.float32)]
                )
            return jnp.asarray(w)[None]

        window = {
            "spec_norm": take(fr["spec_norm"]),
            "re": take(fr["re"]),
            "im": take(fr["im"]),
            "mask": take(self._mask_buf[base : base + buffered], fill=1.0),
        }
        if self.spec.input_type != "a":
            window["video"] = take(self._video_buf[base : base + buffered])
        else:
            window["video"] = jnp.zeros((1, self.window, self.vf), jnp.float32)
        if self._ext_emb is not None:
            window["embedding"] = self._ext_emb
        if self.gap_atten is not None:
            window["gap_ld"] = jnp.asarray([self._gap_ld], jnp.int32)
            # rows past `buffered` are flush fill, not stream frames
            window["gap_valid"] = jnp.asarray(buffered, jnp.int32)
        if fold is not None:
            feats, masks, n_valid = fold
            window["ssnn_feats"] = jnp.asarray(feats)[None]
            window["ssnn_mask"] = jnp.asarray(masks)[None]
            window["ssnn_n"] = jnp.asarray(n_valid)

        prev_before = self._prev_dev
        wav, mag, phase, carries, prev_dev, s_sum, s_cnt, ids = self._step(
            self.params, window, self._carry, self._prev_dev,
            self._ssnn_sum, self._ssnn_cnt,
        )
        self._carry = carries
        self._prev_dev = prev_dev
        self._ssnn_sum, self._ssnn_cnt = s_sum, s_cnt
        if self.gap_atten is not None:
            # advance the left-distance carry over the emitted frames (the
            # host has their masks — no device fetch on the latency path)
            lo = self._frames_out - self._buf_base
            for m in self._mask_buf[lo : lo + n_emit]:
                self._gap_ld = 0 if m > 0.5 else min(
                    self._gap_ld + 1, 1_000_000
                )
        for k in fr:
            fr[k] = fr[k][n_emit:]
        # ONE device->host fetch per window (each fetch is a full tunnel
        # round-trip, ~34 ms floor): bundle the transcript ids with whatever
        # the audio path needs instead of fetching them separately
        if n_emit == self.chunk:
            # fused on-device OLA already produced exactly these samples
            self._frames_out += n_emit
            if self.want_transcript:
                wav_h, ids_h = jax.device_get((wav, ids))
            else:
                wav_h, ids_h = np.asarray(wav), None
            out = wav_h[0]
        else:
            # terminal short flush window: host OLA over the n_emit frames
            # with the pre-step device prev as left context
            fetch = (mag, phase, prev_before) + ((ids,) if self.want_transcript else ())
            fetched = jax.device_get(fetch)
            mag_h, phase_h, prev_h = fetched[:3]
            ids_h = fetched[3] if self.want_transcript else None
            out = self._emit(
                mag_h[0, :n_emit],
                phase_h[0, :n_emit],
                tuple(p[0] for p in prev_h),
            )
        if self.want_transcript:
            # incremental greedy CTC collapse over the newly emitted frames
            self._ctc_prev = greedy_collapse(
                ids_h[0, :n_emit], self._ctc_blank,
                self._ctc_prev, self.transcript,
            )
        if self.passthrough:
            out = self._passthrough_blend(out, n_emit)
        self._trim_buffers()
        return out

    def _passthrough_blend(self, out, n_emit):
        """Host-side known-region passthrough on one emitted chunk.  The
        blend weight's dependence radius is exactly one frame
        (2*xfade = frame_step samples), so [prev frame, emitted frames,
        next frame] of mask context reproduces the whole-utterance weight
        (ops/passthrough.passthrough_weight_np).  When the next frame is
        not yet pushed (frame-granular pushes at lookahead 0, or end of
        stream) it is treated as KNOWN: at end of stream that is exact
        (pad_end semantics); mid-stream it causally truncates the pre-gap
        ramp of a gap starting at the boundary — see the class
        docstring."""
        if n_emit <= 0 or len(out) == 0:
            return out
        f0 = self._frames_out - n_emit  # first emitted frame (absolute)
        lo = f0 - self._buf_base
        m = self._mask_buf[lo : lo + n_emit + 1]  # emitted (+next if pushed)
        ctx = np.ones(n_emit + 2, np.float32)  # pad_end / unseen: known
        ctx[0] = self._pt_prev_known
        ctx[1 : 1 + len(m)] = m
        w = passthrough_ops.passthrough_weight_np(
            ctx, FRAME_STEP, (n_emit + 2) * FRAME_STEP
        )[FRAME_STEP : FRAME_STEP + len(out)]
        s0 = f0 * FRAME_STEP - self._orig_base
        orig = self._orig[s0 : s0 + len(out)]
        if len(orig) < len(out):  # flush zero-padding past the pushed tail
            orig = np.pad(orig, (0, len(out) - len(orig)))
        self._pt_prev_known = float(m[n_emit - 1])
        cut = s0 + len(out)
        if cut > 0:
            self._orig = self._orig[cut:]
            self._orig_base += cut
        return (orig * (1.0 - w) + out * w).astype(np.float32)

    def _trim_buffers(self):
        """Bound memory on long-lived streams: drop mask/video/masked rows
        no window or delta computation can reference again."""
        if self.spec.conditioning == "ssnn":
            keep_from = min(self._frames_out, max(0, self._deltas_done - _DELTA_N))
        else:  # no delta bookkeeping holds rows back
            keep_from = self._frames_out
        cut = keep_from - self._buf_base
        if cut > 4 * self.window:
            self._mask_buf = self._mask_buf[cut:]
            if len(self._video_buf):
                self._video_buf = self._video_buf[cut:]
            if len(self._masked_buf):
                self._masked_buf = self._masked_buf[cut:]
            self._buf_base = keep_from

    def _emit(self, mag, phase, prev):
        """Host OLA over the emitted frames with `prev` (mag, phase) as the
        one-frame left context; the emitted sample region then matches the
        offline iSTFT (whose synthesis-window normalization is
        position-independent) exactly.  Only the terminal short flush
        window takes this path — full windows emit on device.  Pure numpy
        (same precomputed windowed-iDFT matrix as ops/stft.py): the inputs
        were already fetched, so touching the device here would add an
        upload plus a second blocking tunnel round-trip to the flush."""
        c = mag.shape[0]
        frames_mag = np.concatenate([prev[0][None], mag])
        frames_ph = np.concatenate([prev[1][None], phase])
        coeffs = np.concatenate(
            [frames_mag * np.cos(frames_ph), frames_mag * np.sin(frames_ph)],
            axis=-1,
        ).astype(np.float32)
        frames = coeffs @ stft_ops._idft_matrix(FRAME_LENGTH, FFT_LENGTH, FRAME_STEP)
        wav = np.zeros(c * FRAME_STEP + FRAME_LENGTH, np.float32)
        for i in range(c + 1):
            wav[i * FRAME_STEP : i * FRAME_STEP + FRAME_LENGTH] += frames[i]
        self._frames_out += c
        return wav[FRAME_STEP : FRAME_STEP + c * FRAME_STEP]


def stream_utterance(
    inp: StreamingInpainter,
    wave: np.ndarray,
    frame_mask: np.ndarray,
    video: np.ndarray | None = None,
    samples_per_push: int = 1536,
) -> np.ndarray:
    """Convenience: stream one utterance through `inp` in
    `samples_per_push`-sample pushes and return the enhanced waveform
    (length = ceil(len(wave) / 192) * 192, like the offline pipeline before
    its seq_len * 192 trim)."""
    inp.reset()
    out = []
    frames_fed = 0
    for lo in range(0, len(wave), samples_per_push):
        chunk = wave[lo : lo + samples_per_push]
        done = lo + len(chunk)
        n_frames = max(0, (done - FRAME_LENGTH) // FRAME_STEP + 1)
        n_frames = min(n_frames, len(frame_mask))
        masks = frame_mask[frames_fed:n_frames]
        vid = video[frames_fed:n_frames] if video is not None else None
        out.append(inp.push(chunk, masks, vid))
        frames_fed = n_frames
    if frames_fed < len(frame_mask):  # rows for the pad_end frame(s)
        vid = video[frames_fed:] if video is not None else None
        out.append(inp.push(np.zeros((0,), np.float32),
                            frame_mask[frames_fed:], vid))
    out.append(inp.flush())
    return np.concatenate(out)


def stream_utterances_lockstep(
    config: dict,
    stats: tuple,
    params: dict,
    waves: np.ndarray,
    frame_masks: np.ndarray,
    videos: np.ndarray | None = None,
    embeddings: np.ndarray | None = None,
    chunk_frames: int | None = None,
    lookahead_frames: int | None = None,
    program_cache: dict | None = None,
    transcript: bool = False,
    mesh=None,
    phase_fill: bool = False,
    passthrough: bool = False,
    lstm_impl: str = "auto",
    gap_atten: dict | None = None,
):
    """Serve B streams in lockstep: each window is ONE fused device
    dispatch covering every stream (the multi-tenant serving shape), and
    the whole front-end — STFT, log, normalization, ssnn delta fold —
    runs in-graph from raw samples, so the host ships ~6x fewer bytes per
    window than a feature-level interface.  Window schedule, padding and
    ssnn fold timing replicate StreamingInpainter exactly, so a B=1 call
    matches the single-stream class sample for sample (float tolerance:
    the class featurizes via host np.fft, this path via the device
    matmul-DFT).

    waves (B, S) int16-scale float; frame_masks (B, T) with
    T = ceil(S / 192); videos (B, T, 136) for visual models; embeddings
    (B, emb_dim) for external-embedding models.  Returns (B, T * 192);
    with transcript=True (CTC models) returns (wav, transcripts) where
    transcripts is a list of B collapsed greedy CTC label-id lists —
    identical to each stream's StreamingInpainter incremental decode
    (multi-tenant live transcription at the same one-dispatch-per-window
    cost).

    mesh: an optional `jax.sharding.Mesh` with a `data` axis.  The fleet
    is sharded over it — params replicated, every per-stream plane (window
    inputs, LSTM carries, ssnn running state) partitioned on the batch
    axis — so the SAME one-dispatch-per-window program serves B streams
    across a whole slice (streams are independent; GSPMD partitions with
    zero collectives).  The reference has no serving at all (SURVEY §2.4);
    this is the multi-chip extension of the avsi-only fleet path.
    Requires B divisible by the `data` axis size.

    lstm_impl: "auto" (default) | "scan" | "pallas" — same policy and
    caveats as StreamingInpainter ("auto": the fused LC window kernel on
    TPU with f32 gates, scan otherwise).  Fleet meshes ride the kernel
    too: per window the kernel partitions over the `data` axis via
    shard_map (`pallas_lstm.lc_window_pallas_sharded` — per shard the
    same single-device program); tensor-parallel meshes keep the scan.
    Under bf16-gate configs an explicit "pallas" serves f32-evaluated
    gates (~bf16-roundoff/step deviation from the scan-trained function;
    see StreamingInpainter.__init__).

    gap_atten: same causal deep-gap attenuation as StreamingInpainter
    ({"alpha": a, "trust": t, "ramp": r} or None) — per-window left
    distances are precomputed host-side from the full masks, so the fleet
    matches the single-stream class window for window."""
    spec = blstm_lib.parse_model_name(config["model"])
    af = int(config["audio_feat_dim"])
    vf = int(config["video_feat_dim"])
    int_layer = int(config.get("integration_layer", 0)) if spec.conditioning else 0
    # None defaults to the model's trained LC window, like StreamingInpainter
    chunk, look = resolve_window(config, chunk_frames, lookahead_frames)
    if transcript and not spec.ctc:
        raise ValueError(
            f"model {config['model']} has no CTC head; transcripts need a "
            "-ctc variant"
        )
    window_n = chunk + look
    b_sz, n_samples = waves.shape
    t_frames = -(-n_samples // FRAME_STEP)
    if t_frames == 0:
        # degenerate empty stream: the class's flush() yields zero samples;
        # without this guard the window loop never runs and
        # np.concatenate([]) raises
        empty = np.zeros((b_sz, 0), np.float32)
        return (empty, [[] for _ in range(b_sz)]) if transcript else empty
    if frame_masks.shape != (b_sz, t_frames):
        raise ValueError(
            f"frame_masks must be {(b_sz, t_frames)}, got {frame_masks.shape}"
        )
    if spec.conditioning == "emb" and embeddings is None:
        raise ValueError("model needs external speaker embeddings")
    if spec.input_type != "a" and videos is None:
        raise ValueError("model consumes video features")

    shard = repl = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_data = mesh.shape.get("data", 0)
        if not n_data:
            raise ValueError("mesh must carry a 'data' axis")
        if b_sz % n_data != 0:
            raise ValueError(
                f"fleet size {b_sz} not divisible by the mesh data axis "
                f"({n_data})"
            )
        shard = NamedSharding(mesh, PartitionSpec("data"))
        repl = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, repl)

    def _put(x, sharding):
        return jax.device_put(x, sharding) if sharding is not None else x

    cdt, gdt = blstm_lib._dtypes(config)
    lstm_impl = resolve_stream_impl(lstm_impl, gate_dtype=gdt, mesh=mesh)
    gap_atten = _norm_gap_atten(gap_atten)
    stats_j = (jnp.asarray(stats[0], jnp.float32), jnp.asarray(stats[1], jnp.float32))
    key = ("raw", chunk, look, transcript, bool(phase_fill), lstm_impl,
           gap_atten, mesh if lstm_impl == "pallas" else None)
    if program_cache is not None and key in program_cache:
        step = program_cache[key]
    else:
        prog = _ProgSpec(
            spec=spec, int_layer=int_layer, chunk=chunk,
            compute_dtype=cdt, gate_dtype=gdt,
            stats=stats_j,
            transcript=transcript,
            phase_fill=bool(phase_fill),
            lstm_impl=lstm_impl,
            gap_atten=gap_atten,
            mesh=mesh if lstm_impl == "pallas" else None,
        )
        step = jax.jit(partial(_window_step_raw, prog))
        if program_cache is not None:
            program_cache[key] = step

    # global sample/mask planes in extended coordinates: EXT zero frames
    # of left context, the stream, then pad_end zeros / intact masks
    n_windows = -(-t_frames // chunk)
    t0_max = (n_windows - 1) * chunk
    ext_frames = _EXT_CTX + window_n
    samp_len = (t0_max + window_n + _EXT_CTX - 1) * FRAME_STEP + FRAME_LENGTH
    samp = np.zeros((b_sz, samp_len), np.float32)
    samp[:, _EXT_CTX * FRAME_STEP : _EXT_CTX * FRAME_STEP + n_samples] = waves
    fm = np.asarray(frame_masks, np.float32)
    mask_glob = np.concatenate(
        [np.zeros((b_sz, _EXT_CTX), np.float32), fm,
         np.ones((b_sz, t0_max + window_n - t_frames), np.float32)], axis=1,
    )
    vid_glob = None
    if spec.input_type != "a":
        vid_glob = np.zeros((b_sz, t0_max + window_n, vf), np.float32)
        vid_glob[:, :t_frames] = np.asarray(videos, np.float32)
    ext_emb = (
        _put(jnp.asarray(embeddings, jnp.float32), shard)
        if spec.conditioning == "emb"
        else None
    )

    hidden = [p["wh"].shape[1] for p, _ in _layer_list(params, spec, int_layer)]
    carries = [
        (
            _put(jnp.zeros((b_sz, h), jnp.float32), shard),
            _put(jnp.zeros((b_sz, h), jnp.float32), shard),
        )
        for h in hidden
    ]
    omega = (2 * np.pi * np.arange(af) * FRAME_STEP / FFT_LENGTH).astype(
        np.float32
    )
    prev = (
        _put(jnp.zeros((b_sz, af), jnp.float32), shard),
        _put(jnp.zeros((b_sz, af), jnp.float32), shard),
        _put(jnp.broadcast_to(omega, (b_sz, af)).copy(), shard),
        _put(jnp.zeros((b_sz,), jnp.float32), shard),
    )
    ssnn_sum = _put(jnp.zeros((b_sz, blstm_lib.SSNN_DIM), jnp.float32), shard)
    ssnn_cnt = _put(jnp.zeros((b_sz,), jnp.float32), shard)
    raw_len = (ext_frames - 1) * FRAME_STEP + FRAME_LENGTH

    outs = []
    id_chunks = []
    deltas_done = 0
    # Frames computable from real pushed samples, pre-flush: the class only
    # materializes the pad_end frame(s) at flush(), so any window needing
    # them runs there with final=True — even a FULL window (when
    # t_frames - t0 == window_n and the tail frames are pad frames).
    # Matching on t_frames alone would mark that window non-final and
    # diverge from the class's fold timing / t_end clamp.
    real_frames = max(0, (n_samples - FRAME_LENGTH) // FRAME_STEP + 1)
    lds = None
    if gap_atten is not None:
        # left-distance state after each frame, from the TRUE masks (the
        # EXT context and pad_end frames never feed gap depth; the class's
        # carry advances over exactly these emitted-frame masks)
        lds = postfilter_ops.left_distances_np(fm)
    for t0 in range(0, t_frames, chunk):
        final = t0 + window_n > real_frames  # the class's flush-window condition
        raw = {
            "samples": _put(
                jnp.asarray(samp[:, t0 * FRAME_STEP : t0 * FRAME_STEP + raw_len]),
                shard,
            ),
            "mask_ext": _put(jnp.asarray(mask_glob[:, t0 : t0 + ext_frames]), shard),
            "video": _put(
                jnp.asarray(vid_glob[:, t0 : t0 + window_n])
                if vid_glob is not None
                else jnp.zeros((b_sz, window_n, vf), jnp.float32),
                shard,
            ),
            "t_valid": _put(jnp.asarray(min(_EXT_CTX + t_frames - t0, ext_frames)), repl),
        }
        if ext_emb is not None:
            raw["embedding"] = ext_emb
        if lds is not None:
            ld0 = (
                lds[:, t0 - 1]
                if t0 > 0
                else np.full((b_sz,), 1_000_000, np.int32)
            )
            raw["gap_ld"] = _put(jnp.asarray(ld0, jnp.int32), shard)
            raw["gap_valid"] = _put(
                jnp.asarray(min(t_frames - t0, window_n), jnp.int32), repl
            )
        if spec.conditioning == "ssnn":
            visible = min(t0 + window_n, t_frames)
            upto = visible if final else max(0, visible - _DELTA_N)
            n_new = max(0, upto - deltas_done)
            raw["fold_lo"] = _put(jnp.asarray(_EXT_CTX + deltas_done - t0), repl)
            raw["fold_n"] = _put(jnp.asarray(float(n_new)), repl)
            raw["clamp_lo"] = _put(jnp.asarray(max(0, _EXT_CTX - t0)), repl)
            raw["clamp_hi"] = _put(
                jnp.asarray(
                    _EXT_CTX + (t_frames - 1 - t0) if final else ext_frames - 1
                ),
                repl,
            )
            deltas_done = upto
        wav, _, _, carries, prev, ssnn_sum, ssnn_cnt, ids = step(
            params, raw, carries, prev, ssnn_sum, ssnn_cnt
        )
        outs.append(np.asarray(wav))
        if transcript:
            id_chunks.append(np.asarray(ids))
    wav_out = np.concatenate(outs, axis=1)[:, : t_frames * FRAME_STEP]
    if passthrough:
        # whole-utterance blend == the class's incremental per-chunk blend
        # (the weight's dependence radius is one frame; test_passthrough.py
        # asserts the equality)
        num = wav_out.shape[1]
        w = np.stack([
            passthrough_ops.passthrough_weight_np(fm[i], FRAME_STEP, num)
            for i in range(b_sz)
        ])
        orig = np.zeros((b_sz, num), np.float32)
        n_copy = min(num, n_samples)
        orig[:, :n_copy] = waves[:, :n_copy]
        wav_out = (orig * (1.0 - w) + wav_out * w).astype(np.float32)
    if not transcript:
        return wav_out
    # per-stream greedy collapse over the first t_frames emitted ids —
    # the same greedy_collapse as StreamingInpainter's incremental decode
    all_ids = np.concatenate(id_chunks, axis=1)[:, :t_frames]
    blank = ctc_blank_id(params)
    transcripts = []
    for row in all_ids:
        decoded: list[int] = []
        greedy_collapse(row, blank, blank, decoded)
        transcripts.append(decoded)
    return wav_out, transcripts
