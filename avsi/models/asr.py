"""Standalone CTC ASR model (the frozen "judge" for inpainting quality).

Reference: `models_asr.StackedBLSTMModel`
(`/root/reference/av_speech_inpainting/models_asr.py:10-203`):
wave -> STFT(24ms/12ms/512) -> power spectrogram (optionally * mask) ->
80-bin log-mel (125-7600 Hz) -> per-bin standard normalization -> stacked
BLSTM -> dense (num_labels+blank) -> CTC loss / decode / PER.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avsi.models import core
from avsi.ops import ctc as ctc_ops
from avsi.ops import mel as mel_ops
from avsi.ops import stft as stft_ops

FRAME_LENGTH, FRAME_STEP, FFT_LENGTH = 384, 192, 512
NUM_MEL_BINS = 80


def init(rng, config: dict) -> dict:
    input_type = config["model"].split("-")[0]
    in_dim = {
        "a": NUM_MEL_BINS,
        "v": config["video_feat_dim"],
        "av": NUM_MEL_BINS + config["video_feat_dim"],
    }[input_type]
    # frame stacking (Pundak & Sainath 2017, arXiv 1705.05992): stack k
    # consecutive frames and subsample time k-fold — a TPU-friendly
    # sequence-length reduction the reference does not have (optional,
    # config `frame_stack`, default off)
    in_dim *= int(config.get("frame_stack", 1))
    k1, k2 = jax.random.split(rng)
    return {
        "blstm": core.blstm_stack_init(k1, in_dim, config["net_dim"]),
        "head": core.dense_init(k2, 2 * config["net_dim"][-1], config["num_asr_labels"]),
    }


def _stack_frames(feats: jax.Array, k: int) -> jax.Array:
    """(B, T, F) -> (B, ceil(T/k), F*k), zero-padded at the end."""
    b, t, f = feats.shape
    t_out = -(-t // k)
    pad = t_out * k - t
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    return feats.reshape(b, t_out, f * k)


def asr_features(
    target_sources: jax.Array,
    stats: tuple,
    masks: jax.Array | None = None,
    num_frames: int | None = None,
    num_spec_bins: int = 257,
) -> jax.Array:
    """wave -> normalized log-mel (models_asr.py:31-42)."""
    mean, std = stats
    re, im = stft_ops.stft_real_imag(target_sources, FRAME_LENGTH, FRAME_STEP, FFT_LENGTH)
    pow_spec = re * re + im * im
    if num_frames is not None:
        pow_spec = pow_spec[:, :num_frames, :num_spec_bins]
    if masks is not None:
        pow_spec = pow_spec * masks
    fbanks = mel_ops.log_mel_spectrogram(pow_spec, num_spec_bins=pow_spec.shape[-1])
    return (fbanks - mean) / std


def forward(
    params: dict,
    batch: dict,
    config: dict,
    stats: tuple,
    apply_mask: bool = False,
    train: bool = False,
    rng=None,
    audio_sources: jax.Array | None = None,
) -> dict:
    """Returns {'logits': (B, T, C)}.  `audio_sources` overrides the batch
    waveform — used by the fused SI->ASR pipeline (inference_siasr)."""
    from avsi.models.blstm import _dtypes

    compute_dtype, gate_dtype = _dtypes(config)
    input_type = config["model"].split("-")[0]
    if input_type == "v":
        # video-only: skip the audio front-end entirely (no wasted
        # STFT/mel work inside the jitted step)
        net_in = batch["video_features"]
    else:
        sources = batch["target_sources"] if audio_sources is None else audio_sources
        t = batch["masks"].shape[1]
        feats = asr_features(
            sources,
            stats,
            masks=batch["masks"] if apply_mask else None,
            num_frames=t,
            num_spec_bins=config["audio_feat_dim"],
        )
        if input_type == "av":
            net_in = jnp.concatenate([feats, batch["video_features"]], axis=2)
        else:
            net_in = feats
    k = int(config.get("frame_stack", 1))
    logit_lengths = batch["sequence_lengths"]
    if k > 1:
        net_in = _stack_frames(net_in, k)
        logit_lengths = -(-logit_lengths // k)
    impl = str(config.get("lstm_impl", "scan") or "scan")
    rnn_out = core.blstm_stack(
        params["blstm"], net_in, compute_dtype, gate_dtype,
        impl=impl,
        mesh=config.get("lstm_mesh") if impl == "pallas" else None,
        forward_only=not train,
    )
    rnn_out = core.dropout(
        rng, rnn_out, float(config.get("dropout_rate", 0.0)), deterministic=not train
    )
    logits = core.dense(params["head"], rnn_out).astype(jnp.float32)
    return {"logits": logits, "logit_lengths": logit_lengths}


def losses(outputs: dict, batch: dict, config: dict) -> dict:
    loss = ctc_ops.ctc_loss(
        outputs["logits"],
        outputs.get("logit_lengths", batch["sequence_lengths"]),
        batch["labels"],
        batch["labels_lengths"],
    )
    return {"loss": loss, "ctc_loss": loss}


def decode_greedy(outputs: dict, batch: dict) -> jax.Array:
    return ctc_ops.greedy_decode(
        outputs["logits"], outputs.get("logit_lengths", batch["sequence_lengths"])
    )
