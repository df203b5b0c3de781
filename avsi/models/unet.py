"""Spectrogram-inpainting U-Net (full convolutions).

Reference: `UNetFConvModel` (`models.py:519-715`) + `unet_layers.py:6-37`.
Operates on 128-bin log spectrograms from a 16 ms / 8 ms / n_fft=256 STFT
(models.py:537, scripts/config/unet.config).  Six encoders (kernel sizes
7,5,5,3,3,3; channels 16,32,64,128,128,128; BN+ReLU except the first has no
BN), six decoders (2x nearest upsample, skip concat, 3x3 conv, BN,
LeakyReLU 0.2), then a linear 1x1 conv head.

Documented deviation: the reference builds the encoders with the default
stride=1 (unet_layers.py:6) while the decoders upsample 2x, which cannot
type-check — the evidently-intended stride=2 (used explicitly by the pconv
twin, models.py:393-398) is applied here (SURVEY.md §2.2, §7.3 #5).

Loss/prediction semantics match the reference: prediction = seq-masked raw
inference (no unmasked restore, models.py:613-621), loss = mean L1 with
hole/valid diagnostics (:623-637).

TPU notes: NHWC layout, XLA conv kernels; batch-norm statistics are batch
(training) / running (inference) like tf.layers.batch_normalization.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from avsi.ops import stft as stft_ops
from avsi.ops.masks import sequence_mask

FRAME_LENGTH, FRAME_STEP, FFT_LENGTH = 256, 128, 256

ENC = [  # (kernel, in_ch, out_ch, batch_norm)
    (7, 1, 16, False),
    (5, 16, 32, True),
    (5, 32, 64, True),
    (3, 64, 128, True),
    (3, 128, 128, True),
    (3, 128, 128, True),
]
DEC = [  # (kernel, in_ch, out_ch)  — in_ch = skip + upsampled
    (3, 256, 128),
    (3, 256, 128),
    (3, 192, 64),
    (3, 96, 32),
    (3, 48, 16),
    (3, 17, 1),
]


def _conv_init(rng, kernel, in_ch, out_ch):
    # reference: truncated_normal stddev sqrt(2 / (k^2 * out_ch)) (unet_layers.py:7)
    stddev = math.sqrt(2.0 / (kernel * kernel * out_ch))
    k1, _ = jax.random.split(rng)
    w = stddev * jax.random.truncated_normal(
        k1, -2.0, 2.0, (kernel, kernel, in_ch, out_ch), jnp.float32
    )
    b = jnp.full((out_ch,), 0.1, jnp.float32)
    return {"w": w, "b": b}


def _bn_init(ch):
    return {
        "scale": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }


def init_impl(rng, dec_bn) -> dict:
    """Shared parameter tree for both U-Net twins; `dec_bn` flags which
    decoders carry batch norm (all of them for fconv; the pconv twin's
    last decoder has none, models.py:406)."""
    params: dict = {"enc": [], "dec": []}
    for kernel, cin, cout, bn in ENC:
        rng, sub = jax.random.split(rng)
        layer = {"conv": _conv_init(sub, kernel, cin, cout)}
        if bn:
            layer["bn"] = _bn_init(cout)
        params["enc"].append(layer)
    for (kernel, cin, cout), bn in zip(DEC, dec_bn):
        rng, sub = jax.random.split(rng)
        layer = {"conv": _conv_init(sub, kernel, cin, cout)}
        if bn:
            layer["bn"] = _bn_init(cout)
        params["dec"].append(layer)
    rng, sub = jax.random.split(rng)
    params["head"] = {"conv": _conv_init(sub, 1, 1, 1)}
    return params


def init(rng, config: dict) -> dict:
    return init_impl(rng, dec_bn=[True] * len(DEC))


def _conv(p, x, stride=1):
    out = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def _batch_norm(p, x, train: bool, eps=1e-3, momentum=0.99):
    """tf.layers.batch_normalization semantics. Returns (y, new_stats)."""
    if train:
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        new = {
            "mean": momentum * p["mean"] + (1 - momentum) * mean,
            "var": momentum * p["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = p["mean"], p["var"]
        new = {"mean": p["mean"], "var": p["var"]}
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new


def _upsample2(x):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def forward_impl(
    params: dict,
    batch: dict,
    config: dict,
    stats: tuple,
    train: bool,
    enc_step,
    dec_bn,
) -> dict:
    """Shared forward for both U-Net twins.

    `enc_step(conv_params, x, m, kernel) -> (x, m)` is the only piece the
    twins differ on (plain stride-2 conv vs partial conv with mask
    propagation); `dec_bn` flags which decoders batch-normalize."""
    mean, std = stats
    logmag, re, im = stft_ops.log_magnitude_spectrogram(
        batch["target_sources"], FRAME_LENGTH, FRAME_STEP, FFT_LENGTH
    )
    af = config["audio_feat_dim"]
    t = batch["masks"].shape[1]
    logmag, re, im = logmag[:, :t, :af], re[:, :t, :af], im[:, :t, :af]
    spec_norm = (logmag - mean) / std
    net_in = (spec_norm * batch["masks"])[..., None]  # NHWC, C=1
    m = batch["masks"][..., None]

    new_stats: dict = {"enc": [], "dec": []}
    x = net_in
    skips = [net_in]
    for (kernel, cin, cout, bn), layer in zip(ENC, params["enc"]):
        x, m = enc_step(layer["conv"], x, m, kernel)
        upd = {}
        if bn:
            x, upd = _batch_norm(layer["bn"], x, train)
        x = jax.nn.relu(x)
        new_stats["enc"].append(upd)
        skips.append(x)
    # skips: [input, e1..e6]; decoders consume e5..input
    for i, (bn, layer) in enumerate(zip(dec_bn, params["dec"])):
        skip = skips[len(ENC) - 1 - i]
        x = _upsample2(x)
        # guard odd shapes: crop upsample to the skip's spatial dims
        x = x[:, : skip.shape[1], : skip.shape[2], :]
        x = jnp.concatenate([skip, x], axis=3)
        x = _conv(layer["conv"], x, stride=1)
        upd = {}
        if bn:
            x, upd = _batch_norm(layer["bn"], x, train)
        x = jax.nn.leaky_relu(x, 0.2)
        new_stats["dec"].append(upd)
    x = _conv(params["head"]["conv"], x, stride=1)
    inference = x[..., 0]

    seq_mask = sequence_mask(batch["sequence_lengths"], t)[:, :, None]
    prediction = inference * seq_mask
    return {
        "target_spec_norm": spec_norm,
        "stft_re": re,
        "stft_im": im,
        "inference": inference,
        "prediction": prediction,
        "bn_stats": new_stats,
    }


def _fconv_step(p, x, m, kernel):
    return _conv(p, x, stride=2), m


def forward(params: dict, batch: dict, config: dict, stats: tuple, train: bool = False, rng=None) -> dict:
    """Forward pass. Returns feats + prediction + updated BN stats."""
    return forward_impl(
        params, batch, config, stats, train, _fconv_step, [True] * len(DEC)
    )


def losses(outputs: dict, batch: dict, config: dict) -> dict:
    masks = batch["masks"]
    diff = jnp.abs(outputs["target_spec_norm"] - outputs["prediction"])
    return {
        "loss_hole": jnp.sum(diff * (1 - masks))
        / jnp.maximum(jnp.sum(1 - masks), 1.0),
        "loss_valid": jnp.sum(diff * masks) / jnp.maximum(jnp.sum(masks), 1.0),
        "loss": jnp.mean(diff),
    }


def enhanced_sources(
    outputs: dict, batch: dict, config: dict, stats: tuple, oracle_phase: bool = False
) -> jax.Array:
    mean, std = stats
    mag = jnp.exp(outputs["prediction"] * std + mean)
    re, im = outputs["stft_re"], outputs["stft_im"]
    if not oracle_phase:
        re = re * batch["masks"]
        im = im * batch["masks"]
    # pad magnitude/phase pair back to the full bin count; phase-free
    # resynthesis (stft.waveform_from_mag_complex) — same math as
    # arctan2 -> cos/sin, minus three transcendentals per bin
    nbins = FFT_LENGTH // 2 + 1
    pad = nbins - mag.shape[-1]
    if pad > 0:
        zp = ((0, 0), (0, 0), (0, pad))
        mag = jnp.pad(mag, zp)
        re = jnp.pad(re, zp)
        im = jnp.pad(im, zp)
    return stft_ops.waveform_from_mag_complex(
        mag,
        re,
        im,
        num_samples=int(config["audio_len"]),
        frame_length=FRAME_LENGTH,
        frame_step=FRAME_STEP,
        fft_length=FFT_LENGTH,
    )


def apply_bn_update(params: dict, bn_stats: dict) -> dict:
    """Merge updated running BN statistics back into the param tree."""
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for i, upd in enumerate(bn_stats["enc"]):
        if upd:
            out["enc"][i]["bn"]["mean"] = upd["mean"]
            out["enc"][i]["bn"]["var"] = upd["var"]
    for i, upd in enumerate(bn_stats["dec"]):
        if upd:  # the pconv twin's last decoder has no BN (models.py:406)
            out["dec"][i]["bn"]["mean"] = upd["mean"]
            out["dec"][i]["bn"]["var"] = upd["var"]
    return out
