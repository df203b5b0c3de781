"""Generic image-segmentation U-Net (reference `unet.py` / `unet_util.py`).

Reference C28 is a vestigial tf_unet-style network (Ronneberger et al.)
that is unreachable from the reference CLI (SURVEY.md §2.1 C28) but part of
its inventory: configurable depth, two 3x3 VALID convs per level with 2x2
max-pool downsampling, transposed-conv upsampling with crop-and-concat
skips, 1x1 head, pixel-wise softmax, cross-entropy loss (unet.py:186-307).
Provided for completeness as plain functional JAX; the production
spectrogram U-Net is avsi/models/unet.py.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _conv_init(rng, k, cin, cout, stddev=None):
    if stddev is None:
        stddev = math.sqrt(2.0 / (k * k * cin))
    w = stddev * jax.random.truncated_normal(rng, -2.0, 2.0, (k, k, cin, cout))
    return {"w": w.astype(jnp.float32), "b": jnp.full((cout,), 0.1, jnp.float32)}


def init(rng, channels_in: int = 1, n_classes: int = 2, layers: int = 3,
         features_root: int = 16, filter_size: int = 3) -> dict:
    params: dict = {"down": [], "up": []}
    cin = channels_in
    feats = features_root
    for _ in range(layers):
        rng, k1, k2 = jax.random.split(rng, 3)
        params["down"].append(
            {"conv1": _conv_init(k1, filter_size, cin, feats),
             "conv2": _conv_init(k2, filter_size, feats, feats)}
        )
        cin = feats
        feats *= 2
    feats //= 2
    for _ in range(layers - 1):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        params["up"].append(
            {
                "deconv": _conv_init(k1, 2, feats, feats // 2),  # (H, W, In, Out)
                "conv1": _conv_init(k2, filter_size, feats, feats // 2),
                "conv2": _conv_init(k3, filter_size, feats // 2, feats // 2),
            }
        )
        feats //= 2
    rng, kh = jax.random.split(rng)
    params["head"] = _conv_init(kh, 1, feats, n_classes)
    return params


def _conv(p, x, padding="VALID"):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + p["b"]


def _deconv2x(p, x):
    out = jax.lax.conv_transpose(
        x, p["w"], (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + p["b"]


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _crop_and_concat(skip, x):
    """Center-crop skip to x's spatial dims and concat (unet_util.py:108-116)."""
    dh = (skip.shape[1] - x.shape[1]) // 2
    dw = (skip.shape[2] - x.shape[2]) // 2
    cropped = skip[:, dh : dh + x.shape[1], dw : dw + x.shape[2], :]
    return jnp.concatenate([cropped, x], axis=3)


def forward(params: dict, x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> logits (B, H', W', n_classes); VALID convs shrink."""
    skips = []
    for i, level in enumerate(params["down"]):
        x = jax.nn.relu(_conv(level["conv1"], x))
        x = jax.nn.relu(_conv(level["conv2"], x))
        if i < len(params["down"]) - 1:
            skips.append(x)
            x = _maxpool2(x)
    for level in params["up"]:
        x = jax.nn.relu(_deconv2x(level["deconv"], x))
        x = _crop_and_concat(skips.pop(), x)
        x = jax.nn.relu(_conv(level["conv1"], x))
        x = jax.nn.relu(_conv(level["conv2"], x))
    return _conv(params["head"], x, padding="SAME")


def pixel_wise_softmax(logits: jax.Array) -> jax.Array:
    return jax.nn.softmax(logits, axis=-1)


def cross_entropy(labels_onehot: jax.Array, probs: jax.Array) -> jax.Array:
    """unet_util.py:125-126 semantics."""
    return -jnp.mean(labels_onehot * jnp.log(jnp.clip(probs, 1e-10, 1.0)))


def loss(params: dict, x: jax.Array, labels_onehot: jax.Array) -> jax.Array:
    return cross_entropy(labels_onehot, pixel_wise_softmax(forward(params, x)))
