"""Spectrogram-inpainting U-Net with partial convolutions.

Reference: `UNetPConvModel` (`models.py:320-516`) + the partial-conv layer
helpers (`unet_layers.py:40-78`).  Same 16 ms / 8 ms / n_fft=256 / 128-bin
front-end, geometry (6 stride-2 encoders with kernels 7,5,5,3,3,3 and
channels 16..128; 6 decoders; linear 1x1 head), prediction (seq-masked raw
inference, models.py:419-427), loss (mean L1 + hole/valid diagnostics,
models.py:429-444) and masked/oracle-phase reconstruction (models.py:466-482)
as the full-conv twin — shared here via `avsi.models.unet`.

What differs is the encoder: **partial convolutions** (Liu et al. 2018,
arXiv 1804.07723 — the evident design intent): each encoder convolves the
mask-weighted input and renormalizes by the window's mask coverage,

    y = W*(x . m) * (|W| / sum_window(m)) + b      where sum_window(m) > 0
    y = 0                                          elsewhere

and propagates a shrunken hole mask `m' = [sum_window(m) > 0]` to the next
layer.  The decoders are plain full convolutions over upsample+skip-concat —
exactly what the reference's `decoder_layer_pconv` computes (its body is
identical to `decoder_layer_fconv`, unet_layers.py:64-78); only the last
decoder drops batch norm (models.py:406).

Documented deviations (reference-bug policy, SURVEY.md §7.3 #5):

* The reference class is dead code and broken twice over: `inference` calls
  `encoder_layer_pconv` without its `mask` argument (models.py:393-398), and
  the layer body references an undefined `conv_2d` so the computed
  `mask_ratio` is never applied (unet_layers.py:55-59).  Both are fixed here
  by implementing the intended partial convolution above.
* The reference builds a per-output-channel ones kernel
  `[k, k, in_ch, out_ch]` for the mask conv but then normalizes by
  `k^2 / mask_sum` (unet_layers.py:49-53), i.e. it treats the mask as
  single-channel.  We keep the single-channel mask (one `[k, k, 1, 1]` ones
  conv — cheaper and equivalent, since every input channel shares the same
  T-F hole mask) and the reference's `k^2 / sum` ratio.
* Liu et al. also use partial convs in the decoder; the reference does not
  (see above) and we follow the reference.

TPU notes: the mask-coverage conv is a tiny single-channel conv XLA fuses
alongside the main conv; everything stays NHWC static-shape under jit, and
the hole mask is carried as float for MXU-friendly multiplies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avsi.models.unet import (  # shared geometry + fconv-twin pieces
    FFT_LENGTH,  # noqa: F401  (front-end geometry, re-exported)
    FRAME_LENGTH,  # noqa: F401
    FRAME_STEP,  # noqa: F401
    apply_bn_update,  # noqa: F401  (re-exported for the train loop)
    enhanced_sources,  # noqa: F401  (identical reconstruction, models.py:466-482)
    forward_impl,
    init_impl,
    losses,  # noqa: F401  (identical loss surface, models.py:429-444)
)

# Last pconv decoder has no batch norm (models.py:406), unlike the fconv twin.
_DEC_BN = [True, True, True, True, True, False]


def init(rng, config: dict) -> dict:
    return init_impl(rng, dec_bn=_DEC_BN)


def _pconv(p, x, m, kernel: int, stride: int):
    """One partial convolution step.

    x: (B, T, F, Cin) features, m: (B, T, F, 1) float validity mask.
    Returns (y, m_new) where y is zero wherever the receptive field saw no
    valid input and m_new marks positions with any valid coverage.
    """
    x_conv = jax.lax.conv_general_dilated(
        x * m,
        p["w"],
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ones = jnp.ones((kernel, kernel, 1, 1), x.dtype)
    m_sum = jax.lax.conv_general_dilated(
        m,
        ones,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    covered = m_sum > 0
    ratio = (kernel * kernel) / jnp.maximum(m_sum, 1e-8)  # unet_layers.py:53
    y = jnp.where(covered, x_conv * ratio + p["b"], 0.0)
    return y, covered.astype(x.dtype)


def _pconv_step(p, x, m, kernel):
    return _pconv(p, x, m, kernel, stride=2)


def forward(params: dict, batch: dict, config: dict, stats: tuple, train: bool = False, rng=None) -> dict:
    """Forward pass. Returns feats + prediction + updated BN stats.

    Shares the front-end / decoder loop / head with the fconv twin
    (`unet.forward_impl`); only the encoder step (partial conv) and the
    last decoder's missing batch norm differ (models.py:393-408)."""
    return forward_impl(params, batch, config, stats, train, _pconv_step, _DEC_BN)
