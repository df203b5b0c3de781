"""Two-step AV inpainting: a frozen-or-jointly-restored v-blstm feeds an
av-blstm.

Reference: `StackedBLSTM2StepsModel` (`models.py:240-317`): a `v-blstm`
sub-model's prediction becomes the *audio* input of an `av-blstm`
(:255-264).  The train_op minimizes only the av-scope variables
(var_scope='av-blstm-twosteps', models.py:284-293); the video net is
restored from `model_ckp_vnet` (training.py:115-116,153-159).  Here that is
expressed as a `trainable_mask` the optimizer consumes, plus a
stop_gradient on the video prediction.
"""

from __future__ import annotations

import jax

from avsi.models import blstm

VSPEC = blstm.parse_model_name("v-blstm")
AVSPEC = blstm.parse_model_name("av-blstm")


def init(rng, config: dict) -> dict:
    k1, k2 = jax.random.split(rng)
    return {
        "vnet": blstm.init(k1, config, VSPEC),
        "avnet": blstm.init(k2, config, AVSPEC),
    }


def trainable_mask(params: dict) -> dict:
    """True where the optimizer should update (av branch only)."""
    return {
        "vnet": jax.tree_util.tree_map(lambda _: False, params["vnet"]),
        "avnet": jax.tree_util.tree_map(lambda _: True, params["avnet"]),
    }


def forward(
    params: dict, batch: dict, config: dict, stats: tuple, train: bool = False, rng=None
) -> dict:
    rng_v = rng_av = rng
    if rng is not None:
        rng_v, rng_av = jax.random.split(rng)  # independent dropout masks
    v_out = blstm.forward(
        params["vnet"], batch, config, stats, spec=VSPEC, train=train, rng=rng_v
    )
    # the video prediction is the audio input of the AV net; the vnet is not
    # trained through this path (train_vars scoping in the reference)
    v_pred = jax.lax.stop_gradient(v_out["prediction"])
    av_out = blstm.forward(
        params["avnet"],
        batch,
        config,
        stats,
        spec=AVSPEC,
        train=train,
        rng=rng_av,
        audio_features=v_pred,
    )
    av_out["video_prediction"] = v_out["prediction"]
    return av_out


def losses(outputs: dict, batch: dict, config: dict) -> dict:
    return blstm.losses(outputs, batch, config, spec=AVSPEC)


def enhanced_sources(outputs, batch, config, stats, oracle_phase=False):
    return blstm.enhanced_sources(outputs, batch, config, stats, oracle_phase)
