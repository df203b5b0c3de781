"""Model registry: config `model` name -> (init, forward, losses, ...).

Covers the full dispatch surface of the reference trainers
(training_ctc.py:80-137 — the 15-way model dispatch — plus unet and the
standalone ASR models of training_asr.py:80-93).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from avsi.models import asr, blstm, twosteps, unet, unet_pconv

BLSTM_NAMES = [
    f"{i}-blstm{s}"
    for i in ("a", "v", "av")
    for s in ("", "-ssnn", "-emb", "-ctc", "-ssnn-ctc")
]
ALL_INPAINTING_MODELS = BLSTM_NAMES + ["av-blstm-twosteps", "unet", "unet-pconv"]
ASR_MODELS = ["a-blstm", "v-blstm", "av-blstm"]


@dataclass
class ModelDef:
    name: str
    init: Callable
    forward: Callable
    losses: Callable
    enhanced_sources: Callable | None = None
    needs_embeddings: bool = False
    needs_labels: bool = False
    trainable_mask: Callable | None = None
    # Optional hook `(params, outputs) -> params`: merge auxiliary
    # forward-pass state (e.g. batch-norm running statistics) back into
    # the params tree after the optimizer update. Keeps model-specific
    # state handling out of the generic train loop.
    apply_aux_update: Callable | None = None
    # STFT geometry of the model's front-end: (frame_length, frame_step,
    # fft_length). Everything downstream (Griffin-Lim, seq_len*hop wav
    # trimming, serving shapes) must use THIS, not hardcoded constants.
    frame_length: int = 384
    frame_step: int = 192
    fft_length: int = 512
    extra: dict = field(default_factory=dict)


def get_model(name: str) -> ModelDef:
    """Inpainting model lookup by config name."""
    if name in ("unet", "unet-pconv"):
        mod = unet if name == "unet" else unet_pconv
        return ModelDef(
            name,
            mod.init,
            mod.forward,
            mod.losses,
            mod.enhanced_sources,
            apply_aux_update=lambda p, out: mod.apply_bn_update(p, out["bn_stats"]),
            frame_length=unet.FRAME_LENGTH,
            frame_step=unet.FRAME_STEP,
            fft_length=unet.FFT_LENGTH,
        )
    if name == "av-blstm-twosteps":
        return ModelDef(
            name,
            twosteps.init,
            twosteps.forward,
            twosteps.losses,
            twosteps.enhanced_sources,
            trainable_mask=twosteps.trainable_mask,
        )
    if name in BLSTM_NAMES:
        spec = blstm.parse_model_name(name)

        def _init(rng, config):
            return blstm.init(rng, config, spec)

        def _forward(params, batch, config, stats, train=False, rng=None, **kw):
            return blstm.forward(
                params, batch, config, stats, spec=spec, train=train, rng=rng, **kw
            )

        def _losses(outputs, batch, config):
            return blstm.losses(outputs, batch, config, spec=spec)

        return ModelDef(
            name,
            _init,
            _forward,
            _losses,
            blstm.enhanced_sources,
            needs_embeddings=spec.conditioning == "emb",
            needs_labels=spec.ctc,
            extra={"spec": spec},
        )
    raise ValueError(
        f"Unknown model '{name}'. Expected one of {ALL_INPAINTING_MODELS}"
    )


def get_asr_model(name: str) -> ModelDef:
    if name not in ASR_MODELS:
        raise ValueError(f"Unknown ASR model '{name}'. Expected one of {ASR_MODELS}")
    return ModelDef(name, asr.init, asr.forward, asr.losses, needs_labels=True)
