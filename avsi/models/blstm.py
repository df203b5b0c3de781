"""The BLSTM speech-inpainting model family, unified.

One configurable implementation covers what the reference spreads over five
near-duplicate classes in `/root/reference/av_speech_inpainting/models.py`:

  name pattern                      reference class                 (lines)
  {a,v,av}-blstm                    StackedBLSTMModel               :11-237
  {a,v,av}-blstm-ssnn               StackedBLSTMSSNNModel           :718-1117
  {a,v,av}-blstm-emb                StackedBLSTMEmbeddingModel      :1120-1472
  {a,v,av}-blstm-ctc                StackedBLSTMCTCLossModel        :1475-1738
  {a,v,av}-blstm-ssnn-ctc           StackedBLSTMSSNNCTCLossModel    :1741-2048

Shared skeleton (models.py:30-45): wave -> STFT(24ms/12ms/512) ->
log|X| -> (x-mu)/sigma -> audio features = spec_norm * mask; inputs are the
audio features, the video features, or their concat; stacked BLSTM; dense
head 2H -> 257.

Per-variant semantics (faithfully reproduced):
  * base: prediction = seq-masked inference (no unmasked-bin restore,
    models.py:128-138); loss = mean L1 over all bins (:151); loss_hole and
    loss_valid tracked as diagnostics (:144-145).
  * ssnn / emb / ctc variants: prediction restores unmasked bins
    (spec_norm*mask + inference*(1-mask), models.py:1012); loss = loss_hole
    (:1028), plus ctc_weight * ctc_loss for the MTL heads (:1645).
  * ssnn conditioning (models.py:800-842): delta features -> MLP
    (2*257 -> 200 -> 200 -> 200, LeakyReLU 0.3 on the first two) ->
    zero out corrupted frames -> masked average (denominator +1) ->
    per-utterance 200-d embedding; injected at the input
    (integration_layer == 0: tiled concat, :851-876) or between BLSTM
    stacks (:877-926).
  * emb conditioning: identical injection with an external 512-d embedding
    from the TFRecord (models.py:1200-1292).

Documented deviations (reference-bug policy, SURVEY.md §7.3 #5):
  * StackedBLSTMCTCLossModel.inference references a nonexistent
    self.speaker_embedding (models.py:1565) — the plain `-ctc` variants here
    use the bare trunk (the evident intent);
  * StackedBLSTMSSNNCTCLossModel builds the SSNN embedding but does not
    concat it in the surveyed snapshot (models.py:1873-1918, commented
    experiments); here `-ssnn-ctc` injects it per `integration_layer`,
    consistent with the non-CTC SSNN class.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from avsi.models import core
from avsi.ops import ctc as ctc_ops
from avsi.ops import mel as mel_ops
from avsi.ops import stft as stft_ops
from avsi.ops.masks import sequence_mask

SSNN_DIM = 200

# STFT config shared by every BLSTM model (models.py:31)
FRAME_LENGTH, FRAME_STEP, FFT_LENGTH = 384, 192, 512


@dataclass(frozen=True)
class BLSTMSpec:
    name: str
    input_type: str  # 'a' | 'v' | 'av'
    conditioning: str | None  # None | 'ssnn' | 'emb'
    ctc: bool
    restore_unmasked: bool
    loss_on_hole_only: bool


def _dtypes(config):
    """(compute_dtype, gate_dtype) from config. gate_dtype defaults to the
    compute dtype (ROADMAP.md #3: bf16 gates are the fast bf16 layout);
    set `gate_dtype = float32` in the config to pin fp32 gate
    transcendentals under bf16 compute."""
    import jax.numpy as _jnp

    compute = _jnp.bfloat16 if config.get("compute_dtype") == "bfloat16" else _jnp.float32
    g = config.get("gate_dtype")
    gate = None if g is None else (_jnp.bfloat16 if g == "bfloat16" else _jnp.float32)
    return compute, gate


def parse_model_name(name: str) -> BLSTMSpec:
    parts = name.split("-")
    input_type = parts[0]
    if input_type not in ("a", "v", "av") or len(parts) < 2 or parts[1] != "blstm":
        raise ValueError(f"not a blstm model name: {name}")
    rest = set(parts[2:])
    conditioning = "ssnn" if "ssnn" in rest else ("emb" if "emb" in rest else None)
    ctc = "ctc" in rest
    plain = conditioning is None and not ctc
    return BLSTMSpec(
        name=name,
        input_type=input_type,
        conditioning=conditioning,
        ctc=ctc,
        restore_unmasked=not plain,
        loss_on_hole_only=not plain,
    )


def _input_dim(spec: BLSTMSpec, config: dict) -> int:
    af, vf = config["audio_feat_dim"], config["video_feat_dim"]
    return {"a": af, "v": vf, "av": af + vf}[spec.input_type]


def _cond_dim(spec: BLSTMSpec, config: dict) -> int:
    if spec.conditioning == "ssnn":
        return SSNN_DIM
    if spec.conditioning == "emb":
        return int(config.get("embedding_dim", 512))
    return 0


def init(rng, config: dict, spec: BLSTMSpec | None = None) -> dict:
    spec = spec or parse_model_name(config["model"])
    af = config["audio_feat_dim"]
    net_dim = config["net_dim"]
    int_layer = int(config.get("integration_layer", 0)) if spec.conditioning else 0
    in_dim = _input_dim(spec, config)
    cond = _cond_dim(spec, config)

    params: dict = {}
    keys = jax.random.split(rng, 8)
    if spec.conditioning == "ssnn":
        # MLP 2*af -> 200 -> 200 -> 200 (models.py:804-825)
        params["ssnn"] = core.mlp_init(
            keys[0],
            [2 * af, SSNN_DIM, SSNN_DIM, SSNN_DIM],
            stddevs=[1.0 / jnp.sqrt(af), 1.0 / jnp.sqrt(200.0), 1.0 / jnp.sqrt(200.0)],
        )
    if cond and int_layer == 0:
        params["blstm"] = core.blstm_stack_init(keys[1], in_dim + cond, net_dim)
    elif cond:
        params["blstm1"] = core.blstm_stack_init(keys[1], in_dim, net_dim[:int_layer])
        params["blstm2"] = core.blstm_stack_init(
            keys[2], 2 * net_dim[int_layer - 1] + cond, net_dim[int_layer:]
        )
    else:
        params["blstm"] = core.blstm_stack_init(keys[1], in_dim, net_dim)

    head_in = 2 * net_dim[-1]
    params["head_ipt"] = core.dense_init(keys[3], head_in, af)
    if spec.ctc:
        params["head_asr"] = core.dense_init(keys[4], head_in, config["num_asr_labels"])
    return params


def features(batch: dict, stats: tuple, config: dict) -> dict:
    """Fused front-end: wave -> log-spec -> normalize -> masked audio feats.

    Lives inside the jitted step (reference builds it into every graph,
    models.py:30-35)."""
    mean, std = stats
    logmag, re, im = stft_ops.log_magnitude_spectrogram(
        batch["target_sources"], FRAME_LENGTH, FRAME_STEP, FFT_LENGTH
    )
    af = config["audio_feat_dim"]
    t = batch["masks"].shape[1]
    logmag, re, im = logmag[:, :t, :af], re[:, :t, :af], im[:, :t, :af]
    spec_norm = (logmag - mean) / std
    return {
        "target_spec_norm": spec_norm,
        "stft_re": re,
        "stft_im": im,
        "audio_features": spec_norm * batch["masks"],
    }


def _net_inputs(spec: BLSTMSpec, feats: dict, batch: dict, audio_features=None):
    audio = feats["audio_features"] if audio_features is None else audio_features
    if spec.input_type == "a":
        return audio
    if spec.input_type == "v":
        return batch["video_features"]
    return jnp.concatenate([audio, batch["video_features"]], axis=2)


def _ssnn_frame_outputs(params: dict, audio_features: jax.Array) -> jax.Array:
    """Per-frame SSNN MLP outputs (models.py:804-825): delta features ->
    MLP (2*af -> 200 -> 200 -> 200, LeakyReLU 0.3 on the first two)."""
    inp = mel_ops.add_delta_features(audio_features, n_delta=1, N=2)  # (B,T,2*af)
    h = core.dense(params[0], inp)
    h = jax.nn.leaky_relu(h, 0.3)
    h = core.dense(params[1], h)
    h = jax.nn.leaky_relu(h, 0.3)
    return core.dense(params[2], h)  # (B, T, 200), linear


def _ssnn_embedding(params: dict, audio_features: jax.Array, masks: jax.Array):
    """SSNN speaker embedding (models.py:800-842)."""
    h = _ssnn_frame_outputs(params, audio_features)
    emb_mask = masks[:, :, 0]  # (B, T)
    masked = h * emb_mask[:, :, None]
    # note the reference's +1 in the denominator (models.py:834-835)
    return masked.sum(axis=1) / (emb_mask.sum(axis=1) + 1.0)[:, None]


def _ssnn_window_embeddings(
    params: dict,
    audio_features: jax.Array,
    masks: jax.Array,
    chunk: int,
    look: int,
    frames_no_pad: int,
) -> jax.Array:
    """Causal per-window SSNN embeddings: (B, T, af) -> (B, n_chunks, 200).

    The streaming server estimates the speaker embedding as a RUNNING
    masked average — before window k runs, only frames [0, u_k) have been
    folded (avsi/infer/streaming.py:_advance_ssnn):

      u_k = k*C + W - 2   while the window fills from pushed samples
                          (k*C + W <= F, F = frames computable without
                          pad_end; the -2 holds back frames whose
                          regression deltas are not final yet);
      u_k = min(k*C+W, T) for the flush-drained tail windows (the final
                          fold advances to the window end, end-clamped).

    Per-frame delta features of every folded frame equal the offline
    symmetric-clamped deltas (non-final folds only touch frames whose
    +-2 neighbors are already visible; final folds clamp at T-1 exactly
    like the offline pad), so a prefix-sum over the offline per-frame MLP
    outputs reproduces the live fold exactly.  LC training conditions
    window k on emb[:, k] — the signal the live path actually provides —
    instead of the whole-utterance average it never sees.
    """
    t = audio_features.shape[1]
    h = _ssnn_frame_outputs(params, audio_features)
    emb_mask = masks[:, :, 0]  # (B, T)
    hm = h * emb_mask[:, :, None]
    # prefix[:, u] = sum over frames t < u (leading zero row)
    prefix = jnp.pad(jnp.cumsum(hm, axis=1), ((0, 0), (1, 0), (0, 0)))
    cnt = jnp.pad(jnp.cumsum(emb_mask, axis=1), ((0, 0), (1, 0)))
    n_chunks = -(-t // chunk)
    w = chunk + look
    k = jnp.arange(n_chunks)
    end = k * chunk + w
    u = jnp.where(
        end <= frames_no_pad,
        jnp.clip(end - 2, 0, t),
        jnp.minimum(end, t),
    )
    return prefix[:, u] / (cnt[:, u] + 1.0)[:, :, None]


def forward(
    params: dict,
    batch: dict,
    config: dict,
    stats: tuple,
    spec: BLSTMSpec | None = None,
    train: bool = False,
    rng=None,
    audio_features=None,
) -> dict:
    """Full forward pass. Returns feats + prediction (+ asr logits)."""
    spec = spec or parse_model_name(config["model"])
    compute_dtype, gate_dtype = _dtypes(config)
    # lstm_impl="pallas" (set by the inference entry points and the training
    # loop on TPU): fused Pallas recurrence instead of the scan; with
    # lstm_mesh set (data-sharded paths) the kernel rides shard_map over
    # the mesh's data axis (core.bilstm_layer)
    impl = str(config.get("lstm_impl", "scan") or "scan")
    mesh = config.get("lstm_mesh") if impl == "pallas" else None
    # latency-controlled training (lc_chunk/lc_lookahead config keys): the
    # BLSTM backward context is truncated EXACTLY like the streaming
    # serving path, so the trained function == the served function
    # (core.lc_bilstm_layer; ROADMAP.md #5 causal-variant follow-on)
    lc = None
    if int(config.get("lc_chunk", 0) or 0) > 0:
        lc = (int(config["lc_chunk"]), int(config.get("lc_lookahead", 0) or 0))
    feats = features(batch, stats, config)
    net_in = _net_inputs(spec, feats, batch, audio_features)
    t = net_in.shape[1]
    int_layer = int(config.get("integration_layer", 0)) if spec.conditioning else 0

    emb = None
    if spec.conditioning == "ssnn":
        af_in = feats["audio_features"] if audio_features is None else audio_features
        if lc is not None:
            # train on the CAUSAL per-window running average the streaming
            # server provides, not the whole-utterance average it never sees
            n_samples = batch["target_sources"].shape[1]
            frames_no_pad = max(0, (n_samples - FRAME_LENGTH) // FRAME_STEP + 1)
            emb = _ssnn_window_embeddings(
                params["ssnn"], af_in, batch["masks"], lc[0], lc[1], frames_no_pad
            )
        else:
            emb = _ssnn_embedding(params["ssnn"], af_in, batch["masks"])
    elif spec.conditioning == "emb":
        emb = batch["embeddings"]

    if lc is not None:
        # LC runs the whole flattened stack through the window-space
        # recursion (core.lc_blstm_stack), injecting the embedding at the
        # same layer the streaming server does (streaming._layer_list) —
        # chaining per-sub-stack calls would diverge from serving at the
        # lookahead frames for >=2 layers.
        if "blstm" in params:
            layer_seq = [
                (p, emb is not None and int_layer == 0 and i == 0)
                for i, p in enumerate(params["blstm"])
            ]
        else:
            layer_seq = [(p, False) for p in params["blstm1"]]
            layer_seq += [(p, i == 0) for i, p in enumerate(params["blstm2"])]
        rnn_out = core.lc_blstm_stack(
            layer_seq, net_in, emb, lc[0], lc[1], compute_dtype, gate_dtype
        )
    elif emb is not None and int_layer == 0:
        tiled = jnp.broadcast_to(emb[:, None, :], (emb.shape[0], t, emb.shape[1]))
        rnn_out = core.blstm_stack(
            params["blstm"], jnp.concatenate([net_in, tiled], axis=2), compute_dtype,
            gate_dtype, impl=impl, mesh=mesh, forward_only=not train,
        )
    elif emb is not None:
        mid = core.blstm_stack(
            params["blstm1"], net_in, compute_dtype, gate_dtype, impl=impl,
            mesh=mesh, forward_only=not train,
        )
        tiled = jnp.broadcast_to(emb[:, None, :], (emb.shape[0], t, emb.shape[1]))
        rnn_out = core.blstm_stack(
            params["blstm2"], jnp.concatenate([mid, tiled], axis=2), compute_dtype,
            gate_dtype, impl=impl, mesh=mesh, forward_only=not train,
        )
    else:
        rnn_out = core.blstm_stack(
            params["blstm"], net_in, compute_dtype, gate_dtype, impl=impl,
            mesh=mesh, forward_only=not train,
        )

    rnn_out = core.dropout(
        rng, rnn_out, float(config.get("dropout_rate", 0.0)), deterministic=not train
    )
    inference = core.dense(params["head_ipt"], rnn_out).astype(jnp.float32)

    seq_mask = sequence_mask(batch["sequence_lengths"], t)[:, :, None]
    if spec.restore_unmasked:
        prediction = (
            feats["target_spec_norm"] * batch["masks"] + inference * (1 - batch["masks"])
        )
    else:
        prediction = inference
    prediction = prediction * seq_mask

    out = dict(feats)
    out["inference"] = inference
    out["prediction"] = prediction
    if spec.ctc:
        out["asr_logits"] = core.dense(params["head_asr"], rnn_out).astype(jnp.float32)
    return out


def losses(outputs: dict, batch: dict, config: dict, spec: BLSTMSpec | None = None) -> dict:
    """L1 losses (+ CTC), mirroring models.py:141-159 / :1019-1037 / :1634-1653."""
    spec = spec or parse_model_name(config["model"])
    masks = batch["masks"]
    diff = jnp.abs(outputs["target_spec_norm"] - outputs["prediction"])
    # max(denom, 1): a hole-free (or fully-masked) batch must yield 0,
    # not 0/0 = NaN that would trip the trainer's NaN abort
    loss_hole = jnp.sum(diff * (1 - masks)) / jnp.maximum(jnp.sum(1 - masks), 1.0)
    loss_valid = jnp.sum(diff * masks) / jnp.maximum(jnp.sum(masks), 1.0)
    if spec.loss_on_hole_only:
        loss_func = loss_hole
    else:
        loss_func = jnp.mean(diff)
    out = {"loss_hole": loss_hole, "loss_valid": loss_valid}
    if spec.ctc:
        out["ctc_loss"] = ctc_ops.ctc_loss(
            outputs["asr_logits"],
            batch["sequence_lengths"],
            batch["labels"],
            batch["labels_lengths"],
        )
        loss_func = loss_func + float(config["ctc_loss"]) * out["ctc_loss"]
    out["loss"] = loss_func
    return out


def enhanced_sources(
    outputs: dict, batch: dict, config: dict, stats: tuple, oracle_phase: bool = False
) -> jax.Array:
    """Reconstruct the enhanced waveform (models.py:181-197).

    Phase is the target phase zeroed in the hole (masked phase) or the full
    oracle phase."""
    mean, std = stats
    mag = jnp.exp(outputs["prediction"] * std + mean)
    re, im = outputs["stft_re"], outputs["stft_im"]
    if not oracle_phase:
        re = re * batch["masks"]
        im = im * batch["masks"]
    # phase-free resynthesis: arctan2 -> cos/sin round-trips through three
    # VPU transcendentals per bin; normalizing (re, im) directly is the
    # same math (stft.waveform_from_mag_complex, zero bins -> angle 0)
    return stft_ops.waveform_from_mag_complex(
        mag,
        re,
        im,
        num_samples=int(config["audio_len"]),
        frame_length=FRAME_LENGTH,
        frame_step=FRAME_STEP,
        fft_length=FFT_LENGTH,
    )
