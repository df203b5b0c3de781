"""Known-region waveform passthrough (`--passthrough`).

Contract under test (avsi/ops/passthrough.py + the infer/streaming wiring):
  * blend weight: exactly 1 on every sample of a gap frame (no ground-truth
    leakage into gaps), exactly 0 deep inside known regions (bit-true
    original samples there), raised-cosine ramps confined to the known
    side of each boundary, total dependence radius one frame;
  * the numpy twin equals the jax op;
  * a segment computed with one frame of mask context per side equals the
    corresponding slice of the whole-utterance weight (the invariant the
    streaming per-chunk blend relies on);
  * free-form T-F holes: a partially-known frame keeps the model output;
  * StreamingInpainter(passthrough=True) is push-size invariant and equals
    the whole-utterance blend of its own non-passthrough output;
  * lockstep fleet passthrough equals the single-stream class per sample.

The deployment lever itself is opt-in; reference-faithful full resynthesis
(models.py:128-138) stays the default — asserted by the default=False
wiring tests at the bottom.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsi.infer import streaming
from avsi.models import blstm as blstm_lib
from avsi.ops import passthrough as pt

from helpers import identity_stats, synth_batch, tiny_config

HOP = 192
T = 25
AL = HOP * T


def _frame_known(gaps, t=T):
    fk = np.ones(t, np.float32)
    for a, b in gaps:
        fk[a:b] = 0.0
    return fk


# ------------------------------------------------------------------ weight


def test_weight_gap_samples_are_pure_model_output():
    fk = _frame_known([(6, 13)])
    w = np.asarray(pt.passthrough_weight(jnp.asarray(fk)[None], HOP, AL))[0]
    gap = np.repeat(1.0 - fk, HOP)
    assert np.all(w[gap == 1.0] == 1.0)
    assert np.all((w >= 0.0) & (w <= 1.0))


def test_weight_zero_deep_in_known_regions():
    fk = _frame_known([(6, 13)])
    w = np.asarray(pt.passthrough_weight(jnp.asarray(fk)[None], HOP, AL))[0]
    # the ramp spans 2*xfade = HOP samples into the known region; one full
    # frame further everything must be bit-zero
    assert np.all(w[: 5 * HOP] == 0.0)
    assert np.all(w[14 * HOP :] == 0.0)
    # and the ramp is monotone into / out of the gap
    ramp_in = w[5 * HOP : 6 * HOP]
    assert np.all(np.diff(ramp_in) >= -1e-7) and ramp_in[-1] > 0.5


def test_weight_np_twin_matches_jax():
    rng = np.random.default_rng(0)
    fk = (rng.random(T) > 0.35).astype(np.float32)
    wj = np.asarray(pt.passthrough_weight(jnp.asarray(fk)[None], HOP, AL))[0]
    wn = pt.passthrough_weight_np(fk, HOP, AL)
    np.testing.assert_allclose(wn, wj, atol=1e-6, rtol=0)


def test_weight_one_frame_context_locality():
    """Weight of a segment rebuilt from [prev, seg, next] frame masks ==
    the slice of the whole-utterance weight — the exact invariant the
    streaming per-chunk blend (_passthrough_blend) relies on."""
    rng = np.random.default_rng(1)
    fk = (rng.random(T) > 0.4).astype(np.float32)
    full = pt.passthrough_weight_np(fk, HOP, T * HOP)
    for f0, n in [(0, 5), (5, 7), (12, 1), (20, 5)]:
        ctx = np.ones(n + 2, np.float32)
        ctx[0] = fk[f0 - 1] if f0 > 0 else 1.0
        nxt = fk[f0 + n] if f0 + n < T else 1.0
        ctx[1 : 1 + n] = fk[f0 : f0 + n]
        ctx[1 + n] = nxt
        seg = pt.passthrough_weight_np(ctx, HOP, (n + 2) * HOP)[
            HOP : (1 + n) * HOP
        ]
        np.testing.assert_allclose(
            seg, full[f0 * HOP : (f0 + n) * HOP], atol=1e-6, rtol=0
        )


def test_known_region_passthrough_blend():
    rng = np.random.default_rng(2)
    fk = _frame_known([(8, 12)])
    masks = np.broadcast_to(fk[None, :, None], (1, T, 5)).copy()
    enh = rng.normal(size=(1, AL)).astype(np.float32)
    orig = rng.normal(size=(1, AL)).astype(np.float32)
    out = np.asarray(
        pt.known_region_passthrough(
            jnp.asarray(enh), jnp.asarray(orig), jnp.asarray(masks), HOP
        )
    )
    # gap samples: pure model output; deep known: bit-true original
    np.testing.assert_array_equal(out[0, 8 * HOP : 12 * HOP],
                                  enh[0, 8 * HOP : 12 * HOP])
    np.testing.assert_array_equal(out[0, : 7 * HOP], orig[0, : 7 * HOP])
    np.testing.assert_array_equal(out[0, 13 * HOP :], orig[0, 13 * HOP :])


def test_freeform_partial_frame_keeps_model_output():
    """A frame with ANY corrupted bin counts as a gap frame (min over the
    frequency axis) — on free-form T-F hole corpora the original samples
    of a half-corrupted frame must NOT pass through."""
    rng = np.random.default_rng(3)
    masks = np.ones((1, T, 5), np.float32)
    masks[0, 10, 2] = 0.0  # one bin of one frame
    enh = rng.normal(size=(1, AL)).astype(np.float32)
    orig = rng.normal(size=(1, AL)).astype(np.float32)
    out = np.asarray(
        pt.known_region_passthrough(
            jnp.asarray(enh), jnp.asarray(orig), jnp.asarray(masks), HOP
        )
    )
    np.testing.assert_array_equal(out[0, 10 * HOP : 11 * HOP],
                                  enh[0, 10 * HOP : 11 * HOP])


# --------------------------------------------------------------- streaming


def _setup(model="a-blstm", **cfg_kw):
    config = tiny_config(model=model, audio_len=AL, net_dim=(16, 16), **cfg_kw)
    spec = blstm_lib.parse_model_name(model)
    params = blstm_lib.init(jax.random.PRNGKey(3), config, spec)
    stats = identity_stats()
    batch = synth_batch(config, batch_size=1, seed=5, gap=(6, 13))
    return config, spec, params, stats, batch


def _stream(config, stats, params, batch, passthrough, push=1536, **kw):
    wave = np.asarray(batch["target_sources"][0])
    frame_mask = np.asarray(batch["masks"][0, :, 0])
    video = np.asarray(batch["video_features"][0])
    spec = blstm_lib.parse_model_name(config["model"])
    inp = streaming.StreamingInpainter(
        config, stats, params, passthrough=passthrough, **kw
    )
    vid = video if spec.input_type != "a" else video
    return streaming.stream_utterance(inp, wave, frame_mask, vid,
                                      samples_per_push=push), wave, frame_mask


@pytest.mark.parametrize("kw", [
    {"chunk_frames": T, "lookahead_frames": 0},
    {"chunk_frames": 5, "lookahead_frames": 7},
    {"chunk_frames": 4, "lookahead_frames": 0},
])
def test_streaming_passthrough_equals_whole_utterance_blend(kw):
    """Incremental per-chunk blend == one whole-utterance blend of the same
    model output: the chunked state machine (mask context, original-sample
    bookkeeping, boundary `_pt_prev_known` carry) must be invisible."""
    config, spec, params, stats, batch = _setup("a-blstm")
    plain, wave, frame_mask = _stream(config, stats, params, batch, False, **kw)
    got, _, _ = _stream(config, stats, params, batch, True, **kw)
    w = pt.passthrough_weight_np(frame_mask, HOP, len(plain))
    orig = np.zeros(len(plain), np.float32)
    orig[: len(wave)] = wave[: len(plain)]
    want = orig * (1.0 - w) + plain * w
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)


def test_streaming_passthrough_push_size_invariance():
    config, spec, params, stats, batch = _setup("a-blstm")
    ref, _, _ = _stream(config, stats, params, batch, True, push=AL,
                        chunk_frames=5, lookahead_frames=7)
    for push in (192, 1000, 7321):
        got, _, _ = _stream(config, stats, params, batch, True, push=push,
                            chunk_frames=5, lookahead_frames=7)
        np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)


def test_streaming_passthrough_gap_at_edges():
    """Gaps touching the first and the last frame: the initial
    `_pt_prev_known` and the flush-side context must still reproduce the
    whole-utterance blend."""
    config, spec, params, stats, batch = _setup("a-blstm")
    masks = np.array(batch["masks"])
    masks[0, :4] = 0.0
    masks[0, -3:] = 0.0
    batch = dict(batch, masks=jnp.asarray(masks))
    plain, wave, frame_mask = _stream(config, stats, params, batch, False,
                                      chunk_frames=5, lookahead_frames=7)
    got, _, _ = _stream(config, stats, params, batch, True,
                        chunk_frames=5, lookahead_frames=7)
    w = pt.passthrough_weight_np(frame_mask, HOP, len(plain))
    orig = np.zeros(len(plain), np.float32)
    orig[: len(wave)] = wave[: len(plain)]
    want = orig * (1.0 - w) + plain * w
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
    # the deep-known span (one frame clear of the synth batch's own 6..12
    # gap and of the appended 22.. gap) passes through bit-true
    mid = slice(14 * HOP, 21 * HOP)
    np.testing.assert_array_equal(got[mid], wave[mid])


def test_streaming_passthrough_lookahead0_boundary_gap():
    """A gap starting EXACTLY at a chunk boundary with lookahead=0 — the
    one geometry where the pre-gap crossfade ramp (which lives in the last
    emitted frame but depends on the NEXT frame's mask) can be causally
    unavailable.  Whether it is depends only on push granularity: a frame's
    mask is pushed once its full 384-sample window has arrived
    (stream_utterance), so any push coarser than one hop delivers frame
    f+1's mask together with the samples that complete frame f, and the
    blend is sample-identical to the offline weight even at lookahead 0.
    Only strictly frame-granular pushes (192 samples) leave the next mask
    unseen at emit time; then the unseen frame is treated as known — the
    known samples before the boundary stay 100 % original and gap samples
    stay 100 % model output (a hard splice instead of a fade; documented
    in the StreamingInpainter docstring)."""
    config, spec, params, stats, batch = _setup("a-blstm")
    masks = np.array(batch["masks"])
    masks[0] = 1.0
    masks[0, 8:14] = 0.0  # gap start == the chunk_frames=4 boundary
    batch = dict(batch, masks=jnp.asarray(masks))

    # default 1536-sample pushes: the next frame's mask is always buffered
    # at emit time -> exact identity even at lookahead 0
    for la in (2, 0):
        plain, wave, frame_mask = _stream(config, stats, params, batch,
                                          False, chunk_frames=4,
                                          lookahead_frames=la)
        got, _, _ = _stream(config, stats, params, batch, True,
                            chunk_frames=4, lookahead_frames=la)
        w = pt.passthrough_weight_np(frame_mask, HOP, len(plain))
        orig = np.zeros(len(plain), np.float32)
        orig[: len(wave)] = wave[: len(plain)]
        np.testing.assert_allclose(got, orig * (1.0 - w) + plain * w,
                                   atol=1e-5, rtol=0)

    # frame-granular pushes + lookahead 0: chunk [4..7] emits on the push
    # whose newest mask is frame 7's, so frame 8's gap is unseen — gap is
    # still 100 % model output, but the last known frame before the
    # boundary is 100 % original (the offline ramp is causally unavailable)
    plain0, _, _ = _stream(config, stats, params, batch, False, push=HOP,
                           chunk_frames=4, lookahead_frames=0)
    got0, _, _ = _stream(config, stats, params, batch, True, push=HOP,
                         chunk_frames=4, lookahead_frames=0)
    np.testing.assert_allclose(got0[8 * HOP:14 * HOP],
                               plain0[8 * HOP:14 * HOP], atol=1e-6, rtol=0)
    np.testing.assert_array_equal(got0[7 * HOP:8 * HOP],
                                  orig[7 * HOP:8 * HOP])


def test_lockstep_passthrough_matches_single_stream():
    config, spec, params, stats, _ = _setup("av-blstm-ssnn-ctc")
    b = synth_batch(config, batch_size=3, seed=9, gap=(4, 11))
    waves = np.asarray(b["target_sources"])
    masks = np.array(b["masks"][:, :, 0])
    videos = np.asarray(b["video_features"])
    masks[1, 15:22] = 0.0
    masks[2, :] = 1.0
    got = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos,
        chunk_frames=5, lookahead_frames=7, passthrough=True,
    )
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=5, lookahead_frames=7,
        passthrough=True,
    )
    for i in range(3):
        single = streaming.stream_utterance(inp, waves[i], masks[i], videos[i])
        np.testing.assert_allclose(got[i], single[: got.shape[1]],
                                   atol=2e-4, rtol=0)
    # the all-known stream is the pushed waveform verbatim
    np.testing.assert_allclose(got[2], waves[2][: got.shape[1]], atol=2e-4)


# ------------------------------------------------------------------ wiring


def test_offline_infer_step_passthrough():
    """make_infer_step(passthrough=True): known regions return the original
    int16 samples bit-true; the default (False) still resynthesizes."""
    from avsi.infer.inpaint import make_infer_step
    from avsi.models import registry

    config, spec, params, stats, batch = _setup("a-blstm")
    # int16-scale waveform (reference convention, avsi/utils/wav.py) and a
    # matching large log-mean in the stats so both the original samples AND
    # the model's resynthesis land at int16 scale — otherwise the step's
    # int16 output is all-zero and every comparison is vacuous
    batch = dict(batch,
                 target_sources=batch["target_sources"] * jnp.float32(2e4))
    stats = (np.full(257, np.log(2e4), np.float32), np.ones(257, np.float32))
    model = registry.get_model(config["model"])
    step_pt = jax.jit(make_infer_step(model, config, stats, False, "none", 0,
                                      passthrough=True))
    step_plain = jax.jit(make_infer_step(model, config, stats, False, "none", 0))
    wav_pt = np.asarray(step_pt(params, batch)[0])
    wav_plain = np.asarray(step_plain(params, batch)[0])
    orig = np.asarray(batch["target_sources"][0]).astype(np.int16)
    assert np.array_equal(wav_pt[0, : 5 * HOP], orig[: 5 * HOP])
    assert np.array_equal(wav_pt[0, 14 * HOP : AL], orig[14 * HOP : AL])
    # gap interior identical between the two modes (model output both ways)
    np.testing.assert_array_equal(wav_pt[0, 6 * HOP : 13 * HOP],
                                  wav_plain[0, 6 * HOP : 13 * HOP])
    # default mode really does resynthesize the known region (check a span
    # where the synth waveform is non-silent, away from the gap ramps)
    tail = slice(14 * HOP, AL)
    assert np.any(orig[tail] != 0)
    assert not np.array_equal(wav_plain[0, tail], orig[tail])


def test_cli_passthrough_default_off():
    from avsi.cli import parse_args

    for argv in (
        ["inference", "-d", "d", "-ad", "a", "-ef", "p", "-m", "m"],
        ["inference_siasr", "-d", "d", "-ad", "a", "-ef", "p", "-ms", "m",
         "-mr", "r", "-df", "x"],
        ["serve", "-m", "m"],
    ):
        assert parse_args(argv).passthrough is False
        assert parse_args(argv + ["--passthrough"]).passthrough is True
