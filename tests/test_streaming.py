"""Streaming (LC-BLSTM) inference vs the offline batch path.

The contract tested here (avsi/infer/streaming.py):
  * a window covering the whole utterance reproduces the offline
    `phase_recon="none"` inference exactly (same features, same BLSTM math,
    same masked-phase iSTFT) — for every conditioning variant;
  * chunked streaming is push-size invariant (buffering only, no
    math depends on how samples arrive);
  * the LC approximation with the default short window stays close to the
    offline output (forward state exact, backward truncated);
  * bookkeeping: output sample counts, buffer trimming on long streams.
"""

import numpy as np
import pytest

import jax

from avsi.infer import streaming
from avsi.models import blstm as blstm_lib

from helpers import identity_stats, synth_batch, tiny_config

AL = 4800  # 25 frames
T = 25


def _setup(model, **cfg_kw):
    config = tiny_config(model=model, audio_len=AL, net_dim=(16, 16), **cfg_kw)
    spec = blstm_lib.parse_model_name(model)
    params = blstm_lib.init(jax.random.PRNGKey(3), config, spec)
    stats = identity_stats()
    batch = synth_batch(config, batch_size=1, seed=5, gap=(6, 13))
    return config, spec, params, stats, batch


def _offline_wav(params, batch, config, stats, spec):
    out = blstm_lib.forward(params, batch, config, stats, spec=spec, train=False)
    wav = blstm_lib.enhanced_sources(out, batch, config, stats, oracle_phase=False)
    return np.asarray(wav[0])


def _streaming_inputs(batch):
    wave = np.asarray(batch["target_sources"][0])
    frame_mask = np.asarray(batch["masks"][0, :, 0])
    video = np.asarray(batch["video_features"][0])
    return wave, frame_mask, video


@pytest.mark.parametrize(
    "model,cfg_kw",
    [
        ("a-blstm", {}),
        ("v-blstm", {}),
        ("av-blstm-ssnn-ctc", {}),
        ("av-blstm-ssnn", {"integration_layer": 1}),
        ("av-blstm-emb", {}),
        # a config gate_dtype override must reach the SERVED function too
        # (regression: streaming read only compute_dtype, so bf16-compute
        # fp32-gate models streamed a different function than they trained)
        ("a-blstm", {"compute_dtype": "bfloat16", "gate_dtype": "float32"}),
        ("a-blstm-ssnn", {"compute_dtype": "bfloat16"}),
    ],
)
def test_full_window_matches_offline(model, cfg_kw):
    config, spec, params, stats, batch = _setup(model, **cfg_kw)
    off = _offline_wav(params, batch, config, stats, spec)
    wave, frame_mask, video = _streaming_inputs(batch)
    emb = np.asarray(batch["embeddings"][0]) if spec.conditioning == "emb" else None
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=T, lookahead_frames=0,
        embedding=emb, phase_fill=False,  # offline "none" uses masked phase
    )
    got = streaming.stream_utterance(inp, wave, frame_mask, video)
    assert got.shape == (T * 192,)
    scale = np.max(np.abs(off)) + 1e-12
    np.testing.assert_allclose(got, off[: T * 192], atol=2e-3 * scale, rtol=0)


def test_push_size_invariance():
    config, spec, params, stats, batch = _setup("av-blstm-ssnn-ctc")
    wave, frame_mask, video = _streaming_inputs(batch)
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=5, lookahead_frames=7
    )
    outs = [
        streaming.stream_utterance(inp, wave, frame_mask, video, samples_per_push=n)
        for n in (173, 1536, len(wave))
    ]
    for other in outs[1:]:
        np.testing.assert_allclose(outs[0], other, atol=1e-5, rtol=0)


def test_lc_window_close_to_offline():
    config, spec, params, stats, batch = _setup("a-blstm")
    off = _offline_wav(params, batch, config, stats, spec)[: T * 192]
    wave, frame_mask, _ = _streaming_inputs(batch)
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=8, lookahead_frames=16,
        phase_fill=False,  # offline "none" uses masked phase
    )
    got = streaming.stream_utterance(inp, wave, frame_mask)
    rel = np.linalg.norm(got - off) / (np.linalg.norm(off) + 1e-12)
    assert rel < 0.05, rel
    # and the hole region is actually synthesized, not silence
    hole = got[6 * 192 : 13 * 192]
    assert np.abs(hole).max() > 0


def test_phase_fill_carry_composes_across_chunks():
    """The extrapolation carry (advance + last phase + knownness) crosses
    window boundaries exactly: chunked _causal_fill equals one whole-
    sequence call, and both equal an independent numpy forward fill."""
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    b, t, f = 2, 40, 9
    phase = rng.uniform(-np.pi, np.pi, (b, t, f)).astype(np.float32)
    known = np.ones((b, t), np.float32)
    known[0, 10:22] = 0.0  # mid hole
    known[1, 0:5] = 0.0  # hole at stream start
    known[1, 30:40] = 0.0  # hole running into stream end
    phase = phase * known[:, :, None]  # masked phase, like the live path

    omega = 2 * np.pi * np.arange(f) * 192 / 512
    carry0 = (
        jnp.zeros((b, f), jnp.float32),
        jnp.asarray(np.broadcast_to(omega, (b, f)).astype(np.float32)),
        jnp.zeros((b,), jnp.float32),
    )

    whole, _ = streaming._causal_fill(
        jnp.asarray(phase), jnp.asarray(known), carry0
    )
    whole = np.asarray(whole)

    # chunked: 7-frame windows, carry threaded manually
    carry = carry0
    parts = []
    for lo in range(0, t, 7):
        ph_c, (adv, pk) = streaming._causal_fill(
            jnp.asarray(phase[:, lo : lo + 7]),
            jnp.asarray(known[:, lo : lo + 7]),
            carry,
        )
        parts.append(np.asarray(ph_c))
        carry = (jnp.asarray(ph_c[:, -1]), adv, pk)
    chunked = np.concatenate(parts, axis=1)
    np.testing.assert_allclose(chunked, whole, atol=1e-5, rtol=0)

    # independent numpy reference
    def princarg(x):
        return (x + np.pi) % (2 * np.pi) - np.pi

    for i in range(b):
        ph_prev = np.zeros(f, np.float32)
        adv = omega.copy()
        pk = 0.0
        for ti in range(t):
            if known[i, ti] > 0:
                if pk > 0:
                    adv = omega + princarg(phase[i, ti] - ph_prev - omega)
                out = phase[i, ti]
            else:
                out = ph_prev + adv
            # extrapolated phase accumulates to tens of radians; compare at
            # f32 resolution of that magnitude
            np.testing.assert_allclose(whole[i, ti], out, atol=5e-4, rtol=0)
            ph_prev = out.astype(np.float32)
            pk = known[i, ti]


def test_phase_fill_touches_only_the_hole():
    """Fill changes samples only near hole frames: with an intact mask the
    output is identical, and with a hole everything >=1 frame away from it
    (outside OLA bleed) matches the no-fill output."""
    config, spec, params, stats, batch = _setup("a-blstm")
    wave, frame_mask, _ = _streaming_inputs(batch)

    def run(mask, fill):
        inp = streaming.StreamingInpainter(
            config, stats, params, chunk_frames=8, lookahead_frames=4,
            phase_fill=fill,
        )
        return streaming.stream_utterance(inp, wave, mask)

    intact = np.ones_like(frame_mask)
    np.testing.assert_allclose(
        run(intact, True), run(intact, False), atol=1e-6, rtol=0
    )
    with_f = run(frame_mask, True)
    without = run(frame_mask, False)
    hole = np.flatnonzero(frame_mask < 0.5)
    assert hole.size, "fixture batch should contain a hole"
    near = np.zeros(len(frame_mask), bool)
    for h in hole:
        near[max(0, h - 1) : h + 2] = True
    far_samples = np.repeat(~near, 192)[: len(with_f)]
    np.testing.assert_allclose(
        with_f[far_samples], without[far_samples], atol=1e-4, rtol=0
    )
    # and inside the hole the two genuinely differ (the fill is active) —
    # scaled to the (random-init) model's output amplitude
    hole_samples = np.repeat(
        np.isin(np.arange(len(frame_mask)), hole), 192
    )[: len(with_f)]
    scale = np.abs(without).max() + 1e-12
    assert (
        np.abs(with_f[hole_samples] - without[hole_samples]).max() > 0.2 * scale
    )


def test_incremental_emission_and_latency():
    """Chunks come out as soon as the lookahead is satisfied, and the
    total equals ceil(len/192)*192 samples."""
    config, spec, params, stats, batch = _setup("a-blstm")
    wave, frame_mask, _ = _streaming_inputs(batch)
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=4, lookahead_frames=6
    )
    total = 0
    emitted_early = False
    frames_fed = 0
    for lo in range(0, len(wave), 960):  # 5 frames per push
        chunk = wave[lo : lo + 960]
        done = lo + len(chunk)
        n_frames = min(max(0, (done - 384) // 192 + 1), len(frame_mask))
        out = inp.push(chunk, frame_mask[frames_fed:n_frames])
        frames_fed = n_frames
        total += len(out)
        if done < len(wave) and len(out):
            emitted_early = True
    total += len(inp.flush())
    assert emitted_early, "no output until flush: not streaming"
    assert total == T * 192


@pytest.mark.parametrize("model", ["av-blstm-ssnn-ctc", "av-blstm"])
def test_long_stream_buffers_bounded(model):
    config, spec, params, stats, batch = _setup(model)
    wave, frame_mask, video = _streaming_inputs(batch)
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=4, lookahead_frames=4
    )
    # loop the utterance 12 times through one unbroken stream
    for rep in range(12):
        inp.push(wave, frame_mask, video)
    cap = 16 * inp.window + 2 * T
    assert len(inp._mask_buf) < cap
    assert len(inp._frames["spec_norm"]) < cap
    out = inp.flush()
    assert len(out) > 0


def test_push_after_flush_raises_until_reset():
    """flush() runs the terminal short window through the device state
    (zero-pad rows poison carries/prev frame), so a later push must fail
    loudly rather than silently emit corrupted audio; reset() reopens, and
    a second flush() is an idempotent no-op."""
    config, spec, params, stats, batch = _setup("a-blstm")
    wave, frame_mask, _ = _streaming_inputs(batch)
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=4, lookahead_frames=4
    )
    inp.push(wave, frame_mask)
    out = inp.flush()
    assert len(out) > 0
    assert len(inp.flush()) == 0  # idempotent
    with pytest.raises(RuntimeError):
        inp.push(wave, frame_mask)
    inp.reset()
    inp.push(wave, frame_mask)
    assert len(inp.flush()) == len(out)


def test_mask_underflow_raises():
    config, spec, params, stats, batch = _setup("a-blstm")
    wave, frame_mask, _ = _streaming_inputs(batch)
    inp = streaming.StreamingInpainter(config, stats, params)
    with pytest.raises(ValueError):
        inp.push(wave, frame_mask[:3])


def test_emb_model_requires_embedding():
    config, spec, params, stats, batch = _setup("av-blstm-emb")
    with pytest.raises(ValueError):
        streaming.StreamingInpainter(config, stats, params)


def test_default_window_is_trained_lc_window():
    """An LC-trained model streams at its TRAINED window by default (the
    train==serve contract); non-LC configs keep the 288 ms C=8/L=16."""
    config, spec, params, stats, batch = _setup(
        "a-blstm", lc_chunk=4, lc_lookahead=6
    )
    inp = streaming.StreamingInpainter(config, stats, params)
    assert (inp.chunk, inp.look) == (4, 6)
    # explicit values still win
    inp2 = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=8, lookahead_frames=0
    )
    assert (inp2.chunk, inp2.look) == (8, 0)
    config_plain, _, params_plain, stats_plain, _ = _setup("a-blstm")
    inp3 = streaming.StreamingInpainter(config_plain, stats_plain, params_plain)
    assert (inp3.chunk, inp3.look) == (8, 16)


def test_lockstep_default_window_is_trained_lc_window():
    """The multi-tenant lockstep path honours the same trained-window
    default as the single-stream class: an LC-trained model served through
    the fleet with no explicit window runs at its trained C/L, matching
    the single stream sample for sample."""
    config, spec, params, stats, batch = _setup(
        "a-blstm", lc_chunk=4, lc_lookahead=6
    )
    waves = np.asarray(batch["target_sources"])
    masks = np.asarray(batch["masks"][:, :, 0])
    got = streaming.stream_utterances_lockstep(config, stats, params, waves, masks)
    inp = streaming.StreamingInpainter(config, stats, params)
    assert (inp.chunk, inp.look) == (4, 6)
    single = streaming.stream_utterance(inp, waves[0], masks[0])
    np.testing.assert_allclose(got[0], single, atol=2e-4, rtol=0)


def test_lockstep_matches_single_stream():
    """The batched lockstep API replicates the single-stream class sample
    for sample — every stream in the fleet gets the exact per-stream
    window schedule, padding, and ssnn fold timing."""
    config, spec, params, stats, _ = _setup("av-blstm-ssnn-ctc")
    b = synth_batch(config, batch_size=3, seed=9, gap=(4, 11))
    waves = np.asarray(b["target_sources"])
    masks = np.array(b["masks"][:, :, 0])  # writable copy
    videos = np.asarray(b["video_features"])
    # vary the hole per stream so rows are genuinely different
    masks[1, 15:22] = 0.0
    masks[2, :] = 1.0

    got = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos,
        chunk_frames=5, lookahead_frames=7,
    )
    assert got.shape == (3, T * 192)

    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=5, lookahead_frames=7
    )
    for i in range(3):
        single = streaming.stream_utterance(inp, waves[i], masks[i], videos[i])
        np.testing.assert_allclose(got[i], single, atol=2e-4, rtol=0)


def test_streaming_transcript_matches_offline_greedy():
    """transcript=True on a CTC model: with one window covering the whole
    utterance, the incremental greedy decode must equal the offline
    greedy_decode of the model's asr_logits exactly (same math, same
    collapse semantics)."""
    from avsi.ops import ctc as ctc_ops

    config, spec, params, stats, batch = _setup("av-blstm-ssnn-ctc")
    wave, frame_mask, video = _streaming_inputs(batch)
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=T, lookahead_frames=0,
        transcript=True,
    )
    streaming.stream_utterance(inp, wave, frame_mask, video)
    out = blstm_lib.forward(params, batch, config, stats, spec=spec, train=False)
    dec = np.asarray(
        ctc_ops.greedy_decode(out["asr_logits"], batch["sequence_lengths"])
    )[0]
    offline = [int(x) for x in dec if x >= 0]
    assert inp.transcript == offline
    assert len(offline) >= 0  # may legitimately be empty for a random net


def test_streaming_transcript_push_size_invariant():
    """The incremental collapse (state across chunk boundaries) must not
    depend on how samples arrive."""
    config, spec, params, stats, batch = _setup("av-blstm-ssnn-ctc")
    wave, frame_mask, video = _streaming_inputs(batch)
    results = []
    for push in (480, 1920, len(wave)):
        inp = streaming.StreamingInpainter(
            config, stats, params, chunk_frames=5, lookahead_frames=7,
            transcript=True,
        )
        streaming.stream_utterance(inp, wave, frame_mask, video,
                                   samples_per_push=push)
        results.append(list(inp.transcript))
    assert results[0] == results[1] == results[2]


def test_lockstep_transcripts_match_single_stream():
    """Fleet transcripts: lockstep's per-stream greedy collapse equals
    each stream's StreamingInpainter incremental decode."""
    config, spec, params, stats, _ = _setup("av-blstm-ssnn-ctc")
    b = synth_batch(config, batch_size=3, seed=13, gap=(4, 11))
    waves = np.asarray(b["target_sources"])
    masks = np.array(b["masks"][:, :, 0])
    videos = np.asarray(b["video_features"])
    masks[1, 10:18] = 0.0

    wav, transcripts = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos,
        chunk_frames=5, lookahead_frames=7, transcript=True,
    )
    assert wav.shape == (3, T * 192) and len(transcripts) == 3
    for i in range(3):
        inp = streaming.StreamingInpainter(
            config, stats, params, chunk_frames=5, lookahead_frames=7,
            transcript=True,
        )
        streaming.stream_utterance(inp, waves[i], masks[i], videos[i])
        assert transcripts[i] == inp.transcript


def test_transcript_requires_ctc_head():
    config, spec, params, stats, _ = _setup("av-blstm-ssnn")
    with pytest.raises(ValueError):
        streaming.StreamingInpainter(config, stats, params, transcript=True)


def test_lockstep_final_full_window_with_pad_frame():
    """Regression: when a window is exactly full but its tail frames are
    pad_end frames (here T=25, real_frames=24, chunk=5, look=5: the t0=15
    window covers [15,25) and needs the pad frame), the class processes it
    in flush() with final=True; lockstep must compute `final` from the
    real (non-pad) frame count, not the padded T, or its fold timing and
    t_end clamp diverge in that window."""
    config, spec, params, stats, _ = _setup("av-blstm-ssnn-ctc")
    b = synth_batch(config, batch_size=2, seed=11, gap=(14, 23))
    waves = np.asarray(b["target_sources"])
    masks = np.asarray(b["masks"][:, :, 0])
    videos = np.asarray(b["video_features"])
    assert T * 192 > AL - 192  # sanity: at least one pad_end frame exists

    got = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos,
        chunk_frames=5, lookahead_frames=5,
    )
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=5, lookahead_frames=5
    )
    for i in range(2):
        single = streaming.stream_utterance(inp, waves[i], masks[i], videos[i])
        np.testing.assert_allclose(got[i], single, atol=2e-4, rtol=0)


@pytest.mark.parametrize("look", [0, 1])
def test_lockstep_ssnn_low_lookahead_burst(look):
    """Regression: at the non-final->final transition the host marks
    chunk + _DELTA_N new ssnn fold frames done in ONE window; with
    lookahead < _DELTA_N that burst exceeded the in-graph fold's w_len
    rows, so the last frames were never summed into ssnn_sum/ssnn_cnt and
    lockstep audio diverged from the single-stream class for every window
    from the transition on (the class drains the burst via
    _advance_ssnn's while loop). The hole overlaps the late frames so a
    wrong embedding is audible in the compared samples."""
    config, spec, params, stats, _ = _setup("a-blstm-ssnn")
    b = synth_batch(config, batch_size=2, seed=17, gap=(16, 24))
    waves = np.asarray(b["target_sources"])
    masks = np.array(b["masks"][:, :, 0])
    masks[1, 18:25] = 0.0  # second stream: hole runs to the stream end

    got = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks,
        chunk_frames=5, lookahead_frames=look,
    )
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=5, lookahead_frames=look
    )
    for i in range(2):
        single = streaming.stream_utterance(inp, waves[i], masks[i])
        np.testing.assert_allclose(got[i], single, atol=2e-4, rtol=0)


def test_lockstep_empty_stream():
    """Zero-frame input: the class flushes to zero samples; lockstep must
    return the same (B, 0) shape (and empty transcripts) instead of
    crashing in np.concatenate over zero windows."""
    config, spec, params, stats, _ = _setup("av-blstm-ssnn-ctc")
    out = streaming.stream_utterances_lockstep(
        config, stats, params,
        np.zeros((2, 0), np.float32), np.zeros((2, 0), np.float32),
        np.zeros((2, 0, 136), np.float32),
        chunk_frames=5, lookahead_frames=7,
    )
    assert out.shape == (2, 0)
    wav, tr = streaming.stream_utterances_lockstep(
        config, stats, params,
        np.zeros((2, 0), np.float32), np.zeros((2, 0), np.float32),
        np.zeros((2, 0, 136), np.float32),
        chunk_frames=5, lookahead_frames=7, transcript=True,
    )
    assert wav.shape == (2, 0) and tr == [[], []]


def test_lockstep_emb_and_validation():
    config, spec, params, stats, batch = _setup("av-blstm-emb")
    waves = np.asarray(batch["target_sources"])
    masks = np.asarray(batch["masks"][:, :, 0])
    videos = np.asarray(batch["video_features"])
    embs = np.asarray(batch["embeddings"])
    out = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos, embeddings=embs,
        chunk_frames=6, lookahead_frames=6,
    )
    assert out.shape == (1, T * 192) and np.isfinite(out).all()
    with pytest.raises(ValueError):
        streaming.stream_utterances_lockstep(
            config, stats, params, waves, masks[:, :5], videos, embeddings=embs
        )


def test_lockstep_sharded_fleet_matches_unsharded():
    """mesh=: the fleet shards over the data axis (multi-chip serving).
    Same program, same windows — outputs and transcripts must match the
    single-device fleet exactly (streams are independent; GSPMD only
    partitions the batch axis)."""
    from avsi.parallel import mesh as mesh_lib

    config, spec, params, stats, _ = _setup("av-blstm-ssnn-ctc")
    b = synth_batch(config, batch_size=8, seed=11, gap=(4, 11))
    waves = np.asarray(b["target_sources"])
    masks = np.array(b["masks"][:, :, 0])
    videos = np.asarray(b["video_features"])
    masks[3, 15:22] = 0.0  # vary per-stream holes
    masks[5, :] = 1.0

    base_wav, base_tr = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos,
        chunk_frames=5, lookahead_frames=7, transcript=True,
    )
    mesh = mesh_lib.get_mesh(4)
    got_wav, got_tr = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos,
        chunk_frames=5, lookahead_frames=7, transcript=True, mesh=mesh,
    )
    np.testing.assert_allclose(got_wav, base_wav, atol=2e-4, rtol=0)
    assert got_tr == base_tr

    with pytest.raises(ValueError):
        streaming.stream_utterances_lockstep(
            config, stats, params, waves[:3], masks[:3], videos[:3],
            chunk_frames=5, lookahead_frames=7, mesh=mesh,
        )


def test_lockstep_pallas_impl_matches_scan():
    """lstm_impl='pallas' on the lockstep fleet: the LC window rides the
    fused kernel (interpret mode off TPU) and must reproduce the scan
    fleet's audio and transcripts (f32: same math, kernel-padded gates)."""
    config, spec, params, stats, _ = _setup("av-blstm-ssnn-ctc")
    b = synth_batch(config, batch_size=2, seed=13, gap=(4, 11))
    waves = np.asarray(b["target_sources"])
    masks = np.array(b["masks"][:, :, 0])
    videos = np.asarray(b["video_features"])
    masks[1, 15:22] = 0.0

    base_wav, base_tr = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos,
        chunk_frames=5, lookahead_frames=7, transcript=True,
    )
    got_wav, got_tr = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos,
        chunk_frames=5, lookahead_frames=7, transcript=True,
        lstm_impl="pallas",
    )
    np.testing.assert_allclose(got_wav, base_wav, atol=2e-4, rtol=0)
    assert got_tr == base_tr


def test_single_stream_pallas_impl_matches_scan():
    """StreamingInpainter(lstm_impl='pallas'): sample-for-sample equal to
    the scan-served stream, including the carried state across pushes."""
    config, spec, params, stats, batch = _setup("a-blstm")
    wave, frame_mask, video = _streaming_inputs(batch)
    inp_s = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=5, lookahead_frames=7
    )
    ref = streaming.stream_utterance(inp_s, wave, frame_mask, None)
    inp_p = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=5, lookahead_frames=7,
        lstm_impl="pallas",
    )
    got = streaming.stream_utterance(inp_p, wave, frame_mask, None)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=0)


def test_lockstep_pallas_sharded_fleet_matches_scan():
    """The LC window kernel rides a fleet mesh via shard_map (r5: the
    last kernel carve-out closed): sharded pallas fleet == unsharded scan
    fleet sample for sample (kernel interpret mode on the CPU mesh)."""
    from avsi.parallel import mesh as mesh_lib

    config, spec, params, stats, _ = _setup("a-blstm")
    b = synth_batch(config, batch_size=4, seed=14, gap=(4, 11))
    waves = np.asarray(b["target_sources"])
    masks = np.asarray(b["masks"][:, :, 0])
    ref = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks,
        chunk_frames=5, lookahead_frames=7, lstm_impl="scan",
    )
    got = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks,
        chunk_frames=5, lookahead_frames=7,
        mesh=mesh_lib.get_mesh(4), lstm_impl="pallas",
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=0)

    # tensor-parallel meshes keep the scan: explicit pallas refused
    with pytest.raises(ValueError, match="whole parameters"):
        streaming.stream_utterances_lockstep(
            config, stats, params, waves, masks,
            chunk_frames=5, lookahead_frames=7,
            mesh=mesh_lib.get_mesh(2, model_shards=2), lstm_impl="pallas",
        )


# ----------------------------------------------------- causal gap attenuation


def test_gap_atten_whole_window_matches_offline_postfilter():
    """chunk=T/look=0 (one window covering the utterance): the causal
    gap-atten stream equals the offline forward + apply_gap_attenuation
    pipeline — the VERDICT-prescribed whole-utterance equivalence."""
    import jax.numpy as jnp

    from avsi.ops import postfilter as pf

    ga = dict(alpha=0.1, trust=1, ramp=2)  # fires inside the (6,13) gap
    config, spec, params, stats, batch = _setup("av-blstm-ssnn-ctc")
    out = blstm_lib.forward(params, batch, config, stats, spec=spec, train=False)
    stats_j = (jnp.asarray(stats[0]), jnp.asarray(stats[1]))
    out = pf.apply_gap_attenuation(out, batch, stats_j, **ga)
    off = np.asarray(blstm_lib.enhanced_sources(
        out, batch, config, stats, oracle_phase=False)[0])

    wave, frame_mask, video = _streaming_inputs(batch)
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=T, lookahead_frames=0,
        gap_atten=ga,
    )
    got = streaming.stream_utterance(inp, wave, frame_mask, video)
    scale = np.max(np.abs(off)) + 1e-12
    np.testing.assert_allclose(got, off[: T * 192], atol=2e-3 * scale, rtol=0)


def test_gap_atten_off_below_trust_active_when_deep():
    """Default trust leaves the short-gap stream bit-identical; a small
    trust attenuates the gap interior (and only it)."""
    config, spec, params, stats, batch = _setup("a-blstm")
    wave, frame_mask, video = _streaming_inputs(batch)

    def run(ga):
        inp = streaming.StreamingInpainter(
            config, stats, params, chunk_frames=5, lookahead_frames=7,
            gap_atten=ga,
        )
        return streaming.stream_utterance(inp, wave, frame_mask, video)

    base = run(None)
    # the (6,13) gap is 7 frames deep at most 3: default trust=34 -> no-op
    np.testing.assert_array_equal(
        run(dict(alpha=0.0, trust=34, ramp=16)), base)
    # alpha>=1 (the CLI 'off' convention) is a no-op too, same program
    np.testing.assert_array_equal(run(dict(alpha=1.0)), base)
    # trust=0/alpha=0: the gap interior is driven toward the -120 dB floor
    att = run(dict(alpha=0.0, trust=0, ramp=1))
    gap = slice(8 * 192, 11 * 192)  # frames 8..10, interior of (6,13)
    assert np.mean(att[gap] ** 2) < 0.05 * (np.mean(base[gap] ** 2) + 1e-9)
    # known-region samples away from the gap are untouched
    np.testing.assert_allclose(att[: 4 * 192], base[: 4 * 192], atol=1e-4)


def test_gap_atten_lockstep_matches_single_stream():
    ga = dict(alpha=0.2, trust=1, ramp=2)
    config, spec, params, stats, _ = _setup("av-blstm-ssnn-ctc")
    b = synth_batch(config, batch_size=3, seed=9, gap=(4, 11))
    waves = np.asarray(b["target_sources"])
    masks = np.array(b["masks"][:, :, 0])
    videos = np.asarray(b["video_features"])
    masks[1, 15:22] = 0.0
    masks[2, :] = 1.0  # gap-free stream: must be untouched by the filter

    got = streaming.stream_utterances_lockstep(
        config, stats, params, waves, masks, videos,
        chunk_frames=5, lookahead_frames=7, gap_atten=ga,
    )
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=5, lookahead_frames=7,
        gap_atten=ga,
    )
    for i in range(3):
        single = streaming.stream_utterance(inp, waves[i], masks[i], videos[i])
        np.testing.assert_allclose(got[i], single, atol=2e-4, rtol=0)


def test_gap_atten_push_size_invariance():
    """The left-distance carry must advance identically whatever the push
    granularity — the same invariance contract as passthrough."""
    config, spec, params, stats, batch = _setup("a-blstm")
    wave, frame_mask, video = _streaming_inputs(batch)
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=5, lookahead_frames=7,
        gap_atten=dict(alpha=0.0, trust=2, ramp=2),
    )
    outs = [
        streaming.stream_utterance(inp, wave, frame_mask, video,
                                   samples_per_push=n)
        for n in (173, 1536, len(wave))
    ]
    for other in outs[1:]:
        np.testing.assert_allclose(outs[0], other, atol=1e-5, rtol=0)


def test_gap_atten_holds_through_end_of_stream_gap():
    """r5 review regression: a gap running to the END of the utterance
    must stay attenuated through the tail — flush-window fill rows and
    pad frames are NOT a gap-terminating known edge (offline gap_depth
    treats utterance edges as unknown).  Pre-fix, the known-filled pad
    rows faked a right edge and the last trust+ramp gap frames passed
    through at full level."""
    config, spec, params, stats, batch = _setup("a-blstm")
    wave, frame_mask, video = _streaming_inputs(batch)
    mask = np.array(frame_mask)
    mask[15:] = 0.0  # gap runs to the end of the 25-frame utterance

    def run(ga):
        inp = streaming.StreamingInpainter(
            config, stats, params, chunk_frames=5, lookahead_frames=7,
            gap_atten=ga,
        )
        return streaming.stream_utterance(inp, wave, mask, video)

    base = run(None)
    att = run(dict(alpha=0.0, trust=0, ramp=1))
    # the very tail of the gap (last 3 frames) is driven to the floor too
    tail = slice(22 * 192, 25 * 192)
    assert np.mean(att[tail] ** 2) < 0.05 * (np.mean(base[tail] ** 2) + 1e-9)
    # and matches the offline postfilter exactly at a whole-utterance
    # window (the equivalence contract, now including the edge case)
    import jax.numpy as jnp

    from avsi.ops import postfilter as pf

    b2 = dict(batch)
    b2["masks"] = np.broadcast_to(
        mask[None, :, None], batch["masks"].shape
    ).astype(np.float32)
    out = blstm_lib.forward(params, b2, config, stats, spec=spec, train=False)
    stats_j = (jnp.asarray(stats[0]), jnp.asarray(stats[1]))
    out = pf.apply_gap_attenuation(out, b2, stats_j, alpha=0.1, trust=1,
                                   ramp=2)
    off = np.asarray(blstm_lib.enhanced_sources(
        out, b2, config, stats, oracle_phase=False)[0])
    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=T, lookahead_frames=0,
        gap_atten=dict(alpha=0.1, trust=1, ramp=2),
    )
    got = streaming.stream_utterance(inp, wave, mask, video)
    scale = np.max(np.abs(off)) + 1e-12
    np.testing.assert_allclose(got, off[: T * 192], atol=2e-3 * scale, rtol=0)
