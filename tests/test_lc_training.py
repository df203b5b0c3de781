"""Latency-controlled (LC) training mode (core.lc_bilstm_layer).

Contract: with lc_chunk/lc_lookahead set, the offline forward computes
EXACTLY the function the streaming serving path
(avsi/infer/streaming.py) executes at chunk/lookahead — the forward
recurrent state is continuous, the backward state restarts at each
window's end, sequence-end windows are zero-feature-padded.  Training
with the serving latency therefore optimizes the served function itself
(ROADMAP.md #5 causal-variant follow-on).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsi.infer import streaming
from avsi.models import blstm as blstm_lib
from avsi.models import core

from helpers import identity_stats, synth_batch, tiny_config

AL = 4800  # 25 frames
T = 25


def test_lc_layer_matches_streaming_windows():
    """Layer-level: lc_bilstm_layer == chaining the streaming LC layer
    window by window with forward-state carry."""
    rng = jax.random.PRNGKey(0)
    d_in, hidden, chunk, look = 12, 10, 5, 7
    params = core.lstm_layer_init(rng, d_in, hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, T, d_in))

    got = core.lc_bilstm_layer(params, x, chunk, look)
    assert got.shape == (2, T, 2 * hidden)

    w = chunk + look
    carry_h = jnp.zeros((2, hidden))
    carry_c = jnp.zeros((2, hidden))
    outs = []
    for t0 in range(0, T, chunk):
        win = np.zeros((2, w, d_in), np.float32)
        real = min(w, T - t0)
        win[:, :real] = np.asarray(x)[:, t0 : t0 + real]
        out, carry_h, carry_c = streaming._lc_bilstm_layer(
            params, jnp.asarray(win), carry_h, carry_c, chunk, jnp.float32
        )
        outs.append(np.asarray(out)[:, :chunk])
    want = np.concatenate(outs, axis=1)[:, :T]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_lc_stack_matches_streaming_windows_multilayer():
    """Stack-level, >=2 layers: lc_blstm_stack == running the WHOLE stack
    per window with per-layer forward-state carry, exactly like
    streaming._window_step's layer loop.  Covers the multi-layer subtlety
    (upper layers see window-local lookahead recomputations) and the
    zero-padded tail (T not divisible by chunk)."""
    rng = jax.random.PRNGKey(2)
    d_in, chunk, look, t_len = 6, 5, 7, 23  # tail: 23 = 4*5 + 3
    hiddens = [8, 9, 7]
    layers = []
    d = d_in
    for i, h in enumerate(hiddens):
        layers.append(core.lstm_layer_init(jax.random.fold_in(rng, i), d, h))
        d = 2 * h
    x = jax.random.normal(jax.random.PRNGKey(9), (2, t_len, d_in))

    got = core.lc_blstm_stack(
        [(p, False) for p in layers], x, None, chunk, look
    )
    assert got.shape == (2, t_len, 2 * hiddens[-1])

    w = chunk + look
    carries = [
        (jnp.zeros((2, h)), jnp.zeros((2, h))) for h in hiddens
    ]
    outs = []
    for t0 in range(0, t_len, chunk):
        win = np.zeros((2, w, d_in), np.float32)
        real = min(w, t_len - t0)
        win[:, :real] = np.asarray(x)[:, t0 : t0 + real]
        xw = jnp.asarray(win)
        new_carries = []
        for p, (ch, cc) in zip(layers, carries):
            xw, nh, nc = streaming._lc_bilstm_layer(
                p, xw, ch, cc, chunk, jnp.float32
            )
            new_carries.append((nh, nc))
        carries = new_carries
        outs.append(np.asarray(xw)[:, :chunk])
    want = np.concatenate(outs, axis=1)[:, :t_len]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_lc_stack_embedding_injection_matches_streaming():
    """The embedding is injected at the identical point in the LC train
    stack and the streaming window loop (mid-stack, integration_layer=1)."""
    rng = jax.random.PRNGKey(4)
    d_in, chunk, look, t_len, e_dim = 5, 4, 6, 17, 3
    hiddens = [6, 8]
    layers = []
    d = d_in
    for i, h in enumerate(hiddens):
        extra = e_dim if i == 1 else 0
        layers.append(core.lstm_layer_init(jax.random.fold_in(rng, i), d + extra, h))
        d = 2 * h
    x = jax.random.normal(jax.random.PRNGKey(11), (2, t_len, d_in))
    emb = jax.random.normal(jax.random.PRNGKey(12), (2, e_dim))

    layer_seq = [(layers[0], False), (layers[1], True)]
    got = core.lc_blstm_stack(layer_seq, x, emb, chunk, look)

    w = chunk + look
    carries = [(jnp.zeros((2, h)), jnp.zeros((2, h))) for h in hiddens]
    outs = []
    for t0 in range(0, t_len, chunk):
        win = np.zeros((2, w, d_in), np.float32)
        real = min(w, t_len - t0)
        win[:, :real] = np.asarray(x)[:, t0 : t0 + real]
        xw = jnp.asarray(win)
        new_carries = []
        for (p, inject), (ch, cc) in zip(layer_seq, carries):
            if inject:
                tiled = jnp.broadcast_to(emb[:, None, :], (2, w, e_dim))
                xw = jnp.concatenate([xw, tiled], axis=2)
            xw, nh, nc = streaming._lc_bilstm_layer(
                p, xw, ch, cc, chunk, jnp.float32
            )
            new_carries.append((nh, nc))
        carries = new_carries
        outs.append(np.asarray(xw)[:, :chunk])
    want = np.concatenate(outs, axis=1)[:, :t_len]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize(
    "model,cfg_kw",
    [
        ("a-blstm", {}),
        ("av-blstm-ssnn-ctc", {}),
        # ssnn with mid-stack injection: the causal per-window embedding
        # must hit blstm2's first layer exactly like the streaming server
        ("a-blstm-ssnn", {"integration_layer": 1}),
    ],
)
def test_lc_forward_equals_chunked_streaming(model, cfg_kw):
    """Model-level: offline forward with lc_chunk/lc_lookahead equals the
    chunked streaming inference sample for sample (not just approximately
    — the LC truncation is the model now).  For ssnn models this includes
    the CAUSAL conditioning: training reproduces the streaming fold
    schedule (window k sees the running average over frames [0, u_k)),
    not the whole-utterance average; measured divergence is at the float
    accumulation floor (~1e-7 at random-init scale)."""
    chunk, look = 5, 7
    config = tiny_config(model=model, audio_len=AL, net_dim=(16, 16),
                         lc_chunk=chunk, lc_lookahead=look, **cfg_kw)
    spec = blstm_lib.parse_model_name(model)
    params = blstm_lib.init(jax.random.PRNGKey(3), config, spec)
    stats = identity_stats()
    batch = synth_batch(config, batch_size=1, seed=5, gap=(6, 13))

    out = blstm_lib.forward(params, batch, config, stats, spec=spec, train=False)
    offline_wav = np.asarray(
        blstm_lib.enhanced_sources(out, batch, config, stats, oracle_phase=False)
    )[0]

    inp = streaming.StreamingInpainter(
        config, stats, params, chunk_frames=chunk, lookahead_frames=look
    )
    wave = np.asarray(batch["target_sources"][0])
    frame_mask = np.asarray(batch["masks"][0, :, 0])
    video = np.asarray(batch["video_features"][0])
    got = streaming.stream_utterance(inp, wave, frame_mask, video)
    np.testing.assert_allclose(got[: len(offline_wav)], offline_wav, atol=1e-5)


def test_lc_train_step_runs_and_learns():
    """A jitted grad step through the LC layers is finite and decreases
    the loss (the windowed backward gather is differentiable)."""
    config = tiny_config(model="a-blstm", audio_len=AL, net_dim=(8,),
                         lc_chunk=8, lc_lookahead=8)
    spec = blstm_lib.parse_model_name("a-blstm")
    params = blstm_lib.init(jax.random.PRNGKey(0), config, spec)
    stats = identity_stats()
    batch = synth_batch(config, batch_size=2, seed=7, gap=(6, 13))

    def loss_fn(p):
        out = blstm_lib.forward(p, batch, config, stats, spec=spec, train=True)
        return blstm_lib.losses(out, batch, config, spec=spec)["loss"]

    step = jax.jit(jax.value_and_grad(loss_fn))
    l0, g = step(params)
    assert np.isfinite(float(l0))
    p2 = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, params, g)
    l1, _ = step(p2)
    assert float(l1) < float(l0)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
