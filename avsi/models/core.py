"""Model building blocks: dense layers and the bidirectional LSTM stack.

This single implementation replaces the reference's dual graph construction
(`tf.contrib.cudnn_rnn.CudnnLSTM` for training vs
`CudnnCompatibleLSTMCell` + `stack_bidirectional_dynamic_rnn` for inference,
`/root/reference/av_speech_inpainting/models.py:94-115`): one jitted
`lax.scan` serves both, so there is no train/infer graph divergence.

TPU mapping:
  * the input projection for a whole layer is ONE (B*T, D) x (D, 4H) matmul
    (MXU, amortized over all 250 timesteps);
  * forward and backward directions run in a single scan with the direction
    folded into a leading batch axis, so each recurrent step does one
    (2, B, H) x (2, H, 4H) batched matmul instead of two half-size ones;
  * cell state is kept in float32 regardless of compute dtype.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def truncated_normal_init(rng, shape, stddev):
    """tf.truncated_normal-style init (reference models.py:119)."""
    return stddev * jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32)


def dense_init(rng, in_dim: int, out_dim: int, stddev: float | None = None) -> dict:
    if stddev is None:
        stddev = 1.0 / math.sqrt(float(in_dim))
    return {
        "w": truncated_normal_init(rng, (in_dim, out_dim), stddev),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def dense(params: dict, x: jax.Array) -> jax.Array:
    return jnp.matmul(x, params["w"].astype(x.dtype)) + params["b"].astype(x.dtype)


def lstm_layer_init(rng, in_dim: int, hidden: int) -> dict:
    """One bidirectional layer. Leading axis 2 = (forward, backward)."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(hidden)
    wx = jax.random.uniform(k1, (2, in_dim, 4 * hidden), jnp.float32, -bound, bound)
    wh = jax.random.uniform(k2, (2, hidden, 4 * hidden), jnp.float32, -bound, bound)
    b = jnp.zeros((2, 4 * hidden), jnp.float32)
    return {"wx": wx, "wh": wh, "b": b}


def _lstm_cell(carry, xw_t, wh, gate_dtype=jnp.float32):
    """One step for both directions: carry (2, B, H) f32 each.

    `gate_dtype` is the dtype the gate nonlinearities are evaluated in;
    cell/hidden state stays float32 either way.  With gate_dtype=float32
    (the default, and the fp32 compute path) this is the round-1/2
    semantics exactly; bfloat16 gates are the measured-fastest bf16
    configuration on v5e (see ROADMAP.md #3: fp32 gates are what made
    bf16 compute SLOWER than fp32 end-to-end)."""
    h, c = carry
    gates = (
        xw_t.astype(jnp.float32)
        + jnp.einsum(
            "dbh,dhg->dbg", h.astype(wh.dtype), wh, preferred_element_type=jnp.float32
        )
    ).astype(gate_dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    f32 = jnp.float32
    c_new = jax.nn.sigmoid(f).astype(f32) * c + jax.nn.sigmoid(i).astype(f32) * jnp.tanh(g).astype(f32)
    h_new = jax.nn.sigmoid(o).astype(f32) * jnp.tanh(c_new.astype(gate_dtype)).astype(f32)
    return (h_new, c_new), h_new


def bilstm_layer(
    params: dict,
    x: jax.Array,
    compute_dtype=jnp.float32,
    gate_dtype=None,
    impl: str = "scan",
    mesh=None,
) -> jax.Array:
    """Bidirectional LSTM layer: (B, T, D) -> (B, T, 2H).

    gate_dtype=None follows compute_dtype (so bfloat16 compute gets
    bfloat16 gate transcendentals and a bfloat16 pre-projection stream —
    the fastest measured bf16 layout; float32 compute is bit-identical to
    the original fp32-everything path).

    impl="pallas" replaces the scan with the fused Pallas kernel
    (ops/pallas_lstm.py) — differentiable (custom VJP), selected via the
    `lstm_impl` config key on inference paths and the training loop.
    With a mesh (the `lstm_mesh` config key on data-sharded paths) the
    kernel partitions over the mesh's `data` axis via shard_map — per
    shard it is the same single-device program
    (pallas_lstm.bilstm_layer_pallas_sharded); tensor-parallel/multi-host/
    off-TPU paths keep the scan (resolve_impl)."""
    if impl == "pallas":
        from avsi.ops import pallas_lstm

        if mesh is not None:
            return pallas_lstm.bilstm_layer_pallas_sharded(
                params, x, mesh, compute_dtype, gate_dtype
            )
        return pallas_lstm.bilstm_layer_pallas(
            params, x, compute_dtype, gate_dtype
        )
    b_sz, t_len, _ = x.shape
    hidden = params["wh"].shape[1]
    if gate_dtype is None:
        gate_dtype = compute_dtype
    xc = x.astype(compute_dtype)
    # direction axis: fwd sees x, bwd sees time-reversed x
    x2 = jnp.stack([xc, jnp.flip(xc, axis=1)], axis=0)  # (2, B, T, D)
    wx = params["wx"].astype(compute_dtype)
    wh = params["wh"].astype(compute_dtype)
    bias = params["b"].astype(jnp.float32)
    # whole-sequence input projection: one batched MXU matmul, f32
    # accumulation; stored at compute dtype (halves the scan's HBM stream
    # under bf16 — xw is by far the largest tensor the scan reads)
    xw = (
        jnp.einsum("dbti,dig->dbtg", x2, wx, preferred_element_type=jnp.float32)
        + bias[:, None, None, :]
    ).astype(compute_dtype)
    xw_t = jnp.moveaxis(xw, 2, 0)  # (T, 2, B, 4H) time-major for scan

    h0 = jnp.zeros((2, b_sz, hidden), jnp.float32)
    c0 = jnp.zeros((2, b_sz, hidden), jnp.float32)
    # remat the cell: the scan backward re-derives gates instead of storing
    # per-step residuals in HBM (~8% faster fwd+bwd measured at B=256;
    # free for forward-only use). See ROADMAP.md #3 for the layer roofline.
    cell = jax.checkpoint(partial(_lstm_cell, wh=wh, gate_dtype=gate_dtype))
    (_, _), hs = jax.lax.scan(cell, (h0, c0), xw_t)
    # hs: (T, 2, B, H) -> fwd (B,T,H) and time-unreversed bwd
    fwd = jnp.moveaxis(hs[:, 0], 0, 1)
    bwd = jnp.flip(jnp.moveaxis(hs[:, 1], 0, 1), axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1).astype(x.dtype)


def _lc_layer_pair(
    params: dict,
    y: jax.Array,
    yhat: jax.Array,
    chunk: int,
    look: int,
    compute_dtype,
    gate_dtype,
    need_look: bool = True,
):
    """One LC-BLSTM layer in window space.

    The streaming server (`avsi/infer/streaming.py:_window_step`) runs the
    WHOLE stack over each `chunk + look` window, so an upper layer's input
    at the window's lookahead frames is the lower layer's *window-local*
    recomputation, not its finalized value.  To train exactly that
    function, every layer is represented as a pair:

      y    (B, n*chunk, D)    — canonical values at emitted frames (what
                                the streaming windows finalize; the loss
                                and the next layer's emitted inputs);
      yhat (B, n, look, D)    — window-local values at each window k's
                                lookahead frames [k*C+C, k*C+W), i.e. what
                                window k's upper layers actually see there.

    Per layer: the forward direction is one exact scan over `y` (the carry
    chain only ever passes through emitted frames), plus an n-window-batched
    continuation scan of length `look` over `yhat` seeded from the chunk-
    boundary states; the backward direction is the n-window-batched
    zero-initialized scan over concat(y-window, yhat) of length W.  All
    window-parallel work is folded into the batch axis (one scan each).

    need_look=False (the stack's last layer) skips the lookahead outputs —
    nothing consumes them.
    """
    b_sz, t_pad, _ = y.shape
    hidden = params["wh"].shape[1]
    n_chunks = t_pad // chunk
    w_len = chunk + look

    yc = y.astype(compute_dtype)
    yhc = yhat.astype(compute_dtype)
    wx = params["wx"].astype(compute_dtype)
    wh = params["wh"].astype(compute_dtype)
    bias = params["b"].astype(jnp.float32)

    # ---- forward, canonical: exact full-length scan over emitted frames.
    # Also emits the cell state so chunk-boundary (h, c) can seed the
    # window-local lookahead continuations.
    xw_f = (
        jnp.einsum("bti,ig->btg", yc, wx[0], preferred_element_type=jnp.float32)
        + bias[0]
    ).astype(compute_dtype)
    h0 = jnp.zeros((b_sz, hidden), jnp.float32)
    c0 = jnp.zeros((b_sz, hidden), jnp.float32)

    def fwd_cell(carry, xw_t):
        (h, c), _ = _lstm_cell(
            (carry[0][None], carry[1][None]), xw_t[None], wh[:1],
            gate_dtype=gate_dtype,
        )
        return (h[0], c[0]), (h[0], c[0])

    _, (hs_f, cs_f) = jax.lax.scan(
        jax.checkpoint(fwd_cell), (h0, c0), jnp.moveaxis(xw_f, 1, 0)
    )
    fwd = jnp.moveaxis(hs_f, 0, 1)  # (B, T', H)

    fwd_look = None
    if need_look and look > 0:
        # ---- forward, window-local lookahead: continue from the state at
        # each window's last emitted frame (k*C + C - 1), n windows batched.
        hb = jnp.moveaxis(hs_f[chunk - 1 :: chunk], 0, 1)  # (B, n, H)
        cb = jnp.moveaxis(cs_f[chunk - 1 :: chunk], 0, 1)
        xw_l = (
            jnp.einsum(
                "bnwi,ig->bnwg", yhc, wx[0], preferred_element_type=jnp.float32
            )
            + bias[0]
        ).astype(compute_dtype)
        xw_l = jnp.moveaxis(xw_l.reshape(b_sz * n_chunks, look, -1), 1, 0)
        _, (hs_l, _) = jax.lax.scan(
            jax.checkpoint(fwd_cell),
            (hb.reshape(b_sz * n_chunks, hidden), cb.reshape(b_sz * n_chunks, hidden)),
            xw_l,
        )
        fwd_look = jnp.moveaxis(hs_l, 0, 1).reshape(b_sz, n_chunks, look, hidden)

    # ---- backward: zero-init at each window's end, n windows batched
    x_win = jnp.concatenate(
        [yc.reshape(b_sz, n_chunks, chunk, -1), yhc], axis=2
    )  # (B, n, W, D)
    xw_b = (
        jnp.einsum(
            "bnwi,ig->bnwg", x_win, wx[1], preferred_element_type=jnp.float32
        )
        + bias[1]
    ).astype(compute_dtype)
    xw_b = xw_b.reshape(b_sz * n_chunks, w_len, 4 * hidden)
    xw_b_rev = jnp.flip(xw_b, axis=1)  # scan from window end to start
    hb0 = jnp.zeros((b_sz * n_chunks, hidden), jnp.float32)
    cb0 = jnp.zeros((b_sz * n_chunks, hidden), jnp.float32)

    def bwd_cell(carry, xw_t):
        (h, c), _ = _lstm_cell(
            (carry[0][None], carry[1][None]), xw_t[None], wh[1:],
            gate_dtype=gate_dtype,
        )
        return (h[0], c[0]), h[0]

    _, hs_b = jax.lax.scan(
        jax.checkpoint(bwd_cell), (hb0, cb0), jnp.moveaxis(xw_b_rev, 1, 0)
    )
    hs_b = jnp.flip(jnp.moveaxis(hs_b, 0, 1), axis=1)  # (B*n, W, H)
    hs_b = hs_b.reshape(b_sz, n_chunks, w_len, hidden)
    bwd = hs_b[:, :, :chunk].reshape(b_sz, t_pad, hidden)

    y_out = jnp.concatenate([fwd, bwd], axis=-1).astype(y.dtype)
    if not (need_look and look > 0):
        empty = jnp.zeros((b_sz, n_chunks, look, 2 * hidden), y.dtype)
        return y_out, empty
    yhat_out = jnp.concatenate([fwd_look, hs_b[:, :, chunk:]], axis=-1).astype(
        y.dtype
    )
    return y_out, yhat_out


def lc_blstm_stack(
    layer_seq: list,
    x: jax.Array,
    emb: jax.Array | None,
    chunk: int,
    lookahead: int,
    compute_dtype=jnp.float32,
    gate_dtype=None,
) -> jax.Array:
    """Latency-controlled BLSTM stack: (B, T, D) -> (B, T, 2*H_last).

    Train-time twin of the streaming serving path
    (`avsi/infer/streaming.py:_window_step`): the forward recurrent state
    is continuous across chunks, the backward state restarts from zero at
    each chunk's window end, sequence-end windows are zero-FEATURE-padded
    at the stack input, and — the multi-layer subtlety — each window runs
    through the WHOLE stack, so upper layers see the lower layers'
    window-local lookahead recomputations (see `_lc_layer_pair`).  Training
    with the serving chunk/lookahead therefore optimizes the literally
    served function (ROADMAP.md #5 causal-variant follow-on); the
    train==serve equivalence is asserted sample-for-sample in
    tests/test_lc_training.py, including >=2-layer stacks and the
    zero-padded tail.

    layer_seq: list of (layer_params, inject_embedding_before) pairs — the
    same flattened layout as streaming's `_layer_list`, so embedding
    injection happens at the identical point in both functions.

    emb: (B, E) for a constant per-utterance conditioner (external
    embeddings), or (B, n_chunks, E) for a PER-WINDOW conditioner — window
    k's emitted and lookahead frames all see emb[:, k], matching the
    streaming server where the conditioning signal (the ssnn causal
    running average) changes from window to window.
    """
    b_sz, t_len, _ = x.shape
    if gate_dtype is None:
        gate_dtype = compute_dtype
    chunk = int(chunk)
    look = int(lookahead)
    n_chunks = -(-t_len // chunk)
    t_pad = n_chunks * chunk

    x_pad = jnp.pad(x, ((0, 0), (0, t_pad + look - t_len), (0, 0)))
    y = x_pad[:, :t_pad]
    starts = jnp.arange(n_chunks) * chunk + chunk
    idx = starts[:, None] + jnp.arange(look)[None, :]  # (n, look)
    yhat = x_pad[:, idx] if look > 0 else jnp.zeros(
        (b_sz, n_chunks, 0, x.shape[2]), x.dtype
    )

    for i, (layer_params, inject) in enumerate(layer_seq):
        if inject and emb is not None:
            e_dim = emb.shape[-1]
            if emb.ndim == 3:  # per-window conditioner (B, n_chunks, E)
                tiled_y = jnp.repeat(emb, chunk, axis=1).astype(y.dtype)
                tiled_yh = jnp.broadcast_to(
                    emb[:, :, None, :], (b_sz, n_chunks, look, e_dim)
                ).astype(yhat.dtype)
            else:
                tiled_y = jnp.broadcast_to(
                    emb[:, None, :], (b_sz, y.shape[1], e_dim)
                ).astype(y.dtype)
                tiled_yh = jnp.broadcast_to(
                    emb[:, None, None, :], (b_sz, n_chunks, look, e_dim)
                ).astype(yhat.dtype)
            y = jnp.concatenate([y, tiled_y], axis=2)
            yhat = jnp.concatenate([yhat, tiled_yh], axis=3)
        y, yhat = _lc_layer_pair(
            layer_params, y, yhat, chunk, look, compute_dtype, gate_dtype,
            need_look=i < len(layer_seq) - 1,
        )
    return y[:, :t_len]


def lc_bilstm_layer(
    params: dict,
    x: jax.Array,
    chunk: int,
    lookahead: int,
    compute_dtype=jnp.float32,
    gate_dtype=None,
) -> jax.Array:
    """Single latency-controlled layer: (B, T, D) -> (B, T, 2H).

    For ONE layer the window-local/canonical distinction vanishes (the
    layer's inputs are the true features everywhere), so this is simply
    the one-layer stack."""
    return lc_blstm_stack(
        [(params, False)], x, None, chunk, lookahead, compute_dtype, gate_dtype
    )


def blstm_stack_init(rng, in_dim: int, net_dim: list[int]) -> list[dict]:
    layers = []
    d = in_dim
    for i, h in enumerate(net_dim):
        rng, sub = jax.random.split(rng)
        layers.append(lstm_layer_init(sub, d, h))
        d = 2 * h
    return layers


def blstm_stack(
    layers: list[dict],
    x: jax.Array,
    compute_dtype=jnp.float32,
    gate_dtype=None,
    lc: tuple[int, int] | None = None,
    impl: str = "scan",
    mesh=None,
    forward_only: bool = False,
) -> jax.Array:
    """Stacked bidirectional LSTM: (B, T, D) -> (B, T, 2*H_last).

    lc=(chunk, lookahead) trains/evaluates the stack with the
    latency-controlled window semantics (see lc_blstm_stack).  NOTE: with
    embedding injection between stacks, use lc_blstm_stack directly with
    the full flattened layer_seq — chaining two lc blstm_stack calls would
    re-finalize the lookahead frames at the stack boundary, which is NOT
    what the streaming server does.

    forward_only=True (inference/eval, no grad will flow) + impl="pallas"
    takes the fully-fused stack (pallas_lstm.blstm_stack_pallas): the
    inter-layer hidden stream never touches HBM.  Training keeps the
    per-layer custom-VJP kernels (the hoisted xw stream IS the VJP
    residual); the fused-stack kernels carry no VJP and would fail loudly
    (not silently wrongly) under jax.grad."""
    if lc is not None:
        return lc_blstm_stack(
            [(layer, False) for layer in layers], x, None, lc[0], lc[1],
            compute_dtype, gate_dtype,
        )
    if impl == "pallas" and forward_only:
        from avsi.ops import pallas_lstm

        if mesh is not None:
            return pallas_lstm.blstm_stack_pallas_sharded(
                layers, x, mesh, compute_dtype, gate_dtype
            )
        return pallas_lstm.blstm_stack_pallas(
            layers, x, compute_dtype, gate_dtype
        )
    out = x
    for layer in layers:
        out = bilstm_layer(
            layer, out, compute_dtype, gate_dtype, impl=impl, mesh=mesh
        )
    return out


def dropout(rng, x: jax.Array, rate: float, deterministic: bool) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def mlp_init(rng, dims: list[int], stddevs: list[float] | None = None) -> list[dict]:
    """Chain of dense layers (used by the SSNN speaker-embedding branch)."""
    params = []
    for i in range(len(dims) - 1):
        rng, sub = jax.random.split(rng)
        std = stddevs[i] if stddevs else None
        params.append(dense_init(sub, dims[i], dims[i + 1], std))
    return params
