"""Fused bidirectional LSTM recurrence as a Pallas TPU kernel.

Reimplements the recurrence of `models/core.bilstm_layer` (itself the
TPU-native replacement for the reference's CudnnLSTM /
CudnnCompatibleLSTMCell pair, `/root/reference/av_speech_inpainting/
models.py:94-115`) as one `pallas_call` instead of a `lax.scan`.

Why a kernel can beat the scan here (ROADMAP.md #3 history): the scan's
per-step cost is dominated by fixed XLA loop overhead — dynamic-slice of
the xw stream, two small matmuls, gate elementwise, dynamic-update-slice —
paid 250 times per layer.  The round-1 kernel (deleted, commit 659de50)
walked the grid one timestep per step with an fp32 xw stream and only
matched the scan.  This design removes the remaining overheads:

  * **K timesteps per grid step** (`block_steps`): the xw DMA arrives in
    K-step blocks (double-buffered by the Pallas pipeline) and the inner
    K-step loop is fully unrolled — per-step loop/DMA bookkeeping is paid
    T/K times, not T times;
  * **compute-dtype xw stream**: the hoisted input projection is streamed
    at bf16 under bf16 compute (the scan got this in round 3; the round-1
    kernel streamed fp32 — 2x the traffic);
  * **lane-aligned gate layout**: H=250 gates slice at lane offsets
    250/500/750, which straddle the 128-lane tiles and force per-step
    relayout shifts.  The layer wrapper pads the gate axis to
    Hp=ceil(H/128)*128 per gate (4Hp wide, zero pad rows/columns), so the
    i/f/g/o slices land on tile boundaries.  Pad lanes carry bounded
    garbage (o-gate 0.5 * tanh of a decaying pad cell) that is never read:
    pad rows of the recurrent weights are zero, so pad lanes cannot
    contaminate real lanes through the matmul;
  * **gates never touch HBM**: computed and consumed in VMEM right after
    the MXU matmul; the recurrent weights stay VMEM-resident across the
    whole grid; h/c carries live in VMEM scratch (the TPU grid is
    sequential).

Numerics mirror `core._lstm_cell` exactly: f32 gate accumulation, gate
nonlinearities evaluated in `gate_dtype`, carries kept f32.  Equivalence
vs the scan is asserted in tests/test_pallas_lstm.py (interpret mode off
TPU).

Training support (custom VJP): `bilstm_layer_pallas` is differentiable.
Under `jax.grad` the forward runs a kernel variant that additionally
writes the cell-state stream (the only residual the backward cannot
cheaply recompute), and the backward pass is a second fused kernel that
walks the grid in reverse, recomputing gate pre-activations from the
saved xw/h streams (remat-style, one extra recurrent matmul — the same
trade the scan's `jax.checkpoint` makes) while keeping the dh/dc carries
and the dWh accumulator VMEM-resident.  dWx / dbias / dx fall out of
whole-sequence MXU matmuls on the dgates stream outside the kernel,
mirroring the hoisted input projection of the forward.  Gradients match
`jax.grad` of the scan layer to f32 roundoff (tests/test_pallas_lstm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _pad_up(n: int, m: int = _LANE) -> int:
    return -(-n // m) * m


def pad_gate_params(params: dict, compute_dtype) -> tuple[dict, int]:
    """Reorder/pad (wx, wh, b) so each gate occupies a 128-aligned slot.

    Column g*H:(g+1)*H of the 4H gate axis moves to g*Hp:g*Hp+H; new
    columns and the wh rows H:Hp are zero.  Returns params in compute
    dtype (bias f32, matching the scan's f32 bias add)."""
    wx, wh, b = params["wx"], params["wh"], params["b"]
    hidden = wh.shape[1]
    hp = _pad_up(hidden)
    if hp == hidden:
        return (
            {
                "wx": wx.astype(compute_dtype),
                "wh": wh.astype(compute_dtype),
                "b": b.astype(jnp.float32),
            },
            hidden,
        )

    def pad_gates(a):  # (..., 4H) -> (..., 4Hp)
        parts = jnp.split(a, 4, axis=-1)
        pad = [(0, 0)] * (a.ndim - 1) + [(0, hp - hidden)]
        return jnp.concatenate([jnp.pad(p, pad) for p in parts], axis=-1)

    wxp = pad_gates(wx.astype(compute_dtype))
    whp = pad_gates(wh.astype(compute_dtype))
    whp = jnp.pad(whp, ((0, 0), (0, hp - hidden), (0, 0)))  # zero pad rows
    bp = pad_gates(b.astype(jnp.float32))
    return {"wx": wxp, "wh": whp, "b": bp}, hp


def _cell(xw_f32, h_prev, c_prev, wh):
    """One direction, one step — mirrors core._lstm_cell, except the gate
    nonlinearities are always evaluated in f32.  In the scan, gate_dtype
    controls the dtype of an HBM-materialized gate stream (the round-3
    bf16-gate lever); in the kernel the gates never leave VMEM, so f32
    evaluation is free — and it sidesteps a Mosaic lowering bug
    (f32 scalar constants broadcast into bf16 vectors inside sigmoid).
    The compute dtype still governs the xw stream and matmul inputs."""
    gates = xw_f32 + jnp.dot(
        h_prev.astype(wh.dtype), wh, preferred_element_type=jnp.float32
    )
    hp = gates.shape[-1] // 4
    i = gates[:, :hp]
    f = gates[:, hp : 2 * hp]
    g = gates[:, 2 * hp : 3 * hp]
    o = gates[:, 3 * hp :]
    c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _kernel(xw_ref, wh_ref, out_f_ref, out_b_ref, h_scr, c_scr, *, k_steps):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    wh_f = wh_ref[0]
    wh_b = wh_ref[1]
    hf, cf = h_scr[0], c_scr[0]
    hb, cb = h_scr[1], c_scr[1]
    for k in range(k_steps):
        # xw rows: dir 0 in forward time order, dir 1 already time-reversed
        # (the layer projects flip(x) for the backward direction, exactly
        # like the scan) — so both directions walk the block forward.
        hf, cf = _cell(xw_ref[k, 0].astype(jnp.float32), hf, cf, wh_f)
        hb, cb = _cell(xw_ref[k, 1].astype(jnp.float32), hb, cb, wh_b)
        out_f_ref[k] = hf.astype(out_f_ref.dtype)
        # un-reverse the backward stream in place: global reversed step
        # t*K + k lands at original time T-1-(t*K+k), i.e. block
        # nblocks-1-t (the out_b index map), row K-1-k.
        out_b_ref[k_steps - 1 - k] = hb.astype(out_b_ref.dtype)
    h_scr[0] = hf
    c_scr[0] = cf
    h_scr[1] = hb
    c_scr[1] = cb


def _kernel_train(xw_ref, wh_ref, out_f_ref, out_b_ref, c_f_ref, c_b_ref,
                  h_scr, c_scr, *, k_steps):
    """Forward kernel for the differentiated path: identical recurrence to
    `_kernel`, plus the cell-state stream written out per direction (same
    original-time-order layout as the h outputs) — the one residual the
    backward kernel cannot recompute without re-running the recurrence."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    wh_f = wh_ref[0]
    wh_b = wh_ref[1]
    hf, cf = h_scr[0], c_scr[0]
    hb, cb = h_scr[1], c_scr[1]
    for k in range(k_steps):
        hf, cf = _cell(xw_ref[k, 0].astype(jnp.float32), hf, cf, wh_f)
        hb, cb = _cell(xw_ref[k, 1].astype(jnp.float32), hb, cb, wh_b)
        out_f_ref[k] = hf.astype(out_f_ref.dtype)
        out_b_ref[k_steps - 1 - k] = hb.astype(out_b_ref.dtype)
        c_f_ref[k] = cf
        c_b_ref[k_steps - 1 - k] = cb
    h_scr[0] = hf
    c_scr[0] = cf
    h_scr[1] = hb
    c_scr[1] = cb


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel_fused(xf_ref, xb_ref, wx_ref, b_ref, wh_ref, out_f_ref,
                  out_b_ref, h_scr, c_scr, *, k_steps, compute_dtype):
    """`_kernel` with the input projection folded INTO the kernel.

    Round-5 layer profile (scripts/layer_profile.py, B=128 T=250 D=536
    bf16): the hoisted projection alone costs 0.82 ms vs 0.62 ms for the
    recurrence — much of it the xw (T,2,B,4Hp) HBM round-trip (131 MB
    written by the projection einsum, re-read by the recurrence kernel).
    Here the x stream (T,B,D — 4Hp/D ~ 2x smaller) is the only input
    traffic and xw lives/dies in VMEM: per step, one (B,D)x(D,4Hp) MXU
    matmul per direction feeds the cell directly.

    xf_ref: (K,B,D) block t in forward time order; xb_ref: (K,B,D) block
    nblk-1-t of the SAME time-major stream, walked in reverse row order
    in-kernel (row K-1-k), so the backward direction sees original time
    T-1-(t*K+k) — identical orientation to the pre-flipped xw stream the
    unfused kernel consumes.  Numerics parity with the hoisted path: the
    f32-accumulated projection (+bias) is round-tripped through
    compute_dtype before the cell, exactly like the stored xw stream."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    wx_f = wx_ref[0]
    wx_b = wx_ref[1]
    wh_f = wh_ref[0]
    wh_b = wh_ref[1]
    b_f = b_ref[0]
    b_b = b_ref[1]
    hf, cf = h_scr[0], c_scr[0]
    hb, cb = h_scr[1], c_scr[1]
    for k in range(k_steps):
        xw_f = (
            jnp.dot(xf_ref[k], wx_f, preferred_element_type=jnp.float32)
            + b_f
        ).astype(compute_dtype).astype(jnp.float32)
        xw_b = (
            jnp.dot(xb_ref[k_steps - 1 - k], wx_b,
                    preferred_element_type=jnp.float32)
            + b_b
        ).astype(compute_dtype).astype(jnp.float32)
        hf, cf = _cell(xw_f, hf, cf, wh_f)
        hb, cb = _cell(xw_b, hb, cb, wh_b)
        out_f_ref[k] = hf.astype(out_f_ref.dtype)
        out_b_ref[k_steps - 1 - k] = hb.astype(out_b_ref.dtype)
    h_scr[0] = hf
    c_scr[0] = cf
    h_scr[1] = hb
    c_scr[1] = cb


@functools.partial(
    jax.jit, static_argnames=("block_steps", "out_dtype", "interpret")
)
def bilstm_fused_proj(
    xt: jax.Array,
    wx: jax.Array,
    b: jax.Array,
    wh: jax.Array,
    block_steps: int = 5,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Projection + bidirectional recurrence in ONE pallas_call.

    xt: (T, B, D) time-major inputs at compute dtype (no direction
        stacking, no pre-flip — both direction walks read this one
        stream via block index maps);
    wx: (2, D, 4Hp) padded gate projections at compute dtype;
    b:  (2, 4Hp) f32 biases;
    wh: (2, Hp, 4Hp) recurrent weights at compute dtype.
    Returns (out_f, out_b), each (T, B, Hp) in original time order —
    bit-compatible with `bilstm_recurrence` on the equivalent xw stream.
    """
    t_len, b_sz, d_in = xt.shape
    ndir, d_w, four_hp = wx.shape
    assert ndir == 2 and d_w == d_in and four_hp % (4 * _LANE) == 0
    hp = four_hp // 4
    assert t_len % block_steps == 0, (t_len, block_steps)
    nblk = t_len // block_steps
    if interpret is None:
        interpret = _use_interpret()
    k = block_steps
    compute_dtype = xt.dtype
    return pl.pallas_call(
        functools.partial(_kernel_fused, k_steps=k,
                          compute_dtype=compute_dtype),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((k, b_sz, d_in), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, d_in), lambda t, _n=nblk: (_n - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d_in, four_hp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, four_hp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, four_hp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, b_sz, hp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), lambda t, _n=nblk: (_n - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
            jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xt, xt, wx, b.astype(jnp.float32), wh)


@functools.partial(
    jax.jit, static_argnames=("block_steps", "out_dtype", "interpret")
)
def bilstm_recurrence(
    xw: jax.Array,
    wh: jax.Array,
    block_steps: int = 5,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Run the bidirectional recurrence over a pre-projected gate stream.

    xw: (T, 2, B, 4Hp) input projections (+bias) at compute dtype; dir 0 in
        forward time order, dir 1 time-REVERSED (i.e. projected from
        flip(x), the same stream the scan consumes).
    wh: (2, Hp, 4Hp) recurrent weights at compute dtype (pad rows zero).
    Returns (out_f, out_b), each (T, B, Hp) in ORIGINAL time order.
    """
    t_len, ndir, b_sz, four_hp = xw.shape
    assert ndir == 2 and four_hp % (4 * _LANE) == 0, (ndir, four_hp)
    hp = four_hp // 4
    assert t_len % block_steps == 0, (t_len, block_steps)
    nblk = t_len // block_steps
    if interpret is None:
        interpret = _use_interpret()

    out_shape = [
        jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
        jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
    ]
    k = block_steps
    out_f, out_b = pl.pallas_call(
        functools.partial(_kernel, k_steps=k),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(
                (k, 2, b_sz, four_hp),
                lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, hp, four_hp), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (k, b_sz, hp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, b_sz, hp),
                lambda t, _n=nblk: (_n - 1 - t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
        ],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xw, wh)
    return out_f, out_b


@functools.partial(
    jax.jit, static_argnames=("block_steps", "out_dtype", "interpret")
)
def bilstm_recurrence_train(
    xw: jax.Array,
    wh: jax.Array,
    block_steps: int = 5,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """`bilstm_recurrence` + the f32 cell-state streams (c_f, c_b), laid
    out exactly like (out_f, out_b) — original time order per direction."""
    t_len, ndir, b_sz, four_hp = xw.shape
    assert ndir == 2 and four_hp % (4 * _LANE) == 0, (ndir, four_hp)
    hp = four_hp // 4
    assert t_len % block_steps == 0, (t_len, block_steps)
    nblk = t_len // block_steps
    if interpret is None:
        interpret = _use_interpret()
    k = block_steps
    fwd_map = lambda t: (t, 0, 0)
    bwd_map = lambda t, _n=nblk: (_n - 1 - t, 0, 0)
    return pl.pallas_call(
        functools.partial(_kernel_train, k_steps=k),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((k, 2, b_sz, four_hp), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, four_hp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, b_sz, hp), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), bwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), bwd_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
            jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
            jax.ShapeDtypeStruct((t_len, b_sz, hp), jnp.float32),
            jax.ShapeDtypeStruct((t_len, b_sz, hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xw, wh)


def _kernel_carry(xw_ref, wh_ref, hc0_ref, out_f_ref, out_b_ref, c_f_ref,
                  c_b_ref, h_scr, c_scr, *, k_steps):
    """`_kernel_train` with externally supplied initial carries — the
    LC-BLSTM window variant (streaming serving): the forward direction
    resumes from the previous window's emit-boundary state, the backward
    direction's zero init arrives as hc0[_, 1] = 0 from the wrapper."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[...] = hc0_ref[0]
        c_scr[...] = hc0_ref[1]

    wh_f = wh_ref[0]
    wh_b = wh_ref[1]
    hf, cf = h_scr[0], c_scr[0]
    hb, cb = h_scr[1], c_scr[1]
    for k in range(k_steps):
        hf, cf = _cell(xw_ref[k, 0].astype(jnp.float32), hf, cf, wh_f)
        hb, cb = _cell(xw_ref[k, 1].astype(jnp.float32), hb, cb, wh_b)
        out_f_ref[k] = hf.astype(out_f_ref.dtype)
        out_b_ref[k_steps - 1 - k] = hb.astype(out_b_ref.dtype)
        c_f_ref[k] = cf
        c_b_ref[k_steps - 1 - k] = cb
    h_scr[0] = hf
    c_scr[0] = cf
    h_scr[1] = hb
    c_scr[1] = cb


@functools.partial(
    jax.jit, static_argnames=("block_steps", "out_dtype", "interpret")
)
def bilstm_recurrence_carry(
    xw: jax.Array,
    wh: jax.Array,
    hc0: jax.Array,
    block_steps: int = 5,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """`bilstm_recurrence_train` with initial carries.

    hc0: (2, 2, B, Hp) f32 — hc0[0] = initial h per direction, hc0[1] =
    initial c per direction (dir 0 forward, dir 1 backward/time-reversed).
    Returns (out_f, out_b, c_f, c_b) exactly like the train recurrence."""
    t_len, ndir, b_sz, four_hp = xw.shape
    assert ndir == 2 and four_hp % (4 * _LANE) == 0, (ndir, four_hp)
    hp = four_hp // 4
    assert t_len % block_steps == 0, (t_len, block_steps)
    assert hc0.shape == (2, 2, b_sz, hp), (hc0.shape, (2, 2, b_sz, hp))
    nblk = t_len // block_steps
    if interpret is None:
        interpret = _use_interpret()
    k = block_steps
    fwd_map = lambda t: (t, 0, 0)
    bwd_map = lambda t, _n=nblk: (_n - 1 - t, 0, 0)
    return pl.pallas_call(
        functools.partial(_kernel_carry, k_steps=k),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((k, 2, b_sz, four_hp), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, four_hp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, b_sz, hp), lambda t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, b_sz, hp), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), bwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), bwd_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
            jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
            jax.ShapeDtypeStruct((t_len, b_sz, hp), jnp.float32),
            jax.ShapeDtypeStruct((t_len, b_sz, hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xw, wh, hc0)


def lc_bilstm_window_pallas(
    params: dict,
    x: jax.Array,
    carry_h: jax.Array,
    carry_c: jax.Array,
    emit: int,
    compute_dtype=jnp.float32,
    block_steps: int | None = None,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in for `infer/streaming._lc_bilstm_layer` on the fused kernel.

    One LC-BLSTM window (B, W, D) -> (B, W, 2H): the forward direction
    resumes from (carry_h, carry_c) (B, H) f32, the backward direction is
    zero-initialized at frame W-1 (the lookahead truncation), and the
    returned carries are the forward state after frame `emit - 1` — the
    same contract as the scan layer.  Numerics deviation (shared with the
    full-sequence `bilstm_layer_pallas`): in-kernel gates are evaluated
    f32 regardless of the config gate_dtype because they never leave VMEM
    (see `_cell`) — under bf16 gates this differs from the scan-served
    function by ~bf16 roundoff per step (the full-sequence path measured
    3e-8 of output scale on chip)."""
    b_sz, w_len, _ = x.shape
    hidden = params["wh"].shape[1]
    hp = _pad_up(hidden)
    pp, _ = pad_gate_params(params, compute_dtype)
    if block_steps is None:
        block_steps = _train_fwd_block_steps(
            w_len, b_sz, hp, compute_dtype, jnp.float32
        )
    if interpret is None:
        interpret = _use_interpret()
    _, xw_t = _project(pp, x, compute_dtype)
    h0 = carry_h.astype(jnp.float32)
    c0 = carry_c.astype(jnp.float32)
    if hp != hidden:
        padw = ((0, 0), (0, hp - hidden))
        h0 = jnp.pad(h0, padw)
        c0 = jnp.pad(c0, padw)
    zero = jnp.zeros_like(h0)
    hc0 = jnp.stack(
        [jnp.stack([h0, zero], axis=0), jnp.stack([c0, zero], axis=0)], axis=0
    )  # (2=h|c, 2=dir, B, Hp)
    out_f, out_b, c_f, _ = bilstm_recurrence_carry(
        xw_t, pp["wh"], hc0, block_steps=int(block_steps),
        out_dtype=jnp.float32, interpret=interpret,
    )
    out = _assemble(out_f, out_b, hidden, x.dtype)
    return out, out_f[emit - 1, :, :hidden], c_f[emit - 1, :, :hidden]


def _bwd_dir(xw_j, dh_in, dh_rec, dc, h_prev, c_prev, c_t, wh_d):
    """One direction, one reverse step.  dh/dc carries, h_prev, c_* are
    f32 (B, Hp/4Hp); wh_d is compute dtype.  Gate pre-activations are
    recomputed exactly as `_cell` built them (same casts), so the
    backward sees the forward's gates bit-for-bit in fp32."""
    gates = xw_j + jnp.dot(
        h_prev.astype(wh_d.dtype), wh_d, preferred_element_type=jnp.float32
    )
    hp = gates.shape[-1] // 4
    i = jax.nn.sigmoid(gates[:, :hp])
    f = jax.nn.sigmoid(gates[:, hp : 2 * hp])
    g = jnp.tanh(gates[:, 2 * hp : 3 * hp])
    o = jax.nn.sigmoid(gates[:, 3 * hp :])
    tc = jnp.tanh(c_t)
    dh = dh_in + dh_rec
    do = dh * tc * o * (1.0 - o)
    dc = dc + dh * o * (1.0 - tc * tc)
    di = dc * g * i * (1.0 - i)
    df = dc * c_prev * f * (1.0 - f)
    dg = dc * i * (1.0 - g * g)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)  # (B, 4Hp) f32
    dgates_c = dgates.astype(wh_d.dtype)
    # dh flowing to step t-1: dgates @ wh^T (contract the gate axis)
    dh_rec_new = jax.lax.dot_general(
        dgates_c, wh_d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dc_new = dc * f
    # dWh contribution: h_prev^T @ dgates (contract the batch axis)
    dwh_inc = jax.lax.dot_general(
        h_prev.astype(wh_d.dtype), dgates_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dgates, dh_rec_new, dc_new, dwh_inc


def _bwd_kernel(xw_ref, wh_ref, hf_ref, hb_ref, cf_ref, cb_ref,
                hbnd_ref, cbnd_ref, df_ref, db_ref,
                dxw_ref, dwh_ref,
                dh_scr, dc_scr, dwh_scr, *, k_steps):
    """Reverse walk.  Grid step t processes kernel-time block
    b = nblk-1-t, local steps j = k-1 .. 0 (global kernel time
    descending).  Per-ref layouts (kernel time s = b*k + j):

      xw_ref / dxw_ref  (k,2,B,4Hp)  block nblk-1-t, row j
      hf/cf/df_ref      (k,B,Hp)     block nblk-1-t, row j       (dir 0)
      hb/cb/db_ref      (k,B,Hp)     ORIGINAL time order, so
                                     block t, row k-1-j          (dir 1)
      hbnd/cbnd_ref     (1,2,B,Hp)   h/c at kernel time b*k-1
                                     (zeros for b=0)
      dwh_ref           (2,Hp,4Hp)   written once, at the last grid step
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)
        dwh_scr[...] = jnp.zeros_like(dwh_scr)

    wh_f = wh_ref[0]
    wh_b = wh_ref[1]
    dh_f, dc_f = dh_scr[0], dc_scr[0]
    dh_b, dc_b = dh_scr[1], dc_scr[1]
    dwh_f = dwh_scr[0]
    dwh_b = dwh_scr[1]
    for j in range(k_steps - 1, -1, -1):
        if j > 0:
            hprev_f = hf_ref[j - 1].astype(jnp.float32)
            cprev_f = cf_ref[j - 1]
            hprev_b = hb_ref[k_steps - j].astype(jnp.float32)
            cprev_b = cb_ref[k_steps - j]
        else:
            hprev_f = hbnd_ref[0, 0].astype(jnp.float32)
            cprev_f = cbnd_ref[0, 0]
            hprev_b = hbnd_ref[0, 1].astype(jnp.float32)
            cprev_b = cbnd_ref[0, 1]
        dg_f, dh_f, dc_f, dwf = _bwd_dir(
            xw_ref[j, 0].astype(jnp.float32), df_ref[j].astype(jnp.float32),
            dh_f, dc_f, hprev_f, cprev_f, cf_ref[j], wh_f)
        dg_b, dh_b, dc_b, dwb = _bwd_dir(
            xw_ref[j, 1].astype(jnp.float32),
            db_ref[k_steps - 1 - j].astype(jnp.float32),
            dh_b, dc_b, hprev_b, cprev_b, cb_ref[k_steps - 1 - j], wh_b)
        dwh_f = dwh_f + dwf
        dwh_b = dwh_b + dwb
        dxw_ref[j, 0] = dg_f.astype(dxw_ref.dtype)
        dxw_ref[j, 1] = dg_b.astype(dxw_ref.dtype)
    dh_scr[0], dc_scr[0] = dh_f, dc_f
    dh_scr[1], dc_scr[1] = dh_b, dc_b
    dwh_scr[0] = dwh_f
    dwh_scr[1] = dwh_b

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        dwh_ref[...] = dwh_scr[...]


@functools.partial(
    jax.jit, static_argnames=("block_steps", "interpret")
)
def bilstm_recurrence_bwd(
    xw: jax.Array,
    wh: jax.Array,
    out_f: jax.Array,
    out_b: jax.Array,
    c_f: jax.Array,
    c_b: jax.Array,
    dout_f: jax.Array,
    dout_b: jax.Array,
    block_steps: int,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Reverse pass over the recurrence.  dout_* are the upstream h grads
    in the same layout as out_* (original time order per direction).
    Returns (dxw (T,2,B,4Hp) in xw's dtype + kernel-time layout,
    dwh (2,Hp,4Hp) f32)."""
    t_len, ndir, b_sz, four_hp = xw.shape
    hp = four_hp // 4
    k = block_steps
    assert t_len % k == 0, (t_len, k)
    nblk = t_len // k
    if interpret is None:
        interpret = _use_interpret()

    # boundary h/c at kernel time b*k - 1 for each block b (zeros at b=0):
    # the one cross-block datum the reverse walk needs, since block b-1 is
    # visited AFTER block b.  dir-0 streams are kernel-time already; dir-1
    # streams are stored in original order (out_b[t0] = h at kernel time
    # T-1-t0), so kernel time b*k-1 lives at original index T-b*k.
    zrow = jnp.zeros((1, b_sz, hp), out_f.dtype)
    zrowc = jnp.zeros((1, b_sz, hp), jnp.float32)
    if nblk > 1:
        bnd_f = jnp.concatenate([zrow, out_f[k - 1::k][: nblk - 1]], axis=0)
        bnd_cf = jnp.concatenate([zrowc, c_f[k - 1::k][: nblk - 1]], axis=0)
        bnd_b = jnp.concatenate([zrow, jnp.flip(out_b[k::k], axis=0)], axis=0)
        bnd_cb = jnp.concatenate([zrowc, jnp.flip(c_b[k::k], axis=0)], axis=0)
    else:
        bnd_f, bnd_cf, bnd_b, bnd_cb = zrow, zrowc, zrow, zrowc
    h_bnd = jnp.stack(
        [bnd_f.astype(jnp.float32), bnd_b.astype(jnp.float32)], axis=1
    )  # (nblk, 2, B, Hp)
    c_bnd = jnp.stack([bnd_cf, bnd_cb], axis=1)

    rev_map3 = lambda t, _n=nblk: (_n - 1 - t, 0, 0)
    fwd_map3 = lambda t: (t, 0, 0)
    rev_map4 = lambda t, _n=nblk: (_n - 1 - t, 0, 0, 0)
    dxw, dwh = pl.pallas_call(
        functools.partial(_bwd_kernel, k_steps=k),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((k, 2, b_sz, four_hp), rev_map4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, four_hp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), rev_map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), fwd_map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), rev_map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), fwd_map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, b_sz, hp), rev_map4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, b_sz, hp), rev_map4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), rev_map3, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), fwd_map3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, 2, b_sz, four_hp), rev_map4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, four_hp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
            pltpu.VMEM((2, hp, four_hp), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, 2, b_sz, four_hp), xw.dtype),
            jax.ShapeDtypeStruct((2, hp, four_hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xw, wh, out_f, out_b, c_f, c_b, h_bnd, c_bnd, dout_f, dout_b)
    return dxw, dwh


def bilstm_layer_pallas_sharded(
    params: dict,
    x: jax.Array,
    mesh,
    compute_dtype=jnp.float32,
    gate_dtype=None,
) -> jax.Array:
    """`bilstm_layer_pallas` partitioned over the mesh's `data` axis.

    Per shard the kernel is the same single-device program — exactly what
    `shard_map` expresses: params replicated (in_spec P()), the batch
    partitioned (P("data")), zero collectives in the forward.  Under
    `jax.grad` the custom VJP runs per-shard and shard_map's transpose
    inserts the one needed collective, the psum of dparams over `data` —
    the same all-reduce the scan path's GSPMD sharding produces.  This
    closes the r4 carve-out where every sharded path forfeited the fused
    kernel (+24% inference / +59% train step); the reference's cuDNN
    kernel ran wherever the graph ran (models.py:95-104).

    check_vma=False: the custom_vjp carries no varying-manual-axes
    annotations (and the pallas_call body cannot be vma-inferred); the
    replicated-params transpose is still psum-correct — asserted against
    `jax.grad` of the scan in tests/test_pallas_lstm.py.

    Requires a mesh whose `model` axis (if any) is size 1: the kernel
    wants whole parameters, so tensor-parallel layouts keep the scan.
    Batch must divide the `data` axis size (the standard mesh contract).
    """
    if "model" in getattr(mesh, "axis_names", ()) and mesh.shape["model"] > 1:
        raise ValueError(
            "bilstm_layer_pallas_sharded needs whole (replicated) params; "
            "tensor-parallel meshes keep lstm_impl='scan'"
        )
    from jax.sharding import PartitionSpec as P

    other = tuple(a for a in mesh.axis_names if a != "data")
    pspec = P(*([None] * len(other))) if other else P()

    def body(p, xs):
        return bilstm_layer_pallas(p, xs, compute_dtype, gate_dtype)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(pspec, P("data")),
        out_specs=P("data"),
        check_vma=False,
    )(params, x)


def _kernel_fused2(af_f, ab_f, af_b, ab_b, wxa_ref, wxb_ref, b_ref, wh_ref,
                   out_f_ref, out_b_ref, h_scr, c_scr, *, k_steps,
                   compute_dtype):
    """`_kernel_fused` for a layer whose input is the PREVIOUS fused
    layer's two direction streams (each (T,B,Hp), original time order) —
    the multi-layer fusion step: the concatenated (B,T,2H) hidden stream
    never materializes between layers.  The projection splits into two
    row-blocks (wxa over the forward-stream features, wxb over the
    backward-stream features; pad rows zero, so pad-lane garbage in the
    input streams cannot leak), summed in f32 before the parity cast —
    the same contraction the fused (2H)-wide matmul performs, modulo f32
    add order.

    af_f/ab_f: block t of the fwd/bwd input streams (forward walk);
    af_b/ab_b: block nblk-1-t of the same streams (backward walk, rows
    consumed in reverse order in-kernel)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    wxa_f, wxa_b = wxa_ref[0], wxa_ref[1]
    wxb_f, wxb_b = wxb_ref[0], wxb_ref[1]
    wh_f, wh_b = wh_ref[0], wh_ref[1]
    b_f, b_b = b_ref[0], b_ref[1]
    hf, cf = h_scr[0], c_scr[0]
    hb, cb = h_scr[1], c_scr[1]
    for k in range(k_steps):
        xw_f = (
            jnp.dot(af_f[k], wxa_f, preferred_element_type=jnp.float32)
            + jnp.dot(ab_f[k], wxb_f, preferred_element_type=jnp.float32)
            + b_f
        ).astype(compute_dtype).astype(jnp.float32)
        xw_b = (
            jnp.dot(af_b[k_steps - 1 - k], wxa_b,
                    preferred_element_type=jnp.float32)
            + jnp.dot(ab_b[k_steps - 1 - k], wxb_b,
                      preferred_element_type=jnp.float32)
            + b_b
        ).astype(compute_dtype).astype(jnp.float32)
        hf, cf = _cell(xw_f, hf, cf, wh_f)
        hb, cb = _cell(xw_b, hb, cb, wh_b)
        out_f_ref[k] = hf.astype(out_f_ref.dtype)
        out_b_ref[k_steps - 1 - k] = hb.astype(out_b_ref.dtype)
    h_scr[0] = hf
    c_scr[0] = cf
    h_scr[1] = hb
    c_scr[1] = cb


@functools.partial(
    jax.jit, static_argnames=("block_steps", "out_dtype", "interpret")
)
def bilstm_fused_proj2(
    af: jax.Array,
    ab: jax.Array,
    wxa: jax.Array,
    wxb: jax.Array,
    b: jax.Array,
    wh: jax.Array,
    block_steps: int = 2,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused projection+recurrence over dual (T,B,Hp) input streams.

    af/ab: the previous layer's forward/backward hidden streams at
    compute dtype (original time order; pad lanes >= hidden arbitrary —
    wxa/wxb pad rows are zero); wxa/wxb: (2, Hp, 4Hp); b: (2, 4Hp) f32;
    wh: (2, Hp, 4Hp).  Returns (out_f, out_b) like bilstm_fused_proj."""
    t_len, b_sz, hp_in = af.shape
    ndir, d_w, four_hp = wxa.shape
    assert ndir == 2 and d_w == hp_in and four_hp % (4 * _LANE) == 0
    hp = four_hp // 4
    assert t_len % block_steps == 0, (t_len, block_steps)
    nblk = t_len // block_steps
    if interpret is None:
        interpret = _use_interpret()
    k = block_steps
    compute_dtype = af.dtype
    fwd_map = lambda t: (t, 0, 0)
    bwd_map = lambda t, _n=nblk: (_n - 1 - t, 0, 0)
    w_map = lambda t: (0, 0, 0)
    return pl.pallas_call(
        functools.partial(_kernel_fused2, k_steps=k,
                          compute_dtype=compute_dtype),
        grid=(nblk,),
        in_specs=[
            # operand order (af, ab, af, ab): fwd-walk blocks of both
            # streams, then bwd-walk blocks of both streams — matching the
            # kernel's (af_f, ab_f, af_b, ab_b) parameters
            pl.BlockSpec((k, b_sz, hp_in), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp_in), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp_in), bwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp_in), bwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp_in, four_hp), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp_in, four_hp), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, four_hp), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hp, four_hp), w_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, b_sz, hp), fwd_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b_sz, hp), bwd_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
            pltpu.VMEM((2, b_sz, hp), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
            jax.ShapeDtypeStruct((t_len, b_sz, hp), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(af, ab, af, ab, wxa, wxb, b.astype(jnp.float32), wh)


def _split_rows_pad(wx: jax.Array, hidden: int, hp: int):
    """Split a padded (2, 2*hidden, 4Hp) projection into the forward-
    stream and backward-stream row blocks, each zero-padded to Hp rows
    (pad rows zero: pad-lane garbage in the input streams is annulled)."""
    wxa = wx[:, :hidden]
    wxb = wx[:, hidden : 2 * hidden]
    if hp != hidden:
        pad = ((0, 0), (0, hp - hidden), (0, 0))
        wxa = jnp.pad(wxa, pad)
        wxb = jnp.pad(wxb, pad)
    return wxa, wxb


def blstm_stack_pallas(
    layers: list[dict],
    x: jax.Array,
    compute_dtype=jnp.float32,
    gate_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """Forward-only stacked BLSTM with FULL inter-layer fusion: the
    (B,T,2H) hidden stream never materializes between layers.

    Why (r5 layer study, scripts/layer_profile.py + bench A/B): the fused
    single-layer kernel wins −36% in isolation but LOSES end-to-end when
    dropped into the per-layer (B,T,D)-interface loop — each boundary
    then pays moveaxis/concat passes that XLA used to fuse into the
    hoisted projection einsum.  Keeping the stack time-major and feeding
    the next kernel the two direction streams directly (kernel
    `_kernel_fused2`, split-row projection) removes both the xw HBM
    round-trip AND all boundary traffic: per layer the only HBM streams
    are the input hidden streams (read twice — fwd+bwd walks) and the
    output hidden streams (written once, at compute dtype).

    Forward-only: the kernels carry no VJP (training keeps the per-layer
    hoisted-xw custom-VJP path, whose residual IS the xw stream).
    `gate_dtype` accepted for signature parity, ignored (in-kernel gates
    are f32 — see `_cell`)."""
    del gate_dtype
    b_sz, t_len, _ = x.shape
    if interpret is None:
        interpret = _use_interpret()
    hidden0 = layers[0]["wh"].shape[1]
    pp0, hp = pad_gate_params(layers[0], compute_dtype)
    d_in = x.shape[-1]
    k0 = _fused_block_steps(t_len, b_sz, d_in, hp, compute_dtype,
                            compute_dtype)
    xt = jnp.moveaxis(x.astype(compute_dtype), 1, 0)
    of, ob = bilstm_fused_proj(
        xt, pp0["wx"], pp0["b"], pp0["wh"], block_steps=k0,
        # f32 when this is also the LAST layer (assemble consumes it);
        # compute dtype for inter-layer streams
        out_dtype=jnp.float32 if len(layers) == 1 else compute_dtype,
        interpret=interpret,
    )
    hidden = hidden0
    for i, params in enumerate(layers[1:], start=1):
        h_i = params["wh"].shape[1]
        assert params["wx"].shape[1] == 2 * hidden, (
            "fused stack requires each layer's input dim to be the "
            "previous layer's 2H (no mid-stack feature injection); "
            "inject between blstm_stack calls instead"
        )
        pp, hp_i = pad_gate_params(params, compute_dtype)
        wxa, wxb = _split_rows_pad(pp["wx"], hidden, _pad_up(hidden))
        last = i == len(layers) - 1
        k_i = _fused_block_steps(t_len, b_sz, 2 * _pad_up(hidden), hp_i,
                                 compute_dtype, compute_dtype)
        of, ob = bilstm_fused_proj2(
            of, ob, wxa, wxb, pp["b"], pp["wh"], block_steps=k_i,
            out_dtype=jnp.float32 if last else compute_dtype,
            interpret=interpret,
        )
        hidden = h_i
    return _assemble(of, ob, hidden, x.dtype)


def lc_window_pallas_sharded(
    params: dict,
    x: jax.Array,
    carry_h: jax.Array,
    carry_c: jax.Array,
    emit: int,
    mesh,
    compute_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """`lc_bilstm_window_pallas` partitioned over the mesh's `data` axis
    (streams are independent: params replicated, the window batch and
    both carries partitioned; per shard the same single-device window
    kernel).  Closes the r5 'no shard_map path for the LC window kernel'
    carve-out: multi-chip lockstep fleets now serve the fused window
    recurrence too.  Forward-only (serving path, no VJP)."""
    if "model" in getattr(mesh, "axis_names", ()) and mesh.shape["model"] > 1:
        raise ValueError(
            "lc_window_pallas_sharded needs whole (replicated) params; "
            "tensor-parallel meshes keep lstm_impl='scan'"
        )
    from jax.sharding import PartitionSpec as P

    def body(p, xs, ch, cc):
        return lc_bilstm_window_pallas(
            p, xs, ch, cc, emit, compute_dtype
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )(params, x, carry_h, carry_c)


def blstm_stack_pallas_sharded(
    layers: list[dict],
    x: jax.Array,
    mesh,
    compute_dtype=jnp.float32,
    gate_dtype=None,
) -> jax.Array:
    """`blstm_stack_pallas` partitioned over the mesh's `data` axis —
    the forward-only (inference/serving/eval) twin of
    `bilstm_layer_pallas_sharded`, with the whole fused stack as the
    per-shard program (no VJP needed: forward-only by contract)."""
    if "model" in getattr(mesh, "axis_names", ()) and mesh.shape["model"] > 1:
        raise ValueError(
            "blstm_stack_pallas_sharded needs whole (replicated) params; "
            "tensor-parallel meshes keep lstm_impl='scan'"
        )
    from jax.sharding import PartitionSpec as P

    def body(ls, xs):
        return blstm_stack_pallas(ls, xs, compute_dtype, gate_dtype)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )(layers, x)


def resolve_impl(
    requested: str | None,
    sharded: bool = False,
    batch_size: int | None = None,
    mesh=None,
    multihost: bool = False,
) -> str:
    """Resolve an `lstm_impl` request to "scan" or "pallas".

    "auto" (the default on inference entry points AND the training loop)
    picks the fused kernel exactly where it is known to win: a real TPU
    backend, whole (non-tensor-parallel) parameters, a single host, and a
    PER-DEVICE batch small enough that the kernel's VMEM working set
    (xw block + outputs + h/c scratch, all O(B*Hp)) stays comfortably
    inside VMEM.  Data-sharded paths ride the kernel too, via
    `bilstm_layer_pallas_sharded` (shard_map over `data`; pass `mesh`) —
    the r4 all-sharding carve-out is gone.  What keeps the scan: CPU
    tests, tensor-parallel meshes (the kernel wants whole params),
    multi-host runs (shard_map composes in principle but cross-host
    numerics are unmeasurable in this environment — documented residual),
    and oversized per-device batches.  Training differentiates through
    the kernel via its custom VJP; LC (window-space) training has its own
    window kernel, resolved separately (`streaming.resolve_stream_impl`).
    An explicit "pallas" under an unsupported layout is refused rather
    than silently degraded."""
    req = (requested or "auto").lower()
    tp = (
        mesh is not None
        and "model" in getattr(mesh, "axis_names", ())
        and mesh.shape["model"] > 1
    )
    if req == "scan":
        return "scan"
    if req == "pallas":
        if tp:
            raise ValueError(
                "lstm_impl='pallas' needs whole parameters; tensor-parallel "
                "meshes (num_model_shards > 1) keep lstm_impl='scan'"
            )
        if multihost:
            raise ValueError(
                "lstm_impl='pallas' is not validated across hosts; "
                "multi-host runs keep lstm_impl='scan'"
            )
        if sharded and mesh is None:
            raise ValueError(
                "lstm_impl='pallas' under sharding needs the mesh (the "
                "kernel partitions via shard_map over its data axis)"
            )
        return "pallas"
    if req != "auto":
        raise ValueError(f"unknown lstm_impl {requested!r} "
                         "(expected auto/scan/pallas)")
    if multihost or tp or jax.default_backend() != "tpu":
        return "scan"
    if sharded and mesh is None:
        return "scan"
    if batch_size is not None:
        n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        if int(batch_size) // max(1, n_data) > 512:
            return "scan"
    return "pallas"


# VMEM working-set budget for the double-buffered xw/output streams.  The
# hard limit observed on v5e via the remote compiler: B=128 blocks fail at
# 2*k*step_bytes around ~26 MB (fp32 k=10, bf16 k=25) and pass at ~16 MB
# (bf16 k=10), so 12 MB keeps a wide margin while still allowing the
# measured-optimal k=5 (bf16) / k=2 (fp32) at the flagship shapes.
_VMEM_STREAM_BUDGET = 12 * 1024 * 1024


def pick_block_steps(t_len: int, target: int = 5) -> int:
    """Largest divisor of t_len that is <= target (>=1 always exists)."""
    for k in range(min(target, t_len), 0, -1):
        if t_len % k == 0:
            return k
    return 1


def _budget_block_steps(t_len: int, step_bytes: int, target: int) -> int:
    k_max = max(1, _VMEM_STREAM_BUDGET // (2 * step_bytes))
    return pick_block_steps(t_len, min(target, int(k_max)))


def auto_block_steps(t_len: int, b_sz: int, hp: int, compute_dtype,
                     out_dtype, target: int = 5) -> int:
    """Block size honoring the VMEM stream budget (double-buffered xw in
    compute dtype + both direction outputs in out dtype, per grid step)."""
    cd = jnp.dtype(compute_dtype).itemsize
    od = jnp.dtype(out_dtype).itemsize
    step_bytes = 2 * b_sz * 4 * hp * cd + 2 * b_sz * hp * od
    return _budget_block_steps(t_len, step_bytes, target)


def _fused_block_steps(t_len: int, b_sz: int, d_in: int, hp: int,
                       compute_dtype, out_dtype,
                       target: int | None = None) -> int:
    """Block size for the fused projection+recurrence kernel.  Streams per
    step: both direction x blocks (compute dtype, D wide) + both h output
    blocks.  Measured on v5e (layer_profile r5): at B=128 k=2 beats k=5
    (0.77 vs 0.85 ms) and k=10 overflows VMEM (the wx/wh weights already
    hold ~3 MB); at B=32 the smaller per-step streams flip it — k=10
    beats k=2 by 21% (0.44 vs 0.56 ms for the 3-layer stack) — so the
    target is batch-adaptive and the VMEM budget still caps it."""
    if target is None:
        target = 2 if b_sz >= 128 else 10
    cd = jnp.dtype(compute_dtype).itemsize
    od = jnp.dtype(out_dtype).itemsize
    step_bytes = 2 * b_sz * d_in * cd + 2 * b_sz * hp * od
    k_max = max(1, (8 * 1024 * 1024) // (2 * step_bytes))
    return pick_block_steps(t_len, min(target, int(k_max)))


def _train_fwd_block_steps(t_len: int, b_sz: int, hp: int, compute_dtype,
                           out_dtype, target: int = 5) -> int:
    """Like auto_block_steps, plus the f32 cell-state output streams."""
    cd = jnp.dtype(compute_dtype).itemsize
    od = jnp.dtype(out_dtype).itemsize
    step_bytes = 2 * b_sz * 4 * hp * cd + 2 * b_sz * hp * (od + 4)
    return _budget_block_steps(t_len, step_bytes, target)


# The backward kernel carries more VMEM-resident state than the forward
# (wh + the f32 dWh accumulator + dh/dc carries + the boundary blocks +
# dgates temporaries), so its stream budget is tighter.  Measured on v5e
# at the flagship shape: fp32 overflows at k=2 (stream 2.9 MB/step) and
# compiles at k=1; 7 MB lands fp32 on k=1 and bf16 on k=2 — and bf16
# k=2 already matches k=10 (3.37 vs 3.33 ms), so nothing is left on the
# table by clamping early.
_VMEM_BWD_BUDGET = 7 * 1024 * 1024


def _bwd_block_steps(t_len: int, b_sz: int, hp: int, compute_dtype,
                     out_dtype, target: int = 5) -> int:
    """Backward-kernel budget: xw + dxw (compute dtype, 4Hp wide) plus the
    h (out dtype), c (f32) and dout (compute dtype) streams per step."""
    cd = jnp.dtype(compute_dtype).itemsize
    od = jnp.dtype(out_dtype).itemsize
    step_bytes = 2 * (2 * b_sz * 4 * hp * cd)
    step_bytes += 2 * b_sz * hp * (od + 4 + cd)
    k_max = max(1, _VMEM_BWD_BUDGET // (2 * step_bytes))
    return pick_block_steps(t_len, min(target, int(k_max)))


def _project(pp: dict, x: jax.Array, compute_dtype):
    """Hoisted whole-sequence input projection on PADDED params: returns
    (x2 (2,B,T,D) compute dtype, xw (T,2,B,4Hp) compute dtype), dir 1
    projected from flip(x) — the stream both kernels consume."""
    xc = x.astype(compute_dtype)
    x2 = jnp.stack([xc, jnp.flip(xc, axis=1)], axis=0)
    xw = (
        jnp.einsum(
            "dbti,dig->dbtg", x2, pp["wx"], preferred_element_type=jnp.float32
        )
        + pp["b"][:, None, None, :]
    ).astype(compute_dtype)
    return x2, jnp.moveaxis(xw, 2, 0)


def _assemble(out_f, out_b, hidden, x_dtype):
    fwd = jnp.moveaxis(out_f[:, :, :hidden], 0, 1)  # (B, T, H)
    bwd = jnp.moveaxis(out_b[:, :, :hidden], 0, 1)  # already original order
    return jnp.concatenate([fwd, bwd], axis=-1).astype(x_dtype)


def _unpad_gates(a, hidden: int, hp: int):
    if hp == hidden:
        return a
    parts = jnp.split(a, 4, axis=-1)
    return jnp.concatenate([p[..., :hidden] for p in parts], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _layer(params, x, compute_dtype, block_steps, out_dtype, interpret):
    """Primal: the inference-path kernel (no residual streams).

    Round 5: the primal runs the fused projection+recurrence kernel
    (`bilstm_fused_proj`) — the hoisted xw stream never touches HBM.
    Measured at the flagship shape (layer_profile r5, B=128 bf16):
    1.21 -> 0.77 ms/layer (-36%).  The differentiated path (_layer_fwd)
    keeps the hoisted xw stream, which doubles as the VJP residual."""
    hidden = params["wh"].shape[1]
    b_sz, t_len, d_in = x.shape
    pp, hp = pad_gate_params(params, compute_dtype)
    k = pick_block_steps(t_len, min(
        block_steps,
        _fused_block_steps(t_len, b_sz, d_in, hp, compute_dtype, out_dtype),
    ))
    xt = jnp.moveaxis(x.astype(compute_dtype), 1, 0)
    out_f, out_b = bilstm_fused_proj(
        xt, pp["wx"], pp["b"], pp["wh"], block_steps=k, out_dtype=out_dtype,
        interpret=interpret,
    )
    return _assemble(out_f, out_b, hidden, x.dtype)


def _layer_fwd(params, x, compute_dtype, block_steps, out_dtype, interpret):
    """Differentiated forward: the kernel variant that also saves the
    cell-state streams.  Residuals: padded params, the input, the xw
    stream and the four recurrence output streams."""
    b_sz, t_len, _ = x.shape
    hidden = params["wh"].shape[1]
    pp, _ = pad_gate_params(params, compute_dtype)
    hp = _pad_up(hidden)
    k = pick_block_steps(t_len, min(
        block_steps,
        _train_fwd_block_steps(t_len, b_sz, hp, compute_dtype, out_dtype),
    ))
    _, xw_t = _project(pp, x, compute_dtype)
    out_f, out_b, c_f, c_b = bilstm_recurrence_train(
        xw_t, pp["wh"], block_steps=k, out_dtype=out_dtype,
        interpret=interpret,
    )
    y = _assemble(out_f, out_b, hidden, x.dtype)
    return y, (pp, x, xw_t, out_f, out_b, c_f, c_b)


def _layer_bwd(compute_dtype, block_steps, out_dtype, interpret, res, dy):
    pp, x, xw_t, out_f, out_b, c_f, c_b = res
    hp = pp["wh"].shape[1]
    hidden = dy.shape[-1] // 2
    b_sz, t_len, _ = dy.shape
    k = pick_block_steps(t_len, min(
        block_steps,
        _bwd_block_steps(t_len, b_sz, hp, compute_dtype, out_dtype),
    ))

    # upstream grads -> per-direction padded streams in original order
    dyf = dy[..., :hidden].astype(compute_dtype)
    dyb = dy[..., hidden:].astype(compute_dtype)
    if hp != hidden:
        padw = ((0, 0), (0, 0), (0, hp - hidden))
        dyf = jnp.pad(dyf, padw)
        dyb = jnp.pad(dyb, padw)
    dout_f = jnp.moveaxis(dyf, 1, 0)  # (T, B, Hp)
    dout_b = jnp.moveaxis(dyb, 1, 0)

    dxw, dwh_p = bilstm_recurrence_bwd(
        xw_t, pp["wh"], out_f, out_b, c_f, c_b, dout_f, dout_b,
        block_steps=k, interpret=interpret,
    )

    # dxw is in kernel-time layout (dir 1 time-reversed) — exactly the
    # layout the projection produced from x2, so the weight/input grads
    # are whole-sequence MXU matmuls with no re-ordering:
    xc = x.astype(compute_dtype)
    x2 = jnp.stack([xc, jnp.flip(xc, axis=1)], axis=0)  # (2, B, T, D)
    dwx_p = jnp.einsum("dbti,tdbg->dig", x2, dxw,
                       preferred_element_type=jnp.float32)
    db_p = jnp.sum(dxw.astype(jnp.float32), axis=(0, 2))  # (2, 4Hp)
    dx2 = jnp.einsum("tdbg,dig->dbti", dxw, pp["wx"],
                     preferred_element_type=jnp.float32)
    dx = (dx2[0] + jnp.flip(dx2[1], axis=1)).astype(x.dtype)

    dparams = {
        "wx": _unpad_gates(dwx_p, hidden, hp).astype(jnp.float32),
        "wh": _unpad_gates(dwh_p[:, :hidden], hidden, hp),
        "b": _unpad_gates(db_p, hidden, hp),
    }
    return dparams, dx


_layer.defvjp(_layer_fwd, _layer_bwd)


def bilstm_layer_pallas(
    params: dict,
    x: jax.Array,
    compute_dtype=jnp.float32,
    gate_dtype=None,
    block_steps: int | None = None,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in replacement for core.bilstm_layer: (B, T, D) -> (B, T, 2H).

    Identical semantics (hoisted f32-accumulated input projection stored at
    compute dtype, f32 carries); the scan is replaced by the fused kernel.
    Differentiable via the custom VJP above — under `jax.grad` the forward
    saves the cell-state streams and the backward runs the fused reverse
    kernel.  `gate_dtype` is accepted for signature parity with
    core.bilstm_layer but ignored: in-kernel gates never leave VMEM, so
    they are always evaluated f32 (see _cell)."""
    del gate_dtype
    b_sz, t_len, _ = x.shape
    hidden = params["wh"].shape[1]
    if block_steps is None:
        block_steps = auto_block_steps(
            t_len, b_sz, _pad_up(hidden), compute_dtype, out_dtype
        )
    if interpret is None:
        interpret = _use_interpret()
    return _layer(params, x, compute_dtype, int(block_steps), out_dtype,
                  bool(interpret))
