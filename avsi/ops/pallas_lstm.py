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
TPU).  Forward-only (no custom VJP): used on inference/serving paths;
training keeps the scan, whose backward XLA derives automatically.
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


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


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


def resolve_impl(
    requested: str | None,
    sharded: bool = False,
    batch_size: int | None = None,
) -> str:
    """Resolve an `lstm_impl` request to "scan" or "pallas".

    "auto" (the forward-only entry points' default) picks the fused kernel
    exactly where it is known to win: a real TPU backend, an unsharded
    batch (the kernel is a single-device program — under a data mesh the
    custom call would force XLA to de-shard around it), and a batch small
    enough that the kernel's VMEM working set (xw block + outputs + h/c
    scratch, all O(B*Hp)) stays comfortably inside VMEM.  Everything else
    — CPU tests, sharded inference, training — keeps the scan.  An
    explicit "pallas" under sharding is refused rather than silently
    degraded."""
    req = (requested or "auto").lower()
    if req == "scan":
        return "scan"
    if req == "pallas":
        if sharded:
            raise ValueError(
                "lstm_impl='pallas' is a single-device kernel and does not "
                "partition over a data mesh; use lstm_impl='scan' with "
                "data_shards, or drop the sharding"
            )
        return "pallas"
    if req != "auto":
        raise ValueError(f"unknown lstm_impl {requested!r} "
                         "(expected auto/scan/pallas)")
    if sharded or jax.default_backend() != "tpu":
        return "scan"
    if batch_size is not None and int(batch_size) > 512:
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


def auto_block_steps(t_len: int, b_sz: int, hp: int, compute_dtype,
                     out_dtype, target: int = 5) -> int:
    """Block size honoring the VMEM stream budget (double-buffered xw in
    compute dtype + both direction outputs in out dtype, per grid step)."""
    step_bytes = 2 * b_sz * 4 * hp * jnp.dtype(compute_dtype).itemsize
    step_bytes += 2 * b_sz * hp * jnp.dtype(out_dtype).itemsize
    k_max = max(1, _VMEM_STREAM_BUDGET // (2 * step_bytes))
    return pick_block_steps(t_len, min(target, int(k_max)))


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
    `gate_dtype` is accepted for signature parity with core.bilstm_layer
    but ignored: in-kernel gates never leave VMEM, so they are always
    evaluated f32 (see _cell)."""
    del gate_dtype
    b_sz, t_len, _ = x.shape
    hidden = params["wh"].shape[1]
    pp, hp = pad_gate_params(params, compute_dtype)
    if block_steps is None:
        block_steps = auto_block_steps(
            t_len, b_sz, _pad_up(hidden), compute_dtype, out_dtype
        )
    xc = x.astype(compute_dtype)
    x2 = jnp.stack([xc, jnp.flip(xc, axis=1)], axis=0)  # (2, B, T, D)
    xw = (
        jnp.einsum(
            "dbti,dig->dbtg", x2, pp["wx"], preferred_element_type=jnp.float32
        )
        + pp["b"][:, None, None, :]
    ).astype(compute_dtype)
    xw_t = jnp.moveaxis(xw, 2, 0)  # (T, 2, B, 4Hp)
    out_f, out_b = bilstm_recurrence(
        xw_t,
        pp["wh"],
        block_steps=block_steps,
        out_dtype=out_dtype,
        interpret=interpret,
    )
    fwd = jnp.moveaxis(out_f[:, :, :hidden], 0, 1)  # (B, T, H)
    bwd = jnp.moveaxis(out_b[:, :, :hidden], 0, 1)  # already original order
    return jnp.concatenate([fwd, bwd], axis=-1).astype(x.dtype)
