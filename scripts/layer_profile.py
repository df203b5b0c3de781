"""Per-layer time breakdown of the fused BLSTM at the flagship shape.

Question (r4 verdict Next #3): the inference MFU is ~39% and the per-layer
kernel round-trips two streams through HBM — the hoisted projection writes
xw (T,2,B,4Hp) which the recurrence kernel re-reads, and the hidden stream
(B,T,2H) crosses layer boundaries.  Before building any multi-layer/fused
kernel, measure where the layer time actually goes:

  proj        hoisted input projection alone (einsum -> xw, time-major)
  recur       recurrence kernel alone on a precomputed xw stream
  layer       bilstm_layer_pallas end to end (proj + recur)
  layer_scan  the lax.scan layer (reference point)

Timing per CLAUDE.md: repeat-inside-jit with a data dependency, scalar
fetch, tunnel floor subtracted.  Run on the real chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _measure(f, *args, n=3):
    import jax

    float(np.asarray(f(*args)).ravel()[0])  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(np.asarray(f(*args)).ravel()[0])
        best = min(best, time.time() - t0)
    return best


def main(b_sz=128, t_len=250, d_in=536, hidden=250, iters=30,
         compute_dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from avsi.models import core
    from avsi.ops import pallas_lstm
    from avsi.utils import cache

    cache.enable()
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    rng = jax.random.PRNGKey(0)
    params = core.lstm_layer_init(rng, d_in, hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (b_sz, t_len, d_in), jnp.float32)
    pp, hp = pallas_lstm.pad_gate_params(jax.device_get(params), cdt)
    pp = {k: jnp.asarray(v) for k, v in pp.items()}
    k_blk = pallas_lstm.auto_block_steps(t_len, b_sz, hp, cdt, jnp.float32)

    floor_f = jax.jit(lambda z: jnp.sum(z))
    floor = _measure(floor_f, jnp.ones((8, 8)))

    def rep(body, feedback):
        """repeat-inside-jit: body(x) -> y, feedback(y) -> dx to thread a
        real data dependency through iterations."""

        @jax.jit
        def run(x0):
            def it(i, carry):
                y = body(x0 + carry * 1e-12)
                return feedback(y)

            return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))

        return run

    results = {}

    # ---- proj: the hoisted projection alone
    def proj(xx):
        _, xw = pallas_lstm._project(pp, xx, cdt)
        return xw

    r = rep(proj, lambda xw: jnp.sum(xw[0, 0, 0, :8].astype(jnp.float32)))
    results["proj_ms"] = (max(_measure(r, x) - floor, 0)) / iters * 1e3

    # ---- recur: the recurrence kernel alone on a fixed xw stream
    _, xw0 = pallas_lstm._project(pp, x, cdt)
    xw0 = jax.block_until_ready(xw0)

    @jax.jit
    def recur_rep(xw):
        def it(i, carry):
            of, ob = pallas_lstm.bilstm_recurrence(
                xw + (carry * 1e-12).astype(xw.dtype), pp["wh"],
                block_steps=k_blk,
            )
            return jnp.sum(of[0, 0, :8]) + jnp.sum(ob[0, 0, :8])

        return jax.lax.fori_loop(0, iters, it, jnp.float32(0.0))

    results["recur_ms"] = (max(_measure(recur_rep, xw0) - floor, 0)) / iters * 1e3

    # ---- layer: full pallas layer; feedback through a slice back to D
    def layer(xx):
        return pallas_lstm.bilstm_layer_pallas(params, xx, cdt)

    r = rep(layer, lambda y: jnp.sum(y[0, 0, :8].astype(jnp.float32)))
    results["layer_ms"] = (max(_measure(r, x) - floor, 0)) / iters * 1e3

    # ---- scan layer reference
    def layer_scan(xx):
        return core.bilstm_layer(params, xx, cdt)

    r = rep(layer_scan, lambda y: jnp.sum(y[0, 0, :8].astype(jnp.float32)))
    results["layer_scan_ms"] = (max(_measure(r, x) - floor, 0)) / iters * 1e3

    # ---- fused projection+recurrence kernel, K sweep
    for kf in (2, 5, 10, 25):
        if t_len % kf:
            continue

        def fused(xx, _k=kf):
            xt = jnp.moveaxis(xx.astype(cdt), 1, 0)
            of, ob = pallas_lstm.bilstm_fused_proj(
                xt, pp["wx"], pp["b"], pp["wh"], block_steps=_k
            )
            return pallas_lstm._assemble(of, ob, hidden, xx.dtype)

        r = rep(fused, lambda y: jnp.sum(y[0, 0, :8].astype(jnp.float32)))
        try:
            results[f"layer_fused_k{kf}_ms"] = (
                max(_measure(r, x) - floor, 0)
            ) / iters * 1e3
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
            results[f"layer_fused_k{kf}_ms"] = f"error: {str(e)[:120]}"

    out = {
        "what": "per-layer breakdown, fused BLSTM vs parts",
        "shape": {"B": b_sz, "T": t_len, "D": d_in, "H": hidden,
                  "compute_dtype": compute_dtype, "block_steps": int(k_blk)},
        "iters": iters,
        "floor_s": round(floor, 4),
        "results": {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in results.items()
        },
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(v) for v in a[:2])) if a else main()
