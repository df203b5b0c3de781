"""Microbench: fused Pallas BLSTM kernel vs the lax.scan layer on TPU.

Isolated flagship-shaped layer (B=128, T=250, D=500, H=250 — layers 2/3 of
the av-blstm-ssnn-ctc stack), timed with the repo's standard methodology
(bench.py:_measure_fetched): the layer repeats inside one jitted fori_loop
with a data dependency, a scalar host fetch forces completion, and the
measured scalar-fetch tunnel floor is subtracted.

Sweeps the kernel's block_steps and output dtype against the scan at both
compute dtypes.  Writes scripts-relative JSON if --out is given.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from avsi.models import core
from avsi.ops import pallas_lstm
from avsi.utils import cache as _cache


def _measure(f, *args, n=3):
    float(f(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        float(f(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=250)
    ap.add_argument("--d", type=int, default=500)
    ap.add_argument("--hidden", type=int, default=250)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd (jax.grad) instead of forward-only")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    _cache.enable()
    b, t, d, h = args.batch, args.t, args.d, args.hidden
    params = core.lstm_layer_init(jax.random.PRNGKey(0), d, h)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d), jnp.float32)

    floor = _measure(jax.jit(lambda v: jnp.sum(v)), jnp.ones((8, 8)))
    results = {"shape": {"B": b, "T": t, "D": d, "H": h}, "floor_s": floor,
               "device": str(jax.devices()[0]), "iters": args.iters}

    def timed(layer_fn, tag):
        @jax.jit
        def rep(params, x):
            def body(i, carry):
                out = layer_fn(params, x + carry * 1e-9)
                return jnp.sum(out) * 1e-9
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        try:
            total = _measure(rep, params, x)
        except Exception as e:  # compile failure (e.g. VMEM overflow)
            results[tag] = {"error": str(e)[:200]}
            print(f"{tag:40s} FAILED: {str(e)[:120]}")
            return
        ms = max(total - floor, 0.0) / args.iters * 1e3
        results[tag] = {"ms": round(ms, 4)}
        print(f"{tag:40s} {ms:8.3f} ms")

    def timed_grad(layer_fn, tag):
        # fwd+bwd: grad of a scalar loss wrt params and x, repeated with a
        # data dependency through the x perturbation
        grad_fn = jax.grad(
            lambda p, v: jnp.sum(jnp.sin(layer_fn(p, v))), argnums=(0, 1)
        )

        @jax.jit
        def rep(params, x):
            def body(i, carry):
                gp, gx = grad_fn(params, x + carry * 1e-9)
                return (jnp.sum(gx) + jnp.sum(gp["b"])) * 1e-9
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        try:
            total = _measure(rep, params, x)
        except Exception as e:
            results[tag] = {"error": str(e)[:200]}
            print(f"{tag:40s} FAILED: {str(e)[:120]}")
            return
        ms = max(total - floor, 0.0) / args.iters * 1e3
        results[tag] = {"ms": round(ms, 4)}
        print(f"{tag:40s} {ms:8.3f} ms")

    for dt_name, dt in [("bf16", jnp.bfloat16), ("fp32", jnp.float32)]:
        if not args.grad:
            timed(lambda p, v, _dt=dt: core.bilstm_layer(p, v, _dt),
                  f"scan_{dt_name}")
            for k in (1, 2, 5, 10, 25):
                timed(
                    lambda p, v, _dt=dt, _k=k: pallas_lstm.bilstm_layer_pallas(
                        p, v, _dt, block_steps=_k
                    ),
                    f"pallas_{dt_name}_k{k}",
                )
            # bf16 output stream variant (halves the h write traffic)
            timed(
                lambda p, v, _dt=dt: pallas_lstm.bilstm_layer_pallas(
                    p, v, _dt, block_steps=5, out_dtype=jnp.bfloat16
                ),
                f"pallas_{dt_name}_k5_bf16out",
            )
        else:
            timed_grad(lambda p, v, _dt=dt: core.bilstm_layer(p, v, _dt),
                       f"grad_scan_{dt_name}")
            for k in (1, 2, 3, 5, 10):
                timed_grad(
                    lambda p, v, _dt=dt, _k=k: pallas_lstm.bilstm_layer_pallas(
                        p, v, _dt, block_steps=_k
                    ),
                    f"grad_pallas_{dt_name}_k{k}",
                )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
