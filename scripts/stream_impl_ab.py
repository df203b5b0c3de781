"""Device-only A/B of the LC window program: scan vs the fused Pallas
window kernel (`pallas_lstm.lc_bilstm_window_pallas`).

Why device-only: under the axon relay each streamed window pays a ~34 ms
host-fetch tunnel floor, so fleet WALL time cannot resolve a sub-ms
device delta (on real serving hardware the per-window host cost is PCIe,
not a tunnel).  This measures what real hardware would see: the fused
window step (front-end features in, emitted samples out) repeated inside
one jit with the recurrent carries threaded iteration-to-iteration as a
real data dependency (`bench.py:_measure_fetched` pattern — block_until_
ready does not wait here).

Shapes: the flagship 3x250 av-blstm-ssnn-ctc at the C=8/L=16 serving
default, fleet sizes swept.  Prints one JSON line; committed artifact:
lc_pallas_r4.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(b_sz, impl, chunk=8, look=16, iters=40, compute_dtype="float32"):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from avsi.infer import streaming
    from avsi.models import blstm as blstm_lib

    config = {
        "model": "av-blstm-ssnn-ctc", "audio_feat_dim": 257,
        "video_feat_dim": 136, "audio_len": 48000,
        "net_dim": [250, 250, 250], "integration_layer": 0,
        "dropout_rate": 0.0, "num_asr_labels": 34, "ctc_loss": 0.001,
        "embedding_dim": 512, "compute_dtype": compute_dtype,
    }
    spec = blstm_lib.parse_model_name(config["model"])
    params = blstm_lib.init(jax.random.PRNGKey(0), config)
    stats = (jnp.zeros(257, jnp.float32), jnp.ones(257, jnp.float32))
    w = chunk + look
    cdt, gdt = blstm_lib._dtypes(config)
    prog = streaming._ProgSpec(
        spec=spec, int_layer=0, chunk=chunk, compute_dtype=cdt,
        gate_dtype=gdt, stats=stats, lstm_impl=impl,
    )

    rng = np.random.RandomState(0)
    af, vf, hid = 257, 136, 250
    window = {
        "spec_norm": jnp.asarray(rng.randn(b_sz, w, af), jnp.float32),
        "re": jnp.asarray(rng.randn(b_sz, w, af), jnp.float32),
        "im": jnp.asarray(rng.randn(b_sz, w, af), jnp.float32),
        "mask": jnp.asarray((rng.rand(b_sz, w) > 0.3), jnp.float32),
        "video": jnp.asarray(rng.randn(b_sz, w, vf), jnp.float32),
        "ssnn_feats": jnp.asarray(rng.randn(b_sz, w, 2 * af), jnp.float32),
        "ssnn_mask": jnp.asarray((rng.rand(b_sz, w) > 0.3), jnp.float32),
        "ssnn_n": jnp.float32(chunk),
    }
    carries0 = [
        (jnp.zeros((b_sz, hid), jnp.float32), jnp.zeros((b_sz, hid), jnp.float32))
        for _ in range(3)
    ]
    prev0 = (
        jnp.zeros((b_sz, af), jnp.float32), jnp.zeros((b_sz, af), jnp.float32),
        jnp.zeros((b_sz, af), jnp.float32), jnp.zeros((b_sz,), jnp.float32),
    )
    ssnn0 = (jnp.zeros((b_sz, 200), jnp.float32), jnp.zeros((b_sz,), jnp.float32))

    step = partial(streaming._window_step, prog)

    @jax.jit
    def rep(params, window, carries, prev, ssnn_sum, ssnn_cnt):
        def body(i, st):
            carries, prev, ssnn_sum, ssnn_cnt, acc = st
            wdw = dict(window)
            # acc threads a data dependency so the loop cannot be hoisted;
            # carries/prev thread the REAL serving state chain
            wdw["spec_norm"] = window["spec_norm"] + acc * 1e-9
            wav, _, _, nc, nprev, ns, ncnt, _ = step(
                params, wdw, carries, prev, ssnn_sum, ssnn_cnt
            )
            nc = [(h, c) for h, c in nc]
            return (nc, nprev, ns, ncnt, jnp.sum(wav) * 1e-9)
        st = jax.lax.fori_loop(
            0, iters, body, (carries, prev, ssnn_sum, ssnn_cnt, jnp.float32(0))
        )
        return st[-1]

    def fetched(*a):
        float(rep(*a))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(rep(*a))
            best = min(best, time.time() - t0)
        return best

    import jax.numpy as jnp  # noqa: F811 (clarity)

    floor_f = jax.jit(lambda x: jnp.sum(x))
    float(floor_f(jnp.ones((8, 8))))
    floor = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(floor_f(jnp.ones((8, 8))))
        floor = min(floor, time.time() - t0)

    total = fetched(params, window, carries0, prev0, ssnn0[0], ssnn0[1])
    # Floor subtraction underflows when the loop total is below the
    # fluctuating tunnel floor (small fleets): the old code clamped ms to
    # ~1e-9 and recorded nonsense (r4 advisor finding).  Scale iters (a
    # recursive re-measure — the repeat loop is jitted per iters) until
    # device time clearly dominates the floor; mark the row if it never does.
    if total - floor < max(floor, 0.010):
        if iters < 4000:
            return measure(b_sz, impl, chunk=chunk, look=look,
                           iters=iters * 4, compute_dtype=compute_dtype)
        return {"below_floor": True, "iters": iters,
                "total_s": round(total, 4), "floor_s": round(floor, 4)}
    ms = (total - floor) / iters * 1000
    # real-time capacity: each window advances chunk*12 ms per stream
    streams_rt = b_sz * (chunk * 12.0 / 1000.0) / (ms / 1000.0)
    return {"ms_per_window_device": round(ms, 3), "iters": iters,
            "realtime_streams_device_only": round(streams_rt, 0)}


def main():
    out = {
        "what": ("Device-only LC window step (flagship 3x250 ssnn-ctc, "
                 "C=8/L=16): scan vs fused Pallas window kernel"),
        "note": ("repeat-inside-jit with carries threaded as the data "
                 "dependency; tunnel floor subtracted; real-time capacity "
                 "= streams sustained at <= real time by device compute "
                 "alone (the sandbox tunnel adds ~34 ms/window of host "
                 "cost that real serving hardware does not pay)"),
        "results": {},
    }
    for b in (16, 128):
        for impl in ("scan", "pallas"):
            key = f"B{b}_{impl}"
            try:
                out["results"][key] = measure(b, impl)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                out["results"][key] = {"error": str(e)[:200]}
            print(key, out["results"][key], flush=True)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "lc_pallas_r4.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
