"""Training-step throughput benchmark (flagship MTL model).

Measures the full jitted train step — feature extraction, SSNN embedding,
3x250 BLSTM fwd+bwd, dual heads, L1+CTC losses, grads, adam update — with
the fetch-based timing method (see CLAUDE.md: block_until_ready does not
await under the axon relay).

Usage: python scripts/train_bench.py [batch_size] [inner_iters]
       [compute_dtype] [lstm_impl: auto|scan|pallas]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main(batch_size=128, inner=10, compute_dtype="bfloat16",
         lstm_impl="auto"):
    from avsi.flagship import flagship_config, synthetic_batch
    from avsi.models import registry
    from avsi.ops import pallas_lstm
    from avsi.train import loop as loop_lib, state as state_lib

    # single source of truth shared with bench.py / __graft_entry__.py
    config = flagship_config(batch_size, compute_dtype)
    config["lstm_impl"] = pallas_lstm.resolve_impl(
        lstm_impl, batch_size=batch_size
    )
    model = registry.get_model(config["model"])
    params = model.init(jax.random.PRNGKey(0), config)
    stats = (np.zeros(257, np.float32), np.ones(257, np.float32))
    tx = state_lib.make_optimizer(config)
    st = state_lib.TrainState(params, tx.init(params), jnp.int32(0))
    step_fn = loop_lib.make_train_step(model, tx, config, stats)

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            config, batch_size, gap_start=80, gap_frames=67
        ).items()
    }

    def measure(f, *args, n=3):
        float(f(*args))
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            float(f(*args))
            best = min(best, time.time() - t0)
        return best

    floor = measure(jax.jit(lambda x: jnp.sum(x)), jnp.ones((8, 8)))

    @jax.jit
    def rep(st, batch, key):
        def body(i, carry):
            st, key = carry
            key, sub = jax.random.split(key)
            st, ldict = step_fn(st, batch, sub)
            return (st, key)
        st, _ = jax.lax.fori_loop(0, inner, body, (st, key))
        return jnp.sum(st.params["head_ipt"]["b"]) + st.step.astype(jnp.float32)

    total = measure(rep, st, batch, jax.random.PRNGKey(1))
    dt = max(total - floor, 1e-9) / inner
    out = {
        "metric": "mtl_training_step",
        "value": round(batch_size / dt, 2),
        "unit": "utterances/sec/chip",
        "detail": {
            "batch": batch_size,
            "sec_per_step": round(dt, 5),
            "model": "av-blstm-ssnn-ctc 3x250 (full step: fwd+bwd+adam)",
            "compute_dtype": compute_dtype,
            "lstm_impl": config["lstm_impl"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 128,
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
        sys.argv[3] if len(sys.argv) > 3 else "bfloat16",
        sys.argv[4] if len(sys.argv) > 4 else "auto",
    )
