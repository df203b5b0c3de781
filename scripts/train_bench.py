"""Training-step throughput benchmark (flagship MTL model).

Measures the full jitted train step — feature extraction, SSNN embedding,
3x250 BLSTM fwd+bwd, dual heads, L1+CTC losses, grads, adam update — with
the fetch-based timing method (see CLAUDE.md: block_until_ready does not
await under the axon relay).

Usage: python scripts/train_bench.py [batch_size] [inner_iters]
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(batch_size=128, inner=10, compute_dtype="bfloat16"):
    from avsi.models import registry
    from avsi.train import loop as loop_lib, state as state_lib

    config = {
        "model": "av-blstm-ssnn-ctc", "audio_feat_dim": 257, "video_feat_dim": 136,
        "audio_len": 48000, "batch_size": batch_size, "net_dim": [250, 250, 250],
        "integration_layer": 0, "dropout_rate": 0.0, "num_asr_labels": 34,
        "ctc_loss": 0.001, "embedding_dim": 512, "optimizer_type": "adam",
        "starter_learning_rate": 0.001, "learning_rate": 0.001,
        "lr_updating_steps": 10000, "lr_decay": 1.0, "l2": 0.0,
        "compute_dtype": compute_dtype, "seed": 0,
    }
    model = registry.get_model(config["model"])
    params = model.init(jax.random.PRNGKey(0), config)
    stats = (np.zeros(257, np.float32), np.ones(257, np.float32))
    tx = state_lib.make_optimizer(config)
    st = state_lib.TrainState(params, tx.init(params), jnp.int32(0))
    step_fn = loop_lib.make_train_step(model, tx, config, stats)

    rng = np.random.RandomState(0)
    t = 250
    masks = np.ones((batch_size, t, 257), np.float32)
    masks[:, 80:147] = 0.0
    labels = np.zeros((batch_size, 50), np.float32)
    labels[:, :5] = rng.randint(0, 33, size=(batch_size, 5))
    batch = {
        "sequence_lengths": jnp.full((batch_size,), t, jnp.int32),
        "labels_lengths": jnp.full((batch_size,), 5, jnp.int32),
        "target_sources": jnp.asarray(3000 * rng.randn(batch_size, 48000), jnp.float32),
        "video_features": jnp.asarray(rng.randn(batch_size, t, 136), jnp.float32),
        "masks": jnp.asarray(masks),
        "labels": jnp.asarray(labels),
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
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 128,
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
        sys.argv[3] if len(sys.argv) > 3 else "bfloat16",
    )
