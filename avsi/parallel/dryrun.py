"""Multi-chip dry run: one FULL sharded training step on an n-device mesh.

This is the body of the driver contract's `dryrun_multichip` (see
`__graft_entry__.py`), factored into a module so it can run in a FRESH
subprocess whose JAX has never touched a backend.  Why that matters
(round-4 post-mortem, MULTICHIP_r04.json): the driver process may have
already initialized the axon TPU backend — possibly one that is broken at
that moment (libtpu version skew during a rolling upgrade) — and once any
backend is live, `jax.config.update("jax_platforms", "cpu")` raises and
the dry run would otherwise limp onto whatever backend exists.  The dry
run targets the VIRTUAL CPU mesh (`xla_force_host_platform_device_count`)
by design, so it must own a pristine process.

`main(n)` forces the CPU platform BEFORE the first device query (the env
var alone is NOT enough here: the axon sitecustomize pre-registers the TPU
plugin in every interpreter, CLAUDE.md "Environment gotchas").
"""

from __future__ import annotations

import numpy as np


def main(n_devices: int) -> None:
    """Run the dry run against the virtual CPU mesh. Must be the first JAX
    user in the process (asserts the platform actually took effect)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avsi.models import registry
    from avsi.parallel import mesh as mesh_lib
    from avsi.train import loop as loop_lib, state as state_lib
    from avsi.utils import cache as cache_lib

    cache_lib.enable()  # re-runs hit the persistent XLA:CPU compile cache

    devices = jax.devices()
    assert devices[0].platform == "cpu", (
        f"dryrun must run on the virtual CPU mesh, got {devices[0].platform} "
        "(was JAX initialized before avsi.parallel.dryrun.main?)"
    )
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)} "
        "(set XLA_FLAGS=--xla_force_host_platform_device_count=N before "
        "the interpreter starts)"
    )
    model_shards = 2 if (n_devices >= 4 and n_devices % 2 == 0) else 1
    mesh = mesh_lib.get_mesh(
        n_devices // model_shards, devices, model_shards=model_shards
    )

    from avsi.flagship import flagship_config, synthetic_batch

    config = flagship_config(batch_size=8, net_dim=[16, 16], audio_len=4800)
    model = registry.get_model(config["model"])
    params = model.init(jax.random.PRNGKey(0), config)
    stats = (np.zeros((257,), np.float32), np.ones((257,), np.float32))
    tx = state_lib.make_optimizer(config)
    train_state = state_lib.TrainState(params, tx.init(params), jnp.int32(0))

    batch_size = 2 * n_devices
    host = synthetic_batch(config, batch_size, seed=0)
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    step_fn = loop_lib.make_train_step(model, tx, config, stats)
    repl = NamedSharding(mesh, P())
    train_state = mesh_lib.shard_state(train_state, mesh)
    sharded_batch = {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in batch.items()
    }
    rng = jax.device_put(jax.random.PRNGKey(1), repl)

    jit_step = jax.jit(step_fn)
    new_state, ldict = jit_step(train_state, sharded_batch, rng)
    loss = float(ldict["loss"])
    assert np.isfinite(loss), loss
    assert int(jax.device_get(new_state.step)) == 1

    # sharded fleet serving: the lockstep streaming program partitioned
    # over the data axis (multi-chip serving path, tested for equivalence
    # in tests/test_streaming.py — here we prove it compiles+runs on the
    # same mesh the training step used)
    from avsi.infer import streaming

    fleet = 2 * (n_devices // model_shards)
    fh = synthetic_batch(config, fleet, seed=2)
    wav = streaming.stream_utterances_lockstep(
        config, stats, jax.device_get(new_state.params),
        np.asarray(fh["target_sources"]),
        np.asarray(fh["masks"][:, :, 0]),
        np.asarray(fh["video_features"]),
        chunk_frames=4, lookahead_frames=4, mesh=mesh,
    )
    assert wav.shape[0] == fleet and np.isfinite(wav).all()

    axes = "x".join(f"{k}={v}" for k, v in mesh.shape.items())
    print(
        f"dryrun_multichip OK: {n_devices} devices ({axes}), loss={loss:.4f}, "
        f"ctc={float(ldict['ctc_loss']):.2f}, fleet={fleet} sharded streams"
    )


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
