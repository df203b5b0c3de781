"""bf16 compute and dropout paths through the full train step."""

import numpy as np

import jax
import jax.numpy as jnp

from avsi.models import registry
from avsi.train import loop as loop_lib, state as state_lib
from helpers import identity_stats, synth_batch, tiny_config


def _run_steps(cfg, n=6):
    batch = synth_batch(cfg)
    model = registry.get_model(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), cfg)
    tx = state_lib.make_optimizer(cfg)
    step_fn = jax.jit(loop_lib.make_train_step(model, tx, cfg, identity_stats()))
    st = state_lib.TrainState(params, tx.init(params), jnp.int32(0))
    losses = []
    rng = jax.random.PRNGKey(1)
    for _ in range(n):
        rng, sub = jax.random.split(rng)
        st, ldict = step_fn(st, batch, sub)
        losses.append(float(ldict["loss"]))
    return losses


def test_bfloat16_training_converges():
    cfg = tiny_config(model="av-blstm", net_dim=(16, 16), audio_len=4800,
                      compute_dtype="bfloat16", starter_learning_rate=0.01)
    losses = _run_steps(cfg)
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_dropout_training_path():
    cfg = tiny_config(model="a-blstm-ssnn", net_dim=(8, 8), audio_len=4800,
                      dropout_rate=0.5, starter_learning_rate=0.01)
    losses = _run_steps(cfg)
    assert all(np.isfinite(l) for l in losses)

    # dropout must be active in training (different rng -> different loss)
    batch = synth_batch(cfg)
    model = registry.get_model(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), cfg)
    stats = identity_stats()
    o1 = model.forward(params, batch, cfg, stats, train=True, rng=jax.random.PRNGKey(1))
    o2 = model.forward(params, batch, cfg, stats, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(o1["inference"]), np.asarray(o2["inference"]))
    # and inactive at eval
    e1 = model.forward(params, batch, cfg, stats, train=False)
    e2 = model.forward(params, batch, cfg, stats, train=False)
    np.testing.assert_array_equal(np.asarray(e1["inference"]), np.asarray(e2["inference"]))
