"""Training resume: periodic `ckpt` restores params + adam moments + step."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from avsi.models import registry
from avsi.train import checkpoints, loop as loop_lib, state as state_lib
from helpers import identity_stats, synth_batch, tiny_config


def test_resume_bitwise_continuation(tmp_path):
    """Save after k steps, restore, and the next step must match a run that
    never stopped (params AND adam moments round-trip)."""
    cfg = tiny_config(model="a-blstm", net_dim=(8, 8), audio_len=4800)
    batch = synth_batch(cfg)
    model = registry.get_model(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), cfg)
    stats = identity_stats()
    tx = state_lib.make_optimizer(cfg)
    step_fn = jax.jit(loop_lib.make_train_step(model, tx, cfg, stats))
    rngs = [jax.random.PRNGKey(i) for i in range(4)]

    st = state_lib.TrainState(params, tx.init(params), jnp.int32(0))
    for r in rngs[:2]:
        st, _ = step_fn(st, batch, r)

    ckpt_dir = str(tmp_path)
    checkpoints.save_checkpoint(
        ckpt_dir, "ckpt", jax.device_get(st.params),
        opt_state=jax.device_get(st.opt_state), step=2,
    )

    # continue without stopping
    st_cont = st
    for r in rngs[2:]:
        st_cont, l_cont = step_fn(st_cont, batch, r)

    # restore and continue
    template_p = model.init(jax.random.PRNGKey(0), cfg)
    template_o = tx.init(template_p)
    p2, o2, step2 = checkpoints.restore_checkpoint(ckpt_dir, "ckpt", template_p, template_o)
    assert step2 == 2
    assert o2 is not None
    st_res = state_lib.TrainState(p2, o2, jnp.int32(step2))
    for r in rngs[2:]:
        st_res, l_res = step_fn(st_res, batch, r)

    np.testing.assert_allclose(float(l_cont["loss"]), float(l_res["loss"]), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_cont.params),
        jax.tree_util.tree_leaves(st_res.params),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_shard_files_partition():
    from avsi.parallel import distributed

    files = [f"f{i:03d}" for i in range(10)]
    shards = [distributed.shard_files(files, pi, 4) for pi in range(4)]
    assert sorted(sum(shards, [])) == files
    assert all(len(s) in (2, 3) for s in shards)
