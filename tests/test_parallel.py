"""Multi-device data-parallel tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from avsi.models import registry
from avsi.parallel import mesh as mesh_lib
from avsi.train import loop as loop_lib, state as state_lib
from helpers import identity_stats, synth_batch, tiny_config


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_survives_initialized_backend(monkeypatch):
    """Round-4 regression (MULTICHIP_r04.json): the driver process had
    already initialized a (broken) TPU backend, and the old in-process
    dryrun limped onto it.  The subprocess worker must be immune to the
    caller's JAX state AND to hostile env vars: a pre-initialized backend
    here (jax.devices() above), JAX_PLATFORMS pointing elsewhere, and an
    XLA_FLAGS with the wrong device count must all be overridden."""
    import __graft_entry__ as ge

    jax.devices()  # caller's backend is live (conftest: CPU)
    monkeypatch.setenv("JAX_PLATFORMS", "definitely-not-a-platform")
    # a hostile SMALLER device count must be stripped, not kept
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    ge.dryrun_multichip(8)


def test_dryrun_multichip_failure_is_diagnosed(monkeypatch):
    """A worker failure must surface as RuntimeError carrying the worker's
    stderr tail, not as a silent pass or an opaque assert."""
    import __graft_entry__ as ge

    monkeypatch.setattr(ge.sys, "executable", "/bin/false")
    with pytest.raises(RuntimeError, match="dryrun_multichip worker failed"):
        ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, (params, batch) = ge.entry()
    # full flagship is too slow to run on CPU CI; compile-check via lowering
    lowered = jax.jit(fn).lower(params, batch)
    # the contract: (loss, loss_hole, ctc_loss, enhanced_wav) on the B=8 batch
    out_avals = lowered.out_info
    shapes = [tuple(getattr(o, "shape", ())) for o in jax.tree_util.tree_leaves(out_avals)]
    assert shapes == [(), (), (), (8, 48000)], shapes


def test_sharded_step_matches_single_device():
    """The 8-way sharded train step must produce the same loss and params
    as the single-device step (gradient all-reduce correctness)."""
    cfg = tiny_config(model="a-blstm", net_dim=(8, 8), audio_len=4800)
    batch = synth_batch(cfg, batch_size=8)
    model = registry.get_model(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), cfg)
    stats = identity_stats()
    tx = state_lib.make_optimizer(cfg)
    step_fn = loop_lib.make_train_step(model, tx, cfg, stats)
    rng = jax.random.PRNGKey(1)

    # single device
    st1 = state_lib.TrainState(params, tx.init(params), jnp.int32(0))
    st1_new, l1 = jax.jit(step_fn)(st1, batch, rng)

    # 8-device mesh
    mesh = mesh_lib.get_mesh(8)
    repl = NamedSharding(mesh, P())
    st8 = jax.device_put(
        state_lib.TrainState(params, tx.init(params), jnp.int32(0)), repl
    )
    sb = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
          for k, v in mesh_lib.device_batch(batch).items()}
    st8_new, l8 = jax.jit(step_fn)(st8, sb, jax.device_put(rng, repl))

    np.testing.assert_allclose(float(l1["loss"]), float(l8["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(st1_new.params),
        jax.tree_util.tree_leaves(st8_new.params),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_param_spec_rule():
    """Uniform Megatron rule: col-shard divisible last dims, row-shard
    divisible contraction dims, replicate the rest."""
    assert mesh_lib.param_spec((2, 20, 32), 2) == P(None, None, "model")  # wx
    assert mesh_lib.param_spec((2, 8, 32), 2) == P(None, None, "model")  # wh
    assert mesh_lib.param_spec((2, 32), 2) == P(None, "model")  # lstm bias
    assert mesh_lib.param_spec((16, 257), 2) == P("model", None)  # head w
    assert mesh_lib.param_spec((257,), 2) == P()  # head bias
    assert mesh_lib.param_spec((), 2) == P()  # adam count / step


def test_model_sharded_step_matches_single_device():
    """(data=4, model=2) tensor-parallel train step == single-device step:
    gate all-gathers + head partial-product reductions inserted by GSPMD
    must not change the numerics."""
    cfg = tiny_config(model="av-blstm-ssnn-ctc", net_dim=(8, 8), audio_len=4800)
    batch = synth_batch(cfg, batch_size=8)
    model = registry.get_model(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), cfg)
    stats = identity_stats()
    tx = state_lib.make_optimizer(cfg)
    step_fn = loop_lib.make_train_step(model, tx, cfg, stats)
    rng = jax.random.PRNGKey(1)

    st1 = state_lib.TrainState(params, tx.init(params), jnp.int32(0))
    st1_new, l1 = jax.jit(step_fn)(st1, batch, rng)

    mesh = mesh_lib.get_mesh(4, model_shards=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    st8 = mesh_lib.shard_state(
        state_lib.TrainState(params, tx.init(params), jnp.int32(0)), mesh
    )
    # the big leaves really are split over the model axis
    wh = st8.params["blstm"][0]["wh"]
    assert wh.sharding.spec == P(None, None, "model")
    sb = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
          for k, v in mesh_lib.device_batch(batch).items()}
    st8_new, l8 = jax.jit(step_fn)(
        st8, sb, jax.device_put(rng, NamedSharding(mesh, P()))
    )

    np.testing.assert_allclose(float(l1["loss"]), float(l8["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(st1_new.params),
        jax.tree_util.tree_leaves(st8_new.params),
        strict=True,
    ):
        # partial-product reduction order differs across the model axis;
        # adam's 1/sqrt(nu) amplifies it near init — 1e-4 on params is tight
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sharded_inference_batch():
    """Batched inference sharded over the mesh produces per-device shards
    that concatenate to the single-device result."""
    cfg = tiny_config(model="a-blstm", net_dim=(8, 8), audio_len=4800)
    batch = synth_batch(cfg, batch_size=8)
    model = registry.get_model(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), cfg)
    stats = identity_stats()

    def fwd(p, b):
        out = model.forward(p, b, cfg, stats)
        return model.enhanced_sources(out, b, cfg, stats)

    want = np.asarray(jax.jit(fwd)(params, mesh_lib.device_batch(batch)))

    mesh = mesh_lib.get_mesh(8)
    sb = mesh_lib.shard_batch(batch, mesh)
    pr = mesh_lib.replicate(params, mesh)
    got = np.asarray(jax.jit(fwd)(pr, sb))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_get_mesh_overask_raises():
    """Asking for more data shards than devices must raise, not silently
    clamp (the 2-D path already raised; the 1-D path now matches)."""
    with pytest.raises(ValueError):
        mesh_lib.get_mesh(16)
    with pytest.raises(ValueError):
        mesh_lib.get_mesh(8, model_shards=2)


def test_compact_batch_soft_mask_not_compacted():
    """A non-binary (soft) mask is bin-uniform but must NOT be shipped as
    int8 — the cast would truncate it to zeros."""
    cfg = tiny_config()
    batch = {k: np.asarray(v) for k, v in synth_batch(cfg).items()}
    batch["masks"] = np.full_like(batch["masks"], 0.5)
    out = mesh_lib.compact_batch(batch)
    assert "mask_frames" not in out
    np.testing.assert_array_equal(out["masks"], batch["masks"])
    # binary masks still compact
    out2 = mesh_lib.compact_batch({**batch, "masks": np.ones_like(batch["masks"])})
    assert "mask_frames" in out2


def test_infer_data_shards_matches_single_device(tmp_path):
    """CLI batch inference with data_shards=2 must write byte-identical
    wavs and report the same losses as the single-device path (the
    batch-inference twin of `avsi serve --data_shards`)."""
    import os

    from avsi import config as config_lib
    from avsi.data import fixture, stats as stats_lib
    from avsi.infer import inpaint
    from avsi.train import loop as train_loop
    from avsi.utils import wav as wavio

    d = str(tmp_path / "corpus")
    paths = fixture.make_fixture(
        d, n_speakers=2, n_samples=2, audio_len_ms=600, gap_ms=150.0,
        gap_std_ms=20.0,
    )
    stats_prefix = os.path.join(d, "spec_norm")
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", stats_prefix, "spec",
        window_size=24, step_size=12,
    )
    cfg = {
        "model": "a-blstm", "audio_feat_dim": 257, "video_feat_dim": 136,
        "audio_len": 9600, "batch_size": 2, "net_dim": [8], "integration_layer": 0,
        "dropout_rate": 0.0, "max_n_epochs": 1, "n_earlystop_epochs": 5,
        "optimizer_type": "adam", "starter_learning_rate": 0.003, "lr_decay": 1.0,
        "root_folder": paths["tfrecords"], "exp_folder": str(tmp_path / "exp"),
        "audio_feat_mean": stats_prefix + "_mean.npy",
        "audio_feat_std": stats_prefix + "_std.npy",
    }
    cfgp = str(tmp_path / "t.config")
    config_lib.save_configfile(cfg, cfgp)
    train_loop.train(cfgp)
    ckpt = str(tmp_path / "exp" / "netmodel")
    test_tfr = os.path.join(paths["tfrecords"], "test-set")
    test_aud = os.path.join(paths["audio"], "test-set")

    kw = dict(norm=True, batch_size=2, phase_recon="gl", gl_iters=2)
    single = inpaint.infer(ckpt, test_tfr, test_aud, "ds1", **kw)
    sharded = inpaint.infer(ckpt, test_tfr, test_aud, "ds2", data_shards=2, **kw)
    assert sharded["num_samples"] == single["num_samples"] > 0
    np.testing.assert_allclose(sharded["loss"], single["loss"], atol=1e-5)
    np.testing.assert_allclose(
        sharded["loss_hole"], single["loss_hole"], atol=1e-5
    )
    n_pairs = 0
    for root, _, names in os.walk(test_aud):
        if "ds1.wav" in names:
            assert "ds2.wav" in names
            a, b = os.path.join(root, "ds1.wav"), os.path.join(root, "ds2.wav")
            sa, wa = wavio.read_wav_int16(a)
            sb_, wb = wavio.read_wav_int16(b)
            assert sa == sb_
            # int16 quantization makes bit-level agreement the expectation;
            # allow a 1-LSB ulp from non-deterministic reduction order
            assert np.abs(wa.astype(np.int32) - wb.astype(np.int32)).max() <= 1
            n_pairs += 1
    assert n_pairs == single["num_samples"]

    with pytest.raises(ValueError):  # batch not divisible by shards
        inpaint.infer(ckpt, test_tfr, test_aud, "ds3", data_shards=3, **kw)


def test_tp_checkpoint_roundtrip(tmp_path):
    """A tensor-parallel (num_model_shards=2) TrainState must checkpoint
    and restore losslessly — onto the SAME (data=4, model=2) mesh and onto
    a single device — with step-for-step equivalence against the
    never-checkpointed run (the seam between mesh.shard_state and
    checkpoints.save_tree/restore_checkpoint; reference resume roles:
    training.py:160-166,266-268)."""
    from avsi.train import checkpoints

    cfg = tiny_config(model="av-blstm-ssnn-ctc", net_dim=(8, 8), audio_len=4800)
    batch = synth_batch(cfg, batch_size=8)
    model = registry.get_model(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), cfg)
    stats = identity_stats()
    tx = state_lib.make_optimizer(cfg)
    step_fn = jax.jit(loop_lib.make_train_step(model, tx, cfg, stats))
    rngs = [jax.random.PRNGKey(100 + i) for i in range(3)]

    mesh = mesh_lib.get_mesh(4, model_shards=2)
    st = mesh_lib.shard_state(
        state_lib.TrainState(params, tx.init(params), jnp.int32(0)), mesh
    )
    sb = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
          for k, v in mesh_lib.device_batch(batch).items()}

    # one step, then checkpoint the (still-sharded) state
    st, _ = step_fn(st, sb, jax.device_put(rngs[0], NamedSharding(mesh, P())))
    ckpt_dir = str(tmp_path / "ck")
    checkpoints.save_checkpoint(
        ckpt_dir, "ckpt", jax.device_get(st.params),
        opt_state=jax.device_get(st.opt_state), step=1,
    )

    # reference trajectory: two more steps, never checkpointed
    ref = st
    for r in rngs[1:]:
        ref, _ = step_fn(ref, sb, jax.device_put(r, NamedSharding(mesh, P())))
    ref_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(ref.params)]

    # (a) restore onto the same 2-D mesh
    p2, o2, step = checkpoints.restore_checkpoint(
        ckpt_dir, "ckpt", params, opt_template=tx.init(params)
    )
    assert step == 1
    st_a = mesh_lib.shard_state(
        state_lib.TrainState(p2, o2, jnp.int32(step)), mesh
    )
    for r in rngs[1:]:
        st_a, _ = step_fn(st_a, sb, jax.device_put(r, NamedSharding(mesh, P())))
    for a, b in zip(
        jax.tree_util.tree_leaves(st_a.params), ref_leaves, strict=True
    ):
        # identical sharded program on identical restored values: only the
        # float32 device_get->device_put round trip may wiggle nothing
        np.testing.assert_array_equal(np.asarray(a), b)

    # (b) restore onto a single device
    p3, o3, _ = checkpoints.restore_checkpoint(
        ckpt_dir, "ckpt", params, opt_template=tx.init(params)
    )
    st_b = state_lib.TrainState(p3, o3, jnp.int32(1))
    for r in rngs[1:]:
        st_b, _ = step_fn(st_b, batch, r)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_b.params), ref_leaves, strict=True
    ):
        # TP partial-product reduction order differs from single-device;
        # two adam steps near init keep the drift within the same budget
        # test_model_sharded_step_matches_single_device uses
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-4)


def test_sharded_eval_step_pallas_matches_scan():
    """The EVAL seam under a mesh: forward(train=False) with
    lstm_impl='pallas' + lstm_mesh takes the fused-stack shard_map path
    (core.blstm_stack forward_only) — per-sample losses must equal the
    scan's on the same sharded inputs."""
    cfg = tiny_config(model="av-blstm-ssnn-ctc", net_dim=(8, 8), audio_len=4800)
    batch = synth_batch(cfg, batch_size=8)
    model = registry.get_model(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), cfg)
    stats = identity_stats()
    mesh = mesh_lib.get_mesh(8)
    sb = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
          for k, v in mesh_lib.device_batch(batch).items()}
    pr = jax.device_put(params, NamedSharding(mesh, P()))

    def run(impl):
        c = dict(cfg, lstm_impl=impl)
        if impl == "pallas":
            c["lstm_mesh"] = mesh
        step = jax.jit(loop_lib.make_eval_step(model, c, stats))
        return step(pr, sb)

    ref = run("scan")
    got = run("pallas")
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=1e-4, rtol=1e-4,
            err_msg=k,
        )
