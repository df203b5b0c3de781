"""Equivalence of the fused Pallas BLSTM kernel vs the lax.scan layer.

Runs in interpret mode off-TPU (conftest forces CPU), so these tests pin
the kernel's semantics — fp32 and bf16-gate paths, the padded gate layout,
block-steps divisors, and the stacked-layer composition — against
models/core.bilstm_layer, the single source of truth for the recurrence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsi.models import core
from avsi.ops import pallas_lstm


def _layer_params(rng, in_dim, hidden):
    return core.lstm_layer_init(rng, in_dim, hidden)


@pytest.mark.parametrize("hidden", [250, 128])
def test_matches_scan_fp32(hidden):
    rng = jax.random.PRNGKey(0)
    params = _layer_params(rng, 70, hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 20, 70), jnp.float32)
    ref = core.bilstm_layer(params, x, jnp.float32)
    got = pallas_lstm.bilstm_layer_pallas(
        params, x, jnp.float32, block_steps=5, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_matches_scan_bf16_gates():
    rng = jax.random.PRNGKey(2)
    params = _layer_params(rng, 64, 250)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 64), jnp.float32)
    ref = core.bilstm_layer(params, x, jnp.bfloat16)
    got = pallas_lstm.bilstm_layer_pallas(
        params, x, jnp.bfloat16, block_steps=4, interpret=True
    )
    # both paths run bf16 matmuls/gates; identical math modulo the padded
    # gate layout's zero columns, so agreement is bf16-tight
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_block_steps_one_matches_block_steps_five():
    rng = jax.random.PRNGKey(4)
    params = _layer_params(rng, 32, 128)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 10, 32), jnp.float32)
    a = pallas_lstm.bilstm_layer_pallas(
        params, x, jnp.float32, block_steps=1, interpret=True
    )
    b = pallas_lstm.bilstm_layer_pallas(
        params, x, jnp.float32, block_steps=5, interpret=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pick_block_steps():
    assert pallas_lstm.pick_block_steps(250) == 5
    assert pallas_lstm.pick_block_steps(250, 10) == 10
    assert pallas_lstm.pick_block_steps(256, 5) == 4
    assert pallas_lstm.pick_block_steps(7, 5) == 1


def test_pad_gate_params_zero_pad_rows():
    rng = jax.random.PRNGKey(6)
    params = _layer_params(rng, 16, 250)
    pp, hp = pallas_lstm.pad_gate_params(params, jnp.float32)
    assert hp == 256
    assert pp["wx"].shape == (2, 16, 4 * 256)
    assert pp["wh"].shape == (2, 256, 4 * 256)
    # pad rows of wh are zero: garbage pad lanes of h cannot leak into
    # real gate lanes through the recurrent matmul
    np.testing.assert_array_equal(np.asarray(pp["wh"][:, 250:, :]), 0.0)
    # gate g's real columns live at g*256:g*256+250
    for g in range(4):
        np.testing.assert_allclose(
            np.asarray(pp["wx"][:, :, g * 256 : g * 256 + 250]),
            np.asarray(params["wx"][:, :, g * 250 : (g + 1) * 250]),
        )
        np.testing.assert_array_equal(
            np.asarray(pp["wx"][:, :, g * 256 + 250 : (g + 1) * 256]), 0.0
        )


def test_resolve_impl():
    from avsi.parallel import mesh as mesh_lib

    # conftest forces CPU: auto must resolve to the scan off-TPU
    assert pallas_lstm.resolve_impl("auto") == "scan"
    assert pallas_lstm.resolve_impl(None) == "scan"
    assert pallas_lstm.resolve_impl("scan") == "scan"
    # explicit pallas is honored (the caller owns the backend choice)...
    assert pallas_lstm.resolve_impl("pallas") == "pallas"
    # ...including under a data mesh (shard_map path) when the mesh is
    # supplied...
    data_mesh = mesh_lib.get_mesh(8)
    assert pallas_lstm.resolve_impl(
        "pallas", sharded=True, mesh=data_mesh) == "pallas"
    # ...but refused when the caller claims sharding without a mesh, under
    # tensor parallelism (the kernel wants whole params), or multi-host
    with pytest.raises(ValueError, match="needs the mesh"):
        pallas_lstm.resolve_impl("pallas", sharded=True)
    tp_mesh = mesh_lib.get_mesh(4, model_shards=2)
    with pytest.raises(ValueError, match="whole parameters"):
        pallas_lstm.resolve_impl("pallas", sharded=True, mesh=tp_mesh)
    with pytest.raises(ValueError, match="across hosts"):
        pallas_lstm.resolve_impl("pallas", multihost=True)
    with pytest.raises(ValueError, match="unknown lstm_impl"):
        pallas_lstm.resolve_impl("cudnn")
    # auto degrades (never raises) on the unsupported layouts
    assert pallas_lstm.resolve_impl("auto", sharded=True) == "scan"
    assert pallas_lstm.resolve_impl(
        "auto", sharded=True, mesh=tp_mesh) == "scan"
    assert pallas_lstm.resolve_impl("auto", multihost=True) == "scan"


def test_resolve_impl_auto_on_tpu(monkeypatch):
    """The auto policy's TPU branch (simulated backend): data meshes ride
    the kernel, the VMEM batch ceiling applies PER DEVICE."""
    from avsi.parallel import mesh as mesh_lib

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    data_mesh = mesh_lib.get_mesh(8)
    assert pallas_lstm.resolve_impl("auto") == "pallas"
    assert pallas_lstm.resolve_impl(
        "auto", sharded=True, mesh=data_mesh) == "pallas"
    # 4096 global / 8 shards = 512 per device: at the ceiling, kernel OK
    assert pallas_lstm.resolve_impl(
        "auto", sharded=True, batch_size=4096, mesh=data_mesh) == "pallas"
    # 600 unsharded exceeds the per-device ceiling
    assert pallas_lstm.resolve_impl("auto", batch_size=600) == "scan"
    # sharded-without-mesh still degrades to the scan even on TPU
    assert pallas_lstm.resolve_impl("auto", sharded=True) == "scan"


def test_auto_block_steps_budget():
    # flagship shapes: bf16 keeps the measured-optimal k=5, fp32's larger
    # stream drops to k=2, and a 4x batch drops further — never exceeding
    # the VMEM stream budget that made k=10 fp32 / k=25 bf16 fail to
    # compile on v5e
    assert pallas_lstm.auto_block_steps(
        250, 128, 256, jnp.bfloat16, jnp.float32) == 5
    assert pallas_lstm.auto_block_steps(
        250, 128, 256, jnp.float32, jnp.float32) == 2
    k512 = pallas_lstm.auto_block_steps(
        250, 512, 256, jnp.bfloat16, jnp.float32)
    step = 2 * 512 * 4 * 256 * 2 + 2 * 512 * 256 * 4
    assert 2 * k512 * step <= pallas_lstm._VMEM_STREAM_BUDGET
    assert k512 >= 1


def test_core_stack_impl_plumbing():
    # core.blstm_stack(impl="pallas") must equal the scan stack — this is
    # the exact seam the models' `lstm_impl` config key goes through
    rng = jax.random.PRNGKey(9)
    layers = core.blstm_stack_init(rng, 40, [96])
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 10, 40), jnp.float32)
    ref = core.blstm_stack(layers, x, jnp.float32)
    got = core.blstm_stack(layers, x, jnp.float32, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("hidden,k", [(5, 3), (128, 5), (33, 3)])
def test_grad_matches_scan(hidden, k):
    # the custom VJP (fused backward kernel) against jax.grad of the scan:
    # every gradient — wx, wh, b, and the input — to f32 roundoff,
    # including padded gate layouts (H=5 -> Hp=128, H=33 -> 128)
    rng = jax.random.PRNGKey(11)
    params = _layer_params(rng, 7, hidden)
    x = jax.random.normal(jax.random.PRNGKey(12), (3, 12, 7), jnp.float32)

    def loss_scan(p, xx):
        return jnp.sum(jnp.sin(core.bilstm_layer(p, xx, jnp.float32)))

    def loss_pallas(p, xx):
        return jnp.sum(jnp.sin(pallas_lstm.bilstm_layer_pallas(
            p, xx, jnp.float32, block_steps=k, interpret=True)))

    gs = jax.grad(loss_scan, argnums=(0, 1))(params, x)
    gp = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    for name in ("wx", "wh", "b"):
        assert gp[0][name].dtype == jnp.float32
        scale = max(1.0, float(jnp.abs(gs[0][name]).max()))
        np.testing.assert_allclose(
            np.asarray(gp[0][name]), np.asarray(gs[0][name]),
            atol=2e-5 * scale,
        )
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]),
                               atol=2e-5)


def test_grad_single_block():
    # nblk == 1 exercises the zero boundary rows (no previous block)
    rng = jax.random.PRNGKey(13)
    params = _layer_params(rng, 4, 3)
    x = jax.random.normal(jax.random.PRNGKey(14), (2, 6, 4), jnp.float32)

    def loss(impl_pallas):
        def f(p, xx):
            if impl_pallas:
                y = pallas_lstm.bilstm_layer_pallas(
                    p, xx, jnp.float32, block_steps=6, interpret=True)
            else:
                y = core.bilstm_layer(p, xx, jnp.float32)
            return jnp.sum(y * y)
        return f

    gs = jax.grad(loss(False))(params, x)
    gp = jax.grad(loss(True))(params, x)
    for name in ("wx", "wh", "b"):
        np.testing.assert_allclose(
            np.asarray(gp[name]), np.asarray(gs[name]), atol=2e-5)


def test_train_step_matches_scan():
    # full jitted train step (grads + adam) through the models' lstm_impl
    # config key: pallas state == scan state after two steps — the exact
    # seam train/loop.py's resolve_impl switches
    from avsi.flagship import flagship_config, synthetic_batch
    from avsi.models import registry
    from avsi.train import loop as loop_lib, state as state_lib

    def run(impl):
        config = flagship_config(2, "float32", net_dim=[5, 5], audio_len=4800)
        config["lstm_impl"] = impl
        model = registry.get_model(config["model"])
        params = model.init(jax.random.PRNGKey(0), config)
        stats = (np.zeros(257, np.float32), np.ones(257, np.float32))
        tx = state_lib.make_optimizer(config)
        st = state_lib.TrainState(params, tx.init(params), jnp.int32(0))
        step = jax.jit(loop_lib.make_train_step(model, tx, config, stats))
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_batch(config, 2).items()}
        for i in range(2):
            st, ldict = step(st, batch, jax.random.PRNGKey(5))
        return st, ldict

    st_s, l_s = run("scan")
    st_p, l_p = run("pallas")
    np.testing.assert_allclose(float(l_p["loss"]), float(l_s["loss"]),
                               rtol=1e-5)
    flat_s = jax.tree_util.tree_leaves_with_path(st_s.params)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(st_p.params))
    for path, leaf_s in flat_s:
        # adam's per-element normalization amplifies f32 grad roundoff,
        # so the post-update tolerance is looser than the raw-grad one
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf_s), atol=2e-5,
            err_msg=str(path),
        )


def test_stacked_layers_match_scan_stack():
    rng = jax.random.PRNGKey(7)
    layers = core.blstm_stack_init(rng, 48, [128, 128])
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 15, 48), jnp.float32)
    ref = core.blstm_stack(layers, x, jnp.float32)
    out = x
    for layer in layers:
        out = pallas_lstm.bilstm_layer_pallas(
            layer, out, jnp.float32, block_steps=5, interpret=True
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


# ----------------------------------------------------------- LC window kernel


@pytest.mark.parametrize("hidden", [250, 128, 5])
def test_lc_window_matches_scan_layer(hidden):
    """lc_bilstm_window_pallas == streaming._lc_bilstm_layer: same output
    window, same emit-boundary forward carry (f32 gates on both sides)."""
    from avsi.infer import streaming

    rng = jax.random.PRNGKey(11)
    params = _layer_params(rng, 24, hidden)
    x = jax.random.normal(jax.random.PRNGKey(12), (3, 24, 24), jnp.float32)
    ch = jax.random.normal(jax.random.PRNGKey(13), (3, hidden), jnp.float32)
    cc = jax.random.normal(jax.random.PRNGKey(14), (3, hidden), jnp.float32)
    ref, rh, rc = streaming._lc_bilstm_layer(
        params, x, ch, cc, 8, jnp.float32, jnp.float32
    )
    got, gh, gc = pallas_lstm.lc_bilstm_window_pallas(
        params, x, ch, cc, 8, jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(rc), atol=2e-5)


def test_lc_window_chained_matches_scan():
    """Three consecutive windows with carried state: the kernel composes
    across window boundaries exactly like the scan layer."""
    from avsi.infer import streaming

    rng = jax.random.PRNGKey(21)
    hidden, emit, look = 33, 4, 5
    w = emit + look
    params = _layer_params(rng, 10, hidden)
    xs = jax.random.normal(jax.random.PRNGKey(22), (3, 2, w, 10), jnp.float32)
    ch_s = cc_s = ch_p = cc_p = jnp.zeros((2, hidden), jnp.float32)
    for i in range(3):
        x = xs[i % xs.shape[0]]
        ref, ch_s, cc_s = streaming._lc_bilstm_layer(
            params, x, ch_s, cc_s, emit, jnp.float32, jnp.float32
        )
        got, ch_p, cc_p = pallas_lstm.lc_bilstm_window_pallas(
            params, x, ch_p, cc_p, emit, jnp.float32, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, err_msg=f"window {i}")
    np.testing.assert_allclose(np.asarray(ch_p), np.asarray(ch_s), atol=5e-5)
    np.testing.assert_allclose(np.asarray(cc_p), np.asarray(cc_s), atol=5e-5)


def test_lc_window_bf16_close_to_scan():
    """bf16 compute: the kernel's f32 in-VMEM gate evaluation vs the scan's
    bf16 gate stream — agreement is bf16-loose, same as the full-sequence
    kernel's documented deviation."""
    from avsi.infer import streaming

    rng = jax.random.PRNGKey(31)
    params = _layer_params(rng, 16, 128)
    x = jax.random.normal(jax.random.PRNGKey(32), (2, 12, 16), jnp.float32)
    ch = jnp.zeros((2, 128), jnp.float32)
    cc = jnp.zeros((2, 128), jnp.float32)
    ref, rh, rc = streaming._lc_bilstm_layer(
        params, x, ch, cc, 6, jnp.bfloat16
    )
    got, gh, gc = pallas_lstm.lc_bilstm_window_pallas(
        params, x, ch, cc, 6, jnp.bfloat16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh), atol=3e-2)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(rc), atol=3e-2)


def test_resolve_stream_impl(monkeypatch):
    from avsi.infer import streaming
    from avsi.parallel import mesh as mesh_lib

    assert streaming.resolve_stream_impl(None) == "scan"
    assert streaming.resolve_stream_impl("scan") == "scan"
    # off-TPU (conftest CPU) auto stays on the scan
    assert streaming.resolve_stream_impl("auto") == "scan"
    assert streaming.resolve_stream_impl("pallas") == "pallas"
    with pytest.raises(ValueError):
        streaming.resolve_stream_impl("cudnn")

    mesh = mesh_lib.get_mesh(8)
    tp_mesh = mesh_lib.get_mesh(4, model_shards=2)
    # fleet data meshes ride the kernel (shard_map); TP meshes keep the
    # scan and refuse an explicit pallas
    assert streaming.resolve_stream_impl("pallas", mesh=mesh) == "pallas"
    with pytest.raises(ValueError, match="whole parameters"):
        streaming.resolve_stream_impl("pallas", mesh=tp_mesh)
    assert streaming.resolve_stream_impl("auto", mesh=tp_mesh) == "scan"

    # TPU branch (simulated backend): auto serves the kernel ONLY where it
    # is bit-identical to the trained function — f32 gates
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert streaming.resolve_stream_impl("auto") == "pallas"
    assert streaming.resolve_stream_impl(
        "auto", gate_dtype=jnp.float32) == "pallas"
    assert streaming.resolve_stream_impl(
        "auto", gate_dtype=jnp.bfloat16) == "scan"
    assert streaming.resolve_stream_impl("auto", mesh=mesh) == "pallas"
    assert streaming.resolve_stream_impl("auto", mesh=tp_mesh) == "scan"
    # explicit pallas may trade gate quantization for speed (documented)
    assert streaming.resolve_stream_impl(
        "pallas", gate_dtype=jnp.bfloat16) == "pallas"


# ------------------------------------------------------- sharded (shard_map)


def test_sharded_layer_matches_scan():
    """bilstm_layer_pallas_sharded on the 8-device mesh == the scan layer:
    per shard the kernel is the same single-device program (interpret mode
    here), shard_map contributes only the partitioning."""
    from avsi.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_mesh(8)
    rng = jax.random.PRNGKey(11)
    params = _layer_params(rng, 40, 96)
    x = jax.random.normal(jax.random.PRNGKey(12), (8, 10, 40), jnp.float32)
    ref = core.bilstm_layer(params, x, jnp.float32)
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    )
    got = jax.jit(
        lambda p, xx: pallas_lstm.bilstm_layer_pallas_sharded(
            p, xx, mesh, jnp.float32
        )
    )(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_sharded_layer_grad_matches_scan():
    """jax.grad through shard_map + the custom VJP: dparams must come back
    psummed over the data axis (the transpose of the replicated in_spec)
    and dx partitioned — both equal to the scan gradients."""
    from avsi.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_mesh(8)
    rng = jax.random.PRNGKey(13)
    params = _layer_params(rng, 24, 64)
    x = jax.random.normal(jax.random.PRNGKey(14), (8, 12, 24), jnp.float32)

    def loss_scan(p, xx):
        return jnp.sum(core.bilstm_layer(p, xx, jnp.float32) ** 2)

    def loss_sharded(p, xx):
        y = pallas_lstm.bilstm_layer_pallas_sharded(p, xx, mesh, jnp.float32)
        return jnp.sum(y ** 2)

    gp_ref, gx_ref = jax.grad(loss_scan, argnums=(0, 1))(params, x)
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    )
    gp, gx = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(params, xs)
    for k in ("wx", "wh", "b"):
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]), atol=3e-4, rtol=1e-4,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), atol=3e-4
    )


def test_sharded_train_step_matches_scan():
    """The models' config seam under a mesh: a full jitted train step with
    lstm_impl='pallas' + lstm_mesh equals the scan step on the same sharded
    inputs — the exact path train/loop.py now enables on data meshes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avsi.flagship import flagship_config, synthetic_batch
    from avsi.models import registry
    from avsi.parallel import mesh as mesh_lib
    from avsi.train import loop as loop_lib, state as state_lib

    mesh = mesh_lib.get_mesh(8)

    def run(impl):
        config = flagship_config(8, "float32", net_dim=[5, 5], audio_len=4800)
        config["lstm_impl"] = impl
        if impl == "pallas":
            config["lstm_mesh"] = mesh
        model = registry.get_model(config["model"])
        params = model.init(jax.random.PRNGKey(0), config)
        stats = (np.zeros(257, np.float32), np.ones(257, np.float32))
        tx = state_lib.make_optimizer(config)
        st = state_lib.TrainState(params, tx.init(params), jnp.int32(0))
        st = jax.device_put(st, NamedSharding(mesh, P()))
        step = jax.jit(loop_lib.make_train_step(model, tx, config, stats))
        batch = {
            k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, P("data")))
            for k, v in synthetic_batch(config, 8).items()
        }
        st, ldict = step(st, batch, jax.device_put(
            jax.random.PRNGKey(5), NamedSharding(mesh, P())))
        return st, ldict

    st_s, l_s = run("scan")
    st_p, l_p = run("pallas")
    np.testing.assert_allclose(float(l_p["loss"]), float(l_s["loss"]),
                               rtol=1e-5)
    flat_s = jax.tree_util.tree_leaves_with_path(st_s.params)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(st_p.params))
    for path, leaf_s in flat_s:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf_s), atol=2e-5,
            err_msg=str(path),
        )


def test_sharded_rejects_tensor_parallel_mesh():
    from avsi.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_mesh(4, model_shards=2)
    params = _layer_params(jax.random.PRNGKey(15), 8, 16)
    x = jnp.zeros((4, 6, 8), jnp.float32)
    with pytest.raises(ValueError, match="whole \\(replicated\\) params"):
        pallas_lstm.bilstm_layer_pallas_sharded(params, x, mesh, jnp.float32)
