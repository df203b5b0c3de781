"""TF-checkpoint interchange (avsi/infer/import_tf.py).

Validates both directions against (a) real TF checkpoints written with
tf.compat.v1.train.Saver under the reference's variable naming and (b) an
independent numpy transcription of the TF LSTMCell (gate order i, j, f, o,
forget_bias=0 — the CudnnCompatibleLSTMCell semantics) driving the
gate-permutation correctness end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsi.infer import import_tf
from avsi.models import core, registry
from helpers import tiny_config


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_tf_lstm(x, kernel, bias):
    """Numpy transcription of TF LSTMCell (i, j, f, o; forget_bias=0)."""
    hidden = bias.shape[0] // 4
    h = np.zeros(hidden)
    c = np.zeros(hidden)
    out = []
    for t in range(x.shape[0]):
        z = np.concatenate([x[t], h]) @ kernel + bias
        i, j, f, o = np.split(z, 4)
        c = _sigmoid(f) * c + _sigmoid(i) * np.tanh(j)
        h = _sigmoid(o) * np.tanh(c)
        out.append(h.copy())
    return np.stack(out)


def test_gate_permutation_matches_tf_cell_semantics():
    """A TF-format kernel/bias imported through the gate permutation must
    make avsi's bilstm_layer reproduce the TF stacked-bidirectional
    output computed by the independent numpy cell."""
    rng = np.random.RandomState(0)
    d_in, hidden, t_len = 7, 5, 11
    k_fw = rng.randn(d_in + hidden, 4 * hidden).astype(np.float32) * 0.3
    k_bw = rng.randn(d_in + hidden, 4 * hidden).astype(np.float32) * 0.3
    b_fw = rng.randn(4 * hidden).astype(np.float32) * 0.1
    b_bw = rng.randn(4 * hidden).astype(np.float32) * 0.1
    x = rng.randn(t_len, d_in).astype(np.float32)

    fwd = _np_tf_lstm(x, k_fw, b_fw)
    bwd = _np_tf_lstm(x[::-1], k_bw, b_bw)[::-1]
    want = np.concatenate([fwd, bwd], axis=-1)

    layer = {
        "wx": import_tf._tf_to_avsi_gates(np.stack([k_fw[:d_in], k_bw[:d_in]])),
        "wh": import_tf._tf_to_avsi_gates(np.stack([k_fw[d_in:], k_bw[d_in:]])),
        "b": import_tf._tf_to_avsi_gates(np.stack([b_fw, b_bw])),
    }
    layer = jax.tree_util.tree_map(jnp.asarray, layer)
    got = np.asarray(core.bilstm_layer(layer, jnp.asarray(x)[None]))[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gate_maps_are_inverses():
    a = np.arange(24.0).reshape(2, 12)
    np.testing.assert_array_equal(
        import_tf._avsi_to_tf_gates(import_tf._tf_to_avsi_gates(a)), a
    )


def _flagship_cfg():
    return tiny_config(model="av-blstm-ssnn-ctc", net_dim=(6, 6), audio_len=4800)


def test_roundtrip_export_import(tmp_path):
    """export -> real TF checkpoint on disk -> import == identity."""
    cfg = _flagship_cfg()
    params = registry.get_model(cfg["model"]).init(jax.random.PRNGKey(3), cfg)
    prefix = str(tmp_path / "ref" / "model.ckpt")
    import_tf.export_tf_checkpoint(params, cfg, prefix)
    got = import_tf.import_tf_checkpoint(prefix, cfg)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
        strict=True,
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, err_msg=jax.tree_util.keystr(pa))


def test_import_skips_optimizer_slots_and_checks_coverage(tmp_path):
    """A checkpoint with Adam slots and global_step imports cleanly; a
    checkpoint missing a head fails with the unfilled paths named."""
    import os

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import tensorflow as tf

    cfg = _flagship_cfg()
    params = registry.get_model(cfg["model"]).init(jax.random.PRNGKey(4), cfg)
    tf_vars = import_tf.params_to_tf_variables(params, cfg)
    head_w = "av-blstm-ssnn-ctc/inpainting/weights"
    assert head_w in tf_vars

    def write(var_dict, prefix):
        g = tf.Graph()
        with g.as_default():
            for name, val in var_dict.items():
                tf.compat.v1.get_variable(name, initializer=val)
            saver = tf.compat.v1.train.Saver()
            with tf.compat.v1.Session(graph=g) as sess:
                sess.run(tf.compat.v1.global_variables_initializer())
                saver.save(sess, prefix)

    # full checkpoint + optimizer debris the reference Saver also writes
    full = dict(tf_vars)
    full["global_step"] = np.int64(1234)
    full[head_w + "/Adam"] = np.zeros_like(tf_vars[head_w])
    full[head_w + "/Adam_1"] = np.zeros_like(tf_vars[head_w])
    write(full, str(tmp_path / "full" / "model.ckpt"))
    got = import_tf.import_tf_checkpoint(str(tmp_path / "full" / "model.ckpt"), cfg)
    np.testing.assert_allclose(
        np.asarray(got["head_ipt"]["w"]), tf_vars[head_w], atol=0
    )
    # gate permutation really applied on the way in
    k0 = tf_vars[
        "av-blstm-ssnn-ctc/cudnn_lstm/stack_bidirectional_rnn/cell_0/"
        "bidirectional_rnn/fw/cudnn_compatible_lstm_cell/kernel"
    ]
    in_dim = k0.shape[0] - cfg["net_dim"][0]
    np.testing.assert_allclose(
        np.asarray(got["blstm"][0]["wx"][0]),
        import_tf._tf_to_avsi_gates(k0[:in_dim]),
        atol=0,
    )

    # incomplete checkpoint: drop the asr head
    partial = {k: v for k, v in tf_vars.items() if "/asr/" not in k}
    write(partial, str(tmp_path / "partial" / "model.ckpt"))
    with pytest.raises(ValueError, match="head_asr"):
        import_tf.import_tf_checkpoint(str(tmp_path / "partial" / "model.ckpt"), cfg)


def test_cli_roundtrip(tmp_path):
    """avsi export_tf / import_tf subcommands round-trip a checkpoint with
    the default names (sinet), and the imported dir is a self-contained
    bundle `inference` can load (config.txt + stats + sinet weights)."""
    import os

    from avsi import cli, config as config_lib
    from avsi.infer.inpaint import load_model_bundle
    from avsi.train import checkpoints

    cfg = _flagship_cfg()
    cfg["root_folder"] = str(tmp_path)
    cfg["exp_folder"] = str(tmp_path / "exp")
    for key in ("audio_feat_mean", "audio_feat_std"):
        path = tmp_path / f"{key}.npy"
        np.save(path, np.zeros(257, np.float32))
        cfg[key] = str(path)
    cfg_path = str(tmp_path / "m.config")
    # check_trainconfiguration adds the CTC blank (+1): write the pre-blank
    # count so the CLI-side template matches the params saved below
    disk_cfg = dict(cfg, num_asr_labels=cfg["num_asr_labels"] - 1)
    config_lib.save_configfile(disk_cfg, cfg_path)
    params = registry.get_model(cfg["model"]).init(jax.random.PRNGKey(7), cfg)
    ckp_dir = str(tmp_path / "ckp")
    checkpoints.save_checkpoint(ckp_dir, "sinet", params)

    tf_prefix = str(tmp_path / "tf" / "model.ckpt")
    cli.main(["export_tf", "--config", cfg_path, "--model_ckp", ckp_dir,
              "--out_prefix", tf_prefix])
    back_dir = str(tmp_path / "back")
    cli.main(["import_tf", "--config", cfg_path, "--tf_ckp", tf_prefix,
              "--out_dir", back_dir])
    # the MIGRATION.md contract: the imported dir loads like a trained one
    for fname in ("config.txt", "audio_features_mean.npy", "audio_features_std.npy"):
        assert os.path.exists(os.path.join(back_dir, fname)), fname
    _, _, _, got = load_model_bundle(back_dir, norm=True)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(got),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


@pytest.mark.parametrize(
    "model", ["v-blstm", "av-blstm", "av-blstm-ssnn", "av-blstm-twosteps"]
)
def test_roundtrip_all_scope_layouts(model):
    """Scope mapping must be exact per path segment: 'av-blstm' contains
    'v-blstm' as a substring, and a standalone v-blstm's top scope equals
    the twosteps vnet sub-scope — both previously mis-mapped."""
    cfg = tiny_config(model=model, net_dim=(6, 6), audio_len=4800)
    params = registry.get_model(model).init(jax.random.PRNGKey(8), cfg)
    got = import_tf.map_tf_to_params(
        import_tf.params_to_tf_variables(params, cfg), params
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
        strict=True,
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("model", ["v-blstm", "av-blstm"])
def test_roundtrip_asr_scope_layouts(model):
    """ASR nets 'asr/v-blstm' and 'asr/av-blstm' (same substring trap)."""
    from avsi.models import asr as asr_model

    cfg = tiny_config(model=model, net_dim=(6, 6), audio_len=4800)
    cfg["num_asr_labels"] = 34
    params = asr_model.init(jax.random.PRNGKey(9), cfg)
    got = import_tf.map_tf_to_params(
        import_tf.params_to_tf_variables(params, cfg, is_asr=True), params
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(got),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_naming_twosteps_and_asr():
    """Scope layout for the two-steps model (own top scopes,
    models.py:255-260) and the ASR net ('asr/<model>', training_asr.py:80)."""
    cfg = tiny_config(model="av-blstm-twosteps", net_dim=(6, 6), audio_len=4800)
    params = registry.get_model(cfg["model"]).init(jax.random.PRNGKey(5), cfg)
    names = set(import_tf.params_to_tf_variables(params, cfg))
    assert "v-blstm/logits/weights" in names
    assert "av-blstm-twosteps/logits/weights" in names
    assert any(n.startswith("v-blstm/cudnn_lstm/stack_bidirectional_rnn/") for n in names)

    from avsi.models import asr as asr_model

    acfg = tiny_config(model="av-blstm", net_dim=(6, 6), audio_len=4800)
    acfg["num_asr_labels"] = 34
    ap = asr_model.init(jax.random.PRNGKey(6), acfg)
    anames = set(import_tf.params_to_tf_variables(ap, acfg, is_asr=True))
    assert "asr/av-blstm/logits/weights" in anames
    assert any(n.startswith("asr/av-blstm/cudnn_lstm/") for n in anames)
