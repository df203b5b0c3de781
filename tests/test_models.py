"""Shape / jit / semantics tests for every model in the zoo.

The capability matrix is the reference's 15-way dispatch
(training_ctc.py:80-137) + unet + twosteps + the ASR models.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsi.models import asr, blstm, registry
from helpers import identity_stats, synth_batch, tiny_config

T = 25  # ceil(4800 / 192)


@pytest.mark.parametrize("name", registry.BLSTM_NAMES)
def test_blstm_family_forward(name):
    cfg = tiny_config(model=name)
    batch = synth_batch(cfg)
    stats = identity_stats()
    model = registry.get_model(name)
    params = model.init(jax.random.PRNGKey(0), cfg)
    out = model.forward(params, batch, cfg, stats)
    assert out["prediction"].shape == (2, T, 257)
    losses = model.losses(out, batch, cfg)
    assert np.isfinite(float(losses["loss"]))
    if model.needs_labels:
        assert "ctc_loss" in losses
        assert out["asr_logits"].shape == (2, T, 34)
    wav = model.enhanced_sources(out, batch, cfg, stats)
    assert wav.shape == (2, 4800)


def test_blstm_spec_parsing():
    s = blstm.parse_model_name("av-blstm-ssnn-ctc")
    assert s.input_type == "av" and s.conditioning == "ssnn" and s.ctc
    assert s.restore_unmasked and s.loss_on_hole_only
    s = blstm.parse_model_name("a-blstm")
    assert not s.restore_unmasked and not s.loss_on_hole_only and s.conditioning is None
    with pytest.raises(ValueError):
        blstm.parse_model_name("x-blstm")


def test_restore_unmasked_semantics():
    """ssnn-family prediction must equal target on unmasked bins
    (models.py:1012)."""
    cfg = tiny_config(model="a-blstm-ssnn")
    batch = synth_batch(cfg)
    stats = identity_stats()
    model = registry.get_model("a-blstm-ssnn")
    params = model.init(jax.random.PRNGKey(0), cfg)
    out = model.forward(params, batch, cfg, stats)
    masks = np.asarray(batch["masks"])
    pred = np.asarray(out["prediction"])
    target = np.asarray(out["target_spec_norm"])
    np.testing.assert_allclose(pred[masks == 1], target[masks == 1], atol=1e-5)
    losses = model.losses(out, batch, cfg)
    assert float(losses["loss_valid"]) < 1e-5  # valid bins restored exactly


def test_integration_layer_mid_stack():
    cfg = tiny_config(model="av-blstm-ssnn", net_dim=(16, 16, 16), integration_layer=1)
    batch = synth_batch(cfg)
    model = registry.get_model("av-blstm-ssnn")
    params = model.init(jax.random.PRNGKey(0), cfg)
    assert "blstm1" in params and "blstm2" in params
    assert len(params["blstm1"]) == 1 and len(params["blstm2"]) == 2
    out = model.forward(params, batch, cfg, identity_stats())
    assert out["prediction"].shape == (2, T, 257)


def test_twosteps():
    cfg = tiny_config(model="av-blstm-twosteps")
    batch = synth_batch(cfg)
    model = registry.get_model("av-blstm-twosteps")
    params = model.init(jax.random.PRNGKey(0), cfg)
    out = model.forward(params, batch, cfg, identity_stats())
    assert out["prediction"].shape == (2, T, 257)
    assert out["video_prediction"].shape == (2, T, 257)
    mask = model.trainable_mask(params)
    leaves = jax.tree_util.tree_leaves(mask["vnet"])
    assert not any(leaves)
    # vnet gets no gradient through the av path
    def loss_fn(p):
        o = model.forward(p, batch, cfg, identity_stats())
        return model.losses(o, batch, cfg)["loss"]

    grads = jax.grad(loss_fn)(params)
    vnet_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["vnet"]))
    avnet_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["avnet"]))
    assert vnet_norm == 0.0 and avnet_norm > 0.0


def test_unet():
    cfg = tiny_config(model="unet", audio_len=8192, audio_feat_dim=128)
    batch = synth_batch(cfg)
    model = registry.get_model("unet")
    params = model.init(jax.random.PRNGKey(0), cfg)
    stats = identity_stats(128)
    out = model.forward(params, batch, cfg, stats, train=True)
    assert out["prediction"].shape == (2, 64, 128)
    losses = model.losses(out, batch, cfg)
    assert np.isfinite(float(losses["loss"]))
    wav = model.enhanced_sources(out, batch, cfg, stats)
    assert wav.shape == (2, 8192)


def test_asr_model():
    cfg = tiny_config(model="a-blstm")
    batch = synth_batch(cfg)
    stats = (jnp.zeros((80,)), jnp.ones((80,)))
    params = asr.init(jax.random.PRNGKey(0), cfg)
    out = asr.forward(params, batch, cfg, stats)
    assert out["logits"].shape == (2, T, 34)
    losses = asr.losses(out, batch, cfg)
    assert np.isfinite(float(losses["loss"])) and float(losses["loss"]) > 0
    decoded = asr.decode_greedy(out, batch)
    assert decoded.shape == (2, T)
    # masked-input evaluation path (inference_asr --apply_mask)
    out_m = asr.forward(params, batch, cfg, stats, apply_mask=True)
    assert not np.allclose(np.asarray(out_m["logits"]), np.asarray(out["logits"]))


def test_asr_frame_stacking():
    """frame_stack=k shortens the scan k-fold (arXiv 1705.05992)."""
    cfg = tiny_config(model="a-blstm", frame_stack=3)
    batch = synth_batch(cfg)
    stats = (jnp.zeros((80,)), jnp.ones((80,)))
    params = asr.init(jax.random.PRNGKey(0), cfg)
    out = asr.forward(params, batch, cfg, stats)
    t_stacked = -(-T // 3)
    assert out["logits"].shape == (2, t_stacked, 34)
    np.testing.assert_array_equal(np.asarray(out["logit_lengths"]), [t_stacked] * 2)
    losses = asr.losses(out, batch, cfg)
    assert np.isfinite(float(losses["loss"])) and float(losses["loss"]) > 0
    decoded = asr.decode_greedy(out, batch)
    assert decoded.shape == (2, t_stacked)


def test_forward_is_jittable():
    cfg = tiny_config(model="av-blstm-ssnn-ctc")
    batch = synth_batch(cfg)
    model = registry.get_model("av-blstm-ssnn-ctc")
    params = model.init(jax.random.PRNGKey(0), cfg)
    stats = identity_stats()

    @jax.jit
    def step(p, b):
        out = model.forward(p, b, cfg, stats)
        return model.losses(out, b, cfg)["loss"]

    l1 = float(step(params, batch))
    l2 = float(step(params, batch))
    assert np.isfinite(l1) and l1 == l2


def test_hole_free_batch_loss_is_finite():
    """A batch whose masks are all ones (no hole) must yield loss 0 for
    hole-only variants, not 0/0 = NaN (which would trip the NaN abort)."""
    cfg = tiny_config(model="av-blstm-ssnn", net_dim=(8, 8))
    model = registry.get_model(cfg["model"])
    params = model.init(jax.random.PRNGKey(0), cfg)
    batch = dict(synth_batch(cfg))
    batch["masks"] = jnp.ones_like(batch["masks"])
    out = model.forward(params, batch, cfg, identity_stats())
    l = model.losses(out, batch, cfg)
    assert np.isfinite(float(l["loss"]))
    assert float(l["loss_hole"]) == 0.0

    from avsi.models import unet

    ucfg = tiny_config(model="unet", audio_feat_dim=128, audio_len=4864)
    umodel = registry.get_model("unet")
    uparams = umodel.init(jax.random.PRNGKey(0), ucfg)
    ubatch = dict(synth_batch(ucfg))
    ubatch["masks"] = jnp.ones_like(ubatch["masks"])
    uout = umodel.forward(uparams, ubatch, ucfg, identity_stats(128))
    ul = umodel.losses(uout, ubatch, ucfg)
    assert np.isfinite(float(ul["loss_hole"]))
