"""Unit tests for the partial-convolution U-Net (models.py:320-516,
unet_layers.py:40-61 — reimplemented, with the reference's two bugs fixed;
see avsi/models/unet_pconv.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsi.models import unet_pconv
from avsi.models.unet import ENC


@pytest.fixture(scope="module")
def layer_params():
    rng = jax.random.PRNGKey(0)
    kernel, cin, cout = 5, 3, 8
    from avsi.models.unet import _conv_init

    return _conv_init(rng, kernel, cin, cout), kernel, cin, cout


def test_pconv_hole_invariance(layer_params):
    """Output must not depend on feature values inside masked-out cells."""
    p, kernel, cin, cout = layer_params
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(2, 16, 16, cin)).astype(np.float32)
    m = np.ones((2, 16, 16, 1), np.float32)
    m[:, 4:9, 3:12] = 0.0
    x2 = x1.copy()
    x2[:, 4:9, 3:12] = rng.normal(size=(2, 5, 9, cin)) * 100  # garbage in hole
    y1, m1 = unet_pconv._pconv(p, jnp.asarray(x1), jnp.asarray(m), kernel, 2)
    y2, m2 = unet_pconv._pconv(p, jnp.asarray(x2), jnp.asarray(m), kernel, 2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_pconv_mask_propagation_shrinks_hole(layer_params):
    """Positions whose window overlaps any valid pixel become valid."""
    p, kernel, cin, cout = layer_params
    x = jnp.zeros((1, 32, 32, cin))
    m = np.ones((1, 32, 32, 1), np.float32)
    m[:, 8:24, 8:24] = 0.0
    _, m_new = unet_pconv._pconv(p, x, jnp.asarray(m), kernel, 1)
    m_new = np.asarray(m_new)[0, :, :, 0]
    # deep-interior hole stays invalid; hole border (within kernel reach of
    # valid pixels) becomes valid
    assert m_new[15, 15] == 0.0
    assert m_new[9, 9] == 1.0  # 5x5 window around (9,9) reaches row/col 7
    assert m_new.sum() > (m > 0).sum() - 16 * 16  # strictly fewer invalid


def test_pconv_all_valid_matches_plain_conv_interior(layer_params):
    """With no hole, interior outputs equal an ordinary conv + bias (the
    border still gets Liu-style renormalization for the SAME padding)."""
    p, kernel, cin, cout = layer_params
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, cin)).astype(np.float32))
    m = jnp.ones((1, 16, 16, 1))
    y, m_new = unet_pconv._pconv(p, x, m, kernel, 1)
    plain = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + p["b"]
    k2 = kernel // 2
    np.testing.assert_allclose(
        np.asarray(y)[:, k2:-k2, k2:-k2],
        np.asarray(plain)[:, k2:-k2, k2:-k2],
        rtol=2e-4, atol=1e-5,
    )
    assert np.asarray(m_new).min() == 1.0


def test_pconv_forward_shapes_and_grad():
    """Full model forward on a 64x128 spectrogram batch + a finite grad."""
    config = {"audio_feat_dim": 128, "audio_len": 8192}
    rng = jax.random.PRNGKey(0)
    params = unet_pconv.init(rng, config)
    # param inventory mirrors the fconv twin's geometry
    assert len(params["enc"]) == len(ENC) == 6 and len(params["dec"]) == 6
    assert "bn" not in params["enc"][0]  # first encoder: batch_norm=False
    assert "bn" not in params["dec"][5]  # last decoder: batch_norm=False (models.py:406)

    b, t, f = 2, 64, 128
    wave = jax.random.normal(jax.random.PRNGKey(1), (b, 8192)) * 1000.0
    masks = np.ones((b, t, f), np.float32)
    masks[:, 20:30] = 0.0
    batch = {
        "target_sources": wave,
        "masks": jnp.asarray(masks),
        "sequence_lengths": jnp.full((b,), t, jnp.int32),
    }
    stats = (jnp.zeros((f,)), jnp.ones((f,)))

    def loss_fn(p):
        out = unet_pconv.forward(p, batch, config, stats, train=True)
        return unet_pconv.losses(out, batch, config)["loss"]

    out = unet_pconv.forward(params, batch, config, stats, train=False)
    assert out["prediction"].shape == (b, t, f)
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
