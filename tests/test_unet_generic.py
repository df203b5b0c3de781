"""Generic image U-Net (C28 parity): shapes, softmax head, one train step."""

import numpy as np

import jax
import jax.numpy as jnp

from avsi.models import unet_generic


def test_forward_shapes_and_loss():
    params = unet_generic.init(jax.random.PRNGKey(0), channels_in=1, n_classes=2,
                               layers=3, features_root=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 92, 92, 1))
    logits = unet_generic.forward(params, x)
    b, h, w, c = logits.shape
    assert b == 2 and c == 2 and h < 92 and w < 92  # VALID convs shrink
    probs = unet_generic.pixel_wise_softmax(logits)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)

    labels = jax.nn.one_hot(jnp.zeros((b, h, w), jnp.int32), 2)
    l0 = float(unet_generic.loss(params, x, labels))
    assert np.isfinite(l0)
    # one SGD step reduces the loss on this batch
    grads = jax.grad(unet_generic.loss)(params, x, labels)
    params2 = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params, grads)
    l1 = float(unet_generic.loss(params2, x, labels))
    assert l1 < l0
