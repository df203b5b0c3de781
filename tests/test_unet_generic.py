"""Generic image U-Net (C28 parity): shapes, softmax head, one train step."""

import numpy as np

import jax
import jax.numpy as jnp

from avsi.models import unet_generic


def test_forward_shapes_and_loss():
    params = unet_generic.init(jax.random.PRNGKey(0), channels_in=1, n_classes=2,
                               layers=3, features_root=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 92, 92, 1))
    fwd = jax.jit(unet_generic.forward)  # eager op-by-op CPU execution is ~4x slower
    logits = fwd(params, x)
    b, h, w, c = logits.shape
    assert b == 2 and c == 2 and h < 92 and w < 92  # VALID convs shrink
    probs = unet_generic.pixel_wise_softmax(logits)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)

    labels = jax.nn.one_hot(jnp.zeros((b, h, w), jnp.int32), 2)
    loss_and_grad = jax.jit(jax.value_and_grad(unet_generic.loss))
    l0, grads = loss_and_grad(params, x, labels)
    assert np.isfinite(float(l0))
    # one SGD step reduces the loss on this batch
    params2 = jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params, grads)
    l1, _ = loss_and_grad(params2, x, labels)
    assert float(l1) < float(l0)


def _square_provider(rng):
    """Synthetic segmentation task: bright square on noise (like tf_unet's
    toy data provider)."""

    def provider(n):
        x = 0.1 * rng.standard_normal((n, 60, 60, 1)).astype(np.float32)
        y = np.zeros((n, 60, 60), np.int64)
        for i in range(n):
            r, c = rng.integers(8, 36, 2)
            x[i, r : r + 14, c : c + 14, 0] += 1.0
            y[i, r : r + 14, c : c + 14] = 1
        onehot = np.eye(2, dtype=np.float32)[y]
        return x, onehot

    return provider


def test_trainer_learns_and_checkpoints(tmp_path):
    """Reference unet.py Trainer semantics: momentum+staircase decay, per-
    epoch verification images, checkpoint save/restore (unet.py:310-503)."""
    from avsi.train import checkpoints

    rng = np.random.default_rng(0)
    provider = _square_provider(rng)
    params = unet_generic.init(jax.random.PRNGKey(0), channels_in=1, n_classes=2,
                               layers=2, features_root=4)
    out = str(tmp_path / "out")
    predd = str(tmp_path / "pred")
    tr = unet_generic.Trainer(params, batch_size=4, verification_batch_size=2,
                              optimizer="adam",
                              opt_kwargs={"learning_rate": 0.01})
    ckpt = tr.train(provider, out, training_iters=25, epochs=2, dropout=1.0,
                    display_step=100, prediction_path=predd)
    assert ckpt.endswith("model.npz")
    # prediction images written for init + each epoch
    import os

    assert sorted(os.listdir(predd)) == ["_init.png", "epoch_0.png", "epoch_1.png"]
    # the task is learnable: error rate clearly below chance after training
    x, y = provider(8)
    pred = unet_generic.pixel_wise_softmax(
        unet_generic.forward(tr.params, jnp.asarray(x))
    )
    y_c = unet_generic.crop_to_shape(y, pred.shape)
    # learned the squares: clearly below the ~7% all-background error
    assert unet_generic.error_rate(np.asarray(pred), y_c) < 3.0

    # restore: params round-trip through the checkpoint
    restored, _, step = checkpoints.restore_checkpoint(out, "model", params)
    assert step == 50
    np.testing.assert_allclose(
        np.asarray(tr.params["head"]["w"]), restored["head"]["w"], rtol=1e-6
    )


def test_dropout_changes_forward_only_with_rng():
    params = unet_generic.init(jax.random.PRNGKey(0), channels_in=1, n_classes=2,
                               layers=2, features_root=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 60, 60, 1))
    fwd = jax.jit(unet_generic.forward, static_argnames=("keep_prob",))
    a = fwd(params, x)
    b = fwd(params, x, keep_prob=0.5, rng=None)  # eval: no-op
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fwd(params, x, keep_prob=0.5, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_momentum_staircase_schedule():
    """Momentum branch: staircase exponential decay with decay step =
    training_iters (reference unet.py:330-343)."""
    tr = unet_generic.Trainer({}, optimizer="momentum",
                              opt_kwargs={"learning_rate": 0.2,
                                          "decay_rate": 0.5, "momentum": 0.2})
    _, sched = tr._make_tx(training_iters=10)
    np.testing.assert_allclose(float(sched(0)), 0.2, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9)), 0.2, rtol=1e-6)  # flat in-epoch
    np.testing.assert_allclose(float(sched(10)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 0.05, rtol=1e-6)
