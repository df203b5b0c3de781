"""Generic image-segmentation U-Net (reference `unet.py` / `unet_util.py`).

Reference C28 is a vestigial tf_unet-style network (Ronneberger et al.)
that is unreachable from the reference CLI (SURVEY.md §2.1 C28) but part of
its inventory: configurable depth, two 3x3 VALID convs per level with 2x2
max-pool downsampling, transposed-conv upsampling with crop-and-concat
skips, 1x1 head, pixel-wise softmax, cross-entropy loss (unet.py:186-307).
Provided for completeness as plain functional JAX; the production
spectrogram U-Net is avsi/models/unet.py.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def _conv_init(rng, k, cin, cout, stddev=None):
    if stddev is None:
        stddev = math.sqrt(2.0 / (k * k * cin))
    w = stddev * jax.random.truncated_normal(rng, -2.0, 2.0, (k, k, cin, cout))
    return {"w": w.astype(jnp.float32), "b": jnp.full((cout,), 0.1, jnp.float32)}


def init(rng, channels_in: int = 1, n_classes: int = 2, layers: int = 3,
         features_root: int = 16, filter_size: int = 3) -> dict:
    params: dict = {"down": [], "up": []}
    cin = channels_in
    feats = features_root
    for _ in range(layers):
        rng, k1, k2 = jax.random.split(rng, 3)
        params["down"].append(
            {"conv1": _conv_init(k1, filter_size, cin, feats),
             "conv2": _conv_init(k2, filter_size, feats, feats)}
        )
        cin = feats
        feats *= 2
    feats //= 2
    for _ in range(layers - 1):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        params["up"].append(
            {
                "deconv": _conv_init(k1, 2, feats, feats // 2),  # (H, W, In, Out)
                "conv1": _conv_init(k2, filter_size, feats, feats // 2),
                "conv2": _conv_init(k3, filter_size, feats // 2, feats // 2),
            }
        )
        feats //= 2
    rng, kh = jax.random.split(rng)
    params["head"] = _conv_init(kh, 1, feats, n_classes)
    return params


def _conv(p, x, padding="VALID"):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + p["b"]


def _deconv2x(p, x):
    out = jax.lax.conv_transpose(
        x, p["w"], (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + p["b"]


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _crop_and_concat(skip, x):
    """Center-crop skip to x's spatial dims and concat (unet_util.py:108-116)."""
    dh = (skip.shape[1] - x.shape[1]) // 2
    dw = (skip.shape[2] - x.shape[2]) // 2
    cropped = skip[:, dh : dh + x.shape[1], dw : dw + x.shape[2], :]
    return jnp.concatenate([cropped, x], axis=3)


def forward(
    params: dict, x: jax.Array, keep_prob: float = 1.0, rng: jax.Array | None = None
) -> jax.Array:
    """(B, H, W, C) -> logits (B, H', W', n_classes); VALID convs shrink.

    keep_prob < 1 applies dropout after every conv+bias, before the relu —
    the reference's conv2d wraps tf.nn.dropout that way (unet.py:40-44,
    101-103); pass `rng` when training."""

    def drop(h):
        nonlocal rng
        if keep_prob >= 1.0 or rng is None:
            return h
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, keep_prob, h.shape)
        return jnp.where(keep, h / keep_prob, 0.0)

    skips = []
    for i, level in enumerate(params["down"]):
        x = jax.nn.relu(drop(_conv(level["conv1"], x)))
        x = jax.nn.relu(drop(_conv(level["conv2"], x)))
        if i < len(params["down"]) - 1:
            skips.append(x)
            x = _maxpool2(x)
    for level in params["up"]:
        x = jax.nn.relu(_deconv2x(level["deconv"], x))
        x = _crop_and_concat(skips.pop(), x)
        x = jax.nn.relu(drop(_conv(level["conv1"], x)))
        x = jax.nn.relu(drop(_conv(level["conv2"], x)))
    return _conv(params["head"], x, padding="SAME")


def pixel_wise_softmax(logits: jax.Array) -> jax.Array:
    return jax.nn.softmax(logits, axis=-1)


def cross_entropy(labels_onehot: jax.Array, probs: jax.Array) -> jax.Array:
    """unet_util.py:125-126 semantics."""
    return -jnp.mean(labels_onehot * jnp.log(jnp.clip(probs, 1e-10, 1.0)))


def loss(params: dict, x: jax.Array, labels_onehot: jax.Array) -> jax.Array:
    return cross_entropy(labels_onehot, pixel_wise_softmax(forward(params, x)))


# ---------------------------------------------------------------------------
# Trainer — reference unet.py:310-503 (tf_unet-style), rebuilt on optax.
# ---------------------------------------------------------------------------


def crop_to_shape(data, shape):
    """Center-crop (B, H, W, ...) to the target H, W (unet_util.py:62-77)."""
    data = np.asarray(data)
    dh = (data.shape[1] - shape[1]) // 2
    dw = (data.shape[2] - shape[2]) // 2
    return data[:, dh : dh + shape[1], dw : dw + shape[2]]


def error_rate(predictions, labels) -> float:
    """Percent pixel error of dense predictions vs 1-hot labels
    (unet.py:514-522)."""
    predictions = np.asarray(predictions)
    labels = np.asarray(labels)
    hits = np.sum(np.argmax(predictions, 3) == np.argmax(labels, 3))
    return 100.0 - 100.0 * hits / (
        predictions.shape[0] * predictions.shape[1] * predictions.shape[2]
    )


def _to_gray8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float64)
    img -= img.min()
    if img.max() != 0:
        img /= img.max()
    return (img * 255).astype(np.uint8)


def combine_img_prediction(data, gt, pred) -> np.ndarray:
    """Input | ground truth | prediction strips side by side, one image
    (unet_util.py:101-116; grayscale instead of rgb — our PNG writer is
    single-channel)."""
    pred = np.asarray(pred)
    ny = pred.shape[2]
    strips = [
        _to_gray8(crop_to_shape(data, pred.shape)[..., 0].reshape(-1, ny)),
        _to_gray8(crop_to_shape(np.asarray(gt)[..., 1:2], pred.shape)[..., 0].reshape(-1, ny)),
        _to_gray8(pred[..., 1].reshape(-1, ny)),
    ]
    return np.concatenate(strips, axis=1)


class Trainer:
    """Trains a generic U-Net (reference unet.py Trainer, :310-503).

    Same surface: momentum optimizer with staircase exponential decay
    (decay step = training_iters) or constant-lr adam; per-step
    loss/accuracy/error stats; per-epoch verification prediction images
    written to `prediction_path`; checkpoints + TB scalars in
    `output_path`. TPU-native: ONE jitted update step (loss, grads, adam)
    instead of per-fetch sess.runs.
    """

    def __init__(self, params: dict, batch_size: int = 1,
                 verification_batch_size: int = 4, optimizer: str = "momentum",
                 opt_kwargs: dict | None = None):
        self.params = params
        self.batch_size = batch_size
        self.verification_batch_size = verification_batch_size
        self.optimizer = optimizer
        self.opt_kwargs = dict(opt_kwargs or {})

    def _make_tx(self, training_iters: int):
        import optax

        if self.optimizer == "momentum":
            lr = self.opt_kwargs.get("learning_rate", 0.2)
            decay = self.opt_kwargs.get("decay_rate", 0.95)
            momentum = self.opt_kwargs.get("momentum", 0.2)
            sched = optax.exponential_decay(
                lr, transition_steps=training_iters, decay_rate=decay,
                staircase=True,
            )
            return optax.sgd(sched, momentum=momentum), sched
        lr = self.opt_kwargs.get("learning_rate", 0.001)
        return optax.adam(lr), (lambda _: lr)

    def train(self, data_provider, output_path: str, training_iters: int = 10,
              epochs: int = 100, dropout: float = 0.75, display_step: int = 1,
              restore: bool = False, prediction_path: str = "prediction") -> str:
        """data_provider(n) -> (x, y_onehot) numpy batches; returns ckpt path."""
        import optax

        from avsi.train import checkpoints
        from avsi.train.tb import SummaryWriter

        os.makedirs(output_path, exist_ok=True)
        os.makedirs(prediction_path, exist_ok=True)
        if epochs == 0:
            return os.path.join(output_path, "model.npz")
        tx, sched = self._make_tx(training_iters)
        params = self.params
        opt_state = tx.init(params)
        step = 0
        if restore:
            params, restored_opt, step = checkpoints.restore_checkpoint(
                output_path, "model", params, opt_template=opt_state
            )
            if restored_opt is not None:
                opt_state = restored_opt
        keep_prob = float(dropout)

        @jax.jit
        def update(params, opt_state, x, y, rng):
            def loss_fn(p):
                logits = forward(p, x, keep_prob=keep_prob, rng=rng)
                probs = pixel_wise_softmax(logits)
                return cross_entropy(y, probs), probs

            (l, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            acc = jnp.mean(
                (jnp.argmax(probs, 3) == jnp.argmax(y, 3)).astype(jnp.float32)
            )
            return optax.apply_updates(params, updates), opt_state, l, acc

        predict = jax.jit(lambda p, x: pixel_wise_softmax(forward(p, x)))

        @jax.jit
        def batch_stats(params, x, y):
            # minibatch stats with dropout OFF, like the reference's
            # output_minibatch_stats sess.run with keep_prob=1 (unet.py:485)
            probs = pixel_wise_softmax(forward(params, x))
            acc = jnp.mean(
                (jnp.argmax(probs, 3) == jnp.argmax(y, 3)).astype(jnp.float32)
            )
            return cross_entropy(y, probs), acc

        def store_prediction(params, x, y, name):
            pred = np.asarray(predict(params, jnp.asarray(x)))
            y_c = crop_to_shape(y, pred.shape)
            l = float(cross_entropy(jnp.asarray(y_c), jnp.asarray(pred)))
            print(
                f"Verification error= {error_rate(pred, y_c):.1f}%, loss= {l:.4f}",
                flush=True,
            )
            img = combine_img_prediction(x, y, pred)
            from avsi.train.tb import _png_grayscale

            with open(os.path.join(prediction_path, f"{name}.png"), "wb") as f:
                f.write(_png_grayscale(img))
            return pred.shape

        rng = jax.random.PRNGKey(self.opt_kwargs.get("seed", 0))
        test_x, test_y = data_provider(self.verification_batch_size)
        pred_shape = store_prediction(params, test_x, test_y, "_init")
        tb = SummaryWriter(output_path)
        save_path = os.path.join(output_path, "model.npz")
        for epoch in range(epochs):
            # loss accumulates ON device; the host fetches once per epoch
            # (+ dropout-free stats at display steps) — per-step float()
            # fetches would serialize training on slow links (CLAUDE.md)
            total_loss = jnp.float32(0.0)
            for _ in range(training_iters):
                batch_x, batch_y = data_provider(self.batch_size)
                batch_y = crop_to_shape(batch_y, pred_shape)
                rng, sub = jax.random.split(rng)
                bx, by = jnp.asarray(batch_x), jnp.asarray(batch_y)
                params, opt_state, l, _ = update(params, opt_state, bx, by, sub)
                if step % display_step == 0:
                    sl, sacc = batch_stats(params, bx, by)
                    sl, sacc = float(sl), float(sacc)
                    tb.scalar("loss", sl, step)
                    tb.scalar("accuracy", sacc, step)
                    tb.scalar("learning_rate", float(sched(step)), step)
                    print(
                        f"Iter {step}, Minibatch Loss= {sl:.4f}, "
                        f"Training Accuracy= {sacc:.4f}",
                        flush=True,
                    )
                total_loss = total_loss + l
                step += 1
            total_loss = float(total_loss)
            lr_now = float(sched(step))
            print(
                f"Epoch {epoch}, Average loss: {total_loss / training_iters:.4f}, "
                f"learning rate: {lr_now:.4f}",
                flush=True,
            )
            store_prediction(params, test_x, test_y, f"epoch_{epoch}")
            checkpoints.save_checkpoint(
                output_path, "model", jax.device_get(params),
                opt_state=jax.device_get(opt_state), step=step,
            )
        tb.close()
        self.params = params
        return save_path
