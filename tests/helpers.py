"""Shared test utilities: tiny configs and synthetic batches."""

import numpy as np

import jax.numpy as jnp


def tiny_config(model="a-blstm", audio_len=4800, net_dim=(32, 32), **kw):
    cfg = {
        "model": model,
        "audio_feat_dim": 257,
        "video_feat_dim": 136,
        "audio_len": audio_len,
        "batch_size": 2,
        "net_dim": list(net_dim),
        "integration_layer": 0,
        "dropout_rate": 0.0,
        "num_asr_labels": 34,
        "ctc_loss": 0.001,
        "embedding_dim": 512,
        "optimizer_type": "adam",
        "starter_learning_rate": 0.001,
        "learning_rate": 0.001,
        "lr_updating_steps": 10000,
        "lr_decay": 1.0,
        "l2": 0.0,
        "compute_dtype": "float32",
        "max_n_epochs": 2,
        "n_earlystop_epochs": 2,
        "seed": 0,
    }
    cfg.update(kw)
    return cfg


def synth_batch(config, batch_size=2, seed=0, gap=(5, 12)):
    """A GRID-shaped synthetic batch matching the TFRecord schema."""
    rng = np.random.RandomState(seed)
    # both unet twins live on the 16 ms / 8 ms (hop 128) grid
    is_unet = str(config["model"]).startswith("unet")
    t = config["audio_len"] // 128 if is_unet else -(-config["audio_len"] // 192)
    af = config["audio_feat_dim"]
    wave = 0.1 * np.sin(
        2 * np.pi * np.cumsum(rng.rand(batch_size, config["audio_len"]) * 0.05, axis=1)
    ) + 0.01 * rng.randn(batch_size, config["audio_len"])
    masks = np.ones((batch_size, t, af), np.float32)
    masks[:, gap[0] : gap[1]] = 0.0
    labels = np.zeros((batch_size, 50), np.float32)
    lab_len = np.full((batch_size,), 5, np.int32)
    for b in range(batch_size):
        labels[b, :5] = rng.randint(0, 33, size=5)
    return {
        "sequence_lengths": jnp.full((batch_size,), t, jnp.int32),
        "labels_lengths": jnp.asarray(lab_len),
        "target_sources": jnp.asarray(wave, jnp.float32),
        "video_features": jnp.asarray(rng.randn(batch_size, t, 136), jnp.float32),
        "masks": jnp.asarray(masks),
        "labels": jnp.asarray(labels),
        "embeddings": jnp.asarray(rng.randn(batch_size, 512), jnp.float32),
    }


def identity_stats(dim=257):
    return (jnp.zeros((dim,)), jnp.ones((dim,)))
