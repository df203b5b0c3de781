"""Batch inpainting inference: restore `sinet`, enhance, write wavs.

Reference: `/root/reference/av_speech_inpainting/inference.py:20-170`.
Differences by design: the model forward, magnitude denormalization,
phase handling and (optionally) the Griffin-Lim hole-phase reconstruction
all run inside ONE jitted function on device — the reference instead did a
serial per-utterance host loop through the C lws library (SURVEY.md §3.2).
Output layout is identical: `<audio_dir>/<sample>/enhanced/<prefix>.wav`,
int16, trimmed to seq_len * 192 samples.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

from avsi import config as config_lib
from avsi.data import reader as reader_lib, stats as stats_lib
from avsi.data.tfrecord import list_tfrecord_files
from avsi.infer import common
from avsi.models import registry
from avsi.ops import postfilter as postfilter_ops
from avsi.parallel import mesh as mesh_lib
from avsi.train import checkpoints
from avsi.utils import wav as wavio



def load_model_bundle(model_path: str, norm: bool = True, is_asr: bool = False,
                      lstm_impl: str = "auto", sharded: bool = False,
                      mesh=None):
    """Load (config, stats, model, params) from a self-contained ckpt dir.

    `lstm_impl` selects the BLSTM recurrence for this forward-only bundle:
    "auto" (default) resolves to the fused Pallas kernel on a TPU backend
    — including data-sharded paths when the `mesh` is supplied (the kernel
    partitions via shard_map over the mesh's `data` axis) — and the
    lax.scan everywhere else (ops/pallas_lstm.py, measured +24% end-to-end
    on the flagship in bf16); "scan"/"pallas" force it.  (Training
    resolves its own `lstm_impl` in train/loop.py — the kernel is
    differentiable via a custom VJP.)"""
    from avsi.ops import pallas_lstm
    from avsi.utils import cache as _cache

    _cache.enable()  # inference scripts re-jit identical programs across runs
    config = config_lib.check_trainconfiguration(
        config_lib.load_configfile(os.path.join(model_path, "config.txt"))
    )
    config["lstm_impl"] = pallas_lstm.resolve_impl(
        lstm_impl, sharded=sharded, mesh=mesh
    )
    if config["lstm_impl"] == "pallas" and mesh is not None:
        # runtime-only key (never serialized: bundles copy config.txt)
        config["lstm_mesh"] = mesh
    if norm:
        stats = stats_lib.load_stats(
            os.path.join(model_path, "audio_features_mean.npy"),
            os.path.join(model_path, "audio_features_std.npy"),
            # inpainting stats must match the model's bins (pre-slicing
            # bundles may carry 129-bin stats for feat_dim=128 unet runs);
            # ASR stats are 80-bin log-mel, never sliced
            feat_dim=None if is_asr else int(config["audio_feat_dim"]),
        )
    else:
        dim = 80 if is_asr else config["audio_feat_dim"]
        stats = (np.zeros(dim, np.float32), np.ones(dim, np.float32))
    model = (
        registry.get_asr_model(config["model"])
        if is_asr
        else registry.get_model(config["model"])
    )
    template = model.init(jax.random.PRNGKey(0), config)
    name = "asrnet" if is_asr else "sinet"
    params, _, _ = checkpoints.restore_checkpoint(model_path, name, template)
    return config, stats, model, params


def make_infer_step(model, config, stats, oracle_phase: bool, phase_recon: str, gl_iters: int,
                    gl_opts: dict | None = None, passthrough: bool = False,
                    gap_atten: dict | None = None):
    stats_j = (jnp.asarray(stats[0]), jnp.asarray(stats[1]))

    def step(params, batch):
        batch = mesh_lib.expand_batch(batch, int(config["audio_feat_dim"]))
        out = model.forward(params, batch, config, stats_j, train=False)
        loss_ps, hole_ps = common.per_sample_losses(out, batch)
        if gap_atten:
            out = postfilter_ops.apply_gap_attenuation(
                out, batch, stats_j, **gap_atten
            )
        wav = common.reconstruct_waveform(
            model, out, batch, config, stats_j, oracle_phase, phase_recon, gl_iters,
            gl_opts,
        )
        if passthrough:
            wav = common.apply_passthrough(model, wav, batch)
        # int16 on device: the files are int16 anyway and this halves the
        # device->host transfer of the dominant output
        wav_i16 = jnp.clip(wav, -32768, 32767).astype(jnp.int16)
        return wav_i16, loss_ps, hole_ps

    return step


def infer(
    model_path: str,
    data_path_test: str,
    audio_path: str,
    out_file_prefix: str,
    norm: bool = True,
    oracle_phase: bool = False,
    batch_size: int = 1,
    phase_recon: str = "gl",
    gl_iters: int = 50,
    gl_opts: dict | None = None,
    data_shards: int = 0,
    passthrough: bool = False,
    gap_atten: dict | None = None,
    lstm_impl: str = "auto",
) -> dict:
    """data_shards > 1 shards each inference batch over a `data` device
    mesh (params replicated, batch partitioned — utterances are
    independent, so GSPMD inserts zero collectives), the batch-inference
    twin of `avsi serve --data_shards` / the training mesh.  Sharded ==
    single-device output is asserted in tests/test_parallel.py."""
    batch_size = batch_size or 1
    mesh = shard = None
    if data_shards and int(data_shards) > 1:
        if batch_size % int(data_shards):
            raise ValueError(
                f"batch_size {batch_size} not divisible by data_shards {data_shards}"
            )
        mesh = mesh_lib.get_mesh(int(data_shards))
        shard = mesh_lib.batch_sharding(mesh)
    config, stats, model, params = load_model_bundle(
        model_path, norm, lstm_impl=lstm_impl,
        sharded=mesh is not None, mesh=mesh,
    )
    if mesh is not None:
        params = mesh_lib.replicate(params, mesh)
    dm = reader_lib.DataManager(
        num_audio_samples=config["audio_len"],
        audio_feat_size=config["audio_feat_dim"],
        video_feat_size=config["video_feat_dim"],
        with_embedding=model.needs_embeddings,
    )
    files = list_tfrecord_files(data_path_test)
    if not files:
        raise ValueError(f"no tfrecords under {data_path_test}")

    step = jax.jit(make_infer_step(model, config, stats, oracle_phase, phase_recon, gl_iters,
                                   gl_opts, passthrough, gap_atten))

    def write_one(args):
        path, data = args
        os.makedirs(os.path.dirname(path), exist_ok=True)
        wavio.write_wav_int16(path, data)

    total = 0
    losses, holes = [], []
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=8) as pool:
        futures = []

        hop = model.frame_step

        def drain(pending):
            """Fetch a completed step's results and queue the file writes."""
            nonlocal total
            batch, wav_d, loss_d, hole_d = pending
            wav = np.asarray(wav_d)  # forces completion
            n_real = batch.get("num_real", len(batch["sequence_lengths"]))
            # per-sample losses: padded duplicates excluded from the means
            losses.extend(np.asarray(loss_d)[:n_real].tolist())
            holes.extend(np.asarray(hole_d)[:n_real].tolist())
            for i in range(n_real):
                path = os.path.join(
                    audio_path, batch["sample_paths"][i], "enhanced",
                    out_file_prefix + ".wav",
                )
                seq_len = int(batch["sequence_lengths"][i])
                futures.append(
                    pool.submit(write_one, (path, wav[i][: seq_len * hop]))
                )
            total += n_real

        # keep one batch in flight: batch k+1's upload+compute overlaps
        # batch k's result download (jax dispatch is asynchronous)
        pending = None
        for batch in dm.prefetch_batches(files, batch_size, pad_final=True):
            cb = mesh_lib.compact_batch(batch)
            if shard is not None:
                cb = {k: jax.device_put(v, shard) for k, v in cb.items()}
            results = step(params, cb)
            if pending is not None:
                drain(pending)
            pending = (batch, *results)
        if pending is not None:
            drain(pending)
        for f in futures:
            f.result()
    dt = time.time() - t0
    print(
        f"Wrote {total} enhanced wavs in {dt:.2f}s ({total / dt:.1f} utt/s). "
        f"Loss: {np.mean(losses):.5f}  Loss hole: {np.mean(holes):.5f}"
    )
    return {
        "num_samples": total,
        "loss": float(np.mean(losses)),
        "loss_hole": float(np.mean(holes)),
        "utt_per_sec": total / dt,
    }
