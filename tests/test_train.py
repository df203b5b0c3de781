"""End-to-end training tests on the synthetic fixture.

Covers the reference test strategy the rebuild adds (SURVEY.md §4): a tiny
GRID-like corpus is generated, tfrecords built, and a model overfit for a
couple of epochs — exercising L1->L6 of the stack (config, DSP, data,
model, trainer, checkpointing).
"""

import os

import numpy as np
import pytest

import jax

from avsi import config as config_lib
from avsi.data import fixture, reader, stats as stats_lib
from avsi.data.tfrecord import list_tfrecord_files
from avsi.train import checkpoints, loop


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("fix"))
    # small utterances (600 ms -> 50 frames) keep CPU CI fast
    paths = fixture.make_fixture(
        dest, n_speakers=1, n_samples=6, audio_len_ms=600, gap_ms=150.0, gap_std_ms=20.0
    )
    # feature stats from the training split
    stats_prefix = os.path.join(dest, "spec_norm")
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", stats_prefix, feat_type="spec",
        window_size=24, step_size=12, n_fft=512,
    )
    paths["mean"] = stats_prefix + "_mean.npy"
    paths["std"] = stats_prefix + "_std.npy"
    return paths


def _write_config(tmp_path, corpus, model="a-blstm", **kw):
    cfg = {
        "model": model,
        "audio_feat_dim": 257,
        "video_feat_dim": 136,
        "audio_len": 9600,  # 600 ms
        "batch_size": 2,
        "net_dim": [16, 16],
        "integration_layer": 0,
        "dropout_rate": 0.0,
        "max_n_epochs": 2,
        "n_earlystop_epochs": 5,
        "num_asr_labels": 33,
        "ctc_loss": 0.001,
        "optimizer_type": "adam",
        "starter_learning_rate": 0.003,
        "lr_decay": 1.0,
        "l2": 0.0,
        "root_folder": corpus["tfrecords"],
        "exp_folder": str(tmp_path / "exp"),
        "audio_feat_mean": corpus["mean"],
        "audio_feat_std": corpus["std"],
    }
    cfg.update(kw)
    path = str(tmp_path / "train.config")
    config_lib.save_configfile(cfg, path)
    return path


def test_reader_batches(corpus):
    dm = reader.DataManager(num_audio_samples=9600)
    files = list_tfrecord_files(os.path.join(corpus["tfrecords"], "training-set"))
    assert len(files) == 6
    batches = list(dm.batches(files, batch_size=4, pad_final=True))
    assert len(batches) == 2
    b = batches[0]
    assert b["target_sources"].shape == (4, 9600)
    assert b["masks"].shape == (4, 50, 257)
    assert b["video_features"].shape == (4, 50, 136)
    assert batches[1]["num_real"] == 2
    # prefetch path yields identical content when unshuffled
    pf = list(dm.prefetch_batches(files, batch_size=4, pad_final=True))
    np.testing.assert_array_equal(pf[0]["masks"], batches[0]["masks"])


def test_train_a_blstm_overfits(corpus, tmp_path):
    cfg_path = _write_config(tmp_path, corpus, model="a-blstm", max_n_epochs=4)
    summary = loop.train(cfg_path)
    assert np.isfinite(summary["best_val"])
    ckpt_dir = str(tmp_path / "exp" / "netmodel")
    assert os.path.isfile(os.path.join(ckpt_dir, "sinet.npz"))
    assert os.path.isfile(os.path.join(ckpt_dir, "config.txt"))
    assert os.path.isfile(os.path.join(ckpt_dir, "audio_features_mean.npy"))
    log = open(str(tmp_path / "exp" / "training_log.txt")).read()
    assert "epoch 0" in log and "val_loss" in log
    # loss must decrease over epochs (overfit trend on 6 samples)
    import re

    losses = [float(m) for m in re.findall(r"train_loss=([0-9.]+)", log)]
    assert losses[-1] < losses[0]


def test_train_mtl_ctc(corpus, tmp_path):
    cfg_path = _write_config(
        tmp_path, corpus, model="a-blstm-ssnn-ctc", max_n_epochs=1
    )
    summary = loop.train(cfg_path)
    assert np.isfinite(summary["best_val"])
    log = open(str(tmp_path / "exp" / "training_log.txt")).read()
    assert "val_ctc" in log and "val_per" in log


def test_train_asr(corpus, tmp_path):
    # ASR uses fbanks stats (80 bins)
    stats_prefix = os.path.join(os.path.dirname(corpus["mean"]), "fbanks_norm")
    stats_lib.compute_mean_std_features(
        corpus["training-set"], "target", stats_prefix, feat_type="fbanks",
        window_size=24, step_size=12, n_fft=512,
    )
    cfg_path = _write_config(
        tmp_path, corpus, model="a-blstm", max_n_epochs=1,
        audio_feat_mean=stats_prefix + "_mean.npy",
        audio_feat_std=stats_prefix + "_std.npy",
    )
    summary = loop.train(cfg_path, is_asr=True)
    assert np.isfinite(summary["best_val"])  # val PER
    assert os.path.isfile(str(tmp_path / "exp" / "netmodel" / "asrnet.npz"))


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": [np.ones(4), np.zeros(2)]}
    checkpoints.save_checkpoint(str(tmp_path), "sinet", tree, step=42)
    template = jax.tree_util.tree_map(np.zeros_like, tree)
    restored, _, step = checkpoints.restore_checkpoint(str(tmp_path), "sinet", template)
    assert step == 42
    np.testing.assert_array_equal(restored["a"], tree["a"])
    np.testing.assert_array_equal(restored["b"][0], tree["b"][0])


def test_device_cache_corpus(corpus, tmp_path):
    """device_cache_corpus=1: epoch 0 streams + caches batches on device;
    later epochs reuse them (no host streaming) with identical epoch-0
    behavior and a deterministic, finite run."""
    cfg = _write_config(
        tmp_path, corpus, model="a-blstm", max_n_epochs=3,
        device_cache_corpus=1, exp_folder=str(tmp_path / "exp_cache"),
    )
    summary = loop.train(cfg)
    assert np.isfinite(summary["best_val"])
    log = open(str(tmp_path / "exp_cache" / "training_log.txt")).read()
    assert "epoch 2" in log  # all epochs ran off the cache

    # epoch-0 training losses match the streaming run exactly (same dm
    # seed -> same first-epoch batch sequence; cache only changes later
    # epochs' shuffle granularity)
    cfg_s = _write_config(
        tmp_path, corpus, model="a-blstm", max_n_epochs=1,
        exp_folder=str(tmp_path / "exp_stream"),
    )
    loop.train(cfg_s)
    import re

    first = lambda p: float(
        re.findall(r"train_loss=([0-9.]+)", open(p).read())[0]
    )
    assert first(str(tmp_path / "exp_cache" / "training_log.txt")) == first(
        str(tmp_path / "exp_stream" / "training_log.txt")
    )


def test_shared_corpus_cache_across_models(corpus, tmp_path):
    """Two train() calls share one device-resident corpus upload: the SI
    model populates the cache, the ASR judge trains from it without
    touching the reader (the slow-link capstone path)."""
    cache = {}
    cfg_si = _write_config(
        tmp_path, corpus, model="a-blstm-ssnn-ctc", max_n_epochs=2,
        exp_folder=str(tmp_path / "exp_si"),
    )
    s1 = loop.train(cfg_si, corpus_cache=cache)
    assert np.isfinite(s1["best_val"])
    assert len(cache["train"]) > 0 and len(cache["val"]) > 0
    n_batches = len(cache["train"])

    stats_prefix = os.path.join(os.path.dirname(corpus["mean"]), "fbanks_cache")
    stats_lib.compute_mean_std_features(
        corpus["training-set"], "target", stats_prefix, feat_type="fbanks",
        window_size=24, step_size=12, n_fft=512,
    )
    cfg_asr = _write_config(
        tmp_path, corpus, model="a-blstm", max_n_epochs=2,
        exp_folder=str(tmp_path / "exp_asr"),
        audio_feat_mean=stats_prefix + "_mean.npy",
        audio_feat_std=stats_prefix + "_std.npy",
    )
    s2 = loop.train(cfg_asr, is_asr=True, corpus_cache=cache)
    assert np.isfinite(s2["best_val"])
    assert len(cache["train"]) == n_batches  # reused, not re-uploaded
    assert os.path.isfile(str(tmp_path / "exp_asr" / "netmodel" / "asrnet.npz"))

    # a fill interrupted mid-epoch-0 (NaN abort / preemption) leaves a
    # PARTIAL train cache and possibly no val cache; the next call must
    # discard and refill instead of silently training on part of the corpus
    assert cache.get("complete") is True
    cache.pop("complete")
    del cache["train"][1:]
    cache["val"].clear()
    cfg_si2 = _write_config(
        tmp_path, corpus, model="a-blstm-ssnn-ctc", max_n_epochs=2,
        exp_folder=str(tmp_path / "exp_si2"),
    )
    s3 = loop.train(cfg_si2, corpus_cache=cache)
    assert np.isfinite(s3["best_val"])
    assert len(cache["train"]) == n_batches  # refilled to the full corpus
    assert len(cache["val"]) > 0  # validation batches restored
    assert cache.get("complete") is True
    assert os.path.isfile(str(tmp_path / "exp_si2" / "netmodel" / "sinet.npz"))


def test_nan_check_disabled(corpus, tmp_path):
    """nan_check_every = 0 disables the per-step NaN fetch (slow-link knob)
    without crashing on the modulo, and training still completes."""
    cfg = _write_config(
        tmp_path, corpus, model="a-blstm", max_n_epochs=1, nan_check_every=0
    )
    s = loop.train(cfg)
    assert s["steps"] > 0
    assert np.isfinite(s["best_val"])


def test_write_bundle_self_copy(tmp_path):
    """Resuming from a bundle's own config.txt must not SameFileError
    (reference guard training.py:122-124)."""
    mean = tmp_path / "m.npy"
    std = tmp_path / "s.npy"
    np.save(mean, np.zeros(257, np.float32))
    np.save(std, np.ones(257, np.float32))
    cfg = {"audio_feat_mean": str(mean), "audio_feat_std": str(std)}
    ckpt_dir = tmp_path / "netmodel"
    ckpt_dir.mkdir()
    config_file = ckpt_dir / "config.txt"
    config_file.write_text("model av-blstm\n")
    checkpoints.write_bundle(str(ckpt_dir), str(config_file), cfg)
    assert config_file.read_text() == "model av-blstm\n"
    assert os.path.isfile(ckpt_dir / "audio_features_mean.npy")


def test_preemption_checkpoint_and_resume(corpus, tmp_path):
    """SIGTERM mid-training (what a preempted TPU VM / scheduler sends)
    must finish the in-flight step, write a full resume checkpoint
    (params + optimizer + step) and return cleanly; a second train() from
    that checkpoint must pick up at the saved step."""
    import signal
    import threading
    import time

    cfg_path = _write_config(tmp_path, corpus, model="a-blstm", max_n_epochs=200)
    log = str(tmp_path / "exp" / "training_log.txt")

    def _kill_after_epoch0():
        # wait until epoch 0 has completed — train() is inside the epoch
        # loop, so its SIGTERM handler is definitely installed
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.isfile(log) and "epoch 0\t" in open(log).read():
                os.kill(os.getpid(), signal.SIGTERM)
                return
            time.sleep(0.05)

    t = threading.Thread(target=_kill_after_epoch0, daemon=True)
    t.start()
    summary = loop.train(cfg_path)
    t.join()
    assert summary["preempted"] is True
    assert summary["steps"] > 0
    text = open(log).read()
    assert "SIGTERM: preemption checkpoint" in text
    ckpt = str(tmp_path / "exp" / "netmodel" / "ckpt")
    assert os.path.isfile(ckpt + ".npz")
    assert os.path.isfile(ckpt + ".opt.npz")
    # the default handler is restored after train() returns
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    cfg_path2 = _write_config(
        tmp_path, corpus, model="a-blstm", max_n_epochs=1, model_ckp=ckpt,
        exp_folder=str(tmp_path / "exp_resume"),
    )
    s2 = loop.train(cfg_path2)
    assert s2["preempted"] is False
    assert s2["steps"] > summary["steps"]  # resumed from the saved step
    assert np.isfinite(s2["best_val"])


def test_profile_trace_closed_on_short_run(corpus, tmp_path):
    """profile_steps beyond the run length: the trace must still be closed
    and a partial-trace warning logged (not a dangling start_trace)."""
    cfg_path = _write_config(
        tmp_path, corpus, model="a-blstm", max_n_epochs=2, profile_steps=999
    )
    summary = loop.train(cfg_path)
    assert np.isfinite(summary["best_val"])
    log = open(str(tmp_path / "exp" / "training_log.txt")).read()
    assert "partial trace" in log
    assert os.path.isdir(str(tmp_path / "exp" / "profile"))


def test_exit_if_preempted():
    loop.exit_if_preempted({"preempted": False})  # no-op
    with pytest.raises(SystemExit) as ei:
        loop.exit_if_preempted({"preempted": True})
    assert ei.value.code == 143


def test_checkpoint_load_casts_to_template_dtype(tmp_path):
    """A float64 archive (external tooling) must load at the template's
    float32, not silently widen the model."""
    tree = {"w": np.ones((3, 2), np.float64), "b": np.zeros(2, np.float64)}
    checkpoints.save_tree(str(tmp_path / "ck"), tree, extra={"step": 7})
    template = {"w": np.zeros((3, 2), np.float32), "b": np.zeros(2, np.float32)}
    got, _, step = checkpoints.restore_checkpoint(str(tmp_path), "ck", template)
    assert step == 7
    assert got["w"].dtype == np.float32
    assert got["b"].dtype == np.float32
