"""Latency-controlled training quality study + streaming PER rows
(round-2 verdict item #6 / ROADMAP #5 follow-on).

Two questions, one shared corpus upload:

1. Round 2 measured a -0.005 STOI cost for serving the offline-trained
   flagship through the 288 ms LC streaming path — and the gap grows at
   aggressive latencies.  Does TRAINING at the serving latency
   (core.lc_bilstm_layer: the train function == the served function)
   close it?  Protocol: two identical flagships on one device-cached
   upload — offline vs lc_chunk/lc_lookahead — scored on held-out
   streaming STOI at the training window, plus the offline model's
   offline STOI as the ceiling.

2. What PER does live streaming transcription pay vs offline decode?
   The reference's 0.001 CTC weight yields a head that never beats the
   blank prior on 12-epoch runs, so this study raises the MTL weight
   (ctc_loss=0.05 — documented deviation, the head must function to be
   measured); streaming transcripts ride the lockstep fleet
   (stream_utterances_lockstep(transcript=True)).

Usage: python scripts/lc_study.py [root_grouped] [test_dir] [chunk] [look] [epochs]
Writes <workdir>/lc_study.json.
"""

import glob
import json
import os
import sys

import numpy as np


def _collect(files, config, n_utts):
    from avsi.data import reader as reader_lib

    dm = reader_lib.DataManager(
        num_audio_samples=config["audio_len"],
        audio_feat_size=config["audio_feat_dim"],
        video_feat_size=config["video_feat_dim"],
    )
    waves, fmasks, vids, labels = [], [], [], []
    batches = []
    for batch in dm.batches(files, 8):
        batches.append(batch)
        n = batch.get("num_real", len(batch["sequence_lengths"]))
        for i in range(n):
            waves.append(np.asarray(batch["target_sources"][i], np.float32))
            fmasks.append(np.asarray(batch["masks"][i, :, 0], np.float32))
            vids.append(np.asarray(batch["video_features"][i], np.float32))
            ll = int(batch["labels_lengths"][i])
            labels.append([int(x) for x in batch["labels"][i][:ll]])
            if len(waves) >= n_utts:
                break
        if len(waves) >= n_utts:
            break
    return np.stack(waves), np.stack(fmasks), np.stack(vids), labels, batches


def _offline_decode(config, stats, params, batches, n_utts):
    import jax

    from avsi.models import blstm as blstm_lib
    from avsi.ops import ctc as ctc_ops

    spec = blstm_lib.parse_model_name(config["model"])
    stats_j = (np.asarray(stats[0], np.float32), np.asarray(stats[1], np.float32))
    fwd = jax.jit(
        lambda p, b: blstm_lib.forward(p, b, config, stats_j, spec=spec, train=False)[
            "asr_logits"
        ]
    )
    out = []
    for batch in batches:
        dev = {k: v for k, v in batch.items() if k != "sample_paths"}
        dec = np.asarray(
            ctc_ops.greedy_decode(fwd(params, dev), batch["sequence_lengths"])
        )
        n = batch.get("num_real", len(batch["sequence_lengths"]))
        for i in range(n):
            out.append([int(x) for x in dec[i] if x >= 0])
            if len(out) >= n_utts:
                return out
    return out


def _offline_wavs(config, stats, params, batches, n_utts):
    import jax

    from avsi.models import blstm as blstm_lib

    spec = blstm_lib.parse_model_name(config["model"])
    stats_j = (np.asarray(stats[0], np.float32), np.asarray(stats[1], np.float32))
    fwd = jax.jit(
        lambda p, b: blstm_lib.enhanced_sources(
            blstm_lib.forward(p, b, config, stats_j, spec=spec, train=False),
            b, config, stats_j, oracle_phase=False,
        )
    )
    out = []
    for batch in batches:
        dev = {k: v for k, v in batch.items() if k != "sample_paths"}
        wavs = np.asarray(fwd(params, dev))
        n = batch.get("num_real", len(batch["sequence_lengths"]))
        for i in range(n):
            out.append(wavs[i])
            if len(out) >= n_utts:
                return out
    return out


def _mean_stoi(targets, enhanced):
    from avsi.eval import metrics

    scores = []
    for tgt, enh in zip(targets, enhanced):
        m = min(len(tgt), len(enh))
        scores.append(metrics.stoi_eval(tgt[:m].astype(float), enh[:m].astype(float)))
    return float(np.mean(scores))


def main(root="/dev/shm/lc_sub_80",
         test_dir="/dev/shm/grid_drill/grouped/test-set",
         chunk=4, look=4, epochs=12, n_utts=64,
         workdir="/dev/shm/lc_study"):
    from avsi import config as config_lib
    from avsi.infer import streaming
    from avsi.infer.inpaint import load_model_bundle
    from avsi.ops import ctc as ctc_ops
    from avsi.train import loop

    os.makedirs(workdir, exist_ok=True)
    common = {
        "model": "av-blstm-ssnn-ctc", "audio_feat_dim": 257,
        "video_feat_dim": 136, "audio_len": 48000, "batch_size": 128,
        "net_dim": [250, 250, 250], "integration_layer": 0,
        "dropout_rate": 0.0, "max_n_epochs": int(epochs),
        "n_earlystop_epochs": int(epochs), "optimizer_type": "adam",
        "starter_learning_rate": 0.001, "lr_decay": 1.0,
        "num_asr_labels": 33, "ctc_loss": 0.05,
        "compute_dtype": "bfloat16", "device_cache_corpus": 1, "tb_media": 0,
        "root_folder": root,
        "audio_feat_mean": "/dev/shm/grid_drill/audio_spec_mean.npy",
        "audio_feat_std": "/dev/shm/grid_drill/audio_spec_std.npy",
    }
    cache = {}
    out = {"study": f"LC-trained vs offline-trained flagship at C={chunk}/L={look}",
           "train_latency_ms": (chunk + look) * 12, "epochs": int(epochs),
           "ctc_weight": 0.05, "n_utts": int(n_utts)}
    bundles = {}
    for name, extra in (
        ("offline", {}),
        ("lc", {"lc_chunk": chunk, "lc_lookahead": look}),
    ):
        exp = os.path.join(workdir, "exp_" + name)
        cfgp = exp + ".config"
        config_lib.save_configfile(dict(common, exp_folder=exp, **extra), cfgp)
        print("=== training", name, flush=True)
        summ = loop.train_or_exit(cfgp, corpus_cache=cache)
        print(name, "best_val", summ["best_val"], flush=True)
        out[name + "_best_val"] = float(summ["best_val"])
        bundles[name] = load_model_bundle(os.path.join(exp, "netmodel"), norm=True)

    files = sorted(glob.glob(os.path.join(test_dir, "*.tfrecord")))[:12]
    config, stats, _, params = bundles["offline"]
    waves, fmasks, vids, labels, batches = _collect(files, config, n_utts)
    configs = {}
    for name in ("offline", "lc"):
        cfg_m = dict(bundles[name][0])
        cfg_m.pop("lc_chunk", None)  # serve both through the same LC window
        cfg_m.pop("lc_lookahead", None)
        configs[name] = cfg_m

    # --- STOI: streaming at the training window, for both models
    for name in ("offline", "lc"):
        _, stats_m, _, params_m = bundles[name]
        wav, dec = streaming.stream_utterances_lockstep(
            configs[name], stats_m, params_m, waves, fmasks, vids,
            chunk_frames=chunk, lookahead_frames=look, transcript=True,
        )
        out[name + "_stoi_streaming"] = _mean_stoi(waves, wav)
        out[name + "_per_streaming"] = ctc_ops.per_metric(dec, labels)
        print(name, "streaming STOI", out[name + "_stoi_streaming"],
              "PER", out[name + "_per_streaming"], flush=True)

    # --- ceilings: offline model through the offline path
    config, stats, _, params = bundles["offline"]
    out["offline_stoi_offline"] = _mean_stoi(
        waves, _offline_wavs(config, stats, params, batches, n_utts))
    out["offline_per_offline"] = ctc_ops.per_metric(
        _offline_decode(config, stats, params, batches, n_utts), labels)
    print("offline path: STOI", out["offline_stoi_offline"],
          "PER", out["offline_per_offline"], flush=True)

    # --- the 288 ms default-serving row (verdict item #6) on the offline model
    wav288, dec288 = streaming.stream_utterances_lockstep(
        configs["offline"], stats, params, waves, fmasks, vids,
        chunk_frames=8, lookahead_frames=16, transcript=True,
    )
    out["offline_stoi_streaming_288ms"] = _mean_stoi(waves, wav288)
    out["offline_per_streaming_288ms"] = ctc_ops.per_metric(dec288, labels)
    print("288ms: STOI", out["offline_stoi_streaming_288ms"],
          "PER", out["offline_per_streaming_288ms"], flush=True)

    with open(os.path.join(workdir, "lc_study.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    kw = {}
    if len(a) > 2:
        kw["chunk"] = int(a[2])
    if len(a) > 3:
        kw["look"] = int(a[3])
    if len(a) > 4:
        kw["epochs"] = int(a[4])
    main(*a[:2], **kw)
