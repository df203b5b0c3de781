"""Latency-controlled training quality study (ROADMAP #5 follow-on).

Question: round 2 measured a -0.005 STOI cost for serving the
offline-trained flagship through the 288 ms LC streaming path, and a
larger gap at aggressive latencies.  Does TRAINING at the serving
latency (core.lc_bilstm_layer — the train function == the served
function) close it?

Protocol: train two identical flagships on one shared device-cached
corpus upload — one offline (full backward context), one with
lc_chunk/lc_lookahead matching the serving window — then score held-out
streaming STOI at that window for both, plus the offline model's own
offline STOI as the ceiling.

Usage: python scripts/lc_study.py [root_grouped] [test_dir] [chunk] [look] [epochs]
Defaults use the GRID-scale drill corpus subset. Writes lc_study.json.
"""

import glob
import json
import os
import sys

import numpy as np


def _stoi_streaming(config, stats, params, files, n_utts, chunk, look,
                    lc_offline=False):
    """Mean held-out STOI of masked-phase streaming reconstruction (or the
    offline forward when lc_offline=True)."""
    import jax

    from avsi.data import reader as reader_lib
    from avsi.eval import metrics
    from avsi.infer import streaming
    from avsi.models import blstm as blstm_lib

    spec = blstm_lib.parse_model_name(config["model"])
    dm = reader_lib.DataManager(
        num_audio_samples=config["audio_len"],
        audio_feat_size=config["audio_feat_dim"],
        video_feat_size=config["video_feat_dim"],
    )
    stats_j = (np.asarray(stats[0], np.float32), np.asarray(stats[1], np.float32))
    scores = []
    programs = {}
    if lc_offline:
        fwd = jax.jit(
            lambda p, b: blstm_lib.enhanced_sources(
                blstm_lib.forward(p, b, config, stats_j, spec=spec, train=False),
                b, config, stats_j, oracle_phase=False,
            )
        )
    done = 0
    for batch in dm.batches(files, 8):
        if lc_offline:
            dev = {k: v for k, v in batch.items() if k != "sample_paths"}
            wavs = np.asarray(fwd(params, dev))
        n = batch.get("num_real", len(batch["sequence_lengths"]))
        for i in range(n):
            tgt = np.asarray(batch["target_sources"][i], np.float32)
            if lc_offline:
                enh = wavs[i]
            else:
                inp = streaming.StreamingInpainter(
                    config, stats, params, chunk_frames=chunk,
                    lookahead_frames=look, program_cache=programs,
                )
                enh = streaming.stream_utterance(
                    inp, tgt,
                    np.asarray(batch["masks"][i, :, 0], np.float32),
                    np.asarray(batch["video_features"][i], np.float32),
                )
            m = min(len(tgt), len(enh))
            scores.append(metrics.stoi_eval(tgt[:m].astype(float), enh[:m].astype(float)))
            done += 1
            if done >= n_utts:
                return float(np.mean(scores))
    return float(np.mean(scores))


def main(root="/dev/shm/grid_drill/grouped_sub_640_16",
         test_dir="/dev/shm/grid_drill/grouped/test-set",
         chunk=8, look=16, epochs=12, n_utts=48,
         workdir="/dev/shm/lc_study"):
    from avsi import config as config_lib
    from avsi.infer.inpaint import load_model_bundle
    from avsi.train import loop

    os.makedirs(workdir, exist_ok=True)
    common = {
        "model": "av-blstm-ssnn-ctc", "audio_feat_dim": 257,
        "video_feat_dim": 136, "audio_len": 48000, "batch_size": 128,
        "net_dim": [250, 250, 250], "integration_layer": 0,
        "dropout_rate": 0.0, "max_n_epochs": int(epochs),
        "n_earlystop_epochs": int(epochs), "optimizer_type": "adam",
        "starter_learning_rate": 0.001, "lr_decay": 1.0,
        "num_asr_labels": 33, "ctc_loss": 0.001,
        "compute_dtype": "bfloat16", "device_cache_corpus": 1, "tb_media": 0,
        "root_folder": root,
        "audio_feat_mean": "/dev/shm/grid_drill/audio_spec_mean.npy",
        "audio_feat_std": "/dev/shm/grid_drill/audio_spec_std.npy",
    }
    cache = {}
    out = {"study": f"LC-trained vs offline-trained flagship at C={chunk}/L={look}",
           "latency_ms": (chunk + look) * 12, "epochs": int(epochs)}
    bundles = {}
    for name, extra in (
        ("offline", {}),
        ("lc", {"lc_chunk": chunk, "lc_lookahead": look}),
    ):
        exp = os.path.join(workdir, "exp_" + name)
        cfgp = exp + ".config"
        config_lib.save_configfile(dict(common, exp_folder=exp, **extra), cfgp)
        print("=== training", name, flush=True)
        summ = loop.train(cfgp, corpus_cache=cache)
        print(name, "best_val", summ["best_val"], flush=True)
        out[name + "_best_val"] = float(summ["best_val"])
        bundles[name] = load_model_bundle(os.path.join(exp, "netmodel"), norm=True)

    files = sorted(glob.glob(os.path.join(test_dir, "*.tfrecord")))[:8]
    for name in ("offline", "lc"):
        config, stats, _, params = bundles[name]
        out[name + "_stoi_streaming"] = _stoi_streaming(
            config, stats, params, files, n_utts, chunk, look)
        print(name, "streaming STOI", out[name + "_stoi_streaming"], flush=True)
    config, stats, _, params = bundles["offline"]
    out["offline_stoi_offline"] = _stoi_streaming(
        config, stats, params, files, n_utts, chunk, look, lc_offline=True)
    print("offline model, offline path STOI", out["offline_stoi_offline"], flush=True)

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
