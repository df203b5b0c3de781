"""GRID-scale readiness drill (BASELINE.md "readiness drill" section).

Rehearses the reference's full offline + training chain at real-GRID scale
(33 speakers x 1000 utterances = 33,000 samples; 29,040 train / 1,980 val /
1,980 test) on the synthetic fixture corpus, so the only unknown left for a
real-GRID run is the data itself (ROADMAP #1).  Mirrors the reference
pipeline: dataset synthesis (dataset_generator.py) -> feature stats
(audio_feat_preprocessing.py) -> TFRecord serialization + 16-sample grouping
(tfrecord_utils.py:128-257) -> one training epoch (training_ctc.py epoch
loop).

Every stage runs as a subprocess and is timed; the corpus lives in tmpfs
(the sandbox disk writes at ~3 MB/s — a production host is assumed to hold
the 19 GB corpus in page cache after the first epoch anyway).  Stages:

  gen     fixture corpus + TFRecords      (host, CPU)
  stats   per-bin feature mean/std        (host, CPU)
  group   16-sample TFRecord grouping     (host, CPU)
  loader  native-loader epoch throughput  (host, CPU)
  epoch   one real training epoch         (TPU; flagship MTL config)

Usage:
  python scripts/grid_drill.py [dest_dir] [--speakers 33] [--utts 880 60 60]
  python scripts/grid_drill.py --stage <name> <dest_dir> ...   (internal)

Prints one JSON line per stage and a final summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _force_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def _dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def stage_gen(dest, speakers, utts):
    _force_cpu()
    from avsi.data.fixture import make_fixture

    t0 = time.time()
    make_fixture(
        dest, n_speakers=speakers, n_samples=tuple(utts), seed=7,
        gap_ms=800.0, gap_std_ms=100.0,
    )
    dt = time.time() - t0
    n = speakers * sum(utts)
    return {
        "stage": "gen", "seconds": round(dt, 1), "samples": n,
        "samples_per_s": round(n / dt, 1),
        "tfrecord_gb": round(_dir_bytes(os.path.join(dest, "tfrecords")) / 2**30, 2),
    }


def stage_stats(dest):
    _force_cpu()
    from avsi.data import stats as stats_lib

    src = os.path.join(dest, "syn", "training-set")
    t0 = time.time()
    stats_lib.compute_mean_std_features(
        src, "target", os.path.join(dest, "audio_spec"), feat_type="spec"
    )
    # fbanks stats for the ASR judge (audio_preprocessing runs per feature
    # type in the reference flow too)
    stats_lib.compute_mean_std_features(
        src, "target", os.path.join(dest, "audio_fbanks"), feat_type="fbanks"
    )
    dt = time.time() - t0
    n = sum(1 for d in os.scandir(src) if d.is_dir())
    return {
        "stage": "stats", "seconds": round(dt, 1), "samples": n,
        "samples_per_s": round(n / dt, 1), "passes": 2,
    }


def stage_group(dest):
    _force_cpu()
    from avsi.data.generator import group_tfrecords

    t0 = time.time()
    for split in ("training-set", "validation-set", "test-set"):
        src = os.path.join(dest, "tfrecords", split)
        if os.path.isdir(src):
            group_tfrecords(
                src, os.path.join(dest, "grouped", split), group_size=16,
                delete_input_dir=True,
            )
    dt = time.time() - t0
    gb = _dir_bytes(os.path.join(dest, "grouped")) / 2**30
    return {
        "stage": "group", "seconds": round(dt, 1),
        "grouped_gb": round(gb, 2), "gb_per_s": round(gb / dt, 3),
    }


def stage_loader(dest, batch_size=128):
    _force_cpu()
    from avsi.data.reader import DataManager
    from avsi.data.tfrecord import list_tfrecord_files

    files = list_tfrecord_files(os.path.join(dest, "grouped", "training-set"))
    dm = DataManager(seed=0)
    # warm one batch (probe + .so build excluded from the timing)
    next(iter(dm.batches(files, batch_size)))
    t0 = time.time()
    n = 0
    nbytes = 0
    for batch in dm.batches(files, batch_size, shuffle=True, drop_remainder=True):
        n += batch["num_real"]
        nbytes += sum(
            v.nbytes for v in batch.values() if hasattr(v, "nbytes")
        )
    dt = time.time() - t0
    return {
        "stage": "loader", "seconds": round(dt, 1), "samples": n,
        "samples_per_s": round(n / dt, 1), "native": dm.use_native,
        "parsed_gb_per_s": round(nbytes / 2**30 / dt, 2),
    }


def stage_epoch(dest, batch_size=128):
    # real-device (TPU under axon) full training epoch on the flagship MTL
    # model; config mirrors scripts/config-style training (training_ctc.py)
    exp = os.path.join(dest, "exp_drill")
    os.makedirs(exp, exist_ok=True)
    cfg_path = os.path.join(exp, "drill.config")
    with open(cfg_path, "w") as f:
        f.write(
            "\n".join(
                [
                    "model = av-blstm-ssnn-ctc",
                    "audio_len = 48000",  # 3 s fixture wavs; the default
                    # (16384) would fail the native-loader layout probe and
                    # silently fall back to the python codec
                    f"root_folder = {os.path.join(dest, 'grouped')}",
                    f"exp_folder = {exp}",
                    f"audio_feat_mean = {os.path.join(dest, 'audio_spec_mean.npy')}",
                    f"audio_feat_std = {os.path.join(dest, 'audio_spec_std.npy')}",
                    f"batch_size = {batch_size}",
                    "net_dim = [250,250,250]",
                    "ctc_loss = 0.001",
                    "starter_learning_rate = 0.001",
                    'compute_dtype = "bfloat16"',
                    "max_n_epochs = 1",
                    "n_earlystop_epochs = 5",
                    "dropout_rate = 0.1",
                    "tb_media = 0",
                ]
            )
            + "\n"
        )
    from avsi.train import loop

    t0 = time.time()
    summary = loop.train_or_exit(cfg_path)
    dt = time.time() - t0
    return {
        "stage": "epoch", "seconds": round(dt, 1), "steps": summary["steps"],
        "batch_size": batch_size,
        "samples_per_s": round(summary["steps"] * batch_size / dt, 1),
        "best_val": round(summary["best_val"], 5),
    }


def stage_cleanup(dest):
    # keep syn/test-set (sample dirs: target.wav, mask.npy, labels — what
    # inference/evaluation consume for the at-scale quality run) and raw/
    # (source utterances — what gap_sweep.py re-masks per gap size)
    t0 = time.time()
    for split in ("training-set", "validation-set"):
        shutil.rmtree(os.path.join(dest, "syn", split), ignore_errors=True)
    return {"stage": "cleanup", "seconds": round(time.time() - t0, 1)}


STAGES = {
    "gen": stage_gen,
    "stats": stage_stats,
    "group": stage_group,
    "cleanup": stage_cleanup,
    "loader": stage_loader,
    "epoch": stage_epoch,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dest", nargs="?", default="/dev/shm/grid_drill")
    ap.add_argument("--speakers", type=int, default=33)
    ap.add_argument("--utts", type=int, nargs=3, default=[880, 60, 60])
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--stage", choices=sorted(STAGES))
    ap.add_argument("--skip", nargs="*", default=[], help="stages to skip")
    args = ap.parse_args()

    if args.stage:  # subprocess entry
        fn = STAGES[args.stage]
        if args.stage == "gen":
            res = fn(args.dest, args.speakers, args.utts)
        elif args.stage in ("loader", "epoch"):
            res = fn(args.dest, args.batch_size)
        else:
            res = fn(args.dest)
        print("DRILL " + json.dumps(res), flush=True)
        return

    results = []
    order = ["gen", "stats", "group", "cleanup", "loader", "epoch"]
    for stage in order:
        if stage in args.skip:
            continue
        cmd = [
            sys.executable, os.path.abspath(__file__), args.dest,
            "--stage", stage, "--speakers", str(args.speakers),
            "--utts", *map(str, args.utts), "--batch_size", str(args.batch_size),
        ]
        print(f"=== drill stage: {stage} ===", flush=True)
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(cmd, cwd=REPO, text=True, capture_output=True, env=env)
        sys.stdout.write(proc.stdout[-4000:])
        sys.stderr.write(proc.stderr[-4000:])
        if proc.returncode != 0:
            print(json.dumps({"stage": stage, "error": proc.returncode}))
            sys.exit(1)
        for line in proc.stdout.splitlines():
            if line.startswith("DRILL "):
                results.append(json.loads(line[6:]))
    print("DRILL_SUMMARY " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
