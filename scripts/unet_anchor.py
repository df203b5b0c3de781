"""Quality anchor for the unet family (round-2 verdict item #5).

The unet / unet-pconv models run a 16 ms / 8 ms / n_fft=256 front-end on
128-bin spectrograms (reference models.py:537, scripts/config/unet.config)
— a different geometry from the GRID-shaped drill corpus, so they carried
no quality anchor through round 2.  This study builds a 128-bin drill
corpus (harmonic utterances cropped to 16,384 samples = 128 frames, with
time-gap masks at the unet frame grid), trains BOTH unet twins on one
shared device-cached upload, reconstructs the masked baseline at the same
geometry, GL-infers, and records masked -> enhanced STOI/PESQ/L1 at the
reference's evaluation_mateng.sh STFT parameters (16/8/256).

Usage: python scripts/unet_anchor.py [workdir] [raw_src] [epochs] [mask_kind]
raw_src defaults to the GRID-scale drill corpus raw wavs in tmpfs.
Writes <workdir>/unet_anchor.json.

mask_kind="freeform" (default "timegap") swaps the reference's full-band
time gaps for irregular free-form T-F holes (data/masks.get_freeform_mask,
~25% coverage) — the regime partial convolutions were designed for (Liu et
al. 2018), giving the `unet-pconv` twin an ON-DESIGN anchor the reference
task never exercises.  Everything downstream (models, masked baseline,
GL known-phase clamp, eval) is already per-(frame, bin), so only the mask
sampling changes.

Round 4 adds a **passthrough** inference/eval leg per twin (r3 verdict
item #2; avsi/ops/passthrough.py): original samples outside gap frames,
model output inside.  The unet semantics resynthesize the whole utterance
through GL phase (reference models.py:537-608), which caps PESQ; the
passthrough leg measures the deployment lever at the family's own 16/8 ms
geometry.  When the raw GRID-drill wav set is absent (tmpfs does not
survive rounds) an equivalent fixture raw tree is synthesized in place.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SAMPLES = 16384  # 128 frames x 128 hop
T = 128
AF = 128
SPEAKERS = 8
TRAIN_PER_SPK = 150
VAL_PER_SPK = 25
TEST_PER_SPK = 25


def ensure_raw(raw_src, scratch):
    """Return a usable raw wav tree, synthesizing a fixture one if absent.

    The r3 anchor consumed the GRID-drill raw set; only `raw/s<k>/...wav`
    is read here, and 150+25+25 utterances per speaker are needed, so an
    8-speaker fixture with 204 utterances/speaker is an equivalent source.
    """
    if glob.glob(os.path.join(raw_src, "s*")):
        return raw_src
    from avsi.data.fixture import make_fixture

    print("=== raw source missing; synthesizing fixture raw set", flush=True)
    out = make_fixture(scratch, n_speakers=SPEAKERS, n_samples=(200, 2, 2),
                       seed=5, raw_only=True)
    return out["raw"]


def build_corpus(workdir, raw_src, mask_kind="timegap"):
    from avsi.data import tfrecord as tfr
    from avsi.utils import wav as wavio
    from avsi.data import masks as masks_lib

    rng = np.random.default_rng(7)
    split_sizes = {
        "training-set": TRAIN_PER_SPK,
        "validation-set": VAL_PER_SPK,
        "test-set": TEST_PER_SPK,
    }
    for spk in range(1, SPEAKERS + 1):
        # GRID raw layout: <raw>/s<k>/s<k>_16kHz/utt*.wav (downsample_grid.py)
        utts = sorted(
            glob.glob(os.path.join(raw_src, f"s{spk}", f"s{spk}_16kHz", "*.wav"))
            or glob.glob(os.path.join(raw_src, f"s{spk}", "*.wav"))
        )
        if len(utts) < sum(split_sizes.values()):
            raise ValueError(f"not enough raw utterances for s{spk}")
        k = 0
        for split, count in split_sizes.items():
            tdir = os.path.join(workdir, "tfrecords", split)
            adir = os.path.join(workdir, "syn", split)
            os.makedirs(tdir, exist_ok=True)
            for _ in range(count):
                src = utts[k]
                k += 1
                _, wave = wavio.read_wav_int16(src)
                wave = wave.astype(np.float32)[:N_SAMPLES]
                if len(wave) < N_SAMPLES:
                    # a silent `continue` would shrink the split below the
                    # documented size with no error (the upfront count check
                    # cannot see wave lengths)
                    raise ValueError(
                        f"{src} is shorter than {N_SAMPLES} samples; the "
                        "anchor corpus requires full-length raw utterances"
                    )
                if mask_kind == "freeform":
                    # irregular T-F holes, same ~25% coverage as the
                    # time-gap corpus so the two anchors are comparable
                    mask, _, _ = masks_lib.get_freeform_mask(
                        rng, AF, T, cov_mean=0.25, cov_std=0.06
                    )
                else:
                    # gaps ~200-400 ms at the 8 ms frame grid (25-50 frames)
                    mask, _, _ = masks_lib.get_intrusions_mask(
                        rng, AF, T, cov_mean=0.25, cov_std=0.06, n_max_intr=1
                    )
                name = f"s{spk}_" + os.path.splitext(os.path.basename(src))[0]
                sdir = os.path.join(adir, name)
                os.makedirs(sdir, exist_ok=True)
                wavio.write_wav_int16(os.path.join(sdir, "target.wav"), wave)
                np.save(os.path.join(sdir, "mask.npy"), mask.astype(np.float32))
                rec = tfr.serialize_sample_fixed(
                    T, 1, wave, np.zeros((T, 136), np.float32),
                    mask.astype(np.float32), np.zeros(50, np.float32), name,
                )
                with tfr.TFRecordWriter(os.path.join(tdir, name + ".tfrecord")) as w:
                    w.write(rec)
    print("corpus built", flush=True)


def main(workdir="/dev/shm/unet_drill", raw_src="/dev/shm/grid_drill/raw",
         epochs=30, mask_kind="timegap"):
    from avsi import config as config_lib
    from avsi.data import stats as stats_lib
    from avsi.eval import harness
    from avsi.infer import inpaint, masking
    from avsi.train import loop

    if not os.path.isdir(os.path.join(workdir, "tfrecords", "test-set")):
        raw_src = ensure_raw(raw_src, workdir + "_rawsrc")
        build_corpus(workdir, raw_src, mask_kind)

    mean_p = os.path.join(workdir, "spec_mean.npy")
    std_p = os.path.join(workdir, "spec_std.npy")
    if not os.path.isfile(mean_p):
        mean, std = stats_lib.compute_mean_std_features(
            os.path.join(workdir, "syn", "training-set"), "target",
            os.path.join(workdir, "spec"), "spec",
            n_fft=256, window_size=16, step_size=8,
        )
        np.save(mean_p, mean.astype(np.float32)[:AF])
        np.save(std_p, std.astype(np.float32)[:AF])
        print("stats done", flush=True)

    common = {
        "audio_feat_dim": AF, "video_feat_dim": 136, "audio_len": N_SAMPLES,
        "batch_size": 32, "net_dim": [1], "integration_layer": 0,
        "dropout_rate": 0.0, "max_n_epochs": int(epochs),
        "n_earlystop_epochs": int(epochs), "optimizer_type": "adam",
        "starter_learning_rate": 0.001, "lr_decay": 1.0,
        "compute_dtype": "bfloat16", "device_cache_corpus": 1, "tb_media": 0,
        "root_folder": os.path.join(workdir, "tfrecords"),
        "audio_feat_mean": mean_p, "audio_feat_std": std_p,
    }
    cache = {}
    out = {
        "study": "unet family anchor (128-bin corpus, "
        + ("free-form T-F holes ~25%" if mask_kind == "freeform"
           else "~200-400 ms gaps")
        + ")",
        "mask_kind": mask_kind,
    }
    for model in ("unet", "unet-pconv"):
        exp = os.path.join(workdir, "exp_" + model.replace("-", "_"))
        cfgp = exp + ".config"
        config_lib.save_configfile(dict(common, model=model, exp_folder=exp), cfgp)
        print("=== training", model, flush=True)
        summ = loop.train_or_exit(cfgp, corpus_cache=cache)
        print(model, "best_val", summ["best_val"], flush=True)
        out[model + "_best_val"] = float(summ["best_val"])

        for prefix, kw in ((model, {}), (model + "_pt", {"passthrough": True})):
            print("=== inference", prefix, flush=True)
            res = inpaint.infer(
                os.path.join(exp, "netmodel"),
                os.path.join(workdir, "tfrecords", "test-set"),
                os.path.join(workdir, "syn", "test-set"),
                prefix, norm=True, batch_size=32, phase_recon="gl",
                gl_iters=50, **kw,
            )
            print("infer:", res, flush=True)

    print("=== masked baseline at the unet geometry", flush=True)
    masking.mask_app(
        os.path.join(workdir, "tfrecords", "test-set"),
        os.path.join(workdir, "syn", "test-set"),
        oracle_phase=False, audio_feat_dim=AF, num_audio_samples=N_SAMPLES,
        batch_size=32, feat_mean_file=mean_p, feat_std_file=std_p,
        frame_length=256, frame_step=128, fft_length=256,
    )

    for model in ("unet", "unet-pconv"):
        for key, prefix in ((model, model),
                            (model + "_passthrough", model + "_pt")):
            print("=== evaluation", prefix, flush=True)
            summary = harness.speech_enhancement_eval(
                os.path.join(workdir, "syn", "test-set"), prefix,
                os.path.join(workdir, "eval_" + prefix),
                masked_eval=True, n_fft=256, window_size=16, step_size=8,
                num_workers=4,
            )
            out[key] = {k: list(map(float, v)) for k, v in summary.items()}
    with open(os.path.join(workdir, "unet_anchor.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    kw = {}
    if len(args) > 2:
        kw["epochs"] = int(args[2])
    if len(args) > 3:
        kw["mask_kind"] = args[3]
    main(*args[:2], **kw)
