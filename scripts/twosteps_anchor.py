"""Fair quality anchor for `av-blstm-twosteps` (round-2 verdict item #5),
round-4 extension: the known-region waveform **passthrough** leg
(round-3 verdict item #2).

The round-2 anchor measured the two-steps composition on envelope-only
video, where its v-net input carries no phonetic content and the model
cannot win by design.  This study evaluates it where it is on-design: the
`video_informative` corpus (phoneme-coded mouth landmarks), long gaps —
the regime where the v-net's prediction actually carries the missing
content (reference StackedBLSTM2StepsModel, models.py:240-317).

Round 4 adds two further inference/eval legs: `passthrough=True`
(avsi/ops/passthrough.py — original waveform samples outside gap frames,
model output inside, raised-cosine crossfade confined to the known side)
and passthrough combined with `--gap_atten 0.5` (avsi/ops/postfilter.py —
the atten_ladder_r4 PESQ winner; hallucinated deep-gap content scores
below silence under P.862).  The plain twosteps semantics resynthesize
the WHOLE utterance through GL phase, which PESQ punishes; see
BASELINE.md.  Reference-faithful full resynthesis stays the default leg.

Recipe: train the plain v-blstm vnet, then the frozen-vnet composition
(training.py:115-166 workflow), sharing ONE device-cached corpus upload;
infer on the held-out test set twice (default / passthrough); evaluate
STOI/PESQ/L1 vs the masked baseline for both legs (PER-free schema — the
corpus ships no ASR judge; demo_grid.py trains one on the same corpus).

The corpus is built in-place when missing (round 4 — tmpfs does not
survive across rounds): 8 speakers x (250, 20, 60) utterances/split,
informative video, 1600 +- 100 ms gaps — the round-3 protocol's shape.

Usage: python scripts/twosteps_anchor.py [corpus_base] [epochs]
corpus_base defaults to /dev/shm/av_inf.
Writes <corpus_base>/twosteps_anchor.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPEAKERS = 8
UTTS = (250, 20, 60)  # per speaker per split -> 2000 / 160 / 480 utterances
GAP_MS, GAP_STD_MS = 1600.0, 100.0


def ensure_corpus(base):
    """Build the informative 1600 ms anchor corpus + spec stats if absent."""
    from avsi.data import stats as stats_lib
    from avsi.data.fixture import make_fixture

    if not os.path.isdir(os.path.join(base, "tfrecords", "test-set")):
        print(
            f"=== corpus: {SPEAKERS} speakers x {UTTS} "
            f"(informative video, {GAP_MS:.0f} ms gaps)", flush=True
        )
        make_fixture(
            base, n_speakers=SPEAKERS, n_samples=UTTS, seed=13,
            gap_ms=GAP_MS, gap_std_ms=GAP_STD_MS, video_informative=True,
        )
    if not os.path.isfile(os.path.join(base, "spec_mean.npy")):
        stats_lib.compute_mean_std_features(
            os.path.join(base, "syn", "training-set"), "target",
            os.path.join(base, "spec"), feat_type="spec",
        )
    print("corpus ready", flush=True)


def main(base="/dev/shm/av_inf", epochs=20, corpus_cache=None):
    from avsi import config as config_lib
    from avsi.eval import harness
    from avsi.infer import inpaint, masking
    from avsi.train import loop

    ensure_corpus(base)
    common = {
        "audio_feat_dim": 257, "video_feat_dim": 136, "audio_len": 48000,
        "batch_size": 100, "net_dim": [250, 250, 250],
        "integration_layer": 0, "dropout_rate": 0.0,
        "max_n_epochs": int(epochs), "n_earlystop_epochs": int(epochs),
        "optimizer_type": "adam", "starter_learning_rate": 0.001,
        "lr_decay": 1.0, "compute_dtype": "bfloat16",
        "device_cache_corpus": 1, "tb_media": 0,
        "root_folder": os.path.join(base, "tfrecords"),
        "audio_feat_mean": os.path.join(base, "spec_mean.npy"),
        "audio_feat_std": os.path.join(base, "spec_std.npy"),
    }
    cache = corpus_cache if corpus_cache is not None else {}
    vnet_ckpt = os.path.join(base, "exp_v_plain", "netmodel", "sinet")
    if os.path.exists(vnet_ckpt + ".npz"):
        print("=== reusing trained vnet", flush=True)
        vsum = {"best_val": None}  # None, not NaN: keep the JSON strict
    else:
        vcfg = dict(common, model="v-blstm",
                    exp_folder=os.path.join(base, "exp_v_plain"))
        vp = os.path.join(base, "exp_v_plain.config")
        config_lib.save_configfile(vcfg, vp)
        print("=== training vnet (v-blstm)", flush=True)
        vsum = loop.train_or_exit(vp, corpus_cache=cache)
        print("vnet best_val", vsum["best_val"], flush=True)

    exp2 = os.path.join(base, "exp_2steps")
    if os.path.exists(os.path.join(exp2, "netmodel", "sinet.npz")):
        print("=== reusing trained av-blstm-twosteps", flush=True)
        tsum = {"best_val": None}
    else:
        tcfg = dict(common, model="av-blstm-twosteps", exp_folder=exp2,
                    model_ckp_vnet=vnet_ckpt)
        tp = os.path.join(base, "exp_2steps.config")
        config_lib.save_configfile(tcfg, tp)
        print("=== training av-blstm-twosteps (frozen vnet)", flush=True)
        tsum = loop.train_or_exit(tp, corpus_cache=cache)
        print("twosteps best_val", tsum["best_val"], flush=True)

    test_tfr = os.path.join(base, "tfrecords", "test-set")
    test_audio = os.path.join(base, "syn", "test-set")

    print("=== masked baseline wavs", flush=True)
    masking.mask_app(
        test_tfr, test_audio, oracle_phase=False, num_audio_samples=48000,
        batch_size=32, feat_mean_file=os.path.join(base, "spec_mean.npy"),
        feat_std_file=os.path.join(base, "spec_std.npy"),
    )

    out = {
        "study": "twosteps fair anchor (video_informative, 1600 ms gaps)"
                 " + r4 passthrough leg",
        "corpus": {"speakers": SPEAKERS, "utts_per_speaker": list(UTTS),
                   "gap_ms": GAP_MS, "gap_std_ms": GAP_STD_MS, "seed": 13},
        "vnet_best_val": None if vsum["best_val"] is None
        else float(vsum["best_val"]),
        "twosteps_best_val": None if tsum["best_val"] is None
        else float(tsum["best_val"]),
    }
    legs = (
        ("eval", "twosteps_fair", {}),            # reference-faithful default
        ("eval_passthrough", "twosteps_pt", {"passthrough": True}),
        # deployment combo: passthrough + deep-gap attenuation (the
        # atten_ladder_r4 PESQ winner) — hallucinated deep-gap content
        # scores below silence under P.862, so the floor lifts PESQ
        ("eval_passthrough_atten", "twosteps_pta",
         {"passthrough": True,
          "gap_atten": {"alpha": 0.5, "trust": 34, "ramp": 16}}),
    )
    for key, prefix, kw in legs:
        print(f"=== inference ({key})", flush=True)
        res = inpaint.infer(
            os.path.join(exp2, "netmodel"), test_tfr, test_audio,
            prefix, norm=True, batch_size=32,
            phase_recon="gl", gl_iters=50, **kw,
        )
        print("infer:", res, flush=True)
        print(f"=== evaluation ({key}: enhanced vs masked)", flush=True)
        summary = harness.speech_enhancement_eval(
            test_audio, prefix, os.path.join(base, "eval_" + prefix),
            masked_eval=True, window_size=24, step_size=12, num_workers=4,
        )
        out[key] = {k: list(map(float, v)) for k, v in summary.items()}
        with open(os.path.join(base, "twosteps_anchor.json"), "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)
    return out


if __name__ == "__main__":
    main(*(sys.argv[1:] and [sys.argv[1]] or []),
         **({"epochs": int(sys.argv[2])} if len(sys.argv) > 2 else {}))
