"""Streaming 1600 ms ladder: the causal gap-atten mitigation on the LIVE
path (r4 verdict Next #4 "Done" criterion).

Round 4 proved the 1600 ms PER inversion offline (judge PER on enhanced
0.587 > masked 0.559, gap_sweep_r3.json) and shipped `--gap_atten 0.5` as
the offline mitigation (PER 0.382, atten_ladder_r4.json).  Round 5 wired
the causal twin into streaming/serving; this script measures it at live
latency: the SAME 990-utterance 1600 ms protocol (33 speakers x 30
held-out utterances, seed 100+1600), enhanced by the lockstep streaming
fleet at C=8/L=16 (288 ms algorithmic latency) with gap_atten swept, each
leg judged by the same beam-100 ASR judge the offline ladder used.

Legs: masked (no model), streaming alpha=1 (off), streaming alpha=0.5,
streaming alpha=0.25 — plus the offline alpha ladder rows cited from
atten_ladder_r4.json for comparison.

Usage: python scripts/stream_atten_ladder.py [n_utts_per_speaker]
Requires /dev/shm/grid_drill with exp_si + exp_asr (grid_capstone.py).
Writes /dev/shm/grid_drill/stream_atten_ladder.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

D = "/dev/shm/grid_drill"
GAP = 1600
CHUNK, LOOK = 8, 16


def ensure_corpus(max_utts):
    """Build (or reuse) the 1600 ms held-out corpus exactly like
    gap_sweep.py: same utterance names, same seed, same generator knobs."""
    from avsi.data import generator
    from avsi.data.phonemes import load_dictionary

    tag = f"test-set-{GAP}ms-u{max_utts}"
    syn_dir = os.path.join(D, "syn", tag)
    tfr_dir = os.path.join(D, "tfrecords", tag)
    if os.path.isdir(tfr_dir):
        return tfr_dir, syn_dir
    raw = os.path.join(D, "raw")
    test_dir = os.path.join(D, "syn", "test-set")
    utt_names = sorted(
        {d.split("_")[1] for d in os.listdir(test_dir) if "_" in d}
    )[:max_utts]
    speakers = sorted(
        int(s[1:]) for s in os.listdir(raw)
        if s.startswith("s") and s[1:].isdigit()
    )
    generator.create_syn_dataset(
        raw, syn_dir, speakers=speakers, n_samples=0, audio_len=3000,
        n_max_intr=1, cov_mean=float(GAP), cov_std=max(GAP / 8.0, 1.0),
        seed=100 + GAP, utterance_names=utt_names,
    )
    generator.create_tfrecords_training(
        syn_dir, tfr_dir, load_dictionary(os.path.join(D, "dictionary.txt"))
    )
    return tfr_dir, syn_dir


def main(max_utts=30):
    import jax
    import jax.numpy as jnp

    from avsi.data import reader as reader_lib
    from avsi.data.tfrecord import list_tfrecord_files
    from avsi.infer import asr as asr_infer, streaming
    from avsi.infer.asr import make_asr_step
    from avsi.infer.inpaint import load_model_bundle
    from avsi.ops import ctc as ctc_ops
    from avsi.eval.metrics import stoi_eval

    tfr_dir, syn_dir = ensure_corpus(max_utts)
    dict_file = os.path.join(D, "dictionary.txt")
    si_ckpt = os.path.join(D, "exp_si", "netmodel")
    asr_ckpt = os.path.join(D, "exp_asr", "netmodel")

    si_config, si_stats, _, si_params = load_model_bundle(si_ckpt, norm=True)
    si_params = jax.device_get(si_params)
    asr_config, asr_stats, _, asr_params = load_model_bundle(
        asr_ckpt, norm=True, is_asr=True
    )
    judge = jax.jit(make_asr_step(asr_config, asr_stats, apply_mask=False,
                                  use_beam=True))

    out = {
        "study": ("streaming 1600 ms ladder: causal gap attenuation at "
                  f"{(CHUNK + LOOK) * 12} ms live latency"),
        "protocol": f"33 speakers x {max_utts} utts, seed {100 + GAP}, "
                    "lockstep fleet C=8/L=16, judge exp_asr beam 100",
        "offline_reference": {
            "per_masked": 0.559, "per_enhanced_alpha1": 0.587,
            "per_enhanced_alpha0.5": 0.382,
            "source": "gap_sweep_r3.json / atten_ladder_r4.json "
                      "(same utterances, same judge recipe)",
        },
    }

    # ---- masked baseline (no model): the standard apply_mask judge leg
    masked = asr_infer.infer(
        asr_ckpt, tfr_dir, syn_dir, "masked_sl", dict_file,
        apply_mask=True, norm=True, batch_size=32,
    )
    out["masked"] = {"per": masked["per"]}
    print("masked PER", masked["per"], flush=True)

    # ---- streaming legs: lockstep-enhance, then judge the enhanced wav
    dm = reader_lib.DataManager(
        num_audio_samples=si_config["audio_len"],
        audio_feat_size=si_config["audio_feat_dim"],
        video_feat_size=si_config["video_feat_dim"],
    )
    files = list_tfrecord_files(tfr_dir)

    for alpha in (1.0, 0.5, 0.25):
        ga = None if alpha >= 1.0 else {"alpha": alpha, "trust": 34,
                                        "ramp": 16}
        pcache: dict = {}
        decs, labs, stois = [], [], []
        n_total = 0
        for batch in dm.batches(files, 32):
            n = batch.get("num_real", len(batch["sequence_lengths"]))
            waves = np.asarray(batch["target_sources"][:n], np.float32)
            fmasks = np.asarray(batch["masks"][:n, :, 0], np.float32)
            vids = np.asarray(batch["video_features"][:n], np.float32)
            wav = streaming.stream_utterances_lockstep(
                si_config, si_stats, si_params, waves, fmasks, vids,
                chunk_frames=CHUNK, lookahead_frames=LOOK,
                program_cache=pcache, gap_atten=ga,
            )
            enh = np.zeros_like(waves)
            m = min(wav.shape[1], enh.shape[1])
            enh[:, :m] = wav[:, :m]
            jb = {
                "target_sources": jnp.asarray(enh),
                "sequence_lengths": jnp.asarray(
                    batch["sequence_lengths"][:n]),
                "labels": jnp.asarray(batch["labels"][:n]),
                "labels_lengths": jnp.asarray(batch["labels_lengths"][:n]),
                "masks": jnp.asarray(batch["masks"][:n]),
            }
            logits, _, lengths = judge(asr_params, jb)
            seqs = ctc_ops.beam_search_decode_batch(
                np.asarray(logits), np.asarray(lengths), 100
            )
            for i in range(n):
                decs.append(seqs[i])
                ll = int(batch["labels_lengths"][i])
                labs.append([int(x) for x in batch["labels"][i][:ll]])
                stois.append(stoi_eval(waves[i], enh[i]))
            n_total += n
        per = ctc_ops.per_metric(decs, labs)
        key = f"stream_alpha_{alpha}"
        out[key] = {"per": per, "stoi": float(np.mean(stois)),
                    "n_utts": n_total}
        print(key, json.dumps(out[key]), flush=True)

    with open(os.path.join(D, "stream_atten_ladder.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("STREAM_ATTEN_LADDER " + json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
