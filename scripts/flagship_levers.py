"""Deployment levers on the COMPOSITE MTL flagship (round 4).

twosteps_anchor_r4/unet_anchor_r4 measured `--passthrough` on the
non-composite families, whose semantics resynthesize clean regions
through GL phase.  The composite families (ssnn/ctc, reference
models.py:1012) already restore unmasked BINS exactly — but the
*waveform* still carries GL phase in clean regions wherever the masked
signal's phase was used as the known-phase clamp.  This study
quantifies what the levers buy on `av-blstm-ssnn-ctc` at 1600 ms gaps:

  legs: default GL / --passthrough / --passthrough + --gap_atten 0.5

on the informative anchor corpus (scripts/twosteps_anchor.ensure_corpus),
reusing the demo_grid-trained flagship + ASR judge when present (trained
fresh otherwise), with PER from the judge (siasr joint pipeline) and
STOI/PESQ/L1 vs masked from the eval harness.

Usage: python scripts/flagship_levers.py [corpus_base] [epochs]
Writes <corpus_base>/flagship_levers.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import twosteps_anchor  # noqa: E402


def main(base="/dev/shm/av_inf", epochs=60):
    import demo_grid
    from avsi.eval import harness
    from avsi.infer import masking, siasr

    twosteps_anchor.ensure_corpus(base)
    si_ckpt = os.path.join(base, "exp_av_mtl", "netmodel")
    judge_ckpt = os.path.join(base, "exp_asr", "netmodel")
    if not (os.path.exists(os.path.join(si_ckpt, "sinet.npz"))
            and os.path.exists(os.path.join(judge_ckpt, "asrnet.npz"))):
        # demo_grid trains exactly these two (plus ao_mtl) on this corpus
        demo_grid.main(base, epochs, out_dir=os.path.join(base, "docs_tmp"),
                       with_twosteps=False)

    test_tfr = os.path.join(base, "tfrecords", "test-set")
    test_audio = os.path.join(base, "syn", "test-set")
    spec = os.path.join(base, "spec")
    dict_file = os.path.join(base, "dictionary.txt")

    print("=== masked baseline wavs", flush=True)
    masking.mask_app(
        test_tfr, test_audio, oracle_phase=False, num_audio_samples=48000,
        batch_size=32, feat_mean_file=spec + "_mean.npy",
        feat_std_file=spec + "_std.npy",
    )

    out = {
        "study": "deployment levers on the composite flagship "
                 "(av-blstm-ssnn-ctc, informative corpus, 1600 ms gaps)",
        "model": "av-blstm-ssnn-ctc",
    }
    atten = {"alpha": 0.5, "trust": 34, "ramp": 16}
    legs = (
        ("default", "flag_gl", {}),
        ("passthrough", "flag_pt", {"passthrough": True}),
        ("passthrough_atten", "flag_pta",
         {"passthrough": True, "gap_atten": atten}),
    )
    for key, prefix, kw in legs:
        print(f"=== inference+PER ({key})", flush=True)
        res = siasr.infer(
            si_ckpt, judge_ckpt, test_tfr, test_audio, prefix, dict_file,
            norm=True, batch_size=32, gl_iters=50, **kw,
        )
        print("infer:", res, flush=True)
        print(f"=== evaluation ({key})", flush=True)
        summary = harness.speech_enhancement_eval(
            test_audio, prefix, os.path.join(base, "eval_" + prefix),
            masked_eval=True, window_size=24, step_size=12, num_workers=4,
        )
        out[key] = {
            "per_enhanced": res["per"],
            "eval": {k: list(map(float, v)) for k, v in summary.items()},
        }
        with open(os.path.join(base, "flagship_levers.json"), "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: (v if not isinstance(v, dict) else
                          {"per": v.get("per_enhanced")}) for k, v in out.items()},
                     indent=1), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "/dev/shm/av_inf",
         int(a[1]) if len(a) > 1 else 60)
