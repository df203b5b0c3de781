"""Gap-size sweep: the reference's 100/200/400/800/1600 ms protocol
(scripts/inference_asr.sh:3, docs demo) against one trained model.

Builds per-gap test corpora from HELD-OUT utterances of an existing
fixture workdir (same raw corpus, same test-split utterance names, masks
re-sampled at each gap size), then runs masking -> fused SI->ASR ->
evaluation per gap and prints one summary table.

Usage: python scripts/gap_sweep.py <fixture_workdir> <si_ckpt> <asr_ckpt> [gaps...]
Env: GAP_SWEEP_MAX_UTTS=N caps held-out utterances per speaker (all 33
speakers kept) — the per-gap corpus build + relay uploads scale linearly,
so a capped sweep fits a bounded time budget; the cap is recorded in the
output line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(work, si_ckpt, asr_ckpt, gaps=(100, 200, 400, 800, 1600)):
    from avsi.data import generator
    from avsi.eval import harness
    from avsi.infer import asr as asr_infer, masking, siasr
    from avsi.infer.inpaint import load_model_bundle

    # masking must use the SI model's STFT geometry and audio length
    si_config, _, si_model, _ = load_model_bundle(si_ckpt, norm=True)
    audio_len = int(si_config["audio_len"])

    raw = os.path.join(work, "raw")
    dict_file = os.path.join(work, "dictionary.txt")
    # held-out utterance names = whatever the test split used
    test_dir = os.path.join(work, "syn", "test-set")
    utt_names = sorted(
        {d.split("_")[1] for d in os.listdir(test_dir) if "_" in d}
    )
    max_utts = int(os.environ.get("GAP_SWEEP_MAX_UTTS", "0"))
    if max_utts:
        utt_names = utt_names[:max_utts]
        print(f"# capped to {max_utts} held-out utterances per speaker", flush=True)
    cap_tag = f"-u{max_utts}" if max_utts else ""  # capped corpora get their
    # own dirs so a cached full-corpus build is never silently reused (and
    # vice versa)
    speakers = sorted(
        int(s[1:]) for s in os.listdir(raw) if s.startswith("s") and s[1:].isdigit()
    )
    spec_mean = os.path.join(work, "spec_norm_mean.npy")  # quality_check layout
    if not os.path.exists(spec_mean):
        spec_mean = os.path.join(work, "audio_spec_mean.npy")  # grid_drill layout
    spec_std = spec_mean.replace("_mean.npy", "_std.npy")

    # the per-gap corpora below are generated on the default 12 ms-hop /
    # 257-bin mask grid (create_syn_dataset defaults); fail loudly rather
    # than hand a unet-geometry (8 ms / 128-bin) model misaligned masks
    if (si_model.frame_step, si_model.fft_length) != (192, 512):
        raise SystemExit(
            f"gap_sweep generates masks on the 12 ms / 257-bin grid, but the "
            f"SI checkpoint uses hop={si_model.frame_step} / "
            f"fft={si_model.fft_length}; regenerate the per-gap corpora at "
            "the model's geometry before sweeping"
        )

    results = {"utts_per_gap": len(utt_names) * len(speakers)}
    for gap in gaps:
        tag = f"test-set-{gap}ms{cap_tag}"
        syn_dir = os.path.join(work, "syn", tag)
        tfr_dir = os.path.join(work, "tfrecords", tag)
        if not os.path.isdir(tfr_dir):
            generator.create_syn_dataset(
                raw, syn_dir, speakers=speakers, n_samples=0, audio_len=3000,
                n_max_intr=1, cov_mean=float(gap), cov_std=max(gap / 8.0, 1.0),
                seed=100 + gap, utterance_names=utt_names,
            )
            from avsi.data.phonemes import load_dictionary

            generator.create_tfrecords_training(
                syn_dir, tfr_dir, load_dictionary(dict_file)
            )
        masking.mask_app(
            tfr_dir, syn_dir, oracle_phase=False, num_audio_samples=audio_len,
            batch_size=32, feat_mean_file=spec_mean, feat_std_file=spec_std,
            frame_length=si_model.frame_length, frame_step=si_model.frame_step,
            fft_length=si_model.fft_length,
        )
        masked = asr_infer.infer(
            asr_ckpt, tfr_dir, syn_dir, "masked", dict_file,
            apply_mask=True, norm=True, batch_size=32,
        )
        enh = siasr.infer(
            si_ckpt, asr_ckpt, tfr_dir, syn_dir, "sweep", dict_file,
            norm=True, batch_size=32, gl_iters=30,
        )
        ev = harness.speech_inpainting_eval(
            syn_dir, "sweep", "sweep_eval", masked_eval=True, num_workers=8
        )
        results[gap] = {
            "per_masked": masked["per"],
            "per_enhanced": enh["per"],
            "stoi_masked": ev["stoi_masked"][0],
            "stoi_enhanced": ev["stoi_enhanced"][0],
            "pesq_masked": ev["pesq_masked"][0],
            "pesq_enhanced": ev["pesq_enhanced"][0],
            "l1_masked": ev["l1_masked"][0],
            "l1_enhanced": ev["l1_enhanced"][0],
        }
        print(f"GAP_{gap} " + json.dumps(results[gap]), flush=True)

    print(
        "\ngap_ms  STOI_mask  STOI_enh  STOIi   PESQ_mask PESQ_enh PESQi  "
        "L1_mask    L1_enh    PER_mask PER_enh"
    )
    for gap, r in results.items():
        if not isinstance(r, dict):  # meta keys (utts_per_gap)
            continue
        print(
            f"{gap:6d}  {r['stoi_masked']:.4f}    {r['stoi_enhanced']:.4f}   "
            f"{r['stoi_enhanced']-r['stoi_masked']:+.4f} "
            f"{r['pesq_masked']:.3f}     {r['pesq_enhanced']:.3f}    "
            f"{r['pesq_enhanced']-r['pesq_masked']:+.3f} {r['l1_masked']:9.0f}  "
            f"{r['l1_enhanced']:9.0f}  {r['per_masked']:.4f}  {r['per_enhanced']:.4f}"
        )
    print("GAP_SWEEP " + json.dumps(results))
    return results


if __name__ == "__main__":
    args = sys.argv[1:]
    gaps = [int(g) for g in args[3:]] or (100, 200, 400, 800, 1600)
    main(args[0], args[1], args[2], gaps)
