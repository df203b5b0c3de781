"""Re-measure committed quality rows with the current phase-reconstruction
path — inference + evaluation only, from existing checkpoints (no training).

Motivation: the Griffin-Lim hole-phase init changed from zeros to
phase-vocoder extrapolation (avsi/ops/phase.py), which lifts STOI/PESQ/L1
(and PER via the fused SI->ASR chain) for every GL-reconstructed row. The
committed tables (capstone_r3_full.json, zoo_capstone_r3.json,
informative_study_r3.json, informative_full_r3.json) were measured with the
zero init; re-measuring them all keeps provenance uniform instead of mixing
inits within one table. Masked baselines and oracle-phase anchors do not go
through GL and are unaffected (not re-run).

Usage: python scripts/phase_refresh.py [out_json]
Skips any row whose checkpoint or corpus is missing; prints REFRESH_ROW
lines and a final PHASE_REFRESH_SUMMARY json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (corpus dest, experiment dir, siasr/eval prefix, eval csv base)
ROWS = [
    # grid_drill: full-29k capstone flagship + zoo leaderboard
    ("/dev/shm/grid_drill", "exp_si", "mtl", "capstone_eval"),
    ("/dev/shm/grid_drill", "exp_zoo_a-blstm-ssnn-ctc",
     "zoo_a-blstm-ssnn-ctc", "zoo_eval_a-blstm-ssnn-ctc"),
    ("/dev/shm/grid_drill", "exp_zoo_av-blstm",
     "zoo_av-blstm", "zoo_eval_av-blstm"),
    ("/dev/shm/grid_drill", "exp_zoo_av-blstm-ssnn",
     "zoo_av-blstm-ssnn", "zoo_eval_av-blstm-ssnn"),
    ("/dev/shm/grid_drill", "exp_zoo_av-blstm-twosteps",
     "zoo_av-blstm-twosteps", "zoo_eval_av-blstm-twosteps"),
    # informative mid-scale study
    ("/dev/shm/informative", "exp_a-blstm-ssnn-ctc",
     "inf_a-blstm-ssnn-ctc", "eval_a-blstm-ssnn-ctc"),
    ("/dev/shm/informative", "exp_av-blstm-ssnn-ctc",
     "inf_av-blstm-ssnn-ctc", "eval_av-blstm-ssnn-ctc"),
    # informative full-scale study
    ("/dev/shm/informative_full", "exp_a-blstm-ssnn-ctc",
     "inf_a-blstm-ssnn-ctc", "eval_a-blstm-ssnn-ctc"),
    ("/dev/shm/informative_full", "exp_av-blstm-ssnn-ctc",
     "inf_av-blstm-ssnn-ctc", "eval_av-blstm-ssnn-ctc"),
    ("/dev/shm/informative_full", "exp_av-blstm-twosteps",
     "inf_av-blstm-twosteps", "eval_av-blstm-twosteps"),
]


def main(out_json="phase_refresh_r3.json"):
    from avsi.eval import harness
    from avsi.infer import siasr

    out: dict = {}
    for dest, exp, prefix, eval_base in ROWS:
        si_ckpt = os.path.join(dest, exp, "netmodel")
        asr_ckpt = os.path.join(dest, "exp_asr", "netmodel")
        test_tfr = os.path.join(dest, "grouped", "test-set")
        test_audio = os.path.join(dest, "syn", "test-set")
        dict_file = os.path.join(dest, "dictionary.txt")
        missing = [p for p in (os.path.join(si_ckpt, "sinet.npz"),
                               os.path.join(asr_ckpt, "asrnet.npz"),
                               test_tfr, test_audio, dict_file)
                   if not os.path.exists(p)]
        if missing:
            print(f"SKIP {dest}/{exp}: missing {missing[0]}", flush=True)
            continue
        print(f"=== {dest}/{exp} (prefix {prefix}) ===", flush=True)
        t0 = time.time()
        res = siasr.infer(
            si_ckpt, asr_ckpt, test_tfr, test_audio, prefix, dict_file,
            norm=True, batch_size=128, gl_iters=30,
        )
        ev = harness.speech_inpainting_eval(
            test_audio, prefix, os.path.join(dest, eval_base),
            masked_eval=True,
        )
        key = f"{os.path.basename(dest)}/{exp}"
        out[key] = {
            "per_enhanced": res["per"],
            "eval": {k: list(v) for k, v in ev.items()},
            "wall_s": round(time.time() - t0, 1),
        }
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"REFRESH_ROW {key} " + json.dumps(out[key]), flush=True)

    print("PHASE_REFRESH_SUMMARY " + json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "phase_refresh_r3.json")
