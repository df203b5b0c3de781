"""1600 ms PER-inversion ladder (c): gap-attenuation postfilter sweep.

Rounds (a) ctc-weight (ctc_ladder_r4.json) and (b) informative video
(informative_gap_sweep_r4.json) established the inversion is information
starvation deep inside long gaps.  This leg measures the deployment-side
mitigation: `--gap_atten` (avsi/ops/postfilter.py) attenuates the
predicted magnitude beyond a 34-frame trust horizon, which by construction
leaves every gap <= 800 ms bit-identical (tests/test_postfilter.py).

Protocol: the SAME 990-utterance 1600 ms corpus, flagship and ASR judge as
gap_sweep_r3.json / ctc_ladder_r4.json; sweep alpha over {0.5, 0.25, 0.1,
0.0}; report PER / STOI / PESQ / L1 per alpha.  Masked baselines are
re-used from the ctc-ladder run (same corpus, same judge).

Writes /dev/shm/grid_drill/atten_ladder.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = "/dev/shm/grid_drill"
TFR = os.path.join(D, "tfrecords", "test-set-1600ms-u30")
SYN = os.path.join(D, "syn", "test-set-1600ms-u30")
SI = os.path.join(D, "exp_si", "netmodel")
ASR = os.path.join(D, "exp_asr", "netmodel")
DICT = os.path.join(D, "dictionary.txt")


def main(alphas=(0.5, 0.25, 0.1, 0.0)):
    from avsi.eval import harness
    from avsi.infer import siasr

    for path in (TFR, SYN, SI, ASR):
        if not os.path.isdir(path):
            raise SystemExit(f"missing {path} — run the r3 drill + ctc ladder first")

    out = {
        "study": "1600 ms PER-inversion ladder (c): gap-attenuation postfilter",
        "model": "exp_si (full-29k flagship, capstone_r3_full.json)",
        "judge": "exp_asr, beam 100",
        "postfilter": {"trust": 34, "ramp": 16,
                       "note": "<=800 ms single-intrusion gaps bit-identical"},
        "baseline_alpha1": {
            "per_masked": 0.559, "per_enhanced": 0.587,
            "source": "gap_sweep_r3.json (same 990 utterances, same judge)",
        },
    }
    for alpha in alphas:
        tag = f"atten{alpha:g}".replace(".", "p")
        enh = siasr.infer(
            SI, ASR, TFR, SYN, tag, DICT,
            norm=True, batch_size=32, gl_iters=30,
            gap_atten={"alpha": float(alpha), "trust": 34, "ramp": 16},
        )
        ev = harness.speech_inpainting_eval(
            SYN, tag, os.path.join(D, f"{tag}_eval"), masked_eval=False,
            num_workers=8,
        )
        out[f"alpha_{alpha:g}"] = {
            "per_enhanced": enh["per"],
            "stoi_enhanced": ev["stoi_enhanced"][0],
            "pesq_enhanced": ev["pesq_enhanced"][0],
            "l1_enhanced": ev["l1_enhanced"][0],
        }
        print(f"ALPHA_{alpha:g} " + json.dumps(out[f"alpha_{alpha:g}"]), flush=True)

    with open(os.path.join(D, "atten_ladder.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("ATTEN_LADDER " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main([float(a) for a in sys.argv[1:]] or (0.5, 0.25, 0.1, 0.0))
