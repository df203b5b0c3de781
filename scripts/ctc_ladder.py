"""The 1600 ms PER-inversion ladder, step (a): ctc_loss weight sweep.

Round-3 finding (gap_sweep_r3.json, BASELINE.md): at 1600 ms gaps the
envelope-video flagship's inpainted speech is LESS recognizable than the
silent hole (judge PER 0.587 enhanced vs 0.559 masked) — insertion-heavy
hallucinated content.  Hypothesis under test: a stronger CTC auxiliary
weight (reference MTL loss `loss_hole + w*ctc`, models.py:1634-1645;
reference default w=0.001, scripts/config/blstm_ctc.config) regularizes
the trunk toward phone-recognizable gap content and closes the inversion.

Protocol: fine-tune the converged full-29k flagship (exp_si, 60 epochs,
capstone_r3_full.json) at ctc_loss in {0.01, 0.05} for `epochs` epochs
from the HBM-cached corpus, then run the 1600 ms leg of the reference
gap-sweep protocol (scripts/inference_asr.sh:3) on the same 990 held-out
utterances as gap_sweep_r3.json, same ASR judge.

Usage: python scripts/ctc_ladder.py [epochs] [weights...]
Writes /dev/shm/grid_drill/ctc_ladder.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gap_sweep  # noqa: E402

D = "/dev/shm/grid_drill"


def main(epochs=20, weights=(0.01, 0.05)):
    from avsi import config as config_lib
    from avsi.train import loop

    os.environ.setdefault("GAP_SWEEP_MAX_UTTS", "30")
    asr_ckpt = os.path.join(D, "exp_asr", "netmodel")
    base_cfg = config_lib.load_configfile(os.path.join(D, "exp_si.config"))

    out = {
        "study": "1600 ms PER-inversion ladder (a): ctc_loss weight sweep",
        "base": "exp_si (full-29k 60-epoch flagship, capstone_r3_full.json)",
        "finetune_epochs": int(epochs),
        "baseline_w0.001": {
            "per_masked": 0.559, "per_enhanced": 0.587,
            "source": "gap_sweep_r3.json (same 990 utterances, same judge)",
        },
    }
    cache: dict = {}
    for w in weights:
        tag = f"ctc{str(w).replace('.', 'p')}"
        exp = os.path.join(D, f"exp_si_{tag}")
        if not os.path.exists(os.path.join(exp, "netmodel", "sinet.npz")):
            cfgp = exp + ".config"
            config_lib.save_configfile(
                dict(
                    base_cfg, exp_folder=exp, ctc_loss=float(w),
                    model_ckp=os.path.join(D, "exp_si", "netmodel", "sinet"),
                    max_n_epochs=int(epochs), n_earlystop_epochs=int(epochs),
                ),
                cfgp,
            )
            t0 = time.time()
            print(f"=== fine-tuning {tag} ({epochs} epochs) ===", flush=True)
            summ = loop.train_or_exit(cfgp, corpus_cache=cache)
            out[f"train_{tag}"] = {
                "best_val": summ["best_val"], "best_epoch": summ["best_epoch"],
                "wall_s": round(time.time() - t0, 1),
            }
            print(f"{tag} best_val {summ['best_val']}", flush=True)
        res = gap_sweep.main(D, os.path.join(exp, "netmodel"), asr_ckpt, [1600])
        out[f"gap1600_{tag}"] = res[1600]

    with open(os.path.join(D, "ctc_ladder.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("CTC_LADDER " + json.dumps(out), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    epochs = int(a[0]) if a else 20
    weights = [float(x) for x in a[1:]] or (0.01, 0.05)
    main(epochs, weights)
