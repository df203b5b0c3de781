"""Phase-reconstruction sweep on a trained checkpoint (inference+eval only).

Measures the Griffin-Lim design space end-to-end on MODEL-predicted
magnitudes — the setting that matters for the shipping siasr path — against
the masked baseline on the same utterances:

  - init: zero vs phase-vocoder extrapolation (ops/phase.extrapolate_phase)
  - iterations: 0 / 10 / 30 / 50 / 100 (is the shipping 30 converged?)
  - momentum: 0 vs 0.99 (does fast-GL acceleration pay on hole-blend GL?)
  - hole_mag_relax: 0 / 0.1 / 0.3 (trade model-magnitude fidelity for STFT
    consistency inside the hole — griffin_lim_blend's opt-in knob)

The oracle-phase upper anchor for the same checkpoint lives in the study
JSONs (e.g. informative_full_r3.json); this sweep locates the GL path
within that headroom.  PER is not measured (inpaint-only inference writes
no transcripts); STOI/PESQ/L1 are the columns that move with phase.

Usage: python scripts/phase_study.py [dest] [exp] [n_files] [out_json]
  dest: corpus root (default /dev/shm/informative_full)
  exp:  experiment dir under dest holding netmodel/sinet.npz
  n_files: grouped 16-utt test files to infer on (default 16 = 256 utts)
Prints one ROW line per variant and a final PHASE_STUDY_SUMMARY json.
"""

import json
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    # name, gl_iters, gl_opts
    ("oracle", 0, {"oracle": True}),        # oracle-phase upper anchor
    ("ext_i0", 0, {}),                      # pure extrapolated phase
    ("zero_i30_m99", 30, {"init": "zero"}),  # pre-extrapolation provenance
    ("ext_i10_m99", 10, {}),
    ("ext_i30_m99", 30, {}),                # shipping default
    ("ext_i50_m99", 50, {}),
    ("ext_i100_m99", 100, {}),
    ("ext_i30_m0", 30, {"momentum": 0.0}),
    ("ext_i30_m99_r10", 30, {"hole_mag_relax": 0.1}),
    ("ext_i30_m99_r30", 30, {"hole_mag_relax": 0.3}),
]


def main(dest="/dev/shm/informative_full", exp="exp_av-blstm-ssnn-ctc",
         n_files=16, out_json="phase_study_r3.json"):
    from avsi.eval import harness
    from avsi.infer import inpaint

    si_ckpt = os.path.join(dest, exp, "netmodel")
    grouped_test = os.path.join(dest, "grouped", "test-set")
    test_audio = os.path.join(dest, "syn", "test-set")
    for req in (os.path.join(si_ckpt, "sinet.npz"), grouped_test, test_audio):
        if not os.path.exists(req):
            raise SystemExit(f"missing {req}")

    # subset: first K grouped files (16 utts each), symlinked
    sub = os.path.join(dest, f"phase_study_sub_{n_files}")
    os.makedirs(sub, exist_ok=True)
    linked = sorted(glob(os.path.join(grouped_test, "*.tfrecord")))[:n_files]
    for f in linked:
        link = os.path.join(sub, os.path.basename(f))
        if not os.path.exists(link):
            os.symlink(f, link)

    # count what was actually linked — the glob slice can be shorter than
    # n_files on a small test split, and the artifact must say so
    out = {"dest": dest, "exp": exp, "n_utts": 16 * len(linked)}
    for name, iters, opts in VARIANTS:
        prefix = f"ph_{name}"
        t0 = time.time()
        opts = dict(opts)  # never mutate the module-level VARIANTS entry
        oracle = bool(opts.pop("oracle", False))
        inpaint.infer(
            si_ckpt, sub, test_audio, prefix, norm=True, batch_size=128,
            oracle_phase=oracle,
            phase_recon="gl", gl_iters=iters, gl_opts=opts or None,
        )
        ev = harness.speech_inpainting_eval(
            test_audio, prefix, os.path.join(dest, f"eval_{prefix}"),
            masked_eval=True,
        )
        row = {
            k: list(v) for k, v in ev.items()
            if k.split("_")[0] in ("l1", "stoi", "pesq")
        }
        row["wall_s"] = round(time.time() - t0, 1)
        out[name] = row
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"ROW {name} stoi={row['stoi_enhanced'][0]:.4f} "
              f"pesq={row['pesq_enhanced'][0]:.3f} "
              f"l1={row['l1_enhanced'][0]:.0f}", flush=True)

    print("PHASE_STUDY_SUMMARY " + json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if a else "/dev/shm/informative_full",
        a[1] if len(a) > 1 else "exp_av-blstm-ssnn-ctc",
        int(a[2]) if len(a) > 2 else 16,
        a[3] if len(a) > 3 else "phase_study_r3.json",
    )
