"""Score the fixed probe battery with the native P.862 model AND an
external ITU binary; report per-probe deltas and the refit calibration
gain (avsi/eval/pesq_conformance.py — r4 verdict Next #5).

Usage:
  python scripts/pesq_conformance.py --pesq_path /path/to/pesq [--mode nb]
  PESQ_BIN=/path/to/pesq python scripts/pesq_conformance.py

Writes pesq_conformance.json next to the repo root and prints the report.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pesq_path", default=os.environ.get("PESQ_BIN", ""))
    ap.add_argument("--mode", default="nb", choices=["nb", "wb"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pesq_conformance.json"))
    args = ap.parse_args()
    if not args.pesq_path:
        raise SystemExit(
            "no binary: pass --pesq_path or set PESQ_BIN (the harness "
            "exists so conformance is one command the day a P.862 binary "
            "is reachable)"
        )

    from avsi.eval import pesq_conformance

    report = pesq_conformance.run(args.pesq_path, mode=args.mode)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
