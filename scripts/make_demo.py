"""Generate a static demo page (reference docs/ equivalent, C30).

Walks sample dirs that already contain target.wav / masked.wav /
enhanced/<prefix>.wav, renders log-spectrogram PNGs with the framework's
own DSP + PNG encoder, and writes a self-contained docs/index.html.

Usage: python scripts/make_demo.py <audio_dir> <prefix> [out_dir] [n_examples]
"""

import html
import os
import shutil
import sys
from glob import glob

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from avsi.ops import stft as stft_ops  # noqa: E402
from avsi.train.tb import _png_grayscale  # noqa: E402
from avsi.utils import wav as wavio  # noqa: E402


def spec_png(wav_path: str, out_path: str) -> None:
    _, wave = wavio.read_wav_int16(wav_path)
    logmag, _, _ = stft_ops.log_magnitude_spectrogram(wave[None])
    img = np.asarray(logmag[0]).T[::-1]
    lo, hi = img.min(), img.max()
    img8 = ((img - lo) / (hi - lo + 1e-9) * 255).astype(np.uint8)
    with open(out_path, "wb") as f:
        f.write(_png_grayscale(img8))


def main(audio_dir: str, prefix: str, out_dir: str = "docs", n_examples: int = 4):
    os.makedirs(out_dir, exist_ok=True)
    files_dir = os.path.join(out_dir, "files")
    rows = []
    sample_dirs = sorted(
        d for d in glob(os.path.join(audio_dir, "*")) if os.path.isdir(d)
    )[:n_examples]
    for i, d in enumerate(sample_dirs):
        ex = f"ex{i}"
        ex_dir = os.path.join(files_dir, ex)
        os.makedirs(ex_dir, exist_ok=True)
        cells = []
        for kind, path in (
            ("target", os.path.join(d, "target.wav")),
            ("masked", os.path.join(d, "masked.wav")),
            ("inpainted", os.path.join(d, "enhanced", prefix + ".wav")),
        ):
            if not os.path.isfile(path):
                cells.append(f"<td>{kind}: n/a</td>")
                continue
            shutil.copy(path, os.path.join(ex_dir, kind + ".wav"))
            spec_png(path, os.path.join(ex_dir, kind + ".png"))
            cells.append(
                f"<td><b>{kind}</b><br>"
                f'<img src="files/{ex}/{kind}.png" width="300"><br>'
                f'<audio controls src="files/{ex}/{kind}.wav"></audio></td>'
            )
        rows.append(
            f"<tr><td>{html.escape(os.path.basename(d))}</td>{''.join(cells)}</tr>"
        )
    page = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>avsi — audio-visual speech inpainting demo</title></head><body>"
        "<h1>Audio-Visual Speech Inpainting (TPU-native) — examples</h1>"
        f"<p>Model output prefix: <code>{html.escape(prefix)}</code></p>"
        "<table border='1' cellpadding='6'>" + "".join(rows) + "</table>"
        "</body></html>"
    )
    with open(os.path.join(out_dir, "index.html"), "w") as f:
        f.write(page)
    print(f"Demo page: {out_dir}/index.html ({len(rows)} examples)")


if __name__ == "__main__":
    main(
        sys.argv[1],
        sys.argv[2],
        sys.argv[3] if len(sys.argv) > 3 else "docs",
        int(sys.argv[4]) if len(sys.argv) > 4 else 4,
    )
