"""Generate a static demo page (reference docs/ equivalent, C30).

Two modes:
  * single-model (original): walks sample dirs that already contain
    target.wav / masked.wav / enhanced/<prefix>.wav and writes one table.
  * grid (`build_grid`, round 4 — r3 verdict item #7): mirrors the
    reference's published structure `docs/_site/files/{800ms,1600ms}/
    ex{1,2}` with BOTH the audio-only and audio-visual MTL models
    (`ao_mtl` = a-blstm-ssnn-ctc, `av_mtl` = av-blstm-ssnn-ctc) per
    example, plus spec_*.png renders and the 4-line transcriptions.txt
    (ground truth / masked / AO-MTL / AV-MTL) — see scripts/demo_grid.py
    for the pipeline that trains the models and builds the samples.

Renders log-spectrogram PNGs with the framework's own DSP + PNG encoder;
the page is self-contained static HTML.

Usage: python scripts/make_demo.py <audio_dir> <prefix> [out_dir] [n_examples]
"""

import html
import os
import shutil
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from avsi.ops import stft as stft_ops
from avsi.train.tb import _png_grayscale
from avsi.utils import wav as wavio


def spec_png(wav_path: str, out_path: str) -> None:
    _, wave = wavio.read_wav_int16(wav_path)
    logmag, _, _ = stft_ops.log_magnitude_spectrogram(wave[None])
    img = np.asarray(logmag[0]).T[::-1]
    lo, hi = img.min(), img.max()
    img8 = ((img - lo) / (hi - lo + 1e-9) * 255).astype(np.uint8)
    with open(out_path, "wb") as f:
        f.write(_png_grayscale(img8))


def _read_lbl(path: str) -> str:
    if not os.path.isfile(path):
        return "n/a"
    with open(path) as f:
        return f.read().strip()


def build_grid(examples, out_dir: str = "docs"):
    """examples: list of dicts with keys gap ('800ms'/'1600ms'), ex
    ('ex1'/'ex2'), sample_dir (holds target.wav, masked.wav, masked.lbl,
    transcription.lbl, enhanced/{ao_mtl,av_mtl}.wav,
    transcriptions/{ao_mtl,av_mtl}.lbl)."""
    files_dir = os.path.join(out_dir, "files")
    sections: dict = {}
    for e in examples:
        gap, ex, d = e["gap"], e["ex"], e["sample_dir"]
        ex_dir = os.path.join(files_dir, gap, ex)
        os.makedirs(ex_dir, exist_ok=True)
        kinds = (
            ("target", os.path.join(d, "target.wav")),
            ("masked", os.path.join(d, "masked.wav")),
            ("ao_mtl", os.path.join(d, "enhanced", "ao_mtl.wav")),
            ("av_mtl", os.path.join(d, "enhanced", "av_mtl.wav")),
        )
        cells = []
        for kind, path in kinds:
            if not os.path.isfile(path):
                cells.append(f"<td>{kind}: n/a</td>")
                continue
            shutil.copy(path, os.path.join(ex_dir, kind + ".wav"))
            spec_png(path, os.path.join(ex_dir, f"spec_{kind}.png"))
            rel = f"files/{gap}/{ex}"
            cells.append(
                f"<td><b>{kind}</b><br>"
                f'<img src="{rel}/spec_{kind}.png" width="260"><br>'
                f'<audio controls src="{rel}/{kind}.wav"></audio></td>'
            )
        trans = [
            ("Ground truth ARPABET", _read_lbl(os.path.join(d, "transcription.lbl"))),
            ("Transcription masked ARPABET", _read_lbl(os.path.join(d, "masked.lbl"))),
            ("Transcription AO-MTL ARPABET",
             _read_lbl(os.path.join(d, "transcriptions", "ao_mtl.lbl"))),
            ("Transcription AV-MTL ARPABET",
             _read_lbl(os.path.join(d, "transcriptions", "av_mtl.lbl"))),
        ]
        with open(os.path.join(ex_dir, "transcriptions.txt"), "w") as f:
            f.write("".join(f"{k}: {v}\n" for k, v in trans))
        tr_html = "<br>".join(
            f"<b>{html.escape(k)}</b>: <code>{html.escape(v)}</code>"
            for k, v in trans
        )
        sections.setdefault(gap, []).append(
            f"<tr><td>{ex}</td>{''.join(cells)}</tr>"
            f"<tr><td></td><td colspan='4'>{tr_html}</td></tr>"
        )
    body = []
    for gap in sorted(sections):
        body.append(f"<h2>Gap size {html.escape(gap)}</h2>")
        body.append("<table border='1' cellpadding='6'>" + "".join(sections[gap]) + "</table>")
    page = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>avsi — audio-visual speech inpainting demo</title></head><body>"
        "<h1>Audio-Visual Speech Inpainting (TPU-native) — examples</h1>"
        "<p>Models: <code>ao_mtl</code> = a-blstm-ssnn-ctc (audio-only MTL), "
        "<code>av_mtl</code> = av-blstm-ssnn-ctc (audio-visual MTL); "
        "synthetic GRID-like corpus with phoneme-informative video.</p>"
        + "".join(body) + "</body></html>"
    )
    with open(os.path.join(out_dir, "index.html"), "w") as f:
        f.write(page)
    print(f"Demo grid page: {out_dir}/index.html ({len(examples)} examples)")


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
    # CLI-only: the page renders a handful of spectrograms — not worth a
    # remote TPU compile.  Importers (demo_grid.py) keep their platform.
    import jax

    jax.config.update("jax_platforms", "cpu")
    main(
        sys.argv[1],
        sys.argv[2],
        sys.argv[3] if len(sys.argv) > 3 else "docs",
        int(sys.argv[4]) if len(sys.argv) > 4 else 4,
    )
