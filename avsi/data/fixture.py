"""Synthetic GRID-like corpus generator for CI and local end-to-end runs.

The reference has no test assets (SURVEY.md §4); this builds a miniature
corpus with the exact on-disk layout the toolchain consumes: per-speaker
clean wavs + landmarks + phoneme transcriptions + video stats, from which
`create_syn_dataset` -> `create_dataset` produce the TFRecord splits.

Audio is a sum of vowel-like harmonics with amplitude modulation so the
spectrograms have structure worth inpainting; landmarks are smooth random
walks with a 'mouth' band correlated with the audio envelope.
"""

from __future__ import annotations

import os
import zlib

import numpy as np

from avsi.data import generator
from avsi.utils import wav as wavio

PHONEME_SET = [
    "ah", "ao", "ay", "b", "d", "eh", "ey", "f", "g", "ih",
    "iy", "k", "l", "m", "n", "ow", "p", "r", "s", "t",
    "th", "uw", "v", "w", "y", "z", "aa", "ae", "er", "hh",
    "jh", "sh", "ch",
]  # 33 classes like GRID


def make_fixture(
    dest_dir: str,
    n_speakers: int = 2,
    n_samples: int | tuple = 4,
    audio_len_ms: int = 3000,
    sample_rate: int = 16000,
    seed: int = 0,
    splits=("training-set", "validation-set", "test-set"),
    gap_ms: float = 800.0,
    gap_std_ms: float = 100.0,
    n_max_intr: int = 1,
    with_embeddings: bool = False,
    video_informative: bool = False,
    mask_hop_ms: int = 12,
    mask_frame_dim: int = 257,
    mask_kind: str = "timegap",
    raw_only: bool = False,
) -> dict:
    """Build raw corpus + masked sample dirs + tfrecords. Returns paths.

    raw_only=True stops after the raw wav/landmark/align tree (no masked
    sample dirs, no tfrecords) for consumers that re-mask the raw set
    themselves (e.g. scripts/unet_anchor.py's ensure_raw); the raw tree is
    bit-identical to the full build's (the rng draws happen in the same
    order) and the returned dict then has only `raw` and `dictionary`.

    video_informative=True gives each phoneme a distinct mouth-landmark
    configuration so visual features carry phoneme identity (needed for
    AV > A comparisons; default False keeps earlier corpora reproducible —
    there the mouth band tracks only the loudness envelope).

    n_samples may be a per-split tuple (e.g. (880, 60, 60) for a
    GRID-scale 29k/2k/2k utterance split) or a single int applied to
    every split."""
    rng = np.random.default_rng(seed)
    raw = os.path.join(dest_dir, "raw")
    n_wav = audio_len_ms * sample_rate // 1000

    # dictionary file
    dict_file = os.path.join(dest_dir, "dictionary.txt")
    os.makedirs(dest_dir, exist_ok=True)
    with open(dict_file, "w") as f:
        f.write(" ".join(PHONEME_SET) + "\n")

    counts = (
        tuple(n_samples) if isinstance(n_samples, (tuple, list)) else (n_samples,) * len(splits)
    )
    if len(counts) != len(splits):
        raise ValueError(f"n_samples {counts} does not match splits {splits}")
    # DISJOINT utterances per split: split k uses the next counts[k]
    # utterance indices — evaluation is genuinely held out
    total_utts = sum(counts)
    offsets = [sum(counts[:k]) for k in range(len(splits))]
    split_names = {
        split: [f"utt{offsets[k] + i:03d}" for i in range(counts[k])]
        for k, split in enumerate(splits)
    }

    for spk in range(1, n_speakers + 1):
        audio_dir = os.path.join(raw, f"s{spk}", f"s{spk}_16kHz")
        lm_dir = os.path.join(raw, f"s{spk}", f"s{spk}.landmarks")
        align_dir = os.path.join(raw, f"s{spk}", "align")
        for d in (audio_dir, lm_dir, align_dir):
            os.makedirs(d, exist_ok=True)
        base_lm = rng.normal(0, 1, size=(68, 2))
        all_lm = []
        for i in range(total_utts):
            name = f"utt{i:03d}"
            t = np.arange(n_wav) / sample_rate
            env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(1.5, 3.5) * t + rng.uniform(0, 6))

            # phoneme-dependent audio: the utterance is a sequence of
            # segments whose fundamental + formant encode the phoneme id,
            # so the CTC/ASR models have something learnable to latch onto
            n_ph = int(rng.integers(4, 9))
            ph_ids = rng.integers(0, len(PHONEME_SET), size=n_ph)
            bounds = np.linspace(0, n_wav, n_ph + 1).astype(int)
            sig = np.zeros(n_wav)
            for ph, lo, hi in zip(ph_ids, bounds[:-1], bounds[1:]):
                seg_t = t[lo:hi]
                f0 = 100.0 + 6.0 * float(ph)
                formant = 700.0 + 90.0 * float(ph)
                seg = sum(
                    np.sin(2 * np.pi * f0 * k * seg_t + rng.uniform(0, 6)) / k
                    for k in range(1, 5)
                ) + 0.5 * np.sin(2 * np.pi * formant * seg_t + rng.uniform(0, 6))
                # short raised-cosine fades avoid clicks at segment joins
                fade = min(160, (hi - lo) // 4)
                w = np.ones(hi - lo)
                if fade > 0:
                    ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(fade) / fade)
                    w[:fade] = ramp
                    w[-fade:] = ramp[::-1]
                sig[lo:hi] = seg * w
            wave = 6000 * env * sig + 50 * rng.normal(size=n_wav)
            wavio.write_wav_int16(os.path.join(audio_dir, name + ".wav"), wave)

            # smooth landmark random walk; mouth rows track the envelope
            steps = rng.normal(0, 0.02, size=(75, 68, 2)).cumsum(axis=0)
            lm = base_lm[None] + steps
            env75 = np.interp(np.linspace(0, n_wav - 1, 75), np.arange(n_wav), env)
            lm[:, 48:68, 1] += 0.3 * env75[:, None]
            if video_informative:
                # per-phoneme mouth configuration: each of the 20 mouth
                # landmarks gets a deterministic offset pattern per phoneme
                ph75 = ph_ids[
                    np.minimum((np.arange(75) * n_ph) // 75, n_ph - 1)
                ]
                for m in range(20):
                    lm[:, 48 + m, 0] += 0.25 * np.sin(
                        2.1 * ph75 + 0.7 * m
                    )
                    lm[:, 48 + m, 1] += 0.25 * np.cos(
                        1.3 * ph75 + 0.9 * m
                    )
            np.save(os.path.join(lm_dir, name + ".npy"), lm.reshape(75, 136))
            all_lm.append(lm.reshape(75, 136))

            phs = [PHONEME_SET[p] for p in ph_ids]
            with open(os.path.join(align_dir, name + ".lbl"), "w") as f:
                f.write(",".join(phs))
        stacked = np.concatenate(all_lm, axis=0)
        mv = np.zeros_like(stacked)
        mv[1:] = stacked[1:] - stacked[:-1]
        np.save(os.path.join(lm_dir, "video_feat_mean.npy"), mv.mean(axis=0))
        np.save(os.path.join(lm_dir, "video_feat_std.npy"), mv.std(axis=0) + 1e-3)

    # masked sample dirs per split (disjoint utterances, distinct mask
    # seeds), then tfrecords
    out = {"raw": raw, "dictionary": dict_file}
    if raw_only:
        return out
    for k, split in enumerate(splits):
        split_dir = os.path.join(dest_dir, "syn", split)
        generator.create_syn_dataset(
            raw,
            split_dir,
            speakers=list(range(1, n_speakers + 1)),
            n_samples=0,
            audio_len=audio_len_ms,
            n_max_intr=n_max_intr,
            cov_mean=gap_ms,
            cov_std=gap_std_ms,
            seed=30 + k,
            utterance_names=split_names[split],
            mask_hop_ms=mask_hop_ms,
            mask_frame_dim=mask_frame_dim,
            mask_kind=mask_kind,
        )
        out[split] = split_dir
        if with_embeddings:
            # speaker-consistent 512-d "VGG" embeddings (tfrecord_emb_utils
            # reads <sample>/vgg_embeddings/target.npy)
            from glob import glob as _glob

            for sd in _glob(os.path.join(split_dir, "*")):
                if not os.path.isdir(sd):
                    continue
                spk = os.path.basename(sd).split("_")[0]
                # zlib.crc32, NOT hash(): str hash is randomized per
                # process (PYTHONHASHSEED), which would break the fixture's
                # seed-determinism across rebuilds
                spk_rng = np.random.default_rng(zlib.crc32(spk.encode()))
                emb = spk_rng.normal(size=512) + 0.05 * rng.normal(size=512)
                emb_dir = os.path.join(sd, "vgg_embeddings")
                os.makedirs(emb_dir, exist_ok=True)
                np.save(os.path.join(emb_dir, "target.npy"), emb.astype(np.float32))
    generator.create_dataset(
        os.path.join(dest_dir, "syn"), os.path.join(dest_dir, "tfrecords"), dict_file,
        with_embedding=with_embeddings,
    )
    out["tfrecords"] = os.path.join(dest_dir, "tfrecords")
    out["audio"] = os.path.join(dest_dir, "syn")
    return out
