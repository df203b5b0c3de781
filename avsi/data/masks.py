"""Random time-gap intrusion mask synthesis.

Reimplements the sampling scheme of
`/root/reference/av_speech_inpainting/dataset_generator.py:11-48` with
numpy's Generator API: 1..n_max intrusions, total coverage ~ N(mu, sigma)
clipped to [min_len*n/len, 0.8], per-intrusion lengths drawn with the same
exponential shrink factor, onsets non-overlapping with >=1 frame spacing.
Masks are (spec_len, frame_dim) float32 with zeros in the gaps.

Documented deviation (reference-bug policy, SURVEY.md §7.3 #5): the
reference's LAST-intrusion onset draw (dataset_generator.py:39) samples
from [prev_onset, prev_onset + prev_len + 1 + spec_len - len], which can
overlap the previous intrusion or run past the end of the utterance (the
overflow is silently clipped by the array write), shrinking the effective
coverage below the sampled value.  Here all onsets are kept disjoint and
in-bounds, so the realized coverage matches the sampled coverage — the
property the generator's own bookkeeping (true_mask_cov) assumes.
"""

from __future__ import annotations

import numpy as np


def get_intrusions_mask(
    rng: np.random.Generator,
    frame_dim: int,
    spec_len: int,
    cov_mean: float,
    cov_std: float,
    n_max_intr: int,
    min_intr_len: int = 3,
):
    """Sample one binary time-gap mask. Returns (mask, true_coverage, n_intr)."""
    n_intr = int(rng.integers(1, n_max_intr + 1))

    mask_cov = max(
        min_intr_len * n_intr / spec_len,
        min(rng.normal(cov_mean, cov_std) if cov_std > 0 else cov_mean, 0.8),
    )
    mask_bins = int(np.around(spec_len * mask_cov))
    true_mask_cov = mask_bins / spec_len

    shrink = np.exp(-(n_intr - 1) / 6)
    intr_lens: list[int] = []
    for i in range(n_intr):
        if i == n_intr - 1:
            intr_lens.append(mask_bins - sum(intr_lens))
        else:
            remaining = mask_bins - sum(intr_lens) - min_intr_len * (n_intr - i - 1)
            hi = max(min_intr_len, int(remaining * shrink))
            intr_lens.append(int(rng.integers(min_intr_len, hi + 1)))
    intr_lens = list(rng.permutation(intr_lens))

    onset_pos: list[int] = []
    for i, _l in enumerate(intr_lens):
        if i == 0 and i == n_intr - 1:
            onset_pos.append(int(rng.integers(0, spec_len - mask_bins + 1)))
        elif i == 0:
            onset_pos.append(int(rng.integers(0, spec_len - mask_bins - (n_intr - 1) + 1)) // 2)
        elif i == n_intr - 1:
            lo = onset_pos[-1] + intr_lens[i - 1] + 1
            hi = spec_len - intr_lens[i]  # last onset anywhere in-bounds
            onset_pos.append(int(rng.integers(lo, hi + 1)))
        else:
            lo = onset_pos[-1] + intr_lens[i - 1] + 1
            hi = (lo + spec_len - sum(intr_lens[i:]) - (n_intr - i - 1)) // 2
            onset_pos.append(int(rng.integers(lo, max(lo, hi) + 1)))

    mask = np.ones([spec_len, frame_dim], dtype=np.float32)
    for onset, length in zip(onset_pos, intr_lens):
        mask[onset : onset + length] = 0.0

    return mask, true_mask_cov, n_intr


def get_freeform_mask(
    rng: np.random.Generator,
    frame_dim: int,
    spec_len: int,
    cov_mean: float,
    cov_std: float,
    thick_max: int = 8,
):
    """Sample one binary FREE-FORM T-F hole mask (avsi extension).

    Not in the reference, whose corpus only ever zeroes full-band time
    gaps (dataset_generator.py:11-48).  Irregular holes — random-walk
    "strokes" of varying thickness in the (time, frequency) plane, the
    regime Liu et al. 2018 (arXiv 1804.07723) designed partial
    convolutions for — give the `unet-pconv` twin an on-design evaluation
    (scripts/unet_anchor.py --mask freeform).  The serialized schema is
    unchanged: every consumer (models, masking baseline, Griffin-Lim
    known-phase clamp, eval) is already per-(frame, bin).

    Coverage ~ N(cov_mean, cov_std) clipped to [0.02, 0.8]; strokes are
    drawn until the target is reached.  Returns (mask, true_coverage,
    n_strokes) with mask (spec_len, frame_dim) float32, zeros in holes.
    """
    target = float(
        np.clip(rng.normal(cov_mean, cov_std) if cov_std > 0 else cov_mean, 0.02, 0.8)
    )
    hole = np.zeros((spec_len, frame_dim), dtype=bool)
    total = hole.size
    n_strokes = 0
    covered = 0  # tracked incrementally: a full-grid hole.sum() per walk
    # step would be O(T*F) x thousands of steps per corpus
    while covered < target * total:
        n_strokes += 1
        t = int(rng.integers(0, spec_len))
        f = int(rng.integers(0, frame_dim))
        ht = int(rng.integers(1, thick_max + 1))  # half-thickness per axis
        hf = int(rng.integers(1, thick_max + 1))
        for _ in range(int(rng.integers(8, 40))):
            rect = hole[max(0, t - ht) : t + ht + 1, max(0, f - hf) : f + hf + 1]
            covered += rect.size - int(rect.sum())
            rect[...] = True
            if covered >= target * total:
                break
            t = int(np.clip(t + rng.integers(-3, 4), 0, spec_len - 1))
            f = int(np.clip(f + rng.integers(-3, 4), 0, frame_dim - 1))
    mask = (~hole).astype(np.float32)
    return mask, covered / total, n_strokes
