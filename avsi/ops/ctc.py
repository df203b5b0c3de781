"""CTC loss, greedy decode (on device) and beam-search decode (host).

Reference uses `tf.nn.ctc_loss` (blank = num_classes-1, merge_repeated)
and `tf.nn.ctc_beam_search_decoder` with beam width 20 (MTL models,
models.py:1627,1641) / 100 (standalone ASR, models_asr.py:135).  Here:

  * loss: `optax.ctc_loss` — a pure-JAX forward-backward that runs on
    device inside the jitted train step (blank remapped to the TF
    last-class convention);
  * greedy decode: jittable argmax + collapse, used during training/eval
    loops (the reference decoded with beam search EVERY training step, a
    large inefficiency we do not reproduce — SURVEY.md §3.1);
  * beam search: numpy implementation for final eval parity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax


def ctc_loss_per_seq(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
) -> jax.Array:
    """Per-sequence CTC negative log-likelihood, shape (B,).

    logits: (B, T, C) with blank as the LAST class (TF convention).
    labels: (B, L) int class ids in [0, C-1).
    """
    b, t, _ = logits.shape
    l = labels.shape[1]
    logit_paddings = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(jnp.float32)
    label_paddings = (jnp.arange(l)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    return optax.ctc_loss(
        logits,
        logit_paddings,
        labels.astype(jnp.int32),
        label_paddings,
        blank_id=logits.shape[-1] - 1,
    )


def ctc_loss(
    logits: jax.Array,
    logit_lengths: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
) -> jax.Array:
    """Mean CTC negative log-likelihood (see ctc_loss_per_seq)."""
    return jnp.mean(ctc_loss_per_seq(logits, logit_lengths, labels, label_lengths))


def greedy_decode(logits: jax.Array, logit_lengths: jax.Array) -> jax.Array:
    """Best-path decode: argmax, collapse repeats, drop blanks.

    Returns (B, T) int32 padded with -1 (same convention as the reference's
    dense decoding with default_value=-1, models.py:1629).
    """
    b, t, c = logits.shape
    blank = c - 1
    best = jnp.argmax(logits, axis=-1)  # (B, T)
    valid = jnp.arange(t)[None, :] < logit_lengths[:, None]
    prev = jnp.pad(best[:, :-1], ((0, 0), (1, 0)), constant_values=blank)
    keep = (best != blank) & (best != prev) & valid
    # stable left-pack of kept symbols
    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(best, order, axis=1)
    counts = keep.sum(axis=1)
    out = jnp.where(jnp.arange(t)[None, :] < counts[:, None], packed, -1)
    return out.astype(jnp.int32)


def beam_search_decode(
    logits: np.ndarray, logit_length: int, beam_width: int = 20
) -> list[int]:
    """CTC prefix beam search for ONE sequence (host-side eval only).

    logits: (T, C), blank last. Returns the best label sequence.
    Matches tf.nn.ctc_beam_search_decoder semantics (merge_repeated=True in
    the beam scoring sense: probability mass accumulated per prefix).
    Uses the native C++ decoder (native/avsi_ctc.cc) when available — the
    reference's decode is likewise a C++ TF op; pure-python fallback below.
    """
    from avsi.data import native_loader

    native = native_loader.ctc_beam_search(
        np.asarray(logits, np.float32), int(logit_length), beam_width
    )
    if native is not None:
        return native
    return _beam_search_decode_py(logits, logit_length, beam_width)


def beam_search_decode_batch(
    logits: np.ndarray, logit_lengths, beam_width: int = 20,
    num_threads: int = 0,
) -> list[list[int]]:
    """Batched prefix beam search (host-side eval).

    logits: (B, T, C), blank last. Uses the threaded native decoder
    (native/avsi_ctc.cc avsi_ctc_beam_search_batch) when available, else
    falls back to per-sequence decode.
    """
    from avsi.data import native_loader

    logits = np.asarray(logits, np.float32)
    native = native_loader.ctc_beam_search_batch(
        logits, np.asarray(logit_lengths, np.int64), beam_width,
        num_threads=num_threads,
    )
    if native is not None:
        return native
    return [
        beam_search_decode(logits[i], int(logit_lengths[i]), beam_width)
        for i in range(len(logits))
    ]


def _beam_search_decode_py(
    logits: np.ndarray, logit_length: int, beam_width: int = 20
) -> list[int]:
    t_len, c = logits.shape
    blank = c - 1
    logp = logits - _logsumexp(logits, axis=-1, keepdims=True)

    # beams: prefix tuple -> (logp_blank, logp_nonblank)
    beams = {(): (0.0, -np.inf)}
    for t in range(min(t_len, logit_length)):
        new_beams: dict = {}
        lp = logp[t]
        for prefix, (pb, pnb) in beams.items():
            p_total = np.logaddexp(pb, pnb)
            # extend with blank
            _acc(new_beams, prefix, lp[blank] + p_total, -np.inf)
            # repeat last symbol (merges into non-blank mass)
            if prefix:
                _acc(new_beams, prefix, -np.inf, lp[prefix[-1]] + pnb)
            # extend with new symbol
            for s in range(c - 1):
                p_ext = lp[s] + (pb if prefix and s == prefix[-1] else p_total)
                _acc(new_beams, prefix + (s,), -np.inf, p_ext)
        items = sorted(
            new_beams.items(), key=lambda kv: -np.logaddexp(kv[1][0], kv[1][1])
        )
        beams = dict(items[:beam_width])
    best = max(beams.items(), key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]))[0]
    return list(best)


def _acc(beams: dict, prefix: tuple, pb: float, pnb: float) -> None:
    old_pb, old_pnb = beams.get(prefix, (-np.inf, -np.inf))
    beams[prefix] = (np.logaddexp(old_pb, pb), np.logaddexp(old_pnb, pnb))


def _logsumexp(x, axis=None, keepdims=False):
    m = np.max(x, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis=axis)


def edit_distance(a: list[int], b: list[int]) -> int:
    """Levenshtein distance (replaces the `editdistance` package)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def per_metric(decoded: list[list[int]], labels: list[list[int]]) -> float:
    """Phoneme error rate: mean(edit_distance / label_len) like
    tf.edit_distance(normalize=True) (models_asr.py:179-184)."""
    rates = [
        edit_distance(d, l) / max(1, len(l)) for d, l in zip(decoded, labels)
    ]
    return float(np.mean(rates)) if rates else float("nan")
