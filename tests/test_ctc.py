"""CTC loss / decode tests."""

import numpy as np

import jax.numpy as jnp

from avsi.ops import ctc


def test_ctc_loss_perfect_alignment_low():
    """Logits that spike the correct path must give near-zero loss."""
    b, t, c = 1, 8, 5  # blank = 4
    labels = np.array([[1, 2, 3]], np.float32)
    path = [1, 4, 2, 4, 3, 4, 4, 4]
    logits = np.full((b, t, c), -20.0, np.float32)
    for i, s in enumerate(path):
        logits[0, i, s] = 20.0
    loss = float(
        ctc.ctc_loss(
            jnp.asarray(logits),
            jnp.asarray([t]),
            jnp.asarray(labels),
            jnp.asarray([3]),
        )
    )
    assert loss < 1e-3, loss


def test_greedy_decode_collapse():
    b, t, c = 1, 6, 4  # blank = 3
    logits = np.full((b, t, c), -10.0, np.float32)
    seq = [0, 0, 3, 1, 1, 2]  # collapses to [0, 1, 2]
    for i, s in enumerate(seq):
        logits[0, i, s] = 10.0
    out = np.asarray(ctc.greedy_decode(jnp.asarray(logits), jnp.asarray([t])))
    np.testing.assert_array_equal(out[0], [0, 1, 2, -1, -1, -1])


def test_greedy_respects_length():
    # frames: [0, blank, 1, | 2, 2, 2]  with length 3 -> decode [0, 1]
    logits = np.full((1, 6, 4), -10.0, np.float32)
    for i, s in enumerate([0, 3, 1, 2, 2, 2]):
        logits[0, i, s] = 10.0
    out = np.asarray(ctc.greedy_decode(jnp.asarray(logits), jnp.asarray([3])))
    np.testing.assert_array_equal(out[0], [0, 1, -1, -1, -1, -1])


def test_beam_search_agrees_with_greedy_on_peaked():
    rng = np.random.RandomState(0)
    t, c = 20, 6
    logits = rng.randn(t, c).astype(np.float32) * 0.1
    path = rng.randint(0, c, t)
    for i, s in enumerate(path):
        logits[i, s] += 15.0
    beam = ctc.beam_search_decode(logits, t, beam_width=20)
    g = np.asarray(
        ctc.greedy_decode(jnp.asarray(logits[None]), jnp.asarray([t]))
    )[0]
    greedy = [int(x) for x in g if x >= 0]
    assert beam == greedy


def test_beam_search_merges_probability_mass():
    """Classic case where beam search beats best-path: repeated mass on a
    label split across alignments."""
    # T=2, C=2 (label 0 has p=0.4 per step, blank p=0.6). Best single path
    # is [blank, blank] (0.36) -> empty, but the three alignments of label
    # '0' ([0,b], [b,0], [0,0]) sum to .4*.6 + .6*.4 + .4*.4 = 0.64
    logits = np.log(np.array([[0.4, 0.6], [0.4, 0.6]], np.float32))
    beam = ctc.beam_search_decode(logits, 2, beam_width=4)
    assert beam == [0]


def test_native_beam_matches_python():
    from avsi.data import native_loader

    if not native_loader.is_available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.RandomState(3)
    for trial in range(5):
        t, c = 40, 8
        logits = (rng.randn(t, c) * 2).astype(np.float32)
        native = native_loader.ctc_beam_search(logits, t, beam_width=16)
        py = ctc._beam_search_decode_py(logits, t, beam_width=16)
        assert native == py, (trial, native, py)


def test_native_beam_matches_python_at_protocol_width():
    """Width 100 (the eval-path default, reference models_asr.py:135):
    the pruned trie decoder must stay exact vs the python reference."""
    from avsi.data import native_loader

    if not native_loader.is_available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.RandomState(11)
    for trial in range(3):
        t, c = 60, 10
        logits = (rng.randn(t, c) * 2).astype(np.float32)
        native = native_loader.ctc_beam_search(logits, t, beam_width=100)
        py = ctc._beam_search_decode_py(logits, t, beam_width=100)
        assert native == py, trial


def test_batch_decode_matches_single():
    rng = np.random.RandomState(7)
    logits = (rng.randn(5, 50, 12) * 2).astype(np.float32)
    lens = np.array([50, 40, 50, 30, 50])
    batch = ctc.beam_search_decode_batch(logits, lens, beam_width=24)
    for i in range(5):
        assert batch[i] == ctc.beam_search_decode(logits[i], int(lens[i]), 24), i


def test_beam_default_improves_or_matches_greedy_mass():
    """On arbitrary logits the width-100 beam's decoded sequence must carry
    at least the CTC probability mass of the greedy collapse."""
    import jax.numpy as jnp

    def seq_logprob(logits, seq):
        # forward algorithm over the expanded blank-interleaved states
        logp = logits - np.logaddexp.reduce(logits, axis=1, keepdims=True)
        blank = logits.shape[1] - 1
        ext = [blank]
        for s in seq:
            ext += [s, blank]
        alpha = np.full(len(ext), -np.inf)
        alpha[0] = logp[0][ext[0]]
        if len(ext) > 1:
            alpha[1] = logp[0][ext[1]]
        for t in range(1, len(logp)):
            prev = alpha.copy()
            for j in range(len(ext)):
                best = prev[j]
                if j >= 1:
                    best = np.logaddexp(best, prev[j - 1])
                if j >= 2 and ext[j] != blank and ext[j] != ext[j - 2]:
                    best = np.logaddexp(best, prev[j - 2])
                alpha[j] = best + logp[t][ext[j]]
        return np.logaddexp(alpha[-1], alpha[-2]) if len(ext) > 1 else alpha[-1]

    rng = np.random.RandomState(21)
    for trial in range(4):
        logits = (rng.randn(40, 8) * 1.5).astype(np.float32)
        g = ctc.greedy_decode(jnp.asarray(logits[None]), jnp.asarray([40]))
        greedy = [int(x) for x in np.asarray(g)[0] if x >= 0]
        beam = ctc.beam_search_decode(logits, 40, beam_width=100)
        assert seq_logprob(logits, beam) >= seq_logprob(logits, greedy) - 1e-9, trial


def test_edit_distance_and_per():
    assert ctc.edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert ctc.edit_distance([1, 2, 3], [1, 3]) == 1
    assert ctc.edit_distance([], [1, 2]) == 2
    per = ctc.per_metric([[1, 2], [1]], [[1, 2], [1, 2]])
    assert abs(per - 0.25) < 1e-9


def test_ctc_loss_per_seq_matches_mean():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(4, 20, 6).astype(np.float32))
    lengths = jnp.asarray([20, 15, 10, 5])
    labels = jnp.asarray(rng.randint(0, 5, size=(4, 8)))
    lab_lens = jnp.asarray([8, 4, 3, 1])
    per_seq = ctc.ctc_loss_per_seq(logits, lengths, labels, lab_lens)
    assert per_seq.shape == (4,)
    assert np.isfinite(np.asarray(per_seq)).all()
    mean = ctc.ctc_loss(logits, lengths, labels, lab_lens)
    np.testing.assert_allclose(float(mean), float(np.mean(np.asarray(per_seq))), rtol=1e-6)
