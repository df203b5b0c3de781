"""Gap-attenuation postfilter (`--gap_atten`, avsi/ops/postfilter.py).

Contract: gain depends only on the frame's distance to the nearest known
frame — 1.0 up to `trust` frames deep (every gap <= 2*trust frames is
bit-identical, i.e. the whole <=800 ms reference protocol), linear ramp to
`alpha` over `ramp` frames; the magnitude scale is applied on GAP bins
only, in normalized log-magnitude space.
"""

import numpy as np

import jax
import jax.numpy as jnp

from avsi.ops import postfilter as pf

from helpers import identity_stats, synth_batch, tiny_config


def _depth_np(fk):
    t = len(fk)
    big = 10**6
    d = np.full(t, big)
    for i in range(t):
        for j in range(t):
            if fk[j] > 0.5:
                d[i] = min(d[i], abs(i - j))
    return d


def test_gap_depth_matches_bruteforce():
    rng = np.random.default_rng(0)
    fk = (rng.random((3, 40)) > 0.4).astype(np.float32)
    fk[1, :] = 1.0          # no gaps
    fk[2, :] = 0.0          # all gap: depth saturates large
    got = np.asarray(pf.gap_depth(jnp.asarray(fk)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], _depth_np(fk[b]))
    assert np.all(got[2] >= 10**5)


def test_gain_plateau_ramp_floor():
    fk = np.ones(120, np.float32)
    fk[10:110] = 0.0  # 100-frame gap, depth up to 50
    g = np.asarray(pf.gap_attenuation_gain(
        jnp.asarray(fk)[None], alpha=0.25, trust=34, ramp=16))[0]
    depth = _depth_np(fk)
    np.testing.assert_array_equal(g[depth <= 34], 1.0)
    np.testing.assert_allclose(g[depth >= 50], 0.25, atol=1e-6)
    mid = (depth > 34) & (depth < 50)
    assert np.all((g[mid] > 0.25) & (g[mid] < 1.0))
    # monotone in depth
    order = np.argsort(depth)
    assert np.all(np.diff(g[order]) <= 1e-6)


def test_short_gaps_bit_identical():
    """An 800 ms single hole (67 frames -> max depth 33) is untouched at
    the default trust=34 — the <=800 ms protocol cannot change."""
    fk = np.ones(250, np.float32)
    fk[50:117] = 0.0
    g = np.asarray(pf.gap_attenuation_gain(
        jnp.asarray(fk)[None], alpha=0.0, trust=34, ramp=16))[0]
    np.testing.assert_array_equal(g, np.ones_like(g))


def test_apply_confined_to_gap_bins():
    config = tiny_config(model="a-blstm", audio_len=4800, net_dim=(8, 8))
    batch = synth_batch(config, batch_size=1, seed=1, gap=(2, 23))  # 21 deep-ish
    masks = np.asarray(batch["masks"])
    f = masks.shape[-1]
    rng = np.random.default_rng(2)
    pred = rng.normal(size=(1, masks.shape[1], f)).astype(np.float32)
    stats = identity_stats()
    stats_j = (jnp.asarray(stats[0][:f]), jnp.asarray(stats[1][:f]))
    out = pf.apply_gap_attenuation(
        {"prediction": jnp.asarray(pred)}, batch, stats_j,
        alpha=0.1, trust=2, ramp=3,
    )
    got = np.asarray(out["prediction"])
    known = masks > 0.5
    np.testing.assert_array_equal(got[known], pred[known])
    # deep gap bins: magnitude scaled by exactly alpha (identity stats:
    # std == 1, so the log shift is log(alpha))
    fk = masks.min(-1)[0]
    depth = _depth_np(fk)
    deep = (depth >= 5) & (fk < 0.5)
    np.testing.assert_allclose(
        got[0][deep], pred[0][deep] + np.log(0.1), atol=1e-5
    )


def test_infer_step_gap_atten_wiring():
    """make_infer_step(gap_atten=...): a short gap is bit-identical to the
    unfiltered step; a deep gap changes."""
    from avsi.infer.inpaint import make_infer_step
    from avsi.models import blstm as blstm_lib, registry

    config = tiny_config(model="a-blstm", audio_len=4800, net_dim=(16, 16))
    spec = blstm_lib.parse_model_name("a-blstm")
    params = blstm_lib.init(jax.random.PRNGKey(3), config, spec)
    # large log-mean so the denormalized magnitude lands at int16 scale
    # (random params predict ~0 in normalized space; with identity stats the
    # waveform would be O(1) and the step's int16 output all-zero)
    stats = (np.full(257, np.log(2e4), np.float32), np.ones(257, np.float32))
    model = registry.get_model(config["model"])
    ga = {"alpha": 0.1, "trust": 3, "ramp": 2}
    plain = jax.jit(make_infer_step(model, config, stats, False, "none", 0))
    filt = jax.jit(make_infer_step(model, config, stats, False, "none", 0,
                                   gap_atten=ga))
    def _b(gap):  # int16-scale so the step's int16 output is non-vacuous
        b = synth_batch(config, batch_size=1, seed=5, gap=gap)
        return dict(b, target_sources=b["target_sources"] * jnp.float32(2e4))

    short = _b((10, 15))  # depth <= 2
    deep = _b((5, 22))    # depth up to 8
    np.testing.assert_array_equal(
        np.asarray(plain(params, short)[0]), np.asarray(filt(params, short)[0])
    )
    assert not np.array_equal(
        np.asarray(plain(params, deep)[0]), np.asarray(filt(params, deep)[0])
    )


def test_cli_gap_atten_default_off():
    from avsi.cli import _gap_atten_opts, parse_args

    base = ["inference", "-d", "d", "-ad", "a", "-ef", "p", "-m", "m"]
    assert _gap_atten_opts(parse_args(base)) is None
    got = _gap_atten_opts(parse_args(base + ["--gap_atten", "0.25"]))
    assert got == {"alpha": 0.25, "trust": 34, "ramp": 16}


# ------------------------------------------------- causal (streaming) variant


def test_left_distances_np_matches_scan():
    rng = np.random.default_rng(5)
    fk = (rng.random((3, 50)) > 0.4).astype(np.float32)
    got = pf.left_distances_np(fk)
    big = 10**6
    for b in range(3):
        d = big
        for i in range(50):
            d = 0 if fk[b, i] > 0.5 else min(d + 1, big)
            assert got[b, i] == d


def test_causal_whole_window_equals_offline():
    """One window covering the whole utterance with the edge-init left
    distance reproduces gap_attenuation_gain exactly."""
    rng = np.random.default_rng(6)
    fk = (rng.random((2, 60)) > 0.5).astype(np.float32)
    fk[1, 10:40] = 0.0  # one long gap
    off = np.asarray(pf.gap_attenuation_gain(
        jnp.asarray(fk), alpha=0.3, trust=5, ramp=4))
    got = np.asarray(pf.causal_window_gain(
        jnp.asarray(fk), jnp.full((2,), 10**6, jnp.int32),
        alpha=0.3, trust=5, ramp=4))
    np.testing.assert_allclose(got, off, atol=1e-7)


def _chained_causal_gains(fk, chunk, look, alpha, trust, ramp):
    """Emulate the streaming schedule: per window k, gain over
    fk[kC : kC+W] with the carried left distance; collect the
    emitted-chunk gains.  Rows past the utterance pad as UNKNOWN (0) —
    the streaming code masks fill/pad rows out of the depth computation
    ("gap_valid"), matching offline gap_depth's edge convention."""
    t = fk.shape[1]
    lds = pf.left_distances_np(fk)
    out = np.ones_like(fk)
    big = 10**6
    for t0 in range(0, t, chunk):
        win = fk[:, t0 : t0 + chunk + look]
        if win.shape[1] < chunk + look:
            win = np.pad(win, ((0, 0), (0, chunk + look - win.shape[1])),
                         constant_values=0.0)
        ld0 = lds[:, t0 - 1] if t0 > 0 else np.full(fk.shape[0], big, np.int32)
        g = np.asarray(pf.causal_window_gain(
            jnp.asarray(win), jnp.asarray(ld0, jnp.int32),
            alpha=alpha, trust=trust, ramp=ramp))
        n = min(chunk, t - t0)
        out[:, t0 : t0 + n] = g[:, :n]
    return out


def test_causal_chained_exact_when_gap_within_lookahead():
    """Any gap no longer than the lookahead is fully visible from every
    window that touches it, so the chained causal gains equal offline."""
    fk = np.ones((1, 64), np.float32)
    fk[0, 20:32] = 0.0  # 12-frame gap <= lookahead 16
    off = np.asarray(pf.gap_attenuation_gain(
        jnp.asarray(fk), alpha=0.2, trust=2, ramp=3))
    got = _chained_causal_gains(fk, chunk=8, look=16, alpha=0.2, trust=2,
                                ramp=3)
    assert (off < 1.0).any()  # the filter actually fires in this setup
    np.testing.assert_allclose(got, off, atol=1e-7)


def test_causal_chained_never_under_attenuates():
    """With a gap end beyond the lookahead the causal gains may only be
    LOWER than offline (suppress more of the proven-harmful deep content,
    never less), equal in the deep interior (both at the alpha floor)."""
    fk = np.ones((1, 96), np.float32)
    fk[0, 16:56] = 0.0  # 40-frame gap >> lookahead
    off = np.asarray(pf.gap_attenuation_gain(
        jnp.asarray(fk), alpha=0.25, trust=4, ramp=4))
    got = _chained_causal_gains(fk, chunk=8, look=16, alpha=0.25, trust=4,
                                ramp=4)
    assert np.all(got <= off + 1e-7)
    # deep interior: both at the floor
    np.testing.assert_allclose(got[0, 30:40], 0.25, atol=1e-7)
    np.testing.assert_allclose(off[0, 30:40], 0.25, atol=1e-7)
    # known frames untouched in both
    np.testing.assert_array_equal(got[0, fk[0] > 0.5], 1.0)


def test_causal_chained_exact_for_end_of_utterance_gap():
    """A gap running to the utterance end has NO right edge in either
    convention (offline treats the edge as unknown; streaming treats
    fill/pad rows as unknown), so chained causal gains equal offline
    exactly even though the gap end is never 'visible'."""
    fk = np.ones((1, 64), np.float32)
    fk[0, 40:] = 0.0  # gap to the end
    off = np.asarray(pf.gap_attenuation_gain(
        jnp.asarray(fk), alpha=0.25, trust=4, ramp=4))
    got = _chained_causal_gains(fk, chunk=8, look=16, alpha=0.25, trust=4,
                                ramp=4)
    assert off[0, -1] == 0.25  # offline holds the floor through the tail
    np.testing.assert_allclose(got, off, atol=1e-7)
