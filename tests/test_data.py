"""Tests for mask synthesis, AV sync, landmarks and phoneme labels."""

import numpy as np
import pytest

from avsi.data import avsync, landmarks, masks, phonemes


class TestIntrusionMask:
    def test_invariants(self):
        """Property tests on the sampling scheme of dataset_generator.py:11-48."""
        rng = np.random.default_rng(0)
        for _ in range(200):
            n_max = int(rng.integers(1, 4))
            mask, cov, n_intr = masks.get_intrusions_mask(
                rng, 257, 250, cov_mean=800 / 3000, cov_std=100 / 3000, n_max_intr=n_max
            )
            assert mask.shape == (250, 257)
            assert set(np.unique(mask)) <= {0.0, 1.0}
            # all frequency bins zeroed together (time gaps only)
            rowsum = mask.sum(axis=1)
            assert set(np.unique(rowsum)) <= {0.0, 257.0}
            assert 1 <= n_intr <= n_max
            # coverage bounds: >= 3*n/250, <= 0.8 (plus rounding slack)
            zeros = (rowsum == 0).sum()
            assert zeros == int(np.around(250 * cov))
            assert cov <= 0.8 + 1 / 250
            # count contiguous gap runs == n_intr, each >= min len 3
            gaps = np.flatnonzero(np.diff(np.concatenate([[1], rowsum > 0, [1]])))
            runs = gaps.reshape(-1, 2)
            assert len(runs) == n_intr
            assert (np.diff(runs, axis=1) >= 3).all()

    def test_coverage_distribution(self):
        rng = np.random.default_rng(1)
        covs = [
            masks.get_intrusions_mask(rng, 10, 250, 0.27, 0.03, 1)[1] for _ in range(500)
        ]
        assert abs(np.mean(covs) - 0.27) < 0.01


class TestFreeformMask:
    def test_invariants(self):
        """The free-form generator (avsi extension) must produce genuinely
        irregular holes: binary mask, coverage near target, and at least
        some partially-masked frames (else it degenerates to time gaps)."""
        rng = np.random.default_rng(0)
        partial_frames = 0
        for _ in range(50):
            mask, cov, n_strokes = masks.get_freeform_mask(
                rng, 128, 128, cov_mean=0.25, cov_std=0.05
            )
            assert mask.shape == (128, 128)
            assert mask.dtype == np.float32
            assert set(np.unique(mask)) <= {0.0, 1.0}
            assert abs((1.0 - mask.mean()) - cov) < 1e-6
            assert 0.02 <= cov <= 0.8
            assert n_strokes >= 1
            rowsum = mask.sum(axis=1)
            partial_frames += int(((rowsum > 0) & (rowsum < 128)).sum())
        assert partial_frames > 50 * 10  # plenty of partially-valid frames

    def test_coverage_distribution(self):
        rng = np.random.default_rng(1)
        covs = [
            masks.get_freeform_mask(rng, 128, 128, 0.25, 0.0)[1] for _ in range(100)
        ]
        # strokes overshoot the target by at most one stroke-step's area
        assert 0.24 < np.mean(covs) < 0.30, np.mean(covs)


class TestFixtureSplits:
    def test_splits_are_disjoint(self, tmp_path):
        """Train/val/test must hold DIFFERENT utterances (quality gates
        evaluate on held-out data)."""
        from avsi.data import fixture

        paths = fixture.make_fixture(
            str(tmp_path), n_speakers=1, n_samples=3, audio_len_ms=600,
            gap_ms=150.0, gap_std_ms=20.0,
        )
        import os

        def utts(split):
            return {
                d.split("_")[1]
                for d in os.listdir(paths[split])
                if os.path.isdir(os.path.join(paths[split], d))
            }

        tr, va, te = utts("training-set"), utts("validation-set"), utts("test-set")
        assert len(tr) == len(va) == len(te) == 3
        assert tr & va == set() and tr & te == set() and va & te == set()

    def test_per_split_counts(self, tmp_path):
        """n_samples may be a per-split tuple (GRID-scale asymmetric splits)."""
        from avsi.data import fixture

        paths = fixture.make_fixture(
            str(tmp_path), n_speakers=1, n_samples=(4, 2, 1), audio_len_ms=600,
            gap_ms=150.0, gap_std_ms=20.0,
        )
        import os

        def utts(split):
            return {
                d.split("_")[1]
                for d in os.listdir(paths[split])
                if os.path.isdir(os.path.join(paths[split], d))
            }

        tr, va, te = utts("training-set"), utts("validation-set"), utts("test-set")
        assert (len(tr), len(va), len(te)) == (4, 2, 1)
        assert tr & va == set() and tr & te == set() and va & te == set()

    def test_freeform_mask_kind(self, tmp_path):
        """mask_kind='freeform' (dataset_generator --mask_kind freeform)
        must write irregular T-F hole masks through the standard corpus
        layout — some frames partially masked — while 'timegap' corpora
        stay full-band per frame."""
        import os

        from avsi.data import fixture

        paths = fixture.make_fixture(
            str(tmp_path), n_speakers=1, n_samples=2, audio_len_ms=600,
            gap_ms=150.0, gap_std_ms=20.0, mask_kind="freeform",
        )
        partial = 0
        n_masks = 0
        for split in ("training-set", "validation-set", "test-set"):
            for d in os.listdir(paths[split]):
                mp = os.path.join(paths[split], d, "mask.npy")
                if not os.path.isfile(mp):
                    continue
                m = np.load(mp)
                n_masks += 1
                assert m.shape == (600 // 12, 257)
                assert set(np.unique(m)) <= {0.0, 1.0}
                rowsum = m.sum(axis=1)
                partial += int(((rowsum > 0) & (rowsum < 257)).sum())
        assert n_masks == 6
        assert partial > 0  # free-form holes are not full-band

        with pytest.raises(ValueError):
            fixture.make_fixture(
                str(tmp_path / "bad"), n_speakers=1, n_samples=1,
                audio_len_ms=600, mask_kind="nope",
            )


class TestLandmarkOverlay:
    """Offline renderer matching the reference show_face_landmarks
    (face_landmarks.py:97-180) drawing semantics."""

    def _lm(self, t=3):
        rng = np.random.default_rng(0)
        base = rng.normal(0, 1, size=(68, 2))
        return base[None] + rng.normal(0, 0.02, size=(t, 68, 2))

    def test_dots_and_canvas(self):
        from avsi.data import landmarks as lmlib

        lm = self._lm()
        frames = lmlib.render_landmark_frames(lm, size=200)
        assert frames.shape == (3, 200, 200) and frames.dtype == np.uint8
        # each landmark maps inside the canvas and is drawn black
        assert (frames == 0).sum() >= 68  # dots exist
        assert frames.max() == 255  # white canvas remains

    def test_full_draw_connects_regions(self):
        from avsi.data import landmarks as lmlib

        # two distant jaw points: their midpoint must carry a line pixel
        lm = np.zeros((1, 68, 2))
        lm[0, :, 0] = np.linspace(0, 10, 68)
        lm[0, :, 1] = np.linspace(0, 10, 68)
        lm[0, 0] = (0.0, 0.0)
        lm[0, 1] = (10.0, 0.0)
        plain = lmlib.render_landmark_frames(lm, size=100)
        full = lmlib.render_landmark_frames(lm, size=100, full_draw=True)
        assert (full == 128).sum() > 0  # line pixels drawn
        assert (plain == 128).sum() == 0  # dots-only without full_draw

    def test_background_mode_and_png(self, tmp_path):
        from avsi.data import landmarks as lmlib

        lm = np.abs(self._lm(2)) * 20 + 5  # pixel coords inside 64x64
        bg = np.full((2, 64, 64), 200, np.uint8)
        frames = lmlib.render_landmark_frames(lm, backgrounds=bg)
        assert frames.shape == (2, 64, 64)
        assert (frames == 0).any()  # dots drawn over the video frame
        assert (frames == 200).any()  # original pixels preserved
        paths = lmlib.save_landmark_overlays(frames, str(tmp_path / "ov"))
        assert len(paths) == 2
        import struct

        raw = open(paths[0], "rb").read()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        w, h = struct.unpack(">II", raw[16:24])
        assert (w, h) == (64, 64)


class TestAVSync:
    def test_upsample_75_to_250(self):
        feats = np.arange(75, dtype=np.float64)[:, None].repeat(3, 1)
        mask = np.zeros((250, 257))
        out = avsync.sync_audio_visual_features(mask, feats, tot_frames=75, min_frames=70)
        assert out.shape == (250, 3)
        # linearly increasing input stays (approximately) linear
        d = np.diff(out[:, 0])
        assert d.min() >= 0
        np.testing.assert_allclose(out[0], 0.0)
        assert out[-1, 0] <= 74.0

    def test_pad_start_replication(self):
        feats = np.random.RandomState(0).randn(72, 4)
        mask = np.zeros((250, 1))
        out = avsync.sync_audio_visual_features(mask, feats, tot_frames=75, min_frames=70)
        assert out is not None and out.shape == (250, 4)

    def test_rejects_corrupt(self):
        mask = np.zeros((250, 1))
        assert avsync.sync_audio_visual_features(mask, np.zeros(10)) is None
        assert (
            avsync.sync_audio_visual_features(mask, np.zeros((60, 4)), 75, 70) is None
        )


class TestLandmarks:
    def test_motion_vector_delta1(self):
        lm = np.random.RandomState(0).randn(10, 136)
        mv = landmarks.get_motion_vector(lm, delta=1)
        assert mv.shape == lm.shape
        np.testing.assert_allclose(mv[0], 0.0)
        np.testing.assert_allclose(mv[1:], lm[1:] - lm[:-1])


class TestPhonemes:
    def test_dictionary_and_labels(self, tmp_path):
        dict_file = tmp_path / "dictionary.txt"
        dict_file.write_text("ah b\nk s\nah iy\n")
        d = phonemes.load_dictionary(str(dict_file))
        assert d == ["ah", "b", "iy", "k", "s"]
        labels = phonemes.get_labels("b,ah,SP,k", d)
        np.testing.assert_array_equal(labels, [1, 0, 3])
        assert phonemes.get_phonemes_from_labels([1, 0, 3], d) == ["b", "ah", "k"]

    def test_linearize(self):
        assert phonemes.linearize("0 100 SIL\n100 200 b\n200 300 ih\n") == "b,ih"
