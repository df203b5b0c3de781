"""TensorBoard event-writer golden test: TF must parse our event files."""

import os
from glob import glob

import numpy as np
import pytest

from avsi.train.tb import SummaryWriter

tf = pytest.importorskip("tensorflow")


def test_tf_reads_our_events(tmp_path):
    logdir = str(tmp_path / "tb")
    w = SummaryWriter(logdir)
    w.scalar("train/loss", 0.5, 1)
    w.scalar("train/loss", 0.25, 2)
    img = np.linspace(0, 1, 64 * 32).reshape(64, 32)
    w.image("spec", img, 1)
    w.audio("wave", 1000 * np.sin(np.linspace(0, 60, 1600)), 1)
    w.close()

    files = glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(tf.compat.v1.train.summary_iterator(files[0]))
    assert events[0].file_version == "brain.Event:2"
    scalars = [
        (e.step, v.simple_value)
        for e in events
        for v in e.summary.value
        if v.tag == "train/loss"
    ]
    assert scalars == [(1, 0.5), (2, 0.25)]
    images = [v for e in events for v in e.summary.value if v.tag == "spec"]
    assert len(images) == 1
    assert images[0].image.height == 64 and images[0].image.width == 32
    # PNG decodes back through TF
    decoded = tf.io.decode_png(images[0].image.encoded_image_string)
    assert decoded.shape == (64, 32, 1)
    audios = [v for e in events for v in e.summary.value if v.tag == "wave"]
    assert len(audios) == 1
    assert audios[0].audio.sample_rate == 16000.0
    wav = tf.audio.decode_wav(audios[0].audio.encoded_audio_string)
    assert wav.sample_rate == 16000
