"""Serving: warm-model service + HTTP endpoint round trip."""

import os
import struct
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from avsi import config as config_lib
from avsi.data import fixture, stats as stats_lib
from avsi.train import loop


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve"))
    paths = fixture.make_fixture(
        d, n_speakers=1, n_samples=4, audio_len_ms=600, gap_ms=150.0, gap_std_ms=20.0
    )
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", os.path.join(d, "sn"), "spec",
        window_size=24, step_size=12,
    )
    cfg = {
        "model": "a-blstm", "audio_feat_dim": 257, "video_feat_dim": 136,
        "audio_len": 9600, "batch_size": 2, "net_dim": [8, 8],
        "dropout_rate": 0.0, "max_n_epochs": 1, "n_earlystop_epochs": 3,
        "optimizer_type": "adam", "starter_learning_rate": 0.003, "lr_decay": 1.0,
        "root_folder": paths["tfrecords"], "exp_folder": os.path.join(d, "exp"),
        "audio_feat_mean": os.path.join(d, "sn_mean.npy"),
        "audio_feat_std": os.path.join(d, "sn_std.npy"),
        "tb_media": 0,
    }
    cfg_path = os.path.join(d, "c.config")
    config_lib.save_configfile(cfg, cfg_path)
    loop.train(cfg_path)
    return os.path.join(d, "exp", "netmodel")


def test_service_enhance(model_dir):
    from avsi.serve import InpaintingService

    svc = InpaintingService(model_dir, micro_batch=2, phase_recon="none")
    rng = np.random.RandomState(0)
    wave = (3000 * rng.randn(9600)).astype(np.float32)
    mask = np.ones(50, np.float32)
    mask[10:20] = 0
    out = svc.enhance(wave, mask)
    assert out.shape == (9600,)
    assert out.dtype == np.int16
    assert np.abs(out).max() > 0
    # batched path chunks over the micro batch
    outs = svc.enhance_batch(np.stack([wave] * 5), np.stack([mask] * 5))
    assert outs.shape == (5, 9600)
    np.testing.assert_array_equal(outs[0], outs[4])  # same input -> same output


def test_http_endpoint(model_dir):
    from avsi.serve import serve

    server = serve(model_dir, port=0, micro_batch=2, phase_recon="none")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok"
        rng = np.random.RandomState(1)
        wave = (3000 * rng.randn(9600)).astype(np.int16)
        mask = np.ones(50, np.uint8)
        mask[15:25] = 0
        body = struct.pack("<ii", 9600, 50) + wave.tobytes() + mask.tobytes()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/enhance", data=body, method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = np.frombuffer(r.read(), "<i2")
        assert out.shape == (9600,)
        assert np.abs(out).max() > 0

        # malformed request -> 400 with a message, not a crash
        bad = struct.pack("<ii", 123, 50)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/enhance", data=bad, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
        # and the service still works after the bad request
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok"
    finally:
        server.shutdown()


def test_http_streaming(model_dir):
    from avsi.serve import serve

    server = serve(model_dir, port=0, micro_batch=2, phase_recon="none")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body=b""):
        req = urllib.request.Request(base + path, data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    try:
        import json as json_lib

        info = json_lib.loads(post("/stream/open?chunk=4&look=6"))
        sid = info["id"]
        assert info["frame_step"] == 192

        rng = np.random.RandomState(2)
        wave = (3000 * rng.randn(9600)).astype(np.int16)
        mask = np.ones(50, np.uint8)
        mask[15:25] = 0
        got = b""
        frames_fed = 0
        for lo in range(0, 9600, 1920):  # 10 frames per push
            chunk = wave[lo : lo + 1920]
            done = lo + len(chunk)
            n_frames = min(max(0, (done - 384) // 192 + 1), 50)
            m = mask[frames_fed:n_frames]
            body = (
                struct.pack("<ii", len(chunk), len(m))
                + chunk.tobytes()
                + m.tobytes()
            )
            got += post(f"/stream/{sid}", body)
            frames_fed = n_frames
        assert len(got) > 0, "no incremental output"
        got += post(f"/stream/{sid}/close")
        out = np.frombuffer(got, "<i2")
        assert out.shape == (9600,)
        assert np.abs(out).max() > 0

        # closed session is gone
        with pytest.raises(urllib.error.HTTPError) as exc:
            post(f"/stream/{sid}/close")
        assert exc.value.code == 404

        # batch endpoint still healthy alongside streaming
        body = struct.pack("<ii", 9600, 50) + wave.tobytes() + mask.tobytes()
        out2 = np.frombuffer(post("/enhance", body), "<i2")
        assert out2.shape == (9600,)
    finally:
        server.shutdown()
