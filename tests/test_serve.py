"""Serving: warm-model service + HTTP endpoint round trip."""

import os
import json
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

        # a server-side bug must surface as an opaque 500 (same contract as
        # /stream), never a 400 that blames the client and leaks internals
        real_enhance = server.service.enhance
        server.service.enhance = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("secret internal detail")
        )
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/enhance", data=body, method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req)
            assert exc.value.code == 500
            assert b"secret" not in exc.value.read()
        finally:
            server.service.enhance = real_enhance
        with urllib.request.urlopen(req) as r:
            assert np.frombuffer(r.read(), "<i2").shape == (9600,)
    finally:
        server.shutdown()


def test_metrics_and_reload(model_dir):
    """/metrics counters advance with served work; /reload hot-swaps
    weights (version bump visible in /info) without recompiles, and a
    geometry-mismatched path is refused with 400."""
    from avsi.serve import serve

    server = serve(model_dir, port=0, micro_batch=2, phase_recon="none")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return r.read().decode()

        def metric(name):
            for line in get("/metrics").splitlines():
                if line.startswith(name + " "):
                    return float(line.split()[1])
            raise AssertionError(f"{name} not exported")

        before = metric("avsi_utterances_enhanced_total")
        assert metric("avsi_weights_version") == 0
        rng = np.random.RandomState(2)
        wave = (3000 * rng.randn(9600)).astype(np.int16)
        mask = np.ones(50, np.uint8)
        body = struct.pack("<ii", 9600, 50) + wave.tobytes() + mask.tobytes()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/enhance", data=body, method="POST"
        )
        urllib.request.urlopen(req).read()
        assert metric("avsi_utterances_enhanced_total") == before + 1
        assert metric("avsi_device_steps_total") >= 1

        # reload from the serving path (empty body): version bumps, serving continues
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload", data=b"", method="POST"
        )
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read())["weights_version"] == 1
        assert "\"weights_version\": 1" in get("/info").replace("'", '"')
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/enhance", data=body, method="POST"
        )
        out = np.frombuffer(urllib.request.urlopen(req).read(), "<i2")
        assert out.shape == (9600,)

        # a nonexistent checkpoint path -> 400, service stays healthy
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload", data=b"/nonexistent/dir", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code in (400, 500)
        assert get("/healthz") == "ok"
        assert metric("avsi_weights_version") == 1
    finally:
        server.shutdown()


def test_reload_geometry_mismatch(model_dir, tmp_path):
    """reload() refuses a checkpoint whose geometry differs from serving."""
    from avsi.serve import InpaintingService

    svc = InpaintingService(model_dir, micro_batch=2, phase_recon="none")
    other = tmp_path / "other"
    other.mkdir()
    for name in os.listdir(model_dir):
        src = os.path.join(model_dir, name)
        dst = str(other / name)
        with open(src, "rb") as f:
            data = f.read()
        with open(dst, "wb") as f:
            f.write(data)
    cfg = config_lib.load_configfile(str(other / "config.txt"))
    cfg["audio_len"] = 48000
    config_lib.save_configfile(cfg, str(other / "config.txt"))
    with pytest.raises(ValueError, match="geometry mismatch"):
        svc.reload(str(other))
    # integration_layer changes the params-tree structure for conditioned
    # models — it must be part of the geometry contract too
    cfg["audio_len"] = 9600
    cfg["integration_layer"] = 1
    config_lib.save_configfile(cfg, str(other / "config.txt"))
    with pytest.raises(ValueError, match="integration_layer"):
        svc.reload(str(other))
    # and the original weights still serve
    wave = np.zeros(9600, np.float32)
    assert svc.enhance(wave, np.ones(50, np.float32)).shape == (9600,)


def test_reload_new_stats_and_lc_window(model_dir, tmp_path):
    """reload() with a checkpoint whose normalization stats or LC window
    differ must rebuild the compiled programs against the NEW bundle — a
    stale program would silently denormalize with the old mean/std and
    new streams would default to the old trained window."""
    from avsi.serve import InpaintingService

    svc = InpaintingService(model_dir, micro_batch=2, phase_recon="none")
    other = tmp_path / "other"
    other.mkdir()
    for name in os.listdir(model_dir):
        with open(os.path.join(model_dir, name), "rb") as f:
            data = f.read()
        with open(str(other / name), "wb") as f:
            f.write(data)
    mean = np.load(str(other / "audio_features_mean.npy"))
    np.save(str(other / "audio_features_mean.npy"), mean + 0.5)
    cfg = config_lib.load_configfile(str(other / "config.txt"))
    cfg["lc_chunk"] = 4
    cfg["lc_lookahead"] = 6
    config_lib.save_configfile(cfg, str(other / "config.txt"))

    rng = np.random.RandomState(3)
    wave = (3000 * rng.randn(9600)).astype(np.float32)
    mask = np.ones(50, np.float32)
    mask[12:22] = 0
    before = svc.enhance(wave, mask)
    assert svc.reload(str(other)) == 1
    after = svc.enhance(wave, mask)
    # identical to a service built fresh on the new bundle (same program)
    fresh = InpaintingService(str(other), micro_batch=2, phase_recon="none")
    np.testing.assert_array_equal(after, fresh.enhance(wave, mask))
    assert np.any(after != before)  # the new stats/LC window took effect
    # new streams default to the NEW trained window
    inp = svc.open_stream()
    assert (inp.chunk, inp.look) == (4, 6)
    # a path-reload updates the serving path: a later BARE reload must
    # refresh the checkpoint served NOW, not silently revert to the
    # startup one (regression: _model_path was never updated)
    assert svc._model_path == str(other)
    assert svc.reload() == 2
    np.testing.assert_array_equal(
        svc.enhance(wave, mask), fresh.enhance(wave, mask)
    )


@pytest.fixture(scope="module")
def ctc_model_dir(tmp_path_factory):
    """A tiny trained av-blstm-ssnn-ctc (visual input + CTC head) for the
    video-streaming/transcript HTTP surface."""
    d = str(tmp_path_factory.mktemp("serve_ctc"))
    paths = fixture.make_fixture(
        d, n_speakers=1, n_samples=4, audio_len_ms=600, gap_ms=150.0, gap_std_ms=20.0
    )
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", os.path.join(d, "sn"), "spec",
        window_size=24, step_size=12,
    )
    cfg = {
        "model": "av-blstm-ssnn-ctc", "audio_feat_dim": 257,
        "video_feat_dim": 136, "audio_len": 9600, "batch_size": 2,
        "net_dim": [8, 8], "integration_layer": 0, "num_asr_labels": 33,
        "ctc_loss": 0.001, "dropout_rate": 0.0, "max_n_epochs": 1,
        "n_earlystop_epochs": 3, "optimizer_type": "adam",
        "starter_learning_rate": 0.003, "lr_decay": 1.0,
        "root_folder": paths["tfrecords"], "exp_folder": os.path.join(d, "exp"),
        "audio_feat_mean": os.path.join(d, "sn_mean.npy"),
        "audio_feat_std": os.path.join(d, "sn_std.npy"),
        "tb_media": 0,
    }
    cfg_path = os.path.join(d, "c.config")
    config_lib.save_configfile(cfg, cfg_path)
    loop.train(cfg_path)
    return os.path.join(d, "exp", "netmodel")


def test_http_streaming_video_transcript(ctc_model_dir):
    """Visual models stream over HTTP (f16 video rows in the push payload)
    and transcript=1 frames the reply as <i4 n_wav> wav_i2[] new_ids_i2[];
    the decoded ids must match a direct StreamingInpainter run."""
    import json as json_lib

    from avsi.serve import InpaintingService, serve

    server = serve(ctc_model_dir, port=0, micro_batch=2, phase_recon="none")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body=b""):
        req = urllib.request.Request(base + path, data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    try:
        info = json_lib.loads(post("/stream/open?chunk=4&look=6&transcript=1"))
        sid = info["id"]
        assert info["video_feat_dim"] == 136 and info["transcript"] is True

        rng = np.random.RandomState(5)
        wave = (3000 * rng.randn(9600)).astype(np.int16)
        mask = np.ones(50, np.uint8)
        mask[15:25] = 0
        video = rng.randn(50, 136).astype(np.float16)

        def parse(resp):
            (n_wav,) = struct.unpack_from("<i", resp, 0)
            wav = np.frombuffer(resp, "<i2", n_wav, 4)
            ids = np.frombuffer(resp, "<i2", offset=4 + 2 * n_wav)
            return wav, list(ids)

        got_wav, got_ids = [], []
        frames_fed = 0
        for lo in range(0, 9600, 1920):
            chunk = wave[lo : lo + 1920]
            done = lo + len(chunk)
            n_frames = min(max(0, (done - 384) // 192 + 1), 50)
            m = mask[frames_fed:n_frames]
            v = video[frames_fed:n_frames]
            body = (
                struct.pack("<ii", len(chunk), len(m))
                + chunk.tobytes() + m.tobytes() + v.tobytes()
            )
            w, i = parse(post(f"/stream/{sid}", body))
            got_wav.append(w)
            got_ids += i
            frames_fed = n_frames
        # pad_end frame rows (no new samples)
        if frames_fed < 50:
            m = mask[frames_fed:]
            v = video[frames_fed:]
            body = struct.pack("<ii", 0, len(m)) + m.tobytes() + v.tobytes()
            w, i = parse(post(f"/stream/{sid}", body))
            got_wav.append(w)
            got_ids += i
        w, i = parse(post(f"/stream/{sid}/close"))
        got_wav.append(w)
        got_ids += i
        total = np.concatenate(got_wav)
        assert total.shape == (9600,)

        # must match a direct StreamingInpainter run bit-for-bit on ids
        svc = InpaintingService(ctc_model_dir, micro_batch=2, phase_recon="none")
        inp = svc.open_stream(4, 6, transcript=True)
        from avsi.infer import streaming as streaming_lib

        streaming_lib.stream_utterance(
            inp, wave.astype(np.float32), mask.astype(np.float32),
            video.astype(np.float32),
        )
        assert got_ids == inp.transcript
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


@pytest.fixture(scope="module")
def emb_model_dir(tmp_path_factory):
    """A tiny trained a-blstm-emb (external 512-d speaker embedding) for
    the embedding-conditioned streaming surface."""
    d = str(tmp_path_factory.mktemp("serve_emb"))
    paths = fixture.make_fixture(
        d, n_speakers=1, n_samples=4, audio_len_ms=600, gap_ms=150.0,
        gap_std_ms=20.0, with_embeddings=True,
    )
    stats_lib.compute_mean_std_features(
        paths["training-set"], "target", os.path.join(d, "sn"), "spec",
        window_size=24, step_size=12,
    )
    cfg = {
        "model": "a-blstm-emb", "audio_feat_dim": 257, "video_feat_dim": 136,
        "audio_len": 9600, "batch_size": 2, "net_dim": [8, 8],
        "integration_layer": 0, "dropout_rate": 0.0, "max_n_epochs": 1,
        "n_earlystop_epochs": 3, "optimizer_type": "adam",
        "starter_learning_rate": 0.003, "lr_decay": 1.0,
        "root_folder": paths["tfrecords"], "exp_folder": os.path.join(d, "exp"),
        "audio_feat_mean": os.path.join(d, "sn_mean.npy"),
        "audio_feat_std": os.path.join(d, "sn_std.npy"),
        "tb_media": 0,
    }
    cfg_path = os.path.join(d, "c.config")
    config_lib.save_configfile(cfg, cfg_path)
    loop.train(cfg_path)
    return os.path.join(d, "exp", "netmodel")


def test_http_streaming_embedding_model(emb_model_dir):
    """blstm-*-emb models stream over HTTP: the 512-d speaker vector rides
    the /stream/open body as float32 bytes (regression: open_stream never
    forwarded an embedding, so every open on an emb model was a 400)."""
    from avsi.serve import serve

    server = serve(emb_model_dir, port=0, micro_batch=2, phase_recon="none")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body=b""):
        req = urllib.request.Request(base + path, data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    try:
        # open without the embedding: a clear 400, not a silent crash
        with pytest.raises(urllib.error.HTTPError) as exc:
            post("/stream/open?chunk=4&look=6")
        assert exc.value.code == 400

        emb = np.random.RandomState(5).randn(512).astype("<f4")
        info = json.loads(post("/stream/open?chunk=4&look=6", emb.tobytes()))
        sid = info["id"]

        rng = np.random.RandomState(2)
        wave = (3000 * rng.randn(9600)).astype(np.int16)
        mask = np.ones(50, np.uint8)
        mask[15:25] = 0
        got = b""
        frames_fed = 0
        for lo in range(0, 9600, 1920):
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
        got += post(f"/stream/{sid}/close")
        out = np.frombuffer(got, "<i2")
        assert out.shape == (9600,)
        assert np.abs(out).max() > 0
    finally:
        server.shutdown()


def test_http_enhance_embedding_protocol(emb_model_dir):
    """/enhance on an emb model: the 512-float32 speaker vector follows the
    mask bytes; missing or wrong-size vectors are a 400 (not a deferred
    opaque 500), and /stream/open validates the vector LENGTH too."""
    from avsi.serve import serve

    server = serve(emb_model_dir, port=0, micro_batch=2, phase_recon="none")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body=b""):
        req = urllib.request.Request(base + path, data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    rng = np.random.RandomState(3)
    wave = (3000 * rng.randn(9600)).astype(np.int16)
    mask = np.ones(50, np.uint8)
    mask[20:30] = 0
    head = struct.pack("<ii", 9600, 50) + wave.tobytes() + mask.tobytes()
    emb = rng.randn(512).astype("<f4")
    try:
        out = np.frombuffer(post("/enhance", head + emb.tobytes()), "<i2")
        assert out.shape == (9600,)
        assert np.abs(out).max() > 0

        # missing embedding -> 400
        with pytest.raises(urllib.error.HTTPError) as exc:
            post("/enhance", head)
        assert exc.value.code == 400
        # wrong-size embedding -> 400
        with pytest.raises(urllib.error.HTTPError) as exc:
            post("/enhance", head + emb[:256].tobytes())
        assert exc.value.code == 400
        # /stream/open with a wrong-size vector -> 400 at open time
        with pytest.raises(urllib.error.HTTPError) as exc:
            post("/stream/open?chunk=4&look=6", emb[:256].tobytes())
        assert exc.value.code == 400
    finally:
        server.shutdown()


def test_enhance_trailing_bytes_rejected_for_plain_model(model_dir):
    """A non-emb server must 400 an /enhance body with trailing embedding
    bytes (a client configured for an emb model), not silently drop them."""
    from avsi.serve import serve

    server = serve(model_dir, port=0, micro_batch=2, phase_recon="none")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    rng = np.random.RandomState(4)
    wave = (3000 * rng.randn(9600)).astype(np.int16)
    mask = np.ones(50, np.uint8)
    body = (
        struct.pack("<ii", 9600, 50) + wave.tobytes() + mask.tobytes()
        + np.zeros(512, "<f4").tobytes()
    )
    try:
        req = urllib.request.Request(base + "/enhance", data=body, method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
    finally:
        server.shutdown()


def test_open_body_rejected_for_plain_model(model_dir):
    """Non-emb models must reject an embedding body on /stream/open."""
    from avsi.serve import serve

    server = serve(model_dir, port=0, micro_batch=2, phase_recon="none")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            base + "/stream/open", data=np.zeros(512, "<f4").tobytes(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
    finally:
        server.shutdown()


def test_reaper_evicts_abandoned_stream(model_dir):
    """The background reaper must evict idle streams WITHOUT any further
    /stream traffic (regression: the TTL was only checked on incoming
    stream requests, so abandoned sessions leaked device state and
    max_streams slots forever)."""
    import time as time_lib

    from avsi.serve import serve

    server = serve(
        model_dir, port=0, micro_batch=2, phase_recon="none",
        stream_idle_s=1.0,
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body=b""):
        req = urllib.request.Request(base + path, data=body, method="POST")
        with urllib.request.urlopen(req) as r:
            return r.read()

    try:
        json.loads(post("/stream/open?chunk=4&look=6"))
        deadline = time_lib.monotonic() + 10.0
        while time_lib.monotonic() < deadline:
            with urllib.request.urlopen(base + "/metrics") as r:
                live = [
                    ln for ln in r.read().decode().splitlines()
                    if ln.startswith("avsi_live_streams")
                ][0]
            if live.endswith(" 0"):
                break
            time_lib.sleep(0.25)
        assert live.endswith(" 0"), live
    finally:
        server.shutdown()


def test_service_enhance_data_shards(model_dir):
    """data_shards: the /enhance micro-batch sharded over a 2-device data
    mesh must reproduce the single-device service to 1 int16 LSB (params
    replicated, batch partitioned, no collectives)."""
    from avsi.serve import InpaintingService

    base = InpaintingService(model_dir, micro_batch=2, phase_recon="none")
    svc = InpaintingService(model_dir, micro_batch=2, phase_recon="none",
                            data_shards=2)
    rng = np.random.RandomState(1)
    waves = (3000 * rng.randn(3, 9600)).astype(np.float32)
    masks = np.ones((3, 50), np.float32)
    masks[:, 12:22] = 0
    # 1 int16 LSB: XLA partitioning may reassociate float math, which
    # can flip samples sitting exactly on the rounding boundary
    np.testing.assert_allclose(
        svc.enhance_batch(waves, masks).astype(np.int32),
        base.enhance_batch(waves, masks).astype(np.int32), atol=1, rtol=0,
    )
    # reload keeps the replicated placement
    svc.reload()
    np.testing.assert_allclose(
        svc.enhance_batch(waves, masks).astype(np.int32),
        base.enhance_batch(waves, masks).astype(np.int32), atol=1, rtol=0,
    )
    with pytest.raises(ValueError):
        InpaintingService(model_dir, micro_batch=3, phase_recon="none",
                          data_shards=2)


def test_stream_gap_atten_override(model_dir):
    """Service-wide --gap_atten reaches streams by default; a per-open
    override (HTTP: /stream/open?atten=) can force it off or change it.
    The attenuation itself is equivalence-tested in test_streaming.py —
    here we pin the serve plumbing + the open-reply echo."""
    import json as json_lib

    from avsi.serve import InpaintingService, serve

    ga = {"alpha": 0.0, "trust": 2, "ramp": 2}
    svc = InpaintingService(
        model_dir, micro_batch=2, phase_recon="none", gap_atten=ga
    )
    inp = svc.open_stream()
    assert inp.gap_atten == (0.0, 2, 2)  # service default applied
    assert svc.open_stream(gap_atten=None).gap_atten is None  # forced off
    assert svc.open_stream(
        gap_atten={"alpha": 0.5}
    ).gap_atten == (0.5, 34, 16)  # per-open override with defaults

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
        info = json_lib.loads(
            post("/stream/open?chunk=4&look=6&atten=0.5&atten_trust=3")
        )
        assert info["gap_atten"] == [0.5, 3, 16]
        info_off = json_lib.loads(post("/stream/open?chunk=4&look=6&atten=1"))
        assert info_off["gap_atten"] is None
        with pytest.raises(urllib.error.HTTPError) as exc:
            post("/stream/open?atten=1.5")
        assert exc.value.code == 400
    finally:
        server.shutdown()
