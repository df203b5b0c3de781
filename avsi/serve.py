"""Serving: a warm-model inpainting service (not in the reference).

`InpaintingService` loads a self-contained checkpoint dir once, keeps the
jitted enhancement function warm at a fixed micro-batch shape, and exposes
`enhance(wave, mask_frames)` for single utterances plus `enhance_batch`.
`serve()` wraps it in a minimal stdlib HTTP server:

  POST /enhance   body: raw little-endian payload
      [int32 n_samples][int32 t_frames]
      [n_samples x int16 wave][t_frames x uint8 frame_mask]
      (+ [emb_dim x float32 speaker embedding] for blstm-*-emb models)
  -> 200, body: n_samples x int16 enhanced wave
  GET /healthz    -> 200 "ok"
  GET /info       -> model/geometry/weights_version JSON
  GET /metrics    -> Prometheus text (counters, live streams, uptime)
  POST /reload    body: optional checkpoint-dir path (default: the serving
      path) -> hot-swaps weights (no recompilation when stats/config are
      unchanged; re-jits against new stats/LC window otherwise); geometry
      must match; open streams keep their weights

Requests are padded into the fixed micro-batch so every call hits the same
compiled program (no recompiles in steady state).

Live streams (LC-BLSTM low-latency path, `avsi/infer/streaming.py`;
visual models append f16 video rows to each push payload, CTC models can
request framed incremental transcripts with `transcript=1`):

  POST /stream/open?chunk=8&look=16  -> {"id": ..., "frame_step": 192, ...}
      (blstm-*-emb models: the open body carries the float32 speaker vector;
       &atten=0.5[&atten_trust=34&atten_ramp=16] turns the causal deep-gap
       attenuation on for this stream, &atten=1 forces it off — absent, the
       service-wide --gap_atten default applies)
  POST /stream/<id>   body: [int32 n_samples][int32 n_frames]
      [n_samples x int16 wave][n_frames x uint8 frame_mask]
  -> 200, body: int16 enhanced samples ready so far (possibly empty)
  POST /stream/<id>/close  -> 200, final int16 samples; session freed
"""

from __future__ import annotations

import json
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax


class InpaintingService:
    def __init__(
        self,
        model_path: str,
        micro_batch: int = 8,
        phase_recon: str = "gl",
        gl_iters: int = 30,
        norm: bool = True,
        data_shards: int = 0,
        passthrough: bool = False,
        gap_atten: dict | None = None,
        lstm_impl: str = "auto",
    ):
        """data_shards > 1 shards the /enhance micro-batch over a `data`
        mesh (params replicated, batch partitioned — zero collectives,
        utterances are independent), so one service instance saturates a
        multi-chip slice.  Live streams keep their per-session
        single-device state; shard fleets via
        `streaming.stream_utterances_lockstep(mesh=...)` instead."""
        from avsi.infer.inpaint import load_model_bundle, make_infer_step

        self._lstm_impl = lstm_impl
        self._sharded = bool(data_shards and int(data_shards) > 1)
        self._shard = self._repl = self._mesh = None
        if self._sharded:
            from jax.sharding import NamedSharding, PartitionSpec

            from avsi.parallel import mesh as mesh_lib

            if micro_batch % int(data_shards):
                raise ValueError(
                    f"micro_batch {micro_batch} not divisible by "
                    f"data_shards {data_shards}"
                )
            self._mesh = mesh_lib.get_mesh(int(data_shards))
            self._shard = NamedSharding(self._mesh, PartitionSpec("data"))
            self._repl = NamedSharding(self._mesh, PartitionSpec())
        self.config, stats, model, self.params = load_model_bundle(
            model_path, norm, lstm_impl=lstm_impl, sharded=self._sharded,
            mesh=self._mesh,
        )
        if self._repl is not None:
            self.params = jax.device_put(self.params, self._repl)
        self.stats = stats
        self.micro_batch = micro_batch
        self.audio_len = int(self.config["audio_len"])
        # frame count follows the MODEL's hop (BLSTM 192, unet 128)
        self.t_frames = -(-self.audio_len // model.frame_step)
        self.af = int(self.config["audio_feat_dim"])
        self.vf = int(self.config["video_feat_dim"])
        # blstm-*-emb models take an external per-utterance speaker vector:
        # the batch template carries an embeddings field (zeros for warmup)
        # and /enhance callers must supply one per utterance
        self.emb_dim = (
            int(self.config.get("embedding_dim", 512))
            if model.needs_embeddings
            else 0
        )
        self._phase_recon = phase_recon
        self._gl_iters = gl_iters
        self._passthrough = bool(passthrough)
        # service-wide deep-gap attenuation default ({"alpha","trust",
        # "ramp"} or None): applied to /enhance batches (offline
        # postfilter) and to new streams (causal twin) unless a
        # /stream/open?atten= override says otherwise
        self._gap_atten = gap_atten or None
        self._step = jax.jit(
            make_infer_step(model, self.config, stats, False, phase_recon, gl_iters,
                            passthrough=self._passthrough,
                            gap_atten=self._gap_atten)
        )
        self._stream_programs: dict = {}
        self._lock = threading.Lock()
        self._model_path = model_path
        self._norm = norm
        self.weights_version = 0
        self.started = time.monotonic()
        # operational counters (served at /metrics); every update happens
        # under _lock (the stream path increments n_stream_pushes inside
        # its device-lock section too)
        self.n_utterances = 0
        self.n_device_steps = 0
        self.n_stream_pushes = 0
        self.warmup()

    def reload(self, model_path: str | None = None) -> int:
        """Hot-swap weights from `model_path` (default: the serving path).

        The new checkpoint must match the serving geometry — model name,
        audio_len and feature dims — or the reload is refused.  When the
        checkpoint's normalization stats and non-geometry config
        (lc_chunk/lc_lookahead, compute_dtype, ...) are unchanged the
        compiled programs are pure in params and the swap needs no
        recompilation; otherwise the offline step is re-jitted (and warmed)
        against the NEW stats/config before the swap, and the stream
        program cache is dropped so new streams trace fresh — a stale
        program would silently denormalize with the old mean/std or serve
        the old trained window.  Streams opened before the swap keep the
        weights (and stats) they started with (mid-utterance changes would
        glitch the carried LSTM state); new streams and /enhance requests
        use the new bundle immediately.
        """
        from avsi.infer.inpaint import load_model_bundle, make_infer_step

        cfg, stats, model, params = load_model_bundle(
            model_path or self._model_path, self._norm,
            lstm_impl=self._lstm_impl, sharded=self._sharded, mesh=self._mesh,
        )
        for key in ("model", "audio_len", "audio_feat_dim", "video_feat_dim",
                    "net_dim", "integration_layer"):
            if cfg.get(key) != self.config.get(key):
                raise ValueError(
                    f"reload geometry mismatch on {key}: "
                    f"{cfg.get(key)!r} vs serving {self.config.get(key)!r}"
                )
        # Structural guard: the compiled step's real contract is the params
        # pytree (structure + leaf shapes), not any config-key subset — a
        # mismatch here would poison every request until restart.
        old_td = jax.tree_util.tree_structure(self.params)
        new_td = jax.tree_util.tree_structure(params)
        if new_td != old_td:
            raise ValueError(
                f"reload params-tree mismatch: {new_td} vs serving {old_td}"
            )
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(self.params)):
            if np.shape(a) != np.shape(b):
                raise ValueError(
                    f"reload params-shape mismatch: {np.shape(a)} vs {np.shape(b)}"
                )
        rebuild = cfg != self.config or not (
            np.array_equal(stats[0], self.stats[0])
            and np.array_equal(stats[1], self.stats[1])
        )
        if self._repl is not None:
            params = jax.device_put(params, self._repl)
        new_step = self._step
        if rebuild:
            new_step = jax.jit(
                make_infer_step(
                    model, cfg, stats, False, self._phase_recon, self._gl_iters,
                    passthrough=self._passthrough,
                    gap_atten=self._gap_atten,
                )
            )
            # compile + warm OUTSIDE the serving lock so in-flight requests
            # are not stalled behind the (possibly slow remote) compile
            batch = self._put_batch(self._template_batch(self.micro_batch))
            np.asarray(new_step(params, batch)[0])
        with self._lock:
            self.params = params
            self.stats = stats
            self.config = cfg
            self._step = new_step
            if model_path:
                # a bare /reload means "refresh the CURRENTLY SERVED
                # checkpoint" — which after a path-reload is the new path,
                # not the startup one
                self._model_path = model_path
            if rebuild:
                self._stream_programs = {}
            self.weights_version += 1
        return self.weights_version

    def _template_batch(self, n: int) -> dict:
        batch = {
            "sequence_lengths": np.full((n,), self.t_frames, np.int32),
            "labels_lengths": np.ones((n,), np.int32),
            "target_sources": np.zeros((n, self.audio_len), np.int16),
            "labels": np.zeros((n, 50), np.float32),
            "video_features": np.zeros((n, self.t_frames, self.vf), np.float16),
            "mask_frames": np.ones((n, self.t_frames), np.int8),
        }
        if self.emb_dim:
            batch["embeddings"] = np.zeros((n, self.emb_dim), np.float32)
        return batch

    def _put_batch(self, batch: dict) -> dict:
        if self._shard is None:
            return batch
        return {k: jax.device_put(v, self._shard) for k, v in batch.items()}

    def warmup(self) -> None:
        batch = self._put_batch(self._template_batch(self.micro_batch))
        wav, _, _ = self._step(self.params, batch)
        np.asarray(wav)

    def enhance_batch(self, waves: np.ndarray, mask_frames: np.ndarray,
                      embeddings: np.ndarray | None = None) -> np.ndarray:
        """waves (N, audio_len) int16-scale; mask_frames (N, T) 0/1;
        embeddings (N, emb_dim) float32, required iff the model is a
        blstm-*-emb variant."""
        n = len(waves)
        if self.emb_dim:
            if embeddings is None:
                raise ValueError(
                    f"model {self.config['model']} needs per-utterance speaker "
                    f"embeddings (N, {self.emb_dim})"
                )
            if np.shape(embeddings) != (n, self.emb_dim):
                raise ValueError(
                    f"embeddings must be (N={n}, {self.emb_dim}); got "
                    f"{np.shape(embeddings)}"
                )
        elif embeddings is not None:
            # silently dropping a caller-supplied conditioning vector would
            # hide a client/server model mismatch
            raise ValueError(
                f"model {self.config['model']} takes no speaker embeddings"
            )
        out = np.empty((n, self.audio_len), np.int16)
        with self._lock:  # one device stream; keep shapes fixed
            for lo in range(0, n, self.micro_batch):
                chunk = slice(lo, min(lo + self.micro_batch, n))
                k = chunk.stop - chunk.start
                batch = self._template_batch(self.micro_batch)
                batch["target_sources"][:k] = np.clip(
                    waves[chunk], -32768, 32767
                ).astype(np.int16)
                batch["mask_frames"][:k] = mask_frames[chunk].astype(np.int8)
                if self.emb_dim:
                    batch["embeddings"][:k] = embeddings[chunk].astype(np.float32)
                wav, _, _ = self._step(self.params, self._put_batch(batch))
                out[chunk] = np.asarray(wav)[:k]
                self.n_utterances += k
                self.n_device_steps += 1
        return out

    def enhance(self, wave: np.ndarray, mask_frames: np.ndarray,
                embedding: np.ndarray | None = None) -> np.ndarray:
        return self.enhance_batch(
            wave[None], mask_frames[None],
            None if embedding is None else np.asarray(embedding)[None],
        )[0]

    def open_stream(self, chunk_frames: int | None = None,
                    lookahead_frames: int | None = None,
                    transcript: bool = False,
                    phase_fill: bool = False,
                    embedding: np.ndarray | None = None,
                    gap_atten: dict | None = "service-default"):
        """A live LC-BLSTM stream sharing this service's warm weights (and,
        across streams with the same chunk/lookahead/transcript/fill, the
        compiled window program). chunk/lookahead default to the model's
        trained LC window when the config carries lc_chunk/lc_lookahead
        (else C=8/L=16). transcript=True (CTC models) maintains an
        incremental greedy decode on the stream object. phase_fill=True
        enables causal hole-phase extrapolation (measured net-negative on
        STOI/PESQ without Griffin-Lim refinement — see
        infer/streaming.py's module docstring — hence opt-in).
        `embedding` supplies the external 512-d speaker vector that
        blstm-*-emb models condition on (required for them, rejected
        otherwise); over HTTP it rides the /stream/open body.
        `gap_atten` overrides the service-wide causal deep-gap
        attenuation for this stream ({"alpha","trust","ramp"}, or None to
        force off); the sentinel default keeps the service setting.  Over
        HTTP: /stream/open?atten=0.5[&atten_trust=34&atten_ramp=16]."""
        from avsi.infer.streaming import StreamingInpainter

        if gap_atten == "service-default":
            gap_atten = self._gap_atten
        # snapshot a coherent (config, stats, params, cache) set under the
        # lock — a concurrent /reload must not hand us new stats with old
        # params — but construct (trace/compile) outside it
        with self._lock:
            config, stats, params = self.config, self.stats, self.params
            cache = self._stream_programs
            known = set(cache)
        inp = StreamingInpainter(
            config, stats, params,
            chunk_frames=chunk_frames, lookahead_frames=lookahead_frames,
            program_cache=cache, transcript=transcript,
            phase_fill=phase_fill, embedding=embedding,
            passthrough=self._passthrough,
            lstm_impl=self._lstm_impl,
            gap_atten=gap_atten,
        )
        # full program-cache key (incl. lstm_impl/gap_atten — a partial
        # tuple here would never match and the warmup would run per open)
        if (inp.chunk, inp.look, inp.want_transcript, inp.phase_fill,
                inp.lstm_impl, inp.gap_atten) not in known:
            # fresh (chunk, look, transcript) key: jax.jit is lazy, so the
            # compile would otherwise fire on the stream's FIRST PUSH —
            # inside the device lock, stalling every other request behind a
            # slow remote compile.  Warm it here, outside the lock, with one
            # zero window, then clear the dummy state.
            w = inp.window
            n = (w - 1) * 192 + 384  # samples completing exactly w frames
            video = (
                np.zeros((w, self.vf), np.float32)
                if inp.spec.input_type != "a"
                else None
            )
            inp.push(np.zeros(n, np.float32), np.ones(w, np.float32), video)
            inp.reset()
        return inp


def serve(
    model_path: str,
    host: str = "127.0.0.1",
    port: int = 8571,
    max_streams: int = 64,
    stream_idle_s: float = 600.0,
    **kw,
):
    service = InpaintingService(model_path, **kw)
    streams: dict = {}  # sid -> [StreamingInpainter, last_used_monotonic,
    #                            transcript ids already sent over HTTP,
    #                            busy request count]
    streams_lock = threading.Lock()

    def _reap_streams():
        """Evict sessions idle past the TTL (abandoned clients would
        otherwise leak per-stream device + host state forever).
        Placeholders (open() still compiling — its first trace can exceed
        the TTL) are exempt; their open thread removes them on failure.
        Busy sessions (a push queued on the device lock longer than the
        TTL) are exempt too — evicting one would orphan an accepted push
        and destroy the carried LSTM state mid-request."""
        now = time.monotonic()
        with streams_lock:
            for sid in [
                s for s, v in streams.items()
                if v[0] is not None and v[3] == 0 and now - v[1] > stream_idle_s
            ]:
                del streams[sid]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                body = b"ok"
            elif self.path == "/info":
                body = json.dumps(
                    {
                        "model": service.config["model"],
                        "audio_len": service.audio_len,
                        "t_frames": service.t_frames,
                        "micro_batch": service.micro_batch,
                        "weights_version": service.weights_version,
                    }
                ).encode()
            elif self.path == "/metrics":
                # Prometheus text exposition format
                with streams_lock:
                    live = sum(1 for v in streams.values() if v[0] is not None)
                lines = [
                    "# TYPE avsi_utterances_enhanced_total counter",
                    f"avsi_utterances_enhanced_total {service.n_utterances}",
                    "# TYPE avsi_device_steps_total counter",
                    f"avsi_device_steps_total {service.n_device_steps}",
                    "# TYPE avsi_stream_pushes_total counter",
                    f"avsi_stream_pushes_total {service.n_stream_pushes}",
                    "# TYPE avsi_live_streams gauge",
                    f"avsi_live_streams {live}",
                    "# TYPE avsi_weights_version gauge",
                    f"avsi_weights_version {service.weights_version}",
                    "# TYPE avsi_uptime_seconds gauge",
                    f"avsi_uptime_seconds {time.monotonic() - service.started:.1f}",
                ]
                body = ("\n".join(lines) + "\n").encode()
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply(self, code, body):
            self._replied = True
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _do_stream(self):
            import urllib.parse
            import uuid

            path, _, query = self.path.partition("?")
            parts = path.split("/")[2:]  # after /stream/
            n = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(n)
            _reap_streams()
            if parts == ["open"]:
                from avsi.models.blstm import parse_model_name

                spec = parse_model_name(service.config["model"])
                q = urllib.parse.parse_qs(query)
                # absent -> model default (the trained LC window if the
                # config carries lc_chunk/lc_lookahead, else C=8/L=16)
                chunk = int(q["chunk"][0]) if "chunk" in q else None
                look = int(q["look"][0]) if "look" in q else None
                transcript = bool(int(q.get("transcript", ["0"])[0]))
                fill = bool(int(q.get("fill", ["0"])[0]))
                # atten=0.5 turns the causal deep-gap attenuation on for
                # this stream (atten=1 forces it OFF, overriding any
                # service-wide --gap_atten); absent -> service default
                gap_atten = "service-default"
                if "atten" in q:
                    alpha = float(q["atten"][0])
                    if not 0.0 <= alpha <= 1.0:
                        raise ValueError("atten must be in [0,1]")
                    gap_atten = None if alpha >= 1.0 else {
                        "alpha": alpha,
                        "trust": int(q.get("atten_trust", ["34"])[0]),
                        "ramp": int(q.get("atten_ramp", ["16"])[0]),
                    }
                if chunk is not None and not 1 <= chunk <= 256:
                    raise ValueError("chunk must be in [1,256]")
                if look is not None and not 0 <= look <= 256:
                    raise ValueError("look must be in [0,256]")
                if transcript and not spec.ctc:
                    raise ValueError(
                        f"model {service.config['model']} has no CTC head; "
                        "transcript=1 needs a -ctc variant"
                    )
                vf = 0 if spec.input_type == "a" else int(
                    service.config["video_feat_dim"]
                )
                # blstm-*-emb models condition on an external speaker
                # vector: the open body carries it as little-endian float32
                emb = None
                if raw:
                    if spec.conditioning != "emb":
                        raise ValueError(
                            f"model {service.config['model']} takes no "
                            "speaker embedding; /stream/open body must be empty"
                        )
                    if len(raw) % 4:
                        raise ValueError(
                            "embedding body must be little-endian float32"
                        )
                    emb = np.frombuffer(raw, "<f4").copy()
                    if emb.size != service.emb_dim:
                        # reject now — a wrong-size vector would otherwise
                        # surface later as an opaque 500 (fresh program:
                        # trace error at warm-up; cached program: retrace on
                        # the first push, inside the device lock)
                        raise ValueError(
                            f"embedding must be {service.emb_dim} float32 "
                            f"values; got {emb.size}"
                        )
                elif spec.conditioning == "emb":
                    raise ValueError(
                        "model needs an external speaker embedding: send it "
                        "as float32 bytes in the /stream/open body"
                    )
                # reserve the slot and insert under ONE lock acquisition
                # (check-then-insert under separate acquisitions would let
                # concurrent opens at the limit all pass the check); the
                # socket write happens outside the lock so a slow client
                # cannot stall other stream requests.
                sid = uuid.uuid4().hex[:12]
                with streams_lock:
                    full = len(streams) >= max_streams
                    if not full:
                        streams[sid] = [None, time.monotonic(), 0, 0]  # placeholder
                if full:
                    self._reply(429, b"too many live streams")
                    return
                try:
                    inp = service.open_stream(chunk, look, transcript=transcript,
                                              phase_fill=fill, embedding=emb,
                                              gap_atten=gap_atten)
                except Exception:
                    with streams_lock:
                        streams.pop(sid, None)
                    raise
                with streams_lock:
                    # unconditional (re-)insert: never KeyError even if the
                    # placeholder was somehow dropped while compiling
                    streams[sid] = [inp, time.monotonic(), 0, 0]
                self._reply(200, json.dumps({
                    "id": sid, "chunk_frames": inp.chunk, "lookahead_frames": inp.look,
                    "frame_step": 192, "frame_length": 384,
                    "video_feat_dim": vf, "transcript": transcript,
                    "gap_atten": inp.gap_atten,
                }).encode())
                return
            sid = parts[0]
            closing = len(parts) > 1 and parts[1] == "close"
            with streams_lock:
                entry = streams.get(sid)
                if entry is not None and entry[0] is None:
                    entry = None  # placeholder: open() still in flight
                if entry is not None:
                    entry[1] = time.monotonic()
                    entry[3] += 1  # busy: the reaper must not evict us
                                   # while we wait on the device lock
            if entry is None:
                self._reply(404, b"no such stream")
                return
            inp = entry[0]
            try:
                with service._lock:  # one device stream
                    if closing:
                        out = inp.flush()
                        with streams_lock:
                            streams.pop(sid, None)
                    else:
                        n_samples, n_frames = struct.unpack_from("<ii", raw, 0)
                        off = 8
                        wave = np.frombuffer(raw, "<i2", n_samples, off)
                        off += 2 * n_samples
                        mask = np.frombuffer(raw, np.uint8, n_frames, off)
                        off += n_frames
                        if mask.size and mask.max() > 1:
                            raise ValueError("frame mask bytes must be 0 or 1")
                        video = None
                        if inp.spec.input_type != "a":
                            # visual rows ride as f16 (the payload-compaction
                            # convention): n_frames x video_feat_dim
                            video = np.frombuffer(
                                raw, "<f2", n_frames * inp.vf, off
                            ).astype(np.float32).reshape(n_frames, inp.vf)
                        out = inp.push(
                            wave.astype(np.float32), mask.astype(np.float32),
                            video,
                        )
                        service.n_stream_pushes += 1
                    body = np.clip(out, -32768, 32767).astype("<i2").tobytes()
                    if inp.want_transcript:
                        # framed reply:
                        # <i4 n_wav_samples> wav_i2[] new_label_ids_i2[].
                        # The cursor is HTTP-session state, so it lives in
                        # the streams entry, not on the inference object.
                        # Stays under the push lock: concurrent pushes on one
                        # stream must each see/advance the cursor exactly once
                        # or label ids get duplicated across replies.
                        new_ids = inp.transcript[entry[2] :]
                        entry[2] = len(inp.transcript)
                        body = (
                            struct.pack("<i", len(out))
                            + body
                            + np.asarray(new_ids, "<i2").tobytes()
                        )
            finally:
                with streams_lock:
                    entry[3] -= 1
                    entry[1] = time.monotonic()
            self._reply(200, body)

        def do_POST(self):
            # client errors -> 400 with the message; anything else is a
            # server bug -> opaque 500 (no internal detail leaked). If a
            # response was already started (including a 200 whose body write
            # died on a closed client socket), never write a second one into
            # the same connection.
            self._replied = False
            if self.path.startswith("/stream/"):
                try:
                    self._do_stream()
                except (ValueError, KeyError, IndexError, struct.error) as e:
                    if not self._replied:
                        self._reply(400, str(e).encode())
                except Exception:
                    if not self._replied:
                        self._reply(500, b"internal error")
                return
            if self.path == "/reload":
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    raw = self.rfile.read(n)
                    path = raw.decode().strip() or None
                    version = service.reload(path)
                    self._reply(200, json.dumps({"weights_version": version}).encode())
                except (ValueError, FileNotFoundError, KeyError) as e:
                    if not self._replied:
                        self._reply(400, str(e).encode())
                except Exception:
                    if not self._replied:
                        self._reply(500, b"internal error")
                return
            if self.path != "/enhance":
                self.send_response(404)
                self.end_headers()
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n)
                n_samples, t_frames = struct.unpack_from("<ii", raw, 0)
                if n_samples != service.audio_len or t_frames != service.t_frames:
                    raise ValueError(
                        f"expected {service.audio_len} samples / "
                        f"{service.t_frames} frames, got {n_samples}/{t_frames}"
                    )
                off = 8
                wave = np.frombuffer(raw, "<i2", n_samples, off).astype(np.float32)
                off += 2 * n_samples
                mask = np.frombuffer(raw, np.uint8, t_frames, off)
                if mask.size and mask.max() > 1:
                    raise ValueError("frame mask bytes must be 0 or 1")
                off += t_frames
                emb = None
                if service.emb_dim:  # <f4 speaker vector after the mask
                    if len(raw) - off != 4 * service.emb_dim:
                        raise ValueError(
                            f"model {service.config['model']} needs a "
                            f"{service.emb_dim}-float32 speaker embedding "
                            "after the mask bytes"
                        )
                    emb = np.frombuffer(raw, "<f4", service.emb_dim, off).copy()
                elif len(raw) != off:
                    # trailing bytes on a non-emb model mean the client is
                    # configured for a different model — reject, don't drop
                    raise ValueError(
                        f"model {service.config['model']} takes no speaker "
                        f"embedding; {len(raw) - off} unexpected trailing bytes"
                    )
                enhanced = service.enhance(wave, mask.astype(np.float32), emb)
                self._reply(200, enhanced.astype("<i2").tobytes())
            except (ValueError, struct.error) as e:
                # malformed request -> 400 with the message
                if not self._replied:
                    self._reply(400, str(e).encode())
            except Exception:
                # server bug (device/XLA failure, bad reload) -> opaque 500,
                # same contract as /stream — no internal detail on the wire
                if not self._replied:
                    self._reply(500, b"internal error")

    server = ThreadingHTTPServer((host, port), Handler)
    server.service = service  # exposed for tests / embedding callers

    # periodic reaper: without it the TTL is only checked on incoming
    # /stream requests, so abandoned sessions would pin per-stream device
    # carries (and max_streams slots) forever once stream traffic stops
    reap_stop = threading.Event()

    def _reap_loop():
        while not reap_stop.wait(max(1.0, min(stream_idle_s / 4, 60.0))):
            _reap_streams()

    threading.Thread(target=_reap_loop, daemon=True, name="avsi-reaper").start()
    orig_shutdown = server.shutdown

    def _shutdown():
        reap_stop.set()
        orig_shutdown()

    server.shutdown = _shutdown
    # the BOUND port (port=0 asks the OS for an ephemeral one)
    print(f"avsi inpainting service on http://{host}:{server.server_address[1]} "
          f"(model {service.config['model']})")
    return server  # caller runs serve_forever()
