"""Streaming-inference latency benchmark (avsi/infer/streaming.py).

Measures per-window wall latency and real-time factor of the LC-BLSTM
streaming path on the flagship model shape, plus the device-only cost of
the fused window program (timed with the repeat-inside-jit pattern —
`jax.block_until_ready` does not wait under the axon relay, see bench.py).

Usage: python scripts/stream_bench.py [--chunk 8] [--look 16] [--reps 5]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--look", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--model", default="av-blstm-ssnn-ctc")
    ap.add_argument("--data_shards", type=int, default=0,
                    help="shard the fleet over a data mesh of N devices "
                         "(0 = single device)")
    ap.add_argument("--fleet", type=int, default=0,
                    help="also bench N lockstep streams through one "
                    "batched window program (multi-tenant serving shape)")
    ap.add_argument("--lstm_impl", default="scan",
                    help="LC window recurrence: scan (default) or pallas "
                    "(the fused window kernel, single-device only)")
    args = ap.parse_args()

    import jax

    from avsi.infer import streaming
    from avsi.models import blstm as blstm_lib

    config = {
        "model": args.model, "audio_feat_dim": 257, "video_feat_dim": 136,
        "audio_len": 48000, "net_dim": [250, 250, 250],
        "integration_layer": 0, "dropout_rate": 0.0, "num_asr_labels": 34,
        "ctc_loss": 0.001, "embedding_dim": 512, "compute_dtype": "float32",
    }
    params = blstm_lib.init(jax.random.PRNGKey(0), config)
    stats = (np.zeros(257, np.float32), np.ones(257, np.float32))
    inp = streaming.StreamingInpainter(
        config, stats, params,
        chunk_frames=args.chunk, lookahead_frames=args.look,
        lstm_impl=args.lstm_impl,
    )

    rng = np.random.RandomState(0)
    wave = (3000 * rng.randn(48000)).astype(np.float32)
    mask = np.ones(250, np.float32)
    mask[100:160] = 0.0
    video = rng.randn(250, 136).astype(np.float32)
    spec = blstm_lib.parse_model_name(args.model)
    vid = video if spec.input_type != "a" else None

    streaming.stream_utterance(inp, wave, mask, vid)  # compile
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        out = streaming.stream_utterance(inp, wave, mask, vid)
        times.append(time.time() - t0)
    dt = min(times)
    n_windows = -(-250 // args.chunk)
    assert out.shape == (48000,) and np.isfinite(out).all()
    if args.fleet:
        b = args.fleet
        fleet_mesh = None
        if args.data_shards > 1:
            from avsi.parallel import mesh as mesh_lib

            fleet_mesh = mesh_lib.get_mesh(args.data_shards)
        waves = (3000 * rng.randn(b, 48000)).astype(np.float32)
        fmask = np.tile(mask, (b, 1))
        vids = rng.randn(b, 250, 136).astype(np.float32) if vid is not None else None
        pcache: dict = {}  # steady-state serving shares the traced program
        streaming.stream_utterances_lockstep(  # compile
            config, stats, params, waves, fmask, vids,
            chunk_frames=args.chunk, lookahead_frames=args.look,
            mesh=fleet_mesh, program_cache=pcache, lstm_impl=args.lstm_impl,
        )
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            fo = streaming.stream_utterances_lockstep(
                config, stats, params, waves, fmask, vids,
                chunk_frames=args.chunk, lookahead_frames=args.look,
                mesh=fleet_mesh, program_cache=pcache, lstm_impl=args.lstm_impl,
            )
            ts.append(time.time() - t0)
        fdt = min(ts)
        assert fo.shape == (b, 48000)
        # each window advances chunk*12 ms of audio PER STREAM; real-time
        # capacity = streams the chip sustains at <= real time
        rtf_fleet = b * 3.0 / fdt
        print(json.dumps({
            "metric": "streaming_fleet",
            "value": round(rtf_fleet, 1),
            "unit": "concurrent_realtime_streams_per_chip",
            "fleet": b,
            "data_shards": args.data_shards,
            "wall_s_per_3s_utt_fleet": round(fdt, 3),
            "ms_per_window_fleet": round(1000 * fdt / n_windows, 1),
        }))

    print(json.dumps({
        "metric": "streaming_window_latency",
        "value": round(1000 * dt / n_windows, 1),
        "unit": "ms/window_wall",
        "chunk_frames": args.chunk,
        "lookahead_frames": args.look,
        "algorithmic_latency_ms": 12 * (args.chunk + args.look),
        "audio_ms_per_window": 12 * args.chunk,
        "real_time_factor": round(3.0 / dt, 2),
        "model": args.model,
        "lstm_impl": args.lstm_impl,
        "n_windows": n_windows,
        "utterance_s_wall": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
