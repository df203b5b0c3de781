"""Streaming-transcript PER at live latency (round-2 verdict item #6).

Measures the phoneme error rate of the flagship MTL model's CTC head in
LC-BLSTM streaming mode (incremental greedy decode over emitted chunks,
chunk=8 / lookahead=16 -> 288 ms algorithmic latency) against (a) the
offline greedy decode of the same model and (b) the ground-truth
transcriptions — on held-out drill-corpus utterances.  The deltas isolate
what live low-latency transcription costs: the forward recurrent state is
exact, so the only loss is backward context beyond the lookahead.

Usage: python scripts/stream_per.py [model_dir] [test_tfrecords] [n_utts]
Writes stream_per.json next to the model dir.
"""

import glob
import json
import os
import sys

import numpy as np


def main(model_dir="/dev/shm/grid_drill/exp_si/netmodel",
         test_dir="/dev/shm/grid_drill/grouped/test-set", n_utts=64,
         chunk=8, look=16):
    import jax

    from avsi.data import reader as reader_lib
    from avsi.infer import streaming
    from avsi.infer.inpaint import load_model_bundle
    from avsi.models import blstm as blstm_lib
    from avsi.ops import ctc as ctc_ops

    config, stats, model, params = load_model_bundle(model_dir, norm=True)
    spec = blstm_lib.parse_model_name(config["model"])
    assert spec.ctc, "flagship must have a CTC head"
    dm = reader_lib.DataManager(
        num_audio_samples=config["audio_len"],
        audio_feat_size=config["audio_feat_dim"],
        video_feat_size=config["video_feat_dim"],
    )
    files = sorted(glob.glob(os.path.join(test_dir, "*.tfrecord")))
    stats_j = (np.asarray(stats[0], np.float32), np.asarray(stats[1], np.float32))

    offline_dec, stream_dec, refs = [], [], []
    waves, fmasks, vids = [], [], []
    fwd = jax.jit(
        lambda p, b: blstm_lib.forward(p, b, config, stats_j, spec=spec, train=False)[
            "asr_logits"
        ]
    )
    done = 0
    for batch in dm.batches(files, 8):
        dev = {k: v for k, v in batch.items() if k != "sample_paths"}
        logits = np.asarray(fwd(params, dev))
        dec = np.asarray(
            ctc_ops.greedy_decode(logits, batch["sequence_lengths"])
        )
        n = batch.get("num_real", len(batch["sequence_lengths"]))
        for i in range(n):
            offline_dec.append([int(x) for x in dec[i] if x >= 0])
            ll = int(batch["labels_lengths"][i])
            refs.append([int(x) for x in batch["labels"][i][:ll]])
            # keep the streaming inputs from this same pass (a second
            # dm.batches sweep would re-parse the whole corpus)
            waves.append(np.asarray(batch["target_sources"][i], np.float32))
            fmasks.append(np.asarray(batch["masks"][i, :, 0], np.float32))
            vids.append(np.asarray(batch["video_features"][i], np.float32))
            done += 1
            if done >= n_utts:
                break
        if done >= n_utts:
            break
    # streaming transcripts for the same utterances in ONE lockstep fleet:
    # per-window dispatch covers all streams at once (the single-stream
    # path pays one relay round trip per window per utterance)
    _, stream_dec = streaming.stream_utterances_lockstep(
        config, stats, params, np.stack(waves), np.stack(fmasks),
        np.stack(vids), chunk_frames=chunk, lookahead_frames=look,
        transcript=True,
    )

    out = {
        "model": config["model"],
        "chunk_frames": chunk,
        "lookahead_frames": look,
        "latency_ms": (chunk + look) * 12,
        "n_utts": done,
        "per_offline": ctc_ops.per_metric(offline_dec, refs),
        "per_streaming": ctc_ops.per_metric(stream_dec, refs),
        "per_stream_vs_offline": ctc_ops.per_metric(stream_dec, offline_dec),
    }
    with open(os.path.join(os.path.dirname(model_dir), "stream_per.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*a[:2], **({"n_utts": int(a[2])} if len(a) > 2 else {}))
