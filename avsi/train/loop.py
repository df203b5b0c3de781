"""Unified training loop for inpainting and ASR models.

One driver replaces the reference's four near-duplicate trainers
(`training.py`, `training_emb.py`, `training_ctc.py`, `training_asr.py` —
each ~400 LoC of copy-paste; SURVEY.md §2.1 C15-C18), keeping their
behavior: epoch loop with per-epoch validation, NaN/Inf abort
(training.py:244-249), periodic checkpoint every 1000 steps (:266-268),
best-validation checkpoint `sinet` (inpainting; selection = val inpainting
loss, training_ctc.py:383-389) or `asrnet` (ASR; selection = val PER,
training_asr.py:307-312), early stopping after `n_earlystop_epochs`
(:340-342), `training_log.txt` TSV (:167-185,357-360), and a self-contained
checkpoint dir carrying config + mu/sigma stats (:121-127).

TPU-native differences: the whole step (feature extraction -> model ->
loss -> grads -> optimizer) is ONE jitted function, batches are sharded
over the `data` mesh axis (grad all-reduce inserted by XLA), and PER is
computed with the jittable greedy decoder instead of running beam search
every step (a reference inefficiency — SURVEY.md §3.1). With
`device_cache_corpus = 1` the compacted corpus is kept in HBM after epoch
0 (GRID compacts to ~5 GB << v5e's 16 GB), so later epochs run with zero
host->device input traffic — the input pipeline cost is paid once.
"""

from __future__ import annotations

import contextlib
import math
import os
import signal
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from avsi import config as config_lib
from avsi.data import reader as reader_lib
from avsi.data import stats as stats_lib
from avsi.data.tfrecord import count_records, list_tfrecord_files
from avsi.infer.common import per_sample_losses as _per_sample_l1
from avsi.models import asr as asr_model
from avsi.models import registry
from avsi.ops import ctc as ctc_ops
from avsi.parallel import distributed as dist_lib
from avsi.parallel import mesh as mesh_lib
from avsi.train import checkpoints, state as state_lib
from avsi.train.tb import SummaryWriter


@contextlib.contextmanager
def _preemption_flag():
    """Catch SIGTERM — what a cluster scheduler or a preempted TPU VM
    sends — and expose it as a flag the step loop polls, so training can
    finish the in-flight step, write a full resume checkpoint (params +
    optimizer state + step) and exit cleanly instead of dying mid-epoch.
    TPU-native addition; the reference (SURVEY.md §5) has no failure
    handling beyond the NaN abort.  No-op outside the main thread
    (signal.signal would raise there); the previous handler is restored
    on exit so in-process callers (tests, fleet scripts) keep their
    process-level SIGTERM semantics."""
    flag = {"hit": False}

    def _on_term(signum, frame):
        flag["hit"] = True

    not_installed = object()  # signal.signal legitimately returns None for
    # a C-level prior handler — None must not be read as "never installed"
    try:
        prev = signal.signal(signal.SIGTERM, _on_term)
    except ValueError:  # not the main thread
        prev = not_installed
    try:
        yield flag
    finally:
        if prev is not not_installed:
            signal.signal(signal.SIGTERM, prev if prev is not None else signal.SIG_DFL)


def _log(logfile, msg):
    print(msg, flush=True)
    if logfile:
        with open(logfile, "a") as f:
            f.write(msg + "\n")


class _NullTB:
    """TB sink for non-main hosts: every host computes the same metrics but
    only process 0 owns the event files."""

    def scalar(self, *a, **k): pass
    def image(self, *a, **k): pass
    def audio(self, *a, **k): pass
    def flush(self): pass
    def close(self): pass


def exit_if_preempted(summary: dict, code: int = 143) -> None:
    """Exit the process if `summary` came from a SIGTERM-preempted train().

    Multi-model drivers must call this (or use train_or_exit) after every
    train(): the preempted run has already written its full resume
    checkpoint, and the scheduler's grace period is ticking — starting the
    next model would get SIGKILLed mid-run.  Exit code 143 = 128+SIGTERM,
    the conventional 'terminated on request' status."""
    if summary.get("preempted"):
        print("# preempted: resume checkpoint written, exiting", flush=True)
        raise SystemExit(code)


def train_or_exit(*args, **kwargs) -> dict:
    """train(), but exit the process after a SIGTERM preemption instead of
    returning — the right call for scripts that train several models."""
    from avsi.utils import cache as _cache

    _cache.enable()  # study scripts retrain identical programs across runs
    summary = train(*args, **kwargs)
    exit_if_preempted(summary)
    return summary


def make_train_step(model, tx, config, stats):
    stats = (jnp.asarray(stats[0]), jnp.asarray(stats[1]))

    def loss_fn(params, batch, rng):
        # registry dispatch: for ASR models `model.losses` IS asr.losses
        out = model.forward(params, batch, config, stats, train=True, rng=rng)
        l = model.losses(out, batch, config)
        return l["loss"], (l, out)

    def train_step(train_state, batch, rng):
        batch = mesh_lib.expand_batch(batch, int(config["audio_feat_dim"]))
        (loss, (ldict, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_state.params, batch, rng
        )
        updates, new_opt = tx.update(grads, train_state.opt_state, train_state.params)
        new_params = optax.apply_updates(train_state.params, updates)
        if getattr(model, "apply_aux_update", None) is not None:
            new_params = model.apply_aux_update(new_params, out)
        new_state = state_lib.TrainState(new_params, new_opt, train_state.step + 1)
        return new_state, ldict

    return train_step


def make_eval_step(model, config, stats, is_asr=False):
    stats = (jnp.asarray(stats[0]), jnp.asarray(stats[1]))

    def eval_step(params, batch):
        batch = mesh_lib.expand_batch(batch, int(config["audio_feat_dim"]))
        out = model.forward(params, batch, config, stats, train=False)
        if is_asr:
            # per-sequence loss: the host drops pad_final filler rows
            lengths = out.get("logit_lengths", batch["sequence_lengths"])
            loss_ps = ctc_ops.ctc_loss_per_seq(
                out["logits"], lengths, batch["labels"], batch["labels_lengths"]
            )
            decoded = asr_model.decode_greedy(out, batch)
            return {"loss_ps": loss_ps, "decoded": decoded}
        l = model.losses(out, batch, config)
        total, hole = _per_sample_l1(out, batch)
        res = {"loss_ps": total, "loss_hole_ps": hole}
        if "ctc_loss" in l:
            # per-sequence CTC so the host drops pad_final duplicates and
            # multi-host filler rows exactly like loss_ps — a global-batch
            # scalar mean would count other hosts' num_real=0 filler
            res["ctc_ps"] = ctc_ops.ctc_loss_per_seq(
                out["asr_logits"], batch["sequence_lengths"],
                batch["labels"], batch["labels_lengths"],
            )
            res["decoded"] = ctc_ops.greedy_decode(
                out["asr_logits"], batch["sequence_lengths"]
            )
        return res

    return eval_step


def _host_per(decoded: np.ndarray, batch: dict) -> float:
    dec = []
    labs = []
    n = batch.get("num_real", len(batch["sequence_lengths"]))
    for i in range(n):
        dec.append([int(x) for x in decoded[i] if x >= 0])
        ll = int(batch["labels_lengths"][i])
        labs.append([int(x) for x in batch["labels"][i][:ll]])
    return ctc_ops.per_metric(dec, labs)


def train(config_file: str, is_asr: bool = False, corpus_cache: dict | None = None) -> dict:
    """Train one model per the config file. Returns summary metrics.

    corpus_cache: optional dict shared across train() calls in one process.
    On first use it is populated with the device-resident compacted corpus
    ({"train": [batches], "val": [(meta, batch)]}); later calls train
    straight from HBM with ZERO host->device input traffic — on a slow
    host<->device link the corpus upload is by far the dominant cost, so
    training several models on the same corpus (e.g. the SI flagship and
    its ASR judge) should pay it once.  Caller must keep batch_size, the
    corpus, and the embedding requirement (models.needs_embeddings)
    identical across sharing calls — an embeddings mismatch is rejected."""
    config = config_lib.check_trainconfiguration(config_lib.load_configfile(config_file))
    model_name = config["model"]
    exp_folder = config["exp_folder"]
    ckpt_dir = os.path.join(exp_folder, "netmodel")
    os.makedirs(ckpt_dir, exist_ok=True)
    logfile = os.path.join(exp_folder, "training_log.txt")

    # multi-host (jax.distributed already initialized by the caller — CLI
    # --coordinator flags or a cluster launcher): every host runs this same
    # function; file writes (bundle, logs, TB, checkpoints) belong to
    # process 0, data is sharded per host, and metric reductions go through
    # gather_hosts so every host takes identical best-val/early-stop
    # branches.  Checkpoint/resume paths must be on a filesystem all hosts
    # can read (shared FS, or one machine in the 2-process test).
    multihost = dist_lib.active()
    main_host = dist_lib.is_main()

    # inpainting stats must match the model's spectrogram bins (the unet
    # family models the first 128 of 129 STFT bins); ASR stats are 80-bin
    # log-mel, independent of audio_feat_dim — never sliced
    feat_dim = None if is_asr else int(config["audio_feat_dim"])
    if main_host:
        # self-contained checkpoint dir: config + stats (training.py:121-127)
        stats = checkpoints.write_bundle(ckpt_dir, config_file, config, feat_dim=feat_dim)
        checkpoints.write_meta(ckpt_dir, config)
    else:
        stats = stats_lib.load_stats(
            config["audio_feat_mean"], config["audio_feat_std"], feat_dim=feat_dim
        )

    model = (
        registry.get_asr_model(model_name) if is_asr else registry.get_model(model_name)
    )

    dm = reader_lib.DataManager(
        num_audio_samples=config["audio_len"],
        audio_feat_size=config["audio_feat_dim"],
        video_feat_size=config["video_feat_dim"],
        with_embedding=model.needs_embeddings,
        seed=config.get("seed", 0),
    )
    train_files = list_tfrecord_files(os.path.join(config["root_folder"], "training-set"))
    val_files = list_tfrecord_files(os.path.join(config["root_folder"], "validation-set"))
    if not train_files:
        raise ValueError(f"no training tfrecords under {config['root_folder']}")
    # per-host input sharding (SURVEY §2.4): each process reads only its own
    # file shard; the global batch is assembled below.  Hosts must agree on
    # steps-per-epoch BEFORE any collective runs (a host with more local
    # batches would hang in the gradient all-reduce), so each counts its
    # shard's records (cheap frame-walk, no decode) and all take min/max.
    steps_per_epoch = None
    val_batches_global = None
    if multihost:
        pc = jax.process_count()
        if int(config["batch_size"]) % pc:
            raise ValueError(
                f"batch_size {config['batch_size']} (global) must divide over "
                f"{pc} processes"
            )
        train_files = dist_lib.shard_files(train_files)
        if val_files:
            val_files = dist_lib.shard_files(val_files)
        local_bs = int(config["batch_size"]) // pc
        n_train_local = sum(count_records(f) for f in train_files)
        n_val_local = sum(count_records(f) for f in val_files)
        counts = dist_lib.gather_hosts(
            [n_train_local // local_bs, -(-n_val_local // local_bs)]
        )
        steps_per_epoch = int(counts[:, 0].min())  # drop_remainder semantics
        val_batches_global = int(counts[:, 1].max())  # pad short hosts
        if steps_per_epoch == 0:
            raise ValueError(
                "a host's training shard holds fewer samples than its "
                f"local batch ({local_bs}) — regroup the corpus or shrink "
                "batch_size"
            )
    else:
        local_bs = int(config["batch_size"])

    rng = jax.random.PRNGKey(config.get("seed", 0))
    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, config)

    if config["model_ckp_vnet"] and model_name == "av-blstm-twosteps":
        vnet, _, _ = checkpoints.restore_checkpoint(
            os.path.dirname(config["model_ckp_vnet"]) or ".",
            os.path.basename(config["model_ckp_vnet"]),
            params["vnet"],
        )
        params = dict(params, vnet=vnet)
        print(f"Restored vnet from {config['model_ckp_vnet']}")

    mask = model.trainable_mask(params) if model.trainable_mask else None
    tx = state_lib.make_optimizer(config, mask)
    opt_state = tx.init(params)
    start_step = 0

    # optional warm start / resume (training.py:115-166; optimizer moments
    # and the global step are restored too when the sidecar .opt exists,
    # mirroring tf.train.Saver's save-all-variables behavior)
    if config["model_ckp"]:
        params, restored_opt, start_step = checkpoints.restore_checkpoint(
            os.path.dirname(config["model_ckp"]) or ".",
            os.path.basename(config["model_ckp"]),
            params,
            opt_template=opt_state,
        )
        if restored_opt is not None:
            opt_state = restored_opt
        print(f"Restored model from {config['model_ckp']} (step {start_step})")

    train_state = state_lib.TrainState(params, opt_state, jnp.int32(start_step))

    mesh = mesh_lib.get_mesh(
        config.get("num_data_shards", 0),
        model_shards=int(config.get("num_model_shards", 1)),
    )
    n_dev = mesh.devices.size
    n_data = int(mesh.shape["data"])
    batch_size = int(config["batch_size"])
    use_mesh = batch_size % n_data == 0 and n_dev > 1
    if not use_mesh and int(config.get("num_model_shards", 1)) > 1:
        # an explicitly requested tensor-parallel axis must never be
        # silently dropped — the model may only FIT sharded
        raise ValueError(
            f"num_model_shards={config['num_model_shards']} requires "
            f"batch_size divisible by the data axis ({n_data}); got "
            f"{batch_size}"
        )
    if multihost and not use_mesh:
        raise ValueError(
            f"multi-host training needs the global batch ({batch_size}) "
            f"divisible by the data axis ({n_data})"
        )
    if multihost and int(config.get("num_model_shards", 1)) > 1:
        # per-host batch feeding assumes each process owns WHOLE data-axis
        # rows (model axis inside a host, riding the fast local links);
        # a model group straddling hosts would need replicated input rows
        # fed identically by several processes — unsupported by design
        m = int(config["num_model_shards"])
        if len(jax.local_devices()) % m:
            raise ValueError(
                f"num_model_shards={m} must divide the local device count "
                f"({len(jax.local_devices())}) so tensor-parallel groups "
                "never straddle hosts"
            )
    if n_dev > 1 and not use_mesh:
        print(
            f"WARNING: mesh disabled — batch_size {batch_size} not divisible "
            f"by {n_data} data shards; training runs on one device"
        )

    # BLSTM recurrence implementation for this run: "auto" (default) takes
    # the fused Pallas kernel — differentiable via its custom VJP
    # (ops/pallas_lstm.py) — on a single-host TPU, including data-sharded
    # meshes (shard_map over the data axis; the per-shard program is the
    # same single-device kernel and the dparams psum is the transpose of
    # the replicated in_spec).  The lax.scan remains under tensor
    # parallelism (the kernel wants whole params), multi-host, and
    # off-TPU.  Measured at the flagship shape: layer fwd+bwd 5.62 ->
    # 3.38 ms bf16, 7.31 -> 4.82 ms fp32.  LC training (lc_chunk) has its
    # own window-space path and always scans regardless of this key.
    from avsi.ops import pallas_lstm

    config["lstm_impl"] = pallas_lstm.resolve_impl(
        config.get("lstm_impl", "auto"),
        sharded=use_mesh or multihost,
        batch_size=int(config.get("batch_size", 0)) or None,
        mesh=mesh if use_mesh else None,
        multihost=multihost,
    )
    if config["lstm_impl"] == "pallas" and use_mesh:
        config["lstm_mesh"] = mesh  # runtime-only key, never serialized

    train_step = jax.jit(make_train_step(model, tx, config, stats), donate_argnums=0)
    eval_step = jax.jit(make_eval_step(model, config, stats, is_asr))

    def place(batch):
        compacted = mesh_lib.compact_batch(batch)
        if multihost:
            # compact_batch falls back PER BATCH on data properties (soft
            # masks, non-int16 waveforms): one host compacting a batch the
            # others don't would assemble divergent global pytrees and hang
            # the job mid-epoch with no diagnostic.  Check the signature on
            # EVERY batch — a one-shot check at batch 0 cannot see a later
            # fallback; the per-batch assert is one small host collective on
            # a path that already pays a global-batch assembly per step, and
            # on mismatch it fails fast everywhere with the payload
            sig = ",".join(
                f"{k}:{np.asarray(v).dtype}" for k, v in sorted(compacted.items())
            )
            dist_lib.assert_uniform("batch compaction signature", sig)
            # compact_batch output is already device-only keys (+ the
            # compaction's own mask_frames)
            return dist_lib.global_batch(compacted, mesh, tuple(compacted.keys()))
        if use_mesh:
            return mesh_lib.shard_batch(compacted, mesh)
        return compacted

    if use_mesh:
        train_state = mesh_lib.shard_state(train_state, mesh)

    tb = SummaryWriter(os.path.join(exp_folder, "tb")) if main_host else _NullTB()
    if not main_host:
        logfile = None  # non-main hosts compute but never write
    header = " | ".join(f"{k}={config[k]}" for k in (
        "model", "net_dim", "batch_size", "optimizer_type", "starter_learning_rate",
        "dropout_rate", "max_n_epochs", "n_earlystop_epochs",
    ))
    if main_host:
        _log(logfile, f"# {header}")
        _log(logfile, f"# devices={n_dev} mesh={'on' if use_mesh else 'off'}"
             + (f" processes={jax.process_count()} steps/epoch={steps_per_epoch}"
                if multihost else ""))

    best_val = math.inf
    best_epoch = -1
    cneg_epochs = 0
    step = start_step
    summary = {}
    # losses accumulate ON DEVICE; the host fetches only every
    # `nan_check_every` steps (each fetch is a full tunnel round-trip —
    # fetching per step serializes training on slow links)
    nan_check_every = int(config.get("nan_check_every", 100))
    # progress-print cadence never fetches more often than the NaN check
    # (a user raising nan_check_every for a slow link must not still pay a
    # blocking fetch every 200 steps)
    log_every = max(200, nan_check_every)
    # optional device trace: config `profile_steps = N` traces steps
    # 3..3+N of epoch 0 into <exp_folder>/profile (TensorBoard-readable)
    profile_steps = int(config.get("profile_steps", 0))
    profile_dir = os.path.join(exp_folder, "profile")
    trace_active = False
    # device-resident corpus cache (TPU-native; no reference counterpart):
    # when `device_cache_corpus = 1` and the compacted corpus fits in HBM
    # (GRID is ~5 GB compacted), epoch 0 streams batches once and keeps the
    # device arrays; later epochs iterate them in a fresh random order with
    # ZERO host->device input traffic. Deviation from per-epoch sample
    # reshuffling: epoch 0 fixes the sample->batch assignment (shuffled
    # once); afterwards shuffling is at batch granularity.
    device_cache = (
        bool(int(config.get("device_cache_corpus", 0)))
        and int(config["max_n_epochs"]) > 1
    ) or corpus_cache is not None
    if corpus_cache is not None:
        cached_train = corpus_cache.setdefault("train", [])
        cached_val = corpus_cache.setdefault("val", [])
        # Stamp the cache with the parameters the batches were built under:
        # a later call with a different corpus/batch geometry must not
        # silently train on the first call's cached data (same-shape
        # different-corpus reuse would train on the WRONG data, no error).
        stamp = {
            "root_folder": os.path.abspath(str(config["root_folder"])),
            "batch_size": int(config["batch_size"]),
            "audio_len": int(config["audio_len"]),
            "audio_feat_dim": int(config["audio_feat_dim"]),
            "video_feat_dim": int(config["video_feat_dim"]),
            # cached device arrays carry their placement: a call with a
            # different mesh geometry must not consume them (the RESOLVED
            # data-axis size, not the raw config value — num_data_shards=0
            # resolves differently under different num_model_shards)
            "mesh_data_axis": n_data if use_mesh else 1,
        }
        prev = corpus_cache.setdefault("stamp", stamp)
        if prev != stamp:
            raise ValueError(
                f"shared corpus_cache was built for {prev} but this train() "
                f"call uses {stamp} — use a separate cache"
            )
        if cached_train and not corpus_cache.get("complete"):
            # the previous fill aborted mid-epoch-0 (NaN abort, preemption):
            # cached_train holds only part of the corpus and cached_val may
            # be empty — treating it as complete would silently train on a
            # partial corpus with no validation. Discard and refill.
            cached_train.clear()
            cached_val.clear()
    else:
        cached_train = []
        cached_val = []
    prefilled = bool(cached_train)  # a previous train() call uploaded it
    if prefilled and model.needs_embeddings and "embeddings" not in cached_train[0]:
        raise ValueError(
            f"shared corpus_cache was built without speaker embeddings but "
            f"model {model_name} needs them — use a separate cache"
        )
    cache_rng = np.random.default_rng(int(config.get("seed", 0)) + 101)
    media_cache: dict = {}  # device-resident TB media batch + jitted step
    with _preemption_flag() as preempt:
        try:
            for epoch in range(int(config["max_n_epochs"])):
                t_epoch = time.time()
                loss_accum = None
                n_acc = 0
                from_cache = device_cache and (epoch > 0 or prefilled)
                if from_cache:
                    train_iter = (cached_train[i] for i in cache_rng.permutation(len(cached_train)))
                else:
                    train_iter = dm.prefetch_batches(
                        train_files, local_bs, shuffle=True, drop_remainder=True
                    )
                    if steps_per_epoch is not None:
                        # multi-host: every host must run the SAME number of
                        # steps (min over hosts) or the grad all-reduce hangs;
                        # the cached path inherits the truncation from epoch 0
                        import itertools

                        train_iter = itertools.islice(train_iter, steps_per_epoch)
                for batch in train_iter:
                    rng, step_rng = jax.random.split(rng)
                    if multihost:
                        # every host derives the identical key (same seed,
                        # same split sequence); commit it to the global mesh
                        # so the jitted step sees only global arrays
                        step_rng = jax.device_put(
                            step_rng, mesh_lib.replicated(mesh)
                        )
                    if profile_steps and step - start_step == 3:
                        jax.profiler.start_trace(profile_dir)
                        trace_active = True
                    placed = batch if from_cache else place(batch)
                    if device_cache and epoch == 0 and not prefilled:
                        if not use_mesh:  # mesh place() already device_put with sharding
                            placed = jax.device_put(placed)
                        cached_train.append(placed)
                    train_state, ldict = train_step(train_state, placed, step_rng)
                    step += 1
                    if trace_active and step - start_step == 3 + profile_steps:
                        # scalar fetch, not block_until_ready: the latter returns
                        # immediately under the axon relay (CLAUDE.md gotcha) and
                        # the trace would stop before the steps actually ran
                        float(ldict["loss"])
                        jax.profiler.stop_trace()
                        trace_active = False
                        profile_steps = 0
                        _log(logfile, f"# profiler trace written to {profile_dir}")
                    loss_accum = (
                        ldict
                        if loss_accum is None
                        else jax.tree_util.tree_map(jnp.add, loss_accum, ldict)
                    )
                    n_acc += 1
                    # each host fetch of the device loss is a full tunnel
                    # round-trip, so both the NaN check and the progress print
                    # respect nan_check_every (0 disables the per-step NaN abort
                    # entirely — the progress print still fetches at its own
                    # 200-step cadence but must not turn into a surprise abort;
                    # the end-of-epoch check below still catches NaN runs)
                    do_nan = bool(nan_check_every) and step % nan_check_every == 0
                    if do_nan or step % log_every == 0:
                        loss = float(ldict["loss"])
                        if do_nan and not np.isfinite(loss):
                            raise FloatingPointError(
                                f"NaN/Inf loss at step {step} — aborting (reference "
                                "training.py:244-249 semantics)"
                            )
                        if step % log_every == 0:
                            print(
                                f"epoch {epoch} step {step} "
                                + " ".join(f"{k}={float(v):.5f}" for k, v in ldict.items()),
                                flush=True,
                            )
                    if step % 1000 == 0:
                        # save_tree materializes leaves itself (multi-
                        # host allgather where needed) and writes on the
                        # main process only
                        checkpoints.save_checkpoint(
                            ckpt_dir, "ckpt", train_state.params,
                            opt_state=train_state.opt_state, step=step,
                        )
                    if multihost:
                        # act only on a CROSS-HOST-AGREED flag at a fixed
                        # step cadence: SIGTERM lands at different steps on
                        # different hosts, and a host-local break would
                        # leave the others blocked in the next step's
                        # gradient all-reduce exactly when the preemption
                        # checkpoint (itself a collective) must be written
                        if step % 10 == 0:
                            preempt["hit"] = bool(
                                dist_lib.gather_hosts(
                                    [float(preempt["hit"])]
                                ).max()
                            )
                        else:
                            continue  # defer the break to the next cadence
                    if preempt["hit"]:
                        break
                if multihost:
                    # a flag raised after the last cadence point inside the
                    # epoch must not diverge the epoch-level break either
                    preempt["hit"] = bool(
                        dist_lib.gather_hosts([float(preempt["hit"])]).max()
                    )
                if preempt["hit"]:
                    break  # skip validation; checkpoint + log after the loop
                if n_acc == 0 and epoch == 0:
                    _log(
                        logfile,
                        f"# WARNING: 0 training steps in epoch 0 — batch_size "
                        f"({batch_size}) likely exceeds the training corpus "
                        "(drop_remainder drops the lone short batch)",
                    )
                tr = {}
                if loss_accum is not None:
                    fetched = jax.device_get(loss_accum)
                    final = float(np.asarray(fetched["loss"])) / n_acc
                    if not np.isfinite(final):
                        raise FloatingPointError(
                            f"NaN/Inf loss in epoch {epoch} — aborting"
                        )
                    tr = {k: float(v) / n_acc for k, v in fetched.items()}

                # validation pass; selection metric follows the model's own loss:
                # mean-all for base blstm/unet (training.py), hole-only for the
                # ssnn/emb/ctc variants (training_ctc.py:383-389)
                spec = model.extra.get("spec") if model.extra else None
                select_hole = bool(spec and spec.loss_on_hole_only)
                if device_cache and (epoch > 0 or prefilled):
                    pairs = cached_val
                elif device_cache:
                    cached_val[:] = [
                        (meta, placed if use_mesh else jax.device_put(placed))
                        for meta, placed in _val_pairs(
                            dm, val_files, local_bs, place, pad_to=val_batches_global
                        )
                    ]
                    pairs = cached_val
                else:
                    pairs = _val_pairs(
                        dm, val_files, local_bs, place, pad_to=val_batches_global
                    )
                val_metric, val_report = _validate(
                    pairs, eval_step, train_state.params, is_asr, select_hole,
                    multihost=multihost,
                )
                if device_cache and epoch == 0 and not prefilled and cached_train:
                    # operational visibility: the cache must fit HBM next to params
                    # + optimizer state; report what epoch 0 actually pinned
                    gb = sum(
                        v.nbytes for b in cached_train for v in jax.tree_util.tree_leaves(b)
                    ) + sum(
                        v.nbytes for _, b in cached_val
                        for v in jax.tree_util.tree_leaves(b)
                    )
                    _log(
                        logfile,
                        f"# corpus cache: {len(cached_train)} train + "
                        f"{len(cached_val)} val batches, {gb / 2**30:.2f} GB in HBM",
                    )
                    if corpus_cache is not None:
                        # the fill is only trustworthy once epoch 0 streamed the
                        # whole corpus AND validation cached its batches; a fill
                        # interrupted earlier is discarded on the next call
                        corpus_cache["complete"] = True
                if not val_files:
                    # no validation split: every epoch "improves", so the best
                    # checkpoint tracks the latest params instead of never saving
                    val_metric = -float(epoch)

                dt = time.time() - t_epoch
                for k, v in tr.items():
                    tb.scalar(f"train/{k}", v, epoch)
                tb.scalar("val/metric", val_metric, epoch)
                tb.scalar("train/epoch_time_s", dt, epoch)
                if (not is_asr and val_files and int(config.get("tb_media", 1))
                        and not multihost):  # media jits a host-local batch;
                    # under multi-controller execution that per-process
                    # computation is skipped (metrics/TB scalars still flow)
                    _tb_media(
                        tb, model, config, stats, train_state.params, dm, val_files,
                        epoch, cache=media_cache,
                    )
                tb.flush()
                _log(
                    logfile,
                    f"epoch {epoch}\t"
                    + "\t".join(f"train_{k}={v:.5f}" for k, v in tr.items())
                    + "\t"
                    + val_report
                    + f"\ttime={dt:.1f}s",
                )

                if val_metric < best_val:
                    best_val = val_metric
                    best_epoch = epoch
                    cneg_epochs = 0
                    name = "asrnet" if is_asr else "sinet"
                    checkpoints.save_checkpoint(
                        ckpt_dir, name, train_state.params, step=step
                    )
                    _log(logfile, f"# new best val metric {best_val:.5f} -> saved {name}")
                else:
                    cneg_epochs += 1
                    if cneg_epochs >= int(config["n_earlystop_epochs"]):
                        _log(logfile, f"# early stop at epoch {epoch} (best epoch {best_epoch})")
                        break
        except BaseException:
            # abnormal exit (NaN abort, device failure, KeyboardInterrupt):
            # close an active profiler trace (a leaked trace makes the
            # NEXT train() with profiling die on 'trace already in
            # progress') and flush TB events before propagating
            if trace_active:
                jax.profiler.stop_trace()
            tb.close()
            raise

    if trace_active:
        # training ended (epoch limit / early stop) before the requested
        # profile window completed — close the trace instead of losing it
        jax.profiler.stop_trace()
        _log(
            logfile,
            f"# WARNING: run ended before profile_steps steps; "
            f"partial trace written to {profile_dir}",
        )
    if preempt["hit"]:
        # preemption (SIGTERM): the in-flight step completed, so save a
        # full resume point — params + optimizer moments + step, the same
        # sidecar layout the periodic 1000-step checkpoint uses.  Resume
        # by setting `model_ckp = <ckpt_dir>/ckpt` in the config.
        checkpoints.save_checkpoint(
            ckpt_dir, "ckpt", train_state.params,
            opt_state=train_state.opt_state, step=step,
        )
        _log(
            logfile,
            f"# SIGTERM: preemption checkpoint at step {step} -> "
            f"{os.path.join(ckpt_dir, 'ckpt')}; set model_ckp to resume",
        )
    summary = {
        "best_val": best_val,
        "best_epoch": best_epoch,
        "steps": step,
        "preempted": bool(preempt["hit"]),
    }
    _log(logfile, f"# done: best_val={best_val:.5f} at epoch {best_epoch}")
    tb.close()
    return summary


def _tb_media(tb, model, config, stats, params, dm, val_files, epoch, cache, n_samples=2):
    """Spectrogram-image + audio summaries (reference models.py:200-219).

    The tiny media batch is read, placed on device, and the media forward
    jitted ONCE per train() (stored in `cache`); later epochs reuse both —
    re-reading/re-uploading every epoch would defeat the corpus cache's
    zero-input-traffic design on slow links."""
    if "batch" not in cache:
        batch = next(iter(dm.batches(val_files, min(n_samples, 2), pad_final=True)))
        cache["batch"] = jax.device_put(mesh_lib.device_batch(batch))
        stats_j = (jnp.asarray(stats[0]), jnp.asarray(stats[1]))

        def media_step(params, dev):
            out = model.forward(params, dev, config, stats_j, train=False)
            res = {
                "target": out["target_spec_norm"],
                "pred": out["prediction"],
                "masks": dev["masks"],
            }
            if model.enhanced_sources:
                res["wav"] = model.enhanced_sources(out, dev, config, stats_j)
            return res

        cache["step"] = jax.jit(media_step)
    fetched = jax.device_get(cache["step"](params, cache["batch"]))
    target, pred, masks = fetched["target"], fetched["pred"], fetched["masks"]
    wav = fetched.get("wav")
    for i in range(min(n_samples, target.shape[0])):
        # frequency up, time right (tf.image.flip_up_down of the transpose)
        tb.image(f"Target_spectrogram/{i}", target[i].T[::-1], epoch)
        tb.image(f"Enhanced_spectrogram/{i}", pred[i].T[::-1], epoch)
        tb.image(f"Mask/{i}", masks[i].T[::-1], epoch)
        if wav is not None:
            w = wav[i]
            peak = np.abs(w).max() or 1.0
            tb.audio(f"Enhanced_audio/{i}", w / peak * 32000, epoch)


_HOST_META_KEYS = ("labels", "labels_lengths", "sequence_lengths")


def _val_pairs(dm, val_files, batch_size, place, pad_to=None):
    """(host_meta, placed_device_batch) pairs for one validation pass.

    pad_to (multi-host): every host must submit the same number of eval
    steps or the collective hangs, so hosts with fewer local batches
    re-submit their last batch with num_real=0 — counted by no metric —
    until all hosts reach the global max."""
    n = 0
    last = None
    for batch in dm.batches(val_files, batch_size, pad_final=True):
        meta = {k: np.asarray(batch[k]) for k in _HOST_META_KEYS if k in batch}
        meta["num_real"] = batch.get("num_real", batch_size)
        last = (meta, place(batch))
        n += 1
        yield last
    if pad_to is not None and n < pad_to:
        if last is None:
            raise ValueError(
                "a host's validation shard is empty but other hosts have "
                "batches — regroup the validation split over the hosts"
            )
        filler = (dict(last[0], num_real=0), last[1])
        for _ in range(pad_to - n):
            yield filler


def _validate(val_pairs, eval_step, params, is_asr, select_hole=True,
              multihost=False):
    """Per-epoch validation over (host_meta, placed) pairs.

    Keeps a window of batches in flight: jit dispatch is async, so the
    device computes batch k+1..k+8 while the host fetches batch k's small
    results (each fetch is a ~34 ms-floor tunnel round-trip on the relay),
    instead of serializing submit->fetch per batch.  The window bounds how
    many un-freed input batches sit in HBM at once on the non-cached path.

    Multi-host: per-sample results come back as GLOBAL arrays; each host
    pairs its own rows (dist.host_rows) with its host-local metadata, then
    the scalar sums are allreduced so every host computes the identical
    metric (and takes the identical best-checkpoint / early-stop branch).
    The single-process reduction path is kept bit-identical to before.
    Returns (selection_metric, report_string)."""
    def _pipelined(depth=8):
        from collections import deque

        window = deque()
        for meta, placed in val_pairs:
            window.append((meta, eval_step(params, placed)))
            if len(window) >= depth:
                yield window.popleft()
        while window:
            yield window.popleft()

    def rows(arr):
        return dist_lib.host_rows(arr) if multihost else np.asarray(arr)

    submitted = _pipelined()
    if is_asr:
        losses, pers, weights = [], [], []
        for meta, res in submitted:
            n = meta["num_real"]
            if n:
                losses.extend(rows(res["loss_ps"])[:n].tolist())
                pers.append(_host_per(rows(res["decoded"]), meta) * n)
                weights.append(n)
        if multihost:
            s = dist_lib.allreduce_sum(
                [np.sum(losses), len(losses), np.sum(pers), np.sum(weights)]
            )
            if s[3] == 0:
                return math.inf, "val=none"
            per = float(s[2] / s[3])
            return per, f"val_loss={s[0] / s[1]:.5f}\tval_per={per:.5f}"
        if not weights:
            return math.inf, "val=none"
        per = float(np.sum(pers) / np.sum(weights))
        val_loss = float(np.mean(losses))
        return per, f"val_loss={val_loss:.5f}\tval_per={per:.5f}"
    tot, hole, ctcs, ctc_w, pers = [], [], [], [], []
    for meta, res in submitted:
        n = meta["num_real"]
        if not n:
            continue
        tot.extend(rows(res["loss_ps"])[:n].tolist())
        hole.extend(rows(res["loss_hole_ps"])[:n].tolist())
        if "ctc_ps" in res:
            # exact sum over this host's real rows (padded duplicates and
            # other hosts' filler rows excluded, like loss_ps)
            ctcs.append(float(np.sum(rows(res["ctc_ps"])[:n])))
            ctc_w.append(n)
            pers.append(_host_per(rows(res["decoded"]), meta) * n)
    if multihost:
        s = dist_lib.allreduce_sum([
            np.sum(tot), len(tot), np.sum(hole),
            np.sum(ctcs), np.sum(ctc_w), np.sum(pers),
        ])
        if s[1] == 0:
            return math.inf, "val=none"
        report = f"val_loss={s[0] / s[1]:.5f}\tval_loss_hole={s[2] / s[1]:.5f}"
        if s[4] > 0:
            report += f"\tval_ctc={s[3] / s[4]:.5f}\tval_per={s[5] / s[4]:.5f}"
        metric = float(s[2] / s[1]) if select_hole else float(s[0] / s[1])
        return metric, report
    if not tot:
        return math.inf, "val=none"
    report = f"val_loss={np.mean(tot):.5f}\tval_loss_hole={np.mean(hole):.5f}"
    if ctcs:
        report += (
            f"\tval_ctc={np.sum(ctcs) / np.sum(ctc_w):.5f}"
            f"\tval_per={np.sum(pers) / np.sum(ctc_w):.5f}"
        )
    metric = float(np.mean(hole)) if select_hole else float(np.mean(tot))
    return metric, report
