"""Training orchestration: epochs, schedules, checkpoints, logging.

TPU-native counterpart of the reference's ``train``/``main_worker`` +
``ModelHandling.fit`` (src/trainer.py:38-243, src/model.py:225-301):

* one jitted train step per batch (forward+backward+update fused into a
  single XLA program);
* learning-rate schedules stepped per epoch or per iteration
  (src/model.py:277-296 semantics) by feeding the lr scalar each step;
* best/top-k/last checkpoint retention + resume (src/trainer.py:143-232);
* ``scores.txt`` append log and optional TensorBoard scalars
  (src/trainer.py:126-236);
* optional periodic validation EER (``test_interval``) and early stopping.

Multi-host data parallelism replaces torch DDP with per-rank sampler
shards feeding a shard_map'd step (see parallel/).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Mapping, Optional

import jax
import jax.numpy as jnp

from speakerverification_tpu.builder import (
    encoder_from_hparams,
    optimizer_from_hparams,
    scheduler_from_hparams,
)
from speakerverification_tpu.data.loader import train_data_loader
from speakerverification_tpu.evaluation.evaluator import evaluate_from_list
from speakerverification_tpu.evaluation.metrics import tune_threshold_from_score
from speakerverification_tpu.optim import EarlyStopping
from speakerverification_tpu.training.checkpoint import (
    CheckpointManager,
    load_checkpoint,
)
from speakerverification_tpu.training.state import create_train_state
from speakerverification_tpu.training.train_step import (
    make_eval_embed_fn,
    make_train_step,
)

__all__ = ["Trainer", "run_dirs"]


def run_dirs(hparams: Mapping) -> dict:
    """save/<model>/<loss>/{model,result,config} layout
    (parity: src/main.py:106-122)."""
    base = Path(hparams.get("save_folder", "save"))
    model = hparams.get("model", {}).get("name", "model")
    if isinstance(model, (list, tuple)):     # mixed multi-encoder config
        model = "+".join(str(m) for m in model)
    crit = hparams.get("criterion", {}).get("name", "loss")
    root = base / str(model) / str(crit)
    dirs = {"root": root, "model": root / "model", "result": root / "result",
            "config": root / "config"}
    for d in dirs.values():
        d.mkdir(parents=True, exist_ok=True)
    return dirs


class Trainer:
    def __init__(self, hparams: Mapping, num_replicas: int = 1, rank: int = 0):
        self.hparams = dict(hparams)

        self.model_parallel = int(hparams.get("model_parallel", 1) or 1)
        if self.model_parallel > 1 and not hparams.get("distributed"):
            # fail fast WITHOUT touching jax.devices(): any backend use
            # here would break jax.distributed.initialize below
            raise ValueError(
                f"model_parallel={self.model_parallel} requires "
                "--distributed")

        # Multi-host: one process per host drives its local devices; the
        # sampler shards per PROCESS (the reference's per-rank TrainSampler
        # slicing, src/dataloader.py:219-227 — there, one process per GPU).
        self.multiprocess = False
        if hparams.get("distributed"):
            from speakerverification_tpu.parallel import (
                maybe_initialize_distributed,
            )
            self.multiprocess = maybe_initialize_distributed(hparams)
            if self.multiprocess and num_replicas == 1:
                num_replicas = jax.process_count()
                rank = jax.process_index()

        # fail fast: model_parallel without a multi-device mesh would
        # silently train an unsharded head (the builder swaps the loss
        # class regardless); checked after distributed init so
        # jax.devices() reflects the global mesh
        if self.model_parallel > 1 and len(jax.devices()) <= 1:
            raise ValueError(
                f"model_parallel={self.model_parallel} requires >1 "
                f"visible device (have {len(jax.devices())})")

        self.rank = rank
        self.num_replicas = num_replicas
        self.dirs = run_dirs(hparams)

        self.loader = train_data_loader(hparams, num_replicas, rank)
        if self.loader.manifest.num_classes != int(hparams.get("nClasses", 0)):
            print(f"[WARN] nClasses={hparams.get('nClasses')} in config but "
                  f"{self.loader.manifest.num_classes} speakers in manifest; "
                  f"using the manifest count")
            self.hparams["nClasses"] = self.loader.manifest.num_classes

        # the step only binds a 'data' mesh axis when >1 device is present;
        # the builder must agree or metric-loss all_gathers crash (ADVICE r1)
        n_dev = len(jax.devices()) if hparams.get("distributed") else 1
        self.model = encoder_from_hparams(self.hparams, num_devices=n_dev)
        self.tx = optimizer_from_hparams(self.hparams)
        steps_per_epoch = max(len(self.loader), 1)
        self.schedule, self.lr_unit = scheduler_from_hparams(
            self.hparams, steps_per_epoch)
        self.steps_per_epoch = steps_per_epoch

        # bf16 mixed precision (replaces the reference's --mixedprec AMP,
        # src/main.py:66 + GradScaler; no loss scaling needed on TPU)
        from speakerverification_tpu.builder import compute_dtype_from_hparams
        compute_dtype = compute_dtype_from_hparams(self.hparams)

        # device_augment: move env_corrupt off the host into the jitted
        # step (ops/device_augment.py) — the host loader then serves
        # clean crops (its env_corrupt engine is detached) while noise/
        # RIR banks mix on the accelerator. ~6.7× host-CPU relief per
        # utterance (bench_host_pipeline.py). Banks are step ARGUMENTS
        # (not closure constants) and are resampled from the corpus at
        # every epoch (train_epoch) — same shapes, so no recompile —
        # keeping augmentation diversity close to the host path's
        # sample-from-all-files behavior.
        self._augment_fn = None
        self._aug_banks = None
        self._aug_source = None
        if hparams.get("device_augment") and self.loader.augmentor is not None:
            from speakerverification_tpu.ops.device_augment import (
                build_banks,
                device_env_corrupt,
            )
            self._aug_source = self.loader.augmentor
            self._aug_bank_sizes = (
                int(hparams.get("device_augment_noise_bank", 256)),
                int(hparams.get("device_augment_rir_bank", 64)))
            self._aug_banks = build_banks(
                self._aug_source,
                n_noise=self._aug_bank_sizes[0],
                n_rir=self._aug_bank_sizes[1])
            self.loader.augmentor = None
            self._augment_fn = (
                lambda w, r, banks: device_env_corrupt(w, banks, r))
            print("[INFO] env_corrupt moved on-device "
                  f"(banks: {self._aug_banks.noise.shape[0]} noise crops, "
                  f"{self._aug_banks.rir.shape[0]} RIRs, "
                  "refreshed per epoch)")
        # device_time_augment: the OnStreamAugment/TimeAugment chain
        # (ops/timeaugment.py) batched inside the jitted step. Value may
        # be True (np chain, the reference constructor's default) or the
        # mode string 'np' / 'torch'. Composes AFTER device env_corrupt
        # when both are on; shares the same per-epoch noise/RIR banks.
        tmode = hparams.get("device_time_augment")
        if tmode:
            from speakerverification_tpu.ops.timeaugment import time_augment
            t_mode = tmode if isinstance(tmode, str) else "np"
            t_sr = int(dict(hparams.get("audio_spec") or {}).get(
                "sample_rate", 16000))
            if self._aug_banks is None and self.loader.augmentor is not None:
                # banks feed the chain's background-noise/IR members;
                # host env_corrupt (if configured) stays on the host
                from speakerverification_tpu.ops.device_augment import (
                    build_banks,
                )
                self._aug_source = self.loader.augmentor
                self._aug_bank_sizes = (
                    int(hparams.get("device_augment_noise_bank", 256)),
                    int(hparams.get("device_augment_rir_bank", 64)))
                self._aug_banks = build_banks(
                    self._aug_source,
                    n_noise=self._aug_bank_sizes[0],
                    n_rir=self._aug_bank_sizes[1])
            env_fn = self._augment_fn
            if self._aug_banks is not None:
                if env_fn is not None:
                    self._augment_fn = (
                        lambda w, r, banks: time_augment(
                            env_fn(w, jax.random.fold_in(r, 0), banks),
                            jax.random.fold_in(r, 1), banks,
                            mode=t_mode, sample_rate=t_sr))
                else:
                    self._augment_fn = (
                        lambda w, r, banks: time_augment(
                            w, r, banks, mode=t_mode, sample_rate=t_sr))
            else:
                self._augment_fn = (
                    lambda w, r: time_augment(
                        w, r, None, mode=t_mode, sample_rate=t_sr))
            print(f"[INFO] on-device TimeAugment chain enabled "
                  f"(mode={t_mode}"
                  + (", no banks: background-noise/IR members skipped"
                     if self._aug_banks is None else "") + ")")
        # --distributed: shard_map data parallelism over all local devices
        # (parity: the reference's --distributed DDP flag, src/main.py:68;
        # here one process drives the whole mesh — no mp.spawn/rendezvous)
        self.mesh = None
        self._compute_dtype = compute_dtype
        # gradient accumulation: k microbatches scanned inside the step,
        # one optimizer update on the mean gradient (sequential-DP
        # semantics — see make_train_step). batch_size stays the
        # EFFECTIVE batch; only peak activation memory shrinks by k.
        self.accum_steps = int(hparams.get("accumulate_steps", 1))
        if self.accum_steps > 1:
            if int(hparams.get("batch_size", 0)) % self.accum_steps != 0:
                raise ValueError(
                    f"accumulate_steps={self.accum_steps} must divide "
                    f"batch_size {hparams.get('batch_size')}")
            print(f"[INFO] gradient accumulation: {self.accum_steps} "
                  "microbatches per optimizer step")
        if hparams.get("distributed") and len(jax.devices()) > 1:
            from speakerverification_tpu.parallel import make_dp_train_step, make_mesh
            mp_ = self.model_parallel
            if mp_ > 1:
                # 2-D mesh: DP over data × class-sharded classifier over
                # model (parallel/tp.py; no reference equivalent). The
                # model axis must fit inside one process so every host
                # holds all class shards locally (shard_state_tp_global).
                n_all = len(jax.devices())
                local = n_all // max(jax.process_count(), 1)
                if local % mp_ != 0:
                    raise ValueError(
                        f"model_parallel {mp_} must divide the "
                        f"{local} devices local to each process")
                self.mesh = make_mesh(("data", "model"),
                                      shape=(n_all // mp_, mp_))
            else:
                self.mesh = make_mesh(("data",))  # all devices, all processes
            n_dev = self.mesh.shape["data"]
            # batch_size is per-PROCESS (parity: the reference's per-GPU
            # DDP batch); it must divide this process's data-axis device
            # count so every shard gets equal rows of the global array.
            local_dev = n_dev // max(jax.process_count(), 1)
            if int(hparams.get("batch_size", 0)) % max(local_dev, 1) != 0:
                raise ValueError(
                    f"batch_size {hparams.get('batch_size')} must divide by "
                    f"{local_dev} local data-shards for --distributed")
            # pre-check in USER units: the step's own trace-time check
            # sees per-shard rows the user never configured
            shard_rows = int(hparams.get("batch_size", 0)) // max(local_dev, 1)
            if self.accum_steps > 1 and shard_rows % self.accum_steps != 0:
                raise ValueError(
                    f"accumulate_steps={self.accum_steps} must divide each "
                    f"data shard's rows: batch_size "
                    f"{hparams.get('batch_size')} over {local_dev} shards "
                    f"gives {shard_rows} rows/shard")
            if mp_ > 1:
                self.step_fn = None   # built in fit(): needs the state tree
            else:
                self.step_fn = make_dp_train_step(
                    self.model, self.tx, self.mesh, donate=True,
                    compute_dtype=compute_dtype,
                    augment_fn=self._augment_fn,
                    n_aug_args=1 if self._aug_banks is not None else 0,
                    accum_steps=self.accum_steps)
            print(f"[INFO] data-parallel over {n_dev} devices"
                  + (f" × {mp_} model shards" if mp_ > 1 else "")
                  + (f" across {jax.process_count()} processes"
                     if self.multiprocess else ""))
        else:
            self.step_fn = jax.jit(
                make_train_step(self.model, self.tx,
                                compute_dtype=compute_dtype,
                                augment_fn=self._augment_fn,
                                accum_steps=self.accum_steps),
                donate_argnums=(0,))
        self._profile_dir = hparams.get("profile_dir") if hparams.get(
            "profile") else None
        self.embed_fn = None    # built lazily for validation

        ckpt_backend = "msgpack"
        if hparams.get("sharded_checkpoints"):
            # orbax per-shard writes: no host gather of the (possibly
            # multi-GB) TP head + optimizer moments. Single-process
            # meshes only: save_epoch is rank-0-gated, and a sharded
            # save is a collective — every process would have to call it
            if self.multiprocess:
                raise ValueError(
                    "sharded_checkpoints is single-process only (the "
                    "rank-0-gated save would deadlock a multi-host "
                    "collective write); multi-host runs use the msgpack "
                    "path, which reassembles from process-local shards")
            ckpt_backend = "sharded"
        self.ckpt = CheckpointManager(
            self.dirs["model"],
            top_k=3,
            save_per_epoch=not hparams.get("save_model_last", True),
            time_interval_min=float(hparams.get("ckpt_interval_minutes", -1)),
            backend=ckpt_backend)

        self.early_stopping: Optional[EarlyStopping] = None
        if hparams.get("early_stopping"):
            self.early_stopping = EarlyStopping(
                patience=int(hparams.get("es_patience", 15)))

        if rank == 0:
            # settings.txt artifact: frozen hyperparameter dump at train
            # start (parity: src/trainer.py:256-261 writes settings.txt)
            with open(self.dirs["result"] / "settings.txt", "a") as f:
                f.write(f"\n[{time.strftime('%Y-%m-%d %H:%M:%S')}]\n")
                for k in sorted(self.hparams):
                    f.write(f"{k}: {self.hparams[k]!r}\n")

        self._writer = None
        if rank == 0:
            try:
                from tensorboardX import SummaryWriter
                runs = self.dirs["result"] / "runs"
                runs.mkdir(exist_ok=True)
                self._writer = SummaryWriter(log_dir=str(runs))
            except ImportError:
                pass

        self.state = None
        self.init_epoch = 1
        self.min_loss = float("inf")
        self.min_eer = float("inf")

    # ------------------------------------------------------------------
    def _init_state(self, batch):
        wave = jnp.asarray(batch["wave"])
        label = jnp.asarray(batch["label"])
        self.state = create_train_state(self.model, self.tx,
                                        jax.random.PRNGKey(
                                            int(self.hparams.get("seed", 0))),
                                        wave, label)
        # resume (priority: configured pretrained > previous run > scratch —
        # parity: src/trainer.py:349-365)
        resume = None
        pre = self.hparams.get("pretrained", {}) or {}
        if pre.get("use") and pre.get("path") and Path(str(pre["path"])).exists():
            resume = Path(str(pre["path"]))
        elif self.ckpt.latest() is not None:
            resume = self.ckpt.latest()
        if resume is not None:
            try:
                self.state = load_checkpoint(resume, self.state)
            except ValueError:
                # checkpoint written under a different optimizer: restore
                # weights only, start the optimizer fresh
                from speakerverification_tpu.training.checkpoint import (
                    load_params_only,
                )
                self.state = load_params_only(resume, self.state)
                print("[WARN] optimizer state in checkpoint incompatible — "
                      "restored weights only")
            meta = self.ckpt.resume_meta()
            self.init_epoch = int(meta.get("epoch", 0)) + 1
            # historical BEST, not the last epoch's loss (the manager seeds
            # its tracker from the best_state sidecar on construction)
            self.min_loss = min(float(meta.get("loss", float("inf"))),
                                self.ckpt._best_loss)
            print(f"[INFO] resumed from {resume} at epoch {self.init_epoch}")

    def _lr(self, epoch: int, it: int, global_it: int) -> float:
        if self.lr_unit == "iteration":
            return float(self.schedule(global_it))
        if self.lr_unit == "epoch":
            return float(self.schedule(epoch - 1))
        return float(self.schedule.lr)          # plateau: current lr

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> tuple[float, float]:
        # optional jax.profiler trace of this epoch (the reference has no
        # tracing beyond tqdm, SURVEY.md §5 — this is the TPU-native add)
        if self._profile_dir and epoch == self.init_epoch and self.rank == 0:
            jax.profiler.start_trace(str(self._profile_dir))
        self.loader.set_epoch(epoch)
        if self._aug_source is not None and epoch != self.init_epoch:
            # resample the on-device noise/RIR banks from the full corpus
            # (ops/device_augment.py): same shapes -> no step recompile
            from speakerverification_tpu.ops.device_augment import build_banks
            import numpy as _np
            self._aug_banks = build_banks(
                self._aug_source,
                n_noise=self._aug_bank_sizes[0],
                n_rir=self._aug_bank_sizes[1],
                rng=_np.random.default_rng(
                    int(self.hparams.get("seed", 0)) * 7919 + epoch))
        losses, accs = [], []
        t0 = time.time()
        n_utts = 0
        base_rng = jax.random.PRNGKey(
            int(self.hparams.get("seed", 0)) * 1000 + epoch)
        for it, batch in enumerate(self.loader):
            if getattr(self, "_preempt", False) and not self.multiprocess:
                # single-process: stop mid-epoch (multi-host processes
                # receive the signal at different batch indices — an
                # uneven break would desynchronize the collectives, so
                # they run the epoch out and stop at the barrier-aligned
                # epoch boundary in fit())
                break
            lr = self._lr(epoch, it, (epoch - 1) * self.steps_per_epoch + it)
            rng = jax.random.fold_in(base_rng, it)
            if self.mesh is not None:
                if self.multiprocess:
                    from speakerverification_tpu.parallel import global_batch
                    batch = global_batch(batch, self.mesh)
                else:
                    from speakerverification_tpu.parallel import shard_batch
                    batch = shard_batch(batch, self.mesh)
                wave, label = batch["wave"], batch["label"]
            else:
                wave = jnp.asarray(batch["wave"])
                label = jnp.asarray(batch["label"])
            aug = (self._aug_banks,) if self._aug_banks is not None else ()
            self.state, metrics = self.step_fn(
                self.state, wave, label, rng, jnp.float32(lr), *aug)
            losses.append(metrics["loss"])
            accs.append(metrics["prec1"])
            n_utts += batch["wave"].shape[0] * batch["wave"].shape[1]
        # device sync once per epoch
        loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        acc = float(jnp.mean(jnp.stack(accs))) if accs else float("nan")
        dt = time.time() - t0
        if self._profile_dir and epoch == self.init_epoch and self.rank == 0:
            jax.profiler.stop_trace()
            print(f"[INFO] profiler trace written to {self._profile_dir}")
        if self.rank == 0:
            print(f"[E{epoch:03d}] loss {loss:.4f} acc {acc:5.2f}% "
                  f"lr {self._lr(epoch, 0, (epoch - 1) * self.steps_per_epoch):.2e} "
                  f"({n_utts / max(dt, 1e-9):.1f} utt/s)")
        return loss, acc

    def _validation_trials(self) -> Path:
        """Build a balanced trial list from the dev manifest.

        The reference feeds ``valid_annotation`` straight into
        evaluateFromList (src/trainer.py:161-163), assuming it is already
        trial-formatted; our generated dev.csv is a manifest, so pairs are
        derived deterministically (each dev utterance appears in one
        same-speaker and one different-speaker trial).
        """
        from speakerverification_tpu.data.manifest import Manifest
        import numpy as np

        trial_path = self.dirs["result"] / "validation_trials.txt"
        m = Manifest.read(self.hparams["valid_annotation"])
        by_spk: dict[int, list[str]] = {}
        for path, lab in zip(m.paths, m.labels):
            by_spk.setdefault(lab, []).append(path)
        rng = np.random.default_rng(int(self.hparams.get("seed", 0)))
        speakers = sorted(by_spk)
        lines = []
        for s in speakers:
            files = by_spk[s]
            for i, f in enumerate(files):
                if len(files) > 1:
                    lines.append(f"1 {f} {files[(i + 1) % len(files)]}")
                other = speakers[(speakers.index(s) + 1
                                  + int(rng.integers(max(len(speakers) - 1, 1)))
                                  ) % len(speakers)]
                if other != s and by_spk[other]:
                    neg = by_spk[other][int(rng.integers(len(by_spk[other])))]
                    lines.append(f"0 {f} {neg}")
        trial_path.write_text("\n".join(lines) + "\n")
        return trial_path

    def validate(self) -> float:
        if self.embed_fn is None:
            from speakerverification_tpu.builder import (
                compute_dtype_from_hparams,
            )
            normalize = bool(getattr(self.model.loss, "test_normalize", True))
            # mesh-less training with several local chips: row-shard the
            # validation extraction like InferenceEngine does (exact
            # math). Under DP/TP training (mesh set) the state is
            # already device-placed on its own mesh — keep the embed on
            # one device rather than resharding across meshes.
            from speakerverification_tpu.training.train_step import (
                eval_dp_devices,
            )
            devices = (eval_dp_devices(self.hparams)
                       if self.mesh is None and not self.multiprocess
                       else None)
            self.embed_fn = make_eval_embed_fn(
                self.model, normalize=normalize,
                compute_dtype=compute_dtype_from_hparams(self.hparams),
                devices=devices)
        # accept either a ready trial list or a CSV manifest
        va = str(self.hparams["valid_annotation"])
        listfile = self._validation_trials() if va.endswith(".csv") else va
        # validate with the configured scoring mode so the number tracked
        # during training is the same metric the eval path reports
        # (src/trainer.py:161-174 passes the full args); zt_norm needs a
        # cohort bank — fall back to cosine (with a note) if absent
        mode = str(self.hparams.get("scoring_mode", "cosine"))
        cohorts = None
        if mode in ("norm", "zt_norm"):
            cp = self.hparams.get("cohorts_path")
            if cp and Path(str(cp)).exists():
                import numpy as _np
                cohorts = _np.load(str(cp))
            else:
                print(f"[WARN] scoring_mode={mode} but no cohort bank at "
                      f"{cp!r}; validating with cosine")
                mode = "cosine"
        v_params, v_stats = self.state.params, self.state.batch_stats
        if self.multiprocess and self.model_parallel > 1:
            # the sharded classifier weight spans non-addressable devices;
            # validation embeds locally from host copies (the weight is
            # unused by the embedding path anyway)
            from speakerverification_tpu.training.checkpoint import (
                tree_to_host,
            )
            v_params, v_stats = tree_to_host(v_params), tree_to_host(v_stats)
        sc, lab, _ = evaluate_from_list(
            lambda w: self.embed_fn(v_params, v_stats,
                                    jnp.asarray(w)),
            listfile,
            self.hparams["audio_spec"],
            num_eval=int(self.hparams.get("num_eval", 10)),
            scoring_mode=mode, cohorts=cohorts,
            # embed_fn already applied the head's test_normalize — don't
            # re-normalize here or heads with test_normalize=False score a
            # different metric during validation than at --eval
            # (inference.py passes normalize=False for the same reason)
            normalize=False)
        return tune_threshold_from_score(sc, lab, [1, 0.1])["roc"][1]

    # ------------------------------------------------------------------
    def fit(self) -> dict:
        n_epochs = int(self.hparams.get("number_of_epochs", 1))
        score_path = self.dirs["result"] / "scores.txt"
        test_interval = int(self.hparams.get("test_interval", -1) or -1)

        # Preemption safety: TPU-VM/pod schedulers deliver SIGTERM with a
        # short grace period before eviction. Catch it, finish (or break
        # out of) the current epoch, write last_state, and return cleanly
        # so the next incarnation resumes — the reference's handlers just
        # kill the process tree (src/main.py:26-29, trainer.py:281-287).
        import signal as _signal
        self._preempt = False
        _old_handlers = {}

        def _on_term(signum, frame):
            if self._preempt:
                # second signal: the user/scheduler is done waiting —
                # restore default handling and abort immediately
                for s, h in _old_handlers.items():
                    _signal.signal(s, h)
                raise KeyboardInterrupt
            self._preempt = True
            print(f"[WARN] caught signal {signum} — will checkpoint and "
                  "stop after the current step (send again to abort "
                  "immediately)", flush=True)

        try:
            for s in (_signal.SIGTERM, _signal.SIGINT):
                _old_handlers[s] = _signal.signal(s, _on_term)
        except ValueError:
            pass        # not the main thread (e.g. driven from a test)

        try:
            return self._fit(n_epochs, score_path, test_interval)
        finally:
            for s, h in _old_handlers.items():
                _signal.signal(s, h)

    def _fit(self, n_epochs: int, score_path, test_interval: int) -> dict:
        first_batch = next(iter(self.loader))
        self._init_state(first_batch)
        if self.mesh is not None:
            if self.model_parallel > 1:
                from speakerverification_tpu.parallel import (
                    make_dp_tp_train_step,
                    shard_state_tp,
                    shard_state_tp_global,
                )
                if self.multiprocess:
                    # identical init on every process (same seed); the
                    # model axis lives inside each process, so the full
                    # host copy is the process-local data for every leaf
                    self.state = shard_state_tp_global(
                        jax.device_get(self.state), self.mesh)
                else:
                    self.state = shard_state_tp(self.state, self.mesh)
                self.step_fn = make_dp_tp_train_step(
                    self.model, self.tx, self.mesh, self.state,
                    donate=True, compute_dtype=self._compute_dtype,
                    augment_fn=self._augment_fn,
                    n_aug_args=1 if self._aug_banks is not None else 0,
                    accum_steps=self.accum_steps)
            elif self.multiprocess:
                # every process seeded model init identically, so local
                # copies agree; assemble them into one replicated global
                from speakerverification_tpu.parallel import replicate_global
                self.state = replicate_global(
                    jax.device_get(self.state), self.mesh)
            else:
                from speakerverification_tpu.parallel import replicate_state
                self.state = replicate_state(self.state, self.mesh)

        for epoch in range(self.init_epoch, n_epochs + 1):
            loss, acc = self.train_epoch(epoch)
            if self._preempt:
                # the epoch may be partial: record it as unfinished
                # (resume re-runs it from the mid-epoch weights) and keep
                # best/top-k/scores untouched
                if self.rank == 0:
                    self.ckpt.save_interrupt(
                        self.state, epoch,
                        lr=self._lr(epoch, 0,
                                    (epoch - 1) * self.steps_per_epoch),
                        best_loss=self.min_loss)
                    print(f"[INFO] preemption checkpoint written "
                          f"(epoch {epoch} unfinished) — exiting")
                break
            lr_now = self._lr(epoch, 0, epoch * self.steps_per_epoch)

            if self.lr_unit == "plateau":
                self.schedule(loss)

            # Decisions that steer control flow run on EVERY rank from the
            # pmean'd (identical) loss, so multi-host processes never
            # diverge into a collective deadlock; only file writes are
            # rank-0-gated.
            improved = loss < self.min_loss
            if improved:
                self.min_loss = loss

            if self.rank == 0:
                line = f"epoch {epoch}, LR {lr_now:.8f}, TEER/TAcc {acc:2.2f}, TLOSS {loss:f}"
                if test_interval > 0 and epoch % test_interval == 0 and \
                        self.hparams.get("valid_annotation"):
                    veer = self.validate()
                    self.min_eer = min(self.min_eer, veer)
                    line += f", VEER {veer:2.4f}, MINEER {self.min_eer:2.4f}"
                with open(score_path, "a") as f:
                    f.write(line + "\n")

                self.ckpt.save_epoch(self.state, epoch, loss, lr_now)

                if self._writer is not None:
                    self._writer.add_scalar("Loss/train", loss, epoch)
                    self._writer.add_scalar("Accuracy/train", acc, epoch)
                    self._writer.add_scalar("Params/learning_rate", lr_now,
                                            epoch)

            if self.early_stopping is not None:
                if improved:
                    self.early_stopping.counter = 0
                if self.early_stopping(loss):
                    if self.rank == 0:
                        print("[INFO] early stopping")
                    break

        if self._writer is not None:
            self._writer.close()
        return {"min_loss": self.min_loss, "min_eer": self.min_eer,
                "state": self.state}
