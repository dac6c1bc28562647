"""Inference verbs: --eval / --test / --prepare / --predict.

Behavioral parity with the reference's ``inference(args)``
(src/inference.py:25-327): weight selection priority
``initial_model_infer`` > ``best_state`` > latest (src/inference.py:56-63),
trial evaluation + threshold tuning + minDCF, decision runs against a
threshold, cohort/enrollment preparation, and nearest-speaker
identification. Artifacts (evaluation results CSV, Inference_log.txt)
mirror the reference's result files (src/inference.py:129-173).

The interactive ``input()`` confirmation inside the reference's eval path
(src/inference.py:176-181) is intentionally not reproduced.
"""

from __future__ import annotations

import csv
import time
from pathlib import Path
from typing import Mapping, Optional

import jax.numpy as jnp
import numpy as np

from speakerverification_tpu.builder import encoder_from_hparams
from speakerverification_tpu.evaluation.evaluator import (
    evaluate_from_list,
    predict_identity,
    prepare_cohorts,
    prepare_embeddings,
    test_from_list,
)
from speakerverification_tpu.evaluation.metrics import (
    compute_error_rates,
    compute_min_dcf,
    tune_threshold_from_score,
)
from speakerverification_tpu.training.checkpoint import load_params_only
from speakerverification_tpu.training.state import create_train_state
from speakerverification_tpu.training.train_step import make_eval_embed_fn
from speakerverification_tpu.training.trainer import run_dirs
from speakerverification_tpu.optim import build_optimizer

__all__ = ["InferenceEngine", "inference"]


def _select_weights(hparams: Mapping, model_dir: Path) -> Optional[Path]:
    """initial_model_infer > best_state > last_state > newest epoch.

    Checks both checkpoint backends — flax msgpack files and orbax
    sharded directories (training/checkpoint_sharded.py) — and, where a
    name exists in both formats (a run that toggled
    ``sharded_checkpoints``), serves the newest one."""
    cand = hparams.get("initial_model_infer")
    if cand and Path(str(cand)).exists():
        return Path(str(cand))
    for name in ("best_state", "last_state"):
        cands = [p for p in (model_dir / (name + ".msgpack"),
                             model_dir / name) if p.exists()]
        if cands:
            return max(cands, key=lambda p: p.stat().st_mtime)
    epochs = sorted(
        set(model_dir.glob("model_state_*.msgpack"))
        | {p for p in model_dir.glob("model_state_*") if p.is_dir()},
        key=lambda p: p.name.removesuffix(".msgpack"))
    return epochs[-1] if epochs else None


class InferenceEngine:
    def __init__(self, hparams: Mapping, weights: Optional[str] = None):
        hparams = dict(hparams)
        if (hparams.get("model") or {}).get("remat"):
            # remat is a training-memory knob: the eval forward is
            # bit-identical without it (tested), checkpoints are
            # name-compatible, and int8 calibration's eager activation
            # probes cannot run inside a jax.checkpoint region
            hparams["model"] = {**hparams["model"], "remat": False}
        self.hparams = hparams
        self.dirs = run_dirs(hparams)
        self.model = encoder_from_hparams(hparams, with_loss=True)

        # template state for deserialization
        spec = hparams.get("audio_spec", {})
        T = int(spec.get("sentence_len", 2.0) * spec.get("sample_rate", 8000))
        import jax
        # nPerSpeaker=2 dummy: pair-based loss heads assert grouped input
        dummy = jnp.zeros((2, 2, T), jnp.float32)
        tx = build_optimizer("adam", learning_rate=1e-3)
        self.state = create_train_state(self.model, tx, jax.random.PRNGKey(0),
                                        dummy, jnp.zeros((2,), jnp.int32))

        path = Path(weights) if weights else _select_weights(
            hparams, self.dirs["model"])
        self.weights_path = path
        soup = None
        # an explicit weights argument or initial_model_infer names ONE
        # checkpoint — averaging must not override it
        explicit = weights is not None or bool(
            hparams.get("initial_model_infer"))
        if hparams.get("average_checkpoints") and not explicit:
            # uniform top-k weight averaging ("model soup") over the
            # retained best_state_top{1..k} — the retention the
            # reference keeps but never combines (trainer.py:144-158)
            mdir = self.dirs["model"]
            soup = sorted(mdir.glob("best_state_top*.msgpack")) or [
                p for p in sorted(mdir.glob("best_state_top*"))
                if p.is_dir()]
        if soup:
            if hparams.get("use_ema"):
                print("[WARN] use_ema is ignored when average_checkpoints "
                      "averaging applies — serving the top-k soup of RAW "
                      "weights (disable one of the two)")
            from speakerverification_tpu.training.checkpoint import (
                average_checkpoints,
            )
            self.state = average_checkpoints(soup, self.state)
            self.weights_path = soup[0]
            print(f"[INFO] averaged {len(soup)} checkpoints: "
                  f"{[p.name for p in soup]}")
        elif path is not None and path.exists():
            loaded = None
            if hparams.get("use_ema"):
                # serve the EMA weights track_ema keeps in the optimizer
                # state (train with optimizer.ema_decay)
                from speakerverification_tpu.training.checkpoint import (
                    load_ema_params,
                )
                loaded = load_ema_params(path, self.state)
                if loaded is None:
                    print("[WARN] use_ema: checkpoint carries no EMA "
                          "state (train with optimizer.ema_decay); "
                          "serving raw weights")
                else:
                    print(f"[INFO] loaded EMA weights: {path}")
            if loaded is None:
                loaded = load_params_only(path, self.state)
                print(f"[INFO] loaded weights: {path}")
            self.state = loaded
        else:
            print("[WARN] no weights found — using random initialization")

        normalize = bool(getattr(self.model.loss, "test_normalize", True))
        from speakerverification_tpu.builder import compute_dtype_from_hparams
        quant = hparams.get("quant")
        self._quant_int8 = quant == "int8"
        self._act_scales = None
        if self._quant_int8:
            # int8 MXU extraction (quant.py). Activation scales are
            # calibrated lazily on the first batch (embed_fn below) so
            # the serving path runs STATIC-scale int8 — dynamic in-trace
            # max-reduces cost more than the int8 GEMM saves (see
            # quant._int8_gemm). Embedding cosine fidelity vs the float
            # path is pinned by tests/test_quant.py.
            from speakerverification_tpu.training.train_step import (
                eval_dp_devices,
            )
            if eval_dp_devices(hparams):
                print("[INFO] --quant int8 runs single-device "
                      "(eval data parallelism applies to the bf16 path)")
            self._embed = None
        elif quant:
            raise ValueError(f"unknown quant mode {quant!r} (expected 'int8')")
        else:
            # single-process multi-chip data parallelism: one TPU-VM
            # process typically addresses 4-8 local chips — shard the
            # extraction batch across all of them (exactly-equal math,
            # see make_eval_embed_fn). `eval_data_parallel: false` opts
            # out; composes with the per-process file-list sharding of
            # multi-host runs (extract_embeddings distributed=True).
            from speakerverification_tpu.training.train_step import (
                eval_dp_devices,
            )
            devices = eval_dp_devices(hparams)
            if devices:
                print(f"[INFO] eval data parallelism over "
                      f"{len(devices)} local devices")
            self._embed = make_eval_embed_fn(
                self.model, normalize=normalize,
                compute_dtype=compute_dtype_from_hparams(hparams),
                devices=devices)
        self._normalize = normalize
        # the embed fn above already applied the head's test_normalize
        # policy; scoring must not re-normalize or heads with
        # test_normalize=False diverge from the reference
        # (src/model.py:421-424) — so all score_trials calls below pass
        # normalize=False.
        transport = str(hparams.get("eval_transport", "float32"))
        if transport not in ("float32", "int16"):
            raise ValueError(f"eval_transport must be float32|int16, "
                             f"got {transport!r}")
        self._transport = transport

    def embed_fn(self, waves: np.ndarray):
        # returns a DEVICE array: scoring consumes it without a host
        # round-trip (see extract_embeddings)
        if self._transport == "int16" and np.asarray(waves).dtype != np.int16:
            # `eval_transport: int16` puts 16-bit PCM on the host→device
            # wire — half the float32 bytes for every batch the
            # evaluate/test/prepare/predict paths dispatch; the embed
            # program dequantizes in-trace (make_eval_embed_fn /
            # make_int8_embed_fn), fusing cast+scale into the frontend's
            # first op. 16-bit-PCM-decoded crops sit exactly on the
            # 1/32768 grid, so the round-trip is LOSSLESS for WAV-backed
            # eval; other sources quantize at ≤0.5/32768 (same bound as
            # serving's transport=int16, serving.py).
            waves = np.clip(np.round(np.asarray(waves) * 32768.0),
                            -32768, 32767).astype(np.int16)
        if self._embed is None:        # --quant int8: calibrate once
            from speakerverification_tpu.builder import (
                compute_dtype_from_hparams,
            )
            from speakerverification_tpu.quant import (
                calibrate_act_scales,
                make_int8_embed_fn,
            )
            # evenly-spaced subsample of the first batch (eval lists are
            # often speaker-ordered — the first rows alone can calibrate
            # quiet); calibrate_act_scales adds 10 % saturation headroom
            flat = jnp.asarray(waves).reshape(-1, np.shape(waves)[-1])
            if flat.dtype == jnp.int16:   # serving int16 wire format
                flat = flat.astype(jnp.float32) * (1.0 / 32768.0)
            n_calib = min(int(self.hparams.get("quant_calib_utts", 32)),
                          flat.shape[0])
            idx = np.linspace(0, flat.shape[0] - 1, n_calib).astype(int)
            self._act_scales = calibrate_act_scales(
                self.model, {"params": self.state.params,
                             "batch_stats": self.state.batch_stats},
                flat[jnp.asarray(idx)])
            self._embed = make_int8_embed_fn(
                self.model, normalize=self._normalize,
                compute_dtype=compute_dtype_from_hparams(self.hparams),
                act_scales=self._act_scales)
            print(f"[INFO] int8: calibrated {len(self._act_scales)} "
                  f"activation scales on {n_calib} utterances "
                  "(+10% headroom)")
        return self._embed(self.state.params, self.state.batch_stats,
                           jnp.asarray(waves))

    # ------------------------------------------------------------------
    def evaluate(self, listfile: Optional[str] = None) -> dict:
        h = self.hparams
        listfile = listfile or h["evaluation_file"]
        cohorts = None
        mode = h.get("scoring_mode", "cosine")
        if mode in ("norm", "zt_norm"):
            cohorts = np.load(str(h["cohorts_path"]))
        t0 = time.time()
        import jax
        scores, labels, trials = evaluate_from_list(
            self.embed_fn, listfile, h["audio_spec"],
            num_eval=int(h.get("num_eval", 10)), scoring_mode=mode,
            cohorts=cohorts, normalize=False,
            batch_size=int(h.get("eval_batch_size", 32)),
            num_workers=int(h.get("dataloader_options", {}).get("num_workers", 8)),
            # multi-process runs shard embedding extraction per host and
            # gather (src/model.py:363-366,400-411 parity)
            distributed=jax.process_count() > 1)
        elapsed = time.time() - t0

        res = tune_threshold_from_score(scores, labels, [1, 0.1])
        fnrs, fprs, thresholds = compute_error_rates(scores, labels)
        dcf = h.get("dcf", {}) or {}
        mindcf, dcf_thr = compute_min_dcf(
            fnrs, fprs, thresholds,
            p_target=float(dcf.get("dcf_p_target", 0.05)),
            c_miss=float(dcf.get("dcf_c_miss", 1)),
            c_fa=float(dcf.get("dcf_c_fa", 1)))

        result_dir = self.dirs["result"]
        with open(result_dir / "evaluation_results.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["label", "score", "trial"])
            for s, l, t in zip(scores, labels, trials):
                w.writerow([int(l), float(s), t])
        # FA/FR pair dumps at the tuned threshold (parity:
        # src/inference.py:139-173)
        from speakerverification_tpu.evaluation.reports import dump_fa_fr_pairs
        fafr = dump_fa_fr_pairs(scores, labels, trials, res["roc"][3],
                                result_dir)
        report = {
            "eer": res["roc"][1], "auc": res["roc"][2],
            "threshold": res["roc"][3], "min_dcf": mindcf,
            "dcf_threshold": dcf_thr, "gmean": res["gmean"][1],
            "n_trials": len(scores), "seconds": elapsed, **fafr,
        }
        with open(result_dir / "Inference_log.txt", "a") as f:
            f.write(f"{time.strftime('%Y-%m-%d %H:%M:%S')} eval {listfile} "
                    f"-> EER {report['eer']:.4f}% minDCF {mindcf:.4f} "
                    f"thr {report['threshold']:.4f} ({elapsed:.1f}s)\n")
        print(f"[RESULT] EER {report['eer']:.4f}%  minDCF {mindcf:.4f}  "
              f"AUC {report['auc']:.4f}  thr {report['threshold']:.4f}")
        return report

    def test(self, listfile: Optional[str] = None,
             threshold: Optional[float] = None) -> dict:
        h = self.hparams
        listfile = listfile or h["verification_file"]
        threshold = threshold if threshold is not None else \
            float(h.get("test_threshold", 0))
        if threshold == 0:
            # tune on the evaluation file first (parity: inference.py:187-215)
            threshold = float(self.evaluate()["threshold"])
        cohorts = None
        mode = h.get("scoring_mode", "cosine")
        if mode in ("norm", "zt_norm"):
            cohorts = np.load(str(h["cohorts_path"]))
        out = self.dirs["result"] / (Path(listfile).stem + "_results.txt")
        scores, preds, labels = test_from_list(
            self.embed_fn, listfile, h["audio_spec"], threshold,
            num_eval=int(h.get("num_eval", 10)), scoring_mode=mode,
            cohorts=cohorts, normalize=False, output_file=str(out))
        report = {"threshold": threshold, "n": len(scores),
                  "accept_rate": float(np.mean(preds)), "output": str(out)}
        if labels is not None and len(labels):
            from speakerverification_tpu.evaluation.reports import (
                classification_report,
                fbeta_score,
            )
            report["accuracy"] = float(np.mean(preds == labels))
            report["fbeta"] = {b: fbeta_score(labels, preds, b)
                               for b in (0.5, 2)}
            cls_report = classification_report(labels, preds,
                                               ["Label '0'", "Label '1'"])
            (self.dirs["result"] / "Testing_log.txt").open("a").write(
                f"{time.strftime('%Y-%m-%d %H:%M:%S')} thr {threshold}\n"
                f"{cls_report}\n")
            print(cls_report)
        print(f"[RESULT] test: {report}")
        return report

    def prepare(self, prepare_type: Optional[str] = None):
        h = self.hparams
        prepare_type = prepare_type or h.get("prepare", "cohorts")
        if prepare_type == "cohorts":
            return prepare_cohorts(
                self.embed_fn, h["train_annotation"], h["audio_spec"],
                num_eval=int(h.get("num_eval", 10)),
                save_path=str(h.get("cohorts_path", "cohorts.npy")))
        if prepare_type == "embed":
            return prepare_embeddings(
                self.embed_fn, h["data_folder"], h["audio_spec"],
                num_eval=int(h.get("num_eval", 10)),
                save_dir=str(self.dirs["model"]))
        raise ValueError(f"unknown prepare type {prepare_type!r}")

    def predict(self, files, threshold: float = 0.0):
        h = self.hparams
        embeds = np.load(self.dirs["model"] / "embeds.npy")
        classes = np.load(self.dirs["model"] / "classes.npy",
                          allow_pickle=True).item()
        return predict_identity(self.embed_fn, files, embeds, classes,
                                h["audio_spec"],
                                num_eval=int(h.get("num_eval", 10)),
                                threshold=threshold)


def inference(hparams: Mapping, eval_: bool = False, test: bool = False,
              prepare: bool = False, predict=None) -> dict:
    """CLI-facing dispatcher (parity: src/inference.py:25 + main.py:17-19)."""
    engine = InferenceEngine(hparams)
    out = {}
    if prepare:
        engine.prepare()
        out["prepared"] = True
    if eval_:
        out["eval"] = engine.evaluate()
    if test:
        out["test"] = engine.test()
    if predict:
        names, scores = engine.predict(predict)
        out["predict"] = list(zip(names, [float(s) for s in scores]))
    return out
