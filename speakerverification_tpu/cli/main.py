"""CLI entry point: train / infer / export / serve / dataprep.

Flag-surface parity with the reference's ``src/main.py:11-96``:
``--do_train | --do_infer | --do_export`` with ``--eval/--test/--predict/
--prepare`` sub-modes, ``--config`` YAML, and CLI overrides that clobber
YAML keys (src/utils.py:196-200). Run directories are laid out as
``save/<model>/<loss>/{model,result,config}`` with a frozen config copy
(src/main.py:106-122). Training metadata is generated when missing
(src/main.py:124-132).

Usage:
    python -m speakerverification_tpu.cli.main --do_train --config y.yaml
    python -m speakerverification_tpu.cli.main --do_infer --eval --config y.yaml
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from speakerverification_tpu.config import dump_config, read_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("speakerverification_tpu")
    # required unless --list_components short-circuits (checked in main)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_infer", action="store_true")
    p.add_argument("--do_export", action="store_true")
    p.add_argument("--do_serve", action="store_true",
                   help="run the dynamic-batching embedding/scoring HTTP "
                        "server (serving.py; no reference equivalent)")
    p.add_argument("--serve_host", type=str, default=None)
    p.add_argument("--serve_port", type=int, default=None)
    # infer sub-modes (parity: main.py:36-56)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--prepare", action="store_true")
    p.add_argument("--predict", nargs="*", default=None,
                   help="audio files for identification")
    # device / parallelism flags (parity: src/main.py:59-74)
    p.add_argument("--device", type=str, default=None,
                   choices=["cpu", "tpu", "gpu", "cuda"],
                   help="JAX platform to run on (reference: --device cuda)")
    p.add_argument("--distributed", action="store_true", default=None,
                   help="data-parallel over all local devices (shard_map; "
                        "replaces the reference's DDP mp.spawn)")
    p.add_argument("--data_parallel", action="store_true", default=None,
                   help="alias of --distributed (the reference's beta "
                        "nn.DataParallel path is subsumed by shard_map DP)")
    p.add_argument("--model_parallel", type=int, default=None,
                   help="shard the classifier head's classes over this "
                        "many devices (2-D data x model mesh; needs "
                        "--distributed; no reference equivalent)")
    p.add_argument("--eval_transport", type=str, default=None,
                   choices=["float32", "int16"],
                   help="host->device wire format for inference batches; "
                        "int16 halves H2D bytes (lossless for 16-bit-PCM "
                        "sources)")
    p.add_argument("--quant", type=str, default=None, choices=["int8"],
                   help="quantized inference: int8 MXU path for embedding "
                        "extraction (eval/test/prepare/predict)")
    p.add_argument("--average_ckpts", action="store_true", default=None,
                   dest="average_checkpoints",
                   help="uniform weight averaging over the retained "
                        "best_state_top{1..k} checkpoints before "
                        "inference (model soup)")
    p.add_argument("--use_ema", action="store_true", default=None,
                   help="serve the EMA weight track kept by "
                        "optimizer.ema_decay instead of the raw weights")
    p.add_argument("--mixedprec", action="store_true", default=None,
                   help="bf16 compute (replaces CUDA AMP; no loss scaling)")
    p.add_argument("--distributed_backend", type=str, default=None,
                   choices=["nccl", "gloo", "mpi", "ici"],
                   help="accepted for reference-CLI parity; XLA picks the "
                        "collective transport (ICI/DCN) automatically")
    p.add_argument("--port", type=str, default=None,
                   help="coordinator port for multi-host runs "
                        "(reference: DDP TCP rendezvous port)")
    # common overrides
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--augment", action="store_true", default=None)
    p.add_argument("--early_stopping", action="store_true", default=None)
    p.add_argument("--test_interval", type=int, default=None)
    p.add_argument("--number_of_epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--accumulate_steps", type=int, default=None,
                   help="gradient accumulation: split each batch into "
                        "this many microbatches scanned inside the "
                        "jitted step (one optimizer update on the mean "
                        "gradient; batch_size stays the effective batch)")
    p.add_argument("--initial_model_infer", type=str, default=None)
    p.add_argument("--test_threshold", type=float, default=None)
    p.add_argument("--scoring_mode", type=str, default=None)
    p.add_argument("--sys_info", action="store_true")
    p.add_argument("--list_components", action="store_true",
                   help="print every registered model/loss/optimizer/"
                        "scheduler name and exit")
    return p


# CLI mode flags that must not clobber same-named YAML config keys
# (e.g. the YAML `prepare: cohorts|embed` selector vs the --prepare flag).
_MODE_FLAGS = {"config", "do_train", "do_infer", "do_export", "do_serve",
               "serve_host", "serve_port",
               "eval", "test", "prepare", "predict", "sys_info", "device",
               "list_components"}


def load_hparams(args: argparse.Namespace) -> dict:
    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and k not in _MODE_FLAGS}
    if overrides.pop("data_parallel", None):
        overrides["distributed"] = True
    if overrides.get("distributed_backend"):
        print("[INFO] --distributed_backend accepted for parity; XLA "
              "chooses the collective transport on TPU (ICI/DCN)")
    hparams = read_config(args.config, overrides=overrides)
    return hparams


def apply_device_flag(device: str | None) -> None:
    """--device: pin the JAX platform BEFORE first backend use
    (reference: --device cuda/cpu selection, src/main.py:59-62)."""
    if not device:
        return
    import os
    platform = {"cuda": "gpu"}.get(device, device)
    os.environ["JAX_PLATFORMS"] = platform
    import jax
    try:
        jax.config.update("jax_platforms", platform)
    except Exception:
        pass                      # backend already initialized; env was set


def ensure_metadata(hparams: dict) -> None:
    """Generate train/dev manifests when absent (parity: main.py:124-132)."""
    ann = hparams.get("train_annotation")
    if not ann or Path(ann).exists() or hparams.get("skip_prep"):
        return
    from speakerverification_tpu.data.manifest import generate_metadata
    data_folder = hparams.get("data_folder")
    if not data_folder or not Path(data_folder).exists():
        raise FileNotFoundError(
            f"train_annotation {ann} missing and data_folder "
            f"{data_folder!r} not found — cannot generate metadata")
    stats = generate_metadata(
        data_folder, Path(ann).parent,
        split_ratio=float(hparams.get("dataloader_options", {})
                          .get("split_ratio", -1)),
        seed=int(hparams.get("seed", 0)))
    print(f"[INFO] generated metadata: {stats}")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.list_components:
        # registries import no jax-compiled code — safe without a device
        from speakerverification_tpu.losses import LOSSES
        from speakerverification_tpu.models import MODELS
        from speakerverification_tpu.optim import OPTIMIZERS
        from speakerverification_tpu.registry import SCHEDULERS
        for title, reg in (("models", MODELS), ("losses", LOSSES),
                           ("optimizers", OPTIMIZERS),
                           ("schedulers", SCHEDULERS)):
            names = sorted(reg.names())
            print(f"{title} ({len(names)}): {', '.join(names)}")
        return 0
    if not args.config:
        print("--config is required", file=sys.stderr)
        return 2
    apply_device_flag(args.device)
    hparams = load_hparams(args)

    if args.sys_info:
        import jax
        print(f"jax {jax.__version__}; devices: {jax.devices()}")

    from speakerverification_tpu.training.trainer import run_dirs
    dirs = run_dirs(hparams)
    dump_config(hparams, dirs["config"] / "config_frozen.yaml")

    if args.do_train:
        ensure_metadata(hparams)
        from speakerverification_tpu.training.trainer import Trainer
        result = Trainer(hparams).fit()
        print(f"[DONE] min_loss {result['min_loss']:.4f}")
        return 0

    if args.do_infer:
        from speakerverification_tpu.inference import inference
        inference(hparams, eval_=args.eval, test=args.test,
                  prepare=args.prepare, predict=args.predict)
        return 0

    if args.do_export:
        from speakerverification_tpu.export import export_model
        export_model(hparams)
        return 0

    if args.do_serve:
        from speakerverification_tpu.serving import serve
        serving = hparams.get("serving") or {}
        serve(hparams,
              host=args.serve_host or serving.get("host", "0.0.0.0"),
              port=int(args.serve_port or serving.get("port", 8008)))
        return 0

    print("nothing to do: pass --do_train / --do_infer / --do_export "
          "/ --do_serve", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
