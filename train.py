#!/usr/bin/env python
"""Train entry point (SURVEY.md §3.1; reference: per-branch train_<model>.py scripts).

Usage:
  python train.py --preset fbp_unet_parallel --steps 2000
  python train.py --config configs/my.json --set train.learning_rate=3e-4
  python train.py --preset pdunet_parallel --ckpt-dir runs/pd --resume auto

All five presets of BASELINE.json:6-12 are available via --preset; any
config field can be overridden with --set section.field=value.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pathlib
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", help="preset name (see pdunet_tpu.configs.PRESETS)")
    p.add_argument("--config", help="path to an ExperimentConfig JSON")
    p.add_argument("--steps", type=int, default=None, help="override train.steps")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted config override, e.g. train.learning_rate=3e-4")
    p.add_argument("--ckpt-dir", default=None, help="checkpoint directory")
    p.add_argument("--resume", choices=["auto", "none"], default="auto",
                   help="auto-resume from latest checkpoint in --ckpt-dir")
    p.add_argument("--metrics", default=None, help="JSONL metrics output path")
    p.add_argument("--data", default=None,
                   help="HDF5 slice dataset: train file-backed instead of on-device synthesis")
    p.add_argument("--split", default="train", help="dataset split for --data")
    p.add_argument("--platform", default=None,
                   help="force JAX platform (cpu for local dev; default: env)")
    p.add_argument("--devices", type=int, default=None,
                   help="data-parallel device count (mesh over the first N devices)")
    p.add_argument("--angle-devices", type=int, default=None,
                   help="angle-shard the physics operators over this many "
                        "devices (composes with --devices into a "
                        "data x angle mesh — the beyond-HBM recipe, "
                        "SURVEY.md §5.7; all three geometries)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of steps 10-15 here")
    p.add_argument("--dump-hlo", default=None, metavar="DIR",
                   help="dump XLA HLO for every compile to DIR "
                        "(per-kernel cost analysis, SURVEY.md §5.1)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN; slow)")
    p.add_argument("--checkify", action="store_true",
                   help="run the train step under checkify (NaN/Inf + "
                        "index-bounds sanitizer; single-device, slow)")
    p.add_argument("--tb-dir", default=None,
                   help="TensorBoard log directory (clu metric_writers)")
    p.add_argument("--dump-config", action="store_true",
                   help="print the resolved config JSON and exit")
    p.add_argument("--watchdog-secs", type=float,
                   default=float(os.environ.get("PDUNET_WATCHDOG_SECS", 0)),
                   help="abort (exit 87) if no training step completes for "
                        "this many seconds — bounds the cost of a wedged "
                        "axon compile RPC; the run resumes from the last "
                        "checkpoint. 0 disables (default; env "
                        "PDUNET_WATCHDOG_SECS overrides)")
    return p.parse_args(argv)


def resolve_config(args):
    from pdunet_tpu.configs import ExperimentConfig, get_preset

    if args.config:
        config = ExperimentConfig.from_json(pathlib.Path(args.config).read_text())
    elif args.preset:
        config = get_preset(args.preset)
    else:
        raise SystemExit("need --preset or --config (try --preset fbp_unet_parallel)")

    overrides = {}
    for item in args.set:
        key, _, value = item.partition("=")
        overrides[key] = value
    if overrides:
        config = config.override(overrides)
    if args.ckpt_dir is not None:
        config = dataclasses.replace(
            config, train=dataclasses.replace(config.train, ckpt_dir=args.ckpt_dir)
        )
    if getattr(args, "resume", "auto") == "none" and config.train.ckpt_dir:
        # fresh run: refuse to silently clobber an existing run dir
        ckpt = pathlib.Path(config.train.ckpt_dir)
        if ckpt.exists() and any(ckpt.iterdir()):
            raise SystemExit(
                f"--resume none but {ckpt} is non-empty; remove it or use --resume auto"
            )
    return config


def main(argv=None):
    args = parse_args(argv)
    if args.dump_hlo:
        import os

        # must land in XLA_FLAGS before the first backend initialization
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={args.dump_hlo}"
        ).strip()
    from pdunet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    config = resolve_config(args)
    if args.dump_config:
        print(config.to_json())
        return 0

    if args.watchdog_secs > 0:
        from pdunet_tpu.utils import watchdog

        watchdog.start(args.watchdog_secs, label=f"train:{config.name}")

    from pdunet_tpu.training.loop import train

    result = train(
        config, steps=args.steps, metrics_path=args.metrics, verbose=True,
        n_devices=args.devices, angle_devices=args.angle_devices,
        profile_dir=args.profile_dir,
        tb_dir=args.tb_dir, data=args.data, split=args.split,
        checked=args.checkify,
    )
    print(f"[done] final eval: {result.final_eval}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
