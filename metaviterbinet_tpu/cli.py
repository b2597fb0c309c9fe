"""Command-line interface.

The reference's entry points are bare `__main__` blocks on each trainer
(va_trainer.py:49-51 et al.; its README.md:47 lists a unified factory as
future work). Here: one CLI over the detector registry.

    python -m metaviterbinet_tpu train    --detector vnet --snr 10
    python -m metaviterbinet_tpu evaluate --detector meta_vnet --eval-mode by_word
    python -m metaviterbinet_tpu sweep    --snrs 7 8 9 10 11 12
    python -m metaviterbinet_tpu bench

Any Config field can be overridden with --set key=value.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from metaviterbinet_tpu.config import Config, load_config
from metaviterbinet_tpu.detectors import DETECTORS


def _parse_set_overrides(pairs):
    fields = {f.name: f.type for f in dataclasses.fields(Config)}
    out = {}
    for pair in pairs or []:
        key, _, raw = pair.partition("=")
        if key not in fields:
            raise SystemExit(f"unknown config field: {key}")
        current = getattr(Config(), key)
        if isinstance(current, bool):
            out[key] = raw.lower() in ("1", "true", "yes")
        elif isinstance(current, int):
            out[key] = int(raw)
        elif isinstance(current, float):
            out[key] = float(raw)
        elif current is None:
            # Optional fields (e.g. use_pallas tri-state, mesh_shape tuple,
            # weights_dir str): accept bool words, then python literals, else
            # keep the string
            import ast
            if raw.lower() in ("true", "false"):
                out[key] = raw.lower() == "true"
            else:
                try:
                    out[key] = ast.literal_eval(raw)
                except (ValueError, SyntaxError):
                    out[key] = raw
        else:
            out[key] = raw
    return out


def _build_config(args) -> Config:
    overrides = _parse_set_overrides(args.set)
    if getattr(args, "snr", None) is not None:
        overrides.update(
            val_SNR_start=args.snr, val_SNR_end=args.snr,
            train_SNR_start=args.snr, train_SNR_end=args.snr,
        )
    if getattr(args, "eval_mode", None):
        overrides["eval_mode"] = args.eval_mode
    if getattr(args, "weights_dir", None):
        overrides["weights_dir"] = args.weights_dir
    return load_config(args.config, **overrides)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="metaviterbinet_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    def add_common(p):
        p.add_argument("--config", default=None, help="yaml config path")
        p.add_argument("--set", nargs="*", metavar="KEY=VALUE",
                       help="override any Config field")
        p.add_argument("--snr", type=float, default=None,
                       help="pin train+val SNR to one value")
        p.add_argument("--weights-dir", default=None)
        p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                       help="force a jax backend (the axon plugin overrides "
                            "JAX_PLATFORMS, so an env var alone is not enough)")

    p_train = sub.add_parser("train", help="offline (meta-)training")
    add_common(p_train)
    p_train.add_argument("--detector", choices=sorted(DETECTORS), required=True)

    p_eval = sub.add_parser("evaluate", help="aggregated or by-word evaluation")
    add_common(p_eval)
    p_eval.add_argument("--detector", choices=sorted(DETECTORS), required=True)
    p_eval.add_argument("--eval-mode", choices=["aggregated", "by_word"],
                        default=None)

    p_sweep = sub.add_parser("sweep", help="full SNR sweep over all curves")
    add_common(p_sweep)
    p_sweep.add_argument("--snrs", type=float, nargs="+",
                         default=[7, 8, 9, 10, 11, 12])
    p_sweep.add_argument("--channel", default="cost2100",
                         choices=["cost2100", "time_decay"])
    p_sweep.add_argument("--run-over", action="store_true")
    p_sweep.add_argument("--by-block", action="store_true")

    sub.add_parser("bench", help="run the headline benchmark")

    p_taps = sub.add_parser(
        "taps", help="plot channel tap trajectories "
                     "(reference channel_estimation.py:52-70)")
    add_common(p_taps)
    p_taps.add_argument("--channel", default="time_decay",
                        choices=["cost2100", "time_decay"])
    p_taps.add_argument("--fading-type", type=int, default=1, choices=[1, 2])
    p_taps.add_argument("--blocks", type=int, default=300)

    args = parser.parse_args(argv)

    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.command == "bench":
        import importlib.util
        import os

        from metaviterbinet_tpu.paths import ROOT_DIR

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(ROOT_DIR, "bench.py"))
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        bench.main()
        return 0

    if args.command == "taps":
        from metaviterbinet_tpu.plotters.figures import plot_tap_trajectories
        cfg = _build_config(args)
        path = plot_tap_trajectories(
            memory_length=cfg.memory_length, gamma=cfg.gamma,
            channel_coefficients=args.channel,
            fading_taps_type=args.fading_type, n_blocks=args.blocks,
            fading=cfg.fading_in_channel,
        )
        print(json.dumps({"figure": path}))
        return 0

    if args.command == "sweep":
        from metaviterbinet_tpu.plotters.experiments import run_sweep
        overrides = _parse_set_overrides(args.set)
        all_curves, fig = run_sweep(
            snrs=args.snrs, channel_coefficients=args.channel,
            run_over=args.run_over, plot_by_block_flag=args.by_block,
            **overrides,
        )
        print(json.dumps({
            "curves": [
                {"method": name, "mean_ser": float(sum(ser) / len(ser))}
                for ser, name, _, _ in all_curves
            ],
            "figure": fig,
        }))
        return 0

    from metaviterbinet_tpu.evaluation.trainer import Trainer

    cfg = _build_config(args)
    trainer = Trainer(cfg, args.detector)
    if args.command == "train":
        trainer.train()
        print(json.dumps({"status": "trained", "weights_dir": trainer.weights_dir}))
    else:
        sers = trainer.evaluate()
        print(json.dumps({
            "detector": args.detector, "eval_mode": cfg.eval_mode,
            "mean_ser": float(sers.mean()), "n_points": len(sers),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
