"""Command-line interface.

The reference has no CLI: config filenames are hardcoded per entry script
(reference ``train.py:35``, ``test.py:137``) and runs start with
``python train.py``. Here every pipeline is one binary with the config
promoted to a flag (SURVEY.md §5 'Config / flag system'):

    pinn-tpu train --config config_CMB_h.json [--log-root ../log]
                   [--resume CKPT] [--init-from CKPT|PTH] [--mesh N]
                   [--run-name NAME] [--f64-polish MAX_IT]
                   [--precision-schedule PREFIX_ITERS[:TIER]]
    pinn-tpu test  --config config_CMB.json [--model CKPT]
    pinn-tpu bench
    pinn-tpu synth --out DIR [--nx 81 --ny 261]
    pinn-tpu plot-log --run-dir DIR

Exit codes follow the reference's behavior of exiting nonzero on unreadable
config/model (reference ``test.py:40-42,139-141``).
"""

from __future__ import annotations

import argparse
import sys


def _add_config_arg(p):
    p.add_argument("--config", required=True, help="JSON config (reference schema)")


def cmd_train(args) -> int:
    from pinn_depthestimation_tpu import parallel
    from pinn_depthestimation_tpu.config import load_config
    from pinn_depthestimation_tpu.training import Trainer
    from pinn_depthestimation_tpu.training.logging_utils import make_run_dir
    from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    try:
        config = load_config(args.config)
    except Exception as e:
        if args.debug:
            raise
        print(f"Error reading config file: {e}")
        return 1
    mesh = None
    try:
        if args.mesh:
            mesh = parallel.make_mesh(args.mesh)
        elif config.parallel.data:
            mesh = parallel.make_mesh(config.parallel.data, config.parallel.model)
    except ValueError as e:
        if args.debug:
            raise
        print(f"Error building device mesh: {e}")
        return 1

    if args.f64_polish is not None:
        # N>0 re-budgets max_it on top of any JSON-configured block (other
        # fields — backend, tolerances, history — are preserved; the eval
        # budget is re-derived from the new max_it); 0 disables the phase
        from pinn_depthestimation_tpu.config import _parse_f64_polish

        if args.f64_polish > 0:
            block = config.raw.get("f64_polish")
            block = dict(block) if isinstance(block, dict) else {}
            block["max_it"] = args.f64_polish
            block.pop("max_evaluation", None)
            config.f64_polish = _parse_f64_polish(block)
        else:
            config.f64_polish = None

    if args.precision_schedule is not None:
        # "PREFIX_ITERS[:TIER]" — merges onto any JSON-configured block
        # (an explicit :TIER overrides its tier); "0" disables the schedule
        from pinn_depthestimation_tpu.config import _parse_precision_schedule

        spec_str = str(args.precision_schedule)
        iters_str, _, tier = spec_str.partition(":")
        try:
            prefix_iters = int(iters_str)
        except ValueError:
            print(f"Error: --precision-schedule expects PREFIX_ITERS[:TIER], "
                  f"got {spec_str!r}")
            return 1
        if prefix_iters < 0:
            # mirror the JSON parser's >= 0 contract: a negative value is a
            # typo, not a request to disable (that is what 0 means)
            print(f"Error: --precision-schedule PREFIX_ITERS must be >= 0, "
                  f"got {prefix_iters} (0 disables the schedule)")
            return 1
        if prefix_iters > 0:
            block = config.raw.get("precision_schedule")
            block = dict(block) if isinstance(block, dict) else {}
            block["prefix_iters"] = prefix_iters
            if tier:
                block["prefix_precision"] = tier
            try:
                config.precision_schedule = _parse_precision_schedule(block)
            except Exception as e:
                if args.debug:
                    raise
                print(f"Error: {e}")
                return 1
        else:
            config.precision_schedule = None

    if args.init_from and args.resume:
        # --resume restores params wholesale, which would silently discard
        # the --init-from weights; refuse the ambiguous combination
        print("Error: --init-from and --resume are mutually exclusive "
              "(--resume restores the checkpoint's own weights)")
        return 1
    initial_params = None
    if args.init_from:
        # warm-start from existing weights — including a reference-trained
        # .pth (continue a reference run on TPU without losing it)
        import jax

        from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
        from pinn_depthestimation_tpu.training import checkpoint as ckpt_mod

        spec = MLPSpec.from_layers(config.layers)
        try:
            template = init_mlp_params(jax.random.PRNGKey(config.seed), spec)
            initial_params = ckpt_mod.restore_params_any(
                args.init_from, template, spec=spec
            )
        except Exception as e:
            if args.debug:
                raise
            print(f"Error loading --init-from weights: {e}")
            return 1

    run_dir = make_run_dir(args.log_root, args.run_name)
    print(f"Run directory: {run_dir}")
    trainer = Trainer(config, run_dir=run_dir, mesh=mesh,
                      initial_params=initial_params)
    if args.init_from:
        print(f"Initialized weights from {args.init_from}")
    if args.resume:
        trainer.restore(args.resume)
        print(f"Resumed from {args.resume} at iteration {trainer.state.iteration}")

    import contextlib
    import time

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        import jax

        profile_ctx = jax.profiler.trace(args.profile)
        print(f"Profiler trace -> {args.profile}")

    start = time.time()
    with profile_ctx:
        trainer.train()
    elapsed = time.time() - start
    # the reference's only perf instrumentation (train.py:286)
    print("Training time: %.4f" % elapsed)
    return 0


def cmd_test(args) -> int:
    import numpy as np

    from pinn_depthestimation_tpu.config import load_config
    from pinn_depthestimation_tpu.inference import Predictor
    from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    try:
        config = load_config(args.config)
    except Exception as e:
        if args.debug:
            raise
        print(f"Error reading config file: {e}")
        return 1
    try:
        predictor = Predictor(config, checkpoint_path=args.model)
    except Exception as e:
        if args.debug:
            raise
        print(f"Error loading model: {e}")
        return 1
    result = predictor.run()
    for key, arr in result.pred.items():
        # masked (NaN) grid cells are data-driven (dry/ungauged rows in the
        # test .mat propagate through prediction); summarize over wet cells
        nan_pct = 100.0 * float(np.isnan(arr).mean())
        line = f"pred_{key}: shape {arr.shape}, mean {float(np.nanmean(arr)):.5f}"
        if nan_pct:
            line += f" ({nan_pct:.1f}% masked cells)"
        print(line)
    if args.save:
        from scipy.io import savemat

        savemat(args.save, {f"pred_{k}": v for k, v in result.pred.items()})
        print(f"Predictions saved to {args.save}")
    if args.plot:
        from pinn_depthestimation_tpu.plotting import make_result_plots

        plot_cfg = dict(config.raw)
        plot_cfg.setdefault("plot", {})
        if args.plot is not True:  # a directory was given
            plot_cfg["plot"] = {**plot_cfg["plot"], "dir": args.plot}
        try:
            paths = make_result_plots(
                result, plot_cfg, cross_section=args.cross_section
            )
        except ValueError as e:
            print(f"Error making plots: {e}")
            return 1
        for path in paths:
            print(f"Wrote {path}")
    print("Prediction done!")
    return 0


def cmd_bench(args) -> int:
    import json

    from pinn_depthestimation_tpu import benchmarks
    from pinn_depthestimation_tpu.utils import relay

    if relay.pin_cpu_if_relay_dead():
        # Same fallback record as bench.py: a 10M-point suite (or the
        # flagship --step workload) on the 1-core CPU host would take
        # hours, and an untagged record could be mistaken for a deliberate
        # XLA-backend measurement in the BENCH history.
        print(json.dumps(benchmarks.dead_relay_record()))
        return 0
    if args.step:
        # deployed flagship Adam-step time through the shipped Trainer
        print(json.dumps({"metric": "flagship_adam_step_ms",
                          "value": benchmarks.run_train_step_bench(),
                          "unit": "ms/iteration (shipped defaults)"}))
    elif args.suite:
        # the driver record: headline + per-tier extras + adam_step_ms
        print(json.dumps(benchmarks.run_bench_suite(n_points=args.points)))
    else:
        print(json.dumps(benchmarks.run_residual_bench(
            n_points=args.points, backend=args.backend, precision=args.precision
        )))
    return 0


def cmd_video(args) -> int:
    from pinn_depthestimation_tpu.plotting import images_to_video

    out = images_to_video(args.dir, args.out, frame_rate=args.fps)
    print(f"Video saved to {out}")
    return 0


def cmd_parity(args) -> int:
    from pinn_depthestimation_tpu.parity import main as parity_main

    argv = [
        "--iters", str(args.iters), "--lbfgs", str(args.lbfgs),
        "--out", args.out,
        "--hidden-layers", str(args.hidden_layers), "--width", str(args.width),
        "--nx", str(args.nx), "--ny", str(args.ny),
        "--nan-fraction", str(args.nan_fraction),
        "--tol-grad", str(args.tol_grad), "--tol-change", str(args.tol_change),
        "--fields", args.fields, "--pipeline", args.pipeline,
        "--training-points", str(args.training_points),
    ]
    if args.f64_polish:
        argv += ["--f64-polish", str(args.f64_polish)]
    if args.ref_cache:
        argv += ["--ref-cache", args.ref_cache]
    if args.ref_only:
        argv += ["--ref-only"]
    return parity_main(argv)


def cmd_synth(args) -> int:
    import os

    from pinn_depthestimation_tpu.utils import synthetic

    os.makedirs(args.out, exist_ok=True)
    mat = os.path.join(args.out, "data_synth.mat")
    synthetic.make_newmethod_mat(mat, nx=args.nx, ny=args.ny, seed=args.seed)
    csv = os.path.join(args.out, "input_fid.csv")
    res = os.path.join(args.out, "input_res.mat")
    synthetic.make_cmb_dataset(csv, res, nx=args.nx, ny=args.ny, seed=args.seed)
    wrote = f"{mat}, {csv}, {res}"
    if args.legacy:
        snap_dir, fid_csv = synthetic.make_funwave_snapshot_dir(
            os.path.join(args.out, "beach2d"),
            nx=args.nx, ny=args.ny,
            snapshots=tuple(range(200, 200 + args.snapshots)),
            seed=args.seed,
        )
        wrote += f", {snap_dir}/ (FUNWAVE snapshots), {fid_csv}"
    print(f"Wrote {wrote}")
    return 0


def cmd_plot_log(args) -> int:
    from pinn_depthestimation_tpu.plotting import plot_log

    path = plot_log(args.run_dir, args.out or args.run_dir)
    print(f"Wrote {path}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pinn-tpu", description=__doc__)
    p.add_argument("--debug", action="store_true",
                   help="re-raise errors with a full traceback instead of "
                        "the friendly exit-1 message")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a PINN from a reference-schema config")
    _add_config_arg(t)
    t.add_argument("--log-root", default="./log")
    t.add_argument("--run-name", default=None, help="run dir name (default: timestamp)")
    t.add_argument("--resume", default=None, help="checkpoint to resume from")
    t.add_argument("--init-from", default=None,
                   help="warm-start weights from a checkpoint (.msgpack/orbax "
                        "or a reference .pth); training counters start fresh")
    t.add_argument("--mesh", type=int, default=None, help="data-parallel mesh size")
    t.add_argument("--f64-polish", type=int, default=None, metavar="MAX_IT",
                   help="append a float64 L-BFGS polish phase of up to MAX_IT "
                        "iterations; merges onto any JSON-configured "
                        "f64_polish block (its backend/tolerances/history are "
                        "kept, the eval budget re-derives from MAX_IT). "
                        "0 disables the phase. See README 'Float64 polish "
                        "phase'")
    t.add_argument("--precision-schedule", default=None,
                   metavar="PREFIX_ITERS[:TIER]",
                   help="staged-precision Adam prefix: the first PREFIX_ITERS "
                        "steps evaluate at the cheap TIER (bf16 default, or "
                        "f32x3), then the run continues at kernel_precision "
                        "(measured: the f32 tail preserves the f32 terminal "
                        "basin — MIGRATION.md 'Staged precision'). 0 disables "
                        "any JSON-configured schedule")
    t.add_argument("--profile", default=None,
                   help="write a jax.profiler trace to this directory")
    t.set_defaults(fn=cmd_train)

    te = sub.add_parser("test", help="run inference (+ optional physics adaptation)")
    _add_config_arg(te)
    te.add_argument("--model", default=None, help="checkpoint (default: data_test.model)")
    te.add_argument("--save", default=None, help="write predictions to this .mat")
    te.add_argument("--plot", nargs="?", const=True, default=False, metavar="DIR",
                    help="write the reference plot products (test.py:110-130); "
                         "optional output dir overrides config plot.dir")
    te.add_argument("--cross-section", type=int, default=None,
                    help="row index for the 1-D profiles (default: mid row; "
                         "the reference hardcodes 131)")
    te.set_defaults(fn=cmd_test)

    b = sub.add_parser("bench", help="residual-throughput benchmark")
    b.add_argument("--points", type=int, default=10_000_000)
    b.add_argument("--backend", choices=["auto", "pallas", "xla"], default="auto")
    b.add_argument("--precision", choices=["f32", "f32x3", "bf16"], default="f32")
    b.add_argument("--suite", action="store_true",
                   help="the full driver record (all tiers + the deployed "
                        "Adam-step time), same line bench.py prints")
    b.add_argument("--step", action="store_true",
                   help="only the deployed flagship Adam-step time (ms/iter)")
    b.set_defaults(fn=cmd_bench)

    v = sub.add_parser("video", help="PNG sequence -> AVI (utilities/imgtovid.py)")
    v.add_argument("--dir", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--fps", type=int, default=5)
    v.set_defaults(fn=cmd_video)

    pa = sub.add_parser(
        "parity", help="full-schedule parity experiment vs the actual reference"
    )
    pa.add_argument("--iters", type=int, default=50_000)
    pa.add_argument("--lbfgs", type=int, default=500)
    pa.add_argument("--out", default="PARITY_REPORT.md")
    pa.add_argument("--hidden-layers", type=int, default=3,
                    help="hidden layer count (flagship: 100)")
    pa.add_argument("--width", type=int, default=16, help="hidden width (flagship: 20)")
    pa.add_argument("--nx", type=int, default=16, help="grid columns (flagship: 81)")
    pa.add_argument("--ny", type=int, default=14, help="grid rows (flagship: 261)")
    pa.add_argument("--nan-fraction", type=float, default=0.05,
                    help="NaN observation fraction (flagship dataset: 0.408)")
    pa.add_argument("--tol-grad", type=float, default=1e-5,
                    help="L-BFGS tolerance_grad (reference config value 1e-5; "
                         "tighten for a deep L-BFGS horizon)")
    pa.add_argument("--tol-change", type=float, default=1e-7)
    pa.add_argument("--fields", choices=("plane", "structured"), default="plane",
                    help="synthetic field family: 'structured' makes the "
                         "h-field RMSE criterion discriminating (continuity-"
                         "constrained bathymetry)")
    pa.add_argument("--pipeline", choices=("newmethod", "cmb"),
                    default="newmethod",
                    help="reference pipeline to execute and track "
                         "(cmb = train.py + wave_averaged; its own recipe is "
                         "--hidden-layers 10 --width 10)")
    pa.add_argument("--training-points", type=int, default=0,
                    help="CMB fidelity subsample size; 0 = the reference "
                         "recipe's 12 (see parity --help)")
    pa.add_argument("--f64-polish", type=int, default=0, metavar="MAX_IT",
                    help="append the framework's float64 polish phase after "
                         "its f32 L-BFGS phase (PARITY_LBFGS_WARM.md)")
    pa.add_argument("--ref-cache", default=None,
                    help="npz caching the torch reference phase across processes")
    pa.add_argument("--ref-only", action="store_true",
                    help="run/cache only the reference phase")
    pa.set_defaults(fn=cmd_parity)

    s = sub.add_parser("synth", help="generate synthetic datasets (reference schema)")
    s.add_argument("--out", required=True)
    s.add_argument("--nx", type=int, default=81)
    s.add_argument("--ny", type=int, default=261)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--legacy", action="store_true",
                   help="also write a FUNWAVE snapshot dir + fidelity CSV "
                        "for the legacy numerical_model pipeline (config.json schema)")
    s.add_argument("--snapshots", type=int, default=21,
                   help="snapshot count for --legacy (reference uses 21: 200-220)")
    s.set_defaults(fn=cmd_synth)

    pl = sub.add_parser("plot-log", help="loss curves from a run dir's log.txt")
    pl.add_argument("--run-dir", required=True)
    pl.add_argument("--out", default=None)
    pl.set_defaults(fn=cmd_plot_log)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from pinn_depthestimation_tpu.utils import relay

    if relay.pin_cpu_if_relay_dead():
        print(
            "WARNING: TPU tunnel relay is dead (no listener on its ports); "
            "pinned the CPU backend to avoid a ~30 min hang. Performance "
            "will be CPU-bound.",
            file=sys.stderr,
        )
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
