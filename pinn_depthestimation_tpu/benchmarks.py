"""Residual-throughput benchmark (packaged; ``bench.py`` at the repo root and
``pinn-tpu bench`` both delegate here).

Metric (BASELINE.md north star): collocation-point residual evaluations per
second per chip on the flagship newmethod configuration (2 -> [20]*100 -> 3
MLP, ``continuity_only`` residual: forward + x/y tangent propagation +
residual algebra per point), at reference-equivalent f32 precision. The
north-star target is 1e8/s on a v5e-8 slice == 1.25e7 per chip.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

PER_CHIP_TARGET = 1e8 / 8


def residual_eval_fn(spec, backend: str = "auto", precision: str = "f32"):
    """Returns (f(params, coords) -> per-point residual, backend_name)."""
    from pinn_depthestimation_tpu import physics
    from pinn_depthestimation_tpu.models import mlp_apply_with_tangents
    from pinn_depthestimation_tpu.ops import kernels

    if backend == "auto":
        backend = "pallas" if kernels.pallas_supported() else "xla"

    if backend == "pallas":
        def fn(params, coords):
            return kernels.fused_residual_continuity(
                params, coords, spec, precision=precision
            )
        return fn, f"pallas-{precision}"

    def fn(params, coords):
        awt = functools.partial(mlp_apply_with_tangents, params, spec=spec)
        _, fields, grads = physics.model_fields_and_grads(
            awt, coords, ["x", "y"], ["x", "y"], ["U", "V", "h"]
        )
        return physics.continuity_only_residuals(fields, grads)

    return fn, "xla"


def run_residual_bench(
    *,
    n_points: int = 10_000_000,  # the BASELINE.md scaled-case batch size
    backend: str = "auto",
    precision: str = "f32",
    reps: int = 7,
) -> dict:
    from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params
    from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    spec = MLPSpec(sizes=(2,) + (20,) * 100 + (3,), init_type="xavier")
    params = init_mlp_params(jax.random.PRNGKey(0), spec)
    coords = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (n_points, 2)), jnp.float32
    )

    fn, backend_name = residual_eval_fn(spec, backend, precision)
    run = jax.jit(lambda p, c: jnp.sum(fn(p, c) ** 2))

    # Sync by fetching the scalar: through the remote-TPU tunnel,
    # block_until_ready alone does NOT reliably wait.
    try:
        float(run(params, coords))
    except Exception:
        if backend != "auto":
            raise
        # kernel path failed (e.g. Mosaic regression): report the XLA
        # fallback rather than nothing
        fn, backend_name = residual_eval_fn(spec, "xla", precision)
        run = jax.jit(lambda p, c: jnp.sum(fn(p, c) ** 2))
        float(run(params, coords))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(params, coords))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]  # median: robust to tunnel jitter

    evals_per_sec = n_points / dt
    return {
        "metric": f"residual_evals_per_sec_per_chip[{backend_name}]",
        "value": round(evals_per_sec, 1),
        "unit": "collocation-point residual evals/s/chip (2->[20]x100->3 MLP, continuity)",
        "vs_baseline": round(evals_per_sec / PER_CHIP_TARGET, 4),
    }


def run_train_step_bench(
    *,
    n_iters: int = 500,
    reps: int = 3,
    nx: int = 81,
    ny: int = 261,
    hidden_layers: int = 100,
    width: int = 20,
    kernel_precision: str | None = None,
) -> float:
    """Deployed flagship Adam-step time, ms/iteration (median of ``reps``).

    Exactly the workload the reference's primary product trains
    (``config_CMB_h.json``: 2->[20]x100->3 on an 81x261 grid with ~41%
    NaN-masked rows -> 12,516 points, shared by the fidelity and residual
    terms per the newmethod contract, reference ``train_newmethod.py``),
    through the shipped ``Trainer``'s scan-chunked ``_adam_chunk`` — the
    same compiled program ``train_adam`` drives, so this number tracks the
    end-to-end training rate users see, not a stripped kernel
    microbenchmark. Precision/fusion resolve through the shipped defaults
    (``kernel_precision='auto'`` -> true f32; fused on TPU at this size)
    unless ``kernel_precision`` overrides the tier.
    Step time scales with the post-mask point count: 2.93 ms at 12,516
    points on v5e with the one-kernel step (~0.23 us/point/iter; the
    two-kernel era measured 5.11 ms / ~0.4 us/point/iter)."""
    import tempfile

    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.parity import make_config
    from pinn_depthestimation_tpu.training import Trainer
    from pinn_depthestimation_tpu.utils import synthetic
    from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    with tempfile.TemporaryDirectory() as tmp:
        mat = f"{tmp}/data.mat"
        synthetic.make_newmethod_mat(
            mat, nx=nx, ny=ny, nan_fraction=0.408, seed=21
        )
        raw = make_config(
            mat, n_iters, 0, hidden_layers=hidden_layers, hidden_width=width
        )
        if kernel_precision is not None:
            raw["kernel_precision"] = kernel_precision
        run_dir = f"{tmp}/run"
        os.makedirs(run_dir)
        trainer = Trainer(parse_config(raw), run_dir=run_dir, echo_every=0)
        key = jax.random.PRNGKey(0)

        def chunk():
            _, _, losses = trainer._adam_chunk(
                trainer.state.params, trainer.state.opt_state, trainer.batch,
                key, jnp.int32(0), n_iters,
            )
            np.asarray(losses)  # value fetch = sync through the TPU tunnel

        chunk()  # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            chunk()
            times.append(time.perf_counter() - t0)
        return round(sorted(times)[len(times) // 2] / n_iters * 1e3, 3)


def run_cmb_step_bench(*, n_iters: int = 500, reps: int = 3) -> float:
    """Deployed CMB-workload Adam step, ms/iteration (median of ``reps``) —
    the SECOND pipeline's training rate, so the perf story stops silently
    meaning 'the newmethod workload'. Reference ``config_CMB.json`` net
    (2->[10]x10->6), wave_averaged physics, separate fidelity CSV (200
    observation rows) + 81x261 residual grid at interval 1 (~20.5k
    collocation points), through the shipped Trainer defaults. This
    configuration cannot use the one-kernel step (separate points,
    wave_averaged) — fused 'auto' resolves to XLA at this depth (the
    measured faster tier: .soak/cmb_depth_sweep.py, 0.750 vs 0.835 ms)."""
    import tempfile

    from pinn_depthestimation_tpu.config import parse_config
    from pinn_depthestimation_tpu.parity import make_cmb_config
    from pinn_depthestimation_tpu.training import Trainer
    from pinn_depthestimation_tpu.utils import synthetic
    from pinn_depthestimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    with tempfile.TemporaryDirectory() as tmp:
        csv, mat = f"{tmp}/fid.csv", f"{tmp}/res.mat"
        synthetic.make_cmb_dataset(csv, mat, nx=81, ny=261, n_csv=400,
                                   seed=6, nan_fraction=0.03)
        raw = make_cmb_config(csv, mat, n_iters, 0, interval=1,
                              training_points=200)
        run_dir = f"{tmp}/run"
        os.makedirs(run_dir)
        trainer = Trainer(parse_config(raw), run_dir=run_dir, echo_every=0)
        key = jax.random.PRNGKey(0)

        def chunk():
            _, _, losses = trainer._adam_chunk(
                trainer.state.params, trainer.state.opt_state, trainer.batch,
                key, jnp.int32(0), n_iters,
            )
            np.asarray(losses)  # value fetch = sync through the TPU tunnel

        chunk()  # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            chunk()
            times.append(time.perf_counter() - t0)
        return round(sorted(times)[len(times) // 2] / n_iters * 1e3, 3)


def run_bench_suite(*, n_points: int = 10_000_000, reps: int = 7) -> dict:
    """The full driver record: headline = honest pallas-f32 number, plus the
    other two tiers as ``extras`` so regressions in any tier show up in the
    per-round BENCH history (the one-JSON-line contract is unchanged —
    extras ride inside the line)."""
    headline = run_residual_bench(n_points=n_points, reps=reps)
    extras = {}
    if "pallas" in headline["metric"]:
        # f32x3/bf16 at full size; XLA tier at a reduced point count (it is
        # ~3x slower and only needs a regression-tracking number)
        extras["f32x3"] = run_residual_bench(
            n_points=n_points, backend="pallas", precision="f32x3", reps=reps
        )["value"]
        extras["bf16"] = run_residual_bench(
            n_points=n_points, backend="pallas", precision="bf16", reps=reps
        )["value"]
        extras["xla"] = run_residual_bench(
            n_points=max(n_points // 4, 1), backend="xla", reps=max(reps - 2, 3)
        )["value"]
        # deployed training rate at the flagship workload (shipped defaults).
        # Guarded: the one-line BENCH record must survive a training-path
        # regression (e.g. a Mosaic compile failure in the VJP kernels) —
        # the residual headline above is the contract, this extra is bonus.
        for name, kprec in (
            ("adam_step_ms", None),
            ("adam_step_ms_f32x3", "f32x3"),
            ("adam_step_ms_bf16", "bf16"),
        ):
            try:
                extras[name] = run_train_step_bench(kernel_precision=kprec)
            except Exception as e:  # pragma: no cover - hardware-path guard
                extras[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            extras["cmb_step_ms"] = run_cmb_step_bench()
        except Exception as e:  # pragma: no cover - hardware-path guard
            extras["cmb_step_ms_error"] = f"{type(e).__name__}: {e}"[:200]
    headline["extras"] = extras
    return headline


def dead_relay_record() -> dict:
    """The one-line record emitted when the TPU tunnel relay is dead (no
    supervisor restarts it; every device op would hang ~30 min and then fail
    UNAVAILABLE): an honest reduced-size CPU measurement whose metric tag
    makes it impossible to mistake for a TPU number. Shared by bench.py and
    every `pinn-tpu bench` mode so the fallback is identical regardless of
    entry point."""
    rec = run_residual_bench(n_points=100_000, backend="xla", reps=3)
    rec["metric"] += "[cpu-fallback:dead-tpu-relay]"
    rec["extras"] = {"tpu_relay_dead": True}
    return rec


def main() -> None:
    from pinn_depthestimation_tpu.utils import relay

    if relay.pin_cpu_if_relay_dead():
        print(json.dumps(dead_relay_record()))
        return
    print(json.dumps(run_bench_suite()))
