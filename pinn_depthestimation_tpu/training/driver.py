"""Training driver: Adam warm phase -> on-device L-BFGS, fully jitted.

Capability parity with the reference ``pinn`` classes (reference
``train.py:46-200``, ``train_newmethod.py:46-209``) with a TPU-first
execution model:

* the entire loss (two forward passes + derivative stack + reductions) is one
  jitted program; the Adam phase runs as ``lax.scan`` chunks of 1000 steps so
  the device never round-trips to the host inside the hot loop (the reference
  syncs every iteration at ``loss.item()``, ``train.py:170``);
* the L-BFGS phase is the on-device optimizer of ``optim.lbfgs`` — history,
  two-loop recursion and strong-Wolfe line search all live in device memory
  (the torch/SciPy versions round-trip weights per evaluation, SURVEY.md §3.5);
* loss histories are recorded into device buffers during each chunk and
  flushed to the reference-schema ``log.txt`` at chunk boundaries;
* checkpoints keep the reference ``model_<iter>`` naming and cadence, but
  store params + optimizer state + counters, enabling true ``--resume``;
* with a device mesh, batches shard over the ``data`` axis and parameters
  replicate; full-batch numerics are unchanged (masked means; XLA inserts
  the psum reductions).

The iteration counter counts *loss evaluations* exactly as the reference's
``self.iter`` does (incremented per ``loss_func`` call, Adam steps and L-BFGS
line-search evaluations alike — reference ``train.py:160``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from scipy.io import savemat

from pinn_depthestimation_tpu import data as data_mod
from pinn_depthestimation_tpu import parallel
from pinn_depthestimation_tpu.config import Config
from pinn_depthestimation_tpu.models import MLPSpec, init_mlp_params, mlp_apply
from pinn_depthestimation_tpu.optim import lbfgs as lbfgs_mod
from pinn_depthestimation_tpu.training import checkpoint as ckpt_mod
from pinn_depthestimation_tpu.training.logging_utils import LossLog, make_run_dir
from pinn_depthestimation_tpu.training.loss import (
    build_loss_fn,
    build_value_and_grad_fn,
    resolve_names,
)

_CHUNK = 1000  # scan-chunk length; divides every reference checkpoint cadence


def make_adam_optimizer(config: Config) -> optax.GradientTransformation:
    """Adam + StepLR-equivalent schedule.

    ``StepLR(step_size, gamma)`` stepped once per iteration (reference
    ``train.py:103-113,193``) is exactly a staircase exponential decay on the
    step count.
    """
    schedule = optax.exponential_decay(
        init_value=config.adam.learning_rate,
        transition_steps=config.adam.scheduler_step_size,
        decay_rate=config.adam.scheduler_gamma,
        staircase=True,
    )
    return optax.adam(schedule)  # torch Adam defaults == optax defaults


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    iteration: int  # completed loss evaluations


class Trainer:
    def __init__(
        self,
        config: Config,
        *,
        training_data: data_mod.TrainingData | None = None,
        run_dir: str | None = None,
        log_root: str = "./log",
        mesh=None,
        echo_every: int = 1000,
        initial_params=None,
        lbfgs_record_capacity: int | None = None,
    ):
        """``lbfgs_record_capacity``: device-side loss-record buffer size for
        the L-BFGS phase; sets the host re-entry (log flush / checkpoint /
        snapshot) granularity. Default ~1000 evaluations."""
        self.config = config
        self.spec = MLPSpec.from_layers(config.layers)
        self.mesh = mesh
        self.echo_every = echo_every
        self._lbfgs_record_capacity = lbfgs_record_capacity

        self.data = training_data if training_data is not None else data_mod.load_training_data(config)
        for name, arr in (
            ("fidelity", self.data.fidelity_input),
            ("residual", self.data.residual_input),
        ):
            if arr.shape[0] == 0:
                raise ValueError(
                    f"{name} batch is empty after loading/NaN-masking — refusing to train"
                )

        self.run_dir = run_dir or make_run_dir(log_root)
        self.log = LossLog(self.run_dir)

        host_batch = {
            "fidelity_input": self.data.fidelity_input,
            "fidelity_true": self.data.fidelity_true,
            "residual_input": self.data.residual_input,
        }
        if mesh is not None:
            self.batch = parallel.shard_batch(host_batch, mesh)
        else:
            self.batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

        self.use_fused_kernel = self._decide_fused_kernel()

        _loss_kwargs = dict(
            input_min_max=self.data.input_min_max,
            fused_kernel=self.use_fused_kernel,
            fused_precision=config.resolved_kernel_precision(),
            mesh=mesh,
            fidelity_is_residual=getattr(
                self.data, "fidelity_is_residual", False
            ),
        )
        self.loss_fn = build_loss_fn(
            config,
            self.spec,
            residual_chunk_size=config.residual_chunk_size,
            **_loss_kwargs,
        )
        # One-kernel loss+grad when the config permits (the flagship path);
        # None -> generic jax.value_and_grad(loss_fn) everywhere below.
        self.fused_step_fn = build_value_and_grad_fn(
            config, self.spec, **_loss_kwargs
        )
        self.value_and_grad_fn = self.fused_step_fn or (
            lambda p, b, rng=None: jax.value_and_grad(self.loss_fn, has_aux=True)(
                p, b, rng
            )
        )
        # Staged-precision Adam prefix (config.PrecisionScheduleConfig): a
        # second loss+grad program at the cheap tier for iterations below
        # the prefix boundary. Tiers live in the Pallas kernels, so on the
        # XLA path the prefix program IS the main program (the boundary
        # logic still runs — identical numerics, tested on CPU) and we say
        # so; likewise when the prefix tier equals the resolved main tier.
        sched = config.precision_schedule
        self._prefix_iters = 0
        self._prefix_value_and_grad = None
        if sched is not None and sched.prefix_iters > 0:
            self._prefix_iters = sched.prefix_iters
            main_tier = config.resolved_kernel_precision()
            if not self.use_fused_kernel or sched.prefix_precision == main_tier:
                if not self.use_fused_kernel and sched.prefix_precision != main_tier:
                    print(
                        "Warning: precision_schedule is inert on the XLA "
                        "(non-fused) path — precision tiers are properties "
                        "of the Pallas kernels; the whole run evaluates at "
                        "f32."
                    )
                self._prefix_value_and_grad = self.value_and_grad_fn
            else:
                kw = dict(_loss_kwargs, fused_precision=sched.prefix_precision)
                prefix_vg = build_value_and_grad_fn(config, self.spec, **kw)
                if prefix_vg is None:
                    prefix_loss = build_loss_fn(
                        config,
                        self.spec,
                        residual_chunk_size=config.residual_chunk_size,
                        **kw,
                    )
                    def prefix_vg(p, b, rng=None, _l=prefix_loss):
                        return jax.value_and_grad(_l, has_aux=True)(p, b, rng)
                self._prefix_value_and_grad = prefix_vg
        self.optimizer = make_adam_optimizer(config)

        if initial_params is not None:
            params = jax.tree.map(jnp.asarray, initial_params)
        else:
            params = init_mlp_params(jax.random.PRNGKey(config.seed), self.spec)
        opt_state = self.optimizer.init(params)
        if mesh is not None:
            params = parallel.replicate(params, mesh)
            opt_state = parallel.replicate(opt_state, mesh)
        self.state = TrainState(params=params, opt_state=opt_state, iteration=0)

        self._adam_chunk = self._build_adam_chunk()
        if self._prefix_value_and_grad is None:
            self._adam_chunk_prefix = None
        elif self._prefix_value_and_grad is self.value_and_grad_fn:
            # inert schedule (XLA path / tier == main tier): reuse the main
            # chunk program — a second identical closure would trace and
            # XLA-compile the whole Adam scan twice for nothing
            self._adam_chunk_prefix = self._adam_chunk
        else:
            self._adam_chunk_prefix = self._build_adam_chunk(
                self._prefix_value_and_grad
            )
        self._lbfgs_runner: lbfgs_mod.LBFGSRunner | None = None
        self._live_lbfgs_state = None       # exported into checkpoints
        self._pending_lbfgs_resume = None   # raw dict from a restored ckpt
        # f64 polish phase equivalents (checkpoint section "lbfgs64")
        self._lbfgs64_runner: lbfgs_mod.LBFGSRunner | None = None
        self._live_lbfgs64_state = None
        self._pending_lbfgs64_resume = None
        self._pending_params64 = None  # flat f64 iterate ("params64" section)
        self._predict = jax.jit(lambda p, x: mlp_apply(p, x, self.spec))

    def _decide_fused_kernel(self) -> bool:
        """Route the residual stack through the Pallas custom-VJP kernels?

        'on' forces it; 'auto' enables it on TPU for large collocation sets
        (where the XLA path would need chunking). Mesh runs wrap the kernel
        in shard_map with psum'd residual statistics.
        """
        mode = self.config.fused_kernel
        spec = self.spec
        structurally_ok = (
            spec.dropout_rate == 0.0
            and spec.n_hidden >= 1
            and max(spec.width, spec.d_in, spec.d_out) <= 128
        )
        if mode == "on":
            if not structurally_ok:
                raise ValueError(
                    "fused_kernel='on' requires no dropout, >=1 hidden layer "
                    "and width <= 128"
                )
            return True
        if mode == "off" or not structurally_ok:
            return False
        try:
            # the devices that will actually run the kernel: the mesh's if
            # present (dry runs build CPU meshes while a TPU is the default
            # backend), else the default backend's
            if self.mesh is not None:
                device = next(iter(self.mesh.devices.flat))
            else:
                device = jax.devices()[0]
            on_tpu = device.platform == "tpu"
        except Exception:
            on_tpu = False
        # leading-coordinate requirement of the fused kernel
        from pinn_depthestimation_tpu import physics as _ph

        names = resolve_names(self.config)
        needed = list(_ph.required_grad_coords(self.config.physics))
        leading = [
            names["residual_inputs"].index(c) for c in needed
        ] == list(range(len(needed)))
        # size threshold set from a scan-chunked Adam-step A/B on v5e
        # (101-layer flagship net, shared forward, round 2): fused/XLA
        # step-time ratio 1.00x @4096, 1.05x @8192, 1.13x @12514 (the
        # reference workload), 1.18x @16384 — crossover ~4k, clear win from
        # 8k up, so the flagship config_CMB_h problem trains fused by default
        big = self.data.residual_input.shape[0] >= 8192
        # WHICH fused path would run also matters (round-4 depth sweeps on
        # v5e at ~20.5k pts): with the ONE-KERNEL step (newmethod contract)
        # fused wins at every depth measured (xla/fused 1.20x @10 layers to
        # 2.01x @100 — .soak/fused_depth_sweep.py); on the generic two-kernel
        # path (CMB/legacy: separate fidelity forward, residual assembled in
        # XLA from kernel tangents) XLA wins shallow nets (0.90x @10) and
        # fused only from ~16 layers (1.23x @25, 1.49x @100 —
        # .soak/cmb_depth_sweep.py), so 'auto' keeps the reference CMB net
        # (10 layers) on XLA and deep nets fused.
        from pinn_depthestimation_tpu.training.loss import (
            one_kernel_step_applicable,
        )

        one_kernel = one_kernel_step_applicable(
            self.config, spec,
            getattr(self.data, "fidelity_is_residual", False),
        )
        deep_enough = one_kernel or spec.n_hidden >= 16
        return on_tpu and leading and big and deep_enough

    # ------------------------------------------------------------------ Adam

    def _build_adam_chunk(self, value_and_grad=None):
        value_and_grad, optimizer, spec = (
            value_and_grad or self.value_and_grad_fn, self.optimizer, self.spec
        )
        use_dropout = spec.dropout_rate > 0.0

        def chunk_fn(params, opt_state, batch, base_key, start, length):
            def body(carry, key):
                params, opt_state = carry
                dropout_rng = key if use_dropout else None
                (total, (fid, res)), grads = value_and_grad(
                    params, batch, dropout_rng
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), jnp.stack([fid, res, total])

            # per-step keys derived from the ABSOLUTE iteration index, so a
            # resumed run replays the exact dropout sequence an uninterrupted
            # run would have used from that point (chunk boundaries shift
            # after a mid-chunk resume; split-per-chunk keys would not)
            keys = (
                jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                    start + jnp.arange(length)
                )
                if use_dropout
                else jnp.zeros((length,))
            )
            (params, opt_state), losses = lax.scan(body, (params, opt_state), keys)
            return params, opt_state, losses

        return jax.jit(chunk_fn, static_argnames=("length",))

    def train_adam(self) -> None:
        """Run the Adam phase (reference ``train.py:188-193``).

        Resume-aware: Adam runs first and consumes one evaluation per step,
        so a restored counter of N means N Adam steps are already done
        (as long as N <= adam.max_it).
        """
        remaining = max(0, self.config.adam.max_it - self.state.iteration)
        base_key = jax.random.PRNGKey(self.config.seed + 1)
        while remaining > 0:
            n = min(_CHUNK, remaining)
            # staged-precision prefix: never let a chunk straddle the tier
            # boundary (absolute-iteration keyed, so resume lands correctly)
            in_prefix = (
                self._adam_chunk_prefix is not None
                and self.state.iteration < self._prefix_iters
            )
            if in_prefix:
                n = min(n, self._prefix_iters - self.state.iteration)
            chunk_fn = self._adam_chunk_prefix if in_prefix else self._adam_chunk
            params, opt_state, losses = chunk_fn(
                self.state.params,
                self.state.opt_state,
                self.batch,
                base_key,
                jnp.int32(self.state.iteration),
                n,
            )
            self.state.params, self.state.opt_state = params, opt_state
            self._record(np.asarray(losses))
            remaining -= n

    # ---------------------------------------------------------------- L-BFGS

    def train_lbfgs(self) -> None:
        """Run the L-BFGS phase (reference ``train.py:195-200``)."""
        cfg = self.config.lbfgs
        if cfg.max_it <= 0:
            return
        if (
            self._pending_lbfgs64_resume is not None
            and self.config.f64_polish is not None
            and self.config.f64_polish.max_it > 0
        ):
            # resumed from a mid-f64-polish checkpoint: the f32 phase had
            # already terminated when the polish began — warm-restarting it
            # here would waste its budget and perturb the exact continuation
            return
        if self._lbfgs_runner is None:
            self._lbfgs_runner = lbfgs_mod.LBFGSRunner(
                loss_fn=self.loss_fn,
                value_and_grad_fn=self.fused_step_fn,
                params_template=self.state.params,
                options=lbfgs_mod.LBFGSOptions(
                    lr=cfg.learning_rate,
                    max_iter=cfg.max_it,
                    max_eval=cfg.max_evaluation,
                    history_size=cfg.history_size,
                    tolerance_grad=cfg.tolerance_grad,
                    tolerance_change=cfg.tolerance_change,
                    line_search=cfg.line_search_fn,
                ),
                mesh=self.mesh,
                # ~1000-evaluation chunks: snapshot/checkpoint cadence inside
                # the phase then quantizes like the Adam phase does, instead
                # of at the default 8k-row buffer granularity
                record_capacity=(
                    self._lbfgs_record_capacity
                    if self._lbfgs_record_capacity is not None
                    else 1000 + 2 * (lbfgs_mod.MAX_LS + 2)
                ),
            )
        runner = self._lbfgs_runner
        if self._pending_lbfgs_resume is not None:
            # exact-trajectory continuation: the checkpoint carried the full
            # optimizer state (s/y history, direction, counters), so no init
            # evaluation and no history warm-restart
            state = runner.restore_state(self._pending_lbfgs_resume)
            self._pending_lbfgs_resume = None
        else:
            state = runner.init(self.state.params, self.batch)
        self._live_lbfgs_state = state
        while not runner.finished(state):
            state, records = runner.run_chunk(state, self.batch)
            # sync the live iterate BEFORE recording: checkpoints and the
            # 50k-snapshot cut inside this phase must see current weights
            # (the reference saves the live module, train.py:179)
            self.state.params = runner.get_params(state)
            self._live_lbfgs_state = state
            self._record(records)
        # the init evaluation's record may still be unflushed (immediate
        # convergence): the reference logs every closure call (train.py:162)
        state, leftover = runner.drain_records(state)
        self._live_lbfgs_state = state
        if leftover.size:
            self.state.params = runner.get_params(state)
            self._record(leftover)
        self.state.params = runner.get_params(state)

    # ------------------------------------------------------------ f64 polish

    def _make_device_eval_vg(self, loss_fn, params64, batch64):
        """The ``backend='device_eval'`` evaluation leaf: the L-BFGS loop
        stays a CPU-backend f64 program (native f64 control flow — this TPU
        stack's emulated-f64 device LOOPS kernel-fault, CLAUDE.md), while
        every loss+gradient evaluation crosses to the default accelerator
        through a ``pure_callback``. Single f64 evaluations DO work on
        the TPU (~0.9 s at flagship shape vs 2.3-5.5 s host-CPU) and the
        per-evaluation round-trip (~25 ms tunnel RTT + one flat parameter
        vector) amortizes over them — the historical SciPy-wrapper control
        shape (SURVEY.md §3.5) with the optimizer math kept on-host.

        Returns ``vg(params, batch) -> ((total, (fid, res)), grads)`` for
        ``LBFGSRunner(value_and_grad_fn=...)``; the runner's ``batch``
        argument is ignored — evaluations use the accelerator-resident copy
        installed here.
        """
        from jax.flatten_util import ravel_pytree

        accel = jax.devices()[0]
        flat0, unravel = ravel_pytree(params64)
        n = int(flat0.shape[0])
        batch_dev = jax.tree.map(
            lambda a: jax.device_put(np.asarray(a, np.float64), accel), batch64
        )

        @jax.jit
        def vg_dev(x):
            def flat_loss(z):
                return loss_fn(unravel(z), batch_dev)

            return jax.value_and_grad(flat_loss, has_aux=True)(x)

        # Callback outputs are passed through ``dtypes.canonicalize_value``
        # by JAX AFTER the user function returns — on whatever runtime thread
        # executes the callback, where x64 mode is usually DISABLED (it is
        # thread-local; our enable_x64 context has already exited). A raw
        # f64 return would be silently rounded to f32 there (observed as an
        # intermittent "Expected: float64, Actual: float32" depending on the
        # executing thread). uint32 is never canonicalized, so every f64
        # value crosses the callback boundary as a (..., 2) uint32 bit
        # pattern and is bitcast back inside the traced program.
        def pack(a):
            a = np.asarray(a, np.float64)
            shape = a.shape  # before ascontiguousarray, which promotes 0-d to (1,)
            flat = np.ascontiguousarray(a).reshape(-1)
            return flat.view(np.uint32).reshape(shape + (2,))

        def host_eval(x):
            # the callback runs on a runtime thread: re-enter x64 mode there
            # (it is thread-local), or device_put would silently round to f32
            with jax.enable_x64():
                x_dev = jax.device_put(np.asarray(x, np.float64), accel)
                (total, (fid, res)), g = vg_dev(x_dev)
                # host fetches double as the device sync (block_until_ready
                # is unreliable through the TPU tunnel)
                return (pack(total), pack(fid), pack(res), pack(g))

        shapes = (
            jax.ShapeDtypeStruct((2,), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
            jax.ShapeDtypeStruct((2,), jnp.uint32),
            jax.ShapeDtypeStruct((n, 2), jnp.uint32),
        )

        def value_and_grad_fn(params, batch):
            del batch  # accelerator-resident copy is authoritative
            x, _ = ravel_pytree(params)
            # pure_callback, not io_callback: the evaluation is pure in x
            # (value_and_grad of a fixed batch), so XLA may cache or reorder
            # it freely and no ordered-io token machinery is needed
            packed = jax.pure_callback(
                host_eval, shapes, x, vmap_method="sequential"
            )
            total, fid, res, g = (
                lax.bitcast_convert_type(p, jnp.float64) for p in packed
            )
            return (total, (fid, res)), unravel(g)

        return value_and_grad_fn

    def train_f64_polish(self) -> None:
        """Optional float64 L-BFGS polish phase (framework extension,
        ``config.F64PolishConfig`` — no reference counterpart).

        Deep f32 quasi-Newton convergence is bounded by the ~5e-9 loss-
        evaluation noise floor: when every available decrement is sub-noise,
        strong-Wolfe bracketing collapses to a zero step and the phase
        terminates far from a critical point (measured anatomy in
        PARITY_LBFGS_WARM.md). This phase re-runs the same torch-semantics
        optimizer in f64, where those decrements are resolvable again — on
        the host CPU backend by default (TPUs have no native f64, and this
        stack's emulated-f64 device loops fault; ``backend='default'`` opts
        into on-device f64 where the stack supports it).

        Evaluations stream into ``log.txt``/checkpoints through the same
        ``_record`` path as the other phases; the final parameters are
        rounded back to the model's f32 contract. Block-end checkpoints cut
        during the phase embed the full f64 optimizer state (section
        ``lbfgs64`` — iterate, s/y history, counters), so ``--resume``
        continues the interrupted polish exactly, without re-running the
        already-terminated f32 L-BFGS phase.
        """
        cfg = self.config.f64_polish
        if cfg is None or cfg.max_it <= 0:
            return
        backend = cfg.backend
        # (with no accelerator present, 'device_eval' degenerates to 'cpu'
        # semantics — the callback's "device" is the host CPU backend — so
        # CI exercises the very code path real hardware runs)
        # the optimizer loop's device: host CPU except for the explicit
        # whole-loop-on-device opt-in ('default')
        device = (
            jax.devices()[0] if backend == "default" else jax.devices("cpu")[0]
        )
        if device.platform == "tpu":
            # TPUs have no native f64; emulated-f64 device loops are known to
            # kernel-fault at least some runtimes (CLAUDE.md). The opt-in
            # stands for stacks that support it — but say so loudly.
            print(
                "Warning: f64_polish backend='default' resolved to a TPU "
                "device. TPU f64 is software-emulated and the full L-BFGS "
                "loop is known to fault some TPU runtimes; if this run "
                "crashes here, use the default backend='cpu'."
            )

        def to_f64(tree):
            return jax.tree.map(
                lambda a: jax.device_put(np.asarray(a, np.float64), device), tree
            )

        with jax.enable_x64():
            params64 = to_f64(self.state.params)
            # the plain host batch (not the possibly sharded/padded training
            # batch): the polish phase is single-device by construction
            batch64 = to_f64(
                {
                    "fidelity_input": self.data.fidelity_input,
                    "fidelity_true": self.data.fidelity_true,
                    "residual_input": self.data.residual_input,
                }
            )
            # XLA path only: the Pallas kernels are f32/bf16 MXU programs
            loss_fn = build_loss_fn(
                self.config,
                self.spec,
                residual_chunk_size=self.config.residual_chunk_size,
                input_min_max=self.data.input_min_max,
                fidelity_is_residual=getattr(
                    self.data, "fidelity_is_residual", False
                ),
            )
            device_eval_vg = (
                self._make_device_eval_vg(loss_fn, params64, batch64)
                if backend == "device_eval"
                else None
            )
            runner = lbfgs_mod.LBFGSRunner(
                loss_fn=loss_fn,
                params_template=params64,
                value_and_grad_fn=device_eval_vg,
                donate_state=device_eval_vg is None,
                options=lbfgs_mod.LBFGSOptions(
                    lr=cfg.learning_rate,
                    max_iter=cfg.max_it,
                    max_eval=cfg.max_evaluation,
                    history_size=cfg.history_size,
                    tolerance_grad=cfg.tolerance_grad,
                    tolerance_change=cfg.tolerance_change,
                    line_search=cfg.line_search_fn,
                ),
                # f64 evaluations are orders of magnitude slower than the f32
                # phases' — default to a ~50-eval host re-entry cadence so
                # log flushes/checkpoints stay regular on long polishes
                record_capacity=(
                    self._lbfgs_record_capacity
                    if self._lbfgs_record_capacity is not None
                    else 50 + 2 * (lbfgs_mod.MAX_LS + 2)
                ),
            )

            def sync_params(state) -> None:
                # round the live f64 iterate back to the f32 model contract
                # BEFORE recording: checkpoints/snapshots cut by _record must
                # see current weights
                self.state.params = jax.tree.map(
                    lambda a: jnp.asarray(np.asarray(a, np.float32)),
                    runner.get_params(state),
                )

            self._lbfgs64_runner = runner
            if self._pending_lbfgs64_resume is not None:
                # exact continuation of an interrupted polish: the f64
                # iterate/history come from the checkpoint (the f32 params
                # in it are the rounded shadow), pinned to this phase's
                # device so the jitted chunks keep running there
                state = jax.tree.map(
                    lambda a: jax.device_put(a, device),
                    runner.restore_state(self._pending_lbfgs64_resume),
                )
                self._pending_lbfgs64_resume = None
                # the checkpoint's params64 is this same state's iterate —
                # consume it too so a later train() call can't seed from a
                # by-then-outdated vector
                self._pending_params64 = None
            else:
                pending64 = self._pending_params64
                self._pending_params64 = None
                if pending64 is not None:
                    # a prior polish's exact f64 iterate ("params64"): use it
                    # instead of the f32-cast params IF the live params are
                    # still its untouched f32 shadow — re-polishing from the
                    # rounded shadow would re-pay the ~f32-eps perturbation a
                    # finished polish already descended through
                    flat64 = np.asarray(pending64, np.float64).ravel()
                    from jax.flatten_util import ravel_pytree

                    cur, _ = ravel_pytree(
                        jax.tree.map(
                            lambda a: jnp.asarray(np.asarray(a)), self.state.params
                        )
                    )
                    cur = np.asarray(cur, np.float32)
                    if flat64.shape == (runner.n_params,) and np.array_equal(
                        flat64.astype(np.float32), cur
                    ):
                        params64 = jax.tree.map(
                            lambda a: jax.device_put(a, device),
                            runner.params_from_flat(flat64),
                        )
                state = runner.init(params64, batch64)
            self._live_lbfgs64_state = state
            while not runner.finished(state):
                state, records = runner.run_chunk(state, batch64)
                sync_params(state)
                self._live_lbfgs64_state = state
                self._record(records)
            state, leftover = runner.drain_records(state)
            self._live_lbfgs64_state = state
            sync_params(state)
            if leftover.size:
                self._record(leftover)

    # ------------------------------------------------------------- lifecycle

    def train(self) -> None:
        """Both phases + snapshot + final save (reference ``train.py:185-200``,
        snapshot semantics of ``train_newmethod.py:141-153``: predictions are
        captured when the evaluation counter *reaches* ``snapshot_iteration``,
        i.e. with the parameters current at that moment)."""
        import time

        t0 = time.time()
        start_evals = self.state.iteration
        self.train_adam()
        t_adam = time.time()
        self._maybe_snapshot()
        self.train_lbfgs()
        t_lbfgs = time.time()
        evals_f32 = self.state.iteration
        self.train_f64_polish()
        t_polish = time.time()
        self.save("model")  # final save (reference train.py:288)

        # Observability the reference lacks (SURVEY.md §5): per-phase wall
        # time and collocation-residual throughput (the BASELINE metric).
        # throughput over the f32 phases only: the optional f64 polish runs
        # on a different backend at a deliberately different operating point
        evals = evals_f32 - start_evals
        points = int(self.data.residual_input.shape[0])
        total_t = max(t_lbfgs - t0, 1e-9)
        self.stats = {
            "adam_seconds": t_adam - t0,
            "lbfgs_seconds": t_lbfgs - t_adam,
            "loss_evaluations": evals,
            "collocation_points": points,
            "residual_point_evals_per_sec": evals * points / total_t,
        }
        polish = ""
        if self.config.f64_polish is not None and self.config.f64_polish.max_it > 0:
            self.stats["f64_polish_seconds"] = t_polish - t_lbfgs
            polish = f", f64 polish {self.stats['f64_polish_seconds']:.1f}s"
        print(
            f"Phase times: adam {self.stats['adam_seconds']:.1f}s, "
            f"lbfgs {self.stats['lbfgs_seconds']:.1f}s{polish} | "
            f"{evals} loss evals x {points} collocation pts -> "
            f"{self.stats['residual_point_evals_per_sec']:.3e} residual point-evals/s"
        )

    def _record(self, losses: np.ndarray) -> None:
        """Flush a (n, 3) loss-history block to log.txt + stdout + checkpoints."""
        start = self.state.iteration
        rows = []
        for i in range(losses.shape[0]):
            epoch = start + i + 1
            fid, res, total = (float(x) for x in losses[i])
            rows.append((epoch, fid, res, total))
        self.log.append(rows)
        self.state.iteration = start + losses.shape[0]
        for epoch, fid, res, total in rows:
            if self.echo_every and epoch % self.echo_every == 0:
                LossLog.echo(epoch, fid, res, total)
        it = self.state.iteration
        points = ckpt_mod.checkpoint_points(start, it, self.config.kind)
        for point in points[:-1]:
            # one file per crossed cadence point, named with the cadence
            # value (reference model_<iter> contract); each holds the
            # block-end state — see checkpoint.checkpoint_points. Only the
            # last point of a block carries the L-BFGS s/y history (~MBs for
            # a 100-deep ring buffer): earlier points in the same block would
            # embed byte-identical copies, and only the latest is a useful
            # resume target anyway.
            self.save(f"model_{point}", include_lbfgs=False)
        for point in points[-1:]:
            self.save(f"model_{point}")
        snap = self.config.snapshot_iteration
        if snap is not None and start < snap <= it:
            self._maybe_snapshot()

    def _maybe_snapshot(self) -> None:
        """Write the prediction snapshot .mat once the eval counter reached
        ``snapshot_iteration`` (reference ``train_newmethod.py:141-153``)."""
        snap = self.config.snapshot_iteration
        if snap is None or self.state.iteration < snap:
            return
        if getattr(self, "_snapshot_done", False):
            return
        self._snapshot_done = True
        names = resolve_names(self.config)
        inputs = jnp.asarray(self.data.residual_input)
        pred = np.asarray(self._predict(self.state.params, inputs))
        out = {
            f"pred_{key}": pred[:, i : i + 1]
            for i, key in enumerate(names["network_outputs"])
        }
        fname = "data_at50k.mat" if snap == 50_000 else f"data_at{snap}.mat"
        savemat(os.path.join(self.run_dir, fname), out)
        print(f"Data saved to {fname} after {snap:,} iterations.")

    def predict(self, inputs: np.ndarray) -> np.ndarray:
        return np.asarray(self._predict(self.state.params, jnp.asarray(inputs)))

    # ----------------------------------------------------------- checkpoints

    def _checkpoint_state(self, include_lbfgs: bool = True) -> dict:
        state = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "iteration": np.asarray(self.state.iteration, np.int64),
        }
        live = self._live_lbfgs_state
        if (
            include_lbfgs
            and live is not None
            and self._lbfgs_runner is not None
            and int(live.reason) == lbfgs_mod.RUNNING
        ):
            # mid-L-BFGS-phase checkpoints carry the full optimizer state so
            # --resume continues the exact trajectory (s/y history intact).
            # Finished states are NOT exported: resuming from a completed
            # run's checkpoint keeps the documented warm-restart semantics.
            state["lbfgs"] = self._lbfgs_runner.export_state(live)
        live64 = self._live_lbfgs64_state
        if (
            include_lbfgs
            and live64 is not None
            and self._lbfgs64_runner is not None
            and int(live64.reason) == lbfgs_mod.RUNNING
        ):
            # same contract for the f64 polish phase (multi-hour on the CPU
            # backend at flagship scale — exact resumability matters most
            # here); the f64 iterate rides alongside its f32-rounded shadow
            state["lbfgs64"] = self._lbfgs64_runner.export_state(live64)
        if include_lbfgs and live64 is not None:
            # the flat f64 iterate itself (~8 B/param) rides along once the
            # polish has run — finished states too, so a later run can
            # extend the polish without round-tripping through the f32
            # shadow. Gated like the other optimizer sections: mid-block
            # cadence checkpoints (include_lbfgs=False) would otherwise
            # embed byte-identical copies of the same iterate.
            state["params64"] = np.asarray(live64.x)
        return state

    def save(self, name: str, include_lbfgs: bool = True) -> str:
        return ckpt_mod.save_checkpoint(
            os.path.join(self.run_dir, name),
            self._checkpoint_state(include_lbfgs=include_lbfgs),
        )

    def restore(self, path: str) -> None:
        from flax import serialization

        raw = ckpt_mod.load_raw(path)
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "iteration": np.asarray(self.state.iteration, np.int64),
        }
        restored = serialization.from_state_dict(
            template, {k: raw[k] for k in template}
        )
        params = jax.tree.map(jnp.asarray, restored["params"])
        opt_state = jax.tree.map(jnp.asarray, restored["opt_state"])
        if self.mesh is not None:
            params = parallel.replicate(params, self.mesh)
            opt_state = parallel.replicate(opt_state, self.mesh)
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            iteration=int(restored["iteration"]),
        )
        # optional sections written by mid-phase checkpoints
        self._pending_lbfgs_resume = raw.get("lbfgs")
        self._pending_lbfgs64_resume = raw.get("lbfgs64")
        self._pending_params64 = raw.get("params64")
        # A run resumed past the snapshot point must not rewrite the
        # prediction snapshot (.mat) with later-iteration parameters: the
        # original run already captured it when the counter crossed snap.
        # (Edge: a crash between the block's cadence checkpoint and the
        # snapshot write loses the snapshot-eligible parameters for good —
        # warn rather than silently writing a mislabeled artifact.)
        snap = self.config.snapshot_iteration
        if snap is not None and self.state.iteration >= snap:
            self._snapshot_done = True
            fname = "data_at50k.mat" if snap == 50_000 else f"data_at{snap}.mat"
            if not os.path.exists(os.path.join(self.run_dir, fname)):
                print(
                    f"Warning: resumed at iteration {self.state.iteration} >= "
                    f"snapshot_iteration {snap} but {fname} is missing — the "
                    f"original run crashed inside the snapshot window; it "
                    f"will NOT be rewritten (current parameters are from a "
                    f"later iteration)"
                )
