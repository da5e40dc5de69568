"""Shared helpers for the experiment command-line scripts.

TPU-native counterpart of the reference's ``scripts/utils.py``: the same
argparse surface (common / observation-noise / HMC / CHMC / grid argument
groups, reference ``scripts/utils.py:25-166, 384-423``) wired to this
framework's fully on-device samplers instead of the Mici host loop.  Output
follows the reference's on-disk contract (args.json, info.log,
trace_*/stats_*.npy, summary.json) so its analysis pipeline applies directly.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def setup_jax(args):
    """Configure precision/platform.  Unlike the reference (pinned f64 CPU,
    ``utils.py:19-22``) the default here is the accelerator's native f32;
    pass ``--x64`` for the double-precision golden path."""
    jax.config.update("jax_default_matmul_precision", "highest")
    # Persistent compile cache: remote compiles through the TPU tunnel take
    # 1-40 min per large program; reruns/resumes of the same config must
    # reuse them (same policy as bench.py).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    elif os.environ.get("JAX_PLATFORMS") not in (None, "", "cpu"):
        # Keep the CPU backend available next to the accelerator so one-shot
        # initialisation programs can run locally (see cpu_init_scope).
        jax.config.update(
            "jax_platforms", os.environ["JAX_PLATFORMS"] + ",cpu"
        )


def cpu_init_scope():
    """Device scope for one-shot chain-initialisation computations.

    Through a remote-compile TPU tunnel a large init program can block the
    worker for tens of minutes of compile for a single execution whose FLOP
    count is trivial.  Initialisation is run on the local CPU backend
    instead (the sampler then pulls the arrays to the accelerator on first
    dispatch).  No-op when CPU is already the default backend.
    """
    import contextlib

    if jax.default_backend() == "cpu":
        return contextlib.nullcontext()
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        # CPU platform not registered (e.g. explicit --platform axon):
        # fall back to initialising on the accelerator.
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def checkpoint_resume_state(output_dir, keys=("q", "x_obs")):
    """Saved chain state from ``output_dir/checkpoint.npz``, or ``None``.

    The host-loop drivers (``sample_*_chains_host_loop``) overwrite the
    passed initial state with the checkpointed one whenever a checkpoint
    exists, so on resume the expensive fleet initialisation (e.g. the
    chain-vmapped gradient descent, ~15 min at 256 SIR chains) is dead
    work.  Callers gate init on this returning ``None``; when it returns
    arrays they are exactly the state the driver will resume from, so
    shape/dtype-dependent tracing still sees the right values.
    """
    import jax.numpy as jnp
    import numpy as onp

    path = os.path.join(output_dir, "checkpoint.npz")
    if not os.path.exists(path):
        return None
    try:
        with onp.load(path, allow_pickle=False) as ck:
            if any(k not in ck.files for k in keys):
                return None
            out = tuple(jnp.asarray(ck[k]) for k in keys)
    except (OSError, ValueError):
        # Torn/foreign file: fall back to a fresh init; the driver will
        # surface any real checkpoint problem itself.
        return None
    print(f"[init] resuming from {path}; skipping fleet initialisation")
    return out


def add_common_experiment_args(
    parser, default_num_steps_per_obs, default_num_warm_up_iter, default_num_main_iter
):
    parser.add_argument(
        "--output-root-dir",
        default="experiments",
        help="Root directory to make experiment output subdirectory in",
    )
    parser.add_argument(
        "--output-dir",
        default=None,
        help="Exact output directory (overrides the timestamped name under "
        "--output-root-dir); pointing at a directory holding a "
        "checkpoint.npz resumes an interrupted run from it",
    )
    parser.add_argument(
        "--num-steps-per-obs",
        type=int,
        default=default_num_steps_per_obs,
        help="Number of time steps per interobservation interval in inference",
    )
    parser.add_argument(
        "--splitting",
        choices=("standard", "gaussian"),
        default="standard",
        help="Hamiltonian splitting used to define the integrator step",
    )
    parser.add_argument(
        "--num-chain", type=int, default=4, help="Number of independent chains"
    )
    parser.add_argument(
        "--num-warm-up-iter",
        type=int,
        default=default_num_warm_up_iter,
        help="Number of adaptive warm-up iterations",
    )
    parser.add_argument(
        "--num-main-iter",
        type=int,
        default=default_num_main_iter,
        help="Number of main sampling iterations",
    )
    parser.add_argument(
        "--step-size-adaptation-target",
        type=float,
        default=0.8,
        help="Target acceptance statistic for step size adaptation",
    )
    parser.add_argument(
        "--step-size-reg-coefficient",
        type=float,
        default=0.1,
        help="Regularisation coefficient for step size adaptation",
    )
    parser.add_argument(
        "--seed", type=int, default=20200710, help="Random number generator seed"
    )
    parser.add_argument(
        "--x64",
        action="store_true",
        help="Run in double precision (CPU golden path; TPU default is f32)",
    )
    parser.add_argument(
        "--platform",
        default=None,
        help="Force a JAX platform (e.g. cpu); default uses the environment",
    )


def add_observation_noise_std_arg(parser, default_val=0.1):
    parser.add_argument(
        "--observation-noise-std",
        type=float,
        default=default_val,
        help=(
            "Observation noise standard deviation; a negative value means it "
            "is inferred, with |value| used to generate the data"
        ),
    )


def add_hmc_experiment_args(parser):
    parser.add_argument(
        "--max-tree-depth",
        type=int,
        default=20,
        help="Maximum binary-tree depth of the dynamic HMC transition",
    )
    parser.add_argument(
        "--metric-type",
        choices=("identity", "diagonal", "block", "dense"),
        default="identity",
        help="Mass-matrix type adapted during warm-up",
    )
    parser.add_argument(
        "--hmc-driver",
        choices=("auto", "ingraph", "host"),
        default="auto",
        help=(
            "Chain driver: in-graph scans (one program per warm-up window) "
            "or host loop (one bounded dispatch per iteration; default on "
            "accelerators whose runtimes kill long device executions)"
        ),
    )
    parser.add_argument(
        "--max-steps-per-dispatch",
        type=int,
        default=None,
        help=(
            "Host driver only: bound every device dispatch to at most this "
            "many leapfrog steps via the resumable chunked tree transition "
            "(default: 256 on accelerators when max tree depth > 10 -- a "
            "depth-20 tree can make 2**20 steps, far past execution "
            "watchdogs; 0 disables chunking)"
        ),
    )


def add_chmc_experiment_args(parser, default_num_obs_per_subseq):
    parser.add_argument(
        "--num-obs-per-subseq",
        type=int,
        default=default_num_obs_per_subseq,
        help="Average number of observations per blocked subsequence",
    )
    parser.add_argument(
        "--num-inner-h2-step",
        type=int,
        default=1,
        help="Inner h2-flow steps per constrained integrator step",
    )
    parser.add_argument(
        "--projection-solver",
        choices=("newton", "quasi-newton", "hybrid"),
        default="newton",
        help="Iterative solver for the manifold projection (hybrid = Newton "
        "with the Jacobian frozen for a few steps between re-linearisations; "
        "cuts the cross-chain iteration tail under vmap)",
    )
    parser.add_argument(
        "--projection-solver-max-iters",
        type=int,
        default=50,
        help="Maximum projection solver iterations",
    )
    parser.add_argument(
        "--projection-solver-constraint-tol",
        type=float,
        default=None,
        help="Constraint norm tolerance (default: precision-dependent)",
    )
    parser.add_argument(
        "--projection-solver-position-tol",
        type=float,
        default=None,
        help="Position change tolerance (default: precision-dependent)",
    )
    parser.add_argument(
        "--reverse-check-tol",
        type=float,
        default=None,
        help="Reversibility check tolerance (default: precision-dependent)",
    )
    parser.add_argument(
        "--max-tree-depth",
        type=int,
        default=10,
        help="Maximum binary-tree depth of the dynamic HMC transition",
    )
    parser.add_argument(
        "--chmc-driver",
        choices=("auto", "ingraph", "host"),
        default="auto",
        help=(
            "Chain driver: in-graph scans (one program per stage) or host "
            "loop (one bounded dispatch per sub-iteration with durable "
            "checkpoints; default on accelerators whose runtimes kill long "
            "device executions)"
        ),
    )
    parser.add_argument(
        "--init-step-size",
        type=float,
        default=0.5,
        help=(
            "Initial integrator step size for dual averaging (host driver; "
            "the in-graph driver runs its own coarse search)"
        ),
    )
    parser.add_argument(
        "--max-steps-per-dispatch",
        type=int,
        default=None,
        help=(
            "Host driver only: bound every device dispatch to at most this "
            "many constrained (RATTLE) steps via the resumable chunked tree "
            "transition (default: 64 on accelerators -- a constrained step "
            "is 1-2 orders heavier than a leapfrog step, so even depth-10 "
            "trees overrun tunnelled-worker execution watchdogs when "
            "dispatched whole; 0 disables chunking)"
        ),
    )
    parser.add_argument(
        "--checkpoint-every",
        type=int,
        default=None,
        help=(
            "Host driver only: checkpoint the full sampler state every N "
            "sweeps (default: 1 on accelerators, 16 on CPU)"
        ),
    )


def add_experiment_grid_args(parser):
    parser.add_argument(
        "--default-num-obs-per-subseq",
        type=int,
        default=5,
        help="Default obs per subsequence when not the grid variable",
    )
    parser.add_argument(
        "--default-num-steps-per-obs",
        type=int,
        default=25,
        help="Default steps per obs when not the grid variable",
    )
    parser.add_argument(
        "--default-num-obs",
        type=int,
        default=100,
        help="Default number of observation times when not the grid variable",
    )
    parser.add_argument(
        "--num-obs-per-subseq-grid",
        type=int,
        nargs="+",
        default=[2, 5, 10, 20, 50, 100],
    )
    parser.add_argument(
        "--num-steps-per-obs-grid",
        type=int,
        nargs="+",
        default=[25, 50, 100, 200, 400],
    )
    parser.add_argument(
        "--num-obs-grid", type=int, nargs="+", default=[25, 50, 100, 200, 400]
    )


def resolve_chmc_tolerances(args, obs_scale=1.0):
    from manifold_mcmc_tpu.utils.config import default_tolerances

    tols = default_tolerances(obs_scale=obs_scale)
    return dict(
        constraint_tol=args.projection_solver_constraint_tol
        or tols["constraint_tol"],
        position_tol=args.projection_solver_position_tol or tols["position_tol"],
        reverse_check_tol=args.reverse_check_tol or tols["reverse_check_tol"],
        divergence_tol=tols["divergence_tol"],
    )


def run_chmc_experiment(
    args,
    system,
    q_init,
    x_obs_init,
    trace_func,
    summary_vars,
    output_dir,
    obs_scale=1.0,
):
    """Sample CHMC chains, persist the output contract, return the summary."""
    import numpy as np

    from manifold_mcmc_tpu.samplers.chains import (
        sample_chmc_chains,
        sample_chmc_chains_host_loop,
    )
    from manifold_mcmc_tpu.utils import stats as diag
    from manifold_mcmc_tpu.utils.output import (
        save_summary,
        write_stats,
        write_traces,
    )

    tols = resolve_chmc_tolerances(args, obs_scale=obs_scale)
    driver = getattr(args, "chmc_driver", "auto")
    if driver == "auto":
        # Mirrors the HMC driver selection: accelerator runtimes behind an
        # execution watchdog cannot run the in-graph whole-stage programs;
        # the host loop dispatches one bounded sub-iteration at a time
        # (identical sweep bodies, so identical sampling semantics).
        driver = "host" if jax.default_backend() != "cpu" else "ingraph"
    common = dict(
        num_warm_up_iter=args.num_warm_up_iter,
        num_main_iter=args.num_main_iter,
        projection_solver=args.projection_solver,
        n_inner_step=args.num_inner_h2_step,
        max_solver_iters=args.projection_solver_max_iters,
        max_tree_depth=args.max_tree_depth,
        adapt_stat_target=args.step_size_adaptation_target,
        step_size_reg_coefficient=args.step_size_reg_coefficient,
        trace_func=trace_func,
        **tols,
    )
    start = time.time()
    if driver == "host":
        on_accel = jax.default_backend() != "cpu"
        chunk = getattr(args, "max_steps_per_dispatch", None)
        if chunk is None and on_accel:
            # A constrained RATTLE step (projection solves inside) is 1-2
            # orders heavier than a Euclidean leapfrog step, so even
            # depth-10 trees (up to 1024 steps) overrun tunnelled-worker
            # execution watchdogs (~20-40 s) when dispatched whole.  Chunk
            # unconditionally on accelerators; RNG stream and results are
            # unchanged.
            chunk = 64
        ckpt_every = getattr(args, "checkpoint_every", None)
        if ckpt_every is None:
            # Accelerator sweeps cost minutes through the tunnel; a
            # time-bounded attempt must never lose a completed one.
            ckpt_every = 1 if on_accel else 16
        result = sample_chmc_chains_host_loop(
            system,
            q_init,
            x_obs_init,
            jax.random.PRNGKey(args.seed),
            init_step_size=getattr(args, "init_step_size", 0.5),
            checkpoint_path=os.path.join(output_dir, "checkpoint.npz"),
            checkpoint_every=ckpt_every,
            progress_every=4 if on_accel else 16,
            max_steps_per_dispatch=chunk or None,
            **common,
        )
    else:
        result = sample_chmc_chains(
            system,
            q_init,
            x_obs_init,
            jax.random.PRNGKey(args.seed),
            **common,
        )
    jax.block_until_ready(result["final_pos"])
    sampling_time = time.time() - start
    traces = {k: np.asarray(v) for k, v in result["traces"].items()}
    stats = {k: np.asarray(v) for k, v in result["stats"].items()}
    write_traces(output_dir, traces)
    write_stats(output_dir, stats)
    summary = diag.summary(traces, summary_vars)
    return save_summary(
        output_dir,
        summary,
        sampling_time,
        float(result["final_step_size"]),
        traces,
    )


def run_hmc_experiment(args, system, q_init, trace_func, summary_vars, output_dir):
    """Sample dynamic-HMC chains, persist the output contract, return summary."""
    import numpy as np

    from manifold_mcmc_tpu.samplers.chains import (
        sample_hmc_chains,
        sample_hmc_chains_host_loop,
    )
    from manifold_mcmc_tpu.utils import stats as diag
    from manifold_mcmc_tpu.utils.output import (
        save_summary,
        write_stats,
        write_traces,
    )

    driver = getattr(args, "hmc_driver", "auto")
    if driver == "auto":
        # Accelerator runtimes behind an execution watchdog cannot run the
        # in-graph driver's whole-window programs; the host loop dispatches
        # one bounded iteration at a time (same sampling semantics).
        driver = "host" if jax.default_backend() != "cpu" else "ingraph"
    common = dict(
        num_warm_up_iter=args.num_warm_up_iter,
        num_main_iter=args.num_main_iter,
        max_tree_depth=args.max_tree_depth,
        adapt_stat_target=args.step_size_adaptation_target,
        step_size_reg_coefficient=args.step_size_reg_coefficient,
        metric_type=args.metric_type,
        dim_param=getattr(args, "dim_param", None),
        trace_func=trace_func,
    )
    start = time.time()
    if driver == "host":
        chunk = getattr(args, "max_steps_per_dispatch", None)
        if chunk is None and jax.default_backend() != "cpu":
            # At deep tree caps a single NUTS iteration can run 2**depth
            # leapfrog steps in one dispatch -- far past tunnelled-worker
            # execution watchdogs (~20-40 s).  Chunk the tree so every
            # dispatch stays bounded; RNG stream and results are unchanged.
            chunk = 256 if args.max_tree_depth > 10 else 0
        result = sample_hmc_chains_host_loop(
            system,
            q_init,
            jax.random.PRNGKey(args.seed),
            progress_every=max(1, min(50, args.num_warm_up_iter // 5 or 1)),
            checkpoint_path=os.path.join(output_dir, "checkpoint.npz"),
            # One checkpoint per iteration: at canonical noisy-obs shapes a
            # single deep-tree iteration costs minutes through the tunnel,
            # and a time-bounded attempt must never lose a completed one.
            # The save itself (a few MB of .npz) is negligible next to that.
            checkpoint_every=1,
            max_steps_per_dispatch=chunk or None,
            # Tunnelled workers have bounded program memory: evict each
            # stage's executables once it completes (numerics unchanged).
            clear_caches_between_stages=jax.default_backend() != "cpu",
            **common,
        )
    else:
        result = sample_hmc_chains(
            system,
            q_init,
            jax.random.PRNGKey(args.seed),
            **common,
        )
    jax.block_until_ready(result["final_pos"])
    sampling_time = time.time() - start
    traces = {k: np.asarray(v) for k, v in result["traces"].items()}
    stats = {k: np.asarray(v) for k, v in result["stats"].items()}
    write_traces(output_dir, traces)
    write_stats(output_dir, stats)
    summary = diag.summary(traces, summary_vars)
    return save_summary(
        output_dir,
        summary,
        sampling_time,
        float(result["final_step_size"]),
        traces,
    )
