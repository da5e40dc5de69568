"""Headline benchmark: FHN noiseless-obs CHMC effective samples per second.

Runs the reference's canonical configuration (T=100 observations at interval
0.2, S=25 steps/obs, R=5 obs/subsequence, quasi-Newton projection solver,
dynamic multinomial HMC -- reference
``scripts/fhn_model_noiseless_obs_chmc_experiment.py:31-66``) with up to 1024
vmapped chains in float32 on one TPU chip, and reports pooled bulk-ESS per
wall-clock second over the parameters (sigma, eps, gamma, beta).

The sampler operates at the step its own in-run warm-up machinery adapts
to: 0.205, found by pooled-accept dual averaging on the chip
(``benchmarks/results/warmup_rehab_completed_250w32m_2026-08-21.json``)
and amortised here exactly like the compile cache (the bench budget is
spent measuring, not re-adapting).  Round 5 replaced the old grid-tuned
0.23: long stationary windows show that at 0.23 trajectories U-turn after
~9.5 steps and the global parameters mix diffusively (per-chain tau ~
O(10^3) draws; the earlier short-window ess/s figures were truncation
artifacts), while at 0.205 trajectories U-turn at ~38 steps and tau drops
to ~13-15 draws -- see
``benchmarks/results/mixing_study_step023_longwindow_2026-08-21.json``.

Baseline: the reference publishes no absolute ESS/sec (BASELINE.md), so the
denominator is *measured*: ``scripts/measure_cpu_baseline.py`` times the
f64-CPU golden path (the same algorithm/tolerances as the reference's pinned
single-core CPU setup) at the canonical config and writes
``BASELINE_MEASURED.json``.  Because TPU and CPU run the identical sampler,
ESS per integrator step is comparable on both (measured on the completed
canonical arms -- see docs/evidence.md); the headline ratio is the pooled
per-step latency ratio:

    vs_baseline = tau_step_cpu / tau_step_tpu

and the implied CPU ESS/sec is ``ess_per_step_tpu / tau_step_cpu``.

Robustness contract (round-3 hardening; the round-1/2 failures were a child
that burned its whole budget and reported nothing):

1. the FIRST successful measurement is printed immediately and the process
   exits -- no refinement afterwards;
2. each child receives an absolute wall-clock deadline
   (``MMT_BENCH_DEADLINE_TS``) threaded into the host-loop driver, which
   stops dispatching sweeps in time to report a result computed on the
   completed prefix (>= MIN_MAIN_SWEEPS main sweeps);
3. progress is checkpointed every few sweeps under a config-keyed path
   (now including per-sweep wall times), so retries -- and entirely
   separate invocations -- resume completed sweeps instead of restarting;
4. a LAST-RESORT daemon watchdog inside the child fires shortly after the
   deadline no matter where the main thread is stuck (init dispatch, cold
   compile, hung ``block_until_ready``, retry backoff), salvages a result
   from the on-disk checkpoint when >= MIN_MAIN_SWEEPS sweeps exist, and
   otherwise dumps the phase + a full Python traceback and exits rc=5;
5. ``retry_transient`` backoff sleeps are capped by the same deadline
   (``MMT_RETRY_DEADLINE_TS``), so a transient-fault loop cannot sleep
   through the budget;
6. on child timeout the parent prints the child's captured stdout/stderr
   tails (round 2 destroyed them -- the failure was undiagnosable) and
   scans the captured stdout for a result line the watchdog may have
   printed just before the kill.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras},
including the convergence gate (r_hat_max over the four parameters),
BOTH baseline anchorings (vs_baseline against the reconciled sandbox CPU
tau_step -- see docs/baseline_reconciliation.md -- and
vs_paper_annotation_tau_step / vs_paper_tau_eff_band against the
reference's own published 1.2e-5*R^2 annotation and tau_eff axis band),
and FLOP/roofline accounting (est_flops_per_step from the committed
XLA cost-analysis table ``benchmarks/results/flops_canonical.json``,
achieved_flops_per_sec, mfu_vs_v5e_bf16_peak, binding regime checked
against both the MXU and HBM rooflines).  When the first rung lands with
enough budget left, the measurement is replicated at a second seed into
``benchmarks/results/bench_second_seed_s*.json`` (stdout stays one line).

Round-5 convergence gate: rung 0 starts from the committed STATIONARY
fixture ``benchmarks/fixtures/fhn_canonical_stationary_v2.npz`` -- 1024
chains seeded from the CONVERGED CPU f64 golden canonical arm (4 chains,
R-hat <= 1.003, reference config) and decohered on-chip to the posterior's
own between-chain dispersion -- so every main draw is a stationary draw
and the reported bulk-ESS / r_hat_max measure typical-set mixing.  The
v1 fixture (final state of a 250-iteration depth-6 in-run warm-up) was
NOT stationary: the fleet carried near-initialisation dispersion in the
global parameters and every ESS window measured the inward crawl
(r_hat plateau ~1.2 at any window; root cause in ``benchmarks/results/
fleet_init_dispersion_study_2026-08-21.json``).  BENCH_r04 carried
r_hat_max ~2.2 from a cold start; the reference flags R-hat > 1.01,
``scripts/fhn_model_noisy_obs_generate_plots.py:69-76``; the converged
round-5 capture is ``benchmarks/results/bench_r5_rung0_converged.json``
(15.8 ess/s, r_hat_max 1.0147 over 512 stationary draws).

Env overrides: MMT_BENCH_CHAINS/WARM/MAIN/T/S/R, MMT_BENCH_X64,
MMT_BENCH_DRIVER (host|ingraph), MMT_BENCH_DEADLINE, MMT_BENCH_RUNG,
MMT_BENCH_CHILD_TIMEOUT, MMT_BENCH_SPLITTING (standard|gaussian),
MMT_BENCH_SECOND_SEED=0 (disable the replicate), MMT_BENCH_FIXTURE
(path override, or 0 to force a fresh cold start), MMT_BENCH_KEEP_CKPT=1
(keep the checkpoint of a completed run).
"""

import faulthandler
import json
import os
import subprocess
import sys
import threading
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")
_repo = os.path.dirname(os.path.abspath(__file__))
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
if os.environ.get("MMT_BENCH_X64") == "1":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# Degradation ladder.  Measured constraints (see verify skill): the
# tunnelled TPU worker kills device executions beyond ~20-40 s, and with the
# SoA rollout/transfer-matrix constraint path the batched constrained step
# at the canonical (T=100, S=25, R=5) costs ~15 ms at 1024 chains (true
# device time; each dispatch additionally pays a ~25 ms tunnel round trip).
# The host-loop driver dispatches one sub-iteration (<= 2**depth steps) at a
# time, so a depth-6 sub-iteration at 1024 chains is ~1-2 s -- comfortably
# under the watchdog.  Each entry: (chains, T, S, R, max_tree_depth, warm,
# main); later rungs are the degradation path proven in earlier rounds.
# Rung 0 is sized so that a COLD, 6x-contended child still lands inside one
# ~600 s child budget: 32 main sweeps ~= 80-500 s of measurement; the
# tau_step ratio is length-insensitive and MIN_MAIN_SWEEPS provides the
# deadline-partial floor.
RUNGS = [
    # Rung 0 samples 512 main iterations from the v2 stationary fixture at
    # step 0.18 (the stationary-fleet optimum; see the init_step comment
    # below -- the 0.205 converged capture bench_r5_rung0_converged.json
    # predates the re-point).  Sizing (round-5 measurements):
    #   * split-R-hat over half-chains of n draws reads ~sqrt(1 + 2*tau/n)
    #     even at perfect stationarity, so the gate needs n >> tau;
    #   * from a TRULY stationary start (v2 fixture, seeded from the
    #     converged golden arm) per-parameter tau is 2.7-8.2 draws and
    #     STABLE across window doublings, so 512 draws put R-hat_max at
    #     ~1.015 (measured: bench_r5_rung0_converged.json);
    #   * the earlier diffusive readings (tau ~ O(10^2-10^3), R-hat
    #     plateau ~1.2 at both 0.23 and 0.205, the "19/28 ess/s" truncated
    #     windows) were all the same artifact -- a fleet still carrying
    #     initialisation dispersion crawling toward the typical set; see
    #     fleet_init_dispersion_study_2026-08-21.json.
    # 256 sweeps at the measured ~12.7 s each is ~54 min -- more than one
    # child budget -- so the rung leans on the checkpoint-resume contract:
    # every invocation accumulates completed sweeps under the config-keyed
    # checkpoint, deadline-partials report the window completed so far, and
    # a resumed invocation that finds the target complete reports the full
    # window from the persisted per-sweep times without re-dispatching.
    (1024, 100, 25, 5, 6, 0, 512),
    (512, 100, 25, 5, 6, 0, 32),
    (256, 100, 25, 5, 6, 0, 32),
    (64, 100, 25, 5, 6, 0, 32),
    (64, 25, 10, 5, 5, 16, 32),
    (32, 25, 10, 5, 4, 16, 32),
]
if os.environ.get("MMT_BENCH_RUNGS"):
    # Test/emergency override: a JSON list of [chains, T, S, R, depth,
    # warm, main] rows replacing the built-in ladder.
    RUNGS = [tuple(r) for r in json.loads(os.environ["MMT_BENCH_RUNGS"])]

# A result computed on at least this many completed main sweeps (2 CHMC
# iterations each) is considered reportable; the ESS estimate is rough on
# such a short prefix but honest, and the headline tau_step ratio is not
# length-sensitive.
MIN_MAIN_SWEEPS = 8

# TPU v5e (v5 lite) single-chip peaks for the roofline fields: 197 TFLOP/s
# bf16 on the MXU (the achievable ceiling; f32 at "highest" matmul precision
# runs multi-pass bf16 and peaks lower) and 819 GB/s HBM bandwidth.
V5E_BF16_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_PER_SEC = 819e9

_TRACE_NAMES = ("sigma", "eps", "gamma", "beta")

# --------------------------------------------------------------------- #
# single-result gate: exactly one outcome (result line or error exit) is
# ever produced, whether by the main thread or the watchdog
# --------------------------------------------------------------------- #
_FINISH_LOCK = threading.Lock()
_FINISHED = False


def _claim_finish():
    """True exactly once across all threads; the claimant prints/exits."""
    global _FINISHED
    with _FINISH_LOCK:
        if _FINISHED:
            return False
        _FINISHED = True
        return True


def _load_measured_baseline():
    path = os.path.join(_repo, "BASELINE_MEASURED.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _baseline_tau_step(measured, T, S, R):
    """Pooled CPU seconds per constrained leapfrog step at (T, S, R).

    Uses the measured config if present; otherwise scales the canonical
    measurement by the leading-order cost model (forward scan + blocked Gram
    are both linear in the number of time steps T*S; block cost is cubic in
    R but R is fixed across the ladder).
    """
    if measured is None:
        return None
    for cfg in measured.get("configs", []):
        if (cfg["T"], cfg["S"], cfg["R"]) == (T, S, R):
            return cfg["tau_step_pooled_s"]
    canon = next(
        (
            c
            for c in measured.get("configs", [])
            if (c["T"], c["S"], c["R"]) == (100, 25, 5)
        ),
        None,
    )
    if canon is None:
        return None
    return canon["tau_step_pooled_s"] * (T * S) / (100 * 25)


def _load_flops_table(T, S, R, dtype_name):
    """Committed XLA cost-analysis table for the canonical config, or None.

    ``benchmarks/flops_accounting.py`` lowers the actual constrained-step
    and projection-iteration programs and records their FLOP/byte counts
    (while-loop bodies counted once, so the composition formula below adds
    the measured extra solver iterations).
    """
    path = os.path.join(_repo, "benchmarks", "results", "flops_canonical.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            tab = json.load(f)
    except (OSError, ValueError):
        return None
    cfg = tab.get("config", {})
    if (cfg.get("T"), cfg.get("S"), cfg.get("R")) != (T, S, R):
        return None
    if cfg.get("dtype") != dtype_name:
        return None
    return tab


def _mfu_fields(flops_tab, n_bar, n_steps_total, total_time):
    """FLOP / roofline accounting fields for the result JSON.

    ``est_flops_per_step`` composes the cost-analysis counts: the step
    program (its two projection while-loops counted at one iteration each)
    plus the measured extra solver iterations -- ``n_bar`` is solver iters
    per *solve* and each step runs two solves (forward + reversibility
    check), so the extra iteration count is ``2*n_bar - 2``.
    """
    if flops_tab is None or total_time <= 0:
        return {"est_flops_per_step": None}
    extra_iters = max(2.0 * n_bar - 2.0, 0.0)
    est_step = flops_tab["step_flops"] + extra_iters * flops_tab["solver_iter_flops"]
    est_bytes = flops_tab.get("step_bytes")
    if est_bytes is not None:
        est_bytes = est_bytes + extra_iters * flops_tab.get("solver_iter_bytes", 0.0)
    achieved = est_step * n_steps_total / total_time
    mfu = achieved / V5E_BF16_PEAK_FLOPS
    out = {
        "est_flops_per_step": float(f"{est_step:.4g}"),
        "achieved_flops_per_sec": float(f"{achieved:.4g}"),
        "mfu_vs_v5e_bf16_peak": float(f"{mfu:.3e}"),
    }
    bw_frac = None
    if est_bytes is not None:
        # Bytes-accessed from the CPU cost analysis counts every HLO op's
        # operand traffic WITHOUT fusion -- an upper bound on true HBM
        # traffic (XLA:TPU fuses most elementwise chains into their
        # producers), labelled accordingly.
        bw = est_bytes * n_steps_total / total_time
        bw_frac = bw / V5E_HBM_BYTES_PER_SEC
        out["est_bytes_per_step_unfused_upper"] = float(f"{est_bytes:.4g}")
        out["achieved_bytes_per_sec_unfused_upper"] = float(f"{bw:.4g}")
    # Which resource binds?  Check BOTH rooflines before blaming dispatch
    # latency: a run can sit far below MXU peak yet be genuinely
    # HBM-bandwidth-bound.  Only when the unfused-upper-bound bandwidth is
    # also well below the HBM peak is "dispatch latency" the right label
    # (tunnel round trips + kernel-launch overheads on small batched linear
    # algebra); with no bytes estimate the label is an explicit heuristic.
    if mfu > 0.3:
        out["binding_regime"] = "compute-bound (MXU)"
    elif bw_frac is not None and bw_frac > 0.5:
        out["binding_regime"] = (
            f"HBM-bandwidth-bound: unfused-upper byte traffic at "
            f"{bw_frac:.0%} of v5e HBM peak while MXU sits far below peak"
        )
    elif bw_frac is not None:
        out["binding_regime"] = (
            "dispatch-latency-bound: both rooflines idle (MXU "
            f"{mfu:.1e} of peak, HBM <= {bw_frac:.0%} of peak even unfused)"
        )
    else:
        out["binding_regime"] = (
            "likely dispatch-latency-bound (heuristic: MFU far below peak; "
            "no byte-traffic estimate available to rule out HBM)"
        )
    return out


def _compute_output(
    traces,
    stats,
    total_time,
    n_main_sweeps_done,
    n_main_sweeps_target,
    ctx,
    extras,
):
    """Assemble the single-line result JSON from host numpy arrays.

    ``traces``: {name: (chains, iters)}; ``stats``: {name: (chains, iters)};
    ``total_time``: measurement seconds attributed to the completed sweeps.
    Shared by the normal path and the watchdog salvage so the two cannot
    drift in their metric definitions.
    """
    from manifold_mcmc_tpu.utils import stats as diag

    n_steps_total = int(np.asarray(stats["n_step"]).sum())
    solver_iters_total = int(np.asarray(stats["n_solver_iters"]).sum())
    accept = float(np.asarray(stats["accept_stat"]).mean())
    ess = {name: diag.ess_bulk(traces[name]) for name in _TRACE_NAMES}
    # Convergence gate for the ESS estimate: rank-normalised split-R-hat,
    # max over the four parameters (reference gate: arviz summary r_hat,
    # ``scripts/utils.py:368-381``; plots flag R-hat > 1.01).  A large value
    # here means the pooled bulk-ESS is contaminated by the initialisation
    # transient and the ess/s figure should be read with that caveat.
    r_hat = {name: diag.split_rhat(traces[name]) for name in _TRACE_NAMES}
    # nanmax, not Python max: max() silently skips NaN depending on argument
    # order (constant trace / too-few draws), which would defeat the gate.
    r_hat_vals = np.asarray(list(r_hat.values()), np.float64)
    r_hat_has_nan = bool(np.isnan(r_hat_vals).any())
    r_hat_max = float(np.nanmax(r_hat_vals)) if not np.isnan(r_hat_vals).all() else float("nan")
    min_ess = float(min(ess.values()))
    ess_per_sec = min_ess / total_time
    # Pooled per-constrained-leapfrog-step latency (reference tau_step,
    # ``fhn_model_noiseless_obs_generate_plots.py:99-109``: total MAIN-phase
    # call time / total integrator steps).  ``total_time`` here is the
    # main-phase time only -- median compile-free per-sweep wall times the
    # number of main sweeps -- NOT the process wall clock; chain init and
    # compile are reported separately (init_time_s, compile_and_warmup_time_s).
    step_latency = total_time / max(n_steps_total, 1)
    # Average Newton/quasi-Newton iterations per step (reference n-bar,
    # constr_calls / (2 * steps) analog).
    n_bar = solver_iters_total / max(2 * n_steps_total, 1)

    tau_cpu = ctx["tau_cpu"]
    if tau_cpu is not None:
        vs_baseline = tau_cpu / step_latency
        cpu_ess_per_sec = (min_ess / max(n_steps_total, 1)) / tau_cpu
        baseline_desc = ctx["baseline_desc"]
    else:
        vs_baseline = ess_per_sec  # vs. the documented 1.0 ess/s estimate
        cpu_ess_per_sec = 1.0
        baseline_desc = "unmeasured estimate (BASELINE.md axis midrange)"
    out = {
        "metric": "fhn_noiseless_chmc_ess_per_sec",
        "value": round(ess_per_sec, 3),
        "unit": "ess/s",
        "vs_baseline": round(vs_baseline, 2),
        "baseline_cpu_ess_per_sec": float(f"{cpu_ess_per_sec:.4g}"),
        "baseline_cpu_tau_step_s": None if tau_cpu is None else float(f"{tau_cpu:.4g}"),
        "baseline_kind": baseline_desc,
        "min_param_ess_bulk": round(min_ess, 1),
        "ess_bulk": {k: round(v, 1) for k, v in ess.items()},
        "r_hat_max": round(r_hat_max, 4),
        "r_hat": {k: round(v, 4) for k, v in r_hat.items()},
        "r_hat_has_nan": r_hat_has_nan,
        # main_phase_time_s: measurement window the ess/s divides by (median
        # compile-free sweep wall x completed main sweeps).  wall_time_s:
        # REAL wall clock of this child process so far -- init + compile +
        # warm-up + measurement (round-4 review: the two were aliased, which
        # invited undercounting real wall by the large, variable init time).
        "main_phase_time_s": round(total_time, 2),
        "wall_time_s": round(time.time() - ctx["t_start"], 2),
        "pooled_step_latency_s": float(f"{step_latency:.3e}"),
        "avg_solver_iters_per_step": round(n_bar, 2),
        "mean_accept_stat": round(accept, 3),
        "num_chains": ctx["num_chains"],
        "num_warm_up_iter": ctx["num_warm"],
        "num_main_iter": ctx["num_main"],
        "num_main_iter_completed": int(traces[_TRACE_NAMES[0]].shape[1]),
        "partial": n_main_sweeps_done < n_main_sweeps_target,
        "driver": ctx["driver"],
        "config": {
            "T": ctx["T"],
            "S": ctx["S"],
            "R": ctx["R"],
            "max_tree_depth": ctx["depth"],
            "dtype": ctx["dtype_name"],
            "splitting": ctx["splitting"],
        },
        "seed": ctx["seed"],
        # The tunnelled chip's throughput swings up to ~6x run-to-run at
        # identical configs (measured; see benchmarks/results/ for the
        # band); a single bench invocation samples that distribution.
        "single_run_of_variance_band": True,
    }
    # ----- anchoring to the reference's OWN published numbers ----------- #
    # The reference hard-codes its observed CPU cost model in a figure
    # annotation: tau_step = 1.2e-5 * R^2 s on the authors' single core
    # (``fhn_model_noiseless_obs_generate_plots.py:147-148``), and its
    # tau_eff (seconds per effective sample) axes span 0.1-10 s at the
    # canonical config (``:216-217``), implying the authors' CPU achieved
    # ~0.1-10 ESS/s.  These are this benchmark's paper-anchored
    # denominators, reported alongside the sandbox-measured baseline (which
    # is ~100x slower than the authors' machine; reconciliation in
    # ``docs/baseline_reconciliation.md``).
    paper_tau_step = 1.2e-5 * ctx["R"] * ctx["R"]
    out["paper_tau_step_s"] = paper_tau_step
    out["vs_paper_annotation_tau_step"] = round(paper_tau_step / step_latency, 2)
    out["paper_ess_per_sec_band"] = [0.1, 10.0]
    out["vs_paper_tau_eff_band"] = [
        round(ess_per_sec / 10.0, 1),
        round(ess_per_sec / 0.1, 1),
    ]
    out.update(_mfu_fields(ctx["flops_tab"], n_bar, n_steps_total, total_time))
    out.update(extras)
    return out


def _salvage_from_checkpoint(ctx):
    """Build a result dict from the rung checkpoint alone, or None.

    Runs on the watchdog thread while the main thread may be wedged
    anywhere; uses only host-side numpy (checkpoint file + pure-numpy ESS).
    """
    path = ctx["ckpt"]
    try:
        if not os.path.exists(path):
            return None
        with np.load(path, allow_pickle=True) as ck:
            files = set(ck.files)
            need = {f"trc__{n}" for n in _TRACE_NAMES} | {
                "stc__n_step",
                "stc__n_solver_iters",
                "stc__accept_stat",
                "clean_main_times",
            }
            if not need <= files:
                sys.stderr.write(
                    f"[bench-child] salvage: checkpoint missing {need - files}\n"
                )
                return None
            traces = {}
            for n in _TRACE_NAMES:
                v = ck[f"trc__{n}"]  # (chains, sweeps, partitions)
                traces[n] = v.reshape(v.shape[0], -1)
            stats = {
                k[len("stc__"):]: ck[k].reshape(ck[k].shape[0], -1)
                for k in files
                if k.startswith("stc__")
            }
            clean_times = np.asarray(ck["clean_main_times"], np.float64)
        n_sweeps = traces[_TRACE_NAMES[0]].shape[1] // max(ctx["num_partition"], 1)
        if n_sweeps < MIN_MAIN_SWEEPS or clean_times.size == 0:
            sys.stderr.write(
                f"[bench-child] salvage: only {n_sweeps} sweeps / "
                f"{clean_times.size} timed -- below the reportable floor\n"
            )
            return None
        per_sweep = float(np.median(clean_times))
        total_time = per_sweep * n_sweeps
        return _compute_output(
            traces,
            stats,
            total_time,
            n_sweeps,
            ctx["n_main_sweeps_target"],
            ctx,
            extras={
                "salvaged_by_watchdog": True,
                "init_source": ctx.get("init_source", "unknown"),
            },
        )
    except Exception as err:  # noqa: BLE001 - last-resort path must not raise
        sys.stderr.write(f"[bench-child] salvage failed: {err!r}\n")
        return None


def _watchdog(ctx):
    """Last-resort in-child deadline enforcement (daemon thread).

    Fires shortly after the host-loop deadline if the main thread has not
    finished: dumps where every thread is stuck, then either prints a
    checkpoint-derived result (exit 0) or exits rc=5 so the parent degrades
    immediately instead of burning the rest of its budget.
    """
    fire_ts = ctx["deadline_ts"] + 8.0
    while True:
        now = time.time()
        if _FINISHED or now >= fire_ts:
            break
        time.sleep(min(5.0, fire_ts - now))
    if not _claim_finish():
        return
    sys.stderr.write(
        f"[bench-child] WATCHDOG fired at phase '{ctx['phase'][0]}' "
        f"({time.time() - ctx['t_start']:.0f}s into the child); "
        "thread tracebacks:\n"
    )
    try:
        faulthandler.dump_traceback(file=sys.stderr)
    except Exception:  # noqa: BLE001
        pass
    sys.stderr.flush()
    out = _salvage_from_checkpoint(ctx)
    if out is not None:
        print(json.dumps(out), flush=True)
        sys.stderr.write("[bench-child] watchdog salvaged a checkpoint result\n")
        sys.stderr.flush()
        os._exit(0)
    sys.stderr.write("[bench-child] watchdog: nothing salvageable; rc=5\n")
    sys.stderr.flush()
    os._exit(5)


def main():
    from manifold_mcmc_tpu.init.interpolation import (
        find_initial_state_by_linear_interpolation,
    )
    from manifold_mcmc_tpu.models import fhn
    from manifold_mcmc_tpu.samplers.chains import (
        retry_transient,
        sample_chmc_chains,
        sample_chmc_chains_host_loop,
    )
    from manifold_mcmc_tpu.systems.constrained import (
        ConditionedDiffusionConstrainedSystem,
    )
    from manifold_mcmc_tpu.utils.config import default_tolerances

    num_chains = int(os.environ.get("MMT_BENCH_CHAINS", 1024))
    num_warm = int(os.environ.get("MMT_BENCH_WARM", 64))
    num_main = int(os.environ.get("MMT_BENCH_MAIN", 128))
    T = int(os.environ.get("MMT_BENCH_T", 100))
    S = int(os.environ.get("MMT_BENCH_S", 25))
    R = int(os.environ.get("MMT_BENCH_R", 5))
    driver = os.environ.get("MMT_BENCH_DRIVER", "host")
    seed = int(os.environ.get("MMT_BENCH_SEED", 1))
    splitting = os.environ.get("MMT_BENCH_SPLITTING", "standard")
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    tols = default_tolerances()

    solver = os.environ.get("MMT_BENCH_SOLVER", "quasi-newton")
    max_tree_depth = int(os.environ.get("MMT_BENCH_MAX_TREE_DEPTH", 8))
    # Solver-iteration cap 24 is the measured optimum at the tuned config
    # (round-4 A/B, benchmarks/results/ab_depth_cap.json): the per-solve
    # iteration distribution is bimodal (p90 <= 13 plus a ~3-5% never-
    # converging tail that pegs at ANY cap -- solver_tail_probe JSON), so
    # cap 24 cuts the vmapped while_loop's fleet-max cost 1.41x while
    # keeping accept (0.839 vs 0.832) and bulk-ESS (within 3%): 28.1 vs
    # 19.4 ess/s.  Cap 16 truncates the p90..16 bulk and loses (round-2
    # measurement: 7 ess/s).
    solver_iters_cap = int(os.environ.get("MMT_BENCH_SOLVER_ITERS", 24))
    pooled_da = os.environ.get("MMT_BENCH_POOLED_DA") == "1"
    # 0.18 is the stationary-fleet optimum of the round-5 solver-tolerance
    # A/B (benchmarks/results/ab_solver_tolerance.json): vs the DA-adapted
    # 0.205 it halves the sweep cost (trees U-turn naturally instead of
    # padding to the 63-step cap), cuts masked projection failures 0.54 ->
    # 0.38/draw, and nearly doubles ESS/draw -- ~3.5x the ESS/s -- with
    # posterior moments within 0.04 golden-arm sd on every parameter.  The
    # earlier step-size landscape (grid 0.23, DA 0.205) was measured on the
    # pre-v2 crawling fleet and did not transfer to stationarity.
    init_step = float(os.environ.get("MMT_BENCH_INIT_STEP", 0.18))
    cliff_safety = float(os.environ.get("MMT_BENCH_CLIFF_SAFETY", 0.5))
    # The checkpoint key must pin the FULL run configuration: resuming a
    # checkpoint from a different rung (or an older code version) would
    # silently skip sweeps or load an incompatible trace layout.  That
    # includes the adaptation mode: a per-chain-DA checkpoint has diverged
    # DualAveragingState rows, and resuming it in pooled mode would silently
    # adopt chain 0's log_step as the fleet step (round-4 advisor finding),
    # so pooled-DA / init-step / cliff-safety are part of the key.
    ckpt = os.environ.get(
        "MMT_BENCH_CKPT",
        f"/tmp/mmt_bench_v5_{driver}_{num_chains}c_T{T}_S{S}_R{R}"
        f"_d{max_tree_depth}_w{num_warm}_m{num_main}_si{solver_iters_cap}"
        f"_seed{seed}_{solver}_{splitting}"
        f"_pda{int(pooled_da)}_is{init_step:g}_cs{cliff_safety:g}.npz",
    )
    deadline_ts = float(os.environ.get("MMT_BENCH_DEADLINE_TS", "inf"))

    measured = _load_measured_baseline()
    ctx = {
        "phase": ["imports-done"],
        "t_start": time.time(),
        "ckpt": ckpt,
        "deadline_ts": deadline_ts,
        "num_chains": num_chains,
        "num_warm": num_warm,
        "num_main": num_main,
        "T": T,
        "S": S,
        "R": R,
        "depth": max_tree_depth,
        "driver": driver,
        "seed": seed,
        "splitting": splitting,
        "dtype_name": str(dtype.__name__),
        "tau_cpu": _baseline_tau_step(measured, T, S, R),
        "baseline_desc": (measured or {}).get("description", "measured"),
        "flops_tab": _load_flops_table(T, S, R, str(dtype.__name__)),
        "num_partition": 2,  # refined after the system is built
        "n_main_sweeps_target": max((num_main + 1) // 2, 1),
    }

    def phase(p):
        ctx["phase"][0] = p
        sys.stderr.write(
            f"[bench-child] phase: {p} ({time.time() - ctx['t_start']:.0f}s)\n"
        )
        sys.stderr.flush()

    if np.isfinite(deadline_ts):
        # Cap retry_transient's backoff by the same deadline so a transient-
        # fault loop cannot sleep through the budget (samplers honour the
        # env; see retry_transient).
        os.environ["MMT_RETRY_DEADLINE_TS"] = str(deadline_ts)
        threading.Thread(target=_watchdog, args=(ctx,), daemon=True).start()

    # --- data generation (reference seed + true parameters) -------------- #
    phase("data-gen")
    # Stationary-fixture data override (round-5): the v2 fixture is seeded
    # from the CONVERGED CPU f64 golden canonical arm, whose observation
    # sequence was generated on the reference's 10000-steps-per-obs grid in
    # f64 (args.json of that run).  The fixture therefore carries its own
    # y_seq, and whenever the fixture matches this run's config the system
    # is built on THAT data so the fixture states lie on this manifold.
    # Provenance + the exactness check (f64 residuals ~1e-14) live in
    # scripts/make_stationary_fixture.py and the fixture's own field.
    fixture_arrays = None
    fix_path = os.environ.get(
        "MMT_BENCH_FIXTURE",
        os.path.join(
            _repo, "benchmarks", "fixtures", "fhn_canonical_stationary_v2.npz"
        ),
    )
    if (
        driver == "host"
        and fix_path != "0"
        and os.path.exists(fix_path)
        and splitting == "standard"
    ):
        try:
            with np.load(fix_path, allow_pickle=True) as fx:
                cfg_ok = (
                    int(fx["num_chains"]) >= num_chains
                    and tuple(int(x) for x in fx["config_TSR"]) == (T, S, R)
                    and str(fx["dtype"]) == str(dtype.__name__)
                    and str(fx["splitting"]) == splitting
                )
                if cfg_ok:
                    fixture_arrays = {
                        "q": np.asarray(fx["q"])[:num_chains],
                        "x_obs": np.asarray(fx["x_obs"])[:num_chains],
                        "y_seq": (
                            np.asarray(fx["y_seq"]) if "y_seq" in fx.files else None
                        ),
                    }
        except Exception as err:  # noqa: BLE001 - fall back to fresh data
            sys.stderr.write(f"[bench-child] fixture preload failed: {err!r}\n")
    if fixture_arrays is not None and fixture_arrays["y_seq"] is not None:
        y_seq = jnp.asarray(fixture_arrays["y_seq"], dtype)
    else:
        rng = np.random.default_rng(20200710)
        z_true = jnp.array([0.3, 0.1, 1.5, 0.8], dtype)
        x0_true = jnp.array([-0.5, 0.2], dtype)
        steps_data = 1000  # fine grid (reference uses 10000; 1000 suffices)
        v_data = jnp.asarray(rng.standard_normal((T * steps_data, fhn.dim_v)), dtype)
        y_seq = fhn.generate_y_seq(
            z_true, x0_true, v_data, 0.2 / steps_data, steps_data
        )

    phase("system-build")
    system = ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=R,
        y_seq=y_seq,
        dim_u=fhn.dim_z,
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        use_gaussian_splitting=splitting == "gaussian",
        dim_v_0=fhn.dim_v_0,
    )
    num_partition = system.num_partition
    ctx["num_partition"] = num_partition
    ctx["n_main_sweeps_target"] = -(-num_main // num_partition)

    # --- chain initialisation (observation-consistent targets) ----------- #
    def x_obs_target(key):
        noise = jax.random.normal(key, y_seq.shape, dtype) * 0.5
        return jnp.concatenate([y_seq, noise], axis=-1)

    @jax.jit
    def init_chains(key):
        keys = jax.random.split(key, num_chains)

        def one(k):
            k_t, k_q = jax.random.split(k)
            return find_initial_state_by_linear_interpolation(
                system, k_q, x_obs_target(k_t)
            )

        return jax.vmap(one)(keys)

    phase("chain-init")
    t0 = time.time()
    ckpt_state = None
    init_source = "fresh"
    if driver == "host" and os.path.exists(ckpt):
        # Resuming: the host loop replaces the initial state with the
        # checkpoint's, so running the (expensive, wedge-prone) fleet
        # initialisation would be pure waste -- feed the checkpointed state
        # directly.  (Three consecutive tunnel wedges at this exact phase
        # on resume attempts, 2026-08-21.)
        try:
            with np.load(ckpt, allow_pickle=True) as ck:
                if "q" in ck.files and "x_obs" in ck.files:
                    ckpt_state = (np.asarray(ck["q"]), np.asarray(ck["x_obs"]))
                    init_source = "checkpoint_resume"
        except Exception as err:  # noqa: BLE001 - fall back to fresh init
            sys.stderr.write(f"[bench-child] ckpt preload failed: {err!r}\n")
    if ckpt_state is None and num_warm == 0 and fixture_arrays is not None:
        # Stationary-start fixture (round-5 v2): 1024 chains seeded from the
        # CONVERGED CPU f64 golden canonical arm (4 chains tiled x256, cast
        # f32) and decohered on-chip -- provenance in the fixture's own
        # `provenance` field, root-cause analysis in benchmarks/results/
        # fleet_init_dispersion_study_2026-08-21.json.  Starting rung 0 from
        # it makes every main draw a stationary draw, so the bulk-ESS window
        # measures typical-set mixing instead of the inward crawl that put
        # r_hat_max at ~2.2 (BENCH_r04) / ~1.2 (the superseded v1 fixture).
        # Disable with MMT_BENCH_FIXTURE=0; config must match exactly.
        ckpt_state = (fixture_arrays["q"], fixture_arrays["x_obs"])
        init_source = "stationary_fixture"
    if ckpt_state is not None and ckpt_state[0].shape[0] == num_chains:
        q_init = jnp.asarray(ckpt_state[0], dtype)
        x_obs_init = jnp.asarray(ckpt_state[1], dtype)
        sys.stderr.write(f"[bench-child] init skipped ({init_source})\n")
    else:
        init_source = "fresh"
        q_init, x_obs_init = retry_transient(
            lambda: init_chains(jax.random.PRNGKey(20200710)), what="chain init"
        )
    init_time = time.time() - t0
    ctx["init_source"] = init_source

    def trace_func(q):
        z = fhn.generate_z(q[: fhn.dim_z])
        return {"sigma": z[0], "eps": z[1], "gamma": z[2], "beta": z[3]}

    common = dict(
        projection_solver=solver,
        max_tree_depth=max_tree_depth,
        # Under vmap the projection while_loop runs to the MAX iteration
        # count across all chains, so the batched step's wall time follows
        # the cross-chain tail of solver iterations -- and a ~3-5% never-
        # converging tail pegs at ANY cap, so the fleet pays ~cap iterations
        # every solve.  Cap 24 (default above) sits in the measured sweet
        # spot: above the p90 (13) of converging solves, well below the
        # reference's 50; cap 16 truncates the bulk and loses ESS/sec.
        max_solver_iters=solver_iters_cap,
        constraint_tol=tols["constraint_tol"],
        position_tol=tols["position_tol"],
        reverse_check_tol=tols["reverse_check_tol"],
        divergence_tol=tols["divergence_tol"],
        trace_func=trace_func,
        # The in-run-adapted operating point (default 0.205; see module
        # docstring).  With warm=0 the host loop samples at exactly this
        # step; warm-up studies (MMT_BENCH_WARM > 0) adapt from it.
        init_step_size=init_step,
        # Warm-up studies only (MMT_BENCH_WARM > 0): fraction of the probed
        # per-chain failure-cliff step size that dual averaging may not
        # exceed (host-loop default 0.5; 0.25 keeps the mu-anchor excursion
        # clear of the cliff).
        step_size_cliff_safety=cliff_safety,
    )

    t_run = time.time()
    if driver == "ingraph":
        # Flagship fully-on-device driver: warm-up and main stages are
        # single jitted programs (lax.scan over sweeps); only two host
        # transfers in total.  ``return_timings`` AOT-compiles each stage so
        # the recorded execution time is pure device time.
        phase("ingraph-run")
        result = sample_chmc_chains(
            system,
            q_init,
            x_obs_init,
            jax.random.PRNGKey(seed),
            num_warm_up_iter=num_warm,
            num_main_iter=num_main,
            find_init_step_size=False,
            clear_caches_between_stages=True,
            return_timings=True,
            **common,
        )
        jax.block_until_ready(result["final_pos"])
        total_time = result["timings"]["main_exec_s"]
        n_main_done = ctx["n_main_sweeps_target"]
    else:
        # Host-loop driver: per-sweep dispatch, crash-durable checkpoints,
        # deadline-aware (returns the completed prefix instead of dying).
        phase("host-loop-sweeps")
        result = sample_chmc_chains_host_loop(
            system,
            q_init,
            x_obs_init,
            jax.random.PRNGKey(seed),
            num_warm_up_iter=num_warm,
            num_main_iter=num_main,
            checkpoint_path=ckpt,
            checkpoint_every=8,
            progress_every=8,
            deadline_ts=deadline_ts - 20.0 if np.isfinite(deadline_ts) else None,
            # Warm-up studies: dual-average on the fleet-pooled accept
            # statistic (near-noiseless at 1024 chains) instead of per-chain.
            pooled_step_adaptation=pooled_da,
            **common,
        )
        jax.block_until_ready(result["final_pos"])
        phase("result-computation")
        n_main_done = result["n_main_sweeps_done"]
        if n_main_done < MIN_MAIN_SWEEPS:
            # Not enough completed sweeps for an honest estimate; the
            # checkpoint holds the progress for the next attempt to resume.
            if _claim_finish():
                sys.stderr.write(
                    f"[bench] deadline with only {n_main_done} main sweeps; "
                    "progress checkpointed for resume\n"
                )
                return 3
            return 0  # watchdog already produced the outcome
        # Steady-state per-sweep cost: the accumulated compile-free sweep
        # times across every process that contributed to this run (the host
        # loop persists them in the checkpoint and returns the union), so a
        # resume that dispatched zero or one fresh sweep still times from
        # the earlier processes' measurements instead of dropping a complete
        # checkpoint or timing from a lone compile-laden first sweep.
        timed = list(result["timings"].get("clean_main_sweep_s", []))
        if not timed:
            main_times = result["timings"]["main_sweep_s"]
            timed = main_times[1:] if len(main_times) > 1 else main_times
        if not timed:
            # Same program shape; warm sweeps are an acceptable stand-in.
            timed = list(result["timings"].get("clean_warm_sweep_s", []))
        if not timed:
            if _claim_finish():
                if os.path.exists(ckpt):
                    os.remove(ckpt)
                sys.stderr.write("[bench] no timed sweeps; checkpoint dropped\n")
                return 4
            return 0
        per_sweep = float(np.median(timed))
        total_time = per_sweep * n_main_done

    wall_time_all = time.time() - t_run
    compile_time = wall_time_all - sum(
        result["timings"].get("main_sweep_s", [total_time])
    )  # compiles + warm-up sweeps

    traces = {k: np.asarray(result["traces"][k]) for k in _TRACE_NAMES}
    stats = {k: np.asarray(v) for k, v in result["stats"].items()}
    out = _compute_output(
        traces,
        stats,
        total_time,
        n_main_done,
        ctx["n_main_sweeps_target"],
        ctx,
        extras={
            "compile_and_warmup_time_s": round(compile_time, 1),
            "init_time_s": round(init_time, 1),
            # Full budget accounting (round-4 review: 505 s vs 39 s init
            # across captures was unexplained).  init_source says whether the
            # fleet init dispatch ran at all: "stationary_fixture" and
            # "checkpoint_resume" skip it entirely, so a large init_time_s
            # can only mean wedge retries on a "fresh" start.
            "init_source": init_source,
            "final_step_size": round(float(result["final_step_size"]), 5),
            "device": str(jax.devices()[0]),
        },
    )
    if not _claim_finish():
        return 0  # watchdog won the race; its outcome stands
    print(json.dumps(out), flush=True)
    # A COMPLETED measurement's checkpoint must not leak into future runs; a
    # partial one is kept so the next invocation resumes the remaining
    # sweeps.  MMT_BENCH_KEEP_CKPT=1 preserves it either way (warm-up-study
    # runs whose final state seeds the stationary fixture).
    keep = os.environ.get("MMT_BENCH_KEEP_CKPT") == "1"
    if not keep and not out["partial"] and ckpt and os.path.exists(ckpt):
        os.remove(ckpt)
    return 0


def _tail(text, n=30):
    if not text:
        return "<empty>"
    if isinstance(text, bytes):
        text = text.decode(errors="replace")
    lines = text.splitlines()
    return "\n".join(lines[-n:])


def _find_result_line(text):
    if not text:
        return None
    if isinstance(text, bytes):
        text = text.decode(errors="replace")
    return next(
        (
            ln
            for ln in text.splitlines()
            if ln.startswith("{") and '"metric"' in ln
        ),
        None,
    )


def _attempt(env, timeout_s):
    """Run one child measurement; return (result line or None, child rc)."""
    env = dict(env)
    # Absolute deadline for the child's host loop and watchdog: leave margin
    # under the subprocess kill so the child always gets to print what it
    # measured (graceful host-loop stop at deadline-20, watchdog salvage at
    # deadline+8, parent kill at deadline+30).
    env["MMT_BENCH_DEADLINE_TS"] = str(time.time() + timeout_s - 30.0)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired as exc:
        # Full forensics: round 2 dropped the captured output here, making
        # the failure undiagnosable.  The watchdog may also have printed a
        # result in the instant before the kill -- honour it.
        line = _find_result_line(exc.stdout)
        sys.stderr.write(
            f"[bench] child timed out after {timeout_s:.0f}s"
            f"{' but salvaged a result' if line else ''}\n"
            f"[bench] child stdout tail:\n{_tail(exc.stdout)}\n"
            f"[bench] child stderr tail:\n{_tail(exc.stderr)}\n"
        )
        return line, -9
    line = _find_result_line(proc.stdout)
    if line is None:
        sys.stderr.write(
            f"[bench] child finished without a result (rc={proc.returncode});"
            f" stderr tail:\n{_tail(proc.stderr)}\n"
        )
    return line, proc.returncode


def _maybe_second_seed(env, budget_left):
    """Replicate the landed measurement at a second RNG seed, side-channel.

    The driver contract is ONE stdout JSON line, already printed by the
    caller; this replicate -- run only when the remaining budget can
    plausibly fit a warm-cache rung (the compile cache is hot from the
    first child) -- lands in ``benchmarks/results/`` for the variance
    record instead of stdout.  Failures are logged and ignored: the
    headline result is already out.
    """
    if os.environ.get("MMT_BENCH_SECOND_SEED", "1") != "1" or budget_left < 700:
        return
    env = dict(env)
    env["MMT_BENCH_SEED"] = str(int(env.get("MMT_BENCH_SEED", "1")) + 1)
    sys.stderr.write(
        f"[bench] replicating at seed {env['MMT_BENCH_SEED']} "
        f"({budget_left:.0f}s left)\n"
    )
    line, rc = _attempt(env, budget_left - 30)
    if line is None:
        sys.stderr.write(f"[bench] second-seed replicate failed (rc={rc})\n")
        return
    path = os.path.join(
        _repo,
        "benchmarks",
        "results",
        f"bench_second_seed_s{env['MMT_BENCH_SEED']}.json",
    )
    try:
        with open(path, "w") as f:
            f.write(line + "\n")
        sys.stderr.write(f"[bench] second-seed replicate -> {path}\n")
    except OSError as err:
        sys.stderr.write(f"[bench] could not write replicate: {err!r}\n")


def _run_ladder():
    """Walk the degradation ladder until one measurement lands.

    The FIRST successful measurement is printed immediately and the process
    exits 0 -- an unknown external budget means a held-back result is a lost
    result (the round-1 failure).  Per-rung policy keyed on the child's
    exit: rc=5 (watchdog, zero salvageable progress) retries once -- the
    retry reuses the persistent compile cache, which is the dominant cold
    cost -- then degrades; rc=3 (graceful deadline, partial progress
    checkpointed) retries the same rung to resume its sweeps.
    """
    deadline = float(os.environ.get("MMT_BENCH_DEADLINE", 1500))
    t_start = time.time()
    env = dict(os.environ)
    env["MMT_BENCH_CHILD"] = "1"
    start_rung = int(os.environ.get("MMT_BENCH_RUNG", 0))

    def remaining():
        return deadline - (time.time() - t_start)

    for rung_idx in range(start_rung, len(RUNGS)):
        chains, T, S, R, depth, warm, main = RUNGS[rung_idx]
        env.update(
            MMT_BENCH_CHAINS=str(chains),
            MMT_BENCH_T=str(T),
            MMT_BENCH_S=str(S),
            MMT_BENCH_R=str(R),
            MMT_BENCH_MAX_TREE_DEPTH=str(depth),
            MMT_BENCH_WARM=str(warm),
            MMT_BENCH_MAIN=str(main),
        )
        for attempt in range(3):
            if remaining() < 120:
                sys.stderr.write("[bench] out of budget\n")
                return 1
            # One LONG attempt per rung is the optimal geometry: a child
            # pays its trace+compile once (hundreds of seconds cold), and
            # with the graceful host-loop deadline + the in-child watchdog
            # it always emits a (possibly partial/salvaged) result by its
            # deadline -- unlike short children, which can burn their whole
            # budget on tracing and report nothing (round-3 rehearsal
            # measurement).  Later attempts only run when the child died
            # early (crash) or checkpointed progress worth resuming.
            budget = min(
                remaining() - 20,
                float(os.environ.get("MMT_BENCH_CHILD_TIMEOUT", 1320)),
            )
            sys.stderr.write(
                f"[bench] rung {rung_idx} attempt {attempt + 1}: "
                f"{chains} chains T={T} S={S} depth={depth} "
                f"(budget {budget:.0f}s)\n"
            )
            line, rc = _attempt(env, budget)
            if line is not None:
                print(line, flush=True)
                _maybe_second_seed(env, remaining())
                return 0
            if rc == 5 and attempt >= 1:
                # Two watchdog fires with zero salvageable progress: this
                # rung cannot even complete 8 sweeps here -- degrade.
                sys.stderr.write(
                    f"[bench] rung {rung_idx}: no progress twice; degrading\n"
                )
                break
    sys.stderr.write("[bench] no rung succeeded within the deadline\n")
    return 1


if __name__ == "__main__":
    if os.environ.get("MMT_BENCH_CHILD") == "1":
        sys.exit(main())
    sys.exit(_run_ladder())
