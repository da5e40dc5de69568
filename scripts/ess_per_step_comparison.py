"""Measured ESS/sec and ESS/step on BOTH arms of the headline comparison.

The headline ``vs_baseline`` is a pooled per-step latency ratio justified by
"the same sampler has comparable ESS per integrator step on both arms".
This script replaces that inference with measurement (VERDICT round-2 item
2): it computes bulk-ESS, integrator steps, and wall time for

* the CPU arm: the f64 golden canonical run
  (``experiments/fhn_noiseless_chmc_canonical_cpu_f64`` -- reference
  config: 4 chains, Newton solver, dual averaging, 250+1000 iters,
  ``/root/reference/scripts/fhn_model_noiseless_obs_chmc_experiment.py:31-66``),
  from its checkpoint so an in-progress run contributes its completed
  prefix (per-sweep rate from the checkpoint's ``clean_main_times``, the
  same extrapolation convention bench.py uses -- reference tau_eff
  definition ``/root/reference/scripts/utils.py:530-541``);
* the TPU arm: a committed ``bench.py`` result JSON (f32, quasi-Newton,
  tuned fixed step, 1024 chains).

and writes ``validation/ess_per_step_comparison.json`` with the measured
ESS/sec ratio, the measured ESS/step both sides, and the residual
ESS-per-step factor separating the two sampler variants.

Usage: python scripts/ess_per_step_comparison.py [tpu_result.json]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
CPU_CKPT = os.path.join(
    REPO, "experiments", "fhn_noiseless_chmc_canonical_cpu_f64", "checkpoint.npz"
)
DEFAULT_TPU = os.path.join(
    REPO, "benchmarks", "results", "bench_r4_rehearsal_cap24_2026-08-21.json"
)
OUT = os.path.join(REPO, "validation", "ess_per_step_comparison.json")

# CPU trace keys (reference parameter names) -> canonical names.
PARAMS = {"σ": "sigma", "ϵ": "eps", "γ": "gamma", "β": "beta"}


def cpu_side():
    from manifold_mcmc_tpu.utils import stats as diag

    with np.load(CPU_CKPT, allow_pickle=True) as ck:
        traces = {}
        for k, name in PARAMS.items():
            v = ck[f"trc__{k}"]  # (chains, sweeps, partitions)
            traces[name] = v.reshape(v.shape[0], -1)
        n_steps = int(ck["stc__n_step"].sum())
        n_step_median = float(np.median(ck["stc__n_step"]))
        depth_cap_frac = float(
            (ck["stc__n_step"] >= 1023).mean()
        )
        accept_mean = float(ck["stc__accept_stat"].mean())
        n_sweeps = ck[f"trc__σ"].shape[1]
        clean = np.asarray(ck["clean_main_times"], np.float64)
        n_chains = traces["sigma"].shape[0]
    if clean.size == 0:
        raise SystemExit(
            "CPU checkpoint has no clean_main_times yet; wait for a few "
            "post-upgrade sweeps"
        )
    per_sweep = float(np.median(clean))
    total_time = per_sweep * n_sweeps
    ess = {k: float(diag.ess_bulk(v)) for k, v in traces.items()}
    min_ess = min(ess.values())
    return {
        "arm": "CPU f64 golden (reference config: 4 chains, Newton, dual "
        "averaging, x64, 1 core)",
        "num_chains": n_chains,
        "n_main_iters_completed": int(traces["sigma"].shape[1]),
        "n_main_sweeps_completed": int(n_sweeps),
        "per_sweep_s_median": per_sweep,
        "n_timed_sweeps": int(clean.size),
        "total_main_time_s_extrapolated": total_time,
        "total_integrator_steps": n_steps,
        "ess_bulk": ess,
        "min_param_ess_bulk": min_ess,
        "ess_per_sec": min_ess / total_time,
        "ess_per_step": min_ess / n_steps,
        "tau_step_pooled_s": total_time / n_steps,
        "n_step_median_per_iter": n_step_median,
        "frac_iters_at_depth_cap": depth_cap_frac,
        "mean_accept_stat": accept_mean,
    }


def tpu_side(path):
    with open(path) as f:
        r = json.load(f)
    # Round-5 bench results split the accounting: ``main_phase_time_s`` is
    # the measurement window the ess/s divides by, while ``wall_time_s`` is
    # the whole process wall (init + compile + measurement).  Older results
    # only have ``wall_time_s`` (== the measurement window at the time).
    main_time = r.get("main_phase_time_s", r["wall_time_s"])
    n_steps = main_time / r["pooled_step_latency_s"]
    step = r.get("final_step_size", r.get("config", {}).get("init_step_size"))
    return {
        "arm": (
            f"TPU f32 (bench config: {r['num_chains']} chains, quasi-Newton, "
            f"fixed step {step}, depth 6)"
        ),
        "source": os.path.relpath(path, REPO),
        "num_chains": r["num_chains"],
        "n_main_iters_completed": r["num_main_iter_completed"],
        "total_main_time_s": main_time,
        "total_integrator_steps": int(round(n_steps)),
        "ess_bulk": r["ess_bulk"],
        "min_param_ess_bulk": r["min_param_ess_bulk"],
        "ess_per_sec": r["value"],
        "ess_per_step": r["min_param_ess_bulk"] / n_steps,
        "tau_step_pooled_s": r["pooled_step_latency_s"],
    }


def main():
    tpu_path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_TPU
    cpu = cpu_side()
    tpu = tpu_side(tpu_path)
    out = {
        "cpu": cpu,
        "tpu": tpu,
        "measured_ess_per_sec_ratio": tpu["ess_per_sec"] / cpu["ess_per_sec"],
        "measured_tau_step_ratio": cpu["tau_step_pooled_s"]
        / tpu["tau_step_pooled_s"],
        "ess_per_step_ratio_tpu_over_cpu": tpu["ess_per_step"]
        / cpu["ess_per_step"],
        "status": (
            "FINAL (round 5): BOTH arms converged -- CPU golden prefix "
            "r_hat <= 1.003 at its committed sweep count, TPU rung-0 "
            "r_hat_max 1.0084 over 512 stationary draws from the "
            "golden-seeded fixture at the stationary-fleet-tuned step 0.18 "
            "(the 0.205 capture, 15.8 ess/s at r_hat_max 1.0147, is "
            "preserved in bench_r5_rung0_converged_step0205.json).  The "
            "CPU arm freezes at its committed prefix (the full "
            "1000-iteration schedule needs ~12 h on this 1-core sandbox; "
            "the prefix is long past its own convergence gate, so further "
            "sweeps only shrink Monte-Carlo error)."
        ),
        "notes": (
            "ess_per_sec_ratio is the fully measured headline; "
            "tau_step_ratio is what bench.py reports as vs_baseline; their "
            "quotient is the measured ESS-per-step factor between the two "
            "sampler variants (f32/quasi-Newton/fixed-step vs f64/Newton/"
            "dual-averaged).  CPU ESS comes from the completed prefix of "
            "the canonical run (checkpointed, resumable); CPU timing "
            "extrapolates the median measured per-sweep cost over all "
            "completed sweeps, the same convention bench.py uses for "
            "resumed runs.  Both ESS estimators are this repo's "
            "rank-normalised bulk ESS (utils/stats.py).  MEASURED origin "
            "of the ESS/step gap (round-5 stationary-fleet numbers): the "
            "CPU arm (reference defaults, max_tree_depth=10, dual-averaged "
            "step 0.2005, accept 0.80) runs 91% of its trees to the "
            "1023-step depth cap -- the U-turn criterion rarely fires on "
            "this posterior -- with per-parameter tau 1.5-3.3 draws, while "
            "the TPU bench (depth-6 truncated NUTS at the stationary-"
            "fleet-tuned step 0.18, trees U-turn naturally at ~24 steps) "
            "pays tau 1.6-4.3 draws: ~1.5x the autocorrelation for ~40x "
            "fewer integrator steps per draw nets the ~31x ESS/step "
            "factor.  tau_step_ratio (bench vs_baseline) is "
            "therefore the conservative hardware number: it equals the "
            "ESS/sec ratio that WOULD hold if both arms ran the same tree "
            "schedule, and the fully measured end-to-end ESS/sec ratio is "
            "larger by the tree-schedule factor."
        ),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2, ensure_ascii=False)
    print(json.dumps({k: v for k, v in out.items() if not isinstance(v, dict)},
                     indent=2))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
