"""TPU scaling study: tau_step / n_bar / tau_eff vs R, S, T.

Reproduces the reference's headline scaling experiments
(``run_fhn_model_noiseless_obs_experiments.sh:33-115`` -- grids over
``num_obs_per_subseq`` R, ``num_steps_per_obs`` S and ``num_obs`` T with
the ``tau_step ~ R^2`` guide line drawn at
``fhn_model_noiseless_obs_generate_plots.py:147-148``) on one TPU chip.

Each configuration is measured by the SAME code path the headline benchmark
uses: one ``bench.py`` child process (checkpointed host-loop driver, tuned
fixed step, deadline-aware with watchdog salvage), so tau_step here and the
headline number are directly comparable.  256 vmapped chains per config
keep compile sizes moderate; tree depth shrinks for large R so a single
sub-iteration dispatch stays inside the tunnelled worker's execution
watchdog (tau_step is a per-step quantity, insensitive to depth).

Results accumulate in ``benchmarks/results/tpu_scaling_study.json``;
already-measured configs are skipped, so the study is resumable.  Plot with
``benchmarks/plot_scaling_study.py``.

Caveats recorded per point: ESS (hence tau_eff) comes from a short 24-iter
chain at the R=5-tuned step size 0.23, so tau_eff is indicative; tau_step
and n_bar are the robust measurements (the reference's own R/S/T grids also
fix seeds/schedules per point).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(os.path.dirname(__file__), "results", "tpu_scaling_study.json")

CANON = dict(chains=256, T=100, S=25, R=5, depth=6, warm=0, main=24)


def configs():
    out = []
    # R sweep (full reference grid {2,5,10,20,50,100},
    # ``run_fhn_model_noiseless_obs_experiments.sh:33-115``).  Depth shrinks
    # with R to bound one dispatch's duration; R=100 (the single unblocked
    # Gram over all T=100 observations) additionally drops to 64 chains --
    # at 256 chains its solver while_loop exceeded the tunnelled worker's
    # execution budget in round 3.
    for R, depth in ((2, 6), (5, 6), (10, 5), (20, 4), (50, 3)):
        out.append({**CANON, "R": R, "depth": depth, "axis": "R"})
    out.append({**CANON, "R": 100, "depth": 3, "chains": 64, "axis": "R"})
    # S sweep (full reference grid {25,50,100,200,400}).  Step cost grows
    # ~linearly in S and the cross-chain solver tail inflates it further,
    # so depth shrinks to keep one sub-iteration under the execution
    # watchdog.
    for S, depth in ((25, 6), (50, 6), (100, 6), (200, 4), (400, 3)):
        out.append({**CANON, "S": S, "depth": depth, "axis": "S"})
    # T sweep (full reference grid {25,50,100,200,400}); cost grows with the
    # number of vmapped middle blocks.
    for T, depth in ((25, 6), (50, 6), (100, 6), (200, 5), (400, 4)):
        out.append({**CANON, "T": T, "depth": depth, "axis": "T"})
    return out


def key(c):
    return f"R{c['R']}_S{c['S']}_T{c['T']}_d{c['depth']}_{c['chains']}c"


def run_one(c, budget_s):
    env = dict(os.environ)
    env.update(
        MMT_BENCH_CHILD="1",
        MMT_BENCH_CHAINS=str(c["chains"]),
        MMT_BENCH_T=str(c["T"]),
        MMT_BENCH_S=str(c["S"]),
        MMT_BENCH_R=str(c["R"]),
        MMT_BENCH_MAX_TREE_DEPTH=str(c["depth"]),
        MMT_BENCH_WARM=str(c["warm"]),
        MMT_BENCH_MAIN=str(c["main"]),
        MMT_BENCH_DEADLINE_TS=str(time.time() + budget_s - 30.0),
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=budget_s,
        )
    except subprocess.TimeoutExpired:
        print(f"  -> timed out after {budget_s}s", flush=True)
        return None
    line = next(
        (
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("{") and '"metric"' in ln
        ),
        None,
    )
    if line is None:
        tail = "\n".join(proc.stderr.splitlines()[-8:])
        print(f"  -> no result (rc={proc.returncode}); stderr:\n{tail}", flush=True)
        return None
    return json.loads(line)


def main():
    budget = float(os.environ.get("MMT_SCALING_BUDGET_PER_CONFIG", 1200))
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for c in configs():
        k = key(c)
        if k in results and results[k].get("pooled_step_latency_s"):
            print(f"[scaling] {k}: already measured, skipping", flush=True)
            continue
        print(f"[scaling] {k}: measuring (budget {budget:.0f}s)", flush=True)
        t0 = time.time()
        r = run_one(c, budget)
        if r is None:
            continue
        results[k] = {
            "axis": c["axis"],
            "R": c["R"],
            "S": c["S"],
            "T": c["T"],
            "depth": c["depth"],
            "num_chains": c["chains"],
            "pooled_step_latency_s": r["pooled_step_latency_s"],
            "avg_solver_iters_per_step": r["avg_solver_iters_per_step"],
            "tau_eff_s": (1.0 / r["value"]) if r["value"] else None,
            "min_param_ess_bulk": r["min_param_ess_bulk"],
            "mean_accept_stat": r["mean_accept_stat"],
            "num_main_iter_completed": r["num_main_iter_completed"],
            "partial": r["partial"],
            "wall_time_s": r["wall_time_s"],
            "measure_elapsed_s": round(time.time() - t0, 1),
        }
        tmp = OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        os.replace(tmp, OUT)
        print(
            f"  -> tau_step={r['pooled_step_latency_s']:.3e}s "
            f"n_bar={r['avg_solver_iters_per_step']} "
            f"accept={r['mean_accept_stat']}",
            flush=True,
        )
    print(f"[scaling] done: {len(results)} configs in {OUT}", flush=True)


if __name__ == "__main__":
    main()
