"""A/B ESS/sec over (max_tree_depth, max_solver_iters) at the tuned config.

The committed solver-tail probe
(``results/solver_tail_probe_1024c_2026-08-20.json``) shows the per-solve
iteration distribution at the tuned step is bimodal: bulk p90 <= 13, and a
~3-5% non-converging tail that pegs at ANY cap (the fraction converging in
(25, 50] is only 1.4%), so lowering the cap 50 -> 24 buys ~20% batched-step
wall for ~1% per-solve ok rate.  The LARGER vmap waste is tree-length
variance: at depth 6 the average accepted tree is ~10 steps but the batched
program runs every chain to the fleet-max (~63), so pooled tau_step pays a
~6x masked-step inflation.  Both levers are swept here with real ESS
measurements: one bench.py child per (depth, cap) at 1024 chains, tuned
step 0.23, 32 main iterations, seed 1.

Results accumulate (resumably) in ``results/ab_depth_cap.json``.
Env: MMT_AB_BUDGET_S (1200 per config), MMT_AB_GRID ("6:50,6:24,5:50,4:50,4:24").
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(os.path.dirname(__file__), "results", "ab_depth_cap.json")


def run_one(depth, cap, budget_s):
    env = dict(os.environ)
    env.update(
        MMT_BENCH_CHILD="1",
        MMT_BENCH_CHAINS="1024",
        MMT_BENCH_T="100",
        MMT_BENCH_S="25",
        MMT_BENCH_R="5",
        MMT_BENCH_MAX_TREE_DEPTH=str(depth),
        MMT_BENCH_WARM="0",
        MMT_BENCH_MAIN="32",
        MMT_BENCH_SOLVER_ITERS=str(cap),
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
        print(f"  -> d{depth} cap{cap}: timed out", flush=True)
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
        print(
            f"  -> d{depth} cap{cap}: no result (rc={proc.returncode});\n"
            + "\n".join(proc.stderr.splitlines()[-6:]),
            flush=True,
        )
        return None
    return json.loads(line)


def main():
    budget = float(os.environ.get("MMT_AB_BUDGET_S", 1200))
    grid = [
        tuple(int(v) for v in spec.split(":"))
        for spec in os.environ.get(
            "MMT_AB_GRID", "6:50,6:24,5:50,4:50,4:24"
        ).split(",")
    ]
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for depth, cap in grid:
        k = f"d{depth}_cap{cap}"
        if results.get(k, {}).get("value") is not None:
            print(f"[ab] {k}: already measured, skipping", flush=True)
            continue
        print(f"[ab] {k}: measuring (budget {budget:.0f}s)", flush=True)
        r = run_one(depth, cap, budget)
        if r is None:
            continue
        results[k] = {
            key: r.get(key)
            for key in (
                "value",
                "vs_baseline",
                "vs_paper_annotation_tau_step",
                "pooled_step_latency_s",
                "min_param_ess_bulk",
                "r_hat_max",
                "mean_accept_stat",
                "avg_solver_iters_per_step",
                "main_phase_time_s",
                "num_main_iter_completed",
                "partial",
            )
        }
        results[k].update(depth=depth, solver_iters_cap=cap)
        with open(OUT + ".tmp", "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        os.replace(OUT + ".tmp", OUT)
        print(
            f"  -> ess/s={r['value']} tau={r['pooled_step_latency_s']:.3e} "
            f"accept={r['mean_accept_stat']} r_hat={r.get('r_hat_max')}",
            flush=True,
        )
    print("[ab] done", flush=True)


if __name__ == "__main__":
    main()
