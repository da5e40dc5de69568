"""A/B the fully in-graph CHMC driver against the host-loop driver on chip.

Round-3 verdict weak item 4: BENCH runs use ``driver=host`` (one dispatch
per sub-iteration through the tunnel) because long device executions get
killed by the tunnelled runtime, but no committed measurement quantified
what the in-graph driver (``sample_chmc_chains`` -- whole warm-up/main
stages as single jitted programs, two host transfers total) achieves on
the real chip.  This script runs BOTH drivers at an identical config sized
so the in-graph main stage stays under the execution killer (256 chains,
depth 6, 16 main iterations = 8 sweeps), via the same bench.py child used
for every other measurement, and writes one results JSON.

The in-graph result's ``main_phase_time_s`` is pure device execution
(AOT-compiled stages, ``return_timings=True``); the host result's is the
median compile-free per-dispatch wall x sweeps, i.e. device time + ~25 ms
tunnel round trip per sub-iteration dispatch.  Their difference isolates
the tunnel-dispatch cost from compute; a non-tunnelled deployment gets the
in-graph number.

Usage (chip): python benchmarks/ab_driver_ingraph_vs_host.py
Env: MMT_AB_CHAINS (256), MMT_AB_MAIN (16), MMT_AB_BUDGET_S (900 per arm).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(
    os.path.dirname(__file__),
    "results",
    "ab_driver_ingraph_vs_host.json",
)


def run_arm(driver, chains, main, budget_s):
    env = dict(os.environ)
    env.update(
        MMT_BENCH_CHILD="1",
        MMT_BENCH_DRIVER=driver,
        MMT_BENCH_CHAINS=str(chains),
        MMT_BENCH_T="100",
        MMT_BENCH_S="25",
        MMT_BENCH_R="5",
        MMT_BENCH_MAX_TREE_DEPTH="6",
        MMT_BENCH_WARM="0",
        MMT_BENCH_MAIN=str(main),
        MMT_BENCH_DEADLINE_TS=str(time.time() + budget_s - 30.0),
    )
    print(f"[ab] driver={driver}: running ({budget_s:.0f}s budget)", flush=True)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=budget_s,
        )
    except subprocess.TimeoutExpired as exc:
        tail = (exc.stderr or b"")
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        print(f"[ab] driver={driver} timed out; stderr tail:", flush=True)
        print("\n".join(tail.splitlines()[-6:]), flush=True)
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
            f"[ab] driver={driver}: no result (rc={proc.returncode}); "
            + "\n".join(proc.stderr.splitlines()[-6:]),
            flush=True,
        )
        return None
    return json.loads(line)


def main():
    chains = int(os.environ.get("MMT_AB_CHAINS", 256))
    main_iters = int(os.environ.get("MMT_AB_MAIN", 16))
    budget = float(os.environ.get("MMT_AB_BUDGET_S", 900))

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for driver in ("host", "ingraph"):
        if results.get(driver, {}).get("pooled_step_latency_s"):
            print(f"[ab] {driver}: already measured, skipping", flush=True)
            continue
        r = run_arm(driver, chains, main_iters, budget)
        if r is None:
            continue
        results[driver] = {
            k: r.get(k)
            for k in (
                "pooled_step_latency_s",
                "main_phase_time_s",
                "value",
                "min_param_ess_bulk",
                "mean_accept_stat",
                "avg_solver_iters_per_step",
                "num_main_iter_completed",
                "num_chains",
                "partial",
                "compile_and_warmup_time_s",
                "init_time_s",
                "config",
                "seed",
            )
        }
        with open(OUT + ".tmp", "w") as f:
            json.dump(results, f, indent=2)
        os.replace(OUT + ".tmp", OUT)
        print(f"[ab] {driver}: tau_step={r['pooled_step_latency_s']:.3e}s", flush=True)

    if {"host", "ingraph"} <= set(results):
        h, g = results["host"], results["ingraph"]
        if h.get("pooled_step_latency_s") and g.get("pooled_step_latency_s"):
            ratio = h["pooled_step_latency_s"] / g["pooled_step_latency_s"]
            results["summary"] = {
                "host_over_ingraph_tau_step_ratio": round(ratio, 3),
                "note": (
                    "ingraph main_phase_time_s is pure device execution "
                    "(AOT stages); host includes one tunnel round trip per "
                    "sub-iteration dispatch.  The ratio is the tunnel-"
                    "dispatch overhead factor at this config; non-tunnelled "
                    "deployments should use the in-graph driver (or larger "
                    "per-dispatch spans) and get the ingraph number."
                ),
            }
            with open(OUT + ".tmp", "w") as f:
                json.dump(results, f, indent=2)
            os.replace(OUT + ".tmp", OUT)
            print(f"[ab] summary: host/ingraph = {ratio:.3f}x", flush=True)


if __name__ == "__main__":
    main()
