"""Weak-scaling measurement of the sharded CHMC step over a virtual mesh.

Runs the full warm-up sweep (both partitions + both cross-chain collectives,
``__graft_entry__._dryrun_multichip_impl``) at a FIXED per-device chain count
on a 1-device and an 8-device mesh of virtual CPU devices
(``xla_force_host_platform_device_count``), and records the per-sweep wall
times.  All virtual devices share one physical core, so ideal weak scaling
here is a ~8x wall-time ratio (8x the total work, serialised); the measured
ratio quantifies the GSPMD partitioning + collective overhead on top of
that.  On real multi-chip hardware the same program would run the 8 shards
concurrently over ICI.

Usage (the script re-execs itself per device count):

    python benchmarks/mesh_scaling.py          # writes results JSON
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHAINS_PER_DEVICE = 2
STRONG_TOTAL_CHAINS = 16
SWEEPS = 4


def run_child(n_devices, chains_per_device):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={n_devices}"]
    )
    env["MMT_MESH_SCALING_CHILD"] = str(n_devices)
    env["MMT_MESH_SCALING_CPD"] = str(chains_per_device)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = next(
        (l for l in out.stdout.splitlines() if l.startswith("{")), None
    )
    if line is None:
        raise RuntimeError(
            f"child n={n_devices} failed rc={out.returncode}:\n"
            + out.stderr[-2000:]
        )
    return json.loads(line)


def child_main(n_devices):
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    res = g._dryrun_multichip_impl(
        n_devices,
        num_sweeps=SWEEPS,
        chains_per_device=int(
            os.environ.get("MMT_MESH_SCALING_CPD", CHAINS_PER_DEVICE)
        ),
    )
    print(json.dumps(res))


def measure(n_devices, chains_per_device):
    r = run_child(n_devices, chains_per_device)
    # First sweep absorbs dispatch warm-up; report the rest.
    times = r["sweep_times_s"][1:]
    return {
        "num_chains": r["num_chains"],
        "compile_s": round(r["compile_s"], 1),
        "per_sweep_s": round(sum(times) / len(times), 3),
    }


def main():
    weak = {}
    for n in (1, 8):
        weak[str(n)] = measure(n, CHAINS_PER_DEVICE)
        print(f"weak devices={n}: {weak[str(n)]}", file=sys.stderr)
    weak_ratio = weak["8"]["per_sweep_s"] / weak["1"]["per_sweep_s"]
    strong = {}
    for n in (1, 2, 4, 8):
        strong[str(n)] = measure(n, STRONG_TOTAL_CHAINS // n)
        print(f"strong devices={n}: {strong[str(n)]}", file=sys.stderr)
    strong_ratios = {
        n: round(strong[n]["per_sweep_s"] / strong["1"]["per_sweep_s"], 2)
        for n in strong
    }
    out = {
        "description": (
            "scaling of the sharded CHMC warm-up sweep on VIRTUAL CPU "
            "devices (one physical core). WEAK: chains_per_device fixed, 8 "
            "devices do 8x the total work serially, so ratio ~8 is ideal; "
            "excess is GSPMD/collective overhead. STRONG: total chains "
            "fixed at 16, so the total work is constant and the ideal "
            "serialised ratio is ~1.0 at every device count; excess is the "
            "pure partitioning + collective overhead that on real hardware "
            "would be hidden by concurrent execution over ICI."
        ),
        "chains_per_device_weak": CHAINS_PER_DEVICE,
        "strong_total_chains": STRONG_TOTAL_CHAINS,
        "config": {"T": 100, "S": 25, "R": 5, "max_tree_depth": 2},
        "weak": weak,
        "wall_ratio_8_vs_1_weak": round(weak_ratio, 2),
        "ideal_ratio_serial_weak": 8.0,
        "strong": strong,
        "strong_wall_ratios_vs_1": strong_ratios,
        "ideal_ratio_serial_strong": 1.0,
    }
    path = os.path.join(
        REPO, "benchmarks", "results", "mesh_scaling_virtual.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    n = os.environ.get("MMT_MESH_SCALING_CHILD")
    if n:
        child_main(int(n))
    else:
        main()
