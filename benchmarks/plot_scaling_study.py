"""Plot the TPU scaling study (tau_step / n_bar / tau_eff vs R, S, T).

Counterpart of the reference's scaling figures
(``fhn_model_noiseless_obs_generate_plots.py``, with the ``tau_step ~ R^2``
guide line drawn at ``:147-148``) for the single-chip TPU measurements in
``benchmarks/results/tpu_scaling_study.json`` produced by
``run_scaling_study.py``.

Reads the study JSON, emits one three-panel figure per grid axis into
``figures_canonical/scaling/`` and prints the fitted log-log slopes; the
R-axis figure overlays the reference's CPU R^2 guide for direct comparison.
"""

import json
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(__file__)
IN = os.path.join(HERE, "results", "tpu_scaling_study.json")
OUT_DIR = os.path.join(HERE, "..", "figures_canonical", "scaling")


def main():
    with open(IN) as f:
        results = json.load(f)
    os.makedirs(OUT_DIR, exist_ok=True)
    slopes = {}
    for axis in ("R", "S", "T"):
        rows = sorted(
            (r for r in results.values() if r["axis"] == axis),
            key=lambda r: r[axis],
        )
        if len(rows) < 2:
            continue
        x = np.array([r[axis] for r in rows], float)
        tau_step = np.array([r["pooled_step_latency_s"] for r in rows])
        n_bar = np.array([r["avg_solver_iters_per_step"] for r in rows])
        tau_eff = np.array(
            [r["tau_eff_s"] if r["tau_eff_s"] else np.nan for r in rows]
        )

        fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
        axes[0].plot(x, tau_step, "o-", label="TPU (256 chains, pooled)")
        slope, intercept = np.polyfit(np.log(x), np.log(tau_step), 1)
        xs = np.linspace(x.min(), x.max(), 50)
        axes[0].plot(
            xs,
            np.exp(intercept) * xs**slope,
            "--",
            lw=0.8,
            label=f"fit: τ_step ∝ {axis}^{slope:.2f}",
        )
        if axis == "R":
            # The reference's CPU guide line tau_step = 1.2e-5 * R^2 s
            # (``fhn_model_noiseless_obs_generate_plots.py:147-148``),
            # normalised to pass through the TPU R=5 point so the EXPONENT
            # comparison is visually direct.
            anchor = tau_step[np.argmin(np.abs(x - 5))]
            axes[0].plot(
                xs,
                anchor * (xs / 5.0) ** 2,
                ":",
                lw=1.2,
                color="0.4",
                label="CPU-reference ∝ R² guide",
            )
        axes[0].set(
            xscale="log",
            yscale="log",
            xlabel=axis,
            ylabel="τ_step (s, pooled over chains)",
        )
        axes[0].legend(fontsize=7)
        slopes[axis] = round(float(slope), 3)

        axes[1].plot(x, n_bar, "o-")
        axes[1].set(
            xscale="log", xlabel=axis, ylabel="avg solver iters / step"
        )
        axes[1].set_ylim(0, max(7, np.nanmax(n_bar) * 1.1))

        axes[2].plot(x, tau_eff, "o-", color="C2")
        axes[2].set(
            xscale="log",
            yscale="log",
            xlabel=axis,
            ylabel="time per eff. sample (s)",
        )
        axes[2].set_title("short-chain estimate", fontsize=8)
        fig.suptitle(
            f"FHN noiseless CHMC on one TPU v5e chip: scaling vs {axis}",
            fontsize=10,
        )
        fig.tight_layout()
        out = os.path.join(OUT_DIR, f"tpu_scaling_vs_{axis}.pdf")
        fig.savefig(out)
        print(f"wrote {out}")
    fit_path = os.path.join(HERE, "results", "tpu_scaling_fits.json")
    with open(fit_path, "w") as f:
        json.dump({"loglog_slope_tau_step": slopes}, f, indent=2)
    print(f"slopes: {slopes} -> {fit_path}")


if __name__ == "__main__":
    main()
