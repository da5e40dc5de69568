"""Regenerate examples/FitzHugh-Nagumo_example.ipynb.

The tutorial mirrors the reference notebook's arc (data simulation ->
constrained system -> CHMC sampling -> diagnostics -> Gaussian-splitting
comparison -> corner plot vs ground truth -> noisy observations) with
configs sized to execute end-to-end in <10 minutes on one CPU core.
Run: python examples/build_notebook.py && jupyter nbconvert --execute ...
"""

import json
import os

C, M = "code", "markdown"
cells = []


def add(kind, src):
    cells.append(
        {
            "cell_type": kind,
            "metadata": {},
            "source": src.splitlines(keepends=True),
            **({"outputs": [], "execution_count": None} if kind == C else {}),
        }
    )


add(M, """\
# Manifold MCMC for the FitzHugh–Nagumo model (TPU-native)

End-to-end walkthrough of Bayesian parameter inference in a hypoelliptic
diffusion observed at discrete times, using **constrained HMC on the
implicitly defined manifold** `c(q) = 0` — the TPU-native re-design of the
method from Graham, Thiery & Beskos, *Manifold MCMC methods for Bayesian
inference in a wide class of diffusion models* (arXiv:1912.02982).

The FitzHugh–Nagumo model is a two-dimensional neural-spiking SDE

$$ dX_1 = \\tfrac{1}{\\epsilon}(X_1 - X_1^3 - X_2)\\,dt, \\qquad
   dX_2 = (\\gamma X_1 - X_2 + \\beta)\\,dt + \\sigma\\,dW $$

with only the first coordinate observed. The latent variable `q` is the
whole non-centred noise path (parameters, initial-state noise, Wiener
increments), so the posterior concentrates on a ~hundreds-to-thousands
dimensional manifold. This notebook runs small configurations so it
executes in a few minutes on one CPU core; section 8 shows the production
TPU scaling knobs.
""")

add(C, """\
import jax
# Double precision on CPU is the golden path; on TPU use the default f32.
jax.config.update("jax_enable_x64", jax.default_backend() == "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np
import matplotlib.pyplot as plt

from manifold_mcmc_tpu.models import fhn
from manifold_mcmc_tpu.systems.constrained import ConditionedDiffusionConstrainedSystem
from manifold_mcmc_tpu.samplers.chains import sample_chmc_chains
from manifold_mcmc_tpu.init.interpolation import find_initial_state_by_linear_interpolation
from manifold_mcmc_tpu.utils import stats as diag
from manifold_mcmc_tpu.utils.config import default_tolerances

dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
tols = default_tolerances()
""")

add(M, """\
## 1. Simulate data

Simulate the SDE on a fine grid (Euler steps well below the observation
interval) with known parameters, then keep the observed coordinate at the
`num_obs` observation times. These are the *noiseless* observations used in
sections 2–6; section 7 adds observation noise.
""")

add(C, """\
rng = np.random.default_rng(20200710)
num_obs, obs_interval, steps_data = 20, 0.2, 1000
z_true = jnp.array([0.3, 0.1, 1.5, 0.8], dtype)   # [sigma, eps, gamma, beta]
x_0_true = jnp.array([-0.5, 0.2], dtype)
v_data = jnp.asarray(rng.standard_normal((num_obs * steps_data, fhn.dim_v)), dtype)
y_seq = fhn.generate_y_seq(z_true, x_0_true, v_data, obs_interval / steps_data, steps_data)

ts = obs_interval * np.arange(1, num_obs + 1)
plt.figure(figsize=(7, 2.2))
plt.plot(ts, np.asarray(y_seq)[:, 0], "o-", ms=3)
plt.xlabel("$t$"); plt.ylabel("$y$"); plt.title("observed sequence");
""")

add(M, """\
## 2. Build the constrained system

`ConditionedDiffusionConstrainedSystem` closes over the model functions and
pre-computes the blocked partition structure: the `num_obs` observations are
split into subsequences of `R = num_obs_per_subseq`, conditioning on the
diffusion states at the block boundaries (`x_obs_seq`), which makes the
middle blocks conditionally independent — they evaluate as one vmapped
batch, and the Gram matrix factorises into small per-block Cholesky factors
plus a dense parameter block (Woodbury). Two staggered partitions are
alternated between iterations to restore ergodicity across block
boundaries.
""")

add(C, """\
S, R = 5, 5
system = ConditionedDiffusionConstrainedSystem(
    obs_interval=obs_interval,
    num_steps_per_obs=S,
    num_obs_per_subseq=R,
    y_seq=y_seq,
    dim_u=fhn.dim_z, dim_x=fhn.dim_x, dim_v=fhn.dim_v,
    forward_func=fhn.forward_func,
    generate_x_0=fhn.generate_x_0,
    generate_z=fhn.generate_z,
    obs_func=fhn.obs_func,
    dim_v_0=fhn.dim_v_0,
)
system.layout
""")

add(M, """\
## 3. Initialise chains on the manifold

Sample `(z, x_0)` from the prior, pick observation-time states consistent
with the data (observed coordinate = `y`, unobserved coordinate from a
diffuse Gaussian), and solve per-interval least-squares problems for noise
increments that make the path linearly interpolate those states — an exact
constraint-satisfying start (reference
`mici_extensions.py:1479-1547`).
""")

add(C, """\
num_chain = 4

def x_obs_target(key):
    noise = jax.random.normal(key, y_seq.shape, dtype) * 0.5
    return jnp.concatenate([y_seq, noise], axis=-1)

keys = jax.random.split(jax.random.PRNGKey(1), num_chain)
q_init, x_obs_init = jax.vmap(
    lambda k: find_initial_state_by_linear_interpolation(
        system, jax.random.fold_in(k, 1), x_obs_target(jax.random.fold_in(k, 0))
    )
)(keys)
c0 = jax.vmap(lambda q, x: system.constr(q, x, 0))(q_init, x_obs_init)
print("max |c(q_init)| =", float(jnp.abs(c0).max()))
""")

add(M, """\
## 4. Sample with constrained HMC

One call runs everything on-device: per-chain step-size search, dual-
averaging warm-up, and the main phase of dynamic multinomial HMC
transitions with RATTLE-style constrained leapfrog steps (Newton projection
onto the manifold + reversibility check), alternating the two staggered
partitions.
""")

add(C, """\
def trace_z(q):
    z = fhn.generate_z(q[:4])
    return {"σ": z[0], "ϵ": z[1], "γ": z[2], "β": z[3]}

result = sample_chmc_chains(
    system, q_init, x_obs_init, jax.random.PRNGKey(2),
    num_warm_up_iter=60, num_main_iter=160, max_tree_depth=5,
    trace_func=trace_z,
    **tols,
)
print("step size:", float(result["final_step_size"]),
      " mean accept:", float(np.asarray(result["stats"]["accept_stat"]).mean()))
""")

add(M, """\
## 5. Diagnostics and posterior

Rank-normalised split-$\\hat R$ and bulk/tail effective sample sizes per
parameter (native implementations of the arviz diagnostics the reference
uses), plus marginal posteriors against the known ground truth.
""")

add(C, """\
import pandas as pd
traces = {k: np.asarray(v) for k, v in result["traces"].items() if k in "σϵγβ"}
summary = diag.summary(traces)
table = pd.DataFrame(summary)
table["true"] = [float(z) for z in np.asarray(z_true)]
table
""")

add(C, """\
fig, axes = plt.subplots(1, 4, figsize=(12, 2.6))
for ax, (name, true) in zip(axes, zip("σϵγβ", np.asarray(z_true))):
    ax.hist(traces[name].ravel(), bins=40, density=True, alpha=0.7)
    ax.axvline(true, color="k", ls="--", lw=1)
    ax.set_title(name)
fig.tight_layout()
""")

add(M, """\
## 6. Gaussian splitting

The Hamiltonian can be split two ways (reference notebook cells 31–38):
**standard** — the whole negative log density in $h_1$, free flow in $h_2$ —
or **Gaussian** — the $\\tfrac12 q^\\top q$ prior term moved into $h_2$,
whose flow is then an exact rotation. Gaussian splitting integrates the
dominant Gaussian prior exactly, allowing larger step sizes for the same
acceptance rate on prior-dominated targets.
""")

add(C, """\
system_g = ConditionedDiffusionConstrainedSystem(
    obs_interval=obs_interval,
    num_steps_per_obs=S,
    num_obs_per_subseq=R,
    y_seq=y_seq,
    dim_u=fhn.dim_z, dim_x=fhn.dim_x, dim_v=fhn.dim_v,
    forward_func=fhn.forward_func,
    generate_x_0=fhn.generate_x_0,
    generate_z=fhn.generate_z,
    obs_func=fhn.obs_func,
    dim_v_0=fhn.dim_v_0,
    use_gaussian_splitting=True,
)
result_g = sample_chmc_chains(
    system_g, q_init, x_obs_init, jax.random.PRNGKey(2),
    num_warm_up_iter=60, num_main_iter=160, max_tree_depth=5,
    trace_func=trace_z,
    **tols,
)
traces_g = {k: np.asarray(v) for k, v in result_g["traces"].items() if k in "σϵγβ"}
pd.DataFrame({
    "splitting": ["standard", "gaussian"],
    "step_size": [float(result["final_step_size"]), float(result_g["final_step_size"])],
    "mean_accept": [float(np.asarray(r["stats"]["accept_stat"]).mean()) for r in (result, result_g)],
    "mean_steps_per_iter": [float(np.asarray(r["stats"]["n_step"]).mean()) for r in (result, result_g)],
    "min_param_ess_bulk": [
        min(diag.ess_bulk(t[k]) for k in t) for t in (traces, traces_g)
    ],
})
""")

add(M, """\
## 7. Corner plot against ground truth

Pairwise posterior marginals for both splittings, overlaid, with the true
parameter values marked (reference notebook cell 47).
""")

add(C, """\
names = list("σϵγβ")
truth = np.asarray(z_true)
fig, axes = plt.subplots(4, 4, figsize=(9, 9))
for i in range(4):
    for j in range(4):
        ax = axes[i, j]
        if j > i:
            ax.axis("off"); continue
        if i == j:
            ax.hist(traces[names[i]].ravel(), bins=35, density=True, alpha=0.6, label="standard")
            ax.hist(traces_g[names[i]].ravel(), bins=35, density=True, alpha=0.6, label="gaussian")
            ax.axvline(truth[i], color="k", ls="--", lw=1)
            if i == 0:
                ax.legend(fontsize=7)
        else:
            ax.plot(traces[names[j]].ravel(), traces[names[i]].ravel(), ".", ms=1, alpha=0.25)
            ax.plot(traces_g[names[j]].ravel(), traces_g[names[i]].ravel(), ".", ms=1, alpha=0.25)
            ax.plot(truth[j], truth[i], "k*", ms=10)
        if i == 3:
            ax.set_xlabel(names[j])
        if j == 0:
            ax.set_ylabel(names[i])
fig.tight_layout()
""")

add(M, """\
## 8. Noisy observations

With observation noise $y = obs(x) + \\sigma_y n$, the noise coordinates
`n` join the latent state and the constraint gains a diagonal noise block —
the posterior is again exactly on a manifold. (Pass
`generate_sigma=fhn.generate_sigma_y` instead of a constant to *infer* the
noise scale.) The same posterior can also be sampled with standard
unconstrained HMC on the non-centred parameterisation; the repo's
`scripts/cross_validate_chmc_vs_hmc.py` gates the two paths' agreement —
the in-repo analogue of the reference's CHMC / HMC / Julia-bridge overlay.
""")

add(C, """\
sigma_y = 0.1
y_noisy = y_seq + sigma_y * jnp.asarray(rng.standard_normal(y_seq.shape), dtype)
system_n = ConditionedDiffusionConstrainedSystem(
    obs_interval=obs_interval,
    num_steps_per_obs=S,
    num_obs_per_subseq=R,
    y_seq=y_noisy,
    dim_u=fhn.dim_z, dim_x=fhn.dim_x, dim_v=fhn.dim_v,
    forward_func=fhn.forward_func,
    generate_x_0=fhn.generate_x_0,
    generate_z=fhn.generate_z,
    obs_func=fhn.obs_func,
    generate_sigma=sigma_y,
    dim_v_0=fhn.dim_v_0,
)

def x_obs_target_n(key):
    noise = jax.random.normal(key, y_noisy.shape, dtype) * 0.5
    return jnp.concatenate([y_noisy, noise], axis=-1)

q_init_n, x_obs_init_n = jax.vmap(
    lambda k: find_initial_state_by_linear_interpolation(
        system_n, jax.random.fold_in(k, 1), x_obs_target_n(jax.random.fold_in(k, 0))
    )
)(keys)
result_n = sample_chmc_chains(
    system_n, q_init_n, x_obs_init_n, jax.random.PRNGKey(3),
    num_warm_up_iter=60, num_main_iter=160, max_tree_depth=5,
    trace_func=trace_z,
    **tols,
)
traces_n = {k: np.asarray(v) for k, v in result_n["traces"].items() if k in "σϵγβ"}
fig, axes = plt.subplots(1, 4, figsize=(12, 2.6))
for ax, (name, true) in zip(axes, zip("σϵγβ", truth)):
    ax.hist(traces[name].ravel(), bins=35, density=True, alpha=0.6, label="noiseless")
    ax.hist(traces_n[name].ravel(), bins=35, density=True, alpha=0.6, label="noisy σ_y=0.1")
    ax.axvline(true, color="k", ls="--", lw=1)
    ax.set_title(name)
axes[0].legend(fontsize=7)
fig.tight_layout()
""")

add(M, """\
## 9. Scaling up on TPU

Production settings (see `bench.py` and `BASELINE_MEASURED.json`):

- **Chains**: `vmap` batches hundreds-to-thousands of chains through every
  program; pooled per-step cost at the paper's canonical configuration
  (T=100, S=25, R=5) is ~1.1 ms/step on one TPU v5e versus ~38 ms/step for
  the double-precision CPU path — a ~35× throughput ratio from chain
  batching alone.
- **Precision**: TPU runs f32 with rescaled solver tolerances
  (`default_tolerances()`); the f64 CPU path remains the golden reference.
- **Multi-chip**: shard the chain axis over a device mesh:

```python
from manifold_mcmc_tpu.parallel.mesh import make_chain_mesh, shard_chain_inputs
mesh = make_chain_mesh()
q_init, x_obs_init = shard_chain_inputs(mesh, q_init, x_obs_init)
# sample_chmc_chains(...) partitions automatically under GSPMD.
```

- **Unstable runtimes**: `sample_chmc_chains_host_loop` runs the same
  sweeps with one bounded device dispatch per sub-iteration and
  crash-durable `.npz` checkpoints.
""")

nb = {
    "cells": cells,
    "metadata": {
        "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
        "language_info": {"name": "python", "version": "3.12"},
    },
    "nbformat": 4,
    "nbformat_minor": 5,
}
out = os.path.join(os.path.dirname(__file__), "FitzHugh-Nagumo_example.ipynb")
with open(out, "w") as f:
    json.dump(nb, f, indent=1)
print("wrote", out, len(cells), "cells")
