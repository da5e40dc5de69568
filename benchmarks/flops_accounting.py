"""FLOP/byte accounting for the constrained leapfrog step (roofline input).

Lowers the ACTUAL programs the benchmark dispatches -- the constrained
RATTLE step (``samplers/integrators.py:make_constrained_integrator``) and
one quasi-Newton projection solve -- and records XLA's HloCostAnalysis
FLOP / bytes-accessed counts into
``benchmarks/results/flops_canonical.json``, which ``bench.py`` composes
with the measured average solver-iteration count into
``est_flops_per_step`` / ``achieved_flops_per_sec`` / MFU fields.

Accounting semantics (documented, deliberate):

- ``while_loop`` bodies are counted ONCE by HloCostAnalysis, so the step
  program's count includes exactly one forward-projection iteration and one
  reversibility-check iteration; ``bench.py`` adds ``(2*n_bar - 2)`` extra
  iterations at ``solver_iter_flops`` each (``n_bar`` = measured solver
  iterations per solve, two solves per step).
- ``solver_iter_flops`` is the whole quasi-Newton projection program with
  its loop body counted once, i.e. one iteration PLUS the loop-invariant
  setup -- a slight over-count per extra iteration (conservative for MFU).
- Counts are taken from the local CPU backend: FLOP counts are semantic
  (platform-independent modulo fusion differences); bytes-accessed is a
  CPU-layout proxy for HBM traffic and is labelled as such.

The reference's nearest analog is the operation-times harness
(``scripts/fhn_model_noiseless_obs_chmc_operation_times.py:30-65``), which
times the same kernels but never counts their work.

Run:  python benchmarks/flops_accounting.py   (re-execs itself on a clean
local-CPU interpreter if the remote-TPU plugin is registered).
"""

import json
import os
import sys

_REEXEC_GUARD = "_MMT_FLOPS_REEXECED"

if os.environ.get(_REEXEC_GUARD) != "1" and os.environ.get("PALLAS_AXON_POOL_IPS"):
    import subprocess

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env[_REEXEC_GUARD] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    raise SystemExit(
        subprocess.run([sys.executable, os.path.abspath(__file__)] + sys.argv[1:], env=env).returncode
    )

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from manifold_mcmc_tpu.init.interpolation import (
    find_initial_state_by_linear_interpolation,
)
from manifold_mcmc_tpu.models import fhn
from manifold_mcmc_tpu.samplers.integrators import make_constrained_integrator
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.systems.metrics import IdentityMetric
from manifold_mcmc_tpu.utils.config import default_tolerances

T, S, R = (
    int(os.environ.get("MMT_FLOPS_T", 100)),
    int(os.environ.get("MMT_FLOPS_S", 25)),
    int(os.environ.get("MMT_FLOPS_R", 5)),
)
DTYPE = jnp.float32


def _cost(lowered_compiled):
    """Normalise compiled.cost_analysis() across jax versions."""
    ca = lowered_compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return ca or {}


def main():
    rng = np.random.default_rng(20200710)
    z_true = jnp.array([0.3, 0.1, 1.5, 0.8], DTYPE)
    x0_true = jnp.array([-0.5, 0.2], DTYPE)
    steps_data = 1000
    v_data = jnp.asarray(rng.standard_normal((T * steps_data, fhn.dim_v)), DTYPE)
    y_seq = fhn.generate_y_seq(z_true, x0_true, v_data, 0.2 / steps_data, steps_data)

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
        dim_v_0=fhn.dim_v_0,
    )
    tols = default_tolerances()
    metric = IdentityMetric()

    key = jax.random.PRNGKey(0)
    x_obs_target = jnp.concatenate(
        [y_seq, jax.random.normal(key, y_seq.shape, DTYPE) * 0.5], axis=-1
    )
    q, x_obs = find_initial_state_by_linear_interpolation(system, key, x_obs_target)

    integ = make_constrained_integrator(
        system,
        x_obs,
        partition=0,
        projection_solver="quasi-newton",
        constraint_tol=tols["constraint_tol"],
        position_tol=tols["position_tol"],
        reverse_check_tol=tols["reverse_check_tol"],
        divergence_tol=tols["divergence_tol"],
        max_iters=50,
    )
    mom = jnp.zeros_like(q)
    eps = jnp.asarray(0.23, DTYPE)

    # One full constrained RATTLE step, including the point evaluation the
    # sweep amortises from the previous step (subtracted below via
    # ``init_flops``): grad-log-det-Gram, two half-kick cotangent
    # projections, forward projection solve, reversibility-check solve.
    # EVERY field of the new point is returned -- XLA dead-code-eliminates
    # whatever the program does not output (the new point's log-det gradient
    # is consumed by the NEXT step in a real sweep, so it must stay live
    # here to be counted).
    def step_from_arrays(q, mom, eps):
        point = integ.init(q, mom, metric)
        new_point, ok, non_rev, iters = integ.step(point, eps, metric)
        return tuple(new_point) + (ok, non_rev, iters)

    def init_only(q, mom):
        return tuple(integ.init(q, mom, metric))

    # The projection solve alone, its inputs (previous point's Jacobian and
    # Gram Cholesky) passed as arguments so their construction is not part
    # of the counted program.
    _, (jac_ex, chol_ex) = system.log_det_sqrt_gram(q, x_obs)
    pos_f_ex, _ = system.h2_flow(q, mom + 0.1, eps, metric)

    def qn_solve(pos_f, jac, chol, eps):
        res = system.quasi_newton_projection(
            pos_f,
            x_obs,
            jac,
            chol,
            eps,
            metric,
            0,
            tols["constraint_tol"],
            tols["position_tol"],
            tols["divergence_tol"],
            50,
        )
        return (res.pos, res.mu, res.iters, res.norm_delta_pos, res.error,
                res.converged)

    out = {}
    for name, fn, args in (
        ("step_incl_init", step_from_arrays, (q, mom, eps)),
        ("init", init_only, (q, mom)),
        ("qn_solve", qn_solve, (pos_f_ex, jac_ex, chol_ex, eps)),
    ):
        compiled = jax.jit(fn).lower(*args).compile()
        ca = _cost(compiled)
        out[name] = {
            "flops": float(ca.get("flops", 0.0)),
            "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        }
        print(f"{name}: {out[name]}")

    step_flops = out["step_incl_init"]["flops"] - out["init"]["flops"]
    step_bytes = (
        out["step_incl_init"]["bytes_accessed"] - out["init"]["bytes_accessed"]
    )
    solver_iter_flops = out["qn_solve"]["flops"]
    solver_iter_bytes = out["qn_solve"]["bytes_accessed"]

    result = {
        "config": {"T": T, "S": S, "R": R, "dtype": "float32"},
        "step_flops": step_flops,
        "step_bytes": step_bytes,
        "solver_iter_flops": solver_iter_flops,
        "solver_iter_bytes": solver_iter_bytes,
        "raw": out,
        "semantics": (
            "HloCostAnalysis on the local CPU backend; while-loop bodies "
            "counted once, so step_flops embeds one forward + one reverse "
            "projection iteration and bench.py adds (2*n_bar-2) x "
            "solver_iter_flops; solver_iter_flops includes the solve's "
            "loop-invariant setup (conservative over-count); bytes_accessed "
            "is a CPU-layout proxy for HBM traffic"
        ),
    }
    path = os.path.join(
        os.path.dirname(__file__), "results", "flops_canonical.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {path}")
    print(
        f"per-step (at n_bar=1): {step_flops:.3e} flops; "
        f"each extra solver iter: {solver_iter_flops:.3e} flops"
    )


if __name__ == "__main__":
    main()
