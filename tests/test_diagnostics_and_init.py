"""Tests for MCMC diagnostics, output IO and initialisation routines."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_mcmc_tpu.models import fhn
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)
from manifold_mcmc_tpu.utils import stats as diag
from manifold_mcmc_tpu.utils.output import (
    create_output_dir_and_save_args,
    save_summary,
    write_stats,
    write_traces,
)


# ----------------------------- diagnostics ---------------------------- #


def test_ess_iid_draws(rng):
    # ESS of iid draws should be close to the total number of draws.
    x = rng.standard_normal((4, 2000))
    ess = diag.ess_bulk(x)
    assert 0.7 * 8000 < ess < 1.4 * 8000
    assert abs(diag.split_rhat(x) - 1.0) < 0.01


def test_ess_correlated_draws(rng):
    # AR(1) with coefficient a has integrated autocorrelation (1+a)/(1-a).
    a = 0.9
    n, c = 20000, 4
    eps = rng.standard_normal((c, n))
    x = np.zeros((c, n))
    for t in range(1, n):
        x[:, t] = a * x[:, t - 1] + np.sqrt(1 - a**2) * eps[:, t]
    ess = diag.ess_bulk(x)
    expected = c * n / ((1 + a) / (1 - a))
    assert 0.5 * expected < ess < 2.0 * expected


def test_ess_tail_scales_with_draws(rng):
    # Regression: sequential (stable-sort) ranks for tied values gave the
    # binary tail indicator a within-chain monotone ramp, pinning ess_tail
    # at a small constant (~1.3x num chains) independent of draw count.
    # Average-rank tie handling restores ESS ~ total draws for iid input.
    small = diag.ess_tail(rng.standard_normal((8, 250)))
    large = diag.ess_tail(rng.standard_normal((8, 2500)))
    assert 0.5 * 2000 < small < 1.5 * 2000
    assert 0.5 * 20000 < large < 1.5 * 20000
    assert large > 4 * small


def test_rank_normalize_averages_ties(rng):
    # All tied values must map to one z-value regardless of position.
    x = (rng.standard_normal((4, 100)) > 1.0).astype(np.float64)
    z = diag._rank_normalize(x)
    assert len(np.unique(z[x == 0])) == 1
    assert len(np.unique(z[x == 1])) == 1


def test_rhat_detects_nonconvergence(rng):
    # Chains with different means must give a large R-hat.
    x = rng.standard_normal((4, 500))
    x[0] += 5.0
    assert diag.split_rhat(x) > 1.5
    # Trending chain (first half vs second half differ) also flagged.
    y = rng.standard_normal((2, 500)) + np.linspace(0, 4, 500)
    assert diag.split_rhat(y) > 1.2


def test_summary_layout(rng):
    traces = {
        "sigma": rng.standard_normal((2, 200)),
        "x_0": rng.standard_normal((2, 200, 2)),
    }
    s = diag.summary(traces)
    assert set(s) == {"mean", "sd", "ess_bulk", "ess_tail", "r_hat"}
    assert set(s["mean"]) == {"sigma", "x_0[0]", "x_0[1]"}
    assert np.isfinite(s["ess_bulk"]["sigma"])


# ------------------------------- output ------------------------------- #


@pytest.mark.slow
def test_output_contract(tmp_path, rng):
    out = str(tmp_path / "exp")
    create_output_dir_and_save_args(out, {"seed": 1, "num_chain": 2})
    traces = {
        "sigma": rng.standard_normal((2, 50)),
        "constr_calls": np.cumsum(rng.integers(1, 5, (2, 50)), axis=1),
    }
    write_traces(out, traces)
    write_stats(out, {"accept_stat": rng.uniform(size=(2, 50))})
    summary = diag.summary({"sigma": traces["sigma"]})
    save_summary(out, summary, 12.5, 0.3, traces, print_summary=False)

    # The reference's glob patterns must find these files.
    import glob

    assert len(glob.glob(os.path.join(out, "trace_*_sigma.npy"))) == 2
    assert len(glob.glob(os.path.join(out, "stats_*_accept_stat.npy"))) == 2
    assert len(glob.glob(os.path.join(out, "trace_*_constr_calls.npy"))) == 2
    with open(os.path.join(out, "summary.json")) as f:
        loaded = json.load(f)
    assert loaded["total_sampling_time"] == 12.5
    assert loaded["final_integrator_step_size"] == 0.3
    assert loaded["total_constr_calls"] == int(
        traces["constr_calls"][:, -1].sum()
    )
    with open(os.path.join(out, "args.json")) as f:
        assert json.load(f)["num_chain"] == 2


# ----------------------------- initialisation ------------------------- #


def make_fhn_system(rng, noisy=False, num_obs=6, S=3):
    q_probe = jnp.asarray(rng.standard_normal(4 + 2 + num_obs * S * 2) * 0.4)
    probe = ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=2,
        y_seq=jnp.zeros((num_obs, 1)),
        dim_u=fhn.dim_z,
        dim_x=fhn.dim_x,
        dim_v=fhn.dim_v,
        forward_func=fhn.forward_func,
        generate_x_0=fhn.generate_x_0,
        generate_z=fhn.generate_z,
        obs_func=fhn.obs_func,
        dim_v_0=fhn.dim_v_0,
    )
    x_obs = probe.generate_x_obs_seq(q_probe)
    y_seq = fhn.obs_func(x_obs)
    if noisy:
        y_seq = y_seq + 0.05 * jnp.asarray(rng.standard_normal(y_seq.shape))
    return (
        ConditionedDiffusionConstrainedSystem(
            obs_interval=0.2,
            num_steps_per_obs=S,
            num_obs_per_subseq=2,
            y_seq=y_seq,
            dim_u=fhn.dim_z + (1 if noisy else 0),
            dim_x=fhn.dim_x,
            dim_v=fhn.dim_v,
            forward_func=fhn.forward_func,
            generate_x_0=fhn.generate_x_0,
            generate_z=fhn.generate_z,
            obs_func=fhn.obs_func,
            generate_sigma=fhn.generate_sigma_y if noisy else None,
            dim_v_0=fhn.dim_v_0,
        ),
        y_seq,
    )


@pytest.mark.slow
def test_linear_interpolation_init(rng):
    from manifold_mcmc_tpu.init.interpolation import (
        find_initial_state_by_linear_interpolation,
    )

    system, y_seq = make_fhn_system(rng)
    # Observation-consistent targets: y in the observed coordinate, random in
    # the unobserved one (the reference experiment's generate_x_obs_seq_init).
    x_obs_target = jnp.concatenate(
        [y_seq, jnp.asarray(rng.standard_normal(y_seq.shape)) * 0.5], axis=-1
    )
    q, x_obs = find_initial_state_by_linear_interpolation(
        system, jax.random.PRNGKey(0), x_obs_target
    )
    assert q.shape == (system.layout.dim_q,)
    c = system.constr(q, x_obs, 0)
    assert float(jnp.max(jnp.abs(c))) < 1e-8

    # Batched via vmap for a fleet of chains.
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    qs, x_obss = jax.vmap(
        lambda k: find_initial_state_by_linear_interpolation(
            system, k, x_obs_target
        )
    )(keys)
    cs = jax.vmap(lambda q, x: system.constr(q, x, 0))(qs, x_obss)
    assert float(jnp.max(jnp.abs(cs))) < 1e-8
    # Distinct prior draws produce distinct states.
    assert float(jnp.std(qs[:, 0])) > 0


@pytest.mark.slow
def test_gradient_descent_init(rng):
    from manifold_mcmc_tpu.init.optimization import (
        find_initial_state_by_gradient_descent,
    )

    system, y_seq = make_fhn_system(rng)

    def x_obs_init(key):
        return jnp.concatenate(
            [y_seq, 0.5 * jax.random.normal(key, y_seq.shape, y_seq.dtype)],
            axis=-1,
        )

    q, x_obs = find_initial_state_by_gradient_descent(
        system, jax.random.PRNGKey(2), x_obs_init, tol=1e-8, max_iters=400
    )
    assert float(jnp.max(jnp.abs(system.constr(q, x_obs, 0)))) < 1e-8


def test_gradient_descent_noisy_init(rng):
    from manifold_mcmc_tpu.init.optimization import (
        find_initial_state_by_gradient_descent_noisy_system,
    )

    system, _ = make_fhn_system(rng, noisy=True)
    q, x_obs = find_initial_state_by_gradient_descent_noisy_system(
        system, jax.random.PRNGKey(3), max_iters=500
    )
    c = system.constr(q, x_obs, 0)
    assert float(jnp.max(jnp.abs(c))) < 1e-8


def test_batched_gradient_descent_init(rng):
    from manifold_mcmc_tpu.init.optimization import (
        find_initial_states_by_gradient_descent,
    )

    system, y_seq = make_fhn_system(rng)

    def x_obs_init(key):
        return jnp.concatenate(
            [y_seq, 0.5 * jax.random.normal(key, y_seq.shape, y_seq.dtype)],
            axis=-1,
        )

    qs, x_obss = find_initial_states_by_gradient_descent(
        system,
        jax.random.PRNGKey(2),
        x_obs_init,
        num_chains=4,
        tol=1e-8,
        max_iters=600,
        block_iters=50,
    )
    assert qs.shape == (4, system.layout.dim_q)
    cs = jax.vmap(lambda q, x: system.constr(q, x, 0))(qs, x_obss)
    assert float(jnp.max(jnp.abs(cs))) < 1e-8
    # Distinct chains got distinct draws.
    assert float(jnp.std(qs[:, 0])) > 0


def test_batched_gradient_descent_noisy_init(rng):
    from manifold_mcmc_tpu.init.optimization import (
        find_initial_states_by_gradient_descent_noisy_system,
    )

    system, _ = make_fhn_system(rng, noisy=True)
    qs, x_obss = find_initial_states_by_gradient_descent_noisy_system(
        system, jax.random.PRNGKey(3), num_chains=4, max_iters=600
    )
    assert qs.shape == (4, system.layout.dim_q)
    cs = jax.vmap(lambda q, x: system.constr(q, x, 0))(qs, x_obss)
    assert float(jnp.max(jnp.abs(cs))) < 1e-8
    assert float(jnp.std(qs[:, 0])) > 0


def test_noisy_init_restart_mask():
    """Block-boundary restart rules mirror the reference's per-try loop.

    Reference ``sde/mici_extensions.py:1750-1795``: slow-progress restarts
    apply only within the first half of a try; a chain whose try budget of
    ``max_iters`` iterations is spent restarts unconditionally (without this
    a chain grinding in a hopeless basin is never redrawn — observed as a
    2/256-chain fleet-init stall on SIR noisy-obs).
    """
    import numpy as np

    from manifold_mcmc_tpu.init.optimization import _restart_mask

    done = np.array([False, False, False, False, False, True])
    #          slow+young  slow+old  fine+young  fine+old  fresh   done
    msr_now = np.array([9.0, 9.0, 1.0, 5.0, 100.0, 9.0])
    msr_prev = np.array([10.0, 10.0, 10.0, 10.0, np.inf, 10.0])
    iters = np.array([100, 600, 100, 1000, 100, 2000])
    mask = _restart_mask(done, msr_now, msr_prev, iters, 1000, 0.8)
    # slow chain in first half of try: restart; slow chain in second half:
    # let it grind; steady chain: keep; steady chain at try boundary:
    # forced restart; freshly-restarted chain (msr_prev=inf => ratio 0):
    # exempt; converged chain: never.
    assert mask.tolist() == [True, False, False, True, False, False]
    # Non-finite ratio (inf/inf) counts as slow while young.
    mask2 = _restart_mask(
        np.array([False]), np.array([np.inf]), np.array([np.inf]),
        np.array([100]), 1000, 0.8,
    )
    assert mask2.tolist() == [True]


@pytest.mark.slow
def test_checkpoint_resume_roundtrip(rng, tmp_path):
    from manifold_mcmc_tpu.samplers.chains import sample_chmc_chains
    from manifold_mcmc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    system, _ = make_fhn_system(rng)
    q0 = jnp.asarray(rng.standard_normal(system.layout.dim_q) * 0.4)
    x0 = system.generate_x_obs_seq(q0)
    # Build a consistent on-manifold start by regenerating data from q0.
    y_sim = jnp.asarray(np.asarray(system.model_dict["obs_func"](x0)))
    sys_on = ConditionedDiffusionConstrainedSystem(
        obs_interval=0.2,
        num_steps_per_obs=3,
        num_obs_per_subseq=2,
        y_seq=y_sim,
        dim_u=4,
        dim_x=2,
        dim_v=2,
        forward_func=system.model_dict["forward_func"],
        generate_x_0=system.model_dict["generate_x_0"],
        generate_z=system.model_dict["generate_z"],
        obs_func=system.model_dict["obs_func"],
        dim_v_0=2,
    )
    q_init = jnp.stack([q0, q0])
    x_init = jax.vmap(sys_on.generate_x_obs_seq)(q_init)
    result = sample_chmc_chains(
        sys_on, q_init, x_init, jax.random.PRNGKey(0),
        num_warm_up_iter=6, num_main_iter=6, max_tree_depth=3,
    )
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, result, jax.random.PRNGKey(42))
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(ckpt["final_pos"], np.asarray(result["final_pos"]))

    # Resume: zero warm-up, restored step size and state.
    resumed = sample_chmc_chains(
        sys_on,
        jnp.asarray(ckpt["final_pos"]),
        jnp.asarray(ckpt["final_x_obs_seq"]),
        jnp.asarray(ckpt["key"], dtype=jnp.uint32),
        num_warm_up_iter=0,
        num_main_iter=4,
        max_tree_depth=3,
        init_step_size=float(ckpt["final_step_size"]),
    )
    assert resumed["final_pos"].shape == result["final_pos"].shape
    assert float(resumed["final_step_size"]) == float(ckpt["final_step_size"])


def test_default_tolerances_scale_with_observation_magnitude(monkeypatch):
    """f32 constraint tol is relative to the observation scale (SIR counts
    ~300 sit above the absolute f32 floor); f64 keeps reference absolutes."""
    from manifold_mcmc_tpu.utils import config as cfg

    monkeypatch.setattr(cfg, "is_x64_enabled", lambda: False)
    base = cfg.default_tolerances()
    scaled = cfg.default_tolerances(obs_scale=300.0)
    assert scaled["constraint_tol"] == base["constraint_tol"] * 300.0
    assert scaled["position_tol"] == base["position_tol"]
    # sub-unit scales never tighten below the f32 floor
    assert cfg.default_tolerances(obs_scale=0.01) == base

    monkeypatch.setattr(cfg, "is_x64_enabled", lambda: True)
    f64 = cfg.default_tolerances(obs_scale=300.0)
    assert f64["constraint_tol"] == 1e-9


def test_sir_f32_projection_converges_at_scaled_tolerance(tmp_path):
    """Regression for the frozen-SIR-chains failure: in f32 the projection
    solver can reach the obs-scale-relative constraint tolerance but not the
    f64-era absolute 5e-6, which sits below the forward pass's rounding
    floor at SIR's count-scale observations (~300).  Runs in a subprocess so
    x64 stays off (this file's suite runs under the f64 golden config)."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import json, os, sys
        import jax, jax.numpy as jnp, numpy as np
        from manifold_mcmc_tpu.models import sir
        from manifold_mcmc_tpu.systems.constrained import (
            ConditionedDiffusionConstrainedSystem,
        )
        from manifold_mcmc_tpu.init.optimization import (
            find_initial_states_by_gradient_descent_noisy_system,
        )
        from manifold_mcmc_tpu.utils.config import default_tolerances

        data = np.load(os.path.join("scripts", "data",
                                    "sir_model_boarding_school_data.npz"))
        y_seq = jnp.asarray(data["y_seq"], jnp.float32)
        system = ConditionedDiffusionConstrainedSystem(
            obs_interval=float(data["obs_interval"]),
            num_steps_per_obs=5,
            num_obs_per_subseq=7,
            y_seq=y_seq,
            dim_u=sir.dim_z + 1,
            dim_x=sir.dim_x,
            dim_v=sir.dim_v,
            forward_func=sir.forward_func,
            generate_x_0=sir.generate_x_0,
            generate_z=sir.generate_z,
            obs_func=sir.obs_func,
            generate_sigma=1.0,
            dim_v_0=sir.dim_v_0,
        )
        key = jax.random.PRNGKey(20200710)
        q0, x_obs0 = find_initial_states_by_gradient_descent_noisy_system(
            system, key, num_chains=2
        )
        q, x_obs = q0[0].astype(jnp.float32), x_obs0[0].astype(jnp.float32)
        jac = system.jacob_constr_blocks(q, x_obs, 0)
        chol = system.chol_gram_blocks(jac, partition=0)
        noise = 1e-3 * jax.random.normal(jax.random.PRNGKey(1), q.shape,
                                         jnp.float32)
        tols = default_tolerances(obs_scale=float(jnp.abs(y_seq).max()))
        res_scaled = system.quasi_newton_projection(
            q + noise, x_obs, jac, chol, 0.1,
            constraint_tol=tols["constraint_tol"],
            position_tol=tols["position_tol"],
        )
        res_abs = system.quasi_newton_projection(
            q + noise, x_obs, jac, chol, 0.1,
            constraint_tol=5e-6, position_tol=tols["position_tol"],
        )
        print(json.dumps({
            "scaled_converged": bool(res_scaled.converged),
            "scaled_error": float(res_scaled.error),
            "abs_converged": bool(res_abs.converged),
            "abs_error": float(res_abs.error),
            "f32": str(q.dtype) == "float32",
        }))
        """
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd()
    out = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        cwd=os.getcwd(),
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert r["f32"]
    assert r["scaled_converged"], r
    # the f64-era absolute tolerance is unreachable in f32 at SIR obs scale
    assert not r["abs_converged"], r


def test_unconstrained_init_model_interpolation(rng):
    """make_unconstrained_init_model lets the HMC experiments (no constrained
    system) reuse the interpolation init: the resulting [u, v_0, v] path must
    hit the targets at every observation time (reference initialises its HMC
    chains the same way, scripts/fhn_model_noisy_obs_hmc_experiment.py:105-134)."""
    from manifold_mcmc_tpu.init.interpolation import (
        find_initial_state_by_linear_interpolation,
        make_unconstrained_init_model,
    )

    T, S, obs_interval = 6, 4, 0.2
    model = make_unconstrained_init_model(
        obs_interval,
        S,
        T,
        fhn.dim_z,
        fhn.dim_v_0,
        fhn.dim_v,
        fhn.dim_x,
        fhn.forward_func,
        fhn.generate_x_0,
        fhn.generate_z,
    )
    targets = jnp.asarray(rng.standard_normal((T, fhn.dim_x)) * 0.3)
    q, _ = find_initial_state_by_linear_interpolation(
        model, jax.random.PRNGKey(2), targets
    )
    assert q.shape == (model.layout.dim_q,)
    assert q.shape == (fhn.dim_z + fhn.dim_v_0 + T * S * fhn.dim_v,)
    # Forward-simulate and check the path interpolates the targets.
    u = q[: fhn.dim_z]
    v_0 = q[fhn.dim_z : fhn.dim_z + fhn.dim_v_0]
    v_seq = q[fhn.dim_z + fhn.dim_v_0 :].reshape((-1, fhn.dim_v))
    z = fhn.generate_z(u)
    x = fhn.generate_x_0(z, v_0)
    hits = []
    for i, v in enumerate(v_seq):
        x = fhn.forward_func(z, x, v, obs_interval / S)
        if (i + 1) % S == 0:
            hits.append(x)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(hits)), np.asarray(targets), atol=1e-6
    )
