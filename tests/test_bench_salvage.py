"""Unit tests for bench.py's last-resort watchdog salvage path.

The salvage must reconstruct a full result JSON from the host-loop
checkpoint alone (traces + stats + the self-describing ``clean_main_times``
added in round 3), because when it runs the main thread may be wedged
anywhere -- the round-1/2 driver failures were a bench child that burned
its whole budget and printed nothing.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench():
    repo = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(repo, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_module"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_fake_checkpoint(path, n_chains=4, n_sweeps=10, n_partition=2, seed=0):
    rng = np.random.default_rng(seed)
    payload = {"sweep": n_sweeps}
    for name in ("sigma", "eps", "gamma", "beta"):
        payload[f"trc__{name}"] = rng.standard_normal(
            (n_chains, n_sweeps, n_partition)
        )
    payload["stc__n_step"] = np.full((n_chains, n_sweeps, n_partition), 16)
    payload["stc__n_solver_iters"] = np.full(
        (n_chains, n_sweeps, n_partition), 160
    )
    payload["stc__accept_stat"] = np.full((n_chains, n_sweeps, n_partition), 0.8)
    payload["clean_main_times"] = np.array([2.0, 2.2, 1.8])
    np.savez(path, **payload)


def _ctx(bench, ckpt, n_sweeps_target=16):
    import time

    return {
        "phase": ["test"],
        "t_start": time.time(),
        "ckpt": str(ckpt),
        "deadline_ts": float("inf"),
        "num_chains": 4,
        "num_warm": 0,
        "num_main": 32,
        "T": 100,
        "S": 25,
        "R": 5,
        "depth": 6,
        "driver": "host",
        "seed": 1,
        "splitting": "standard",
        "dtype_name": "float32",
        "tau_cpu": 7.67e-4,
        "baseline_desc": "test baseline",
        "flops_tab": None,
        "num_partition": 2,
        "n_main_sweeps_target": n_sweeps_target,
    }


def test_salvage_reconstructs_result(bench, tmp_path):
    ckpt = tmp_path / "ck.npz"
    _write_fake_checkpoint(ckpt)
    out = bench._salvage_from_checkpoint(_ctx(bench, ckpt))
    assert out is not None
    assert out["metric"] == "fhn_noiseless_chmc_ess_per_sec"
    assert out["salvaged_by_watchdog"] is True
    assert out["partial"] is True  # 10 of 16 target sweeps
    # 10 sweeps x median(2.0, 2.2, 1.8) seconds.
    assert out["main_phase_time_s"] == pytest.approx(20.0)
    # tau_step = 20 s / (4 chains * 10 sweeps * 2 partitions * 16 steps).
    assert out["pooled_step_latency_s"] == pytest.approx(20.0 / 1280, rel=1e-3)
    # vs_baseline is rounded to 2 decimals in the output dict.
    assert out["vs_baseline"] == pytest.approx(
        7.67e-4 / (20.0 / 1280), abs=0.005
    )
    # n_bar = solver_iters / (2 * steps) = 160 / 32.
    assert out["avg_solver_iters_per_step"] == pytest.approx(5.0)
    assert out["num_main_iter_completed"] == 20
    assert out["value"] > 0 and np.isfinite(out["value"])
    # Convergence gate + paper-anchored ratios (round-4 hygiene fields).
    assert np.isfinite(out["r_hat_max"]) and out["r_hat_max"] > 0
    assert set(out["r_hat"]) == {"sigma", "eps", "gamma", "beta"}
    assert out["paper_tau_step_s"] == pytest.approx(1.2e-5 * 25)
    assert out["vs_paper_annotation_tau_step"] == pytest.approx(
        1.2e-5 * 25 / (20.0 / 1280), abs=0.01
    )
    lo, hi = out["vs_paper_tau_eff_band"]
    assert lo == pytest.approx(out["value"] / 10.0, abs=0.06)
    assert hi == pytest.approx(out["value"] / 0.1, abs=0.06)
    # wall_time_s is the REAL process wall clock (round-5 fix: it used to
    # alias main_phase_time_s, undercounting init/compile), so with t_start
    # = now it must be tiny, not 20 s.
    assert 0.0 <= out["wall_time_s"] < 20.0
    assert out["r_hat_has_nan"] is False
    assert out["init_source"] == "unknown"


def test_rhat_nan_is_flagged_not_skipped(bench, tmp_path):
    """A constant trace yields NaN split-R-hat; the gate must flag it.

    Round-4 advisor finding: Python ``max`` over dict values silently skips
    NaN depending on order, so a benign-looking r_hat_max could hide a
    constant (frozen) parameter trace.  nanmax + the explicit flag keep the
    gate honest.
    """
    ckpt = tmp_path / "ck.npz"
    _write_fake_checkpoint(ckpt)
    # Overwrite one trace with a constant: split_rhat -> NaN (zero variance).
    with np.load(ckpt) as ck:
        payload = {k: ck[k] for k in ck.files}
    payload["trc__sigma"] = np.zeros_like(payload["trc__sigma"])
    np.savez(ckpt, **payload)
    out = bench._salvage_from_checkpoint(_ctx(bench, ckpt))
    assert out is not None
    assert out["r_hat_has_nan"] is True
    # The finite parameters' r_hat still drives the reported max.
    assert np.isfinite(out["r_hat_max"])


def test_salvage_refuses_below_floor(bench, tmp_path):
    ckpt = tmp_path / "ck.npz"
    _write_fake_checkpoint(ckpt, n_sweeps=4)  # < MIN_MAIN_SWEEPS
    assert bench._salvage_from_checkpoint(_ctx(bench, ckpt)) is None


def test_salvage_refuses_missing_file_and_fields(bench, tmp_path):
    assert bench._salvage_from_checkpoint(_ctx(bench, tmp_path / "no.npz")) is None
    ckpt = tmp_path / "ck.npz"
    # Pre-round-3 checkpoint without clean_main_times: unusable for timing.
    rng = np.random.default_rng(0)
    np.savez(
        ckpt,
        sweep=10,
        **{f"trc__{n}": rng.standard_normal((4, 10, 2)) for n in
           ("sigma", "eps", "gamma", "beta")},
    )
    assert bench._salvage_from_checkpoint(_ctx(bench, ckpt)) is None


def test_mfu_fields_compose_extra_solver_iters(bench):
    tab = {
        "step_flops": 1e8,
        "solver_iter_flops": 1e7,
        "step_bytes": 1e6,
        "solver_iter_bytes": 1e5,
    }
    # n_bar=5 -> 2*5-2 = 8 extra iterations beyond the two embedded ones.
    out = bench._mfu_fields(tab, n_bar=5.0, n_steps_total=1000, total_time=2.0)
    assert out["est_flops_per_step"] == pytest.approx(1e8 + 8 * 1e7)
    assert out["achieved_flops_per_sec"] == pytest.approx(
        (1e8 + 8 * 1e7) * 1000 / 2.0
    )
    assert 0 < out["mfu_vs_v5e_bf16_peak"] < 1
    assert out["est_bytes_per_step_unfused_upper"] == pytest.approx(1e6 + 8e5)
    assert "dispatch-latency-bound" in out["binding_regime"]
    assert bench._mfu_fields(None, 5.0, 1000, 2.0) == {
        "est_flops_per_step": None
    }
