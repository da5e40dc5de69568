"""Tests for scripts/summarize_checkpoint.py (partial-result contract).

A deadline-killed host-loop run leaves ``checkpoint.npz`` with ring-buffer
traces and progress counters; the summariser must report exactly the
completed main-phase prefix, leave the checkpoint untouched (resume safety),
and refuse to summarise when too few draws completed.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "summarize_checkpoint",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "summarize_checkpoint.py"),
)
summarize_checkpoint_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(summarize_checkpoint_mod)
summarize_checkpoint = summarize_checkpoint_mod.summarize_checkpoint


def _write_checkpoint(path, chains=4, capacity=50, main_done=20):
    rng = np.random.default_rng(0)
    trc = rng.standard_normal((chains, capacity))
    trc[:, main_done:] = 1e30  # garbage past the completed prefix
    np.savez(
        path,
        warm_done=np.int64(10),
        main_done=np.int64(main_done),
        step_size=np.float32(0.1),
        da_log_step=np.full(chains, np.log(0.1), np.float32),
        trc__sigma=trc.astype(np.float32),
        trc__constr_calls=np.cumsum(
            np.ones((chains, capacity), np.int32), axis=1
        ),
        stc__accept_stat=np.full((chains, capacity), 0.8, np.float32),
    )


def test_summarize_partial_prefix(tmp_path):
    ck = tmp_path / "checkpoint.npz"
    _write_checkpoint(str(ck))
    before = ck.read_bytes()
    dest, out = summarize_checkpoint(str(tmp_path))
    assert ck.read_bytes() == before, "checkpoint must not be modified"
    assert out["partial"] is True
    assert out["main_iters_completed"] == 20
    assert out["warm_up_iters_completed"] == 10
    assert out["num_chains"] == 4
    # Garbage beyond the prefix must not leak into the summary.
    assert np.isfinite(out["mean"]["sigma"]) and abs(out["mean"]["sigma"]) < 10
    assert out["sampler_stats_mean"]["accept_stat"] == pytest.approx(0.8)
    assert out["total_constr_calls"] == 4 * 20
    assert out["per_chain_step_size"]["median"] == pytest.approx(0.1, rel=1e-5)
    with open(dest) as f:
        assert json.load(f)["main_iters_completed"] == 20


def test_summarize_chmc_sweep_schema(tmp_path):
    """CHMC host-loop checkpoints count sweeps and hold exactly the
    completed main sweeps as (chains, sweeps, partitions, ...) arrays."""
    chains, sweeps, partitions = 4, 6, 2
    rng = np.random.default_rng(1)
    np.savez(
        tmp_path / "checkpoint.npz",
        sweep=np.int64(250 + sweeps),  # 250 warm sweeps + 6 main sweeps
        step_size=np.float32(0.25),
        trc__sigma=rng.standard_normal(
            (chains, sweeps, partitions)
        ).astype(np.float32),
        trc__x_0=rng.standard_normal(
            (chains, sweeps, partitions, 2)
        ).astype(np.float32),
        stc__accept_stat=np.full(
            (chains, sweeps, partitions), 0.75, np.float32
        ),
    )
    _, out = summarize_checkpoint(str(tmp_path))
    assert out["main_iters_completed"] == sweeps * partitions
    assert out["warm_up_iters_completed"] == 250 * partitions
    assert out["sampler_stats_mean"]["accept_stat"] == pytest.approx(0.75)
    assert set(out["mean"]) == {"sigma", "x_0[0]", "x_0[1]"}
    assert np.isfinite(list(out["r_hat"].values())).all()


def test_emit_traces_writes_plot_contract_files(tmp_path):
    """--emit-traces writes the reference plot pipeline's on-disk contract
    (``trace_<chain>_<var>.npy`` / ``stats_<chain>_<stat>.npy``, reference
    glob patterns at ``scripts/utils.py:507,556``) holding exactly the
    completed main-phase prefix."""
    _write_checkpoint(str(tmp_path / "checkpoint.npz"))
    summarize_checkpoint(str(tmp_path), emit_traces=True)
    for c in range(4):
        trace = np.load(tmp_path / f"trace_{c}_sigma.npy")
        assert trace.shape == (20,)
        assert np.isfinite(trace).all(), "garbage past prefix leaked"
        stat = np.load(tmp_path / f"stats_{c}_accept_stat.npy")
        assert stat.shape == (20,) and stat == pytest.approx(0.8)


def test_refuses_too_few_draws(tmp_path):
    _write_checkpoint(str(tmp_path / "checkpoint.npz"), main_done=3)
    with pytest.raises(SystemExit):
        summarize_checkpoint(str(tmp_path), min_draws=8)


def test_checkpoint_resume_state_contract(tmp_path):
    """``utils.checkpoint_resume_state`` returns the saved chain state when
    (and only when) a readable checkpoint with the requested keys exists —
    the gate the experiment CLIs use to skip fleet init on resume."""
    _spec_u = importlib.util.spec_from_file_location(
        "exp_utils",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "utils.py"),
    )
    utils_mod = importlib.util.module_from_spec(_spec_u)
    _spec_u.loader.exec_module(utils_mod)

    # No checkpoint at all -> fresh init.
    assert utils_mod.checkpoint_resume_state(str(tmp_path)) is None

    q = np.arange(12, dtype=np.float32).reshape(3, 4)
    x_obs = np.ones((3, 2, 5), np.float32)
    np.savez(tmp_path / "checkpoint.npz", q=q, x_obs=x_obs, sweep=np.int64(7))

    got = utils_mod.checkpoint_resume_state(str(tmp_path))
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got[0]), q)
    np.testing.assert_array_equal(np.asarray(got[1]), x_obs)

    # HMC-style request: only q.
    (q_only,) = utils_mod.checkpoint_resume_state(str(tmp_path), keys=("q",))
    np.testing.assert_array_equal(np.asarray(q_only), q)

    # Missing a requested key -> fresh init (e.g. HMC checkpoint asked for
    # the CHMC x_obs key).
    np.savez(tmp_path / "checkpoint.npz", q=q)
    assert utils_mod.checkpoint_resume_state(str(tmp_path)) is None

    # Torn/corrupt file -> fresh init, not a crash.
    (tmp_path / "checkpoint.npz").write_bytes(b"not an npz")
    assert utils_mod.checkpoint_resume_state(str(tmp_path)) is None
