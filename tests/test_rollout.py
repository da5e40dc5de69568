"""Equivalence tests: rollout/transfer-matrix constraint path vs scan path.

The ``impl="rollout"`` fast path (``ops/rollout.py``) must produce the same
constraint values, Jacobian blocks, Gram factors and log-det gradients as the
``impl="scan"`` implementation (``ops/constraint.py``), which is itself
oracle-tested against dense ``jacrev`` in ``test_constrained_system.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_mcmc_tpu.models import fhn, sir
from manifold_mcmc_tpu.systems.constrained import (
    ConditionedDiffusionConstrainedSystem,
)


def make_pair(model=fhn, noisy=False, num_obs_per_subseq=2, num_obs=6, S=3):
    rng = np.random.default_rng(42)
    y_scale = 0.5 if model is fhn else 3.0
    y_seq = jnp.asarray(np.abs(rng.standard_normal((num_obs, 1))) * y_scale)
    kwargs = dict(
        obs_interval=0.2,
        num_steps_per_obs=S,
        num_obs_per_subseq=num_obs_per_subseq,
        y_seq=y_seq,
        dim_u=model.dim_z + (1 if noisy else 0),
        dim_x=model.dim_x,
        dim_v=model.dim_v,
        forward_func=model.forward_func,
        generate_x_0=model.generate_x_0,
        generate_z=model.generate_z,
        obs_func=model.obs_func,
        generate_sigma=model.generate_sigma_y if noisy else None,
        dim_v_0=model.dim_v_0,
    )
    return (
        ConditionedDiffusionConstrainedSystem(impl="rollout", **kwargs),
        ConditionedDiffusionConstrainedSystem(impl="scan", **kwargs),
    )


def random_point(system, rng):
    q = jnp.asarray(rng.standard_normal(system.layout.dim_q) * 0.3)
    x_obs_seq = system.generate_x_obs_seq(q) + jnp.asarray(
        rng.standard_normal((system.layout.num_obs, system.layout.dim_x)) * 0.1
    )
    return q, x_obs_seq


def assert_jac_equal(jac_a, jac_b):
    du_a, dv_a, dn_a = jac_a
    du_b, dv_b, dn_b = jac_b
    assert len(du_a) == len(du_b)
    for a, b in zip(du_a, du_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9)
    for a, b in zip(dv_a, dv_b):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9)
    assert (dn_a is None) == (dn_b is None)
    if dn_a is not None:
        for a, b in zip(dn_a, dn_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("noisy", [False, True])
@pytest.mark.parametrize("partition", [0, 1])
def test_constr_and_jacobian_match_scan_impl(rng, noisy, partition):
    fast, ref = make_pair(noisy=noisy)
    q, x_obs_seq = random_point(ref, rng)
    np.testing.assert_allclose(
        np.asarray(fast.constr(q, x_obs_seq, partition)),
        np.asarray(ref.constr(q, x_obs_seq, partition)),
        rtol=1e-8,
        atol=1e-10,
    )
    assert_jac_equal(
        fast.jacob_constr_blocks(q, x_obs_seq, partition),
        ref.jacob_constr_blocks(q, x_obs_seq, partition),
    )


@pytest.mark.slow
@pytest.mark.parametrize("noisy", [False, True])
def test_unblocked_matches_scan_impl(rng, noisy):
    fast, ref = make_pair(noisy=noisy, num_obs_per_subseq=None)
    assert fast.num_partition == ref.num_partition == 1
    q, x_obs_seq = random_point(ref, rng)
    np.testing.assert_allclose(
        np.asarray(fast.constr(q, x_obs_seq, 0)),
        np.asarray(ref.constr(q, x_obs_seq, 0)),
        rtol=1e-8,
        atol=1e-10,
    )
    assert_jac_equal(
        fast.jacob_constr_blocks(q, x_obs_seq, 0),
        ref.jacob_constr_blocks(q, x_obs_seq, 0),
    )


@pytest.mark.slow
def test_ragged_partition_matches_scan_impl(rng):
    # num_obs not divisible by R: ragged final block; R // 2 initial block in
    # the staggered partition.
    fast, ref = make_pair(noisy=False, num_obs_per_subseq=3, num_obs=8, S=2)
    for partition in range(ref.num_partition):
        q, x_obs_seq = random_point(ref, rng)
        np.testing.assert_allclose(
            np.asarray(fast.constr(q, x_obs_seq, partition)),
            np.asarray(ref.constr(q, x_obs_seq, partition)),
            rtol=1e-8,
            atol=1e-10,
        )
        assert_jac_equal(
            fast.jacob_constr_blocks(q, x_obs_seq, partition),
            ref.jacob_constr_blocks(q, x_obs_seq, partition),
        )


@pytest.mark.slow
def test_sir_model_matches_scan_impl(rng):
    fast, ref = make_pair(model=sir, noisy=True, num_obs_per_subseq=2, S=2)
    q, x_obs_seq = random_point(ref, rng)
    for partition in range(ref.num_partition):
        np.testing.assert_allclose(
            np.asarray(fast.constr(q, x_obs_seq, partition)),
            np.asarray(ref.constr(q, x_obs_seq, partition)),
            rtol=1e-7,
            atol=1e-9,
        )
        assert_jac_equal(
            fast.jacob_constr_blocks(q, x_obs_seq, partition),
            ref.jacob_constr_blocks(q, x_obs_seq, partition),
        )


@pytest.mark.parametrize("noisy", [False, True])
def test_grad_log_det_matches_scan_impl(rng, noisy):
    fast, ref = make_pair(noisy=noisy)
    q, x_obs_seq = random_point(ref, rng)
    for partition in range(ref.num_partition):
        (val_f, _), grad_f = fast.grad_log_det_sqrt_gram(
            q, x_obs_seq, partition=partition
        )
        (val_r, _), grad_r = ref.grad_log_det_sqrt_gram(
            q, x_obs_seq, partition=partition
        )
        np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-8)
        np.testing.assert_allclose(
            np.asarray(grad_f), np.asarray(grad_r), rtol=1e-6, atol=1e-9
        )


def test_generate_x_obs_seq_matches(rng):
    fast, ref = make_pair()
    q = jnp.asarray(rng.standard_normal(ref.layout.dim_q) * 0.3)
    np.testing.assert_allclose(
        np.asarray(fast.generate_x_obs_seq(q)),
        np.asarray(ref.generate_x_obs_seq(q)),
        rtol=1e-8,
        atol=1e-12,
    )


def test_vmapped_consistency(rng):
    """The rollout path must agree with itself under chain vmap (layout-
    sensitive code paths: flattened scan carries)."""
    fast, _ = make_pair()
    qs = jnp.asarray(rng.standard_normal((4, fast.layout.dim_q)) * 0.3)
    x_obs = jax.vmap(fast.generate_x_obs_seq)(qs)
    c_batch = jax.vmap(lambda q_, x_: fast.constr(q_, x_, 1))(qs, x_obs)
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(c_batch[i]),
            np.asarray(fast.constr(qs[i], x_obs[i], 1)),
            rtol=1e-7,
            atol=1e-9,
        )
