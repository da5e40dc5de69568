"""Compute kernels: SDE steps, transforms, constraint linear algebra."""

from manifold_mcmc_tpu.ops import integrators, transforms
from manifold_mcmc_tpu.ops.integrators import (
    Lj_operator,
    diffusion_operator,
    euler_maruyama_step,
    milstein_step,
    strong_order_1p5_step,
)
from manifold_mcmc_tpu.ops.transforms import transform_sde
