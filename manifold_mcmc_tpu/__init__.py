"""TPU-native framework for manifold MCMC inference in diffusion (SDE) models.

A ground-up JAX/XLA rebuild of the capabilities of
``thiery-lab/manifold-mcmc-for-diffusions`` (the code accompanying Graham,
Thiery & Beskos, *Manifold MCMC methods for Bayesian inference in a wide class
of diffusion models*, arXiv:1912.02982).

Design principles (TPU-first, not a port):

* Derivatives come from JAX automatic differentiation (``jvp`` / ``jacfwd`` /
  ``jacrev``) rather than the reference's SymNum/SymPy symbolic code
  generation (reference ``sde/integrators.py``, ``sde/transforms.py``).
* The entire Markov chain loop lives on-device inside ``lax.scan`` /
  ``lax.while_loop``; the reference instead bounces host<->device on every
  Hamiltonian-system method call through the external Mici sampler runtime
  (reference ``sde/mici_extensions.py:66-79``).
* Thousands of chains batch with ``jax.vmap`` on one chip and shard across a
  ``jax.sharding.Mesh`` with ``shard_map``; numerical failures (projection
  non-convergence, non-reversible steps, divergences) are per-chain status
  flags folded into masked rejections instead of host-side exceptions.

Subpackages
-----------
``ops``
    SDE integrator-step factories, Ito-lemma change of variables, constraint
    function / structured Jacobian / block Gram linear algebra kernels and
    manifold projection solvers.
``models``
    Example diffusion models (FitzHugh-Nagumo, SIR) implementing the shared
    module contract of the reference ``sde/example_models``.
``systems``
    Hamiltonian system definitions: Euclidean-metric systems for standard HMC
    and the constrained system for conditioned diffusions.
``samplers``
    Symplectic integrators (leapfrog, constrained RATTLE-style leapfrog),
    dynamic multinomial HMC, transition composition, step-size / metric
    adapters and the vmapped multi-chain driver.
``init``
    Constraint-satisfying chain initialisation routines.
``parallel``
    Device-mesh utilities for sharding chains across TPU slices.
``utils``
    Precision configuration, pytree helpers, MCMC diagnostics (bulk ESS,
    split-R-hat) and experiment output IO.
"""

from manifold_mcmc_tpu import (
    init,
    models,
    ops,
    parallel,
    samplers,
    systems,
    utils,
)

__version__ = "0.1.0"

__all__ = [
    "init",
    "models",
    "ops",
    "parallel",
    "samplers",
    "systems",
    "utils",
    "__version__",
]
