"""Example diffusion models sharing the reference module contract."""

from manifold_mcmc_tpu.models import base, fhn, sir
