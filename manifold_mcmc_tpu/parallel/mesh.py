"""Device-mesh utilities for sharding chains across TPU slices.

The reference is single-process / single-device; its only parallelism is
independent chains plus a cross-chain adapter merge (SURVEY.md section 2.1).
On TPU the natural mapping is *chain data parallelism*: a 1-D
``jax.sharding.Mesh`` over every device with the chain axis of all sampler
inputs sharded across it.  Since chains are independent except for a handful
of scalar warm-up reductions (final step size, Welford merges), the whole
jitted sampler partitions automatically under GSPMD -- the reductions lower
to single all-reduces over ICI; no hand-written collectives are needed.

Multi-host extension: call ``jax.distributed.initialize`` first and the same
mesh spans all processes (DCN between slices, ICI within).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_chain_mesh", "shard_chain_inputs", "chain_sharding"]

CHAIN_AXIS = "chains"


def make_chain_mesh(devices=None):
    """1-D mesh over all (or the given) devices with a single 'chains' axis."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def chain_sharding(mesh, ndim=1):
    """NamedSharding placing the leading (chain) axis across the mesh."""
    spec = PartitionSpec(CHAIN_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def shard_chain_inputs(mesh, *arrays):
    """Device-put arrays with their leading chain axis sharded over the mesh.

    The chain count must be divisible by the mesh size.  Returns the arrays
    in the same order; pass them into any jitted sampler and GSPMD propagates
    the sharding through the whole program.
    """
    num_devices = mesh.devices.size
    out = []
    for arr in arrays:
        if arr.shape[0] % num_devices != 0:
            raise ValueError(
                f"chain count {arr.shape[0]} not divisible by mesh size "
                f"{num_devices}"
            )
        out.append(jax.device_put(arr, chain_sharding(mesh, arr.ndim)))
    return tuple(out) if len(out) > 1 else out[0]
