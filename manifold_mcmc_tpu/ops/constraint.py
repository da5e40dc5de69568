"""Constraint function and structured Jacobian for conditioned diffusions.

The latent state of a conditioned diffusion model is the flat vector

    q = [u, v_0, v_1 .. v_{S*T}, (n_1 .. n_T)]

(parameters, initial-state noise, per-step Wiener noise, and -- for noisy
observations -- per-observation noise).  The observations define a constraint
``c(q) = 0`` stating that the noise path reproduces the observed sequence.

To avoid an O(T^3) dense Gram factorisation, the observation sequence is
partitioned into subsequences of ``num_obs_per_subseq`` observations and the
constraint is *conditioned* on the diffusion states at the subsequence
boundaries (``x_obs_seq``): given the boundary states, the per-block
constraints depend on disjoint noise subsequences, so the noise Jacobian is
block diagonal and all interior ("middle") blocks have identical shapes and
batch under ``vmap``.  Two staggered partitions (offset 0 and offset R/2) are
alternated by the sampler to restore coupling across block boundaries.

This mirrors the blocking scheme of the reference
(``/root/reference/sde/mici_extensions.py:321-624``); the implementation here
is a fresh functional factory returning pure jittable closures over static
:class:`QLayout` / :class:`PartitionScheme` metadata, designed so that one
extra leading ``vmap`` axis (the chain axis) turns every per-block operation
into a large batched TPU kernel.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from manifold_mcmc_tpu.utils.pytree import split

__all__ = [
    "QLayout",
    "BlockSpec",
    "PartitionScheme",
    "compute_partition_schemes",
    "make_constraint_functions",
]


@dataclass(frozen=True)
class QLayout:
    """Static description of the flat latent vector ``q``."""

    dim_u: int
    dim_v_0: int
    dim_v: int
    dim_x: int
    dim_y: int
    num_obs: int
    num_steps_per_obs: int
    noisy: bool

    @property
    def num_steps(self):
        return self.num_obs * self.num_steps_per_obs

    @property
    def dim_q_core(self):
        """Offset of the observation-noise coordinates (= dim of [u, v0, v])."""
        return self.dim_u + self.dim_v_0 + self.num_steps * self.dim_v

    @property
    def dim_q(self):
        return self.dim_q_core + (self.num_obs * self.dim_y if self.noisy else 0)

    def split_q(self, q):
        """Split flat ``q`` into ``(u, v_0, v_seq, n_seq)`` (``n_seq`` may be None)."""
        if self.noisy:
            u, v_0, v_flat, n_flat = split(
                q,
                (self.dim_u, self.dim_v_0, self.num_steps * self.dim_v),
            )
            n_seq = n_flat.reshape((self.num_obs, self.dim_y))
        else:
            u, v_0, v_flat = split(q, (self.dim_u, self.dim_v_0))
            n_seq = None
        v_seq = v_flat.reshape((self.num_steps, self.dim_v))
        return u, v_0, v_seq, n_seq


@dataclass(frozen=True)
class BlockSpec:
    """One entry of a partition: either a single block or a batch of blocks."""

    num_obs: int  # observations per block
    count: int  # number of batched instances (1 for unbatched blocks)
    batched: bool
    initial: bool  # first block: consumes v_0 through generate_x_0
    final: bool  # last block: no terminal state-matching rows

    def rows(self, layout):
        """Constraint rows contributed by one instance of this block."""
        obs_rows = self.num_obs * layout.dim_y
        if self.final:
            return obs_rows
        if not layout.noisy:
            obs_rows -= layout.dim_y  # last obs replaced by the state match
        return obs_rows + layout.dim_x

    def obs_rows(self, layout):
        """Rows carrying observation-noise dependence (leading rows)."""
        obs_rows = self.num_obs * layout.dim_y
        if not self.final and not layout.noisy:
            obs_rows -= layout.dim_y
        return obs_rows


@dataclass(frozen=True)
class PartitionScheme:
    blocks: tuple  # tuple[BlockSpec, ...]

    def total_rows(self, layout):
        return sum(b.rows(layout) * b.count for b in self.blocks)

    def num_state_rows_per_block(self, layout):
        return tuple(0 if b.final else layout.dim_x for b in self.blocks)


def compute_partition_schemes(num_obs, num_obs_per_subseq):
    """Static block layouts for the (up to two) staggered partitions.

    With no blocking (``num_obs_per_subseq`` None or == ``num_obs``) there is
    a single partition with one block.  Otherwise two staggered partitions are
    produced, with initial subsequence sizes ``R`` and ``R // 2``; interior
    blocks all have ``R`` observations and batch together.
    """
    if num_obs_per_subseq is None or num_obs_per_subseq >= num_obs:
        return (
            PartitionScheme(
                blocks=(
                    BlockSpec(
                        num_obs=num_obs,
                        count=1,
                        batched=False,
                        initial=True,
                        final=True,
                    ),
                )
            ),
        )
    if num_obs_per_subseq < 2:
        raise ValueError("num_obs_per_subseq must be >= 2 for blocking")
    R = num_obs_per_subseq
    schemes = []
    for init_size in (R, R // 2):
        num_full, remainder = divmod(num_obs - init_size, R)
        num_middle = num_full - 1 if remainder == 0 else num_full
        final_size = R if remainder == 0 else remainder
        blocks = [
            BlockSpec(
                num_obs=init_size, count=1, batched=False, initial=True, final=False
            )
        ]
        if num_middle > 0:
            blocks.append(
                BlockSpec(
                    num_obs=R,
                    count=num_middle,
                    batched=True,
                    initial=False,
                    final=False,
                )
            )
        blocks.append(
            BlockSpec(
                num_obs=final_size, count=1, batched=False, initial=False, final=True
            )
        )
        schemes.append(PartitionScheme(blocks=tuple(blocks)))
    return tuple(schemes)


def _split_by_block_obs(array, scheme, per_obs):
    """Split a per-observation-indexed array into per-block (batched) parts.

    ``array`` has leading axis ``num_obs * per_obs``; returns one part per
    BlockSpec, batched parts with shape ``(count, num_obs*per_obs, ...)``.
    """
    parts = []
    i = 0
    for b in scheme.blocks:
        n = b.num_obs * per_obs
        if b.batched:
            chunk = array[i : i + b.count * n]
            parts.append(chunk.reshape((b.count, n) + array.shape[1:]))
            i += b.count * n
        else:
            parts.append(array[i : i + n])
            i += n
    return parts


def make_constraint_functions(
    layout,
    schemes,
    y_seq,
    delta,
    forward_func,
    generate_x_0,
    generate_z,
    obs_func,
    generate_sigma=None,
    scan_unroll=None,
):
    """Build the constraint / Jacobian closures for a conditioned diffusion.

    Returns a dict of pure functions, each taking the partition index as a
    *static* Python int (the sampler alternates the two compiled variants):

    - ``generate_x_obs_seq(q)``: states at observation times from a full scan.
    - ``constr(q, x_obs_seq, partition)``: blocked constraint vector.
    - ``jacob_constr_blocks(q, x_obs_seq, partition)``: ``(du, dv, dn)``
      block triples of the structured Jacobian (see :mod:`..ops.gram`).
    """
    if layout.noisy and generate_sigma is None:
        raise ValueError("noisy layout requires generate_sigma")
    noisy = layout.noisy
    S = layout.num_steps_per_obs
    y_seq = jnp.asarray(y_seq)

    # The forward-scan unroll factor changes the compiled program (a
    # performance knob, not semantics); it is an explicit factory argument
    # so callers can pin it, with the env var only supplying the default.
    if scan_unroll is None:
        import os as _os

        scan_unroll = int(_os.environ.get("MMT_SCAN_UNROLL", "1"))
    _unroll = scan_unroll

    def step_scan(z, x_0, v_seq):
        def body(x, v):
            x_n = forward_func(z, x, v, delta)
            return x_n, x_n

        return lax.scan(body, x_0, v_seq, unroll=_unroll)[1]

    def generate_x_obs_seq(q):
        """States at observation times for the current noise path."""
        u, v_0, v_seq, _ = layout.split_q(q)
        z = generate_z(u)
        x_0 = generate_x_0(z, v_0)
        x_seq = step_scan(z, x_0, v_seq)
        return x_seq[S - 1 :: S]

    def generate_y_bar(z, w_0, v_seq, sigma_n, initial, final):
        """Generated partial-observation vector for one block.

        For the initial block ``w_0`` is the initial-state noise ``v_0``;
        otherwise it is the conditioning state at the block's left boundary.
        Non-final blocks append the terminal state (the "matching" rows); for
        noiseless observations the final observation row is dropped since the
        state match subsumes it.
        """
        x_0 = generate_x_0(z, w_0) if initial else w_0
        x_seq = step_scan(z, x_0, v_seq)
        y_gen = obs_func(x_seq[S - 1 :: S])
        if noisy:
            y_gen = y_gen + sigma_n
        if final:
            return y_gen.reshape(-1)
        if noisy:
            return jnp.concatenate([y_gen.reshape(-1), x_seq[-1]])
        return jnp.concatenate([y_gen[:-1].reshape(-1), x_seq[-1]])

    def partition_inputs(v_seq, n_seq, x_obs_seq, partition):
        """Split noise/observation/conditioning sequences into block parts.

        Returns per-block ``(v, n, w_init, x_obs)`` lists plus the per-block
        observation targets assembled from the fixed data ``y_seq`` and the
        runtime conditioning states ``x_obs_seq``.
        """
        scheme = schemes[partition]
        v_parts = _split_by_block_obs(v_seq, scheme, S)
        x_obs_parts = _split_by_block_obs(x_obs_seq, scheme, 1)
        y_parts = _split_by_block_obs(y_seq, scheme, 1)
        n_parts = (
            _split_by_block_obs(n_seq, scheme, 1)
            if noisy
            else [None] * len(scheme.blocks)
        )

        w_inits = [None] * len(scheme.blocks)
        boundary_states = []  # last x_obs of each block instance, in order
        for b, spec in enumerate(scheme.blocks):
            x_obs_b = x_obs_parts[b]
            boundary_states.append(
                x_obs_b[:, -1] if spec.batched else x_obs_b[-1][None]
            )
        all_boundaries = jnp.concatenate(boundary_states, axis=0)
        i = 0
        for b, spec in enumerate(scheme.blocks):
            if b == 0:
                i += spec.count
                continue
            if spec.batched:
                w_inits[b] = all_boundaries[i - 1 : i - 1 + spec.count]
            else:
                w_inits[b] = all_boundaries[i - 1]
            i += spec.count

        y_bars = []
        for b, spec in enumerate(scheme.blocks):
            y_b, x_obs_b = y_parts[b], x_obs_parts[b]
            if spec.final:
                y_bars.append(
                    y_b.reshape((spec.count, -1)) if spec.batched else y_b.reshape(-1)
                )
                continue
            keep = spec.num_obs if noisy else spec.num_obs - 1
            if spec.batched:
                y_bars.append(
                    jnp.concatenate(
                        [y_b[:, :keep].reshape((spec.count, -1)), x_obs_b[:, -1]],
                        axis=-1,
                    )
                )
            else:
                y_bars.append(
                    jnp.concatenate([y_b[:keep].reshape(-1), x_obs_b[-1]])
                )
        return v_parts, n_parts, w_inits, y_bars

    @partial(jax.jit, static_argnames=("partition",))
    def constr(q, x_obs_seq, partition=0):
        """Blocked constraint ``c(q)``; zero iff the path reproduces the data."""
        scheme = schemes[partition]
        u, v_0, v_seq, n_seq = layout.split_q(q)
        z = generate_z(u)
        sigma = generate_sigma(u) if noisy else None
        v_parts, n_parts, w_inits, y_bars = partition_inputs(
            v_seq, n_seq, x_obs_seq, partition
        )
        w_inits[0] = v_0
        out = []
        for b, spec in enumerate(scheme.blocks):
            sigma_n = sigma * n_parts[b] if noisy else None
            if spec.batched:
                gen = jax.vmap(
                    generate_y_bar, in_axes=(None, 0, 0, 0 if noisy else None, None, None)
                )
            else:
                gen = generate_y_bar
            y_gen = gen(z, w_inits[b], v_parts[b], sigma_n, spec.initial, spec.final)
            out.append((y_gen - y_bars[b]).reshape(-1))
        return jnp.concatenate(out)

    def g_y_bar(u, v_bar, n, w_0, initial, final):
        """Block output as a function of (u, v_bar) for Jacobian extraction.

        For the initial block ``v_bar = [v_0, v_seq_flat]`` and ``w_0`` is
        unused; otherwise ``v_bar = v_seq_flat`` with ``w_0`` the boundary
        conditioning state (differentiation w.r.t. ``x_obs_seq`` is never
        needed: the Gram solves only involve (u, v, n) derivatives).
        """
        z = generate_z(u)
        sigma_n = generate_sigma(u) * n if noisy else None
        if initial:
            w_0, v_flat = split(v_bar, (layout.dim_v_0,))
        else:
            v_flat = v_bar
        v_seq = v_flat.reshape((-1, layout.dim_v))
        return generate_y_bar(z, w_0, v_seq, sigma_n, initial, final)

    jacob_g_y_bar = jax.jacrev(g_y_bar, argnums=(0, 1))

    @partial(jax.jit, static_argnames=("partition",))
    def jacob_constr_blocks(q, x_obs_seq, partition=0):
        """Non-zero blocks ``(du, dv, dn)`` of the constraint Jacobian."""
        scheme = schemes[partition]
        u, v_0, v_seq, n_seq = layout.split_q(q)
        v_parts, n_parts, w_inits, _ = partition_inputs(
            v_seq, n_seq, x_obs_seq, partition
        )
        du_blocks, dv_blocks, dn_blocks = [], [], []
        sigma = generate_sigma(u) if noisy else None
        for b, spec in enumerate(scheme.blocks):
            if spec.initial:
                v_bar = jnp.concatenate([v_0, v_parts[b].reshape(-1)])
                w_0 = jnp.zeros((layout.dim_x,), q.dtype)
            elif spec.batched:
                v_bar = v_parts[b].reshape((spec.count, -1))
                w_0 = w_inits[b]
            else:
                v_bar = v_parts[b].reshape(-1)
                w_0 = w_inits[b]
            n_b = n_parts[b]
            if spec.batched:
                jac_fn = jax.vmap(
                    jacob_g_y_bar,
                    in_axes=(None, 0, 0 if noisy else None, 0, None, None),
                )
            else:
                jac_fn = jacob_g_y_bar
            du, dv = jac_fn(u, v_bar, n_b, w_0, spec.initial, spec.final)
            du_blocks.append(du)
            dv_blocks.append(dv)
            if noisy:
                obs_rows = spec.obs_rows(layout)
                shape = (spec.count, obs_rows) if spec.batched else (obs_rows,)
                dn_blocks.append(jnp.broadcast_to(sigma, shape).astype(q.dtype))
        dn = tuple(dn_blocks) if noisy else None
        return tuple(du_blocks), tuple(dv_blocks), dn

    return {
        "generate_x_obs_seq": jax.jit(generate_x_obs_seq),
        "constr": constr,
        "jacob_constr_blocks": jacob_constr_blocks,
        "generate_y_bar": generate_y_bar,
    }
