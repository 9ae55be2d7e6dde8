"""Pipeline-parallel executor (GPipe-style) over a mesh axis.

The reference has no multi-device runtime at all (SURVEY.md §5); this is a
TPU-native capability: a uniform stack of stages is sharded over a mesh
axis, activations flow between neighbouring devices with
``jax.lax.ppermute`` (ICI neighbour hops), and microbatches are streamed
through with ``jax.lax.scan`` so the schedule is a single compiled loop.

Constraints (by design, to stay XLA-friendly):
* all stages share one activation shape (true for SR conv trunks);
* stage parameters are stacked on a leading stage axis and sharded over
  the pipeline axis, so each device holds exactly its stage's weights.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stages(per_stage_params: list) -> dict:
    """Stack a list of per-stage param pytrees on a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


def chunk_blocks(per_block_params: list, n_stages: int) -> dict:
    """Chunk a uniform block stack (e.g. ESRGAN's 23 RRDBs) into
    ``n_stages`` equal pipeline stages.

    Each stage runs ``ceil(n_blocks / n_stages)`` blocks; when the count
    does not divide evenly the last stage is padded with copies of block 0
    that are masked out at run time.  Returns stacked stage params
    ``{'blocks': leaves (n_stages, k, ...), 'mask': (n_stages, k) bool}``
    for ``pipeline_apply`` with a ``masked_stage_fn``-built stage."""
    nb = len(per_block_params)
    k = -(-nb // n_stages)
    mask = np.zeros((n_stages, k), bool)
    rows = []
    for s in range(n_stages):
        row = []
        for j in range(k):
            i = s * k + j
            row.append(per_block_params[i if i < nb else 0])
            mask[s, j] = i < nb
        rows.append(jax.tree.map(lambda *xs: jnp.stack(xs), *row))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
    return {'blocks': stacked, 'mask': jnp.asarray(mask)}


def masked_stage_fn(block_fn):
    """Build a ``pipeline_apply`` stage from a per-block ``block_fn(params,
    x) -> x`` run over the stage's ``chunk_blocks`` stack; padding blocks
    pass the activation through unchanged."""

    def stage(sparams, x):
        def tick(h, blk):
            bp, enabled = blk
            return jnp.where(enabled, block_fn(bp, h), h), None

        h, _ = jax.lax.scan(tick, x, (sparams['blocks'], sparams['mask']))
        return h

    return stage


def pipeline_apply(
    stage_fn,
    stacked_params,
    x,
    mesh: Mesh,
    axis: str = 'pp',
    num_microbatches: int | None = None,
):
    """Run ``x`` through ``n_stages`` pipelined stages sharded over ``axis``.

    ``stage_fn(params, x) -> y`` must preserve the activation shape.
    ``stacked_params``: pytree whose leaves have leading dim = number of
    stages (= mesh axis size).  ``x``: (batch, ...); the batch is split
    into ``num_microbatches`` equal microbatches (default: axis size).

    Returns the same (batch, ...) after all stages, bit-identical to
    applying the stages sequentially."""
    n_stages = mesh.shape[axis]
    batch = x.shape[0]
    m = num_microbatches or n_stages
    if batch % m != 0:
        raise ValueError(f'batch {batch} not divisible by {m} microbatches')
    mb = batch // m
    x_mb = x.reshape(m, mb, *x.shape[1:])

    def per_device(sparams, xs):
        # sparams leaves: (1, ...) — this device's stage; xs: full (m, mb, ...)
        sparams = jax.tree.map(lambda a: a[0], sparams)
        idx = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state, outs = carry
            # activation produced last tick moves one stage to the right
            prev = jax.lax.ppermute(state, axis, fwd)
            # stage 0 ingests microbatch t (clamped; masked when t >= m)
            feed = jax.lax.dynamic_index_in_dim(xs, jnp.minimum(t, m - 1), keepdims=False)
            inp = jnp.where(idx == 0, feed, prev)
            out = stage_fn(sparams, inp)
            # last stage completes microbatch t - (n_stages - 1)
            done_t = t - (n_stages - 1)
            is_done = jnp.logical_and(idx == n_stages - 1, done_t >= 0)
            updated = jax.lax.dynamic_update_index_in_dim(
                outs, out, jnp.maximum(done_t, 0), axis=0
            )
            outs = jnp.where(is_done, updated, outs)
            return (out, outs), None

        # mark the carries as axis-varying up front (shard_map vma typing)
        state0 = jax.lax.pcast(jnp.zeros_like(xs[0]), (axis,), to='varying')
        outs0 = jax.lax.pcast(jnp.zeros_like(xs), (axis,), to='varying')
        (_, outs), _ = jax.lax.scan(tick, (state0, outs0), jnp.arange(m + n_stages - 1))
        # only the last stage holds real outputs -> broadcast via psum
        outs = jnp.where(idx == n_stages - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)

    pspec = jax.tree.map(lambda _: P(axis), stacked_params)
    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
    )
    out = shard_fn(stacked_params, x_mb)
    return out.reshape(batch, *x.shape[1:])


def shard_stacked_params(stacked_params, mesh: Mesh, axis: str = 'pp'):
    """Place stacked stage params so each device holds only its stage."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), stacked_params)
