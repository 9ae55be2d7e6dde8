"""Expert-parallel mixture-of-experts layer over a mesh axis.

No reference architecture uses sparse MoE (MoESR's "experts" are gated CNN
blocks, resselt/archs/moesr/arch.py), so this is a framework capability
rather than an arch port: expert weights are stacked on a leading expert
axis and sharded over the ``ep`` mesh axis; every device computes its local
experts' contributions (soft, dense dispatch — static shapes, no gather)
and the result is combined with one ``psum`` over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_params(rng: 'jnp.ndarray', d: int, d_hidden: int, n_experts: int):
    """Gate + stacked 2-layer FFN experts."""
    k1, k2, k3 = jax.random.split(rng, 3)
    s1 = (2.0 / d) ** 0.5
    return {
        'gate': jax.random.normal(k1, (d, n_experts), jnp.float32) * s1,
        'w1': jax.random.normal(k2, (n_experts, d, d_hidden), jnp.float32) * s1,
        'w2': jax.random.normal(k3, (n_experts, d_hidden, d), jnp.float32) * (2.0 / d_hidden) ** 0.5,
    }


def moe_apply_dense(params, x):
    """Sequential reference: softmax-gated sum over all experts.

    ``x``: (tokens, d)."""
    probs = jax.nn.softmax(x @ params['gate'], axis=-1)  # (t, E)
    h = jnp.einsum('td,edf->tef', x, params['w1'])
    h = jax.nn.gelu(h)
    y = jnp.einsum('tef,efd->ted', h, params['w2'])
    return jnp.einsum('te,ted->td', probs, y)


def moe_apply_ep(params, x, mesh: Mesh, axis: str = 'ep'):
    """Expert-parallel version: experts sharded over ``axis``, one psum."""
    n_exp = params['w1'].shape[0]
    ep = mesh.shape[axis]
    if n_exp % ep != 0:
        raise ValueError(f'{n_exp} experts not divisible by ep={ep}')
    local = n_exp // ep

    def per_device(gate, w1, w2, xs):
        # gate replicated -> full softmax; w1/w2: this device's expert slice
        probs = jax.nn.softmax(xs @ gate, axis=-1)  # (t, E) full
        start = jax.lax.axis_index(axis) * local
        local_probs = jax.lax.dynamic_slice_in_dim(probs, start, local, axis=1)
        h = jnp.einsum('td,edf->tef', xs, w1)
        h = jax.nn.gelu(h)
        y = jnp.einsum('tef,efd->ted', h, w2)
        part = jnp.einsum('te,ted->td', local_probs, y)
        return jax.lax.psum(part, axis)

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=P(),
    )
    return shard_fn(params['gate'], params['w1'], params['w2'], x)


def shard_moe_params(params, mesh: Mesh, axis: str = 'ep'):
    """Place expert stacks so each device holds only its experts."""
    ep_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return {
        'gate': jax.device_put(params['gate'], rep),
        'w1': jax.device_put(params['w1'], ep_sh),
        'w2': jax.device_put(params['w2'], ep_sh),
    }
