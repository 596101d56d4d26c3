"""Ring attention: exact attention over a sequence sharded across mesh
devices (context parallelism).

Net-new vs the reference (SURVEY.md §2.6/§7 phase 8). Queries stay
resident on their shard; K/V blocks rotate around the ring via
jax.lax.ppermute while each device maintains flash-style online-softmax
statistics (running max m, normalizer l, accumulator acc) — so the
result is bit-comparable to full attention, with O(S/N) memory per
device and compute overlapped with ICI transfers by XLA.

Usage: wrap inside shard_map over the sequence axis; see
ring_attention_sharded for the packaged version.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np


def _online_update(acc, m, l, s, v):
    """One flash-attention statistics update with new scores s (..., q, k)
    and values v (..., k, d)."""
    import jax.numpy as jnp

    m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
    # guard fully-masked blocks
    m_safe = jnp.where(jnp.isinf(m_new), 0.0, m_new)
    p = jnp.exp(s - m_safe)
    p = jnp.where(jnp.isinf(m_new), 0.0, p)
    alpha = jnp.exp(jnp.where(jnp.isinf(m), -jnp.inf, m) - m_safe)
    alpha = jnp.where(jnp.isinf(m), 0.0, alpha)
    l_new = l * alpha + p.sum(axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum("...qk,...kd->...qd",
                                       p.astype(v.dtype), v,
                                       preferred_element_type=jnp.float32)
    return acc_new, m_new, l_new


def ring_attention(q, k, v, axis_name: str, scale: Optional[float] = None,
                   causal: bool = False):
    """q,k,v: per-shard (B, H, S_local, D) inside shard_map over
    `axis_name`. Returns the per-shard attention output."""
    import jax
    import jax.numpy as jnp

    B, H, S, D = q.shape
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    scale = scale if scale is not None else D ** -0.5

    qf = q.astype(jnp.float32) * scale
    # mark the running statistics as axis-varying so the fori_loop carry
    # type stays stable under shard_map
    acc = jax.lax.pvary(jnp.zeros((B, H, S, v.shape[-1]), jnp.float32),
                        axis_name)
    m = jax.lax.pvary(jnp.full((B, H, S, 1), -jnp.inf, jnp.float32), axis_name)
    l = jax.lax.pvary(jnp.zeros((B, H, S, 1), jnp.float32), axis_name)

    def body(step, carry):
        acc, m, l, kv = carry
        kb, vb = kv
        src = (idx - step) % n          # which shard this kv block came from
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kb.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        if causal:
            q_pos = idx * S + jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            k_pos = src * S + jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            s = jnp.where((q_pos >= k_pos)[None, None], s, -jnp.inf)
        acc, m, l = _online_update(acc, m, l, s, vb)
        # rotate kv to the next device (skip after the final block)
        kb = jax.lax.ppermute(kb, axis_name,
                              [(i, (i + 1) % n) for i in range(n)])
        vb = jax.lax.ppermute(vb, axis_name,
                              [(i, (i + 1) % n) for i in range(n)])
        return acc, m, l, (kb, vb)

    acc, m, l, _ = jax.lax.fori_loop(0, n, body, (acc, m, l, (k, v)))
    denom = jnp.where(l == 0.0, 1.0, l)
    return (acc / denom).astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh, seq_axis: str = "sp",
                           scale: Optional[float] = None,
                           causal: bool = False):
    """Full arrays in, full arrays out: shards the sequence dim over
    `seq_axis` and runs ring attention under shard_map."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(None, None, seq_axis, None)

    @partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
             out_specs=spec)
    def run(ql, kl, vl):
        return ring_attention(ql, kl, vl, seq_axis, scale=scale, causal=causal)

    return run(q, k, v)
