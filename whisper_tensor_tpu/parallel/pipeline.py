"""Pipeline parallelism (pp axis): GPipe-style microbatched execution
over layer groups sharded across mesh devices.

Net-new vs the reference (SURVEY.md §2.6; mesh.py axis table). Layer
parameters are stacked on a leading L axis and sharded over `pp`, so
each device holds a contiguous group of layers. Microbatches flow
through the ring: at schedule step t, device d works on microbatch
t - d (bubble steps compute garbage that is masked out), then the
activation moves to device d+1 via jax.lax.ppermute over ICI. The whole
schedule is a lax.scan — one compiled program, no host round-trips.

Wall-clock model: M + P - 1 steps for M microbatches over P stages
(pipeline bubble fraction (P-1)/(M+P-1)).
"""

from __future__ import annotations

from functools import partial
from typing import Callable


def pipeline_apply(stage_fn: Callable, stacked_params, x, mesh,
                   axis: str = "pp", microbatches: int = 4,
                   param_specs=None, batch_axis: str = None):
    """Run x through all L stacked layers, layer groups sharded over
    `axis`.

    stage_fn(params_one_layer, h) -> h          (one layer)
    stacked_params: pytree with leading dim L (L % pp_size == 0)
    x: (B, ...) with B % microbatches == 0
    param_specs: optional pytree of PartitionSpecs for the NON-layer
        dims of each leaf (e.g. P(None, "tp") for a column-sharded
        weight) — the leading pp axis is prefixed automatically. When
        tp specs are given, stage_fn must contain the matching manual
        collectives (shard_map is manual-SPMD land).
    batch_axis: optional mesh axis (e.g. "dp") sharding the microbatch
        ROWS — composes data parallelism with the pipeline in one
        shard_map region.
    Returns the same result as sequentially applying all L layers.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    M = microbatches
    B = x.shape[0]
    assert B % M == 0, (B, M)
    mb = B // M
    xm = x.reshape(M, mb, *x.shape[1:])

    if param_specs is None:
        pspec = jax.tree.map(lambda _: P(axis), stacked_params)
    else:
        pspec = jax.tree.map(lambda s: P(axis, *tuple(s)), param_specs,
                             is_leaf=lambda s: isinstance(s, P))
    xspec = P(None, batch_axis, *([None] * (x.ndim - 1)))

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pspec, xspec), out_specs=xspec)
    def run(local_params, xm):
        n_dev = jax.lax.psum(1, axis)
        idx = jax.lax.axis_index(axis)
        T = M + n_dev - 1

        def group(h):
            # apply this device's local layer group (scan over layers)
            def body(h, p):
                return stage_fn(p, h), None
            h, _ = jax.lax.scan(body, h, local_params)
            return h

        def sched(carry, t):
            recv, out = carry
            # device 0 injects microbatch t (clamped index; bubbles are
            # masked), others consume what arrived from the left
            feed = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, M - 1), keepdims=False)
            h_in = jnp.where(idx == 0, feed, recv)
            h_out = group(h_in)
            # last device writes finished microbatch t-(P-1)
            slot = jnp.clip(t - (n_dev - 1), 0, M - 1)
            valid = (idx == n_dev - 1) & (t >= n_dev - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                out, h_out, slot, axis=0)
            out = jnp.where(valid, upd, out)
            # rotate activations to the next stage
            recv = jax.lax.ppermute(
                h_out, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)])
            return (recv, out), None

        init = (jax.lax.pvary(jnp.zeros_like(xm[0]), axis),
                jax.lax.pvary(jnp.zeros_like(xm), axis))
        (_, out), _ = jax.lax.scan(sched, init, jnp.arange(T))
        # only the last device holds real outputs; replicate via psum
        return jax.lax.psum(
            jnp.where(idx == n_dev - 1, out, jnp.zeros_like(out)), axis)

    out = run(stacked_params, xm)
    return out.reshape(B, *x.shape[1:])
