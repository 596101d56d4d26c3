"""Ragged per-row KV-cache write (Pallas TPU kernel).

The continuous batcher's decode step writes each row's fresh K/V at
that ROW'S OWN position (pos_per_row). XLA lowers the vmapped
DynamicUpdateSlice to a masked select over the full cache — every step
rewrites all B*H*L*D cache elements, which measured as the dominant
pos_per_row overhead vs the offline scalar-pos program (chunk 6.44 vs
scalar 4.31 ms/step at B=32/8-layers on v5e).

This kernel touches ONLY the written slabs: the cache stays in HBM
(ANY memory space, input/output-aliased so the donated buffer is
updated in place) and a per-row strided DMA copies each (H, 1, D) slab
directly to [b, :, pos[b], :] — per-step cache-write traffic drops
from B*H*L*D to B*H*D elements (L x less).

Reference analog: the hand-kernel tier of the reference's Vulkan
backend (src/backends/vulkan_backend/), applied to the serving hot
path.
"""

from __future__ import annotations

import functools
import os

import numpy as np


@functools.lru_cache(maxsize=None)
def _build(B, H, L, D, S, cache_dt, upd_dt):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = 8  # HBM sublane tile: L-slices must be 8-aligned

    def kernel(pos_ref, upd_ref, cache_ref, out_ref, scratch, sem):
        def body(b, carry):
            # explicit lax int32 arithmetic: mixed/weak-typed scalar
            # ops recurse in the Mosaic convert helper under x64
            p = pos_ref[b]
            t = jnp.int32(TILE)
            p0 = jax.lax.mul(jax.lax.div(p, t), t)
            pull = pltpu.make_async_copy(
                out_ref.at[b, :, pl.ds(p0, TILE), :], scratch, sem)
            pull.start()
            pull.wait()
            # overwrite row (p - p0) of the tile with this row's K/V
            hit = (jax.lax.broadcasted_iota(jnp.int32, (1, TILE, 1), 1)
                   == jax.lax.sub(p, p0))
            scratch[...] = jnp.where(hit, upd_ref[b][:, None, :],
                                     scratch[...])
            push = pltpu.make_async_copy(
                scratch, out_ref.at[b, :, pl.ds(p0, TILE), :], sem)
            push.start()
            push.wait()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), body,
                          jnp.int32(0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # update (B,H,D)
            pl.BlockSpec(memory_space=pltpu.ANY),   # cache (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((H, 8, D), cache_dt),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), cache_dt),
        input_output_aliases={2: 0},  # cache operand -> output
    )


def ragged_kv_write_usable(data, update, start) -> bool:
    """True when the Pallas ragged write handles this shape on TPU."""
    if os.environ.get("WT_RAGGED_KV", "1") == "0":
        return False
    try:
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:  # noqa: BLE001
        return False
    if data.ndim != 4 or update.ndim != 4:
        return False
    if update.dtype != data.dtype:
        return False  # the DMA is a raw copy; no cast on the way
    B, H, L, D = data.shape
    S = update.shape[2]
    return D % 128 == 0 and S == 1 and update.shape[0] == B \
        and update.shape[1] == H and L % 8 == 0 \
        and np.dtype(data.dtype).itemsize in (2, 4)


def ragged_kv_write(data, update, start):
    """data (B,H,L,D), update (B,H,S,D), start (B,) -> updated cache.
    Each row b takes update[b] at [.., start[b]:start[b]+S, ..]."""
    import jax.numpy as jnp

    import jax

    B, H, L, D = data.shape
    S = update.shape[2]
    fn = _build(B, H, L, D, S, data.dtype, update.dtype)
    # trace the kernel outside x64 mode: under jax_enable_x64 the
    # pallas_call machinery emits i64 index types Mosaic won't legalize
    # ("failed to legalize func.func"); every operand dtype here is
    # x64-independent (bf16/f32 + explicit int32) so semantics match
    pos32 = start.astype(jnp.int32)
    upd = update.reshape(B, H, D)
    with jax.enable_x64(False):
        return fn(pos32, upd, data)
