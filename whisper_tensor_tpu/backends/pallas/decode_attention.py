"""Ragged flash-DECODE attention (Pallas TPU kernel).

The serving decode step's attention reads the FULL KV window for every
row: q (B, Hq, 1, D) against cache k/v (B, Hkv, L, D) with an additive
mask hiding columns beyond each row's live position. XLA executes the
masked einsum over all B*Hkv*L*D cache elements — at 8B scale with a
2k window that is ~8.6 GB/step of HBM reads, on par with the entire
int8 weight stream, most of it masked-out garbage.

This kernel reads only each row's LIVE prefix: grid (B, Hkv, nb) with
the per-row key-block count derived from a scalar-prefetched position
vector. Out-of-range key blocks clamp their index map to the last live
block — consecutive grid steps that map to the same block skip the
copy (the documented Pallas revisiting optimization), so dead blocks
cost neither DMA nor (guarded by pl.when) compute. Per-step KV traffic
drops from B*Hkv*L*D to B*Hkv*ceil((pos+1)/BL)*BL*D elements.

Semantics match AttentionMilli's rank-1 mask extension: row b attends
keys j <= pos[b] (the cache slot the current token was just written
to), i.e. live length pos[b] + 1.

Reference analog: the hand-kernel tier of the reference's Vulkan
backend (src/backends/vulkan_backend/matmul.rs:755 — attention-shaped
dispatches), applied to the TPU serving hot path per VERDICT r3 #2.
"""

from __future__ import annotations

import functools
import os

import numpy as np


def _block_len(L: int) -> int:
    """Largest key-block <= 512 that divides L (multiple of 16)."""
    for bl in (512, 256, 128, 64, 32, 16):
        if L % bl == 0:
            return bl
    return 0


def ragged_decode_attention_usable(q, k, v, mask) -> bool:
    """True when the ragged decode kernel handles this call: TPU,
    single query step, rank-1 per-row position mask, lane-aligned head
    dim, bf16 KV, a window the block chooser can tile, and batch below
    the measured crossover.

    WT_RAGGED_ATTN: "0" off, "1" force on, unset = batch-gated AUTO.
    Measured inside the real serving chunk program (8-layer 8B,
    max_len=192, scripts/chunk_scaling_probe.py, r5): the kernel loses
    at large batch — 6.19 vs 5.26 ms/step at B=64 (+18%), 9.44 vs 7.85
    at 128 (+20%), 15.93 vs 10.81 at 256 (+47%) — its (B, nb) grid's
    per-step fixed cost scales with B while the DMA saving doesn't
    once only a few key blocks exist per row. At small batch it wins
    (serving A/B, N=8 mixed lengths: 1.146x end-to-end)."""
    env = os.environ.get("WT_RAGGED_ATTN", "")
    if env == "0":
        return False
    if env != "1" and q.shape[0] >= 64:
        return False
    try:
        import jax

        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:  # noqa: BLE001
        return False
    if mask is None or mask.ndim != 1:
        return False
    if q.ndim != 4 or q.shape[2] != 1:
        return False
    B, Hq, _, D = q.shape
    Hkv, L = k.shape[1], k.shape[2]
    if mask.shape[0] != B or k.shape[0] != B or v.shape != k.shape:
        return False
    if Hq % Hkv != 0 or D % 128 != 0 or D != v.shape[3]:
        return False
    if np.dtype(q.dtype) != np.dtype("bfloat16") or k.dtype != q.dtype:
        return False
    return _block_len(L) > 0


@functools.lru_cache(maxsize=None)
def _build(B, Hkv, rep, L, D, BL, scale, interpret):
    # Grid (B, nb) with ALL kv heads processed per step: the first cut
    # used grid (B, Hkv, nb) and its 2,048 grid steps of fixed
    # per-iteration cost swamped the DMA savings (measured 884 us even
    # at 3% live vs the 930 us dense baseline at B=32/L=2048). Fatter
    # steps amortize that cost ~Hkv x and make block-skipping visible.
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = L // BL
    rep_p = ((rep + 7) // 8) * 8  # f32 sublane tile

    def nvb(pos_b):
        # number of LIVE key blocks for a row at position pos_b
        live = jnp.minimum(pos_b, jnp.int32(L - 1)) + 1
        return jax.lax.div(live + jnp.int32(BL - 1), jnp.int32(BL))

    def kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref,
               l_ref):
        b, j = pl.program_id(0), pl.program_id(1)
        last = nvb(pos_ref[b]) - 1

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(j <= last)
        def _compute():
            col = j * BL + jax.lax.broadcasted_iota(
                jnp.int32, (rep_p, BL), 1)
            dead = col > pos_ref[b]
            for h in range(Hkv):    # static unroll: one MXU pass/head
                q_blk = q_ref[0, h].astype(jnp.float32) * scale
                k_blk = k_ref[0, h]                      # (BL, D)
                s = jax.lax.dot_general(
                    q_blk, k_blk.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (rep_p, BL)
                s = jnp.where(dead, -jnp.inf, s)
                m_prev = m_ref[h]
                m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1,
                                                    keepdims=True))
                m_safe = jnp.where(jnp.isinf(m_cur), 0.0, m_cur)
                p = jnp.exp(s - m_safe)
                p = jnp.where(jnp.isinf(s), 0.0, p)
                alpha = jnp.where(jnp.isinf(m_prev), 0.0,
                                  jnp.exp(m_prev - m_safe))
                l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=1,
                                                      keepdims=True)
                acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                    p.astype(v_ref.dtype), v_ref[0, h],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_ref[h] = m_cur

        @pl.when(j == nb - 1)
        def _epilogue():
            denom = jnp.where(l_ref[:] == 0.0, 1.0, l_ref[:])
            o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)

    def kv_map(b, j, pos):
        # clamp dead blocks to the last live one: the repeated index
        # skips the copy, so out-of-range blocks cost no DMA
        return (b, 0, jnp.minimum(j, nvb(pos[b]) - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, Hkv, rep_p, D), lambda b, j, pos:
                         (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, BL, D), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, BL, D), kv_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hkv, rep_p, D), lambda b, j, pos:
                               (b, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hkv, rep_p, D), jnp.float32),
            pltpu.VMEM((Hkv, rep_p, 1), jnp.float32),
            pltpu.VMEM((Hkv, rep_p, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, interpret=bool(interpret),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep_p, D),
                                       jnp.bfloat16))


def ragged_decode_attention(q, k, v, pos, scale: float,
                            interpret: bool = False):
    """q (B, Hq, 1, D) bf16; k/v (B, Hkv, L, D) bf16; pos (B,) int —
    row b attends keys 0..pos[b]. Returns (B, Hq, 1, D) bf16."""
    import jax
    import jax.numpy as jnp

    B, Hq, _, D = q.shape
    Hkv, L = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    BL = _block_len(L)
    rep_p = ((rep + 7) // 8) * 8
    qg = q.reshape(B, Hkv, rep, D)
    if rep_p != rep:
        qg = jnp.pad(qg, [(0, 0), (0, 0), (0, rep_p - rep), (0, 0)])
    fn = _build(B, Hkv, rep, L, D, BL, float(scale), interpret)
    # stay 32-bit in-kernel (Mosaic won't legalize i64 index maps)
    pos32 = jnp.clip(pos.astype(jnp.int32), 0, L - 1)
    with jax.enable_x64(False):
        out = fn(pos32, qg, k, v)
    return out[:, :, :rep, :].reshape(B, Hq, 1, D)
