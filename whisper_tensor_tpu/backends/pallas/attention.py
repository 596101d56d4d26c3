"""Pallas flash-attention kernel for TPU.

Replaces the materialized (B,H,Sq,Skv) score tensor with an online-
softmax tiled kernel (VMEM-resident tiles, MXU matmuls, f32 running
max/sum). Used by AttentionMilli.to_jax when applicable; the jnp
einsum-softmax path remains the fallback (and XLA's own fusion is
already decent at small sequence lengths).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

# enable/disable via env until broadly validated on hardware
_ENABLED = os.environ.get("WT_PALLAS_ATTENTION", "1") != "0"

# tile sizes (MXU-aligned)
BLOCK_Q = 128
BLOCK_K = 128


def flash_attention_usable(q, k, v, mask, softcap: float) -> bool:
    if not _ENABLED or mask is not None or softcap > 0:
        return False
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu",):
            return False
    except Exception:
        return False
    B, Hq, Sq, D = q.shape
    Hkv, Skv = k.shape[1], k.shape[2]
    if Hq != Hkv:  # GQA handled by caller reshape; keep kernel simple for now
        return False
    if v.shape[-1] != D:
        return False   # padding dispatch assumes Dv == D (see caller)
    if D % 128 != 0 and D not in (64,):
        # the caller CAN zero-pad odd head dims (WT_PALLAS_ATTENTION_PAD=1)
        # but measured on v5e the padded kernel loses to XLA's fused
        # attention at SD shapes (15.8 vs 27.6 step/s) — default off
        if os.environ.get("WT_PALLAS_ATTENTION_PAD", "0") != "1":
            return False
    if Sq < BLOCK_Q or Skv < BLOCK_K or Sq % BLOCK_Q or Skv % BLOCK_K:
        return False
    # bf16 only: the in-kernel MXU matmul uses default precision, which
    # is exact for bf16 inputs but ~1e-2 off the f32-HIGHEST oracle for
    # f32 inputs (measured on v5e).
    if np.dtype(q.dtype) != np.dtype("bfloat16"):
        return False
    return True


@functools.partial
def _noop(x):
    return x


def flash_attention(q, k, v, scale: float, causal: bool, interpret: bool = False):
    """q,k,v: (B, H, S, D). Returns (B, H, Sq, Dv)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Skv = k.shape[2]
    Dv = v.shape[3]
    grid = (B * H, Sq // BLOCK_Q)

    def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
        qi = pl.program_id(1)
        q_blk = q_ref[0].astype(jnp.float32) * scale  # (BLOCK_Q, D)

        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

        num_k = Skv // BLOCK_K

        def body(kj, _):
            k_blk = k_ref[0, pl.ds(kj * BLOCK_K, BLOCK_K), :]  # (BLOCK_K, D)
            v_blk = v_ref[0, pl.ds(kj * BLOCK_K, BLOCK_K), :]
            s = jax.lax.dot_general(
                q_blk, k_blk.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (BQ, BK)
            if causal:
                q_pos = qi * BLOCK_Q + jax.lax.broadcasted_iota(
                    jnp.int32, (BLOCK_Q, BLOCK_K), 0) + (Skv - Sq)
                k_pos = kj * BLOCK_K + jax.lax.broadcasted_iota(
                    jnp.int32, (BLOCK_Q, BLOCK_K), 1)
                s = jnp.where(q_pos >= k_pos, s, -jnp.inf)
            m_prev = m_ref[:]
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            # guard fully-masked rows
            m_safe = jnp.where(jnp.isinf(m_cur), 0.0, m_cur)
            p = jnp.exp(s - m_safe)
            p = jnp.where(jnp.isinf(m_cur), 0.0, p)
            alpha = jnp.exp(jnp.where(jnp.isinf(m_prev), -jnp.inf, m_prev) - m_safe)
            alpha = jnp.where(jnp.isinf(m_prev), 0.0, alpha)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = m_cur
            return 0

        if causal:
            # skip key blocks strictly above the diagonal
            max_kj = (qi * BLOCK_Q + BLOCK_Q + (Skv - Sq) + BLOCK_K - 1) // BLOCK_K
            max_kj = jnp.minimum(max_kj, num_k)
        else:
            max_kj = num_k
        jax.lax.fori_loop(0, max_kj, body, 0)
        denom = jnp.where(l_ref[:] == 0.0, 1.0, l_ref[:])
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)

    # Mosaic cannot legalize i64 index-map returns; stay 32-bit in-kernel.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, D), lambda bh, qi: (bh, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Skv, D), lambda bh, qi: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Skv, Dv), lambda bh, qi: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, Dv), lambda bh, qi: (bh, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, Sq, Dv), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((BLOCK_Q, Dv), jnp.float32),
                pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
                pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
            ],
        )(q.reshape(B * H, Sq, D), k.reshape(B * H, Skv, D),
          v.reshape(B * H, Skv, Dv))
    return out.reshape(B, H, Sq, Dv)
