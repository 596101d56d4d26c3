"""Fused int8-dequant matmul Pallas kernel.

TPU equivalent of the reference's QuantMatMul (symbolic op) + GGUF
quantized execution: weights live in HBM as int8 + per-output-channel
scales (half the bytes of bf16), tiles are DMA'd to VMEM, converted
in-register, and fed to the MXU — so memory-bound decode moves ~2x
fewer weight bytes per step. Oracle/XLA fallback path included.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np

_ENABLED = os.environ.get("WT_PALLAS_QUANT_MATMUL", "1") != "0"

TILE_N = 256


def quantize_int8(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: w (K, N) -> (w_i8 (K,N), scale (N,))."""
    w = np.asarray(w, dtype=np.float32)
    try:  # native C++ fast path (bit-identical; tested)
        from ...utils.native import native_quantize_int8

        res = native_quantize_int8(w)
        if res is not None:
            return res
    except ImportError:
        pass
    amax = np.abs(w).max(axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


def int8_matmul_usable(x, w_i8) -> bool:
    if not _ENABLED:
        return False
    try:
        import jax

        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    K, N = w_i8.shape[-2], w_i8.shape[-1]
    return N % TILE_N == 0 and K % 128 == 0


def select_tiles(M: int, N: int) -> Tuple[int, int]:
    """(TM, TN) for the kernel grid. TM caps the x block so prefill
    shapes stay inside scoped VMEM; TN=256 measured best at decode
    shapes (365 us vs 377-378 for 512/1024 at M=32, K=4096, N=14336
    on v5e) — wider tiles do NOT amortize per-tile costs, so keep the
    fixed tile and leave WT_QMM_TN as a shape-specific override."""
    TM = M if M <= 256 else next(
        t for t in (256, 128, 64, 32, 16, 8, 4, 2, 1) if M % t == 0)
    TN = int(os.environ.get("WT_QMM_TN", TILE_N))
    if N % TN:
        TN = TILE_N
    return TM, TN


def int8_matmul(x, w_i8, scale):
    """x (..., K) bf16/f32, w_i8 (K, N) int8, scale (N,) f32 -> (..., N).

    Pallas kernel when usable; jnp fallback otherwise (same math)."""
    import jax
    import jax.numpy as jnp

    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w_i8.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    # the kernel's win is DECODE (small M, weight-stream-bound); at
    # prefill M the (TM, K) x-blocks blow the 16 MB scoped-VMEM budget
    # for large-K layers (measured: M=2048, K=14336 OOMs at 21.25 MB)
    # and XLA's fused cast+dot is already compute-efficient there
    if M > 512 or not int8_matmul_usable(x, w_i8):
        out = jnp.dot(x2, w_i8.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        out = out * scale[None, :].astype(jnp.float32)
        return out.astype(x.dtype).reshape(*lead, N)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, s_ref, o_ref):
        xb = x_ref[:]                                   # (TM, K)
        wb = w_ref[:].astype(xb.dtype)                  # (K, TILE_N)
        acc = jax.lax.dot_general(
            xb, wb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)

    # tile over M too: a (M, K) x-block at prefill shapes (e.g. 512 x
    # 14336 bf16 = 14.7 MB) exceeds the 16 MB scoped-VMEM budget once
    # the weight tile joins it — decode's tiny M keeps one tile
    TM, TN = select_tiles(M, N)
    # Mosaic cannot legalize i64 index-map returns; keep the kernel
    # region in 32-bit mode even when the session enables x64.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(N // TN, M // TM),
            in_specs=[
                pl.BlockSpec((TM, K), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TN), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * N,
                bytes_accessed=M * K * 2 + K * N + N * 4 + M * N * 2,
                transcendentals=0),
        )(x2, w_i8, scale.reshape(1, N))
    return out.reshape(*lead, N)
