"""Fused sub-byte (GGUF Q4/Q8) dequant-matmul for TPU.

The reference executes GGUF-quantized models without ever materializing
float weights (src/packed_tensor.rs:96 + QuantMatMul in
src/symbolic_graph/ops/mod.rs) — this is the TPU equivalent. Weights
stay packed in HBM (0.5 B/weight for Q4 + 0.125 B of scales/offsets vs
2 B for bf16: a 3.2x HBM-byte reduction on the weight stream that
bounds batch<~64 decode), tiles are DMA'd to VMEM, nibbles unpack
in-register on the VPU, and the dequantized tile feeds the MXU.

Device layout (host-repacked once at load, `repack_packed_tensor`):
  q_u8    (K//2, N) uint8 — nibble-packed 4-bit values; row k2 packs
          original row k2 (low nibble) and row k2 + K//2 (high nibble),
          so the kernel rebuilds W with one concat (no interleave).
  scales  (K//32, N) f32 — per-32-row-block scale
  offsets (K//32, N) f32 — per-32-row-block offset
  with W[k, n] = q[k, n] * scales[k // G, n] - offsets[k // G, n],
  G = the format's scale-group width (32 for classic GGUF blocks, 16
  for Q2_K/Q3_K/Q6_K sub-scales, 128 for GPTQ/AWQ groups, 256 Q8_K).
  This single affine form covers EVERY GGUF format (_block_affine):
  Q4_0/Q4_1/Q4_K/Q2_K/Q3_K pack as nibbles (bits=4); Q5_0/Q5_1/Q5_K/
  Q6_K store their 5-6-bit values as int8 (bits=8 — 1 B/weight on
  device, still 2x under bf16, zero per-element bit surgery in the
  kernel); Q8_0/Q8_1/Q8_K keep int8 rows with offsets statically
  elided (has_off=False).

Bit-fidelity: the repack is exact (integer nibbles + f16->f32 scale
conversion identical to backends/cpu/dequant.py), verified bitwise in
tests/test_packed_matmul.py; the matmul itself accumulates in f32.

Measured (1x v5e, 4096x4096 weights, M=64, 8-layer chain device-looped):
~102 us/matmul for Q4_0 vs ~97 us for the XLA dense bf16 matmul — equal
speed at 2.67x fewer HBM weight bytes. The win this buys today is HBM
CAPACITY (an 8B Q4 model fits one 16 GB chip with room for KV) and the
host-RAM/load-time savings; the bandwidth headroom is not yet realized
as throughput because the kernel is VPU-relayout-bound (nibble unpack +
per-32-row scale expansion), not HBM-bound, at these shapes.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ...packed_format import PackedFormat

_ENABLED = os.environ.get("WT_PALLAS_QUANT_MATMUL", "1") != "0"

TILE_N = 128


def _f16_to_f32(u8pair: np.ndarray) -> np.ndarray:
    return u8pair.copy().view(np.float16).astype(np.float32)


def _q4_block_values(raw: np.ndarray, fmt: PackedFormat):
    """raw (nb, block_bytes) -> (nibbles (nb, bs) uint8 in 0..15,
    scales (nb, bs//32) f32, offsets (nb, bs//32) f32)."""
    if fmt == PackedFormat.Q4_0:
        d = _f16_to_f32(raw[:, 0:2])                      # (nb, 1)
        q = raw[:, 2:18]
        nib = np.concatenate([q & 0x0F, q >> 4], axis=1)  # (nb, 32)
        return nib, d, 8.0 * d
    if fmt == PackedFormat.Q4_1:
        d = _f16_to_f32(raw[:, 0:2])
        m = _f16_to_f32(raw[:, 2:4])
        q = raw[:, 4:20]
        nib = np.concatenate([q & 0x0F, q >> 4], axis=1)
        return nib, d, -m
    if fmt == PackedFormat.Q4_K:
        from ..cpu.dequant import _unpack_k_scales

        d = _f16_to_f32(raw[:, 0:2])
        dmin = _f16_to_f32(raw[:, 2:4])
        sc, mn = _unpack_k_scales(raw[:, 4:16])           # (nb, 8)
        qs = raw[:, 16:144]
        l = np.arange(256)
        byte_idx = 32 * (l // 64) + (l % 32)
        shift = 4 * ((l % 64) // 32)
        nib = ((qs[:, byte_idx] >> shift) & 0x0F)         # (nb, 256)
        return nib, d * sc, dmin * mn
    raise ValueError(f"unsupported 4-bit format {fmt}")


def _q5_bits(raw: np.ndarray, qh_off: int, qs_off: int):
    """Shared Q5_0/Q5_1 5-bit reconstruction -> (nb, 32) ints 0..31."""
    qh = raw[:, qh_off:qh_off + 4].copy().view("<u4").astype(np.uint32)
    q = raw[:, qs_off:qs_off + 16]
    lo = (q & 0x0F).astype(np.int32)
    hi = (q >> 4).astype(np.int32)
    idx = np.arange(16, dtype=np.uint32)
    h_lo = ((qh >> idx) & 1).astype(np.int32) << 4
    h_hi = ((qh >> (idx + 16)) & 1).astype(np.int32) << 4
    return np.concatenate([lo | h_lo, hi | h_hi], axis=1)


def _block_affine(raw: np.ndarray, fmt: PackedFormat):
    """Any GGUF block format -> the kernel's uniform affine form:
    (vals (nb, bs) ints >= 0, scales (nb, n_groups) f32, offsets
    (nb, n_groups) f32, bits) with W = vals * scale - offset per
    (bs // n_groups)-element group. 4-bit-storable formats (vals
    0..15) return bits=4 (nibble-packed in HBM); wider vals return
    bits=8 (int8 in HBM — Q5/Q6 spend 1 B/weight on device, still
    2x under bf16, in exchange for zero per-element bit surgery in
    the kernel)."""
    from ..cpu.dequant import _unpack_k_scales

    if fmt in (PackedFormat.Q4_0, PackedFormat.Q4_1, PackedFormat.Q4_K):
        nib, sc, off = _q4_block_values(raw, fmt)
        return nib, sc, off, 4
    if fmt == PackedFormat.Q5_0:
        d = _f16_to_f32(raw[:, 0:2])
        return _q5_bits(raw, 2, 6), d, 16.0 * d, 8
    if fmt == PackedFormat.Q5_1:
        d = _f16_to_f32(raw[:, 0:2])
        m = _f16_to_f32(raw[:, 2:4])
        return _q5_bits(raw, 4, 8), d, -m, 8
    if fmt == PackedFormat.Q8_1:
        d = _f16_to_f32(raw[:, 0:2])
        q = raw[:, 4:36].copy().view(np.int8).astype(np.int32)
        return q, d, np.zeros_like(d), 8
    if fmt == PackedFormat.Q2_K:
        sc_raw = raw[:, 0:16]
        qs = raw[:, 16:80]
        d = _f16_to_f32(raw[:, 80:82])
        dmin = _f16_to_f32(raw[:, 82:84])
        l = np.arange(256)
        q = ((qs[:, 32 * (l // 128) + (l % 32)]
              >> (2 * ((l % 128) // 32))) & 3).astype(np.int32)
        sc = (sc_raw & 0x0F).astype(np.float32)         # (nb, 16)
        mn = (sc_raw >> 4).astype(np.float32)
        return q, d * sc, dmin * mn, 4
    if fmt == PackedFormat.Q3_K:
        hmask = raw[:, 0:32]
        qs = raw[:, 32:96]
        s = raw[:, 96:108].astype(np.uint8)
        d = _f16_to_f32(raw[:, 108:110])
        sc = np.empty(raw.shape[:1] + (16,), dtype=np.int8)
        for j in range(16):
            low = (s[:, j] & 0x0F) if j < 8 else (s[:, j - 8] >> 4)
            hi = (s[:, 8 + (j % 4)] >> (2 * (j // 4))) & 3
            sc[:, j] = ((low | (hi << 4)).astype(np.int8)) - 32
        l = np.arange(256)
        q2 = ((qs[:, 32 * (l // 128) + (l % 32)]
               >> (2 * ((l % 128) // 32))) & 3).astype(np.int32)
        hbit = ((hmask[:, l % 32] >> (l // 32)) & 1).astype(np.int32)
        # value = d*sc*(q2 + 4*hbit - 4): store u = q2|(hbit<<2) in
        # 0..7 (nibble) with offset 4*d*sc
        u = q2 | (hbit << 2)
        ds = d * sc.astype(np.float32)
        return u, ds, 4.0 * ds, 4
    if fmt == PackedFormat.Q5_K:
        d = _f16_to_f32(raw[:, 0:2])
        dmin = _f16_to_f32(raw[:, 2:4])
        sc, mn = _unpack_k_scales(raw[:, 4:16])
        qh = raw[:, 16:48]
        qs = raw[:, 48:176]
        l = np.arange(256)
        lo = ((qs[:, 32 * (l // 64) + (l % 32)]
               >> (4 * ((l % 64) // 32))) & 0x0F).astype(np.int32)
        hbit = ((qh[:, l % 32] >> (l // 32)) & 1).astype(np.int32) << 4
        return lo | hbit, d * sc, dmin * mn, 8
    if fmt == PackedFormat.Q6_K:
        ql = raw[:, 0:128]
        qh = raw[:, 128:192]
        sc = raw[:, 192:208].copy().view(np.int8).astype(np.float32)
        d = _f16_to_f32(raw[:, 208:210])
        l = np.arange(256)
        half, lh = l // 128, l % 128
        lo = ((ql[:, 64 * half + (lh % 64)]
               >> (4 * (lh // 64))) & 0x0F).astype(np.int32)
        hi = ((qh[:, 32 * half + (lh % 32)]
               >> (2 * (lh // 32))) & 3).astype(np.int32)
        # value = d*sc*((lo|hi<<4) - 32)
        ds = d * sc
        return lo | (hi << 4), ds, 32.0 * ds, 8
    if fmt == PackedFormat.Q8_K:
        d = raw[:, 0:4].copy().view("<f4").astype(np.float32)
        q = raw[:, 4:260].copy().view(np.int8).astype(np.int32)
        return q, d, np.zeros_like(d), 8
    raise ValueError(f"unsupported format {fmt}")


SUPPORTED_4BIT = (PackedFormat.Q4_0, PackedFormat.Q4_1, PackedFormat.Q4_K,
                  PackedFormat.Q2_K, PackedFormat.Q3_K)
SUPPORTED = SUPPORTED_4BIT + (
    PackedFormat.Q8_0, PackedFormat.Q5_0, PackedFormat.Q5_1,
    PackedFormat.Q8_1, PackedFormat.Q5_K, PackedFormat.Q6_K,
    PackedFormat.Q8_K)


def repack_packed_tensor(pt) -> Optional[Dict[str, np.ndarray]]:
    """PackedTensor in GGUF orientation (N, K), blocks along K, used as
    a matmul RHS after transpose -> TPU device arrays for the fused
    kernel operating on W = dequant(pt).T of shape (K, N).

    Returns None when the format/shape isn't kernel-eligible (caller
    falls back to host dequantization)."""
    if len(pt.shape) != 2:
        return None
    fmt = pt.fmt
    if fmt not in SUPPORTED:
        return None
    N, K = pt.shape                    # GGUF orientation
    bs = fmt.block_size
    if K % max(bs, 64) or K % 64:
        return None
    raw = np.frombuffer(pt.data, dtype=np.uint8).reshape(-1, fmt.block_bytes)

    if fmt == PackedFormat.Q8_0:
        d = _f16_to_f32(raw[:, 0:2])                       # (nb, 1)
        q = raw[:, 2:34].copy().view(np.int8)              # (nb, 32)
        q_kn = q.reshape(N, K).T.copy()                    # (K, N) int8
        s_kn = d.reshape(N, K // 32).T.copy()              # (K//32, N)
        return {"q": q_kn, "scales": s_kn,
                "offsets": np.zeros_like(s_kn), "bits": np.int8(8),
                "has_off": np.bool_(False)}

    vals, sc, off, bits = _block_affine(raw, fmt)
    n_groups = max(sc.shape[1], off.shape[1])
    gw = bs // n_groups                # K-group width (32, or 16 K-quant)
    vals_kn = vals.reshape(N, K).T                         # (K, N) ints

    # sc/off are (nb, 1) or (nb, n_groups): expand to one value per
    # gw-element K-group, then lay out (K//gw, N)
    def expand(a):
        a = np.broadcast_to(a, (a.shape[0], n_groups))
        return np.ascontiguousarray(
            a.reshape(N, K // gw).T.astype(np.float32))    # (K//gw, N)

    s_kn = expand(sc)
    o_kn = expand(off)
    has_off = bool(np.any(o_kn))
    if bits == 8:
        return {"q": vals_kn.astype(np.int8).copy(), "scales": s_kn,
                "offsets": o_kn, "bits": np.int8(8),
                "has_off": np.bool_(has_off)}
    half = K // 2
    q_u8 = (vals_kn[:half] | (vals_kn[half:] << 4)).astype(np.uint8).copy()
    return {"q": q_u8, "scales": s_kn, "offsets": o_kn, "bits": np.int8(4),
            "has_off": np.bool_(has_off)}


def dequant_repacked(rp: Dict[str, np.ndarray]) -> np.ndarray:
    """Reference dequantization of the REPACKED layout (numpy, f32) —
    the oracle the kernel and its jnp fallback are checked against.
    Must equal backends.cpu.dequant.dequantize_blocks(...).T exactly.

    The K-group size is carried by the shapes: g = K / scales.shape[0]
    (32 for GGUF blocks; 64/128 for GPTQ/AWQ groups)."""
    bits = int(rp["bits"])
    K = rp["q"].shape[0] * (2 if bits == 4 else 1)
    g = K // rp["scales"].shape[0]
    s = np.repeat(rp["scales"], g, axis=0)
    o = np.repeat(rp["offsets"], g, axis=0)
    if bits == 8:
        return rp["q"].astype(np.float32) * s - o
    q = rp["q"]
    nib = np.concatenate([q & 0x0F, q >> 4], axis=0).astype(np.float32)
    return nib * s - o


def packed_matmul_usable(q: np.ndarray) -> bool:
    if not _ENABLED:
        return False
    try:
        import jax

        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    return q.shape[-1] % TILE_N == 0


def packed_matmul(x, q, scales, offsets, bits: int,
                  has_off: bool = True):
    """x (..., K) bf16/f32 @ dequant(q, scales, offsets) (K, N).

    Pallas kernel on TPU; jnp fallback elsewhere (identical math).
    has_off=False statically elides the offset subtraction (Q8_0 /
    int8 layouts whose offsets are all zero)."""
    import jax
    import jax.numpy as jnp

    lead = x.shape[:-1]
    K = x.shape[-1]
    N = q.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    # large-M (prefill) calls route to XLA: the (TM, K) x-blocks plus
    # the dequantized f32 tile blow scoped VMEM at large K, and the
    # kernel's advantage (packed HBM weight stream) only matters at
    # decode M (see quant_matmul.py)
    if M > 512 or not packed_matmul_usable(q):
        w = _dequant_jnp(q, scales, offsets, bits, K, has_off)
        out = jnp.dot(x2.astype(jnp.float32), w,
                      preferred_element_type=jnp.float32)
        return out.astype(x.dtype).reshape(*lead, N)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Kq = K if bits == 8 else K // 2
    G = K // scales.shape[0]       # K-group size (32 GGUF, 128 GPTQ/AWQ)
    Kg = scales.shape[0]
    qbytes = Kq * N
    # tile over M too (see quant_matmul.py): big-M prefill x-blocks
    # otherwise exceed the 16 MB scoped-VMEM budget
    TM = M if M <= 128 else next(
        t for t in (128, 64, 32, 16, 8, 4, 2, 1) if M % t == 0)

    # split-dot + offset-fold (r4 probe winner, shipped r5): the nibble
    # concat was a sublane relayout of the whole (K, TN) tile, and the
    # per-element offset subtract doubled the VPU work. Instead
    #   x @ W = x_lo @ (nib_lo * s_lo) + x_hi @ (nib_hi * s_hi)
    #           - xg @ o,   xg[m, g] = sum_{k in group g} x[m, k]
    # (exact in f32 up to summation order; the fold turns K*TN offset
    # ops into one (TM, Kg) @ (Kg, TN) MXU side-dot). Measured at the
    # 8B FFN decode shape (M=32, K=4096, N=14336): 324.6 us vs 397
    # shipped-r4 vs 365 int8 (scripts/q4mm_probe.py a2, TN=256).
    split = Kg % 2 == 0 and N % 256 == 0 and (bits == 4 or has_off)
    TN = 256 if split else TILE_N

    if split:
        half = K // 2

        def kernel(x_ref, xg_ref, q_ref, s_ref, o_ref, out_ref):
            xf = x_ref[:].astype(jnp.float32)
            if bits == 4:
                # Mosaic has no u8 shifts or u8->f32 casts: widen to
                # i32 first (HBM traffic is still the packed u8 tile)
                qi = q_ref[:].astype(jnp.int32)          # (K//2, TN)
                s_lo = jnp.repeat(s_ref[:Kg // 2], G, axis=0)
                s_hi = jnp.repeat(s_ref[Kg // 2:], G, axis=0)
                w_lo = (qi & 0x0F).astype(jnp.float32) * s_lo
                w_hi = (qi >> 4).astype(jnp.float32) * s_hi
                acc = jax.lax.dot_general(
                    xf[:, :half], w_lo,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc += jax.lax.dot_general(
                    xf[:, half:], w_hi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                # int8 layouts with offsets (Q5/Q6): only the fold
                w = q_ref[:].astype(jnp.float32) * jnp.repeat(
                    s_ref[:], G, axis=0)
                acc = jax.lax.dot_general(
                    xf, w, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc -= jax.lax.dot_general(
                xg_ref[:], o_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[:] = acc.astype(out_ref.dtype)

        xg = x2.astype(jnp.float32).reshape(M, Kg, G).sum(-1)
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kernel,
                grid=(N // TN, M // TM),
                in_specs=[
                    pl.BlockSpec((TM, K), lambda j, i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TM, Kg), lambda j, i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kq, TN), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TM, TN), lambda j, i: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
                cost_estimate=pl.CostEstimate(
                    flops=2 * M * K * N,
                    bytes_accessed=M * K * 2 + qbytes + Kg * N * 8
                    + M * N * 2,
                    transcendentals=0),
            )(x2, xg, q, scales, offsets)
        return out.reshape(*lead, N)

    def kernel(x_ref, q_ref, s_ref, o_ref, out_ref):
        s = jnp.repeat(s_ref[:], G, axis=0)                # (K, TN)
        if bits == 8:
            w = q_ref[:].astype(jnp.float32) * s
            if has_off:
                w = w - jnp.repeat(o_ref[:], G, axis=0)
        else:
            # odd-Kg / non-256-N fallback: widen + concat (see split
            # path above for the preferred formulation)
            qi = q_ref[:].astype(jnp.int32)                # (K//2, TN)
            nib = jnp.concatenate([qi & 0x0F, qi >> 4], axis=0)
            w = nib.astype(jnp.float32) * s - jnp.repeat(
                o_ref[:], G, axis=0)
        # dot in f32 (operands dequantized on the VPU). Casting w to
        # bf16 for the MXU was tried and measured 3x SLOWER (Mosaic
        # inserts (8,128)->(16,128) relayouts for the cast) with a much
        # longer compile; the f32 dot wins at decode's small M.
        acc = jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(N // TN, M // TM),
            in_specs=[
                pl.BlockSpec((TM, K), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kq, TN), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kg, TN), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kg, TN), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * N,
                bytes_accessed=M * K * 2 + qbytes + Kg * N * 8
                + M * N * 2,
                transcendentals=0),
        )(x2, q, scales, offsets)
    return out.reshape(*lead, N)


def _dequant_jnp(q, scales, offsets, bits: int, K: int,
                 has_off: bool = True):
    import jax.numpy as jnp

    g = K // scales.shape[0]
    s = jnp.repeat(scales, g, axis=0)
    if bits == 8:
        w = q.astype(jnp.float32) * s
        return w - jnp.repeat(offsets, g, axis=0) if has_off else w
    nib = jnp.concatenate([q & 0x0F, q >> 4], axis=0).astype(jnp.float32)
    return nib * s - jnp.repeat(offsets, g, axis=0)
