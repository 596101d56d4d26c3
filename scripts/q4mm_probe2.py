"""Q4 dequant-matmul probe, round 2 (see q4mm_probe.py for round 1).

Round-1 findings at M=32, K=4096, N=14336 (llama-8B FFN decode shape):
  dense bf16 XLA 314 us; shipped Q4 kernel 397; split-dot 328;
  offset-fold+TN256 324.6; byte-planar i8 369; i8 bit-ops crash Mosaic.
Everything clusters 310-400 us — VPU-op-bound (the ideal Q4 stream is
54 us), and even dense XLA is 2.2x off the HBM roofline.

Round-2 variants:
  p0   dense bf16 PALLAS kernel — can a handwritten kernel beat XLA's
       314 us at decode M? (if yes, every decode matmul in the stack
       should route through it)
  p1   bf16-PAIR packing: host packs v = lo + 16*hi as an exact bf16
       value (<=255). Kernel: one bf16->f32 upcast, then
       hi = floor(v/16), lo = v - 16*hi — pure FP math, NO integer
       relayouts. ~4 VPU ops/element vs ~7 for the shipped kernel.
       1 B/weight HBM (vs 0.5 packed, 2 dense).
  p2   p1 with ALL-bf16 math + bf16 dot (approximate: bf16 scale
       rounding) — the speed endpoint if exactness is relaxed.
  p4   native int4 (fixed from round 1): Mosaic-side i4->f32 cast,
       0.5 B/weight. Offsets folded into o' = o - 8s at repack.
  p5   int8 weights + i8->bf16 cast + bf16 dot — the SHIPPED int8
       kernel's shape, same harness, for cross-family comparison.

Usage: python scripts/q4mm_probe2.py [M] [K] [N]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from whisper_tensor_tpu.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

M = int(sys.argv[1]) if len(sys.argv) > 1 else 32
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
N = int(sys.argv[3]) if len(sys.argv) > 3 else 14336
L = 8
R = 20
G = 32
Kg = K // G
half = K // 2
QBYTES = K * N // 2 + Kg * N * 8

rng = np.random.default_rng(0)
x0_np = rng.standard_normal((M, K), dtype=np.float32)
x0 = jnp.asarray(x0_np, dtype=jnp.bfloat16)

nib_np = rng.integers(0, 16, (K, N), dtype=np.uint8)
s_np = (rng.standard_normal((Kg, N), dtype=np.float32) * 0.01)
o_np = 8.0 * np.repeat(np.abs(s_np).mean(axis=0, keepdims=True), Kg, axis=0)
w_ref = (nib_np.astype(np.float32) * np.repeat(s_np, G, axis=0)
         - np.repeat(o_np, G, axis=0))

w_bf16 = jnp.asarray(w_ref, dtype=jnp.bfloat16)
s_dev = jnp.asarray(s_np)
o_dev = jnp.asarray(o_np)

# p1: bf16 pair packing — v[k2, n] = nib[k2, n] + 16 * nib[k2 + K/2, n]
pair_np = (nib_np[:half].astype(np.float32)
           + 16.0 * nib_np[half:].astype(np.float32))
v_pair = jnp.asarray(pair_np, dtype=jnp.bfloat16)   # exact: ints <= 255
s_bf = jnp.asarray(s_np, dtype=jnp.bfloat16)
o_bf = jnp.asarray(o_np, dtype=jnp.bfloat16)

# p4: signed int4, offsets folded (w = q*s - o', q = nib - 8, o' = o - 8s)
q_i8_signed = jnp.asarray(nib_np.astype(np.int8) - 8)
o4_dev = jnp.asarray(o_np - 8.0 * s_np)
_i4 = []


def get_q_i4():
    if not _i4:
        arr = jax.jit(lambda a: a.astype(jnp.int4))(q_i8_signed)
        arr.block_until_ready()
        _i4.append(arr)
    return _i4[0]


# p5: int8 per-channel symmetric (different numerics — checked against
# its own reference)
amax = np.abs(w_ref).max(axis=0)
s8_np = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
w_i8_np = np.clip(np.round(w_ref / s8_np[None, :]), -127, 127).astype(np.int8)
w8_ref = w_i8_np.astype(np.float32) * s8_np[None, :]
w_i8 = jnp.asarray(w_i8_np)
s8_dev = jnp.asarray(s8_np.reshape(1, N))


def chain(step):
    def run(x):
        def body(_, x):
            for i in range(L):
                out = step(x, i)
                x = out[:, :K].astype(jnp.bfloat16)
            return x
        return jax.lax.fori_loop(0, R, body, x)
    return run


def timeit(name, step, bytes_per_mm, ref=None, tol=2e-2):
    try:
        f = jax.jit(chain(step))
        np.asarray(f(x0))  # warm + sync
        if ref is not None:
            one = np.asarray(jax.jit(lambda x: step(x, 0))(x0)).astype(
                np.float32)
            rel = np.abs(one - ref).max() / max(np.abs(ref).max(), 1e-9)
            assert rel < tol, f"{name}: rel err {rel}"
        t0 = time.time()
        np.asarray(f(x0))
        dt = (time.time() - t0) / R
        per_mm = dt / L * 1e6
        gbs = L * bytes_per_mm / dt / 1e9
        print(f"{name:44s} {per_mm:8.1f} us/matmul  {gbs:7.1f} GB/s(w)",
              flush=True)
        return per_mm
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None


REF = x0_np.astype(np.float32) @ w_ref
REF8 = x0_np.astype(np.float32) @ w8_ref


def full_block(TN):
    return [pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM)]


def out_spec(TN):
    return pl.BlockSpec((M, TN), lambda j: (0, j), memory_space=pltpu.VMEM)


def cost(q_bytes):
    return pl.CostEstimate(flops=2 * M * K * N,
                           bytes_accessed=M * K * 2 + q_bytes + M * N * 4,
                           transcendentals=0)


def p0(TN=256):
    """Dense bf16 pallas."""
    def kernel(x_ref, w_ref_, out_ref):
        out_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref_[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def step(x, i):
        return pl.pallas_call(
            kernel, grid=(N // TN,),
            in_specs=full_block(TN) + [
                pl.BlockSpec((K, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM)],
            out_specs=out_spec(TN),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            cost_estimate=cost(2 * K * N),
        )(x, w_bf16)
    return step


def p1(TN=256):
    """bf16-pair packed Q4: FP-only decode, f32 scales (exact)."""
    def kernel(x_ref, v_ref, s_ref, o_ref, out_ref):
        v = v_ref[:].astype(jnp.float32)          # (K/2, TN)
        hi = jnp.floor(v * 0.0625)
        lo = v - 16.0 * hi
        s_lo = jnp.repeat(s_ref[:Kg // 2], G, axis=0)
        s_hi = jnp.repeat(s_ref[Kg // 2:], G, axis=0)
        o_lo = jnp.repeat(o_ref[:Kg // 2], G, axis=0)
        o_hi = jnp.repeat(o_ref[Kg // 2:], G, axis=0)
        xf = x_ref[:].astype(jnp.float32)
        acc = jax.lax.dot_general(
            xf[:, :half], lo * s_lo - o_lo,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            xf[:, half:], hi * s_hi - o_hi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc

    def step(x, i):
        return pl.pallas_call(
            kernel, grid=(N // TN,),
            in_specs=full_block(TN) + [
                pl.BlockSpec((half, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kg, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kg, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM)],
            out_specs=out_spec(TN),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            cost_estimate=cost(K * N),
        )(x, v_pair, s_dev, o_dev)
    return step


def p2(TN=256):
    """bf16-pair, ALL-bf16 math + bf16 dot (approximate)."""
    def kernel(x_ref, v_ref, s_ref, o_ref, out_ref):
        v = v_ref[:]                                # bf16
        hi = jnp.floor(v * jnp.bfloat16(0.0625))
        lo = v - jnp.bfloat16(16.0) * hi
        s_lo = jnp.repeat(s_ref[:Kg // 2], G, axis=0)
        s_hi = jnp.repeat(s_ref[Kg // 2:], G, axis=0)
        o_lo = jnp.repeat(o_ref[:Kg // 2], G, axis=0)
        o_hi = jnp.repeat(o_ref[Kg // 2:], G, axis=0)
        acc = jax.lax.dot_general(
            x_ref[:, :half], lo * s_lo - o_lo,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            x_ref[:, half:], hi * s_hi - o_hi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc

    def step(x, i):
        return pl.pallas_call(
            kernel, grid=(N // TN,),
            in_specs=full_block(TN) + [
                pl.BlockSpec((half, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kg, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kg, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM)],
            out_specs=out_spec(TN),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            cost_estimate=cost(K * N),
        )(x, v_pair, s_bf, o_bf)
    return step


def p4(TN=256):
    """Native int4 weights, i4->f32 cast in-kernel."""
    def kernel(x_ref, q_ref, s_ref, o_ref, out_ref):
        s = jnp.repeat(s_ref[:], G, axis=0)
        o = jnp.repeat(o_ref[:], G, axis=0)
        w = q_ref[:].astype(jnp.float32) * s - o
        out_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    q = get_q_i4()

    def step(x, i):
        return pl.pallas_call(
            kernel, grid=(N // TN,),
            in_specs=full_block(TN) + [
                pl.BlockSpec((K, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kg, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kg, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM)],
            out_specs=out_spec(TN),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            cost_estimate=cost(K * N // 2),
        )(x, q, s_dev, o4_dev)
    return step


def p5(TN=256):
    """int8 weights, i8->bf16 cast + bf16 dot (shipped int8 kernel)."""
    def kernel(x_ref, q_ref, s_ref, out_ref):
        wb = q_ref[:].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            x_ref[:], wb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc * s_ref[:].astype(jnp.float32)

    def step(x, i):
        return pl.pallas_call(
            kernel, grid=(N // TN,),
            in_specs=full_block(TN) + [
                pl.BlockSpec((K, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TN), lambda j: (0, j),
                             memory_space=pltpu.VMEM)],
            out_specs=out_spec(TN),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            cost_estimate=cost(K * N),
        )(x, w_i8, s8_dev)
    return step


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  "
          f"M={M} K={K} N={N} L={L} R={R}", flush=True)
    print(f"(ideal @819GB/s — Q4: {QBYTES / 819e9 * 1e6:.1f} us, "
          f"pair-bf16: {K * N / 819e9 * 1e6:.1f} us, "
          f"dense: {2 * K * N / 819e9 * 1e6:.1f} us)\n", flush=True)

    for TN in (256, 512):
        timeit(f"p0 dense bf16 pallas TN={TN}", p0(TN), 2 * K * N, REF)
    for TN in (128, 256):
        timeit(f"p1 bf16-pair exact TN={TN}", p1(TN), K * N, REF)
    timeit("p2 bf16-pair all-bf16 TN=256", p2(256), K * N, REF, tol=5e-2)
    for TN in (128, 256):
        timeit(f"p4 native int4 TN={TN}", p4(TN), K * N // 2, REF)
    timeit("p5 int8 + bf16 dot TN=256", p5(256), K * N, REF8)


if __name__ == "__main__":
    main()
