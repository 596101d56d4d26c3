"""W8A8 re-probe at FUSED decode shapes (post fuse_parallel_matmuls).

The round-3 W8A8 probe (docs/performance.md) measured i8xi8->i32 MXU
dot only ~8% faster than the shipped W8A16 kernel (i8->bf16 cast +
bf16 dot) at M=32, K=4096, N=14336 — and concluded the decode-shape
kernel was bound by dispatch/dependency chain, not weight bytes. The
projection-fusion pass has since removed much of that fixed cost per
LAYER (3 fewer matmuls), so the per-matmul picture changes: if the
cast is the remaining wall, W8A8 should now separate from W8A16.

Variants (each chained L=8, fori_loop R=20, numerics checked):
  w0  dense bf16 XLA                      (reference)
  w1  W8A16 pallas: i8->bf16 cast + bf16 dot   (shipped int8 kernel)
  w2  W8A8 pallas: per-row dynamic activation quant OUTSIDE the
      kernel (XLA), i8 x i8 -> i32 MXU dot, rescale by row*col scales
  w3  w2 with the activation quant INSIDE the kernel
  at the fused shapes: qkv (K=4096,N=6144), gate+up (4096, 28672),
  down (14336, 4096), o (4096, 4096) — pass K N on the CLI.

Usage: python scripts/w8a8_probe.py [M] [K] [N]
"""

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
N = int(sys.argv[3]) if len(sys.argv) > 3 else 28672
L = 8
R = 20
TN = 256

rng = np.random.default_rng(0)
x0_np = rng.standard_normal((M, K), dtype=np.float32)
x0 = jnp.asarray(x0_np, dtype=jnp.bfloat16)
w_np = rng.standard_normal((K, N), dtype=np.float32) * 0.02
amax = np.abs(w_np).max(axis=0)
s_np = (amax / 127.0).astype(np.float32)
w_i8_np = np.clip(np.round(w_np / s_np[None, :]), -127, 127).astype(np.int8)
w_deq = w_i8_np.astype(np.float32) * s_np[None, :]

w_bf = jnp.asarray(w_deq, dtype=jnp.bfloat16)
w_i8 = jnp.asarray(w_i8_np)
s_dev = jnp.asarray(s_np.reshape(1, N))
REF = x0_np @ w_deq


def chain(step):
    def run(x):
        def body(_, x):
            for i in range(L):
                out = step(x)
                x = out[:, :K].astype(jnp.bfloat16)
            return x
        return jax.lax.fori_loop(0, R, body, x)
    return run


def timeit(name, step, tol=5e-2):
    try:
        f = jax.jit(chain(step))
        np.asarray(f(x0))
        one = np.asarray(jax.jit(step)(x0)).astype(np.float32)
        rel = np.abs(one - REF).max() / np.abs(REF).max()
        t0 = time.time()
        np.asarray(f(x0))
        per_mm = (time.time() - t0) / R / L * 1e6
        flag = "" if rel < tol else f"  !! rel err {rel:.3g}"
        print(f"{name:40s} {per_mm:8.1f} us/matmul{flag}", flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:110]}",
              flush=True)


def w0(x):
    return jnp.dot(x, w_bf, preferred_element_type=jnp.float32)


def w1(x):
    def kernel(x_ref, q_ref, s_ref, o_ref):
        wb = q_ref[:].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            x_ref[:], wb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = acc * s_ref[:]

    return pl.pallas_call(
        kernel, grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=M * K * 2 + K * N + N * 4,
            transcendentals=0),
    )(x, w_i8, s_dev)


def _quant_rows(x):
    xf = x.astype(jnp.float32)
    rmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    rs = jnp.where(rmax > 0, rmax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / rs), -127, 127).astype(jnp.int8)
    return xq, rs


def w2(x):
    xq, rs = _quant_rows(x)

    def kernel(xq_ref, rs_ref, q_ref, s_ref, o_ref):
        acc = jax.lax.dot_general(
            xq_ref[:], q_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = acc.astype(jnp.float32) * rs_ref[:] * s_ref[:]

    return pl.pallas_call(
        kernel, grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=M * K + K * N + N * 4,
            transcendentals=0),
    )(xq, rs, w_i8, s_dev)


def w3(x):
    def kernel(x_ref, q_ref, s_ref, o_ref):
        xf = x_ref[:].astype(jnp.float32)
        rmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        rs = jnp.where(rmax > 0, rmax / 127.0, 1.0)
        xq = jnp.clip(jnp.round(xf / rs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, q_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[:] = acc.astype(jnp.float32) * rs * s_ref[:]

    return pl.pallas_call(
        kernel, grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=M * K * 2 + K * N + N * 4,
            transcendentals=0),
    )(x, w_i8, s_dev)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  "
          f"M={M} K={K} N={N} L={L} R={R}", flush=True)
    print(f"(ideal i8 stream @819GB/s: {K * N / 819e9 * 1e6:.1f} us; "
          f"bf16: {2 * K * N / 819e9 * 1e6:.1f} us)\n", flush=True)
    timeit("w0 dense bf16 XLA", w0)
    timeit("w1 W8A16 (shipped int8 kernel)", w1)
    timeit("w2 W8A8, row-quant outside", w2)
    timeit("w3 W8A8, row-quant in-kernel", w3)


if __name__ == "__main__":
    main()
