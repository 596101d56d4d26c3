"""On-chip microbench for the fused int8 dequant-matmul (llama-8B decode shape).

Decode-shape weight streaming is the llama8b bench's bottleneck
(~483 GB/s effective vs ~900 GB/s roofline). This probe times kernel
variants on the REAL chip to find the gap:

  v0  dense bf16 XLA matmul               (layout/BW reference)
  v1  XLA int8: dot(x, w_i8.astype(bf16)) * scale   (no Pallas)
  v1t XLA int8, weights stored (N, K) transposed
  v2  current Pallas kernel, w (K, N), grid over N
  v3  Pallas, w stored (N, K): contiguous 4 KB DMA bursts per tile row
  v4  v3 with TN=512 / 1024

Each variant chains L=8 matmuls (out[:, :K] feeds the next) inside one
jitted fori_loop of R iterations, synced with np.asarray — the only
reliable timing recipe through the axon tunnel.

Usage: python scripts/qmm_probe.py [M]   (default M=32)
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = int(sys.argv[1]) if len(sys.argv) > 1 else 32
K, N = 4096, 14336
L = 8          # chained layers
R = 20         # fori_loop repeats inside the jit
WBYTES = K * N  # int8 bytes per matmul

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32),
                 dtype=jnp.bfloat16)
ws8 = [jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int64),
                   dtype=jnp.int8) for _ in range(L)]
ws8_t = [jnp.asarray(np.ascontiguousarray(np.asarray(w).T)) for w in ws8]
wsbf = [w.astype(jnp.bfloat16) * 0.01 for w in ws8]
scales = [jnp.full((N,), 0.01, jnp.float32) for _ in range(L)]


def timeit(name, fn, *args, bytes_per_iter=L * WBYTES):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out)  # warm + sync
    t0 = time.time()
    out = f(*args)
    np.asarray(out)
    dt = (time.time() - t0) / R
    per_mm = dt / L * 1e6
    gbs = bytes_per_iter / dt / 1e9
    print(f"{name:34s} {per_mm:8.1f} us/matmul   {gbs:7.1f} GB/s(weights)")
    return per_mm


def chain(step):
    def run(x):
        def body(_, x):
            for i in range(L):
                out = step(x, i)
                x = out[:, :K].astype(jnp.bfloat16)
            return x
        return jax.lax.fori_loop(0, R, body, x)
    return run


# ---- XLA variants ----
def v0(x, i):
    return jnp.dot(x, wsbf[i], preferred_element_type=jnp.float32)


def v1(x, i):
    return (jnp.dot(x, ws8[i].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * scales[i])


def v1t(x, i):
    return (jax.lax.dot_general(
        x, ws8_t[i].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scales[i])


# ---- Pallas variants ----
def pallas_kn(x, i, TN=256):
    def kernel(x_ref, w_ref, s_ref, o_ref):
        xb = x_ref[:]
        wb = w_ref[:].astype(xb.dtype)
        acc = jax.lax.dot_general(
            xb, wb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=M * K * 2 + K * N + N * 4,
            transcendentals=0),
    )(x, ws8[i], scales[i].reshape(1, N))


def pallas_nk(x, i, TN=256):
    def kernel(x_ref, w_ref, s_ref, o_ref):
        xb = x_ref[:]
        wb = w_ref[:].astype(xb.dtype)              # (TN, K)
        acc = jax.lax.dot_general(
            xb, wb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, K), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N, bytes_accessed=M * K * 2 + K * N + N * 4,
            transcendentals=0),
    )(x, ws8_t[i], scales[i].reshape(1, N))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  "
          f"M={M} K={K} N={N} L={L} R={R}")
    ideal = WBYTES / 819e9 * 1e6
    print(f"(ideal int8 weight stream at 819 GB/s: {ideal:.1f} us/matmul)\n")

    timeit("v0 dense bf16 XLA", chain(v0), x0,
           bytes_per_iter=L * WBYTES * 2)
    timeit("v1 XLA int8 (K,N)", chain(v1), x0,
           bytes_per_iter=L * WBYTES)
    timeit("v1t XLA int8 (N,K)", chain(v1t), x0,
           bytes_per_iter=L * WBYTES)
    timeit("v2 pallas (K,N) TN=256 [current]",
           chain(functools.partial(pallas_kn, TN=256)), x0,
           bytes_per_iter=L * WBYTES)
    timeit("v3 pallas (N,K) TN=256",
           chain(functools.partial(pallas_nk, TN=256)), x0,
           bytes_per_iter=L * WBYTES)
    timeit("v4 pallas (N,K) TN=512",
           chain(functools.partial(pallas_nk, TN=512)), x0,
           bytes_per_iter=L * WBYTES)
    timeit("v4b pallas (N,K) TN=1024",
           chain(functools.partial(pallas_nk, TN=1024)), x0,
           bytes_per_iter=L * WBYTES)


if __name__ == "__main__":
    main()
