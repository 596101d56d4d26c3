"""On-chip microbench for the fused Q4 dequant-matmul (llama-8B decode shape).

The shipped Q4_0 kernel (backends/pallas/packed_matmul.py) measured
~102 us/matmul at 4096x4096 — equal to dense bf16 despite streaming
2.67x fewer HBM bytes, i.e. VPU-unpack-bound, not HBM-bound. The unpack
chain costs ~7-9 vector ops per weight element:

  u8->i32 widen (relayout) . & 0xF / >> 4 . concat K/2->K (relayout)
  . i32->f32 cast . repeat(scales) . * s . - o  (+ repeat(offsets))

This probe times kernel variants that delete links from that chain:

  d0   dense bf16 XLA matmul                      (speed reference)
  a0   shipped kernel (concat + i32 + inline offsets), TN=128
  a1   split-dot: acc = x_lo @ w_lo + x_hi @ w_hi  (kills the concat)
  a2   a1 + offset folding: out = x @ (nib*s) - xg @ o, xg = per-group
       sums of x computed outside (kills the subtract + offsets repeat)
  a3   a2 with i8 bit ops (bitcast u8->i8; (q>>4)&0xF fixes the sign;
       i8->f32 cast direct — kills the i32 widen relayout)
  a4   signed-int4 repack: host stores nib-8 in a jnp.int4 array with
       offsets folded to o' = o - 8s; kernel is cast(i4->f32) * s, and
       the o' correction rides the xg side-dot — NO bit ops at all
  a5   byte-planar i8 repack (1 B/weight, no bit ops): the VPU-vs-HBM
       tradeoff endpoint
  each also at TN=256.

Every variant is checked against the numpy dequant reference before
timing. Chained-L-matmuls-in-one-fori_loop timing recipe as in
qmm_probe.py (the only reliable method through the axon tunnel).

Usage: python scripts/q4mm_probe.py [M] [K] [N]  (default 32 4096 14336)
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
L = 8          # chained layers
R = 20         # fori_loop repeats inside the jit
G = 32         # K-group size (GGUF block)
Kg = K // G
QBYTES = K * N // 2 + Kg * N * 8   # packed nibbles + f32 scales/offsets

rng = np.random.default_rng(0)
x0_np = rng.standard_normal((M, K), dtype=np.float32)
x0 = jnp.asarray(x0_np, dtype=jnp.bfloat16)

# one weight's worth of quantized data, reused L times (values don't
# affect timing; avoids 8x host RNG)
nib_np = rng.integers(0, 16, (K, N), dtype=np.uint8)
s_np = (rng.standard_normal((Kg, N), dtype=np.float32) * 0.01)
o_np = 8.0 * np.repeat(s_np.mean(axis=0, keepdims=True), Kg, axis=0)

w_ref = (nib_np.astype(np.float32) * np.repeat(s_np, G, axis=0)
         - np.repeat(o_np, G, axis=0))

half = K // 2
q_packed = jnp.asarray(nib_np[:half] | (nib_np[half:] << 4))   # (K/2, N) u8
q_planar = jnp.asarray(nib_np.astype(np.int8))                 # (K, N) i8
# int4 host->device transfer trips a jit recursion in this jax build;
# cast on device instead — lazily, and guarded: the axon backend may not
# implement i4 arrays at all
_q_i4_cache = []


def get_q_i4():
    if not _q_i4_cache:
        arr = jax.jit(lambda a: a.astype(jnp.int4))(
            jnp.asarray(nib_np.astype(np.int8) - 8))           # (K, N) i4
        arr.block_until_ready()
        _q_i4_cache.append(arr)
    return _q_i4_cache[0]
s_dev = jnp.asarray(s_np)
o_dev = jnp.asarray(o_np)
o4_dev = jnp.asarray(o_np - 8.0 * s_np)   # folded offset for signed nibbles
w_bf16 = jnp.asarray(w_ref, dtype=jnp.bfloat16)

# per-group sums of x for offset folding, (M, Kg)
xg = jnp.asarray(x0_np.reshape(M, Kg, G).sum(-1))


def timeit(name, step, bytes_per_mm, check=True):
    try:
        f = jax.jit(chain(step))
        out_last = None

        def run():
            nonlocal out_last
            out_last = f(x0)
            return np.asarray(out_last)

        run()  # warm + sync
        if check:
            one = np.asarray(jax.jit(lambda x: step(x, 0))(
                jnp.asarray(x0_np, dtype=jnp.bfloat16))).astype(np.float32)
            ref = x0_np.astype(np.float32) @ w_ref
            rel = (np.abs(one - ref).max()
                   / max(np.abs(ref).max(), 1e-9))
            assert rel < 2e-2, f"{name}: rel err {rel}"
        t0 = time.time()
        run()
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


def chain(step):
    def run(x):
        def body(_, x):
            for i in range(L):
                out = step(x, i)
                x = out[:, :K].astype(jnp.bfloat16)
            return x
        return jax.lax.fori_loop(0, R, body, x)
    return run


def d0(x, i):
    return jnp.dot(x, w_bf16, preferred_element_type=jnp.float32)


def mk_pallas(kernel, inputs, in_specs, TN):
    def step(x, i):
        x2 = x
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(N // TN,),
                in_specs=[pl.BlockSpec((M, K), lambda j: (0, 0),
                                       memory_space=pltpu.VMEM)] + in_specs,
                out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * M * K * N,
                    bytes_accessed=M * K * 2 + QBYTES + M * N * 4,
                    transcendentals=0),
            )(x2, *inputs)
    return step


def a0(TN=128):
    """Shipped kernel: i32 widen, concat, inline scale+offset repeat."""
    def kernel(x_ref, q_ref, s_ref, o_ref, out_ref):
        s = jnp.repeat(s_ref[:], G, axis=0)
        qi = q_ref[:].astype(jnp.int32)
        nib = jnp.concatenate([qi & 0x0F, qi >> 4], axis=0)
        w = nib.astype(jnp.float32) * s - jnp.repeat(o_ref[:], G, axis=0)
        acc = jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc

    return mk_pallas(kernel, (q_packed, s_dev, o_dev), [
        pl.BlockSpec((half, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kg, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kg, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
    ], TN)


def a1(TN=128):
    """Split-dot (no concat); offsets inline."""
    def kernel(x_ref, q_ref, s_ref, o_ref, out_ref):
        qi = q_ref[:].astype(jnp.int32)
        s_lo = jnp.repeat(s_ref[:Kg // 2], G, axis=0)
        s_hi = jnp.repeat(s_ref[Kg // 2:], G, axis=0)
        o_lo = jnp.repeat(o_ref[:Kg // 2], G, axis=0)
        o_hi = jnp.repeat(o_ref[Kg // 2:], G, axis=0)
        w_lo = (qi & 0x0F).astype(jnp.float32) * s_lo - o_lo
        w_hi = (qi >> 4).astype(jnp.float32) * s_hi - o_hi
        xf = x_ref[:].astype(jnp.float32)
        acc = jax.lax.dot_general(
            xf[:, :half], w_lo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            xf[:, half:], w_hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc

    return mk_pallas(kernel, (q_packed, s_dev, o_dev), [
        pl.BlockSpec((half, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kg, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kg, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
    ], TN)


def _with_xg(in_specs, TN):
    return [pl.BlockSpec((M, Kg), lambda j: (0, 0),
                         memory_space=pltpu.VMEM)] + in_specs


def a2(TN=128):
    """Split-dot + offset folded into xg @ o side-dot."""
    def kernel(x_ref, xg_ref, q_ref, s_ref, o_ref, out_ref):
        qi = q_ref[:].astype(jnp.int32)
        s_lo = jnp.repeat(s_ref[:Kg // 2], G, axis=0)
        s_hi = jnp.repeat(s_ref[Kg // 2:], G, axis=0)
        w_lo = (qi & 0x0F).astype(jnp.float32) * s_lo
        w_hi = (qi >> 4).astype(jnp.float32) * s_hi
        xf = x_ref[:].astype(jnp.float32)
        acc = jax.lax.dot_general(
            xf[:, :half], w_lo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            xf[:, half:], w_hi, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc -= jax.lax.dot_general(
            xg_ref[:], o_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc

    def step(x, i):
        xgi = x.astype(jnp.float32).reshape(M, Kg, G).sum(-1)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(N // TN,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M, Kg), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((half, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * M * K * N,
                    bytes_accessed=M * K * 2 + QBYTES + M * N * 4,
                    transcendentals=0),
            )(x, xgi, q_packed, s_dev, o_dev)
    return step


def a3(TN=128):
    """a2 with i8 bit ops (no i32 widen)."""
    def kernel(x_ref, xg_ref, q_ref, s_ref, o_ref, out_ref):
        q8 = q_ref[:]                        # i8 (bitcast on host side)
        s_lo = jnp.repeat(s_ref[:Kg // 2], G, axis=0)
        s_hi = jnp.repeat(s_ref[Kg // 2:], G, axis=0)
        lo = (q8 & 0x0F).astype(jnp.float32)
        hi = ((q8 >> 4) & 0x0F).astype(jnp.float32)
        xf = x_ref[:].astype(jnp.float32)
        acc = jax.lax.dot_general(
            xf[:, :half], lo * s_lo,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            xf[:, half:], hi * s_hi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc -= jax.lax.dot_general(
            xg_ref[:], o_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc

    q_i8view = jnp.asarray(np.asarray(q_packed).view(np.int8))

    def step(x, i):
        xgi = x.astype(jnp.float32).reshape(M, Kg, G).sum(-1)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(N // TN,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M, Kg), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((half, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * M * K * N,
                    bytes_accessed=M * K * 2 + QBYTES + M * N * 4,
                    transcendentals=0),
            )(x, xgi, q_i8view, s_dev, o_dev)
    return step


def a4(TN=128):
    """Signed-int4 repack: w = cast(q_i4) * s, correction via xg @ o4."""
    def kernel(x_ref, xg_ref, q_ref, s_ref, o_ref, out_ref):
        s = jnp.repeat(s_ref[:], G, axis=0)
        w = q_ref[:].astype(jnp.float32) * s
        acc = jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc -= jax.lax.dot_general(
            xg_ref[:], o_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc

    def step(x, i):
        xgi = x.astype(jnp.float32).reshape(M, Kg, G).sum(-1)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(N // TN,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M, Kg), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * M * K * N,
                    bytes_accessed=M * K * 2 + QBYTES + M * N * 4,
                    transcendentals=0),
            )(x, xgi, get_q_i4(), s_dev, o4_dev)
    return step


def a5(TN=128):
    """Byte-planar i8 nibbles (1 B/weight) — VPU-minimal endpoint."""
    def kernel(x_ref, xg_ref, q_ref, s_ref, o_ref, out_ref):
        s = jnp.repeat(s_ref[:], G, axis=0)
        w = q_ref[:].astype(jnp.float32) * s
        acc = jax.lax.dot_general(
            x_ref[:].astype(jnp.float32), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc -= jax.lax.dot_general(
            xg_ref[:], o_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = acc

    def step(x, i):
        xgi = x.astype(jnp.float32).reshape(M, Kg, G).sum(-1)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(N // TN,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M, Kg), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kg, TN), lambda j: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((M, TN), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                cost_estimate=pl.CostEstimate(
                    flops=2 * M * K * N,
                    bytes_accessed=M * K * 2 + K * N + M * N * 4,
                    transcendentals=0),
            )(x, xgi, q_planar, s_dev, o_dev)
    return step


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}  "
          f"M={M} K={K} N={N} L={L} R={R}")
    print(f"(ideal Q4 weight stream at 819 GB/s: "
          f"{QBYTES / 819e9 * 1e6:.1f} us/matmul; dense bf16: "
          f"{2 * K * N / 819e9 * 1e6:.1f} us)\n")

    timeit("d0 dense bf16 XLA", d0, 2 * K * N)
    for TN in (128, 256):
        timeit(f"a0 shipped (concat+i32) TN={TN}", a0(TN), QBYTES)
        timeit(f"a1 split-dot TN={TN}", a1(TN), QBYTES)
        timeit(f"a2 split-dot+offset-fold TN={TN}", a2(TN), QBYTES)
        timeit(f"a3 a2+i8-bitops TN={TN}", a3(TN), QBYTES)
        timeit(f"a4 signed-int4 native TN={TN}", a4(TN), QBYTES)
        timeit(f"a5 byte-planar i8 TN={TN}", a5(TN), K * N)


if __name__ == "__main__":
    main()
