"""Fixed-latency probe: time = a + b*N for chained dense decode matmuls.

q4mm_probe rounds 1-2 found every weight format clusters at 310-400 us
per matmul at M=32, K=4096, N=14336 — including dense bf16 (XLA AND a
handwritten Pallas kernel), despite a 143 us bandwidth ideal. This
probe sweeps N on the dense XLA chain to split the cost into a fixed
per-matmul latency `a` and a bandwidth slope `b`. If `a` dominates,
the decode-path optimization is FEWER matmuls (fuse qkv / gate+up),
not cheaper bytes.

Usage: python scripts/latency_probe.py [M]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from whisper_tensor_tpu.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

M = int(sys.argv[1]) if len(sys.argv) > 1 else 32
K = 4096
L = 8
R = 20

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32),
                 dtype=jnp.bfloat16)

pts = []
for N in (1024, 2048, 4096, 8192, 14336, 28672):
    w = jnp.asarray(
        rng.standard_normal((K, N), dtype=np.float32) * 0.02,
        dtype=jnp.bfloat16)

    def run(x, w=w, N=N):
        def body(_, x):
            for i in range(L):
                out = jnp.dot(x, w, preferred_element_type=jnp.float32)
                if N < K:
                    out = jnp.tile(out, (1, K // N))
                x = out[:, :K].astype(jnp.bfloat16)
            return x
        return jax.lax.fori_loop(0, R, body, x)

    f = jax.jit(run)
    np.asarray(f(x0))
    t0 = time.time()
    np.asarray(f(x0))
    per_mm = (time.time() - t0) / R / L * 1e6
    ideal = 2 * K * N / 819e9 * 1e6
    pts.append((N, per_mm))
    print(f"N={N:6d}  {per_mm:8.1f} us/matmul  (BW ideal {ideal:6.1f} us)",
          flush=True)
    del w

# least-squares a + b*N
ns = np.array([p[0] for p in pts], dtype=np.float64)
ts = np.array([p[1] for p in pts], dtype=np.float64)
A = np.stack([np.ones_like(ns), ns], axis=1)
(a, b), *_ = np.linalg.lstsq(A, ts, rcond=None)
eff_gbs = 2 * K / b / 1e3  # bytes per N unit / us -> GB/s
print(f"\nfit: t = {a:.1f} us + {b * 1e3:.3f} ns/N  "
      f"(slope = {eff_gbs:.0f} GB/s effective)", flush=True)
