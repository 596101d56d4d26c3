"""On-chip probe: ragged flash-decode kernel vs XLA dense-masked
attention at serving decode shapes (VERDICT r3 item 2).

Times the attention alone (jitted, B rows, GQA, bf16 KV cache of
window L) for the dense-mask path and the Pallas ragged kernel across
position mixes: all-short, uniform mixed, all-long. The kernel's win
should track the live/total KV ratio; all-long is its worst case
(same bytes + kernel overhead).

Env: WT_PROBE_B, WT_PROBE_L, WT_PROBE_HKV, WT_PROBE_REP, WT_PROBE_D.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from whisper_tensor_tpu.backends.pallas.decode_attention import (  # noqa: E402
    ragged_decode_attention)
from whisper_tensor_tpu.milli.ops.attention import AttentionMilli  # noqa: E402


def timed(fn, runs=50):
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(runs):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / runs


def main():
    B = int(os.environ.get("WT_PROBE_B", "32"))
    L = int(os.environ.get("WT_PROBE_L", "2048"))
    Hkv = int(os.environ.get("WT_PROBE_HKV", "8"))
    rep = int(os.environ.get("WT_PROBE_REP", "4"))
    D = int(os.environ.get("WT_PROBE_D", "128"))
    Hq = Hkv * rep
    scale = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Hq, 1, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hkv, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, L, D)), jnp.bfloat16)
    op = AttentionMilli(scale=float(scale))

    def dense(q, k, v, pos):
        m = AttentionMilli._expand_pos_mask(jnp, pos, 1, L)
        return op.to_jax([q, k, v, m])[0]

    dense_j = jax.jit(dense)
    ragged_j = jax.jit(lambda q, k, v, pos:
                       ragged_decode_attention(q, k, v, pos, float(scale)))

    mixes = {
        "short (pos=63)": np.full((B,), 63, np.int32),
        "mixed (64..L-1)": rng.integers(64, L - 1, B).astype(np.int32),
        "long (pos=L-1)": np.full((B,), L - 1, np.int32),
    }
    kv_gb = B * Hkv * L * D * 2 * 2 / 1e9
    print(f"B={B} Hq={Hq} Hkv={Hkv} L={L} D={D}  full-window KV "
          f"{kv_gb * 1e3:.1f} MB/step")
    for name, pos in mixes.items():
        p = jnp.asarray(pos)
        # correctness first
        a = np.asarray(dense_j(q, k, v, p), np.float32)
        b = np.asarray(ragged_j(q, k, v, p), np.float32)
        err = np.abs(a - b).max()
        td = timed(lambda: dense_j(q, k, v, p))
        tr = timed(lambda: ragged_j(q, k, v, p))
        live = (pos.astype(np.int64) + 1).sum() / (B * L)
        print(f"{name:18s} live={live * 100:5.1f}%  dense "
              f"{td * 1e6:8.1f} us  ragged {tr * 1e6:8.1f} us  "
              f"x{td / tr:5.2f}  maxerr {err:.3e}")


if __name__ == "__main__":
    main()
