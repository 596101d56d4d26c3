"""Isolate the serving tick's dispatch-path costs on the real chip.

chunk_scaling_probe showed the chunk program is device-pure fast
(6.4 ms/step at B=32/8-layers) while serving walls ~12 ms/step more.
The server's _tick differs from the probe in arg handling: it converts
rows/upd_*/rng from host numpy EVERY tick and reassembles the weights
list. This probe times the SAME dispatch three ways:

  dev    — all args device-resident (the scaling probe's regime)
  host   — rows/upd_*/rng converted from numpy each call (server today)
  packed — host scalars packed into ONE i64 + ONE f32 upload per call

Each timed over R sequential chunks with a single trailing sync, so
the difference is pure per-tick dispatch/upload overhead.

Usage: WT_PROBE_LAYERS=2 WT_PROBE_BATCHES=16,32 python scripts/dispatch_cost_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from bench import _llama8b_cfg, _llama8b_model  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.server.batching import (ContinuousBatcher,
                                                    _rows_arrays,
                                                    _rows_flags)

    layers = int(os.environ.get("WT_PROBE_LAYERS", "2"))
    batches = tuple(int(x) for x in os.environ.get(
        "WT_PROBE_BATCHES", "16,32").split(","))
    n_steps = int(os.environ.get("WT_PROBE_STEPS", "32"))
    reps = int(os.environ.get("WT_PROBE_REPS", "8"))
    max_len = int(os.environ.get("WT_PROBE_MAXLEN", "192"))
    cfg = _llama8b_cfg(layers, vocab=int(os.environ.get(
        "WT_PROBE_VOCAB", "128256")))
    model, mode = _llama8b_model(cfg, "int8", max_len, pos_per_row=True)
    rng = np.random.default_rng(0)

    for B in batches:
        srv = ContinuousBatcher(model, max_len=max_len, max_batch=B,
                                chunk=n_steps, cache_dtype=DType.BF16,
                                prompt_buckets=(16,), quantize="int8")
        mb = srv.max_batch
        sps = [None] * mb
        flags = _rows_flags(sps)
        rows_np = _rows_arrays(sps)
        prog = srv._chunk_program(flags, False, n_steps)
        caches = srv.iface.fresh_cache(mb)
        cur = jnp.zeros(mb, jnp.int64)
        pos = jnp.asarray(rng.integers(16, 128, mb), jnp.int64)
        act = jnp.ones(mb, bool)
        upd_np = (np.full(mb, mb, np.int32), np.zeros(mb, np.int64),
                  np.full(mb, srv.park_pos, np.int64), np.zeros(mb, bool))
        wf = srv._wf(srv._row_lora, False)
        key_np = np.asarray(jax.random.PRNGKey(0))

        def run_mode(mode_name):
            nonlocal caches
            rows_dev = tuple(jnp.asarray(a) for a in rows_np)
            upd_dev = tuple(jnp.asarray(a) for a in upd_np)
            key_dev = jnp.asarray(key_np)
            out = prog(cur, pos, act, caches, wf, key_dev, rows_dev,
                       *upd_dev)
            jax.device_get(out[0])
            caches = out[3]
            t0 = time.time()
            o = None
            for i in range(reps):
                if mode_name == "dev":
                    rows_a, upd_a = rows_dev, upd_dev
                    key = key_dev
                elif mode_name == "host":
                    # the server's regime: fresh numpy -> jnp every tick
                    rows_a = tuple(jnp.asarray(a) for a in rows_np)
                    upd_a = tuple(jnp.asarray(a) for a in upd_np)
                    key = jnp.asarray(key_np)
                o = prog(cur, pos, act, caches, wf, key, rows_a, *upd_a)
                caches = o[3]
            jax.device_get(o[0])
            dt = (time.time() - t0) / (reps * n_steps)
            print(f"B={B:4d} {mode_name:6s} {dt * 1e3:8.2f} ms/step "
                  f"({len(rows_np) + len(upd_np) + 1} host arrays/call)"
                  if mode_name == "host" else
                  f"B={B:4d} {mode_name:6s} {dt * 1e3:8.2f} ms/step",
                  flush=True)

        run_mode("dev")
        run_mode("host")
        del srv


if __name__ == "__main__":
    main()
