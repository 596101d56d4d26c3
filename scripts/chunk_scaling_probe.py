"""Device-pure probe of the 8B serving chunk-program batch scaling.

BENCH_EXTRA's scaling_note records the mystery: at 8B the batcher's
chunk program costs ~21 ms/step at N=16 but ~49 ms/step at N=32
(wall-phase counters), while the offline fused program runs ~12.7 and
~13.5 ms/step at the same batches.  Wall counters mix device time with
tunnel dispatch, so this probe times the programs DEVICE-PURE
(block_until_ready around a multi-chunk loop, warm cache, donated
carries threaded) and splits the gap into candidate terms:

  raw      — minimal greedy scan around the SAME pos_per_row traced
             step (no sampling machinery, no EOS, no slot updates)
  chunk    — the batcher's real `_chunk_program` (all-greedy variant)
  scalar   — the same scan around a scalar-pos build of the same model
             (the offline program's step shape)

Each at B in WT_PROBE_BATCHES, layers WT_PROBE_LAYERS (per-layer costs
scale linearly, so reduced-depth ratios transfer), plus a max_len sweep
to expose any full-cache-rewrite term in the vmapped per-row KV write.

Usage:  WT_PROBE_LAYERS=8 WT_PROBE_BATCHES=16,32,64 python scripts/chunk_scaling_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402

from bench import _llama8b_cfg, _llama8b_model  # noqa: E402


def _build(layers, max_len, pos_per_row, mode="int8"):
    cfg = _llama8b_cfg(layers,
                       vocab=int(os.environ.get("WT_PROBE_VOCAB",
                                                "128256")))
    model, mode = _llama8b_model(cfg, mode, max_len,
                                 pos_per_row=pos_per_row)
    return cfg, model, mode


def _mk_iface(model, max_len, mode):
    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface

    return TextInferenceInterface(
        model, max_len=max_len, cache_dtype=DType.BF16,
        prompt_buckets=(16,), quantize=("int8" if mode == "int8" else None))


def _time_loop(fn, args, caches_idx, reps, n_steps):
    """Run fn reps times threading the donated caches; device-pure
    seconds per step."""
    import jax

    out = fn(*args)
    # a real host fetch: block_until_ready on axon-tunneled buffers
    # returns before device completion, so sync by materializing the
    # token output
    jax.device_get(out[0])
    # rebuild args with the output caches each call
    t0 = time.time()
    cur = out
    for _ in range(reps):
        a = list(args)
        a[caches_idx] = cur[3] if isinstance(cur, tuple) else cur
        cur = fn(*a)
    jax.device_get(cur[0])
    return (time.time() - t0) / (reps * n_steps)


def probe_raw(iface, B, max_len, n_steps, reps, pos_init):
    import jax
    import jax.numpy as jnp

    step = iface._traced_step(B, 1)
    park = max_len - 1

    def raw(cur, pos, caches, weights):
        def body(carry, i):
            cur, pos, caches = carry
            logits, caches = step(cur[:, None], pos, caches, weights)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1)
            return (nxt, jnp.minimum(pos + 1, park), caches), nxt

        (cur, pos, caches), toks = jax.lax.scan(
            body, (cur, pos, caches), jnp.arange(n_steps))
        return cur, pos, None, caches, jnp.swapaxes(toks, 0, 1)

    prog = jax.jit(raw, donate_argnums=(2,))
    caches = iface.fresh_cache(B)
    cur = jnp.zeros(B, jnp.int64)
    # pos_init may be a per-row vector (pos_per_row models) or a plain
    # scalar (the offline program's step shape) — the traced step
    # handles both, so the scalar probe reuses this function.
    pos = jnp.asarray(pos_init, jnp.int64)
    weights = iface._weights()
    args = (cur, pos, caches, weights)
    return _time_loop(prog, args, 2, reps, n_steps)


def probe_chunk(model, mode, B, max_len, n_steps, reps, pos_init,
                iface=None):
    import jax
    import jax.numpy as jnp

    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.server.batching import (
        ContinuousBatcher, _rows_arrays, _rows_flags)

    srv = ContinuousBatcher(
        model if iface is None else None, max_len=max_len, max_batch=B,
        chunk=n_steps, cache_dtype=DType.BF16, prompt_buckets=(16,),
        quantize=("int8" if mode == "int8" else None), iface=iface)
    # The batcher rounds max_batch up to the next power of two; size
    # every row-state array at srv.max_batch so the chunk program we
    # time has exactly the shape the server runs (for non-pow2 B the
    # extra rows are parked-inactive padding).
    mb = srv.max_batch
    sps = [None] * mb
    flags = _rows_flags(sps)
    rows = tuple(jnp.asarray(a) for a in _rows_arrays(sps))
    prog = srv._chunk_program(flags, False, n_steps)
    caches = srv.iface.fresh_cache(mb)
    cur = jnp.zeros(mb, jnp.int64)
    pos_pad = np.full(mb, srv.park_pos, np.int64)
    pos_pad[:B] = pos_init
    pos = jnp.asarray(pos_pad)
    act = jnp.asarray(np.arange(mb) < B)
    upd_s = jnp.full(mb, mb, jnp.int32)
    upd_c = jnp.zeros(mb, jnp.int64)
    upd_p = jnp.full(mb, srv.park_pos, jnp.int64)
    upd_a = jnp.zeros(mb, bool)
    wf = srv._wf(srv._row_lora, False)
    args = (cur, pos, act, caches, wf, jax.random.PRNGKey(0), rows,
            upd_s, upd_c, upd_p, upd_a)
    sec = _time_loop(prog, args, 3, reps, n_steps)
    return sec, srv


def main():
    layers = int(os.environ.get("WT_PROBE_LAYERS", "8"))
    batches = tuple(int(x) for x in os.environ.get(
        "WT_PROBE_BATCHES", "16,32,64").split(","))
    max_lens = tuple(int(x) for x in os.environ.get(
        "WT_PROBE_MAXLENS", "192").split(","))
    n_steps = int(os.environ.get("WT_PROBE_STEPS", "32"))
    reps = int(os.environ.get("WT_PROBE_REPS", "4"))
    rng = np.random.default_rng(0)

    for max_len in max_lens:
        print(f"== max_len={max_len} layers={layers} ==", flush=True)
        t0 = time.time()
        cfg, model, mode = _build(layers, max_len, pos_per_row=True)
        shared_iface = _mk_iface(model, max_len, mode)
        print(f"# build pos_per_row: {time.time() - t0:.0f}s", flush=True)
        # keep low < high even for small max_len/large n_steps combos
        hi = max(17, min(128, max_len - n_steps - 2))
        for B in batches:
            pos_init = rng.integers(16, hi, B)
            # A/B the ragged decode-attention kernel INSIDE the real
            # chunk program: at large B with few key blocks per row
            # (e.g. max_len=192 -> 3 blocks) the kernel's per-grid-step
            # fixed cost scales with B while its DMA saving doesn't —
            # the candidate cause of the served-step growth past B=64
            # (61 ms/step served vs 31 offline at B=256, VERDICT r5).
            old_ra = os.environ.get("WT_RAGGED_ATTN")
            try:
                for ra in ("1", "0"):
                    os.environ["WT_RAGGED_ATTN"] = ra
                    sec, srv = probe_chunk(model, mode, B, max_len,
                                           n_steps, reps, pos_init,
                                           iface=shared_iface)
                    print(f"B={B:4d} chunk   {sec * 1e3:8.2f} ms/step"
                          f"  (ragged={ra})", flush=True)
                    if ra == "1":
                        sec = probe_raw(srv.iface, B, max_len, n_steps,
                                        reps, pos_init)
                        print(f"B={B:4d} raw     {sec * 1e3:8.2f} "
                              f"ms/step", flush=True)
                    del srv
            finally:
                if old_ra is None:
                    os.environ.pop("WT_RAGGED_ATTN", None)
                else:
                    os.environ["WT_RAGGED_ATTN"] = old_ra
        if os.environ.get("WT_PROBE_SCALAR", "1") == "1":
            t0 = time.time()
            cfg, smodel, smode = _build(layers, max_len,
                                        pos_per_row=False)
            print(f"# build scalar-pos: {time.time() - t0:.0f}s",
                  flush=True)
            iface = _mk_iface(smodel, max_len, smode)
            for B in batches:
                sec = probe_raw(iface, B, max_len, n_steps, reps, 64)
                print(f"B={B:4d} scalar  {sec * 1e3:8.2f} ms/step",
                      flush=True)


if __name__ == "__main__":
    main()
