"""One-build serving A/B probe on the real chip (VERDICT r3 items 2+7).

Builds ONE reduced-depth llama-8B-shaped model (WT_PROBE_LAYERS,
default 8 — full 8B width d=4096 / GQA 32:8 / ffn 14336, so every
per-layer cost IS the 8B per-layer cost; the single-core host build of
the full 32L model alone takes ~25 min, which would allow one
measurement per session instead of four) and measures in one process:

  A. auto-prefix caching (ContinuousBatcher auto_prefix) with a
     2,048-token shared system prefix: admission TTFT and wall with
     the LRU prefix-KV pool ON vs OFF.  Prefix prefill compute is
     per-layer, so the 32L saving is ~4x the measured 8L one
     (embed/head excepted) — the extrapolation is stated in the JSON.
  B. ragged flash-decode attention (backends/pallas/decode_attention)
     on a mixed-length decode workload (prompt lengths spread over
     {64,256,512,1024} against a 2,304-slot cache): wave throughput
     with WT_RAGGED_ATTN=1 vs 0.

Env: WT_PROBE_LAYERS=8 WT_PROBE_CASE=both|prefix|ragged
     WT_PROBE_NEW_A=32 WT_PROBE_NEW_B=64 WT_PROBE_CLIENTS=8
"""
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the deterministic 8B weight getter)
from whisper_tensor_tpu.dtype import DType  # noqa: E402
from whisper_tensor_tpu.server.batching import ContinuousBatcher  # noqa: E402

MAX_LEN = 2304
PREFIX_LEN = 2048
SUFFIX = 8          # fixed suffix length: prefill programs are keyed on
                    # (bucket, k, plen) — a fixed plen keeps the A/B to
                    # one compile per configuration


def run_wave(srv, prompts, n_new):
    progs0 = len(srv._programs)   # detect JIT compiles inside the wave
    t0 = time.time()
    ttft = [None] * len(prompts)

    def cb(i):
        def f(_tok):
            if ttft[i] is None:
                ttft[i] = time.time() - t0
        return f

    futs = [srv.submit(p, n_new, on_token=cb(i))
            for i, p in enumerate(prompts)]
    total = sum(len(f.result(timeout=3600)) for f in futs)
    dt = time.time() - t0
    ts = sorted(t for t in ttft if t is not None)
    # true (interpolated) median; at small N this is still noisy, so the
    # sample count rides along in the JSON.
    n = len(ts)
    med = (ts[n // 2] if n % 2 else 0.5 * (ts[n // 2 - 1] + ts[n // 2]))
    return {"tok_s": round(total / dt, 1), "wall_s": round(dt, 2),
            "ttft_med_ms": round(med * 1e3, 1), "ttft_n": n,
            "ttft_max_ms": round(ts[-1] * 1e3, 1),
            # >0 means admission coalescing hit an unwarmed (bucket, k)
            # program shape and compile time is folded into this wave
            "new_compiles": len(srv._programs) - progs0}


def case_prefix(model, N, n_new):
    rng = np.random.default_rng(0)
    shared = rng.integers(0, 128256, (PREFIX_LEN,)).astype(np.int64)
    mk = lambda: np.concatenate(  # noqa: E731
        [shared, rng.integers(0, 128256, (SUFFIX,)).astype(np.int64)])
    out = {}
    for tag, pool in (("on", N), ("off", 0)):
        srv = ContinuousBatcher(
            model, max_len=MAX_LEN, max_batch=N, chunk=16,
            cache_dtype=DType.BF16, prompt_buckets=(16, PREFIX_LEN + 32),
            auto_prefix=pool, quantize="int8").start()
        t0 = time.time()
        # TWO warmup waves: the first fills the pool (all admissions
        # MISS -> compiles the plen=0 prefill program); the second HITS
        # the pool and compiles the plen=PREFIX_LEN insert program.
        # With one wave the hit-path compile (~15 s remote) lands inside
        # the measured wave (observed: 17.3 s wall vs 0.8 s baseline,
        # new_compiles=1 — the exact folding ADVICE r4 #3 warned about).
        for _ in range(2 if pool else 1):
            warm = [srv.submit(mk(), 8) for _ in range(N)]
            for f in warm:
                f.result(timeout=3600)
        print(f"# prefix[{tag}] warmup {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        res = run_wave(srv, [mk() for _ in range(N)], n_new)
        st = srv.stats()
        res["auto_prefix"] = st.get("auto_prefix")
        srv.stop()
        del srv
        gc.collect()
        out[tag] = res
        print(f"# prefix[{tag}] {res}", file=sys.stderr, flush=True)
    return out


def case_ragged(model, N, n_new):
    rng = np.random.default_rng(1)
    lens = [64, 256, 512, 1024] * ((2 * N) // 4 + 1)
    prompts = [rng.integers(0, 128256, (L,)).astype(np.int64)
               for L in lens[:2 * N]]
    import jax

    if jax.default_backend() != "tpu":
        # ragged_decode_attention_usable() is False off-TPU, so both arms
        # would run the identical dense path and the A/B would be ~1.0x
        # by construction.
        print("# ragged: WARNING non-TPU backend — A/B is meaningless",
              file=sys.stderr, flush=True)
    out = {}
    orig = os.environ.get("WT_RAGGED_ATTN")
    try:
        for tag, flag in (("on", "1"), ("off", "0")):
            os.environ["WT_RAGGED_ATTN"] = flag
            srv = ContinuousBatcher(
                model, max_len=MAX_LEN, max_batch=N, chunk=16,
                cache_dtype=DType.BF16,
                prompt_buckets=(64, 256, 512, 1024),
                quantize="int8").start()
            t0 = time.time()
            warm = [srv.submit(p, 8) for p in prompts[:N]]
            for f in warm:
                f.result(timeout=3600)
            print(f"# ragged[{tag}] warmup {time.time() - t0:.1f}s",
                  file=sys.stderr, flush=True)
            res = run_wave(srv, prompts[N:2 * N], n_new)
            srv.stop()
            del srv
            gc.collect()
            out[tag] = res
            print(f"# ragged[{tag}] {res}", file=sys.stderr, flush=True)
    finally:
        if orig is None:
            os.environ.pop("WT_RAGGED_ATTN", None)
        else:
            os.environ["WT_RAGGED_ATTN"] = orig
    return out


def main():
    L = int(os.environ.get("WT_PROBE_LAYERS", "8"))
    N = int(os.environ.get("WT_PROBE_CLIENTS", "8"))
    case = os.environ.get("WT_PROBE_CASE", "both")
    cfg = bench._llama8b_cfg(L)
    t0 = time.time()
    model, mode = bench._llama8b_model(cfg, "int8", MAX_LEN,
                                       pos_per_row=True)
    print(f"# build {L}L: {time.time() - t0:.0f}s", file=sys.stderr,
          flush=True)
    import jax
    rec = {"layers": L, "clients": N, "max_len": MAX_LEN,
           "jax_backend": jax.default_backend()}
    if case in ("both", "prefix"):
        rec["prefix"] = case_prefix(
            model, N, int(os.environ.get("WT_PROBE_NEW_A", "32")))
    if case in ("both", "ragged"):
        rec["ragged"] = case_ragged(
            model, N, int(os.environ.get("WT_PROBE_NEW_B", "64")))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
