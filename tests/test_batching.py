"""Continuous batching: concurrent ragged requests through one batched
decode program must reproduce the sequential per-request generations.

Reference serving seam: crates/whisper-tensor-server/src/scheduler.rs
:424-717 (there, requests serialize; here they share slots — the
outputs must be identical either way).
"""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
    GPT2Config, build_gpt2_step, random_gpt2_weights)
from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
from whisper_tensor_tpu.model import Model
from whisper_tensor_tpu.server.batching import ContinuousBatcher

rng = np.random.default_rng(5)


def _models(max_len=64):
    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=211,
                     n_positions=max_len)
    wg = random_gpt2_weights(cfg)
    m_scalar = Model.new_from_onnx(
        build_gpt2_step(wg, cfg, max_len=max_len, dtype=DType.F32))
    m_ragged = Model.new_from_onnx(
        build_gpt2_step(wg, cfg, max_len=max_len, dtype=DType.F32,
                        pos_per_row=True))
    return cfg, m_scalar, m_ragged


def test_concurrent_requests_match_sequential():
    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16, 32))
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=4, chunk=4,
                                cache_dtype=DType.F32,
                                prompt_buckets=(16, 32)).start()
    try:
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int64)
                   for n in (3, 7, 12, 5, 9, 2)]
        n_news = [6, 11, 4, 9, 7, 13]
        futures = [batcher.submit(p, n) for p, n in zip(prompts, n_news)]
        outs = [f.result(timeout=120) for f in futures]
        for p, n, out in zip(prompts, n_news, outs):
            ref = ref_iface.generate_tokens(p[None], n)[0]
            np.testing.assert_array_equal(out, ref)
            assert out.shape == (n,)
    finally:
        batcher.stop()


def test_streaming_callback_and_slot_reuse():
    cfg, _, m_ragged = _models()
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=2, chunk=3,
                                cache_dtype=DType.F32,
                                prompt_buckets=(16,)).start()
    try:
        streamed = {}

        def make_cb(k):
            streamed[k] = []
            return lambda t: streamed[k].append(t)

        futs = []
        # 5 requests through 2 slots forces reuse
        for k in range(5):
            p = rng.integers(0, cfg.vocab_size, (4 + k,)).astype(np.int64)
            futs.append((k, p, batcher.submit(p, 5, on_token=make_cb(k))))
        for k, p, f in futs:
            out = f.result(timeout=120)
            assert out.shape == (5,)
            assert streamed[k][:5] == list(out)
    finally:
        batcher.stop()


def test_eos_terminates_early():
    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16,))
    p = rng.integers(0, cfg.vocab_size, (6,)).astype(np.int64)
    ref = ref_iface.generate_tokens(p[None], 20)[0]
    eos = int(ref[4])  # force EOS at the 5th generated token
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=2, chunk=4,
                                cache_dtype=DType.F32, prompt_buckets=(16,),
                                eos_token_id=eos).start()
    try:
        out = batcher.submit(p, 20).result(timeout=120)
        assert len(out) <= 20
        assert eos in list(out)
        idx = list(out).index(eos)
        np.testing.assert_array_equal(out[:idx + 1], ref[:idx + 1])
    finally:
        batcher.stop()


def test_eos_list_terminates_early():
    """HF checkpoints may declare SEVERAL eos ids (Llama-3 style): any
    of them must deactivate the row."""
    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16,))
    p = rng.integers(0, cfg.vocab_size, (6,)).astype(np.int64)
    ref = ref_iface.generate_tokens(p[None], 20)[0]
    eos_ids = [int(ref[3]), cfg.vocab_size - 1]  # 4th token + a dud
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=2, chunk=4,
                                cache_dtype=DType.F32, prompt_buckets=(16,),
                                eos_token_id=eos_ids).start()
    try:
        assert batcher.eos_token_ids == tuple(eos_ids)
        assert batcher.eos_token_id == eos_ids[0]
        out = batcher.submit(p, 20).result(timeout=120)
        assert len(out) <= 20
        assert eos_ids[0] in list(out)
        idx = list(out).index(eos_ids[0])
        np.testing.assert_array_equal(out[:idx + 1], ref[:idx + 1])
    finally:
        batcher.stop()




def _llama_models(max_len):
    import torch
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM

    from whisper_tensor_tpu.importers.recipes.llm.llama import (
        LlamaConfig, build_llama_step, hf_weight_getter)

    torch.manual_seed(7)
    common = dict(num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, hidden_size=32,
                  intermediate_size=48, vocab_size=131,
                  max_position_embeddings=64, attention_dropout=0.0)
    hf = LlamaForCausalLM(HFCfg(rope_theta=10000.0, **common))
    hf.eval()
    cfg = LlamaConfig.from_hf({**common, "model_type": "llama",
                               "rope_theta": 10000.0, "rms_norm_eps": 1e-6})
    wg = hf_weight_getter(hf)
    m0 = Model.new_from_onnx(build_llama_step(wg, cfg, max_len=max_len,
                                              dtype=DType.F32))
    mr = Model.new_from_onnx(build_llama_step(wg, cfg, max_len=max_len,
                                              dtype=DType.F32,
                                              pos_per_row=True))
    return m0, mr


def test_llama_ragged_pos_matches_scalar():
    from whisper_tensor_tpu.backends.eval_backend import EvalBackend

    m0, mr = _llama_models(32)
    B = 3
    caches = {}
    for i in range(2):
        for kv in "kv":
            caches[f"cache_{kv}_{i}"] = (rng.standard_normal(
                (B, 2, 32, 8)) * 0.1).astype(np.float32)
    ids = rng.integers(0, 131, (B, 1)).astype(np.int64)
    posv = np.asarray([1, 6, 13], np.int64)
    o = EvalBackend("xla").run(mr.graph, {"input_ids": ids, "pos": posv,
                                          **caches})
    for bi in range(B):
        cb = {k: v[bi:bi + 1] for k, v in caches.items()}
        ob = EvalBackend("xla").run(m0.graph, {
            "input_ids": ids[bi:bi + 1], "pos": np.asarray(posv[bi]), **cb})
        np.testing.assert_allclose(np.asarray(o["logits"])[bi],
                                   np.asarray(ob["logits"])[0],
                                   rtol=1e-5, atol=1e-6)
        for k in ob:
            if k.startswith("new_cache"):
                # rotary broadcast order differs between B=1 and B=3
                # programs -> 1-ulp reassociation
                np.testing.assert_allclose(np.asarray(o[k])[bi],
                                           np.asarray(ob[k])[0],
                                           rtol=1e-6, atol=1e-7, err_msg=k)


def test_llama_continuous_batching():
    m0, mr = _llama_models(64)
    ref_iface = TextInferenceInterface(m0, max_len=64, prompt_buckets=(16,))
    batcher = ContinuousBatcher(mr, max_len=64, max_batch=3, chunk=4,
                                cache_dtype=DType.F32,
                                prompt_buckets=(16,)).start()
    try:
        prompts = [rng.integers(0, 131, (n,)).astype(np.int64)
                   for n in (3, 8, 5)]
        futs = [batcher.submit(p, 7) for p in prompts]
        for p, f in zip(prompts, futs):
            out = f.result(timeout=120)
            ref = ref_iface.generate_tokens(p[None], 7)[0]
            np.testing.assert_array_equal(out, ref)
    finally:
        batcher.stop()


def test_server_concurrent_generate_ragged(tmp_path):
    """WS server: concurrent generate_text on a ragged-decode model runs
    through the shared batcher; all clients get correct results."""
    import asyncio
    import json as _json
    import socket
    import threading

    import torch
    from safetensors.torch import save_file
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from whisper_tensor_tpu.server.main import Server

    # tiny HF gpt2 dir
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(HFConfig(n_layer=1, n_head=2, n_embd=16,
                                  vocab_size=300, n_positions=64))
    d = tmp_path / "tiny-gpt2r"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps({
        "model_type": "gpt2", "n_layer": 1, "n_head": 2, "n_embd": 16,
        "vocab_size": 300, "n_positions": 64}))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"}, str(d / "model.safetensors"))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = Server()
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(srv.run(port=port))
        except RuntimeError:
            pass   # expected: teardown stops the loop mid-serve

    th = threading.Thread(target=run, daemon=True)
    th.start()
    import time as _time
    _time.sleep(0.3)

    from tests.test_server_cli import _WSClient

    c = _WSClient("127.0.0.1", port)
    try:
        c.send({"type": "run_loader", "loader": "transformers",
                "config": {"path": str(d), "dtype": "f32", "max_len": 64,
                           "ragged_decode": True, "prefill_chunk": 8}})
        resp = c.recv()
        assert resp["type"] == "models_report", resp
        mid = resp["loaded"][0]
        # fire 3 concurrent generates
        for k in range(3):
            c.send({"type": "generate_text", "model_id": mid,
                    "prompt": f"hi{k}", "max_new_tokens": 5,
                    "tokenizer": "bytes"})
        results = []
        for _ in range(200):
            r = c.recv()
            if r["type"] == "job_result":
                results.append(r)
                if len(results) == 3:
                    break
            assert r["type"] != "job_error", r
        assert len(results) == 3
        for r in results:
            assert isinstance(r["result"]["text"], str)
        # live scheduler observability
        c.send({"type": "get_batcher_stats", "model_id": mid})
        st = c.recv()
        assert st["type"] == "batcher_stats"
        assert st["stats"]["tokens_emitted"] >= 15
        assert st["stats"]["slots"] == 8
    finally:
        c.close()
        for bat in srv._batchers.values():
            bat.stop()
        loop.call_soon_threadsafe(loop.stop)


def test_server_cancel_batched_job(tmp_path):
    """cancel_request on a batched (ragged) generation: the job must
    come back as job_result with the partial text instead of hanging."""
    import asyncio
    import json as _json
    import socket
    import threading
    import time as _time

    import torch
    from safetensors.torch import save_file
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from whisper_tensor_tpu.server.main import Server

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(HFConfig(n_layer=1, n_head=2, n_embd=16,
                                  vocab_size=300, n_positions=256))
    d = tmp_path / "tiny-gpt2c"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps({
        "model_type": "gpt2", "n_layer": 1, "n_head": 2, "n_embd": 16,
        "vocab_size": 300, "n_positions": 256}))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"}, str(d / "model.safetensors"))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = Server()
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(srv.run(port=port))
        except RuntimeError:
            pass   # expected: teardown stops the loop mid-serve

    threading.Thread(target=run, daemon=True).start()
    _time.sleep(0.3)
    from tests.test_server_cli import _WSClient

    c = _WSClient("127.0.0.1", port)
    try:
        c.send({"type": "run_loader", "loader": "transformers",
                "config": {"path": str(d), "dtype": "f32", "max_len": 256,
                           "ragged_decode": True}})
        mid = c.recv()["loaded"][0]
        c.send({"type": "generate_text", "model_id": mid, "prompt": "hi",
                "max_new_tokens": 200, "tokenizer": "bytes"})
        job = None
        tokens_seen = 0
        result = None
        for _ in range(400):
            r = c.recv()
            if r["type"] == "job_accepted":
                job = r["job"]
            elif r["type"] == "progress" and r.get("job") == job:
                tokens_seen += 1
                if tokens_seen == 3:
                    c.send({"type": "cancel_request", "job": job})
            elif r["type"] == "cancel_ack":
                assert r["ok"] is True
            elif r["type"] == "job_result":
                result = r
                break
            assert r["type"] != "job_error", r
        assert result is not None
        assert 0 < len(result["result"]["text"]) < 200
    finally:
        c.close()
        for bat in srv._batchers.values():
            bat.stop()
        loop.call_soon_threadsafe(loop.stop)


def test_batch_pow2_cliff_guard():
    """Non-power-of-two batches sit on a measured v5e tiling cliff
    (B=768: 33k tok/s vs 80k at B=1024 — BENCH r2). The batcher rounds
    its slot count up; the interface pads-and-slices with a warning."""
    cfg, m_scalar, m_ragged = _models()
    b = ContinuousBatcher(m_ragged, max_len=64, max_batch=6, chunk=4,
                          cache_dtype=DType.F32, prompt_buckets=(16,))
    assert b.max_batch == 8          # rounded up, extra admission slots
    b.start()
    try:
        fut = b.submit(rng.integers(0, cfg.vocab_size, (5,)).astype(np.int64), 4)
        assert fut.result(timeout=120).shape == (4,)
    finally:
        b.stop()

    iface = TextInferenceInterface(m_scalar, max_len=64,
                                   prompt_buckets=(16,))
    # drop the pad threshold so the tiny test model exercises the path
    import whisper_tensor_tpu.interfaces.text as text_mod

    old = text_mod._POW2_PAD_MIN_BATCH
    text_mod._POW2_PAD_MIN_BATCH = 4
    try:
        prompts = rng.integers(0, cfg.vocab_size, (6, 5)).astype(np.int64)
        with pytest.warns(UserWarning, match="power of two"):
            toks = iface.generate_tokens(prompts, 4)
        assert toks.shape == (6, 4)
        raw = TextInferenceInterface(m_scalar, max_len=64,
                                     prompt_buckets=(16,),
                                     pad_batch_pow2=False)
        np.testing.assert_array_equal(toks, raw.generate_tokens(prompts, 4))
    finally:
        text_mod._POW2_PAD_MIN_BATCH = old


@pytest.mark.parametrize("pchunk", [None, 8])
def test_shared_prefix_kv_caching(pchunk):
    """prefix_ids (system-prompt KV caching): the prefix is prefilled
    once and broadcast into every admission; outputs must equal a
    plain batcher fed prefix+prompt, in both monolithic and chunked
    admission modes."""
    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(8, 16, 32))
    r = np.random.default_rng(17)
    prefix = r.integers(0, cfg.vocab_size, (11,)).astype(np.int64)
    b = ContinuousBatcher(m_ragged, max_len=64, max_batch=2, chunk=3,
                          cache_dtype=DType.F32,
                          prompt_buckets=(8, 16, 32),
                          prefill_chunk=pchunk,
                          prefix_ids=prefix).start()
    try:
        jobs = []
        for L, n in ((3, 7), (9, 5), (6, 8), (13, 4)):
            s = r.integers(0, cfg.vocab_size, (L,)).astype(np.int64)
            jobs.append((s, n, b.submit(s, n)))
        for s, n, f in jobs:
            out = f.result(timeout=180)
            full = np.concatenate([prefix, s])
            ref = ref_iface.generate_tokens(full[None], n)[0]
            np.testing.assert_array_equal(out, ref, err_msg=f"L={len(s)}")
    finally:
        b.stop()


def test_cancel_mid_generation_and_queued():
    """Cancellation (reference scheduler cancellation registry): a
    cancelled running request resolves with the tokens emitted so far
    (a prefix of the sequential reference) and frees its slot; a
    cancelled queued request resolves empty; the batcher keeps serving
    afterwards."""
    import time

    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16,))
    b = ContinuousBatcher(m_ragged, max_len=64, max_batch=1, chunk=2,
                          cache_dtype=DType.F32, prompt_buckets=(16,)).start()
    try:
        p = rng.integers(0, cfg.vocab_size, (5,)).astype(np.int64)
        got = []
        fut = b.submit(p, 40, on_token=lambda t: got.append(t))
        # a queued request behind it (max_batch=1), cancelled in queue
        fq = b.submit(p, 10)
        assert b.cancel(fq)
        while len(got) < 4:               # let it stream a bit
            time.sleep(0.01)
        assert b.cancel(fut)
        out = fut.result(timeout=60)
        assert 0 < len(out) < 40
        ref = ref_iface.generate_tokens(p[None], 40)[0]
        np.testing.assert_array_equal(out, ref[:len(out)])
        assert fq.result(timeout=60).shape == (0,)
        assert not b.cancel(fut)          # already finished
        # slot is reusable and results are unpolluted
        out2 = b.submit(p, 6).result(timeout=60)
        np.testing.assert_array_equal(out2, ref[:6])
    finally:
        b.stop()


def test_chunked_prefill_matches_sequential():
    """prefill_chunk: long prompts admit in fixed-width pieces, one
    per scheduler tick (decode chunks interleave between pieces) —
    outputs must still equal the sequential reference exactly, for
    ragged lengths crossing piece boundaries and for short prompts
    that take the monolithic path."""
    cfg, m_scalar, m_ragged = _models(max_len=64)
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(8, 16, 32))
    b = ContinuousBatcher(m_ragged, max_len=64, max_batch=4, chunk=3,
                          cache_dtype=DType.F32,
                          prompt_buckets=(8, 16, 32),
                          prefill_chunk=8).start()
    try:
        r = np.random.default_rng(13)
        # lengths straddle piece boundaries: 3 (short path), 9, 16, 23
        jobs = []
        for L, n in ((3, 6), (9, 8), (16, 5), (23, 7), (14, 9), (5, 4)):
            p = r.integers(0, cfg.vocab_size, (L,)).astype(np.int64)
            jobs.append((p, n, b.submit(p, n)))
        for p, n, f in jobs:
            out = f.result(timeout=180)
            ref = ref_iface.generate_tokens(p[None], n)[0]
            np.testing.assert_array_equal(out, ref, err_msg=f"L={len(p)}")
        # the piece path really ran (some bucket > prefill_chunk)
        assert any(k[0] == "piece" for k in b._programs)
        assert any(k[0] == "splice" for k in b._programs)
    finally:
        b.stop()


def test_tick_failure_fails_futures_and_recovers():
    """A failure inside the scheduler tick (poisoned program, OOM, a
    dropped device tunnel) must fail every outstanding future with the
    cause — not hang them — and the batcher must recover and serve
    later requests correctly (reference scheduler.rs reports per-job
    Err the same way instead of dying)."""
    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16,))
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=2, chunk=4,
                                cache_dtype=DType.F32, prompt_buckets=(16,))

    real = batcher._chunk_program
    state = {"boom": 1}

    def poisoned(flags, la=True, *args):
        if state["boom"]:
            state["boom"] -= 1
            raise RuntimeError("injected device failure")
        return real(flags, la, *args)

    batcher._chunk_program = poisoned
    batcher.start()
    try:
        p = rng.integers(0, cfg.vocab_size, (5,)).astype(np.int64)
        fut = batcher.submit(p, 6)
        with pytest.raises(RuntimeError, match="injected device failure"):
            fut.result(timeout=120)
        # recovered: fresh caches + row state, later requests are exact
        p2 = rng.integers(0, cfg.vocab_size, (7,)).astype(np.int64)
        out = batcher.submit(p2, 5).result(timeout=120)
        np.testing.assert_array_equal(
            out, ref_iface.generate_tokens(p2[None], 5)[0])
    finally:
        batcher.stop()


def test_pipelined_slot_churn_matches_sequential():
    """Stress the pipelined scheduler: many short ragged requests churn
    through few slots (admissions land while a chunk is in flight, and
    finished rows keep decoding until their park update applies) — every
    request must still match the sequential reference exactly."""
    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16,))
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=2, chunk=5,
                                cache_dtype=DType.F32,
                                prompt_buckets=(16,)).start()
    try:
        r = np.random.default_rng(11)
        jobs = []
        for k in range(9):
            p = r.integers(0, cfg.vocab_size, (int(r.integers(2, 14)),)
                           ).astype(np.int64)
            n = int(r.integers(1, 12))
            jobs.append((p, n, batcher.submit(p, n)))
        for p, n, f in jobs:
            out = f.result(timeout=180)
            ref = ref_iface.generate_tokens(p[None], n)[0]
            np.testing.assert_array_equal(out, ref)
    finally:
        batcher.stop()


def test_admission_coalescing_matches_sequential():
    """admit_coalesce_s groups arrivals before the prefill dispatch;
    an idle device must still admit immediately (the idle rule), and
    staggered arrivals under a large deadline must produce exactly the
    sequential outputs."""
    import time as _t

    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16,))
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=4, chunk=3,
                                admit_coalesce_s=30.0,   # deadline unhit
                                cache_dtype=DType.F32,
                                prompt_buckets=(16,)).start()
    try:
        r = np.random.default_rng(7)
        # idle device: the first request must not wait out the deadline
        p0 = r.integers(0, cfg.vocab_size, (5,)).astype(np.int64)
        t0 = _t.time()
        out0 = batcher.submit(p0, 4).result(timeout=120)
        assert _t.time() - t0 < 25, "idle admission waited on coalesce"
        np.testing.assert_array_equal(
            out0, ref_iface.generate_tokens(p0[None], 4)[0])
        # staggered arrivals while rows are decoding: grouped admission
        # (deadline never fires; groups form on fill-the-free-slots or
        # idle) must still match the sequential reference
        jobs = []
        for k in range(8):
            p = r.integers(0, cfg.vocab_size, (int(r.integers(2, 12)),)
                           ).astype(np.int64)
            n = int(r.integers(4, 14))
            jobs.append((p, n, batcher.submit(p, n)))
            _t.sleep(0.02)
        for p, n, f in jobs:
            out = f.result(timeout=180)
            np.testing.assert_array_equal(
                out, ref_iface.generate_tokens(p[None], n)[0])
    finally:
        batcher.stop()


def test_adaptive_chunk_max_matches_sequential():
    """chunk_max long-chunk dispatch (steady-state throughput mode):
    long scans engage only when the queue is empty and every live row
    has >= chunk_max tokens left; outputs must equal the sequential
    reference exactly, including rows admitted mid-stream and rows
    whose tails force fallback to the short chunk."""
    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16,))
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=2, chunk=2,
                                chunk_max=8, cache_dtype=DType.F32,
                                prompt_buckets=(16,)).start()
    try:
        r = np.random.default_rng(23)
        # long generations (engage chunk_max) mixed with short ones
        # (force the per-row remaining check back to the short chunk)
        jobs = []
        for n in (30, 27, 3, 25, 5, 18):
            p = r.integers(0, cfg.vocab_size, (int(r.integers(2, 12)),)
                           ).astype(np.int64)
            jobs.append((p, n, batcher.submit(p, n)))
        for p, n, f in jobs:
            out = f.result(timeout=180)
            ref = ref_iface.generate_tokens(p[None], n)[0]
            np.testing.assert_array_equal(out, ref)
        assert batcher.stats()["chunk_max"] == 8
    finally:
        batcher.stop()


def test_per_request_sampling():
    """Per-row sampling params inside the shared chunk program
    (net-beyond the reference scheduler's shared generation config):
    greedy, top_k=1 sampled, and tiny-temperature rows must all equal
    the sequential greedy reference while batched together with a
    hot-temperature row, and a huge-presence-penalty row never repeats
    a token (counts track prompt + generated per row)."""
    from whisper_tensor_tpu.interfaces.text import SamplingParams

    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16, 32))
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=4, chunk=4,
                                cache_dtype=DType.F32,
                                prompt_buckets=(16, 32)).start()
    try:
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int64)
                   for n in (5, 8, 3, 6)]
        sps = [None,                                     # plain greedy row
               SamplingParams(temperature=0.7, top_k=1, seed=3),
               SamplingParams(temperature=1e-5, seed=9),
               SamplingParams(temperature=1.3, top_p=0.9, seed=11)]
        futs = [batcher.submit(p, 10, sampling=sp)
                for p, sp in zip(prompts, sps)]
        outs = [f.result(timeout=180) for f in futs]
        for i in (0, 1, 2):    # all three are greedy-equivalent
            ref = ref_iface.generate_tokens(prompts[i][None], 10)[0]
            np.testing.assert_array_equal(outs[i], ref, err_msg=f"row {i}")
        assert outs[3].shape == (10,)
        assert ((outs[3] >= 0) & (outs[3] < cfg.vocab_size)).all()

        # presence penalty -> no token (prompt or generated) repeats
        p = rng.integers(0, cfg.vocab_size, (6,)).astype(np.int64)
        p = np.unique(p)  # distinct prompt tokens
        sp = SamplingParams(temperature=1e-5, presence_penalty=1e9, seed=2)
        out = batcher.submit(p, 12, sampling=sp).result(timeout=180)
        emitted = list(p) + list(out)
        assert len(set(emitted)) == len(emitted), emitted

        # slot reuse after a penalty tenant: a fresh greedy request in
        # (possibly) the same slot is unaffected by stale counts
        q = rng.integers(0, cfg.vocab_size, (5,)).astype(np.int64)
        ref = ref_iface.generate_tokens(q[None], 8)[0]
        np.testing.assert_array_equal(
            batcher.submit(q, 8).result(timeout=180), ref)
    finally:
        batcher.stop()


def test_per_request_sampling_chunked_prefill():
    """Per-row sampling composes with chunked-prefill admission: the
    admission-tail first token honors the request's own params."""
    from whisper_tensor_tpu.interfaces.text import SamplingParams

    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16, 32))
    batcher = ContinuousBatcher(m_ragged, max_len=64, max_batch=2, chunk=4,
                                cache_dtype=DType.F32, prefill_chunk=8,
                                prompt_buckets=(16, 32)).start()
    try:
        p = rng.integers(0, cfg.vocab_size, (20,)).astype(np.int64)
        ref = ref_iface.generate_tokens(p[None], 6)[0]
        out = batcher.submit(
            p, 6, sampling=SamplingParams(temperature=0.5, top_k=1,
                                          seed=4)).result(timeout=180)
        np.testing.assert_array_equal(out, ref)
    finally:
        batcher.stop()


def test_multi_lora_serving():
    """Per-request LoRA adapters inside ONE batched decode program
    (multi-LoRA serving, net-beyond the reference): each request's
    tokens equal a single-model reference with that adapter merged
    into the base weights. Covers base + two adapters sharing slots,
    monolithic AND chunked-prefill admission."""
    max_len = 64
    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=211,
                     n_positions=max_len)
    wg = random_gpt2_weights(cfg)
    targets = [("wfc_0", "transformer.h.0.mlp.c_fc.weight"),
               ("wqkv_1", "transformer.h.1.attn.c_attn.weight")]

    def mk_adapter(seed):
        r = np.random.default_rng(seed)
        out = {}
        for wname, hf in targets:
            K, N = wg(hf).shape
            out[wname] = (
                (r.standard_normal((K, 4)) * 0.05).astype(np.float32),
                (r.standard_normal((4, N)) * 0.05).astype(np.float32),
                0.5)
        return out

    adapters = {"fr": mk_adapter(31), "de": mk_adapter(32)}

    def merged_getter(ad):
        def g(name):
            W = np.array(wg(name))
            for wname, hf in targets:
                if name == hf and ad is not None and wname in ad:
                    A, B, s = ad[wname]
                    W = W + A @ B * s
            return W
        return g

    def run_batcher(**kw):
        m_ragged = Model.new_from_onnx(build_gpt2_step(
            wg, cfg, max_len=max_len, dtype=DType.F32, pos_per_row=True))
        bat = ContinuousBatcher(m_ragged, max_len=max_len, max_batch=4,
                                chunk=4, cache_dtype=DType.F32,
                                prompt_buckets=(16,), adapters=adapters,
                                **kw).start()
        try:
            prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int64)
                       for n in (5, 8, 3, 6, 4)]
            names = [None, "fr", "de", "fr", None]
            futs = [bat.submit(p, 7, adapter=a)
                    for p, a in zip(prompts, names)]
            outs = [f.result(timeout=180) for f in futs]
            with pytest.raises(ValueError):
                bat.submit(prompts[0], 4, adapter="nope")
        finally:
            bat.stop()
        return prompts, names, outs

    refs = {}
    for label, kw in [("mono", {}), ("chunked", {"prefill_chunk": 4})]:
        prompts, names, outs = run_batcher(**kw)
        for p, a, out in zip(prompts, names, outs):
            key = (a, tuple(p))
            if key not in refs:
                ref_m = Model.new_from_onnx(build_gpt2_step(
                    merged_getter(adapters.get(a)), cfg, max_len=max_len,
                    dtype=DType.F32))
                refs[key] = TextInferenceInterface(
                    ref_m, max_len=max_len,
                    prompt_buckets=(16,)).generate_tokens(p[None], 7)[0]
            np.testing.assert_array_equal(out, refs[key], err_msg=label)


def test_multi_lora_validation():
    """Bad adapter targets fail loudly at install time."""
    max_len = 32
    cfg = GPT2Config(n_layer=1, n_head=2, n_embd=32, vocab_size=211,
                     n_positions=max_len)
    wg = random_gpt2_weights(cfg)
    m = Model.new_from_onnx(build_gpt2_step(
        wg, cfg, max_len=max_len, dtype=DType.F32, pos_per_row=True))
    with pytest.raises(ValueError, match="not runtime weight inputs"):
        ContinuousBatcher(
            m, max_len=max_len, cache_dtype=DType.F32,
            prompt_buckets=(16,),
            adapters={"a": {"no_such_weight": (
                np.zeros((4, 2), np.float32),
                np.zeros((2, 4), np.float32), 1.0)}})


@pytest.mark.parametrize("pchunk", [None, 4])
def test_multi_lora_with_shared_prefix(pchunk):
    """Per-adapter prefix KV caches: a prefix+adapter request equals
    the MERGED model fed prefix+prompt with no prefix cache at all —
    i.e. the shared prefix is computed UNDER each request's adapter.
    Covers monolithic AND chunked-prefill admission."""
    max_len = 64
    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=211,
                     n_positions=max_len)
    wg = random_gpt2_weights(cfg)
    hfname = "transformer.h.0.mlp.c_fc.weight"
    K, N = wg(hfname).shape
    r = np.random.default_rng(41)
    A = (r.standard_normal((K, 4)) * 0.1).astype(np.float32)
    B = (r.standard_normal((4, N)) * 0.1).astype(np.float32)
    adapters = {"fr": {"wfc_0": (A, B, 0.5)}}
    prefix = rng.integers(0, cfg.vocab_size, (6,)).astype(np.int64)

    m_ragged = Model.new_from_onnx(build_gpt2_step(
        wg, cfg, max_len=max_len, dtype=DType.F32, pos_per_row=True))
    bat = ContinuousBatcher(m_ragged, max_len=max_len, max_batch=4,
                            chunk=4, cache_dtype=DType.F32,
                            prompt_buckets=(16,), prefix_ids=prefix,
                            prefill_chunk=pchunk,
                            adapters=adapters).start()
    try:
        p1 = rng.integers(0, cfg.vocab_size, (5,)).astype(np.int64)
        p2 = rng.integers(0, cfg.vocab_size, (7,)).astype(np.int64)
        f1 = bat.submit(p1, 6)
        f2 = bat.submit(p2, 6, adapter="fr")
        out_base, out_ad = f1.result(timeout=180), f2.result(timeout=180)
    finally:
        bat.stop()

    def merged_g(name):
        W = np.array(wg(name))
        if name == hfname:
            W = W + A @ B * 0.5
        return W

    ref_base = TextInferenceInterface(
        Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=max_len,
                                            dtype=DType.F32)),
        max_len=max_len, prompt_buckets=(16,)).generate_tokens(
        np.concatenate([prefix, p1])[None], 6)[0]
    ref_ad = TextInferenceInterface(
        Model.new_from_onnx(build_gpt2_step(merged_g, cfg,
                                            max_len=max_len,
                                            dtype=DType.F32)),
        max_len=max_len, prompt_buckets=(16,)).generate_tokens(
        np.concatenate([prefix, p2])[None], 6)[0]
    np.testing.assert_array_equal(out_base, ref_base)
    np.testing.assert_array_equal(out_ad, ref_ad)


def test_multi_lora_base_variant_switching():
    """With adapters installed but no adapter rows live, the batcher
    runs the adapter-free program variant; switching to adapter
    traffic and back stays token-exact (device row state carries
    across program variants)."""
    max_len = 64
    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=211,
                     n_positions=max_len)
    wg = random_gpt2_weights(cfg)
    hfname = "transformer.h.0.mlp.c_fc.weight"
    K, N = wg(hfname).shape
    r = np.random.default_rng(77)
    A = (r.standard_normal((K, 4)) * 0.1).astype(np.float32)
    B = (r.standard_normal((4, N)) * 0.1).astype(np.float32)

    m_ragged = Model.new_from_onnx(build_gpt2_step(
        wg, cfg, max_len=max_len, dtype=DType.F32, pos_per_row=True))
    bat = ContinuousBatcher(m_ragged, max_len=max_len, max_batch=2,
                            chunk=4, cache_dtype=DType.F32,
                            prompt_buckets=(16,),
                            adapters={"fr": {"wfc_0": (A, B, 0.5)}})
    bat.start()
    try:
        p = rng.integers(0, cfg.vocab_size, (5,)).astype(np.int64)
        out_b1 = bat.submit(p, 6).result(timeout=180)      # base variant
        out_ad = bat.submit(p, 6, adapter="fr").result(timeout=180)
        out_b2 = bat.submit(p, 6).result(timeout=180)      # back to base
    finally:
        bat.stop()
    np.testing.assert_array_equal(out_b1, out_b2)

    ref_base = TextInferenceInterface(
        Model.new_from_onnx(build_gpt2_step(wg, cfg, max_len=max_len,
                                            dtype=DType.F32)),
        max_len=max_len, prompt_buckets=(16,)).generate_tokens(
        p[None], 6)[0]
    np.testing.assert_array_equal(out_b1, ref_base)

    def merged_g(name):
        W = np.array(wg(name))
        if name == hfname:
            W = W + A @ B * 0.5
        return W
    ref_ad = TextInferenceInterface(
        Model.new_from_onnx(build_gpt2_step(merged_g, cfg,
                                            max_len=max_len,
                                            dtype=DType.F32)),
        max_len=max_len, prompt_buckets=(16,)).generate_tokens(
        p[None], 6)[0]
    np.testing.assert_array_equal(out_ad, ref_ad)


def test_auto_prefix_caching_matches_sequential():
    """auto_prefix: requests sharing a >=32-token prompt prefix reuse
    the pool entry (prefilling only the remainder) and must match the
    sequential reference exactly; the pool registers hits and respects
    its LRU cap."""
    cfg, m_scalar, m_ragged = _models(max_len=96)
    ref_iface = TextInferenceInterface(m_scalar, max_len=96,
                                       prompt_buckets=(16, 32, 64))
    batcher = ContinuousBatcher(m_ragged, max_len=96, max_batch=2, chunk=4,
                                cache_dtype=DType.F32, auto_prefix=2,
                                prompt_buckets=(16, 32, 64)).start()
    try:
        r = np.random.default_rng(31)
        base = r.integers(0, cfg.vocab_size, (40,)).astype(np.int64)
        jobs = []
        # seed the pool (miss), then three shared-prefix variants (hits)
        for tail_len in (3, 7, 2, 11):
            p = np.concatenate([base,
                                r.integers(0, cfg.vocab_size, (tail_len,))
                                .astype(np.int64)])
            f = batcher.submit(p, 6)
            f.result(timeout=180)      # serialize so reuse is observable
            jobs.append((p, f))
        for p, f in jobs:
            ref = ref_iface.generate_tokens(p[None], 6)[0]
            np.testing.assert_array_equal(f.result(), ref)
        st = batcher.stats()["auto_prefix"]
        assert st["hits"] >= 3, st
        assert st["pool"] <= 2, st      # LRU cap respected
        # an unrelated short prompt neither hits nor poisons the pool
        q = r.integers(0, cfg.vocab_size, (9,)).astype(np.int64)
        out = batcher.submit(q, 5).result(timeout=180)
        np.testing.assert_array_equal(
            out, ref_iface.generate_tokens(q[None], 5)[0])
    finally:
        batcher.stop()


def test_auto_prefix_mixed_group_partitions():
    """A single admission wave mixing hit and miss rows partitions into
    per-plen prefill groups; every output stays exact."""
    cfg, m_scalar, m_ragged = _models(max_len=96)
    ref_iface = TextInferenceInterface(m_scalar, max_len=96,
                                       prompt_buckets=(16, 32, 64))
    batcher = ContinuousBatcher(m_ragged, max_len=96, max_batch=4, chunk=3,
                                cache_dtype=DType.F32, auto_prefix=4,
                                prompt_buckets=(16, 32, 64)).start()
    try:
        r = np.random.default_rng(37)
        base = r.integers(0, cfg.vocab_size, (33,)).astype(np.int64)
        # seed the pool
        batcher.submit(base[:33], 4).result(timeout=180)
        # one wave: two prefix-sharing prompts + two unrelated
        prompts = [
            np.concatenate([base, r.integers(0, cfg.vocab_size, (5,))
                            .astype(np.int64)]),
            np.concatenate([base, r.integers(0, cfg.vocab_size, (2,))
                            .astype(np.int64)]),
            r.integers(0, cfg.vocab_size, (12,)).astype(np.int64),
            r.integers(0, cfg.vocab_size, (6,)).astype(np.int64),
        ]
        futs = [batcher.submit(p, 5) for p in prompts]
        for p, f in zip(prompts, futs):
            ref = ref_iface.generate_tokens(p[None], 5)[0]
            np.testing.assert_array_equal(f.result(timeout=180), ref)
        assert batcher.stats()["auto_prefix"]["hits"] >= 2
    finally:
        batcher.stop()


def test_shared_iface_across_batchers():
    """bench sweep support: two sequential batchers over ONE
    TextInferenceInterface (weights + compiled-program cache shared)
    must each reproduce the sequential per-request generations — the
    8B client-count sweep relies on this to pay the model build once."""
    cfg, m_scalar, m_ragged = _models()
    ref_iface = TextInferenceInterface(m_scalar, max_len=64,
                                       prompt_buckets=(16, 32))
    shared = TextInferenceInterface(m_ragged, max_len=64,
                                    cache_dtype=DType.F32,
                                    prompt_buckets=(16, 32))
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int64)
               for n in (3, 7, 12, 5)]
    refs = [ref_iface.generate_tokens(p[None], 8)[0] for p in prompts]
    for max_batch in (2, 4):
        b = ContinuousBatcher(None, max_len=64, max_batch=max_batch,
                              chunk=4, iface=shared).start()
        try:
            outs = [f.result(timeout=120)
                    for f in [b.submit(p, 8) for p in prompts]]
            for out, ref in zip(outs, refs):
                np.testing.assert_array_equal(out, ref)
        finally:
            b.stop()
    with pytest.raises(ValueError):
        ContinuousBatcher(None, max_len=32, iface=shared)


def test_window_admission_matches_sequential():
    """Bucket-sized admission (window step graph + partial-width
    scatter + max_admit cap) must be token-exact vs the sequential
    reference: positions >= bucket keep stale tenant KV, hidden by the
    position mask until decode overwrites them (the 8B N=256 OOM fix
    relies on exactly this discipline)."""
    from whisper_tensor_tpu.importers.onnx_builder import WeightStorage

    max_len = 64
    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=211,
                     n_positions=max_len)
    wg = random_gpt2_weights(cfg)
    m_scalar = Model.new_from_onnx(
        build_gpt2_step(wg, cfg, max_len=max_len, dtype=DType.F32))
    m_ragged = Model.new_from_onnx(
        build_gpt2_step(wg, cfg, max_len=max_len, dtype=DType.F32,
                        pos_per_row=True))
    wmod = Model.new_from_onnx(
        build_gpt2_step(wg, cfg, max_len=16, dtype=DType.F32,
                        pos_per_row=True, storage=WeightStorage.none()),
        name="w16")
    wmod.graph.store = m_ragged.graph.store
    iface = TextInferenceInterface(m_ragged, max_len=max_len,
                                   cache_dtype=DType.F32,
                                   prompt_buckets=(16, 32),
                                   window_models={16: wmod})
    ref = TextInferenceInterface(m_scalar, max_len=max_len,
                                 prompt_buckets=(16, 32))
    b = ContinuousBatcher(None, max_len=max_len, max_batch=4, chunk=4,
                          iface=iface, max_admit=2).start()
    try:
        prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int64)
                   for n in (3, 7, 12, 5, 9, 14)]
        # two generations per slot so slot REUSE crosses the stale
        # region beyond the 16-token window
        for _ in range(2):
            futs = [b.submit(p, 9) for p in prompts]
            outs = [f.result(timeout=120) for f in futs]
            for p, out in zip(prompts, outs):
                np.testing.assert_array_equal(
                    out, ref.generate_tokens(p[None], 9)[0])
        # the window admission program was actually used (not the
        # full-length fallback): bucket-16 prompts hit ("prefill",16,..)
        # compiled against window cache dims
        assert any(k[0] == "prefill" and k[1] == 16
                   for k in b._programs), list(b._programs)
        # the window branch's preconditions held, so that program IS
        # the window variant (batching.py _prefill_insert_program)
        assert 16 in iface._window_millis
        assert len(iface.adapter_slots) <= 1
    finally:
        b.stop()
