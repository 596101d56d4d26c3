"""Infer-ablation validation over real model graphs (reference
tests/validate_infer.rs): for every milli op in a lowered GPT-2 step
graph, infer() at every knowledge level must never contradict eval."""

import numpy as np

from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (GPT2Config,
                                                           build_gpt2_step,
                                                           random_gpt2_weights)
from whisper_tensor_tpu.milli.validate_infer import validate_infer
from whisper_tensor_tpu.model import Model


def test_infer_never_contradicts_eval_on_gpt2_graph():
    cfg = GPT2Config(n_layer=1, n_head=2, n_embd=16, vocab_size=50,
                     n_positions=32)
    data = build_gpt2_step(random_gpt2_weights(cfg), cfg, max_len=32)
    model = Model.new_from_onnx(data)
    milli, weight_inputs = model.graph.to_milli()
    rng = np.random.default_rng(0)
    feeds = {"input_ids": rng.integers(0, 50, (1, 4)).astype(np.int64),
             "pos": np.asarray(0, dtype=np.int64)}
    for i in range(cfg.n_layer):
        feeds[f"cache_k_{i}"] = np.zeros((1, 2, 32, 8), dtype=np.float32)
        feeds[f"cache_v_{i}"] = np.zeros((1, 2, 32, 8), dtype=np.float32)
    for name in weight_inputs:
        feeds[name] = model.graph.store.get_numeric(name).numpy()
    report = validate_infer(milli, feeds)
    assert report.checked_ops > 30
    assert report.checked_combos > 200
    assert report.ok, [f"{v.op_kind}{v.levels}: {v.message}"
                       for v in report.violations[:5]]
