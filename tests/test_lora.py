"""LoRA adapter injection + training.

Reference equivalent: examples/rwkv_lora_train.rs — low-rank adapters
trained through the milli training artifact with the base weights
frozen. Here the adapters come from milli graph surgery
(milli.transforms.inject_lora) and train through BOTH paths: the
jax.grad LMTrainer and the symbolic milli training graph.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.milli.ir import MilliGraph
from whisper_tensor_tpu.milli.ops import MatMul
from whisper_tensor_tpu.milli.transforms import inject_lora

rng = np.random.default_rng(0)


def _linear_graph(K=6, N=5):
    g = MilliGraph("lin")
    x = g.add_input("x")
    w = g.add_input("W")
    g.mark_output("y", g.op1(MatMul(), x, w))
    return g


def test_lora_math_matches_torch():
    """forward AND adapter grads pinned against torch's manual
    x @ (W + A@B*alpha/r) formulation (the PEFT LoRA math)."""
    import jax
    import torch

    from whisper_tensor_tpu.backends.xla.compiler import _trace_graph

    W = rng.standard_normal((6, 5)).astype(np.float32)
    g = _linear_graph()
    ad = inject_lora(g, ["W"], rank=2, weight_getter=lambda n: W,
                     alpha=4.0, seed=1)
    assert sorted(ad) == ["W::lora_a", "W::lora_b"]
    assert ad["W::lora_a"].shape == (6, 2)
    assert ad["W::lora_b"].shape == (2, 5)
    assert not ad["W::lora_b"].any()          # zero-init: starts at base
    ad["W::lora_b"] = rng.standard_normal((2, 5)).astype(np.float32)
    x = rng.standard_normal((3, 6)).astype(np.float32)

    out = g.eval({"x": x, "W": W, **ad})["y"]
    scale = 4.0 / 2
    ref = x @ (W + ad["W::lora_a"] @ ad["W::lora_b"] * scale)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    xt, Wt = torch.tensor(x), torch.tensor(W)
    At = torch.tensor(ad["W::lora_a"], requires_grad=True)
    Bt = torch.tensor(ad["W::lora_b"], requires_grad=True)
    ((xt @ (Wt + At @ Bt * scale)) ** 2).mean().backward()

    fn = _trace_graph(g, {})
    order = list(g.inputs)

    def loss(a, b):
        by = {"x": x, "W": W, "W::lora_a": a, "W::lora_b": b}
        yv = dict(zip(g.outputs, fn(*[by[n] for n in order])))["y"]
        return (yv ** 2).mean()

    ga, gb = jax.grad(loss, argnums=(0, 1))(ad["W::lora_a"],
                                            ad["W::lora_b"])
    np.testing.assert_allclose(np.asarray(ga), At.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), Bt.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_lora_zero_init_preserves_base_outputs():
    """With B=0 the adapted graph must equal the base graph exactly."""
    W = rng.standard_normal((8, 4)).astype(np.float32)
    x = rng.standard_normal((2, 8)).astype(np.float32)
    base = _linear_graph(8, 4).eval({"x": x, "W": W})["y"]
    g = _linear_graph(8, 4)
    ad = inject_lora(g, ["W"], rank=3, weight_getter=lambda n: W)
    out = g.eval({"x": x, "W": W, **ad})["y"]
    np.testing.assert_array_equal(out, base)


def test_lora_milli_training_artifact():
    """Adapters train through the SYMBOLIC training graph (autodiff +
    optimizer as milli ops): grads exist only for adapters, and they
    match jax.grad over the same graph."""
    import jax

    from whisper_tensor_tpu.backends.xla.compiler import _trace_graph
    from whisper_tensor_tpu.milli.training_graph import build_training_graph
    from whisper_tensor_tpu.tensor_info import TensorInfo

    W = rng.standard_normal((6, 4)).astype(np.float32)
    g = _linear_graph(6, 4)
    ad = inject_lora(g, ["W"], rank=2, weight_getter=lambda n: W, seed=3)
    ad["W::lora_b"] = 0.1 * rng.standard_normal((2, 4)).astype(np.float32)
    x = rng.standard_normal((3, 6)).astype(np.float32)
    tgt = rng.standard_normal((3, 4)).astype(np.float32)

    adapter_names = sorted(ad)
    train, meta = build_training_graph(
        g, adapter_names, "y", loss="mse",
        input_infos={"x": TensorInfo.numeric(x),
                     "W": TensorInfo.numeric(W),
                     **{n: TensorInfo.numeric(v) for n, v in ad.items()}})
    assert set(meta.param_to_grad) == set(adapter_names)
    feeds = {"x": x, "W": W, "target": tgt, **ad}
    out = train.eval(feeds)

    fn = _trace_graph(g, {})
    order = list(g.inputs)

    def loss(a, b):
        by = {"x": x, "W": W, "W::lora_a": a, "W::lora_b": b}
        yv = dict(zip(g.outputs, fn(*[by[n] for n in order])))["y"]
        return ((yv - tgt) ** 2).mean()

    ga, gb = jax.grad(loss, argnums=(0, 1))(ad["W::lora_a"],
                                            ad["W::lora_b"])
    np.testing.assert_allclose(out["grad::W::lora_a"], np.asarray(ga),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out["grad::W::lora_b"], np.asarray(gb),
                               rtol=1e-4, atol=1e-5)


def test_lora_trainer_only_adapters_change():
    """LMTrainer(lora_rank=r): the trained pytree contains ONLY adapter
    tensors, training reduces the loss, and the base weights the step
    program uses stay bitwise identical."""
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_train, random_gpt2_weights)
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.training.trainer import LMTrainer

    cfg = GPT2Config(n_layer=1, n_head=2, n_embd=32, vocab_size=64,
                     n_positions=32)
    model = Model.new_from_onnx(
        build_gpt2_train(random_gpt2_weights(cfg), cfg))
    trainer = LMTrainer(model, optimizer="adamw", lr=1e-2, lora_rank=2,
                        lora_targets=["wqkv", "wproj", "wfc", "wmp"])
    params = trainer.init_params()
    assert params and all("::lora_" in n for n in params)
    frozen_before = {n: np.asarray(v)
                     for n, v in trainer._frozen_params().items()}
    adapters_before = {n: np.asarray(v) for n, v in params.items()}
    opt_state = trainer.init_opt_state(params)

    r = np.random.default_rng(1)
    # fixed batch: the loss on a constant batch must drop under adamw
    pat = r.integers(1, 64, (4, 8))
    seq = np.concatenate([pat, pat], axis=1)
    losses = []
    for _ in range(12):
        params, opt_state, loss = trainer.train_step(
            params, opt_state, seq[:, :-1], seq[:, 1:])
        losses.append(float(np.asarray(loss)))
    assert min(losses[-3:]) < losses[0]
    assert any(not np.array_equal(np.asarray(params[n]), adapters_before[n])
               for n in params)
    for n, v in trainer._frozen_params().items():
        np.testing.assert_array_equal(np.asarray(v), frozen_before[n])


def test_lora_with_fsdp_mesh():
    """fsdp=True + lora_rank: frozen base weights shard over dp, tiny
    adapters stay replicated, and the step runs (regression: the
    sharding-constraint block used to KeyError on adapter names)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_train, random_gpt2_weights)
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.parallel.mesh import make_mesh
    from whisper_tensor_tpu.training.trainer import LMTrainer

    cfg = GPT2Config(n_layer=1, n_head=4, n_embd=64, vocab_size=64,
                     n_positions=32)
    model = Model.new_from_onnx(
        build_gpt2_train(random_gpt2_weights(cfg), cfg))
    mesh = make_mesh(dp=4, sp=1, tp=2)
    tr = LMTrainer(model, optimizer="adamw", lr=1e-2, mesh=mesh,
                   fsdp=True, fsdp_min_size=4096, lora_rank=2,
                   lora_targets=["wqkv", "wproj"])
    params = tr.init_params()
    opt = tr.init_opt_state(params)
    r = np.random.default_rng(2)
    ids = r.integers(0, 64, (4, 9))
    params, opt, loss = tr.train_step(params, opt, ids[:, :-1], ids[:, 1:])
    assert np.isfinite(float(np.asarray(loss)))
    frozen = tr._frozen_params()
    assert any("dp" in tuple(v.sharding.spec)
               for v in frozen.values() if v.ndim == 2)


def test_lora_example_smoke():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "examples/lora_train.py", "--smoke"],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    assert "adapters:" in out.stdout


def test_int8_frozen_lora_trainer_and_peft_round_trip(tmp_path):
    """LoRA fine-tuning over an int8-FROZEN llama base (the 8B-on-one-
    chip recipe): loss falls, and the trained adapters round-trip
    through the standard PEFT directory format (save_peft_adapter ->
    load_peft_adapter_arrays), closing the loop the reference aspires
    to in examples/rwkv_lora_train.rs."""
    import numpy as np

    from whisper_tensor_tpu.dtype import DType
    from whisper_tensor_tpu.importers.lora import (load_peft_adapter_arrays,
                                                   save_peft_adapter)
    from whisper_tensor_tpu.importers.recipes.llm.llama import (
        LlamaConfig, build_llama_train)
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.training.trainer import LMTrainer

    cfg = LlamaConfig(model_type="llama", hidden_size=128,
                      intermediate_size=256, num_attention_heads=4,
                      num_key_value_heads=2, num_hidden_layers=2,
                      vocab_size=512, rms_norm_eps=1e-5)
    rng = np.random.default_rng(0)
    cache = {}

    def getter(n):
        if n not in cache:
            if "embed" in n:
                shp = (cfg.vocab_size, cfg.hidden_size)
            elif "norm" in n or "layernorm" in n:
                shp = (cfg.hidden_size,)
            elif "q_proj" in n or "o_proj" in n:
                shp = (cfg.hidden_size, cfg.hidden_size)
            elif "k_proj" in n or "v_proj" in n:
                shp = (cfg.hidden_size // 2, cfg.hidden_size)
            elif "gate_proj" in n or "up_proj" in n:
                shp = (cfg.intermediate_size, cfg.hidden_size)
            elif "down_proj" in n:
                shp = (cfg.hidden_size, cfg.intermediate_size)
            elif "lm_head" in n:
                shp = (cfg.vocab_size, cfg.hidden_size)
            else:
                raise KeyError(n)
            v = (rng.standard_normal(shp) * 0.05).astype(np.float32)
            if "norm" in n or "layernorm" in n:
                v = np.ones(shp, np.float32)
            cache[n] = v
        return cache[n]

    wm = {}
    m = Model.new_from_onnx(build_llama_train(getter, cfg, max_len=64,
                                              weight_map=wm))
    tr = LMTrainer(m, lr=5e-3, compute_dtype=DType.BF16, lora_rank=4,
                   lora_targets=("wq_", "wk_", "wv_", "wo_"),
                   quantize_base="int8", remat=True)
    params = tr.init_params()
    opt = tr.init_opt_state(params)
    ids = rng.integers(0, cfg.vocab_size, (2, 32)).astype(np.int64)
    tgt = np.roll(ids, -1, axis=1)
    losses = []
    for _ in range(8):
        params, opt, loss = tr.train_step(params, opt, ids, tgt)
        losses.append(float(np.asarray(loss)))
    assert losses[-1] < losses[0] - 0.05, losses

    d = save_peft_adapter({k: np.asarray(v) for k, v in params.items()},
                          wm, 4, str(tmp_path / "adapter"))
    back = load_peft_adapter_arrays(d, wm)
    assert len(back) == 8  # 4 targets x 2 layers
    for name, (a, b, sc) in back.items():
        np.testing.assert_allclose(
            a, np.asarray(params[f"{name}::lora_a"]), rtol=1e-6)
        np.testing.assert_allclose(
            b, np.asarray(params[f"{name}::lora_b"]), rtol=1e-6)
        assert sc == 1.0
