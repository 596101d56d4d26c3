"""ONNX export round-trips: SymbolicGraph.to_onnx_bytes is the inverse
of from_onnx_bytes (reference keeps ONNX as the interchange language —
its importer EMITS ONNX bytes, crates/whisper-tensor-import/src/lib.rs;
here any live graph, including surgered ones, serializes back out)."""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import (OnnxBuilder,
                                                       WeightStorage)
from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
    GPT2Config, build_gpt2_step, random_gpt2_weights)
from whisper_tensor_tpu.model import Model

N_LAYER, N_HEAD, N_EMBD, VOCAB, MAXPOS = 2, 2, 32, 97, 64


@pytest.fixture(scope="module")
def gpt2_model():
    cfg = GPT2Config(n_layer=N_LAYER, n_head=N_HEAD, n_embd=N_EMBD,
                     vocab_size=VOCAB, n_positions=MAXPOS)
    data = build_gpt2_step(random_gpt2_weights(cfg), cfg, max_len=MAXPOS)
    return Model.new_from_onnx(data, name="tiny-gpt2"), cfg


def gpt2_feeds(cfg, rng):
    ids = rng.integers(0, VOCAB, (2, 10)).astype(np.int64)
    feeds = {"input_ids": ids, "pos": np.asarray(0, dtype=np.int64)}
    H, D = cfg.n_head, cfg.n_embd // cfg.n_head
    for i in range(cfg.n_layer):
        feeds[f"cache_k_{i}"] = np.zeros((2, H, MAXPOS, D), np.float32)
        feeds[f"cache_v_{i}"] = np.zeros((2, H, MAXPOS, D), np.float32)
    return feeds


def test_gpt2_roundtrip_embedded(gpt2_model):
    model, cfg = gpt2_model
    feeds = gpt2_feeds(cfg, np.random.default_rng(0))
    ref = model.eval(feeds, mode="oracle")["logits"]

    data2 = model.graph.to_onnx_bytes(weights="embed")
    m2 = Model.new_from_onnx(data2, name="reimported")
    out = m2.eval(feeds, mode="oracle")["logits"]
    np.testing.assert_array_equal(out, ref)  # same weights, same ops


def test_gpt2_roundtrip_external_weights(gpt2_model, tmp_path):
    model, cfg = gpt2_model
    feeds = gpt2_feeds(cfg, np.random.default_rng(1))
    ref = model.eval(feeds, mode="oracle")["logits"]

    path = tmp_path / "gpt2.onnx"
    model.save_onnx(str(path), weights="external")
    assert (tmp_path / "gpt2.onnx.bin").exists()
    # big weights must NOT be embedded in the proto
    assert path.stat().st_size < (tmp_path / "gpt2.onnx.bin").stat().st_size
    m2 = Model.new_from_onnx_file(str(path))
    out = m2.eval(feeds, mode="oracle")["logits"]
    np.testing.assert_array_equal(out, ref)


def test_gpt2_roundtrip_structure_only(gpt2_model):
    model, cfg = gpt2_model
    feeds = gpt2_feeds(cfg, np.random.default_rng(2))
    ref = model.eval(feeds, mode="oracle")["logits"]

    data2 = model.graph.to_onnx_bytes(weights="none")
    m2 = Model.new_from_onnx(data2)
    # structure-only export: attach the original store (the
    # WeightStorage.none() / windowed-decode pattern)
    m2.graph.store = model.graph.store
    out = m2.eval(feeds, mode="oracle")["logits"]
    np.testing.assert_array_equal(out, ref)


def test_surgered_graph_roundtrip(gpt2_model):
    from whisper_tensor_tpu.symbolic_graph.surgery import (
        replace_ids_with_embeds)

    model, cfg = gpt2_model
    g2 = replace_ids_with_embeds(model.graph)
    rng = np.random.default_rng(3)
    embeds = rng.standard_normal((2, 10, N_EMBD)).astype(np.float32)
    feeds = gpt2_feeds(cfg, rng)
    feeds.pop("input_ids")
    feeds["inputs_embeds"] = embeds
    m_s = Model(g2, "surgered")
    ref = m_s.eval(feeds, mode="oracle")["logits"]

    data2 = g2.to_onnx_bytes(weights="embed")
    m2 = Model.new_from_onnx(data2)
    out = m2.eval(feeds, mode="oracle")["logits"]
    np.testing.assert_array_equal(out, ref)


def test_control_flow_roundtrip_if():
    inner_t = OnnxBuilder("it")
    inner_t.node("Mul", ["x", inner_t.const(np.float32(10))], outputs=["iv"])
    inner_t.output("iv", DType.F32, [2])
    inner_e = OnnxBuilder("ie")
    inner_e.node("Mul", ["x", inner_e.const(np.float32(100))], outputs=["iv"])
    inner_e.output("iv", DType.F32, [2])
    b = OnnxBuilder("if_rt")
    b.input("c", DType.BOOL, [])
    b.input("x", DType.F32, [2])
    b.node("If", ["c"], outputs=["y"],
           then_branch=inner_t.build_graph_proto(WeightStorage.embed()),
           else_branch=inner_e.build_graph_proto(WeightStorage.embed()))
    b.output("y", DType.F32, [2])
    m = Model.new_from_onnx(b.build())

    m2 = Model.new_from_onnx(m.graph.to_onnx_bytes())
    x = np.asarray([1.0, 2.0], dtype=np.float32)
    for c in (True, False):
        ref = m.eval({"c": np.asarray(c), "x": x})["y"]
        out = m2.eval({"c": np.asarray(c), "x": x})["y"]
        np.testing.assert_array_equal(out, ref)


def test_control_flow_roundtrip_scan():
    body = OnnxBuilder("body")
    body.input("acc", DType.F32, [1])
    body.input("el", DType.F32, [1])
    body.node("Add", ["acc", "el"], outputs=["acc_o"])
    body.node("Identity", ["acc_o"], outputs=["sc_o"])
    body.output("acc_o", DType.F32, [1])
    body.output("sc_o", DType.F32, [1])
    b = OnnxBuilder("scan_rt")
    b.input("init", DType.F32, [1])
    b.input("seq", DType.F32, [4, 1])
    b.node("Scan", ["init", "seq"], outputs=["fin", "outs"],
           num_scan_inputs=1, scan_input_directions=[1],
           body=body.build_graph_proto(WeightStorage.embed()))
    b.output("fin", DType.F32, [1])
    b.output("outs", DType.F32, [4, 1])
    m = Model.new_from_onnx(b.build())

    m2 = Model.new_from_onnx(m.graph.to_onnx_bytes())
    seq = np.asarray([[1], [2], [3], [4]], dtype=np.float32)
    feeds = {"init": np.zeros(1, np.float32), "seq": seq}
    ref = m.eval(feeds)
    out = m2.eval(feeds)
    np.testing.assert_array_equal(out["fin"], ref["fin"])
    np.testing.assert_array_equal(out["outs"], ref["outs"])


def test_symbolic_dims_survive(gpt2_model):
    model, _ = gpt2_model
    data2 = model.graph.to_onnx_bytes(weights="none")
    m2 = Model.new_from_onnx(data2)
    # the step graph's input_ids is (batch, seq): named symbolic dims
    # must re-import as symbols (and equal names intern to ONE symbol)
    tid = m2.graph.by_name["input_ids"]
    info = m2.graph.tensors[tid].info
    d0, d1 = info.dims()
    assert not d0.is_known and not d1.is_known


def test_cli_export_roundtrip(tmp_path, capsys):
    """`cli export` converts a HF checkpoint dir to a standalone ONNX
    file — the reference importer's product (identify_and_load ->
    ONNX bytes). The exported file must regenerate identical logits."""
    import json as _json

    import torch
    from safetensors.torch import save_file
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    from whisper_tensor_tpu.cli import main as cli_main

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(HFConfig(n_layer=1, n_head=2, n_embd=32,
                                  vocab_size=300, n_positions=64))
    hf.eval()
    d = tmp_path / "tiny-gpt2"
    d.mkdir()
    hf.config.to_json_file(str(d / "config.json"))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"}, str(d / "model.safetensors"))

    out = tmp_path / "exported.onnx"
    cli_main(["export", "--model", str(d), "-o", str(out),
              "--weights", "external", "-c", "dtype=f32",
              "-c", "max_len=64"])
    assert out.exists() and (tmp_path / "exported.onnx.bin").exists()
    capsys.readouterr()

    m2 = Model.new_from_onnx_file(str(out))
    ids = np.arange(6, dtype=np.int64)[None, :]
    feeds = {"input_ids": ids, "pos": np.asarray(0, dtype=np.int64),
             "cache_k_0": np.zeros((1, 2, 64, 16), np.float32),
             "cache_v_0": np.zeros((1, 2, 64, 16), np.float32)}
    logits = m2.eval(feeds, mode="oracle")["logits"][:, :6]
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(logits, ref, rtol=1e-3, atol=1e-4)


class TestCrossFamilyRoundTrips:
    """Exercise the exporter across recipe families with very different
    op mixes (GQA+rope+rms, conv+groupnorm+resize, AdaLN joint
    attention, linear-recurrence custom ops): export -> reimport must
    reproduce the oracle outputs exactly."""

    def _roundtrip(self, model, feeds, out_name):
        ref = model.eval(feeds, mode="oracle")[out_name]
        m2 = Model.new_from_onnx(model.graph.to_onnx_bytes())
        out = m2.eval(feeds, mode="oracle")[out_name]
        np.testing.assert_array_equal(out, ref)

    def test_llama_gqa(self):
        import torch
        from transformers import LlamaConfig as HFCfg, LlamaForCausalLM

        from whisper_tensor_tpu.importers.recipes.llm.llama import (
            LlamaConfig, build_llama_step, hf_weight_getter)
        from whisper_tensor_tpu.interfaces.text import TextInferenceInterface

        torch.manual_seed(0)
        common = dict(num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, hidden_size=32,
                      intermediate_size=64, vocab_size=101,
                      max_position_embeddings=64, attention_dropout=0.0)
        hf = LlamaForCausalLM(HFCfg(rope_theta=10000.0, **common))
        hf.eval()
        cfg = LlamaConfig.from_hf({**common, "model_type": "llama",
                                   "rope_theta": 10000.0,
                                   "rms_norm_eps": 1e-6})
        data = build_llama_step(hf_weight_getter(hf), cfg, max_len=64)
        m = Model.new_from_onnx(data)
        m2 = Model.new_from_onnx(m.graph.to_onnx_bytes())
        ids = np.random.default_rng(0).integers(0, 101, (2, 9)).astype(np.int64)
        ref = TextInferenceInterface(m, max_len=64,
                                     prompt_buckets=(16,)).logits(ids)
        out = TextInferenceInterface(m2, max_len=64,
                                     prompt_buckets=(16,)).logits(ids)
        np.testing.assert_array_equal(out, ref)

    def test_sd_unet(self):
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import (
            UNetConfig, build_sd_unet, random_unet_weights)

        cfg = UNetConfig(block_out_channels=(8, 16, 16, 16),
                         layers_per_block=1, cross_attention_dim=12,
                         norm_groups=4, attention_head_dim=2)
        m = Model.new_from_onnx(build_sd_unet(random_unet_weights(), cfg,
                                              latent_hw=(16, 16)))
        rng = np.random.default_rng(0)
        feeds = {
            "sample": rng.standard_normal((1, 4, 16, 16)).astype(np.float32),
            "timestep": np.asarray(5.0, dtype=np.float32),
            "encoder_hidden_states":
                rng.standard_normal((1, 7, 12)).astype(np.float32)}
        self._roundtrip(m, feeds, "out")

    def test_sd3_mmdit(self):
        from whisper_tensor_tpu.importers.recipes.diffusion.mmdit import (
            SD3Config, build_sd3_mmdit, random_sd3_weights)

        cfg = SD3Config(num_layers=2, num_heads=2, head_dim=8,
                        in_channels=4, out_channels=4, patch_size=2,
                        sample_size=8, pos_embed_max_size=12,
                        joint_attention_dim=24, pooled_projection_dim=20,
                        dual_attention_layers=(1,), time_embed_dim=8)
        w = random_sd3_weights(0)(cfg)
        m = Model.new_from_onnx(build_sd3_mmdit(w, cfg, batch=2,
                                                context_len=6,
                                                latent_hw=(8, 8)))
        rng = np.random.default_rng(0)
        feeds = {
            "hidden_states":
                rng.standard_normal((2, 4, 8, 8)).astype(np.float32),
            "timestep": np.asarray([100.0, 500.0], np.float32),
            "encoder_hidden_states":
                rng.standard_normal((2, 6, 24)).astype(np.float32),
            "pooled_projections":
                rng.standard_normal((2, 20)).astype(np.float32)}
        self._roundtrip(m, feeds, "out")

    def test_rwkv7_recurrence(self):
        from whisper_tensor_tpu.importers.recipes.llm.rwkv7 import (
            Rwkv7Config, build_rwkv7_step, random_rwkv7_weights)

        cfg = Rwkv7Config(n_layer=2, n_embd=32, n_head=4, vocab_size=77,
                          lora_w=8, lora_a=8, lora_v=8, lora_g=8)
        sd = random_rwkv7_weights(cfg)
        m = Model.new_from_onnx(build_rwkv7_step(lambda n: sd[n], cfg))
        D = cfg.n_embd // cfg.n_head
        feeds = {"token": np.asarray([3], dtype=np.int64)}
        for i in range(cfg.n_layer):
            feeds[f"tmix_x_{i}"] = np.zeros((1, cfg.n_embd), np.float32)
            feeds[f"cmix_x_{i}"] = np.zeros((1, cfg.n_embd), np.float32)
            feeds[f"vk_state_{i}"] = np.zeros((1, cfg.n_head, D, D),
                                              np.float32)
        self._roundtrip(m, feeds, "logits")


def test_xla_backend_runs_reimported(gpt2_model):
    model, cfg = gpt2_model
    feeds = gpt2_feeds(cfg, np.random.default_rng(4))
    m2 = Model.new_from_onnx(model.graph.to_onnx_bytes())
    ref = model.eval(feeds, mode="xla")["logits"]
    out = m2.eval(feeds, mode="xla")["logits"]
    np.testing.assert_array_equal(out, ref)
