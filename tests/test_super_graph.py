"""SuperGraph layer tests: scheduling, caches, scan, serialization,
and the LLM decode job cross-checked against the compiled interface path.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.super_graph import (ExecutionContext, LinkKind,
                                            SuperGraph, SuperGraphCache,
                                            SuperObserver)
from whisper_tensor_tpu.super_graph.nodes import (ModelExecutionNode,
                                                  ReportProgressNode,
                                                  RNNCacheReadNode,
                                                  RNNCacheWriteNode,
                                                  ScanNode,
                                                  TensorCacheReadNode,
                                                  TensorCacheWriteNode,
                                                  TokenizerDecodeNode,
                                                  TokenizerEncodeNode,
                                                  TokenizerLoadNode)
from whisper_tensor_tpu.tokenizer import ByteTokenizer


def test_tokenizer_round_trip_graph():
    g = SuperGraph("tok")
    text_l = g.mark_input("text", g.link(LinkKind.STRING))
    tok_l = g.link(LinkKind.TOKENIZER)
    ids_l = g.link(LinkKind.TENSOR)
    out_l = g.link(LinkKind.STRING)
    g.add(TokenizerLoadNode(outputs={"tokenizer": tok_l}, source="bytes"))
    g.add(TokenizerEncodeNode(inputs={"tokenizer": tok_l, "text": text_l},
                              outputs={"tokens": ids_l}))
    g.add(TokenizerDecodeNode(inputs={"tokenizer": tok_l, "tokens": ids_l},
                              outputs={"text": out_l}))
    g.mark_output("round_trip", out_l)
    g.validate()
    ctx = ExecutionContext()
    out = g.run(ctx, {"text": "hello TPU"})
    assert out["round_trip"] == "hello TPU"


def test_scan_node_and_progress():
    body = SuperGraph("body")
    acc_l = body.mark_input("acc", body.link(LinkKind.TENSOR))
    elem_l = body.mark_input("elem", body.link(LinkKind.TENSOR))
    out_l = body.link(LinkKind.TENSOR)

    from whisper_tensor_tpu.super_graph.nodes import SuperNode, register_node

    @register_node
    class _AddNode(SuperNode):
        def execute(self, ctx, ins):
            return {"y": np.asarray(ins["a"]) + np.asarray(ins["b"])}

    body.add(_AddNode(inputs={"a": acc_l, "b": elem_l}, outputs={"y": out_l}))
    body.mark_output("acc_out", out_l)
    g = SuperGraph("scan")
    init_l = g.mark_input("init", g.link(LinkKind.TENSOR))
    seq_l = g.mark_input("seq", g.link(LinkKind.TENSOR))
    fin_l = g.link(LinkKind.TENSOR)
    parts_l = g.link(LinkKind.TENSOR)
    scan = ScanNode(inputs={"state": init_l, "seq": seq_l},
                    outputs={"final_acc": fin_l, "partials": parts_l},
                    state=[("state", "acc", "acc_out")],
                    scan_inputs=[("seq", "elem", 0)],
                    scan_outputs=[("acc_out", "partials", 0)])
    scan.body = body
    g.add(scan)
    g.mark_output("final", fin_l)
    g.mark_output("partials", parts_l)

    progress = []

    class Obs(SuperObserver):
        def on_progress(self, node, f):
            progress.append(f)

    seq = np.arange(8, dtype=np.float32).reshape(4, 2)
    out = g.run(ExecutionContext(observer=Obs()),
                {"init": np.zeros(2, np.float32), "seq": seq})
    np.testing.assert_array_equal(out["final"], seq.sum(axis=0))
    np.testing.assert_array_equal(out["partials"], np.cumsum(seq, axis=0))
    assert len(progress) == 4


def test_rnn_cache_longest_prefix():
    cache = SuperGraphCache()
    cache.write(1, (1, 2, 3), "state123")
    cache.write(1, (1, 2), "state12")
    prefix, state = cache.read(1, (1, 2, 3, 4))
    assert prefix == (1, 2, 3) and state == "state123"
    prefix, state = cache.read(1, (1, 2, 9))
    assert prefix == (1, 2) and state == "state12"
    prefix, state = cache.read(2, (1, 2))
    assert state is None


def test_cache_nodes_in_graph():
    g = SuperGraph("cache")
    h_l = g.mark_input("hash", g.link(LinkKind.HASH))
    toks_l = g.mark_input("tokens", g.link(LinkKind.TENSOR))
    state_l = g.mark_input("state", g.link(LinkKind.TENSOR_MAP))
    g.add(RNNCacheWriteNode(inputs={"hash": h_l, "tokens": toks_l,
                                    "state": state_l}, outputs={}))
    g.validate()
    ctx = ExecutionContext()
    g.run(ctx, {"hash": np.asarray(7), "tokens": np.asarray([1, 2]),
                "state": {"k": np.ones(3)}})
    prefix, st = ctx.cache.read(7, (1, 2, 3))
    assert prefix == (1, 2) and "k" in st


def test_serialization_round_trip():
    g = SuperGraph("ser")
    a = g.mark_input("text", g.link(LinkKind.STRING, "in"))
    tok_l = g.link(LinkKind.TOKENIZER)
    ids_l = g.link(LinkKind.TENSOR, "ids")
    g.add(TokenizerLoadNode(outputs={"tokenizer": tok_l}, source="bytes"))
    g.add(TokenizerEncodeNode(inputs={"tokenizer": tok_l, "text": a},
                              outputs={"tokens": ids_l}))
    g.mark_output("ids", ids_l)
    s = g.dumps()
    g2 = SuperGraph.loads(s)
    out = g2.run(ExecutionContext(), {"text": "ab"})
    np.testing.assert_array_equal(out["ids"], [ord("a") + 3, ord("b") + 3])


def test_llm_supergraph_matches_compiled_interface():
    """The introspectable SuperGraph decode job must produce the same
    tokens as the compiled lax.scan interface path."""
    from whisper_tensor_tpu.importers.recipes.llm.gpt2 import (
        GPT2Config, build_gpt2_step, random_gpt2_weights)
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.super_graph.llm import build_llm_supergraph

    cfg = GPT2Config(n_layer=2, n_head=2, n_embd=32, vocab_size=300,
                     n_positions=64)
    data = build_gpt2_step(random_gpt2_weights(cfg), cfg, max_len=64)
    model = Model.new_from_onnx(data, name="sg-gpt2")

    n_new = 6
    sg = build_llm_supergraph("sg-gpt2", "bytes", n_layers=2, n_kv_heads=2,
                              max_len=64, head_dim=16, n_new=n_new)
    executed = []

    class Obs(SuperObserver):
        def on_node_executed(self, node, ms):
            executed.append(node.name)

    ctx = ExecutionContext(models={"sg-gpt2": model}, observer=Obs())
    out = sg.run(ctx, {"text": "hi"})
    assert out["tokens"].shape == (n_new,)
    assert len(executed) > 5  # every node observed

    tok = ByteTokenizer()
    iface = TextInferenceInterface(model, max_len=64, prompt_buckets=(16, 32))
    prompt = np.asarray(tok.encode("hi"), dtype=np.int64)[None]
    fast = iface.generate_tokens(prompt, n_new)[0]
    np.testing.assert_array_equal(out["tokens"], fast)


def test_audio_mel_shapes():
    from whisper_tensor_tpu.super_graph.links import AudioClip
    from whisper_tensor_tpu.super_graph.nodes import (
        AudioClipToMelSpectrogramNode, AudioClipToTensorNode)

    sr = 16000
    clip = AudioClip(np.sin(np.linspace(0, 440 * 2 * np.pi, sr)).astype(np.float32), sr)
    node = AudioClipToMelSpectrogramNode(inputs={}, outputs={})
    out = node.execute(ExecutionContext(), {"audio": clip})
    mel = out["mel"]
    assert mel.shape[1] == 80 and mel.ndim == 3
    assert np.isfinite(mel).all()
    n2 = AudioClipToTensorNode(inputs={}, outputs={}, sample_rate=8000)
    t2 = n2.execute(ExecutionContext(), {"audio": clip})["tensor"]
    assert abs(t2.shape[1] - sr // 2) < 3


def test_diffusion_supergraph_matches_interface():
    """The introspectable diffusion SuperGraph job (denoise loop as a
    Scan node, reference src/interfaces.rs:327+) must produce the same
    image as the ImageGenerationInterface python loop, and stream
    per-step latents + progress through the observer."""
    import torch
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel

    from whisper_tensor_tpu.backends.eval_backend import EvalBackend
    from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
        ClipTextConfig, build_clip_text)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import (
        UNetConfig, build_sd_unet, random_unet_weights)
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)
    from whisper_tensor_tpu.interfaces.image_gen import (
        ImageGenConfig, ImageGenerationInterface)
    from whisper_tensor_tpu.model import Model
    from whisper_tensor_tpu.super_graph.image import build_diffusion_supergraph

    torch.manual_seed(0)
    hf = CLIPTextModel(HFCfg(hidden_size=12, intermediate_size=24,
                             num_hidden_layers=1, num_attention_heads=2,
                             vocab_size=100, max_position_embeddings=8))
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    te = Model.new_from_onnx(build_clip_text(
        lambda n: sd[n],
        ClipTextConfig(num_hidden_layers=1, hidden_size=12,
                       num_attention_heads=2, intermediate_size=24,
                       vocab_size=100, max_position_embeddings=8),
        seq_len=8), name="sg-te")
    ucfg = UNetConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                      cross_attention_dim=12, norm_groups=4,
                      attention_head_dim=2)
    unet = Model.new_from_onnx(build_sd_unet(
        random_unet_weights(), ucfg, latent_hw=(16, 16)), name="sg-unet")
    vae = Model.new_from_onnx(build_vae_decoder(
        random_unet_weights(1),
        VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                  norm_groups=4), latent_hw=(16, 16)), name="sg-vae")

    steps, seed = 2, 7
    iface = ImageGenerationInterface(te, unet, vae, tokenizer=None,
                                     bos_token_id=1, uncond_token_id=2,
                                     seq_len=8)
    iface._backends = {m.id: EvalBackend("oracle") for m in (te, unet, vae)}
    ref = iface.run("a tpu", cfg=ImageGenConfig(
        steps=steps, height=128, width=128, seed=seed))

    sg = build_diffusion_supergraph("sg-te", "sg-unet", "sg-vae",
                                    steps=steps, latent_hw=(16, 16),
                                    seed=seed, bos_token_id=1,
                                    eos_token_id=2, seq_len=8)
    # round-trip through JSON: the job graph must be shippable
    sg2 = SuperGraph.from_json(sg.to_json())

    progress, latents_seen = [], []

    class Obs(SuperObserver):
        def on_progress(self, node, f):
            progress.append(f)

    ctx = ExecutionContext(
        models={"sg-te": te, "sg-unet": unet, "sg-vae": vae},
        observer=Obs(), backend_mode="oracle")
    ids = iface.encode_prompt("a tpu")
    nids = iface.encode_prompt("")
    out = sg2.run(ctx, {"prompt_ids": ids, "negative_ids": nids})
    np.testing.assert_allclose(out["image"].pixels.astype(np.int32),
                               ref.pixels.astype(np.int32), atol=1)
    assert np.asarray(out["latent_trajectory"]).shape[0] == steps
    assert progress


def test_diffusion_supergraph_fresh_process_deserialize(tmp_path):
    """A serialized diffusion job must deserialize in a process where the
    builder never ran (ADVICE r2: node classes must live at module scope
    with all state in params, not in builder closures)."""
    import os
    import subprocess
    import sys

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from whisper_tensor_tpu.super_graph.image import build_diffusion_supergraph
    from whisper_tensor_tpu.super_graph.llm import build_llm_supergraph

    import json

    sg = build_diffusion_supergraph("te", "unet", "vae", steps=3,
                                    latent_hw=(16, 16), seed=5)
    (tmp_path / "diff.json").write_text(json.dumps(sg.to_json()))
    llm = build_llm_supergraph("m", "byte", n_layers=2, n_kv_heads=2,
                               max_len=16, head_dim=4, n_new=4)
    (tmp_path / "llm.json").write_text(json.dumps(llm.to_json()))

    code = (
        "import sys, json; sys.path.insert(0, %r)\n"
        "from whisper_tensor_tpu.super_graph import SuperGraph\n"
        "import whisper_tensor_tpu.super_graph.image  # registers node kinds\n"
        "import whisper_tensor_tpu.super_graph.llm\n"
        "for name in ('diff.json', 'llm.json'):\n"
        "    g = SuperGraph.from_json(json.load(open(%r + '/' + name)))\n"
        "    g.validate()\n"
        "    assert any(n.params.get('model_ref') for n in g.nodes), name\n"
        "print('OK')\n"
    ) % (str(ROOT), str(tmp_path))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
