"""GGUF -> llama-family step graph.

Reference equivalent: the per-arch GGUF adapters
(crates/whisper-tensor-import/src/gguf/{llama3,qwen2,qwen3}.rs).
Maps GGUF tensor names (token_embd / blk.N.attn_q ...) to HF names and
reuses the llama recipe; quantized weights dequantize at import (the
fused on-device dequant-matmul path arrives with the pallas kernel).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ....dtype import DType
from .llama import LlamaConfig, build_llama_step

_NAME_MAP = {
    "model.embed_tokens.weight": "token_embd.weight",
    "model.norm.weight": "output_norm.weight",
    "lm_head.weight": "output.weight",
}
_LAYER_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}


def _gguf_name(hf_name: str) -> str:
    if hf_name in _NAME_MAP:
        return _NAME_MAP[hf_name]
    if hf_name.startswith("model.layers."):
        rest = hf_name[len("model.layers."):]
        idx, leaf = rest.split(".", 1)
        return f"blk.{idx}.{_LAYER_MAP[leaf]}"
    raise KeyError(hf_name)


def config_from_gguf(g) -> LlamaConfig:
    arch = g.architecture
    m = g.metadata

    def key(suffix, default=None):
        return m.get(f"{arch}.{suffix}", default)

    n_head = int(key("attention.head_count"))
    emb = int(key("embedding_length"))
    return LlamaConfig(
        num_hidden_layers=int(key("block_count")),
        num_attention_heads=n_head,
        num_key_value_heads=int(key("attention.head_count_kv", n_head)),
        hidden_size=emb,
        intermediate_size=int(key("feed_forward_length")),
        vocab_size=int(key("vocab_size",
                           len(m.get("tokenizer.ggml.tokens", [])))),
        max_position_embeddings=int(key("context_length", 8192)),
        rms_norm_eps=float(key("attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(key("rope.freq_base", 10000.0)),
        attention_bias=(arch == "qwen2"),
        head_dim=(int(key("attention.key_length"))
                  if key("attention.key_length") else None),
        model_type=arch,
        tie_word_embeddings=("output.weight" not in g.tensors),
    )


_GEMMA1_LAYER_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    # gemma1 has a single pre-FFN norm: HF post_attention_layernorm
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}
_GEMMA2_LAYER_MAP = {
    **_GEMMA1_LAYER_MAP,
    # gemma2's 4-norm sandwich (llama.cpp names)
    "post_attention_layernorm.weight": "post_attention_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
}


def _gguf_name_gemma(hf_name: str, gemma2: bool) -> str:
    if hf_name in _NAME_MAP:
        return _NAME_MAP[hf_name]
    if hf_name.startswith("model.layers."):
        rest = hf_name[len("model.layers."):]
        idx, leaf = rest.split(".", 1)
        lmap = _GEMMA2_LAYER_MAP if gemma2 else _GEMMA1_LAYER_MAP
        return f"blk.{idx}.{lmap[leaf]}"
    raise KeyError(hf_name)


def gemma_config_from_gguf(g):
    from .gemma import GemmaConfig

    arch = g.architecture
    m = g.metadata

    def key(suffix, default=None):
        return m.get(f"{arch}.{suffix}", default)

    n_head = int(key("attention.head_count"))
    emb = int(key("embedding_length"))
    soft_a = key("attn_logit_softcapping")
    soft_f = key("final_logit_softcapping")
    return GemmaConfig(
        num_hidden_layers=int(key("block_count")),
        num_attention_heads=n_head,
        num_key_value_heads=int(key("attention.head_count_kv", 1)),
        hidden_size=emb,
        intermediate_size=int(key("feed_forward_length")),
        vocab_size=int(key("vocab_size",
                           len(m.get("tokenizer.ggml.tokens", [])))),
        max_position_embeddings=int(key("context_length", 8192)),
        rms_norm_eps=float(key("attention.layer_norm_rms_epsilon", 1e-6)),
        rope_theta=float(key("rope.freq_base", 10000.0)),
        head_dim=int(key("attention.key_length") or emb // n_head),
        attn_logit_softcapping=float(soft_a) if soft_a else None,
        final_logit_softcapping=float(soft_f) if soft_f else None,
        gemma2=(arch == "gemma2"),
        model_type=arch,
    )


_PHI3_LAYER_MAP = {
    "self_attn.qkv_proj.weight": "attn_qkv.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "mlp.gate_up_proj.weight": "ffn_up.weight",     # gguf fuses gate+up
    "mlp.down_proj.weight": "ffn_down.weight",
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
}


def _gguf_name_phi3(hf_name: str) -> str:
    if hf_name in _NAME_MAP:
        return _NAME_MAP[hf_name]
    if hf_name.startswith("model.layers."):
        rest = hf_name[len("model.layers."):]
        idx, leaf = rest.split(".", 1)
        return f"blk.{idx}.{_PHI3_LAYER_MAP[leaf]}"
    raise KeyError(hf_name)


def build_from_gguf(g, max_len: int, dtype: DType = DType.BF16,
                    pos_per_row: bool = False, storage=None,
                    zeros: bool = False) -> Tuple[bytes, Dict]:
    """zeros=True builds a structure-only graph (shape-faithful zero
    weights, no dequantization) — for decode-window variants that share
    the main model's TensorStore."""
    if g.architecture in ("gemma", "gemma2"):
        from .gemma import build_gemma_step

        if pos_per_row:
            raise ValueError("ragged decode not supported for gguf gemma yet")
        gcfg = gemma_config_from_gguf(g)
        gemma2 = g.architecture == "gemma2"

        def getter_g(hf_name: str) -> np.ndarray:
            # gemma always ties the LM head to the embedding
            if hf_name == "lm_head.weight":
                hf_name = "model.embed_tokens.weight"
            t = g.load(_gguf_name_gemma(hf_name, gemma2))
            if zeros:
                return np.zeros(tuple(t.shape), dtype=np.float32)
            from ....tensor import PackedTensor

            if isinstance(t, PackedTensor):
                arr = t.dequantize(DType.F32).numpy()
            else:
                arr = t.numpy()
                arr = (arr.astype(np.float32) if arr.dtype.kind == "f"
                       else arr)
            # the HF->GGUF converter bakes gemma's "+1" into every norm
            # weight; the recipe adds it back, so un-bake here
            if (hf_name.endswith("layernorm.weight")
                    or hf_name == "model.norm.weight"):
                arr = arr - 1.0
            return arr

        data = build_gemma_step(getter_g, gcfg, max_len=max_len, dtype=dtype,
                                storage=storage)
        return data, dict(n_layers=gcfg.num_hidden_layers,
                          n_kv_heads=gcfg.num_key_value_heads,
                          head_dim=gcfg.hd)

    cfg = config_from_gguf(g)
    if g.architecture == "phi3" and pos_per_row:
        raise ValueError("ragged decode not supported for gguf phi3 yet")
    if g.architecture == "phi3":
        from .phi3 import Phi3Config, build_phi3_step

        cfg = Phi3Config(**{**cfg.__dict__, "model_type": "phi3",
                            "attention_bias": False})

        def getter3(hf_name: str) -> np.ndarray:
            if hf_name == "lm_head.weight" and cfg.tie_word_embeddings:
                hf_name = "model.embed_tokens.weight"
            t = g.load(_gguf_name_phi3(hf_name))
            from ....tensor import PackedTensor

            if isinstance(t, PackedTensor):
                return t.dequantize(DType.F32).numpy()
            arr = t.numpy()
            return arr.astype(np.float32) if arr.dtype.kind == "f" else arr

        data = build_phi3_step(getter3, cfg, max_len=max_len, dtype=dtype)
        return data, dict(n_layers=cfg.num_hidden_layers,
                          n_kv_heads=cfg.num_key_value_heads,
                          head_dim=cfg.hd)

    def getter(hf_name: str) -> np.ndarray:
        if hf_name == "lm_head.weight" and cfg.tie_word_embeddings:
            hf_name = "model.embed_tokens.weight"
        gname = _gguf_name(hf_name)
        t = g.load(gname)
        if zeros:
            return np.zeros(tuple(t.shape), dtype=np.float32)
        from ....tensor import PackedTensor

        if isinstance(t, PackedTensor):
            return t.dequantize(DType.F32).numpy()
        arr = t.numpy()
        return arr.astype(np.float32) if arr.dtype.kind == "f" else arr

    data = build_llama_step(getter, cfg, max_len=max_len, dtype=dtype,
                            pos_per_row=pos_per_row, storage=storage)
    geometry = dict(n_layers=cfg.num_hidden_layers,
                    n_kv_heads=cfg.num_key_value_heads, head_dim=cfg.hd)
    return data, geometry


def build_from_gguf_packed(g, max_len: int, dtype: DType = DType.BF16,
                           pos_per_row: bool = False) -> Tuple[bytes, Dict, Dict]:
    """Like build_from_gguf (llama-family only), but big matmul weights
    are NEVER dequantized on host: the graph serializes without their
    payloads, and the returned `store_entries` bind each matmul weight
    name to (a) a lazy dense transposed-dequant fallback and (b) a
    packed source for the fused Pallas dequant-matmul
    (milli.transforms.pack_matmul_nodes). This is what makes an 8B Q4_K
    model loadable at ~0.6 B/weight of HBM instead of 4x that.

    Returns (onnx_bytes, geometry, store_entries) where store_entries =
    {name: {"lazy": zero-arg dense loader, "packed": zero-arg
    PackedTensor loader or None}}."""
    from ....backends.pallas.packed_matmul import SUPPORTED
    from ....tensor import PackedTensor

    cfg = config_from_gguf(g)
    if g.architecture not in ("llama", "qwen2", "qwen3", "mistral"):
        raise ValueError(
            f"packed path supports llama-family ggufs, not {g.architecture!r}")

    def resolve(hf_name: str) -> str:
        if hf_name == "lm_head.weight" and cfg.tie_word_embeddings:
            hf_name = "model.embed_tokens.weight"
        return _gguf_name(hf_name)

    def is_lazy_big(hf_name: str) -> bool:
        # matmul-RHS weights routed through the recipe's weight_map
        return hf_name.endswith(".weight") and (
            "self_attn." in hf_name or "mlp." in hf_name
            or hf_name == "lm_head.weight")

    def getter(hf_name: str) -> np.ndarray:
        gname = resolve(hf_name)
        info = g.tensors[gname]
        if is_lazy_big(hf_name):
            # shape-faithful zeros (calloc — no pages committed, no
            # dequantization); payload is never serialized
            return np.zeros(tuple(info.shape), dtype=np.float32)
        t = g.load(gname)
        if isinstance(t, PackedTensor):
            return t.dequantize(DType.F32).numpy()
        arr = t.numpy()
        return arr.astype(np.float32) if arr.dtype.kind == "f" else arr

    from ...onnx_builder import WeightStorage

    weight_map: Dict[str, str] = {}
    sink: Dict[str, np.ndarray] = {}
    data = build_llama_step(getter, cfg, max_len=max_len, dtype=dtype,
                            pos_per_row=pos_per_row,
                            storage=WeightStorage.to_sink(sink),
                            weight_map=weight_map)

    # sink holds every initializer VALUE (small tensors real; matmul
    # weights as shape-only zeros). Matmul weights get lazy loaders
    # instead; everything else installs as-is.
    store_entries: Dict[str, Dict] = {}
    for init_name, val in sink.items():
        if init_name not in weight_map:
            store_entries[init_name] = {"value": np.asarray(val)}
            continue
        gname = resolve(weight_map[init_name])
        info = g.tensors[gname]

        def dense_loader(gname=gname):
            t = g.load(gname)
            arr = (t.dequantize(DType.F32).numpy()
                   if isinstance(t, PackedTensor) else t.numpy())
            return np.ascontiguousarray(
                arr.astype(np.float32, copy=False).T)

        packed_loader = None
        if info.packed is not None and info.packed in SUPPORTED \
                and len(info.shape) == 2:
            def packed_loader(gname=gname):
                return g.load(gname)
        store_entries[init_name] = {"lazy": dense_loader,
                                    "packed": packed_loader}
    geometry = dict(n_layers=cfg.num_hidden_layers,
                    n_kv_heads=cfg.num_key_value_heads, head_dim=cfg.hd)
    return data, geometry, store_entries
