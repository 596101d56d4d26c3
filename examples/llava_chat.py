"""Multimodal chat: image + text through the true inputs_embeds path.

Reference equivalent: the MultimodalLanguageInterface flows
(src/interfaces.rs:166-327). Modes:
  * real model:  python examples/llava_chat.py --model /path/to/llava_dir \
                   --image photo.ppm --text "What is in this picture?"
  * --smoke: a tiny random LLaVA (CLIP-ViT tower + llama LM + projector)
    runs an image+text prompt end to end — no downloads.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_ppm(path: str) -> np.ndarray:
    """Minimal P6 PPM reader -> (H, W, 3) u8."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        line = f.readline()
        while line.startswith(b"#"):
            line = f.readline()
        w, h = map(int, line.split())
        assert int(f.readline()) == 255
        return np.frombuffer(f.read(w * h * 3), np.uint8).reshape(h, w, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="LLaVA checkpoint dir")
    ap.add_argument("--image", help="P6 .ppm image")
    ap.add_argument("--text", default="Describe the image.")
    ap.add_argument("--max-tokens", type=int, default=48)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        # hermetic smoke: force the CPU platform in-process (the env
        # var alone is overridden by the axon sitecustomize)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from whisper_tensor_tpu.interfaces.multimodal import \
        MultimodalLanguageInterface
    from whisper_tensor_tpu.interfaces.text import TextInferenceInterface
    from whisper_tensor_tpu.super_graph.links import Image, MultimodalItem

    if args.smoke:
        import tempfile

        import torch
        from transformers import LlavaConfig, LlavaForConditionalGeneration

        torch.manual_seed(0)
        hf = LlavaForConditionalGeneration(LlavaConfig(
            vision_config=dict(model_type="clip_vision_model",
                               num_hidden_layers=2, hidden_size=32,
                               num_attention_heads=2, intermediate_size=64,
                               image_size=16, patch_size=8),
            text_config=dict(model_type="llama", num_hidden_layers=2,
                             hidden_size=24, num_attention_heads=2,
                             num_key_value_heads=2, intermediate_size=48,
                             vocab_size=300, max_position_embeddings=64)))
        d = tempfile.mkdtemp(prefix="wt_llava_")
        hf.save_pretrained(d, safe_serialization=True)
        model_dir = d
        pixels = np.random.default_rng(0).integers(
            0, 255, (16, 16, 3)).astype(np.uint8)
    else:
        if not (args.model and args.image):
            raise SystemExit("need --model and --image (or --smoke)")
        model_dir = args.model
        pixels = read_ppm(args.image)

    from whisper_tensor_tpu.importers.loaders import loader_registry

    bundle = loader_registry()["transformers"].load(
        {"path": model_dir, "dtype": "f32" if args.smoke else "bf16",
         "max_len": 64 if args.smoke else 1024})
    spec = bundle.interfaces["multimodal"]
    text_model = bundle.models[spec["model"]]
    vis_model = bundle.models[spec["vision"]]

    tok = None
    if bundle.tokenizer_source:
        from whisper_tensor_tpu.tokenizer import AnyTokenizer

        tok = AnyTokenizer.load(bundle.tokenizer_source)
    elif args.smoke:
        from whisper_tensor_tpu.tokenizer import AnyTokenizer

        tok = AnyTokenizer.load("bytes")

    iface = TextInferenceInterface(
        text_model, max_len=64 if args.smoke else 1024, tokenizer=tok)
    mm = MultimodalLanguageInterface(iface,
                                     embed_weight_name=spec["embed_weight"],
                                     vision_encoder=vis_model)
    out = mm.run_items_in_string_out(
        [MultimodalItem(image=Image(pixels)),
         MultimodalItem(text=args.text)], n_new=args.max_tokens)
    print(json.dumps({"response": out}))


if __name__ == "__main__":
    main()
