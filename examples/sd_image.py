"""Generate an image with a Stable Diffusion pipeline.

Reference equivalent: examples/{stable_diffusion,sdxl}.rs. Two modes:
  * real checkpoint:  python examples/sd_image.py --model /path/to/diffusers_dir \
                        --prompt "a watercolor fox" --steps 20 --out fox.ppm
    (any diffusers layout the loader understands: SD1.5/SD2/SDXL/SD3/Flux,
    or a single-file LDM .safetensors)
  * --smoke: random-weight SD1.5-shaped pipeline at 128x128 — exercises
    the full text-encoder -> CFG UNet loop -> VAE path with no downloads.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_ppm(path: str, pixels: np.ndarray) -> None:
    """Write (H, W, 3) u8 as a PPM (stdlib-only; PNG would need pillow)."""
    h, w, _ = pixels.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(pixels, dtype=np.uint8).tobytes())


def _smoke_interface():
    """Random-weight SD1.5-shaped pipeline (tiny CLIP/UNet/VAE), same
    graphs and interface the loader produces for real checkpoints."""
    import torch
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
        ClipTextConfig, build_clip_text)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import (
        UNetConfig, build_sd_unet, random_unet_weights)
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)
    from whisper_tensor_tpu.interfaces.image_gen import \
        ImageGenerationInterface
    from whisper_tensor_tpu.model import Model

    torch.manual_seed(0)
    hf = CLIPTextModel(HFCfg(hidden_size=64, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=4,
                             vocab_size=1000, max_position_embeddings=77))
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    te = Model.new_from_onnx(build_clip_text(
        lambda n: sd[n],
        ClipTextConfig(num_hidden_layers=2, hidden_size=64,
                       num_attention_heads=4, intermediate_size=128,
                       vocab_size=1000)), name="te")
    ucfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                      cross_attention_dim=64, attention_head_dim=4,
                      norm_groups=8)
    unet = Model.new_from_onnx(
        build_sd_unet(random_unet_weights(), ucfg, batch=2,
                      latent_hw=(16, 16)), name="unet")
    vae = Model.new_from_onnx(build_vae_decoder(
        random_unet_weights(1),
        VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                  norm_groups=4), latent_hw=(16, 16)), name="vae")
    return ImageGenerationInterface(te, unet, vae, tokenizer=None,
                                    bos_token_id=1, uncond_token_id=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="diffusers dir or LDM single file")
    ap.add_argument("--prompt", default="a watercolor fox in the snow")
    ap.add_argument("--negative", default="")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cfg", type=float, default=7.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="out.ppm")
    ap.add_argument("--smoke", action="store_true",
                    help="random-weight SD1.5 at 128x128 (no checkpoint)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from whisper_tensor_tpu.interfaces.image_gen import ImageGenConfig

    t0 = time.time()
    if args.smoke:
        iface = _smoke_interface()
        cfg = ImageGenConfig(steps=min(args.steps, 4),
                             guidance_scale=args.cfg, height=128, width=128,
                             seed=args.seed)
    else:
        if not args.model:
            raise SystemExit("need --model <dir> (or --smoke)")
        from whisper_tensor_tpu.importers.loaders import identify_and_load
        from whisper_tensor_tpu.interfaces.image_gen import \
            image_interface_from_bundle

        bundle = identify_and_load(args.model)
        iface = image_interface_from_bundle(bundle)
        cfg = ImageGenConfig(steps=args.steps, guidance_scale=args.cfg,
                             seed=args.seed)
    print(f"pipeline ready in {time.time() - t0:.1f}s")

    class Progress:
        def on_progress(self, node, f):
            print(f"\r  denoising {f * 100:5.1f}%", end="", flush=True)

    t1 = time.time()
    img = iface.run(args.prompt, negative_prompt=args.negative, cfg=cfg,
                    observer=Progress())
    print(f"\ngenerated in {time.time() - t1:.1f}s "
          f"({cfg.steps} steps, {img.pixels.shape[1]}x{img.pixels.shape[0]})")
    save_ppm(args.out, img.pixels)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
