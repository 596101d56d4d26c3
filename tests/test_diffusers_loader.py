"""DiffusersPipelineLoader: on-disk diffusers pipeline dirs (model_index
.json + per-component config.json/safetensors) load into the right
pipeline interface and generate. Reference: the sd15/sd_xl/sd35/flux
loaders in crates/whisper-tensor-import/src/loaders/."""

import json
import os

import numpy as np
import pytest
import torch
from safetensors.numpy import save_file
from transformers import CLIPTextConfig as HFCfg
from transformers import CLIPTextModel, CLIPTextModelWithProjection


def _recorded_weights(build_fn, cfg, **kw):
    """Run a (name, shape) recipe with a recording random getter; return
    (onnx_bytes_ignored, {name: array})."""
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
        random_unet_weights

    base = random_unet_weights(0)
    rec = {}

    def getter(name, shape=None):
        arr = base(name, shape)
        rec[name] = np.ascontiguousarray(arr, dtype=np.float32)
        return arr

    build_fn(getter, cfg, **kw)
    return rec


def _save_clip(d, with_projection=False, hidden=12, proj=12, seed=0):
    torch.manual_seed(seed)
    cls = CLIPTextModelWithProjection if with_projection else CLIPTextModel
    hf = cls(HFCfg(hidden_size=hidden, intermediate_size=2 * hidden,
                   num_hidden_layers=1, num_attention_heads=2,
                   vocab_size=100, max_position_embeddings=8,
                   projection_dim=proj, hidden_act="gelu",
                   bos_token_id=1, eos_token_id=2))
    hf.save_pretrained(d, safe_serialization=True)


UNET_SD = {"block_out_channels": [8, 16, 16, 16], "layers_per_block": 1,
           "cross_attention_dim": 12, "attention_head_dim": 2,
           "norm_num_groups": 4, "sample_size": 16,
           "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
           "in_channels": 4, "out_channels": 4}
UNET_XL = {"block_out_channels": [8, 16, 16], "layers_per_block": 1,
           "cross_attention_dim": 12 + 16, "attention_head_dim": [1, 2, 2],
           "norm_num_groups": 4, "sample_size": 16,
           "transformer_layers_per_block": [0, 1, 1],
           "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                                "CrossAttnDownBlock2D"],
           "addition_embed_type": "text_time", "addition_time_embed_dim": 8,
           "projection_class_embeddings_input_dim": 16 + 48,
           "in_channels": 4, "out_channels": 4}
VAE_CFG = {"latent_channels": 4, "out_channels": 3,
           "block_out_channels": [8, 8, 16, 16], "layers_per_block": 1,
           "norm_num_groups": 4, "scaling_factor": 0.18215}


def _write_component(d, sub, cfg_json, weights):
    os.makedirs(os.path.join(d, sub), exist_ok=True)
    with open(os.path.join(d, sub, "config.json"), "w") as f:
        json.dump(cfg_json, f)
    save_file(weights, os.path.join(d, sub,
                                    "diffusion_pytorch_model.safetensors"))


def _write_sd_pipeline(d, xl=False):
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import (
        UNetConfig, build_sd_unet)
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)

    with open(os.path.join(d, "model_index.json"), "w") as f:
        json.dump({"_class_name": ("StableDiffusionXLPipeline" if xl
                                   else "StableDiffusionPipeline")}, f)
    _save_clip(os.path.join(d, "text_encoder"), with_projection=xl, seed=0)
    if xl:
        _save_clip(os.path.join(d, "text_encoder_2"), with_projection=True,
                   hidden=16, proj=16, seed=1)
    ucfg_json = UNET_XL if xl else UNET_SD
    ucfg = UNetConfig.from_hf(ucfg_json)
    uw = _recorded_weights(build_sd_unet, ucfg, batch=2, latent_hw=(16, 16))
    _write_component(d, "unet", ucfg_json, uw)
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import \
        build_vae_encoder

    vw = _recorded_weights(build_vae_decoder, VAEConfig.from_hf(VAE_CFG),
                           latent_hw=(16, 16))
    vw.update(_recorded_weights(build_vae_encoder,
                                VAEConfig.from_hf(VAE_CFG),
                                image_hw=(128, 128)))
    _write_component(d, "vae", VAE_CFG, vw)
    os.makedirs(os.path.join(d, "scheduler"), exist_ok=True)
    with open(os.path.join(d, "scheduler", "scheduler_config.json"),
              "w") as f:
        json.dump({"prediction_type": "epsilon"}, f)
    return d


class TestDiffusersLoader:
    def test_sd_pipeline_loads_and_generates(self, tmp_path):
        from whisper_tensor_tpu.importers.loaders import identify_and_load
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, ImageGenerationInterface,
            image_interface_from_bundle)

        d = _write_sd_pipeline(str(tmp_path))
        bundle = identify_and_load(d, dtype="f32")
        assert bundle.meta["architecture"] == "diffusers-sd"
        assert bundle.interfaces["image"]["prediction_type"] == "epsilon"
        iface = image_interface_from_bundle(bundle, mode="oracle")
        assert type(iface) is ImageGenerationInterface
        img = iface.run("a tpu", cfg=ImageGenConfig(steps=2, height=128,
                                                    width=128, seed=1))
        assert img.pixels.shape == (128, 128, 3)
        assert img.pixels.dtype == np.uint8

    def test_sdxl_pipeline_loads_and_generates(self, tmp_path):
        from whisper_tensor_tpu.importers.loaders import identify_and_load
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, SDXLImageGenerationInterface,
            image_interface_from_bundle)

        d = _write_sd_pipeline(str(tmp_path), xl=True)
        bundle = identify_and_load(d, dtype="f32")
        assert bundle.meta["architecture"] == "diffusers-sdxl"
        iface = image_interface_from_bundle(bundle, mode="oracle")
        assert isinstance(iface, SDXLImageGenerationInterface)
        img = iface.run("a tpu", cfg=ImageGenConfig(steps=2, height=128,
                                                    width=128, seed=2))
        assert img.pixels.shape == (128, 128, 3)

    def test_unet_config_from_hf_head_semantics(self):
        """attention_head_dim in diffusers configs is HEAD COUNT."""
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
            UNetConfig

        cfg = UNetConfig.from_hf(UNET_XL)
        assert cfg.heads_for(16, 1) == 2
        assert cfg.down_has_attn == (False, True, True)
        assert cfg.tf_layers(2) == 1
        assert cfg.addition_embed
        sd = UNetConfig.from_hf(UNET_SD)
        assert sd.heads_for(16, 0) == 2 and not sd.addition_embed


def _save_t5(d, seed=0, d_model=16):
    from transformers import T5Config as HFT5
    from transformers import T5EncoderModel

    torch.manual_seed(seed)
    hf = T5EncoderModel(HFT5(vocab_size=64, d_model=d_model, d_kv=8,
                             d_ff=2 * d_model, num_layers=1, num_heads=2))
    hf.save_pretrained(d, safe_serialization=True)


MMDIT_CFG = {"num_layers": 2, "num_attention_heads": 2,
             "attention_head_dim": 8, "in_channels": 4, "out_channels": 4,
             "patch_size": 2, "sample_size": 16, "pos_embed_max_size": 16,
             "joint_attention_dim": 32, "pooled_projection_dim": 28}
FLUX_CFG = {"num_layers": 1, "num_single_layers": 2,
            "num_attention_heads": 2, "attention_head_dim": 8,
            "in_channels": 16, "joint_attention_dim": 16,
            "pooled_projection_dim": 12, "guidance_embeds": True,
            "axes_dims_rope": [2, 4, 2]}
VAE16 = dict(VAE_CFG)


def _write_sd3_pipeline(d):
    from whisper_tensor_tpu.importers.recipes.diffusion.mmdit import (
        SD3Config, build_sd3_mmdit, random_sd3_weights)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
        random_unet_weights
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)

    with open(os.path.join(d, "model_index.json"), "w") as f:
        json.dump({"_class_name": "StableDiffusion3Pipeline"}, f)
    _save_clip(os.path.join(d, "text_encoder"), with_projection=True, seed=0)
    _save_clip(os.path.join(d, "text_encoder_2"), with_projection=True,
               hidden=16, proj=16, seed=1)
    # T5 width must equal the MMDiT joint dim (as in real SD3)
    _save_t5(os.path.join(d, "text_encoder_3"), seed=2, d_model=32)
    mcfg = SD3Config.from_hf(MMDIT_CFG)
    base = random_sd3_weights(3)(mcfg)
    rec = {}

    def getter(name, shape=None):
        rec[name] = np.ascontiguousarray(base(name), dtype=np.float32)
        return rec[name]

    build_sd3_mmdit(getter, mcfg, batch=2, context_len=77 + 6,
                    latent_hw=(16, 16))
    _write_component(d, "transformer", MMDIT_CFG, rec)
    vw = _recorded_weights(build_vae_decoder, VAEConfig.from_hf(VAE16),
                           latent_hw=(16, 16))
    _write_component(d, "vae", VAE16, vw)
    return d


def _write_flux_pipeline(d):
    from whisper_tensor_tpu.importers.recipes.diffusion.flux import (
        FluxConfig, build_flux, random_flux_weights)
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)

    with open(os.path.join(d, "model_index.json"), "w") as f:
        json.dump({"_class_name": "FluxPipeline"}, f)
    _save_clip(os.path.join(d, "text_encoder"), with_projection=False, seed=0)
    _save_t5(os.path.join(d, "text_encoder_2"), seed=1)
    fcfg = FluxConfig.from_hf(FLUX_CFG)
    base = random_flux_weights(4)(fcfg)
    rec = {}

    def getter(name, shape=None):
        rec[name] = np.ascontiguousarray(base(name), dtype=np.float32)
        return rec[name]

    build_flux(getter, fcfg, batch=1, context_len=6, latent_hw=(16, 16))
    _write_component(d, "transformer", FLUX_CFG, rec)
    vw = _recorded_weights(build_vae_decoder, VAEConfig.from_hf(VAE16),
                           latent_hw=(16, 16))
    _write_component(d, "vae", VAE16, vw)
    return d


class TestDiffusersLoaderSD3Flux:
    def test_sd3_dir_loads_and_generates(self, tmp_path):
        from whisper_tensor_tpu.importers.loaders import identify_and_load
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, SD3ImageGenerationInterface,
            image_interface_from_bundle)

        d = _write_sd3_pipeline(str(tmp_path))
        bundle = identify_and_load(d, dtype="f32", t5_seq_len=6)
        assert bundle.meta["architecture"] == "diffusers-sd3"
        iface = image_interface_from_bundle(bundle, mode="oracle")
        assert isinstance(iface, SD3ImageGenerationInterface)
        assert iface.t5 is not None
        img = iface.run("a tpu", cfg=ImageGenConfig(
            steps=2, height=128, width=128, schedule="rectified_flow",
            seed=3))
        assert img.pixels.shape == (128, 128, 3)

    def test_flux_dir_loads_and_generates(self, tmp_path):
        from whisper_tensor_tpu.importers.loaders import identify_and_load
        from whisper_tensor_tpu.interfaces.image_gen import (
            FluxImageGenerationInterface, ImageGenConfig,
            image_interface_from_bundle)

        d = _write_flux_pipeline(str(tmp_path))
        bundle = identify_and_load(d, dtype="f32", t5_seq_len=6,
                                   height=128, width=128)
        assert bundle.meta["architecture"] == "diffusers-flux"
        iface = image_interface_from_bundle(bundle, mode="oracle")
        assert isinstance(iface, FluxImageGenerationInterface)
        img = iface.run("a tpu", cfg=ImageGenConfig(
            steps=2, height=128, width=128, schedule="rectified_flow",
            guidance_scale=3.5, seed=5))
        assert img.pixels.shape == (128, 128, 3)


class TestImg2Img:
    def test_loader_builds_encoder_and_img2img_runs(self, tmp_path):
        """img2img=1 loader config adds the VAE encoder; the bundle
        interface then supports run_img2img through the CLI-visible
        path."""
        from whisper_tensor_tpu.importers.loaders import identify_and_load
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, image_interface_from_bundle)

        d = _write_sd_pipeline(str(tmp_path))
        bundle = identify_and_load(d, dtype="f32", img2img="1",
                                   height=128, width=128)
        assert "vae_encoder" in bundle.interfaces["image"]
        iface = image_interface_from_bundle(bundle, mode="oracle")
        assert iface.vae_encoder is not None
        rng = np.random.default_rng(0)
        init = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
        img = iface.run_img2img(
            "a tpu", init, strength=0.5,
            cfg=ImageGenConfig(steps=2, height=128, width=128, seed=1))
        assert img.pixels.shape == (128, 128, 3)
        assert img.pixels.dtype == np.uint8

    def test_sdxl_img2img(self, tmp_path):
        """run_img2img inherits into the SDXL interface (dual-encoder
        extras flow through the shared _denoise path)."""
        from whisper_tensor_tpu.importers.loaders import identify_and_load
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, image_interface_from_bundle)

        d = _write_sd_pipeline(str(tmp_path), xl=True)
        bundle = identify_and_load(d, dtype="f32", img2img="1",
                                   height=128, width=128)
        iface = image_interface_from_bundle(bundle, mode="oracle")
        rng = np.random.default_rng(1)
        init = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
        img = iface.run_img2img(
            "a tpu", init, strength=0.5,
            cfg=ImageGenConfig(steps=2, height=128, width=128, seed=2))
        assert img.pixels.shape == (128, 128, 3)
