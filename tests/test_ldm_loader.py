"""LDM single-file checkpoint support: golden name-mapping pairs (the
canonical LDM<->diffusers correspondence), shape-probed config detection,
and an end-to-end load that must generate the SAME image as the direct
diffusers-layout build of identical weights."""

import os

import numpy as np
import pytest
import torch
from safetensors.numpy import save_file

from whisper_tensor_tpu.importers.ldm import (unet_diffusers_to_ldm,
                                              vae_decoder_diffusers_to_ldm)

SD15_ATTN = (True, True, True, False)


class TestGoldenMappings:
    """Hand-checked pairs from the canonical conversion table (SD1.5
    geometry: 4 blocks, layers_per_block=2)."""

    @pytest.mark.parametrize("diff,ldm", [
        ("time_embedding.linear_1.weight", "time_embed.0.weight"),
        ("time_embedding.linear_2.bias", "time_embed.2.bias"),
        ("conv_in.weight", "input_blocks.0.0.weight"),
        ("conv_norm_out.weight", "out.0.weight"),
        ("conv_out.bias", "out.2.bias"),
        ("down_blocks.0.resnets.0.conv1.weight",
         "input_blocks.1.0.in_layers.2.weight"),
        ("down_blocks.0.resnets.0.norm1.weight",
         "input_blocks.1.0.in_layers.0.weight"),
        ("down_blocks.0.resnets.1.time_emb_proj.weight",
         "input_blocks.2.0.emb_layers.1.weight"),
        ("down_blocks.0.resnets.1.norm2.bias",
         "input_blocks.2.0.out_layers.0.bias"),
        ("down_blocks.0.resnets.1.conv2.weight",
         "input_blocks.2.0.out_layers.3.weight"),
        ("down_blocks.1.resnets.0.conv_shortcut.weight",
         "input_blocks.4.0.skip_connection.weight"),
        ("down_blocks.0.downsamplers.0.conv.weight",
         "input_blocks.3.0.op.weight"),
        ("down_blocks.1.downsamplers.0.conv.weight",
         "input_blocks.6.0.op.weight"),
        ("down_blocks.1.attentions.0.proj_in.weight",
         "input_blocks.4.1.proj_in.weight"),
        ("down_blocks.2.attentions.1.transformer_blocks.0.attn2.to_k.weight",
         "input_blocks.8.1.transformer_blocks.0.attn2.to_k.weight"),
        ("mid_block.resnets.0.conv1.weight",
         "middle_block.0.in_layers.2.weight"),
        ("mid_block.attentions.0.proj_out.weight",
         "middle_block.1.proj_out.weight"),
        ("mid_block.resnets.1.norm1.weight",
         "middle_block.2.in_layers.0.weight"),
        ("up_blocks.0.resnets.0.conv1.weight",
         "output_blocks.0.0.in_layers.2.weight"),
        ("up_blocks.0.resnets.2.conv2.weight",
         "output_blocks.2.0.out_layers.3.weight"),
        ("up_blocks.1.attentions.1.transformer_blocks.0.ff.net.0.proj.weight",
         "output_blocks.4.1.transformer_blocks.0.ff.net.0.proj.weight"),
        # up block 0 (deepest, no attention in SD1.5) upsampler -> module 1
        ("up_blocks.0.upsamplers.0.conv.weight",
         "output_blocks.2.1.conv.weight"),
        # up block 2 (has attention) upsampler -> module 2
        ("up_blocks.2.upsamplers.0.conv.weight",
         "output_blocks.8.2.conv.weight"),
    ])
    def test_unet_pairs(self, diff, ldm):
        assert unet_diffusers_to_ldm(diff, 2, SD15_ATTN) == ldm

    @pytest.mark.parametrize("diff,ldm", [
        ("decoder.conv_in.weight", "decoder.conv_in.weight"),
        ("decoder.conv_norm_out.weight", "decoder.norm_out.weight"),
        ("decoder.mid_block.resnets.0.conv1.weight",
         "decoder.mid.block_1.conv1.weight"),
        ("decoder.mid_block.attentions.0.group_norm.weight",
         "decoder.mid.attn_1.norm.weight"),
        ("decoder.mid_block.attentions.0.to_q.weight",
         "decoder.mid.attn_1.q.weight"),
        ("decoder.mid_block.attentions.0.to_out.0.weight",
         "decoder.mid.attn_1.proj_out.weight"),
        # diffusers up_blocks run high->low LDM index
        ("decoder.up_blocks.0.resnets.0.conv1.weight",
         "decoder.up.3.block.0.conv1.weight"),
        ("decoder.up_blocks.3.resnets.1.conv_shortcut.weight",
         "decoder.up.0.block.1.nin_shortcut.weight"),
        ("decoder.up_blocks.1.upsamplers.0.conv.weight",
         "decoder.up.2.upsample.conv.weight"),
        ("post_quant_conv.weight", "post_quant_conv.weight"),
    ])
    def test_vae_pairs(self, diff, ldm):
        assert vae_decoder_diffusers_to_ldm(diff, 4) == ldm


def _write_ldm_checkpoint(path):
    """Synthesize a tiny SD1.5-shaped LDM checkpoint: record the
    diffusers-named weights the recipes request, store them under the
    translated LDM keys (VAE attention as 1x1 convs, as LDM does)."""
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel

    from whisper_tensor_tpu.importers.ldm import (CLIP_PREFIX, UNET_PREFIX,
                                                  VAE_PREFIX)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import (
        UNetConfig, build_sd_unet, random_unet_weights)
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)

    # cross_attention_dim equals the CLIP hidden size; head count is a
    # reshape convention that cannot be inferred from weights — the
    # detector assumes SD1.x's 8 heads, so the fixture uses 8 too
    # norm_groups likewise: real SD uses 32; the detector picks the
    # largest power-of-two divisor, which for these channels is 8
    ucfg = UNetConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=2,
                      cross_attention_dim=64, attention_head_dim=8,
                      norm_groups=8, time_embed_dim=32)
    vcfg = VAEConfig(latent_channels=4, block_out_channels=(8, 8, 16, 16),
                     layers_per_block=1, norm_groups=4)
    # NOTE: the VAE loader infers 32-if-divisible else 4 — chans of 8/16
    # give 4, matching this fixture
    sd = {}
    base = random_unet_weights(0)

    def u_get(name, shape=None):
        arr = np.ascontiguousarray(base(name, shape), dtype=np.float32)
        sd[UNET_PREFIX + unet_diffusers_to_ldm(
            name, ucfg.layers_per_block, ucfg.down_has_attn)] = arr
        return arr

    def v_get(name, shape=None):
        arr = np.ascontiguousarray(base("V" + name, shape),
                                   dtype=np.float32)
        key = VAE_PREFIX + vae_decoder_diffusers_to_ldm(name, 4)
        if "attentions" in name and name.endswith(".weight") and arr.ndim == 2:
            sd[key] = arr[:, :, None, None]     # LDM stores 1x1 convs
        else:
            sd[key] = arr
        return arr

    from whisper_tensor_tpu.importers.ldm import vae_encoder_diffusers_to_ldm
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import \
        build_vae_encoder

    def ve_get(name, shape=None):
        arr = np.ascontiguousarray(base("VE" + name, shape),
                                   dtype=np.float32)
        key = VAE_PREFIX + vae_encoder_diffusers_to_ldm(name)
        if "attentions" in name and name.endswith(".weight") and arr.ndim == 2:
            sd[key] = arr[:, :, None, None]     # LDM stores 1x1 convs
        else:
            sd[key] = arr
        return arr

    build_sd_unet(u_get, ucfg, batch=2, latent_hw=(16, 16))
    build_vae_decoder(v_get, vcfg, latent_hw=(16, 16))
    build_vae_encoder(ve_get, vcfg, image_hw=(128, 128))

    torch.manual_seed(0)
    hf = CLIPTextModel(HFCfg(hidden_size=64, intermediate_size=128,
                             num_hidden_layers=1, num_attention_heads=1,
                             vocab_size=100, max_position_embeddings=8,
                             bos_token_id=1, eos_token_id=2))
    for k, v in hf.state_dict().items():
        sd[CLIP_PREFIX + k] = v.float().numpy()
    save_file(sd, path)
    return ucfg, vcfg, base, hf


def test_ldm_checkpoint_loads_and_matches_direct_build(tmp_path):
    from whisper_tensor_tpu.importers.loaders import identify_and_load
    from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
        ClipTextConfig, build_clip_text)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
        build_sd_unet
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import \
        build_vae_decoder
    from whisper_tensor_tpu.interfaces.image_gen import (
        ImageGenConfig, ImageGenerationInterface, image_interface_from_bundle)
    from whisper_tensor_tpu.model import Model

    ckpt = str(tmp_path / "sd-tiny.safetensors")
    ucfg, vcfg, base, hf = _write_ldm_checkpoint(ckpt)

    bundle = identify_and_load(ckpt, dtype="f32", height=128, width=128)
    assert bundle.meta["architecture"] == "ldm-sd"
    iface = image_interface_from_bundle(bundle, mode="oracle")
    cfgd = ImageGenConfig(steps=2, height=128, width=128, seed=6)
    img = iface.run("a tpu", cfg=cfgd)

    # direct diffusers-layout build with the SAME weights must agree
    hsd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    te = Model.new_from_onnx(build_clip_text(
        lambda n: hsd[n],
        ClipTextConfig(num_hidden_layers=1, hidden_size=64,
                       num_attention_heads=1, intermediate_size=128,
                       vocab_size=100, max_position_embeddings=8),
        seq_len=8))
    unet = Model.new_from_onnx(build_sd_unet(base, ucfg, batch=2,
                                             latent_hw=(16, 16)))
    vae = Model.new_from_onnx(build_vae_decoder(
        lambda n, s=None: base("V" + n, s), vcfg, latent_hw=(16, 16)))
    ref = ImageGenerationInterface(te, unet, vae, tokenizer=None,
                                   bos_token_id=98, uncond_token_id=99,
                                   seq_len=8)
    from whisper_tensor_tpu.backends.eval_backend import EvalBackend

    ref._backends = {m.id: EvalBackend("oracle") for m in (te, unet, vae)}
    ref_img = ref.run("a tpu", cfg=cfgd)
    np.testing.assert_array_equal(img.pixels, ref_img.pixels)


def test_detect_unet_config(tmp_path):
    from whisper_tensor_tpu.importers.ldm import (UNET_PREFIX,
                                                  detect_unet_config)
    from whisper_tensor_tpu.importers.safetensors_io import SafetensorsStore

    ckpt = str(tmp_path / "sd-tiny.safetensors")
    ucfg, _, _, _ = _write_ldm_checkpoint(ckpt)
    store = SafetensorsStore([ckpt])
    det = detect_unet_config(lambda k: (UNET_PREFIX + k) in store,
                             lambda k: store.load(UNET_PREFIX + k).shape)
    assert det.block_out_channels == ucfg.block_out_channels
    assert det.layers_per_block == ucfg.layers_per_block
    assert det.cross_attention_dim == ucfg.cross_attention_dim
    assert det.down_has_attn == ucfg.down_has_attn
    assert det.time_embed_dim == 32
    assert det.norm_groups == 8
    assert not det.addition_embed


def _hf_to_openclip_sd(hf_sd, prefix):
    """Inverse mapping: HF CLIPTextModel state dict -> open_clip names."""
    out = {}
    L = max(int(k.split(".")[3]) for k in hf_sd
            if k.startswith("text_model.encoder.layers.")) + 1
    out[prefix + "token_embedding.weight"] = hf_sd[
        "text_model.embeddings.token_embedding.weight"]
    out[prefix + "positional_embedding"] = hf_sd[
        "text_model.embeddings.position_embedding.weight"]
    out[prefix + "ln_final.weight"] = hf_sd["text_model.final_layer_norm.weight"]
    out[prefix + "ln_final.bias"] = hf_sd["text_model.final_layer_norm.bias"]
    for i in range(L):
        hp = f"text_model.encoder.layers.{i}."
        op = prefix + f"transformer.resblocks.{i}."
        out[op + "attn.in_proj_weight"] = np.concatenate(
            [hf_sd[hp + f"self_attn.{x}_proj.weight"] for x in "qkv"], axis=0)
        out[op + "attn.in_proj_bias"] = np.concatenate(
            [hf_sd[hp + f"self_attn.{x}_proj.bias"] for x in "qkv"], axis=0)
        out[op + "attn.out_proj.weight"] = hf_sd[hp + "self_attn.out_proj.weight"]
        out[op + "attn.out_proj.bias"] = hf_sd[hp + "self_attn.out_proj.bias"]
        out[op + "ln_1.weight"] = hf_sd[hp + "layer_norm1.weight"]
        out[op + "ln_1.bias"] = hf_sd[hp + "layer_norm1.bias"]
        out[op + "ln_2.weight"] = hf_sd[hp + "layer_norm2.weight"]
        out[op + "ln_2.bias"] = hf_sd[hp + "layer_norm2.bias"]
        out[op + "mlp.c_fc.weight"] = hf_sd[hp + "mlp.fc1.weight"]
        out[op + "mlp.c_fc.bias"] = hf_sd[hp + "mlp.fc1.bias"]
        out[op + "mlp.c_proj.weight"] = hf_sd[hp + "mlp.fc2.weight"]
        out[op + "mlp.c_proj.bias"] = hf_sd[hp + "mlp.fc2.bias"]
    return out


def test_openclip_mapping_matches_transformers():
    """HF weights -> open_clip names -> openclip_getter -> recipe must
    reproduce the transformers forward exactly (incl. fused qkv split
    and transposed text_projection)."""
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModelWithProjection

    from whisper_tensor_tpu.importers.ldm import (detect_openclip_config,
                                                  openclip_getter)
    from whisper_tensor_tpu.importers.recipes.diffusion.clip import \
        build_clip_text
    from whisper_tensor_tpu.model import Model

    torch.manual_seed(2)
    hf = CLIPTextModelWithProjection(HFCfg(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=1, vocab_size=100, max_position_embeddings=8,
        projection_dim=24, hidden_act="gelu", eos_token_id=2))
    hf.eval()
    hf_sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    oc = _hf_to_openclip_sd(hf_sd, "model.")
    oc["model.text_projection"] = np.ascontiguousarray(
        hf_sd["text_projection.weight"].T)

    has = lambda k: k in oc  # noqa: E731
    cfg = detect_openclip_config(oc.__getitem__, has, "model.")
    cfg.eos_token_id = None
    data = build_clip_text(openclip_getter(oc.__getitem__, "model."), cfg,
                           seq_len=8)
    m = Model.new_from_onnx(data)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, (2, 8)).astype(np.int64)
    out = m.eval({"input_ids": ids})
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids))
    np.testing.assert_allclose(out["last_hidden_state"],
                               ref.last_hidden_state.numpy(),
                               rtol=2e-3, atol=2e-4)


def _write_sdxl_ldm_checkpoint(path):
    """Tiny SDXL-shaped single-file checkpoint: label_emb UNet +
    conditioner.embedders.{0: CLIP-L HF naming, 1: open_clip bigG}."""
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel, CLIPTextModelWithProjection

    from whisper_tensor_tpu.importers.ldm import (UNET_PREFIX, VAE_PREFIX,
                                                  unet_diffusers_to_ldm,
                                                  vae_decoder_diffusers_to_ldm)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import (
        UNetConfig, build_sd_unet, random_unet_weights)
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)

    ucfg = UNetConfig(block_out_channels=(8, 16, 16),
                      down_has_attn=(False, True, True),
                      transformer_layers_per_block=(0, 1, 1),
                      cross_attention_dim=12 + 16, attention_head_dim=2,
                      norm_groups=8, layers_per_block=2,
                      addition_embed=True, addition_time_embed_dim=8,
                      projection_class_embeddings_input_dim=16 + 48,
                      time_embed_dim=32)
    vcfg = VAEConfig(latent_channels=4, block_out_channels=(8, 8, 16, 16),
                     layers_per_block=1, norm_groups=4)
    sd = {}
    base = random_unet_weights(3)

    def u_get(name, shape=None):
        arr = np.ascontiguousarray(base(name, shape), dtype=np.float32)
        sd[UNET_PREFIX + unet_diffusers_to_ldm(
            name, ucfg.layers_per_block, ucfg.down_has_attn)] = arr
        return arr

    def v_get(name, shape=None):
        arr = np.ascontiguousarray(base("V" + name, shape), dtype=np.float32)
        key = VAE_PREFIX + vae_decoder_diffusers_to_ldm(name, 4)
        sd[key] = (arr[:, :, None, None]
                   if ("attentions" in name and name.endswith(".weight")
                       and arr.ndim == 2) else arr)
        return arr

    from whisper_tensor_tpu.importers.ldm import vae_encoder_diffusers_to_ldm
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import \
        build_vae_encoder

    def ve_get(name, shape=None):
        arr = np.ascontiguousarray(base("VE" + name, shape),
                                   dtype=np.float32)
        key = VAE_PREFIX + vae_encoder_diffusers_to_ldm(name)
        if "attentions" in name and name.endswith(".weight") and arr.ndim == 2:
            sd[key] = arr[:, :, None, None]     # LDM stores 1x1 convs
        else:
            sd[key] = arr
        return arr

    build_sd_unet(u_get, ucfg, batch=2, latent_hw=(16, 16))
    build_vae_decoder(v_get, vcfg, latent_hw=(16, 16))
    build_vae_encoder(ve_get, vcfg, image_hw=(128, 128))

    torch.manual_seed(4)
    te1 = CLIPTextModel(HFCfg(hidden_size=12, intermediate_size=24,
                              num_hidden_layers=1, num_attention_heads=2,
                              vocab_size=100, max_position_embeddings=8,
                              hidden_act="gelu"))
    for k, v in te1.state_dict().items():
        sd["conditioner.embedders.0.transformer." + k] = v.float().numpy()
    # bigG convention: projection_dim == hidden_size, heads = E // 64
    te2 = CLIPTextModelWithProjection(HFCfg(
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=1, vocab_size=100, max_position_embeddings=8,
        projection_dim=16, hidden_act="gelu"))
    t2sd = {k: v.float().numpy() for k, v in te2.state_dict().items()}
    sd.update(_hf_to_openclip_sd(t2sd, "conditioner.embedders.1.model."))
    sd["conditioner.embedders.1.model.text_projection"] = \
        np.ascontiguousarray(t2sd["text_projection.weight"].T)
    save_file(sd, path)


def test_sdxl_single_file_loads_and_generates(tmp_path):
    from whisper_tensor_tpu.importers.loaders import identify_and_load
    from whisper_tensor_tpu.interfaces.image_gen import (
        ImageGenConfig, SDXLImageGenerationInterface,
        image_interface_from_bundle)

    ckpt = str(tmp_path / "sdxl-tiny.safetensors")
    _write_sdxl_ldm_checkpoint(ckpt)
    bundle = identify_and_load(ckpt, dtype="f32", height=128, width=128)
    assert bundle.meta["architecture"] == "ldm-sdxl"
    iface = image_interface_from_bundle(bundle, mode="oracle")
    assert isinstance(iface, SDXLImageGenerationInterface)
    img = iface.run("a tpu", cfg=ImageGenConfig(steps=2, height=128,
                                                width=128, seed=8))
    assert img.pixels.shape == (128, 128, 3)
    assert img.pixels.dtype == np.uint8


def test_ldm_img2img(tmp_path):
    """img2img=1 on a single-file LDM checkpoint builds the VAE encoder
    from the first_stage_model encoder weights and generates."""
    from whisper_tensor_tpu.importers.loaders import identify_and_load
    from whisper_tensor_tpu.interfaces.image_gen import (
        ImageGenConfig, image_interface_from_bundle)

    path = str(tmp_path / "sd.safetensors")
    _write_ldm_checkpoint(path)
    bundle = identify_and_load(path, img2img="1", height=128, width=128)
    assert "vae_encoder" in bundle.interfaces["image"]
    iface = image_interface_from_bundle(bundle, mode="oracle")
    rng = np.random.default_rng(0)
    init = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
    img = iface.run_img2img(
        "a tpu", init, strength=0.5,
        cfg=ImageGenConfig(steps=2, height=128, width=128, seed=1))
    assert img.pixels.shape == (128, 128, 3)
