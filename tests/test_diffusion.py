"""Diffusion stack tests: CLIP text encoder vs transformers, UNet
structure/backends, VAE decoder, schedulers, full pipeline smoke."""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.model import Model


class TestClipText:
    def test_logits_vs_transformers(self):
        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel

        from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
            ClipTextConfig, build_clip_text)

        torch.manual_seed(0)
        hf = CLIPTextModel(HFCfg(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=100,
            max_position_embeddings=16, attention_dropout=0.0))
        hf.eval()
        cfg = ClipTextConfig(num_hidden_layers=2, hidden_size=32,
                             num_attention_heads=4, intermediate_size=64,
                             vocab_size=100, max_position_embeddings=16)
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        data = build_clip_text(lambda n: sd[n], cfg, seq_len=16)
        model = Model.new_from_onnx(data, name="tiny-clip")
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 100, (2, 16)).astype(np.int64)
        out = model.eval({"input_ids": ids})
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
        np.testing.assert_allclose(out["last_hidden_state"], ref,
                                   rtol=2e-3, atol=2e-4)
        assert out["pooled"].shape == (2, 32)

    def test_projection_and_penultimate_vs_transformers(self):
        """SDXL conditioning path: hidden_states[-2] + pooled projection
        must match CLIPTextModelWithProjection."""
        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModelWithProjection

        from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
            ClipTextConfig, build_clip_text)

        torch.manual_seed(1)
        hf = CLIPTextModelWithProjection(HFCfg(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, vocab_size=100,
            max_position_embeddings=16, attention_dropout=0.0,
            projection_dim=24, hidden_act="gelu", eos_token_id=99))
        hf.eval()
        cfg = ClipTextConfig(num_hidden_layers=3, hidden_size=32,
                             num_attention_heads=4, intermediate_size=64,
                             vocab_size=100, max_position_embeddings=16,
                             hidden_act="gelu", projection_dim=24,
                             eos_token_id=99)
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        data = build_clip_text(lambda n: sd[n], cfg, seq_len=16)
        model = Model.new_from_onnx(data, name="tiny-clip-proj")
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 99, (2, 16)).astype(np.int64)
        ids[0, 5] = 99   # EOS mid-sequence
        ids[1, 11] = 99
        out = model.eval({"input_ids": ids})
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids), output_hidden_states=True)
        np.testing.assert_allclose(out["text_embeds"],
                                   ref.text_embeds.numpy(),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(out["penultimate_hidden_state"],
                                   ref.hidden_states[-2].numpy(),
                                   rtol=2e-3, atol=2e-4)


@pytest.fixture(scope="module")
def tiny_unet():
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import (
        UNetConfig, build_sd_unet, random_unet_weights)

    cfg = UNetConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                     cross_attention_dim=12, norm_groups=4,
                     attention_head_dim=2)
    data = build_sd_unet(random_unet_weights(), cfg, latent_hw=(16, 16))
    return Model.new_from_onnx(data, name="tiny-unet")


class TestUNet:
    def test_oracle_vs_xla(self, tiny_unet):
        rng = np.random.default_rng(0)
        feeds = {"sample": rng.standard_normal((1, 4, 16, 16)).astype(np.float32),
                 "timestep": np.asarray(5.0, dtype=np.float32),
                 "encoder_hidden_states": rng.standard_normal((1, 7, 12)).astype(np.float32)}
        ref = tiny_unet.eval(feeds)["out"]
        assert ref.shape == (1, 4, 16, 16) and np.isfinite(ref).all()
        out = tiny_unet.eval(feeds, mode="xla")["out"]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)

    def test_timestep_conditioning_changes_output(self, tiny_unet):
        rng = np.random.default_rng(1)
        feeds = {"sample": rng.standard_normal((1, 4, 16, 16)).astype(np.float32),
                 "encoder_hidden_states": rng.standard_normal((1, 7, 12)).astype(np.float32)}
        o1 = tiny_unet.eval({**feeds, "timestep": np.asarray(1.0, np.float32)})["out"]
        o2 = tiny_unet.eval({**feeds, "timestep": np.asarray(900.0, np.float32)})["out"]
        assert np.abs(o1 - o2).max() > 1e-4


class TestVAE:
    def test_decoder_shapes(self):
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
            random_unet_weights
        from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
            VAEConfig, build_vae_decoder)

        cfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                        norm_groups=4)
        data = build_vae_decoder(random_unet_weights(1), cfg, latent_hw=(8, 8))
        m = Model.new_from_onnx(data, name="tiny-vae")
        rng = np.random.default_rng(0)
        out = m.eval({"latents": rng.standard_normal((1, 4, 8, 8)).astype(np.float32)})
        assert out["image"].shape == (1, 3, 64, 64)
        assert np.isfinite(out["image"]).all()


class TestSchedulers:
    def test_euler_schedule_properties(self):
        from whisper_tensor_tpu.interfaces.image_gen import euler_discrete_schedule

        s = euler_discrete_schedule(20)
        assert s["sigmas"].shape == (21,) and s["timesteps"].shape == (20,)
        assert s["sigmas"][-1] == 0.0
        assert np.all(np.diff(s["sigmas"]) <= 0)   # monotonically decreasing
        assert s["sigmas"][0] > 10                 # SD1.5 sigma_max ~14.6

    def test_flow_schedule_properties(self):
        from whisper_tensor_tpu.interfaces.image_gen import rectified_flow_schedule

        s = rectified_flow_schedule(10, shift=3.0)
        assert s["sigmas"][0] == pytest.approx(1.0)
        assert s["sigmas"][-1] == 0.0
        assert np.all(np.diff(s["sigmas"]) < 0)


class TestPipeline:
    def test_full_text_to_image_smoke(self, tiny_unet):
        """Tiny CLIP + tiny UNet + tiny VAE end to end: produces an image,
        CFG + euler loop run, progress observed."""
        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel

        from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
            ClipTextConfig, build_clip_text)
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
            random_unet_weights
        from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
            VAEConfig, build_vae_decoder)
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, ImageGenerationInterface)

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
            seq_len=8), name="te")
        vae = Model.new_from_onnx(build_vae_decoder(
            random_unet_weights(1),
            VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                      norm_groups=4), latent_hw=(16, 16)), name="vae")

        iface = ImageGenerationInterface(te, tiny_unet, vae, tokenizer=None,
                                         bos_token_id=1, uncond_token_id=2,
                                         seq_len=8)
        # oracle mode for speed/portability in CI
        from whisper_tensor_tpu.backends.eval_backend import EvalBackend

        iface._backends = {m.id: EvalBackend("oracle")
                           for m in (te, tiny_unet, vae)}
        progress = []

        class Obs:
            def on_progress(self, node, f):
                progress.append(f)

        img = iface.run("a tpu", cfg=ImageGenConfig(steps=3, height=128,
                                                    width=128, seed=1),
                        observer=Obs())
        assert img.pixels.shape == (128, 128, 3)
        assert img.pixels.dtype == np.uint8
        assert len(progress) == 3


class TestSDXL:
    def _tiny_te(self, hidden, heads, seq, proj, seed):
        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModelWithProjection

        from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
            ClipTextConfig, build_clip_text)

        torch.manual_seed(seed)
        hf = CLIPTextModelWithProjection(HFCfg(
            hidden_size=hidden, intermediate_size=2 * hidden,
            num_hidden_layers=2, num_attention_heads=heads, vocab_size=100,
            max_position_embeddings=seq, projection_dim=proj,
            hidden_act="gelu"))
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        cfg = ClipTextConfig(num_hidden_layers=2, hidden_size=hidden,
                             num_attention_heads=heads,
                             intermediate_size=2 * hidden, vocab_size=100,
                             max_position_embeddings=seq, hidden_act="gelu",
                             projection_dim=proj)
        return Model.new_from_onnx(build_clip_text(lambda n: sd[n], cfg,
                                                   seq_len=seq))

    def test_sdxl_unet_oracle_vs_xla(self):
        """SDXL-shaped UNet (3 blocks, per-block transformer depth,
        head_dim heads, addition embeddings) — backends agree."""
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import (
            UNetConfig, build_sd_unet, random_unet_weights)

        cfg = UNetConfig(block_out_channels=(8, 16, 16),
                         down_has_attn=(False, True, True),
                         transformer_layers_per_block=(0, 1, 2),
                         cross_attention_dim=12, head_dim=8, norm_groups=4,
                         layers_per_block=1, addition_embed=True,
                         addition_time_embed_dim=8,
                         projection_class_embeddings_input_dim=16 + 48,
                         time_embed_dim=16)
        m = Model.new_from_onnx(build_sd_unet(random_unet_weights(), cfg,
                                              latent_hw=(16, 16)))
        rng = np.random.default_rng(0)
        feeds = {"sample": rng.standard_normal((2, 4, 16, 16)).astype(np.float32),
                 "timestep": np.asarray(5.0, dtype=np.float32),
                 "encoder_hidden_states":
                     rng.standard_normal((2, 8, 12)).astype(np.float32),
                 "text_embeds": rng.standard_normal((2, 16)).astype(np.float32),
                 "time_ids": np.tile(np.asarray(
                     [[128, 128, 0, 0, 128, 128]], np.float32), (2, 1))}
        ref = m.eval(feeds)["out"]
        assert ref.shape == (2, 4, 16, 16) and np.isfinite(ref).all()
        out = m.eval(feeds, mode="xla")["out"]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)
        # micro-conditioning reaches the output
        o2 = m.eval({**feeds, "time_ids": np.tile(np.asarray(
            [[64, 64, 0, 0, 64, 64]], np.float32), (2, 1))})["out"]
        assert np.abs(o2 - ref).max() > 1e-5

    def test_sdxl_pipeline_smoke(self):
        """Dual text encoders -> concat penultimate + pooled projection ->
        SDXL UNet with time_ids -> VAE. End to end on the oracle."""
        from whisper_tensor_tpu.backends.eval_backend import EvalBackend
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import (
            UNetConfig, build_sd_unet, random_unet_weights)
        from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
            VAEConfig, build_vae_decoder)
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, SDXLImageGenerationInterface)

        te1 = self._tiny_te(hidden=12, heads=2, seq=8, proj=12, seed=0)
        te2 = self._tiny_te(hidden=16, heads=2, seq=8, proj=16, seed=1)
        ucfg = UNetConfig(block_out_channels=(8, 16, 16),
                          down_has_attn=(False, True, True),
                          transformer_layers_per_block=(0, 1, 1),
                          cross_attention_dim=12 + 16, head_dim=8,
                          norm_groups=4, layers_per_block=1,
                          addition_embed=True, addition_time_embed_dim=8,
                          projection_class_embeddings_input_dim=16 + 48,
                          time_embed_dim=16)
        unet = Model.new_from_onnx(build_sd_unet(random_unet_weights(), ucfg,
                                                 latent_hw=(16, 16)))
        vae = Model.new_from_onnx(build_vae_decoder(
            random_unet_weights(1),
            VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                      norm_groups=4), latent_hw=(16, 16)))
        iface = SDXLImageGenerationInterface(
            te1, te2, unet, vae, tokenizer=None, bos_token_id=1,
            uncond_token_id=2, seq_len=8)
        iface._backends = {m.id: EvalBackend("oracle")
                           for m in (te1, te2, unet, vae)}
        img = iface.run("a tpu", cfg=ImageGenConfig(steps=2, height=128,
                                                    width=128, seed=1))
        assert img.pixels.shape == (128, 128, 3)
        assert img.pixels.dtype == np.uint8


class TestV_Prediction:
    def test_v_prediction_euler_step(self, tiny_unet):
        """SD2-768 v-prediction branch: runs, differs from epsilon, and a
        zero model output reduces to pure signal-preserving decay."""
        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel

        from whisper_tensor_tpu.backends.eval_backend import EvalBackend
        from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
            ClipTextConfig, build_clip_text)
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
            random_unet_weights
        from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
            VAEConfig, build_vae_decoder)
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, ImageGenerationInterface)

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
            seq_len=8))
        vae = Model.new_from_onnx(build_vae_decoder(
            random_unet_weights(1),
            VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                      norm_groups=4), latent_hw=(16, 16)))

        def make(pred):
            i = ImageGenerationInterface(te, tiny_unet, vae, tokenizer=None,
                                         bos_token_id=1, uncond_token_id=2,
                                         seq_len=8, prediction_type=pred)
            i._backends = {m.id: EvalBackend("oracle")
                           for m in (te, tiny_unet, vae)}
            return i

        cfgd = ImageGenConfig(steps=2, height=128, width=128, seed=5)
        img_eps = make("epsilon").run("x", cfg=cfgd)
        img_v = make("v_prediction").run("x", cfg=cfgd)
        assert img_v.pixels.shape == (128, 128, 3)
        assert not np.array_equal(img_eps.pixels, img_v.pixels)


class TestCompiledDenoiseLoop:
    """The fused-scan denoise program (all steps in one dispatch) must
    match the per-step python loop running on the same XLA kernels."""

    def _tiny_te_vae(self):
        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel

        from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
            ClipTextConfig, build_clip_text)
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
            random_unet_weights
        from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
            VAEConfig, build_vae_decoder)

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
            seq_len=8), name="te")
        vae = Model.new_from_onnx(build_vae_decoder(
            random_unet_weights(1),
            VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                      norm_groups=4), latent_hw=(16, 16)), name="vae")
        return te, vae

    @pytest.mark.parametrize("pred", ["epsilon", "v_prediction"])
    def test_sd_compiled_matches_loop(self, tiny_unet, pred):
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, ImageGenerationInterface)

        te, vae = self._tiny_te_vae()

        def make():
            return ImageGenerationInterface(
                te, tiny_unet, vae, tokenizer=None, bos_token_id=1,
                uncond_token_id=2, seq_len=8, prediction_type=pred)

        cfgd = ImageGenConfig(steps=3, height=128, width=128, seed=2)
        ref = make()
        ref.force_loop = True            # python loop on XLA kernels
        img_loop = ref.run("a tpu", cfg=cfgd)
        img_fast = make().run("a tpu", cfg=cfgd)
        np.testing.assert_allclose(
            img_fast.pixels.astype(np.int32),
            img_loop.pixels.astype(np.int32), atol=1)

    def test_rf_schedule_compiled_matches_loop(self, tiny_unet):
        """rectified_flow branch of the same program (SD3-style update
        but with the SD feed names via the base interface)."""
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, ImageGenerationInterface)

        te, vae = self._tiny_te_vae()

        def make():
            return ImageGenerationInterface(
                te, tiny_unet, vae, tokenizer=None, bos_token_id=1,
                uncond_token_id=2, seq_len=8)

        cfgd = ImageGenConfig(steps=3, height=128, width=128, seed=4,
                              schedule="rectified_flow", guidance_scale=3.0)
        ref = make()
        ref.force_loop = True
        img_loop = ref.run("x", cfg=cfgd)
        img_fast = make().run("x", cfg=cfgd)
        np.testing.assert_allclose(
            img_fast.pixels.astype(np.int32),
            img_loop.pixels.astype(np.int32), atol=1)


class TestVAEEncoder:
    def test_encoder_matches_torch_referee(self):
        """build_vae_encoder vs an independently written torch forward
        of the AutoencoderKL encoder (incl. the asymmetric bottom/right
        downsample padding and single-head mid attention)."""
        import torch
        import torch.nn.functional as F

        from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
            random_unet_weights
        from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
            VAEConfig, build_vae_encoder)

        cfg = VAEConfig(block_out_channels=(8, 8, 16, 16),
                        layers_per_block=1, norm_groups=4)
        wg = random_unet_weights(3)
        stash = {}

        def getter(name, shape):
            arr = wg(name, shape)
            stash[name] = np.asarray(arr, np.float32)
            return arr

        data = build_vae_encoder(getter, cfg, image_hw=(64, 64))
        m = Model.new_from_onnx(data, name="tiny-vae-enc")
        rng = np.random.default_rng(0)
        img = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
        got = np.asarray(m.eval({"image": img})["moments"])

        t = lambda n: torch.from_numpy(stash[n])

        def conv(x, name, stride=1, pad=1):
            return F.conv2d(x, t(name + ".weight"), t(name + ".bias"),
                            stride=stride, padding=pad)

        def gn(x, name):
            return F.group_norm(x, cfg.norm_groups, t(name + ".weight"),
                                t(name + ".bias"), eps=1e-6)

        def resnet(x, name, cin, cout):
            h = conv(F.silu(gn(x, name + ".norm1")), name + ".conv1")
            h = conv(F.silu(gn(h, name + ".norm2")), name + ".conv2")
            if cin != cout:
                x = conv(x, name + ".conv_shortcut", pad=0)
            return x + h

        def attn(x, name, c):
            h = gn(x, name + ".group_norm")
            B, C, H, W = h.shape
            seq = h.reshape(B, C, H * W).transpose(1, 2)

            def lin(xx, nm):
                return xx @ t(nm + ".weight").T + t(nm + ".bias")

            q, k, v = (lin(seq, name + p)
                       for p in (".to_q", ".to_k", ".to_v"))
            att = torch.softmax(q @ k.transpose(1, 2) / np.sqrt(C), -1) @ v
            att = lin(att, name + ".to_out.0")
            return x + att.transpose(1, 2).reshape(B, C, H, W)

        with torch.no_grad():
            x = conv(torch.from_numpy(img), "encoder.conv_in")
            cur = 8
            for bi, cout in enumerate(cfg.block_out_channels):
                x = resnet(x, f"encoder.down_blocks.{bi}.resnets.0",
                           cur, cout)
                cur = cout
                if bi < 3:
                    x = F.pad(x, (0, 1, 0, 1))
                    x = conv(x,
                             f"encoder.down_blocks.{bi}.downsamplers.0.conv",
                             stride=2, pad=0)
            x = resnet(x, "encoder.mid_block.resnets.0", cur, cur)
            x = attn(x, "encoder.mid_block.attentions.0", cur)
            x = resnet(x, "encoder.mid_block.resnets.1", cur, cur)
            x = conv(F.silu(gn(x, "encoder.conv_norm_out")),
                     "encoder.conv_out")
            ref = conv(x, "quant_conv", pad=0).numpy()
        assert got.shape == ref.shape == (1, 8, 8, 8)
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)

    def test_img2img_strength_semantics(self, tiny_unet):
        """img2img runs end to end; low strength stays closer to the
        init image than high strength."""
        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel

        from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
            ClipTextConfig, build_clip_text)
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
            random_unet_weights
        from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
            VAEConfig, build_vae_decoder, build_vae_encoder)
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, ImageGenerationInterface)

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
            seq_len=8), name="te")
        vcfg = VAEConfig(block_out_channels=(8, 8, 16, 16),
                         layers_per_block=1, norm_groups=4)
        vae = Model.new_from_onnx(build_vae_decoder(
            random_unet_weights(1), vcfg, latent_hw=(16, 16)), name="vae")
        enc = Model.new_from_onnx(build_vae_encoder(
            random_unet_weights(1), vcfg, image_hw=(128, 128)), name="venc")

        iface = ImageGenerationInterface(
            te, tiny_unet, vae, tokenizer=None, bos_token_id=1,
            uncond_token_id=2, seq_len=8, vae_encoder=enc)
        iface.force_loop = True   # countable per-step progress
        rng = np.random.default_rng(5)
        init = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
        cfgd = ImageGenConfig(steps=4, height=128, width=128, seed=3)

        class Obs:
            def __init__(self):
                self.n = 0

            def on_progress(self, node, f):
                self.n += 1

        # strength derives the schedule slice: 0.25 -> 1 step, 1.0 -> 4
        o1, o2 = Obs(), Obs()
        lo = iface.run_img2img("x", init, strength=0.25, cfg=cfgd,
                               observer=o1)
        hi = iface.run_img2img("x", init, strength=1.0, cfg=cfgd,
                               observer=o2)
        assert (o1.n, o2.n) == (1, 4)
        assert lo.pixels.shape == hi.pixels.shape == (128, 128, 3)
        assert not np.array_equal(lo.pixels, hi.pixels)
        # seeded determinism
        again = iface.run_img2img("x", init, strength=0.25, cfg=cfgd)
        np.testing.assert_array_equal(again.pixels, lo.pixels)


class TestInpaint:
    def _setup(self, tiny_unet):
        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel

        from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
            ClipTextConfig, build_clip_text)
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
            random_unet_weights
        from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
            VAEConfig, build_vae_decoder, build_vae_encoder)
        from whisper_tensor_tpu.interfaces.image_gen import \
            ImageGenerationInterface

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
            seq_len=8), name="te")
        vcfg = VAEConfig(block_out_channels=(8, 8, 16, 16),
                         layers_per_block=1, norm_groups=4)
        vae = Model.new_from_onnx(build_vae_decoder(
            random_unet_weights(1), vcfg, latent_hw=(16, 16)), name="vae")
        enc = Model.new_from_onnx(build_vae_encoder(
            random_unet_weights(1), vcfg, image_hw=(128, 128)), name="venc")
        return ImageGenerationInterface(
            te, tiny_unet, vae, tokenizer=None, bos_token_id=1,
            uncond_token_id=2, seq_len=8, vae_encoder=enc)

    def test_mask_ones_equals_img2img_full_strength(self, tiny_unet):
        from whisper_tensor_tpu.interfaces.image_gen import ImageGenConfig

        iface = self._setup(tiny_unet)
        rng = np.random.default_rng(8)
        init = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
        cfgd = ImageGenConfig(steps=2, height=128, width=128, seed=4)
        a = iface.run_inpaint("x", init, np.ones((128, 128), np.float32),
                              cfg=cfgd)
        b = iface.run_img2img("x", init, strength=1.0, cfg=cfgd)
        np.testing.assert_array_equal(a.pixels, b.pixels)

    def test_mask_zeros_reconstructs_init_latents(self, tiny_unet):
        """sigma[-1]=0 pins unmasked latents to lat0 exactly, so an
        all-zero mask must decode the (seed-sampled) init latents —
        independent of the UNet entirely."""
        from whisper_tensor_tpu.interfaces.image_gen import ImageGenConfig

        iface = self._setup(tiny_unet)
        rng = np.random.default_rng(9)
        init = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
        cfgd = ImageGenConfig(steps=2, height=128, width=128, seed=6)
        a = iface.run_inpaint("x", init, np.zeros((128, 128), np.float32),
                              cfg=cfgd)
        # replicate the encode + posterior sample with the same seed
        img = (init.astype(np.float32) / 255.0 * 2 - 1).transpose(2, 0, 1)[None]
        moments = np.asarray(iface._run(iface.vae_encoder,
                                        {"image": img})["moments"])
        lc = moments.shape[1] // 2
        mean, logvar = moments[:, :lc], moments[:, lc:]
        r2 = np.random.default_rng(6)
        z = mean + np.exp(0.5 * np.clip(logvar, -30, 20)) * \
            r2.standard_normal(mean.shape).astype(np.float32)
        lat0 = ((z - iface.vae_shift) * iface.vae_scaling).astype(np.float32)
        dec = np.asarray(iface._run(iface.vae, {"latents": lat0})["image"])
        ref = (np.clip((dec[0].transpose(1, 2, 0) + 1) / 2, 0, 1)
               * 255).round().astype(np.uint8)
        np.testing.assert_allclose(a.pixels.astype(np.int32),
                                   ref.astype(np.int32), atol=1)

    def test_inpaint_compiled_matches_loop(self, tiny_unet):
        from whisper_tensor_tpu.interfaces.image_gen import ImageGenConfig

        iface = self._setup(tiny_unet)
        rng = np.random.default_rng(2)
        init = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
        mask = np.zeros((128, 128), np.float32)
        mask[32:96, 32:96] = 1.0
        cfgd = ImageGenConfig(steps=2, height=128, width=128, seed=5)
        fast = iface.run_inpaint("x", init, mask, cfg=cfgd)
        slow_if = self._setup(tiny_unet)
        slow_if.force_loop = True
        slow = slow_if.run_inpaint("x", init, mask, cfg=cfgd)
        np.testing.assert_allclose(fast.pixels.astype(np.int32),
                                   slow.pixels.astype(np.int32), atol=1)


class TestKarras:
    def test_karras_schedule_properties(self):
        from whisper_tensor_tpu.interfaces.image_gen import (
            euler_discrete_schedule, euler_karras_schedule)

        base = euler_discrete_schedule(12)
        k = euler_karras_schedule(12)
        s, t = k["sigmas"], k["timesteps"]
        assert s.shape == base["sigmas"].shape
        assert t.shape == base["timesteps"].shape
        assert s[-1] == 0.0
        # endpoints preserved; strictly decreasing
        np.testing.assert_allclose(s[0], base["sigmas"][0], rtol=1e-5)
        np.testing.assert_allclose(s[-2], base["sigmas"][-2], rtol=1e-5)
        assert (np.diff(s[:-1]) < 0).all()
        assert (np.diff(t) < 0).all()
        assert 0 <= t[-1] and t[0] <= 999
        # rho-spacing is denser near sigma_min than the linear-t grid
        assert s[6] < base["sigmas"][6]

    def test_pipeline_euler_karras_compiled_matches_loop(self, tiny_unet):
        from whisper_tensor_tpu.interfaces.image_gen import (
            ImageGenConfig, ImageGenerationInterface)

        import torch
        from transformers import CLIPTextConfig as HFCfg
        from transformers import CLIPTextModel

        from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
            ClipTextConfig, build_clip_text)
        from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
            random_unet_weights
        from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
            VAEConfig, build_vae_decoder)

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
            seq_len=8), name="te")
        vae = Model.new_from_onnx(build_vae_decoder(
            random_unet_weights(1),
            VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                      norm_groups=4), latent_hw=(16, 16)), name="vae")

        def make():
            return ImageGenerationInterface(te, tiny_unet, vae,
                                            tokenizer=None, bos_token_id=1,
                                            uncond_token_id=2, seq_len=8)

        cfgd = ImageGenConfig(steps=3, height=128, width=128, seed=1,
                              schedule="euler_karras")
        ref = make()
        ref.force_loop = True
        img_loop = ref.run("a tpu", cfg=cfgd)
        img_fast = make().run("a tpu", cfg=cfgd)
        np.testing.assert_allclose(img_fast.pixels.astype(np.int32),
                                   img_loop.pixels.astype(np.int32), atol=1)
        # a different spacing must produce a different image
        plain = make().run("a tpu", cfg=ImageGenConfig(
            steps=3, height=128, width=128, seed=1))
        assert not np.array_equal(img_fast.pixels, plain.pixels)
