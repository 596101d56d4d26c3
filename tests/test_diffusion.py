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
