"""Flux transformer recipe vs an independently-written torch referee
(3-axis interleaved rope with text-first joint order, double-stream and
fused single-stream blocks, guidance embedding, 2x2 latent packing)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from whisper_tensor_tpu.importers.recipes.diffusion.flux import (
    FluxConfig, build_flux, flux_rope_tables, random_flux_weights)
from whisper_tensor_tpu.model import Model

CFG = FluxConfig(num_layers=2, num_single_layers=3, num_heads=2, head_dim=8,
                 in_channels=16, joint_attention_dim=24,
                 pooled_projection_dim=20, guidance_embeds=True,
                 axes_dims_rope=(2, 4, 2), time_embed_dim=8)


def _rope_apply(x, cos, sin):
    """Interleaved (GPT-J) rotation; cos/sin (S, D/2)."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c, s = cos[None, None], sin[None, None]
    out = torch.empty_like(x)
    out[..., 0::2] = x1 * c - x2 * s
    out[..., 1::2] = x2 * c + x1 * s
    return out


def _torch_ref(w, cfg: FluxConfig, x, tstep, pooled, ehs, guidance, Lc):
    D, H, Dh = cfg.hidden, cfg.num_heads, cfg.head_dim
    B, C, h_, w_ = x.shape
    gh, gw = h_ // 2, w_ // 2
    S = gh * gw

    t = lambda n: torch.from_numpy(np.asarray(w(n), dtype=np.float32))

    def lin(xx, name):
        return xx @ t(name + ".weight").T + t(name + ".bias")

    def ln(xx):
        return F.layer_norm(xx, (D,), eps=1e-6)

    def rms(xx, name):
        v = xx / torch.sqrt(xx.pow(2).mean(-1, keepdim=True) + 1e-6)
        return v * t(name + ".weight")

    def emb_mlp(xx, p):
        return lin(F.silu(lin(xx, p + ".linear_1")), p + ".linear_2")

    def sinusoid(v):
        half = cfg.time_embed_dim // 2
        freqs = torch.from_numpy(np.exp(
            -np.log(10000.0) * np.arange(half) / half).astype(np.float32))
        ang = v[:, None] * freqs[None]
        return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)

    x = torch.from_numpy(x)
    xp = x.reshape(B, C, gh, 2, gw, 2).permute(0, 2, 4, 1, 3, 5)
    xp = xp.reshape(B, S, C * 4)
    hseq = lin(xp, "x_embedder")

    temb = emb_mlp(sinusoid(torch.from_numpy(tstep) * 1000),
                   "time_text_embed.timestep_embedder")
    temb = temb + emb_mlp(sinusoid(torch.from_numpy(guidance) * 1000),
                          "time_text_embed.guidance_embedder")
    temb = temb + emb_mlp(torch.from_numpy(pooled),
                          "time_text_embed.text_embedder")
    stemb = F.silu(temb)
    ctx = lin(torch.from_numpy(ehs), "context_embedder")

    cos_np, sin_np = flux_rope_tables(cfg, Lc, (gh, gw))
    cos, sin = torch.from_numpy(cos_np), torch.from_numpy(sin_np)

    def heads(v, S_):
        return v.reshape(B, S_, H, Dh).transpose(1, 2)

    def unheads(v, S_):
        return v.transpose(1, 2).reshape(B, S_, D)

    def attn(q, k, v):
        s = (q.float() @ k.float().transpose(-1, -2)) / np.sqrt(Dh)
        return torch.softmax(s, -1) @ v.float()

    def mod_chunks(prefix, n):
        return [c[:, None] for c in lin(stemb, prefix).chunk(n, dim=-1)]

    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}."
        sh, sc, g, sh_m, sc_m, g_m = mod_chunks(p + "norm1.linear", 6)
        csh, csc, cg, csh_m, csc_m, cg_m = mod_chunks(
            p + "norm1_context.linear", 6)
        hmod = ln(hseq) * (1 + sc) + sh
        cmod = ln(ctx) * (1 + csc) + csh
        q = rms(heads(lin(hmod, p + "attn.to_q"), S), p + "attn.norm_q")
        k = rms(heads(lin(hmod, p + "attn.to_k"), S), p + "attn.norm_k")
        v = heads(lin(hmod, p + "attn.to_v"), S)
        cq = rms(heads(lin(cmod, p + "attn.add_q_proj"), Lc),
                 p + "attn.norm_added_q")
        ck = rms(heads(lin(cmod, p + "attn.add_k_proj"), Lc),
                 p + "attn.norm_added_k")
        cv = heads(lin(cmod, p + "attn.add_v_proj"), Lc)
        jq = _rope_apply(torch.cat([cq, q], 2), cos, sin)
        jk = _rope_apply(torch.cat([ck, k], 2), cos, sin)
        a = unheads(attn(jq, jk, torch.cat([cv, v], 2)), Lc + S)
        hseq = hseq + g * lin(a[:, Lc:], p + "attn.to_out.0")
        hseq = hseq + g_m * lin(F.gelu(lin(ln(hseq) * (1 + sc_m) + sh_m,
                                           p + "ff.net.0.proj"),
                                       approximate="tanh"), p + "ff.net.2")
        ctx = ctx + cg * lin(a[:, :Lc], p + "attn.to_add_out")
        ctx = ctx + cg_m * lin(F.gelu(lin(ln(ctx) * (1 + csc_m) + csh_m,
                                          p + "ff_context.net.0.proj"),
                                      approximate="tanh"),
                               p + "ff_context.net.2")

    hcat = torch.cat([ctx, hseq], dim=1)
    Sall = Lc + S
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}."
        sh, sc, g = mod_chunks(p + "norm.linear", 3)
        mod = ln(hcat) * (1 + sc) + sh
        q = _rope_apply(rms(heads(lin(mod, p + "attn.to_q"), Sall),
                            p + "attn.norm_q"), cos, sin)
        k = _rope_apply(rms(heads(lin(mod, p + "attn.to_k"), Sall),
                            p + "attn.norm_k"), cos, sin)
        v = heads(lin(mod, p + "attn.to_v"), Sall)
        a = unheads(attn(q, k, v), Sall)
        mlp = F.gelu(lin(mod, p + "proj_mlp"), approximate="tanh")
        hcat = hcat + g * lin(torch.cat([a, mlp], -1), p + "proj_out")

    img = hcat[:, Lc:]
    fsc, fsh = lin(stemb, "norm_out.linear").chunk(2, dim=-1)
    img = ln(img) * (1 + fsc[:, None]) + fsh[:, None]
    out = lin(img, "proj_out")
    out = out.reshape(B, gh, gw, C, 2, 2).permute(0, 3, 1, 4, 2, 5)
    return out.reshape(B, C, h_, w_).numpy()


@pytest.fixture(scope="module")
def model_and_weights():
    w = random_flux_weights(0)(CFG)
    data = build_flux(w, CFG, batch=2, context_len=5, latent_hw=(8, 8))
    return Model.new_from_onnx(data, name="tiny-flux"), w


def _feeds():
    rng = np.random.default_rng(0)
    return {"hidden_states": rng.standard_normal((2, 4, 8, 8)).astype(np.float32),
            "timestep": np.asarray([0.5, 0.9], np.float32),
            "pooled_projections": rng.standard_normal((2, 20)).astype(np.float32),
            "encoder_hidden_states":
                rng.standard_normal((2, 5, 24)).astype(np.float32),
            "guidance": np.asarray([3.5, 3.5], np.float32)}


def test_matches_torch_referee(model_and_weights):
    m, w = model_and_weights
    feeds = _feeds()
    ref = _torch_ref(w, CFG, feeds["hidden_states"], feeds["timestep"],
                     feeds["pooled_projections"],
                     feeds["encoder_hidden_states"], feeds["guidance"], Lc=5)
    out = m.eval(feeds)["out"]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_oracle_vs_xla(model_and_weights):
    m, _ = model_and_weights
    feeds = _feeds()
    ref = m.eval(feeds)["out"]
    out = m.eval(feeds, mode="xla")["out"]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_schnell_no_guidance():
    cfg = FluxConfig(num_layers=1, num_single_layers=1, num_heads=2,
                     head_dim=8, in_channels=16, joint_attention_dim=24,
                     pooled_projection_dim=20, guidance_embeds=False,
                     axes_dims_rope=(2, 4, 2), time_embed_dim=8)
    w = random_flux_weights(1)(cfg)
    m = Model.new_from_onnx(build_flux(w, cfg, batch=1, context_len=4,
                                       latent_hw=(8, 8)))
    assert "guidance" not in {m.graph.tensors[t].name
                              for t in m.graph.inputs}
    rng = np.random.default_rng(1)
    out = m.eval({
        "hidden_states": rng.standard_normal((1, 4, 8, 8)).astype(np.float32),
        "timestep": np.asarray([0.3], np.float32),
        "pooled_projections": rng.standard_normal((1, 20)).astype(np.float32),
        "encoder_hidden_states":
            rng.standard_normal((1, 4, 24)).astype(np.float32)})["out"]
    assert out.shape == (1, 4, 8, 8) and np.isfinite(out).all()


def test_rope_position_sensitivity(model_and_weights):
    """Swapping two image rows must change the output non-trivially (rope
    encodes the grid), while text tokens at pos 0 rotate identically."""
    m, _ = model_and_weights
    feeds = _feeds()
    base = m.eval(feeds)["out"]
    hs = feeds["hidden_states"].copy()
    hs[:, :, 0:2], hs[:, :, 2:4] = (feeds["hidden_states"][:, :, 2:4].copy(),
                                    feeds["hidden_states"][:, :, 0:2].copy())
    swapped = m.eval({**feeds, "hidden_states": hs})["out"]
    # if rope were absent the swap would just permute outputs; with rope
    # the swapped result must NOT equal the permuted base
    perm = base.copy()
    perm[:, :, 0:2], perm[:, :, 2:4] = base[:, :, 2:4].copy(), base[:, :, 0:2].copy()
    assert np.abs(swapped - perm).max() > 1e-4


def test_flux_pipeline_smoke():
    """CLIP-L pooled + T5 context -> flux transformer (guidance input) ->
    rectified-flow loop -> VAE, on the oracle."""
    import torch
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel
    from transformers import T5Config as HFT5
    from transformers import T5Model

    from whisper_tensor_tpu.backends.eval_backend import EvalBackend
    from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
        ClipTextConfig, build_clip_text)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
        random_unet_weights
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)
    from whisper_tensor_tpu.importers.recipes.llm.t5 import (T5Config,
                                                             build_t5_encoder)
    from whisper_tensor_tpu.interfaces.image_gen import (
        FluxImageGenerationInterface, ImageGenConfig)

    torch.manual_seed(0)
    hf = CLIPTextModel(HFCfg(hidden_size=12, intermediate_size=24,
                             num_hidden_layers=1, num_attention_heads=2,
                             vocab_size=100, max_position_embeddings=8))
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    clip = Model.new_from_onnx(build_clip_text(
        lambda n: sd[n],
        ClipTextConfig(num_hidden_layers=1, hidden_size=12,
                       num_attention_heads=2, intermediate_size=24,
                       vocab_size=100, max_position_embeddings=8),
        seq_len=8))
    t5_hf = T5Model(HFT5(vocab_size=64, d_model=16, d_kv=8,
                         d_ff=32, num_layers=1, num_heads=2))
    t5_sd = {k: v.float().numpy() for k, v in t5_hf.state_dict().items()}
    t5 = Model.new_from_onnx(build_t5_encoder(
        lambda n: t5_sd[n],
        T5Config(vocab_size=64, d_model=16, d_kv=8, d_ff=32,
                 num_layers=1, num_heads=2), seq_len=6, with_cross=False))

    fcfg = FluxConfig(num_layers=1, num_single_layers=2, num_heads=2,
                      head_dim=8, in_channels=16, joint_attention_dim=16,
                      pooled_projection_dim=12, guidance_embeds=True,
                      axes_dims_rope=(2, 4, 2), time_embed_dim=8)
    fx = Model.new_from_onnx(build_flux(random_flux_weights(2)(fcfg), fcfg,
                                        batch=1, context_len=6,
                                        latent_hw=(16, 16)))
    vae = Model.new_from_onnx(build_vae_decoder(
        random_unet_weights(1),
        VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                  norm_groups=4), latent_hw=(16, 16)))

    class Tok:
        def encode(self, text):
            return [3 + (ord(c) % 7) for c in text][:6]

    iface = FluxImageGenerationInterface(
        clip, t5, fx, vae, tokenizer=Tok(), t5_seq_len=6,
        latent_channels=4, bos_token_id=1, uncond_token_id=2, seq_len=8)
    iface._backends = {m.id: EvalBackend("oracle")
                       for m in (clip, t5, fx, vae)}
    img = iface.run("a tpu", cfg=ImageGenConfig(
        steps=2, height=128, width=128, schedule="rectified_flow",
        guidance_scale=3.5, seed=4))
    assert img.pixels.shape == (128, 128, 3)
    assert img.pixels.dtype == np.uint8


def test_flux_compiled_denoise_matches_loop():
    """The flux fused-scan denoise program (no CFG pair, guidance as a
    model input) must match the per-step python loop on XLA kernels."""
    import torch
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel
    from transformers import T5Config as HFT5
    from transformers import T5Model

    from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
        ClipTextConfig, build_clip_text)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
        random_unet_weights
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)
    from whisper_tensor_tpu.importers.recipes.llm.t5 import (T5Config,
                                                             build_t5_encoder)
    from whisper_tensor_tpu.interfaces.image_gen import (
        FluxImageGenerationInterface, ImageGenConfig)

    torch.manual_seed(0)
    hf = CLIPTextModel(HFCfg(hidden_size=12, intermediate_size=24,
                             num_hidden_layers=1, num_attention_heads=2,
                             vocab_size=100, max_position_embeddings=8))
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    clip = Model.new_from_onnx(build_clip_text(
        lambda n: sd[n],
        ClipTextConfig(num_hidden_layers=1, hidden_size=12,
                       num_attention_heads=2, intermediate_size=24,
                       vocab_size=100, max_position_embeddings=8),
        seq_len=8))
    t5_hf = T5Model(HFT5(vocab_size=64, d_model=16, d_kv=8,
                         d_ff=32, num_layers=1, num_heads=2))
    t5_sd = {k: v.float().numpy() for k, v in t5_hf.state_dict().items()}
    t5 = Model.new_from_onnx(build_t5_encoder(
        lambda n: t5_sd[n],
        T5Config(vocab_size=64, d_model=16, d_kv=8, d_ff=32,
                 num_layers=1, num_heads=2), seq_len=6, with_cross=False))
    fcfg = FluxConfig(num_layers=1, num_single_layers=2, num_heads=2,
                      head_dim=8, in_channels=16, joint_attention_dim=16,
                      pooled_projection_dim=12, guidance_embeds=True,
                      axes_dims_rope=(2, 4, 2), time_embed_dim=8)
    fx = Model.new_from_onnx(build_flux(random_flux_weights(2)(fcfg), fcfg,
                                        batch=1, context_len=6,
                                        latent_hw=(16, 16)))
    vae = Model.new_from_onnx(build_vae_decoder(
        random_unet_weights(1),
        VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                  norm_groups=4), latent_hw=(16, 16)))

    class Tok:
        def encode(self, text):
            return [3 + (ord(c) % 7) for c in text][:6]

    def make():
        return FluxImageGenerationInterface(
            clip, t5, fx, vae, tokenizer=Tok(), t5_seq_len=6,
            latent_channels=4, bos_token_id=1, uncond_token_id=2, seq_len=8)

    cfgd = ImageGenConfig(steps=2, height=128, width=128,
                          schedule="rectified_flow", guidance_scale=3.5,
                          seed=4)
    ref = make()
    ref.force_loop = True
    img_loop = ref.run("a tpu", cfg=cfgd)
    img_fast = make().run("a tpu", cfg=cfgd)
    np.testing.assert_allclose(img_fast.pixels.astype(np.int32),
                               img_loop.pixels.astype(np.int32), atol=1)
