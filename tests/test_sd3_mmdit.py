"""SD3 MMDiT recipe vs an independently-written torch referee.

diffusers isn't in the image, so the referee is a from-scratch torch
implementation of the SD3 joint-transformer semantics (AdaLN-Zero chunk
order, QK RMS norm, [latent;context] joint attention, gated residuals,
context_pre_only final block, SD3.5 dual attention, unpatchify) driven
by the SAME weight dict the recipe consumes."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from whisper_tensor_tpu.importers.recipes.diffusion.mmdit import (
    SD3Config, build_sd3_mmdit, random_sd3_weights)
from whisper_tensor_tpu.model import Model

CFG = SD3Config(num_layers=3, num_heads=2, head_dim=8, in_channels=4,
                out_channels=4, patch_size=2, sample_size=8,
                pos_embed_max_size=12, joint_attention_dim=24,
                pooled_projection_dim=20, dual_attention_layers=(1,),
                time_embed_dim=8)


def _torch_ref(w, cfg: SD3Config, x, tstep, ehs, pooled):
    D, H, Dh, P = cfg.hidden, cfg.num_heads, cfg.head_dim, cfg.patch_size
    B, C, h_, w_ = x.shape
    ph, pw = h_ // P, w_ // P
    S = ph * pw

    t = lambda n: torch.from_numpy(np.asarray(w(n), dtype=np.float32))

    def lin(xx, name):
        return xx @ t(name + ".weight").T + t(name + ".bias")

    def ln(xx):
        return F.layer_norm(xx, (D,), eps=1e-6)

    def rms(xx, name):
        v = xx / torch.sqrt(xx.pow(2).mean(-1, keepdim=True) + 1e-6)
        return v * t(name + ".weight")

    def ff(xx, p):
        return lin(F.gelu(lin(xx, p + ".net.0.proj"), approximate="tanh"),
                   p + ".net.2")

    x = torch.from_numpy(x)
    hseq = F.conv2d(x, t("pos_embed.proj.weight"), t("pos_embed.proj.bias"),
                    stride=P).reshape(B, D, S).transpose(1, 2)
    pos = t("pos_embed.pos_embed").reshape(cfg.pos_embed_max_size,
                                           cfg.pos_embed_max_size, D)
    top = (cfg.pos_embed_max_size - ph) // 2
    left = (cfg.pos_embed_max_size - pw) // 2
    hseq = hseq + pos[top:top + ph, left:left + pw].reshape(1, S, D)

    half = cfg.time_embed_dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    ang = torch.from_numpy(tstep)[:, None] * torch.from_numpy(
        freqs.astype(np.float32))
    temb = torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)
    temb = lin(F.silu(lin(temb, "time_text_embed.timestep_embedder.linear_1")),
               "time_text_embed.timestep_embedder.linear_2")
    ptxt = lin(F.silu(lin(torch.from_numpy(pooled),
                          "time_text_embed.text_embedder.linear_1")),
               "time_text_embed.text_embedder.linear_2")
    temb = temb + ptxt
    stemb = F.silu(temb)

    ctx = lin(torch.from_numpy(ehs), "context_embedder")
    Lc = ctx.shape[1]

    def heads(v, S_):
        return v.reshape(B, S_, H, Dh).transpose(1, 2)

    def unheads(v, S_):
        return v.transpose(1, 2).reshape(B, S_, D)

    def attn(q, k, v):
        s = (q.float() @ k.float().transpose(-1, -2)) / np.sqrt(Dh)
        return torch.softmax(s, -1) @ v.float()

    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}."
        pre_only = i == cfg.num_layers - 1
        dual = i in cfg.dual_attention_layers
        n = 9 if dual else 6
        chunks = lin(stemb, p + "norm1.linear").chunk(n, dim=-1)
        chunks = [c[:, None] for c in chunks]
        sh_msa, sc_msa, g_msa = chunks[:3]
        if dual:
            sh2, sc2, g2 = chunks[3:6]
            sh_mlp, sc_mlp, g_mlp = chunks[6:]
        else:
            sh_mlp, sc_mlp, g_mlp = chunks[3:]

        if pre_only:
            cm = lin(stemb, p + "norm1_context.linear").chunk(2, dim=-1)
            ctx_mod = ln(ctx) * (1 + cm[0][:, None]) + cm[1][:, None]
        else:
            cc = [c[:, None] for c in
                  lin(stemb, p + "norm1_context.linear").chunk(6, dim=-1)]
            ctx_mod = ln(ctx) * (1 + cc[1]) + cc[0]

        hmod = ln(hseq) * (1 + sc_msa) + sh_msa
        q = rms(heads(lin(hmod, p + "attn.to_q"), S), p + "attn.norm_q")
        k = rms(heads(lin(hmod, p + "attn.to_k"), S), p + "attn.norm_k")
        v = heads(lin(hmod, p + "attn.to_v"), S)
        cq = rms(heads(lin(ctx_mod, p + "attn.add_q_proj"), Lc),
                 p + "attn.norm_added_q")
        ck = rms(heads(lin(ctx_mod, p + "attn.add_k_proj"), Lc),
                 p + "attn.norm_added_k")
        cv = heads(lin(ctx_mod, p + "attn.add_v_proj"), Lc)
        a = attn(torch.cat([q, cq], 2), torch.cat([k, ck], 2),
                 torch.cat([v, cv], 2))
        a = unheads(a, S + Lc)
        hseq = hseq + g_msa * lin(a[:, :S], p + "attn.to_out.0")

        if dual:
            hmod2 = ln(hseq) * (1 + sc2) + sh2
            q2 = rms(heads(lin(hmod2, p + "attn2.to_q"), S), p + "attn2.norm_q")
            k2 = rms(heads(lin(hmod2, p + "attn2.to_k"), S), p + "attn2.norm_k")
            v2 = heads(lin(hmod2, p + "attn2.to_v"), S)
            hseq = hseq + g2 * lin(unheads(attn(q2, k2, v2), S),
                                   p + "attn2.to_out.0")

        hseq = hseq + g_mlp * ff(ln(hseq) * (1 + sc_mlp) + sh_mlp, p + "ff")
        if not pre_only:
            ctx = ctx + cc[2] * lin(a[:, S:], p + "attn.to_add_out")
            ctx = ctx + cc[5] * ff(ln(ctx) * (1 + cc[4]) + cc[3],
                                   p + "ff_context")

    fm = lin(stemb, "norm_out.linear").chunk(2, dim=-1)
    hseq = ln(hseq) * (1 + fm[0][:, None]) + fm[1][:, None]
    out = lin(hseq, "proj_out")
    out = out.reshape(B, ph, pw, P, P, cfg.out_channels)
    out = out.permute(0, 5, 1, 3, 2, 4).reshape(B, cfg.out_channels, h_, w_)
    return out.numpy()


@pytest.fixture(scope="module")
def model_and_weights():
    w = random_sd3_weights(0)(CFG)
    data = build_sd3_mmdit(w, CFG, batch=2, context_len=6, latent_hw=(8, 8))
    return Model.new_from_onnx(data, name="tiny-sd3"), w


def _feeds():
    rng = np.random.default_rng(0)
    return {"hidden_states": rng.standard_normal((2, 4, 8, 8)).astype(np.float32),
            "timestep": np.asarray([100.0, 500.0], np.float32),
            "encoder_hidden_states":
                rng.standard_normal((2, 6, 24)).astype(np.float32),
            "pooled_projections":
                rng.standard_normal((2, 20)).astype(np.float32)}


def test_matches_torch_referee(model_and_weights):
    m, w = model_and_weights
    feeds = _feeds()
    ref = _torch_ref(w, CFG, feeds["hidden_states"], feeds["timestep"],
                     feeds["encoder_hidden_states"],
                     feeds["pooled_projections"])
    out = m.eval(feeds)["out"]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_oracle_vs_xla(model_and_weights):
    m, _ = model_and_weights
    feeds = _feeds()
    ref = m.eval(feeds)["out"]
    out = m.eval(feeds, mode="xla")["out"]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_conditioning_sensitivity(model_and_weights):
    m, _ = model_and_weights
    feeds = _feeds()
    base = m.eval(feeds)["out"]
    for key, delta in [("timestep", np.asarray([900.0, 1.0], np.float32)),
                       ("pooled_projections",
                        feeds["pooled_projections"] + 1.0),
                       ("encoder_hidden_states",
                        feeds["encoder_hidden_states"] + 1.0)]:
        out = m.eval({**feeds, key: delta})["out"]
        assert np.abs(out - base).max() > 1e-4, key


def test_sd3_pipeline_smoke():
    """CLIP-L + CLIP-G -> padded joint conditioning + pooled concat ->
    MMDiT rectified-flow loop -> VAE. End to end on the oracle."""
    import torch
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModelWithProjection

    from whisper_tensor_tpu.backends.eval_backend import EvalBackend
    from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
        ClipTextConfig, build_clip_text)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
        random_unet_weights
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)
    from whisper_tensor_tpu.interfaces.image_gen import (
        ImageGenConfig, SD3ImageGenerationInterface)

    def tiny_te(hidden, proj, seed):
        torch.manual_seed(seed)
        hf = CLIPTextModelWithProjection(HFCfg(
            hidden_size=hidden, intermediate_size=2 * hidden,
            num_hidden_layers=2, num_attention_heads=2, vocab_size=100,
            max_position_embeddings=8, projection_dim=proj,
            hidden_act="gelu"))
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        c = ClipTextConfig(num_hidden_layers=2, hidden_size=hidden,
                           num_attention_heads=2, intermediate_size=2 * hidden,
                           vocab_size=100, max_position_embeddings=8,
                           hidden_act="gelu", projection_dim=proj)
        return Model.new_from_onnx(build_clip_text(lambda n: sd[n], c,
                                                   seq_len=8))

    clip_l = tiny_te(12, 12, 0)
    clip_g = tiny_te(16, 16, 1)
    joint = 32            # 12 + 16 padded to 32
    pooled = 12 + 16
    mcfg = SD3Config(num_layers=2, num_heads=2, head_dim=8, in_channels=4,
                     out_channels=4, patch_size=2, sample_size=16,
                     pos_embed_max_size=16, joint_attention_dim=joint,
                     pooled_projection_dim=pooled, time_embed_dim=8)
    mm = Model.new_from_onnx(build_sd3_mmdit(
        random_sd3_weights(1)(mcfg), mcfg, batch=2, context_len=8,
        latent_hw=(16, 16)))
    vae = Model.new_from_onnx(build_vae_decoder(
        random_unet_weights(1),
        VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                  norm_groups=4), latent_hw=(16, 16)))
    iface = SD3ImageGenerationInterface(
        clip_l, clip_g, mm, vae, tokenizer=None, joint_dim=joint,
        latent_channels=4, bos_token_id=1, uncond_token_id=2, seq_len=8)
    iface._backends = {m.id: EvalBackend("oracle")
                       for m in (clip_l, clip_g, mm, vae)}
    img = iface.run("a tpu", cfg=ImageGenConfig(
        steps=2, height=128, width=128, schedule="rectified_flow", seed=3))
    assert img.pixels.shape == (128, 128, 3)
    assert img.pixels.dtype == np.uint8


def test_sd3_compiled_denoise_matches_loop():
    """The fused-scan denoise program (SD3 feed names, per-batch
    timestep) must match the per-step python loop on XLA kernels."""
    import torch
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModelWithProjection

    from whisper_tensor_tpu.importers.recipes.diffusion.clip import (
        ClipTextConfig, build_clip_text)
    from whisper_tensor_tpu.importers.recipes.diffusion.unet import \
        random_unet_weights
    from whisper_tensor_tpu.importers.recipes.diffusion.vae import (
        VAEConfig, build_vae_decoder)
    from whisper_tensor_tpu.interfaces.image_gen import (
        ImageGenConfig, SD3ImageGenerationInterface)

    def tiny_te(hidden, proj, seed):
        torch.manual_seed(seed)
        hf = CLIPTextModelWithProjection(HFCfg(
            hidden_size=hidden, intermediate_size=2 * hidden,
            num_hidden_layers=2, num_attention_heads=2, vocab_size=100,
            max_position_embeddings=8, projection_dim=proj,
            hidden_act="gelu"))
        sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
        c = ClipTextConfig(num_hidden_layers=2, hidden_size=hidden,
                           num_attention_heads=2, intermediate_size=2 * hidden,
                           vocab_size=100, max_position_embeddings=8,
                           hidden_act="gelu", projection_dim=proj)
        return Model.new_from_onnx(build_clip_text(lambda n: sd[n], c,
                                                   seq_len=8))

    clip_l, clip_g = tiny_te(12, 12, 0), tiny_te(16, 16, 1)
    mcfg = SD3Config(num_layers=2, num_heads=2, head_dim=8, in_channels=4,
                     out_channels=4, patch_size=2, sample_size=16,
                     pos_embed_max_size=16, joint_attention_dim=32,
                     pooled_projection_dim=28, time_embed_dim=8)
    mm = Model.new_from_onnx(build_sd3_mmdit(
        random_sd3_weights(1)(mcfg), mcfg, batch=2, context_len=8,
        latent_hw=(16, 16)))
    vae = Model.new_from_onnx(build_vae_decoder(
        random_unet_weights(1),
        VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                  norm_groups=4), latent_hw=(16, 16)))

    def make():
        return SD3ImageGenerationInterface(
            clip_l, clip_g, mm, vae, tokenizer=None, joint_dim=32,
            latent_channels=4, bos_token_id=1, uncond_token_id=2, seq_len=8)

    cfgd = ImageGenConfig(steps=2, height=128, width=128,
                          schedule="rectified_flow", seed=3)
    ref = make()
    ref.force_loop = True
    img_loop = ref.run("a tpu", cfg=cfgd)
    img_fast = make().run("a tpu", cfg=cfgd)
    np.testing.assert_allclose(img_fast.pixels.astype(np.int32),
                               img_loop.pixels.astype(np.int32), atol=1)
