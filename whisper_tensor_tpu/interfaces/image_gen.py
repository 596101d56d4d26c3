"""Image generation interface: CFG + scheduler + denoise loop + VAE.

Reference equivalent: ImageGenerationInterface (src/interfaces.rs:327-
2780): single/dual text-encoder CFG, Euler-discrete and rectified-flow
schedules, the denoise loop as a SuperGraph Scan, and run(). TPU
redesign: the denoise step (UNet + CFG + scheduler update) compiles to
one jitted program; the loop is a host loop over it (step count is tiny
— 20..50 — so per-step dispatch cost is irrelevant; the UNet dominates).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

from ..dtype import DType
from ..model import Model
from ..super_graph.links import Image


# ---------------------------------------------------------------------------
# schedules (reference compute_euler_schedule :1941, compute_flux_schedule :2002)
# ---------------------------------------------------------------------------


def euler_discrete_schedule(n_steps: int, num_train_timesteps: int = 1000,
                            beta_start: float = 0.00085,
                            beta_end: float = 0.012) -> Dict[str, np.ndarray]:
    """Euler-discrete (SD1.5/SD2 'scaled_linear' betas): returns sigmas
    (n+1,) and timesteps (n,)."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    alphas_cum = np.cumprod(1.0 - betas)
    all_sigmas = np.sqrt((1 - alphas_cum) / alphas_cum)
    timesteps = np.linspace(num_train_timesteps - 1, 0, n_steps, dtype=np.float64)
    sigmas = np.interp(timesteps, np.arange(num_train_timesteps), all_sigmas)
    sigmas = np.concatenate([sigmas, [0.0]])
    return {"sigmas": sigmas.astype(np.float32),
            "timesteps": timesteps.astype(np.float32)}


def karras_sigmas(sigmas: np.ndarray, rho: float = 7.0) -> np.ndarray:
    """Re-space an euler sigma schedule with the Karras et al. (2022)
    rho-spacing (denser near sigma_min — better quality at low step
    counts). Keeps the endpoints and the trailing 0."""
    s = sigmas[:-1]
    smin, smax = float(s[-1]), float(s[0])
    t = np.linspace(0, 1, len(s), dtype=np.float64)
    out = (smax ** (1 / rho) + t * (smin ** (1 / rho)
                                    - smax ** (1 / rho))) ** rho
    return np.concatenate([out, [0.0]]).astype(np.float32)


def euler_karras_schedule(n_steps: int, num_train_timesteps: int = 1000,
                          beta_start: float = 0.00085,
                          beta_end: float = 0.012,
                          rho: float = 7.0) -> Dict[str, np.ndarray]:
    """Euler-discrete with Karras rho-spaced sigmas; timesteps are the
    (fractional) training timesteps matching each sigma."""
    base = euler_discrete_schedule(n_steps, num_train_timesteps,
                                   beta_start, beta_end)
    sigmas = karras_sigmas(base["sigmas"], rho=rho)
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    alphas_cum = np.cumprod(1.0 - betas)
    all_sigmas = np.sqrt((1 - alphas_cum) / alphas_cum)
    # diffusers' _sigma_to_t interpolates in LOG-sigma space; linear-in-
    # sigma interpolation diverges most at mid-schedule (ADVICE r2).
    timesteps = np.interp(np.log(sigmas[:-1]), np.log(all_sigmas),
                          np.arange(num_train_timesteps))
    return {"sigmas": sigmas, "timesteps": timesteps.astype(np.float32)}


def make_schedule(schedule: str, n_steps: int) -> Dict[str, np.ndarray]:
    if schedule == "euler":
        return euler_discrete_schedule(n_steps)
    if schedule == "euler_karras":
        return euler_karras_schedule(n_steps)
    if schedule == "rectified_flow":
        return rectified_flow_schedule(n_steps)
    raise ValueError(f"unknown schedule {schedule!r}")


def rectified_flow_schedule(n_steps: int, shift: float = 3.0,
                            num_train_timesteps: int = 1000) -> Dict[str, np.ndarray]:
    """Rectified-flow sigmas (SD3/Flux), with timestep shift."""
    sigmas = np.linspace(1.0, 1.0 / n_steps, n_steps, dtype=np.float64)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    timesteps = sigmas * num_train_timesteps
    sigmas = np.concatenate([sigmas, [0.0]])
    return {"sigmas": sigmas.astype(np.float32),
            "timesteps": timesteps.astype(np.float32)}


@dataclass
class ImageGenConfig:
    steps: int = 20
    guidance_scale: float = 7.5
    height: int = 512
    width: int = 512
    schedule: str = "euler"     # euler | euler_karras | rectified_flow
    seed: int = 0


class ImageGenerationInterface:
    """Single-text-encoder CFG pipeline (SD1.5/SD2 family).

    models: text_encoder (input_ids -> last_hidden_state),
            unet (sample, timestep, encoder_hidden_states -> out),
            vae_decoder (latents -> image).
    """

    def __init__(self, text_encoder: Model, unet: Model, vae: Model,
                 tokenizer=None, latent_channels: int = 4,
                 uncond_token_id: int = 49407, bos_token_id: int = 49406,
                 seq_len: int = 77, prediction_type: str = "epsilon",
                 vae_encoder: Optional[Model] = None,
                 vae_scaling: float = 0.18215, vae_shift: float = 0.0):
        """vae_encoder + vae_scaling/vae_shift enable run_img2img (a
        capability the reference's txt2img-only interface lacks)."""
        self.text_encoder = text_encoder
        self.unet = unet
        self.vae = vae
        self.vae_encoder = vae_encoder
        self.vae_scaling = vae_scaling
        self.vae_shift = vae_shift
        self.tokenizer = tokenizer
        self.latent_channels = latent_channels
        self.seq_len = seq_len
        self.bos = bos_token_id
        self.eos = uncond_token_id
        self.prediction_type = prediction_type
        self._unet_fn = None
        self._backends: Dict[int, Any] = {}

    # ------------------------------------------------------------------
    def _run(self, model: Model, feeds, mode="xla"):
        from ..backends.eval_backend import EvalBackend

        be = self._backends.get(model.id)
        if be is None:
            be = EvalBackend(mode)
            self._backends[model.id] = be
        return be.run(model.graph, feeds)

    def _use_compiled_loop(self) -> bool:
        """The fused-scan denoise loop runs via jax directly; oracle-mode
        interfaces (tests, debugging) keep the per-step python loop, and
        `force_loop = True` pins the python loop regardless of backend
        (the referee the compiled program is tested against)."""
        if getattr(self, "force_loop", False):
            return False
        be = self._backends.get(self.unet.id)
        return be is None or getattr(be, "mode", "xla") == "xla"

    def encode_prompt(self, text: str) -> np.ndarray:
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(text)[: self.seq_len - 2]
        else:
            ids = []
        full = [self.bos] + list(ids) + [self.eos] * (self.seq_len - 1 - len(ids))
        return np.asarray(full, dtype=np.int64)[None]

    def _text_embed(self, ids: np.ndarray) -> np.ndarray:
        return np.asarray(self._run(self.text_encoder,
                                    {"input_ids": ids})["last_hidden_state"])

    def _encode_cfg(self, prompt: str, negative_prompt: str,
                    cfg: "ImageGenConfig"):
        """Returns (encoder_hidden_states batch-2, extra unet feeds)."""
        cond = self._text_embed(self.encode_prompt(prompt))
        uncond = self._text_embed(self.encode_prompt(negative_prompt))
        return np.concatenate([uncond, cond], axis=0), {}

    def _unet_feeds(self, sample, t, ctx, extra):
        return {"sample": sample, "timestep": np.asarray(t, dtype=np.float32),
                "encoder_hidden_states": ctx, **extra}

    def _unet_feeds_traced(self, sample, t, ctx, extra):
        import jax.numpy as jnp

        return {"sample": sample, "timestep": t.astype(jnp.float32),
                "encoder_hidden_states": ctx, **extra}

    # -- compiled denoise loop: UNet + CFG + scheduler update for ALL
    # steps fused into ONE jitted lax.scan program (the python loop
    # below stays as the oracle referee; per-step dispatch costs ~55 ms
    # through the TPU tunnel — 30 steps = 1.7 s of pure dispatch)
    def _traced_unet(self):
        from ..backends.xla.compiler import _trace_graph, ensure_x64

        ensure_x64()
        milli, weight_inputs = self.unet.graph.to_milli()
        # UNet attention q/k/v (and cross-attention k/v) share inputs —
        # same exact projection fusion as the LLM decode path
        from ..milli.transforms import fuse_parallel_matmuls

        self._unet_fused = fuse_parallel_matmuls(milli, set(weight_inputs))
        order = list(milli.inputs)
        self._unet_weight_names = [n for n in order if n in weight_inputs
                                   or n in self._unet_fused]
        graph = self.unet.graph
        decl = {}
        for n in order:
            tid = graph.by_name.get(n)
            if tid is not None:
                decl[n] = graph.tensors[tid].info.dtype
        for fname, members in self._unet_fused.items():
            tid = graph.by_name.get(members[0][0])
            if tid is not None:
                decl[fname] = graph.tensors[tid].info.dtype
        out_names = list(milli.outputs)
        fn = _trace_graph(milli, {})

        def step(named, weights):
            import jax.numpy as jnp

            by = dict(named)
            by.update(dict(zip(self._unet_weight_names, weights)))
            args = []
            for n in order:
                a = by[n]
                dt = decl.get(n)
                if dt is not None and hasattr(a, "astype"):
                    a = a.astype(dt.to_jax())  # match declared input dtype
                args.append(a)
            outs = fn(*args)
            return dict(zip(out_names, outs))["out"]

        return step

    def _unet_weights_device(self):
        import jax

        if getattr(self, "_unet_weights_dev", None) is None:
            store = self.unet.graph.store
            fused = getattr(self, "_unet_fused", {})

            def gw(n):
                if n in fused:
                    return np.concatenate(
                        [store.get_numeric(m).numpy()
                         for m, _ in fused[n]], axis=1)
                return store.get_numeric(n).numpy()

            self._unet_weights_dev = [jax.device_put(gw(n))
                                      for n in self._unet_weight_names]
        return self._unet_weights_dev

    def _denoise_program(self, steps, schedule, key_shapes, inpaint=False):
        import jax
        import jax.numpy as jnp

        key = ("denoise", steps, schedule, self.prediction_type, key_shapes,
               inpaint)
        progs = getattr(self, "_programs", None)
        if progs is None:
            self._programs = progs = {}
        if key in progs:
            return progs[key]
        step = self._traced_unet()
        pred_type = self.prediction_type

        def run(latents, ctx, extra_names, extra_vals, sigmas, timesteps,
                gscale, weights, mask=None, lat0=None, noise=None):
            extra = dict(zip(extra_names, extra_vals))

            def body(lat, i):
                sig = sigmas[i]
                t = timesteps[i]
                if schedule != "rectified_flow":
                    scaled = lat / jnp.sqrt(sig * sig + 1.0)
                else:
                    scaled = lat
                sample = jnp.concatenate([scaled, scaled], axis=0)
                out = step(self._unet_feeds_traced(sample, t, ctx, extra),
                           weights).astype(jnp.float32)
                eps_u, eps_c = out[0:1], out[1:2]
                eps = eps_u + gscale * (eps_c - eps_u)
                if schedule != "rectified_flow":
                    if pred_type == "v_prediction":
                        pred_x0 = (eps * (-sig / jnp.sqrt(sig * sig + 1.0))
                                   + lat / (sig * sig + 1.0))
                    else:
                        pred_x0 = lat - sig * eps
                    d = (lat - pred_x0) / sig
                    lat = lat + d * (sigmas[i + 1] - sig)
                else:
                    lat = lat + (sigmas[i + 1] - sig) * eps
                if inpaint:
                    # pin unmasked regions to the init latents re-noised
                    # to the CURRENT noise level (RePaint-style blend)
                    s_next = sigmas[i + 1]
                    if schedule != "rectified_flow":
                        ref = lat0 + noise * s_next
                    else:
                        ref = (1.0 - s_next) * lat0 + s_next * noise
                    lat = mask * lat + (1.0 - mask) * ref
                return lat, None

            latents, _ = jax.lax.scan(body, latents, jnp.arange(steps))
            return latents

        progs[key] = jax.jit(run, static_argnums=(2,))
        return progs[key]

    def _denoise_compiled(self, latents, ctx, extra_feeds, sigmas, timesteps,
                          cfg, inpaint=None) -> np.ndarray:
        import jax.numpy as jnp

        names = tuple(sorted(extra_feeds))
        key_shapes = (latents.shape, ctx.shape,
                      tuple((n, tuple(np.asarray(extra_feeds[n]).shape))
                            for n in names))
        prog = self._denoise_program(cfg.steps, cfg.schedule, key_shapes,
                                     inpaint=inpaint is not None)
        args = [jnp.asarray(latents), jnp.asarray(ctx), names,
                tuple(jnp.asarray(np.asarray(extra_feeds[n]))
                      for n in names),
                jnp.asarray(sigmas), jnp.asarray(timesteps),
                jnp.asarray(cfg.guidance_scale, jnp.float32),
                self._unet_weights_device()]
        if inpaint is not None:
            args.extend(jnp.asarray(np.asarray(a, np.float32))
                        for a in inpaint)
        out = prog(*args)
        return np.asarray(out)

    # ------------------------------------------------------------------
    def run(self, prompt: str, negative_prompt: str = "",
            cfg: Optional[ImageGenConfig] = None,
            observer=None) -> Image:
        cfg = cfg or ImageGenConfig()
        h8, w8 = cfg.height // 8, cfg.width // 8
        ctx, extra_feeds = self._encode_cfg(prompt, negative_prompt, cfg)

        sched = make_schedule(cfg.schedule, cfg.steps)
        sigmas, timesteps = sched["sigmas"], sched["timesteps"]

        rng = np.random.default_rng(cfg.seed)
        latents = rng.standard_normal(
            (1, self.latent_channels, h8, w8)).astype(np.float32)
        if cfg.schedule != "rectified_flow":
            latents = latents * sigmas[0]

        latents = self._denoise(latents, ctx, extra_feeds, sigmas,
                                timesteps, cfg, observer)

        img = np.asarray(self._run(self.vae, {"latents": latents})["image"])
        pixels = np.clip((img[0].transpose(1, 2, 0) + 1) / 2, 0, 1)
        return Image((pixels * 255).round().astype(np.uint8))

    def _denoise(self, latents, ctx, extra_feeds, sigmas, timesteps, cfg,
                 observer, inpaint=None):
        """Run the denoise loop over the GIVEN schedule slice (run()
        passes the full schedule; run_img2img a strength-derived tail).
        inpaint: optional (mask, lat0, noise) — unmasked latent regions
        are pinned each step to lat0 re-noised at the step's level."""
        n_steps = len(timesteps)
        if self._use_compiled_loop():
            eff = ImageGenConfig(**{**cfg.__dict__, "steps": n_steps})
            latents = self._denoise_compiled(latents, ctx, extra_feeds,
                                             sigmas, timesteps, eff,
                                             inpaint=inpaint)
            if observer is not None:
                observer.on_progress(self, 1.0)
        else:
            for i in range(n_steps):
                sig = float(sigmas[i])
                t = float(timesteps[i])
                if cfg.schedule != "rectified_flow":
                    scaled = latents / np.sqrt(sig * sig + 1.0)
                else:
                    scaled = latents
                sample = np.concatenate([scaled, scaled],
                                        axis=0).astype(np.float32)
                out = np.asarray(self._run(self.unet, self._unet_feeds(
                    sample, t, ctx, extra_feeds))["out"])
                eps_u, eps_c = out[0:1], out[1:2]
                eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
                if cfg.schedule != "rectified_flow":
                    if self.prediction_type == "v_prediction":
                        # SD2-768-v: model predicts v;
                        # x0 = -sig/sqrt(sig^2+1)*v + x/(sig^2+1)
                        # (np.sqrt of a python float is a NON-weak f64
                        # scalar — keep the coefficients f32 or the
                        # latents silently promote)
                        c1 = np.float32(-sig / np.sqrt(sig * sig + 1.0))
                        c2 = np.float32(1.0 / (sig * sig + 1.0))
                        pred_x0 = eps * c1 + latents * c2
                    else:
                        # epsilon-prediction euler step
                        pred_x0 = latents - sig * eps
                    d = (latents - pred_x0) / sig
                    latents = latents + d * (float(sigmas[i + 1]) - sig)
                else:
                    # rectified flow: model predicts velocity
                    latents = latents + (float(sigmas[i + 1]) - sig) * eps
                if inpaint is not None:
                    mask, lat0, noise = inpaint
                    s_next = np.float32(sigmas[i + 1])
                    if cfg.schedule != "rectified_flow":
                        ref = lat0 + noise * s_next
                    else:
                        ref = (1.0 - s_next) * lat0 + s_next * noise
                    latents = (mask * latents
                               + (1.0 - mask) * ref).astype(np.float32)
                if observer is not None:
                    observer.on_progress(self, (i + 1) / n_steps)
        return latents

    def run_img2img(self, prompt: str, init_image: np.ndarray,
                    strength: float = 0.6, negative_prompt: str = "",
                    cfg: Optional[ImageGenConfig] = None,
                    observer=None) -> Image:
        """Image-to-image: encode `init_image` through the VAE encoder,
        noise it to the strength-derived schedule point, denoise the
        remaining steps. strength in (0, 1]: 1.0 = full txt2img noise,
        small = stay close to the input. init_image: (H, W, 3) uint8 or
        float in [0, 1] (H/W must match cfg.height/width)."""
        if self.vae_encoder is None:
            raise ValueError("run_img2img needs a vae_encoder Model")
        cfg = cfg or ImageGenConfig()
        img = np.asarray(init_image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = (img.astype(np.float32) * 2.0 - 1.0).transpose(2, 0, 1)[None]
        ctx, extra_feeds = self._encode_cfg(prompt, negative_prompt, cfg)
        moments = np.asarray(self._run(self.vae_encoder,
                                       {"image": img})["moments"])
        lc = moments.shape[1] // 2
        mean, logvar = moments[:, :lc], moments[:, lc:]
        rng = np.random.default_rng(cfg.seed)
        z = mean + np.exp(0.5 * np.clip(logvar, -30, 20)) * \
            rng.standard_normal(mean.shape).astype(np.float32)
        lat0 = ((z - self.vae_shift) * self.vae_scaling).astype(np.float32)

        sched = make_schedule(cfg.schedule, cfg.steps)
        sigmas, timesteps = sched["sigmas"], sched["timesteps"]
        t0 = min(int(round(cfg.steps * (1.0 - strength))), cfg.steps - 1)
        sig0 = float(sigmas[t0])
        noise = rng.standard_normal(lat0.shape).astype(np.float32)
        if cfg.schedule != "rectified_flow":
            latents = lat0 + noise * np.float32(sig0)
        else:  # rectified flow forward process
            latents = ((1.0 - sig0) * lat0 + sig0 * noise).astype(np.float32)
        latents = self._denoise(latents, ctx, extra_feeds,
                                sigmas[t0:], timesteps[t0:], cfg, observer)
        img = np.asarray(self._run(self.vae, {"latents": latents})["image"])
        pixels = np.clip((img[0].transpose(1, 2, 0) + 1) / 2, 0, 1)
        return Image((pixels * 255).round().astype(np.uint8))

    def run_inpaint(self, prompt: str, init_image: np.ndarray,
                    mask: np.ndarray, negative_prompt: str = "",
                    cfg: Optional[ImageGenConfig] = None,
                    observer=None) -> Image:
        """Inpainting: repaint where mask==1, keep the init image where
        mask==0 (RePaint-style: every step re-blends the unmasked
        latents with the init re-noised to that step's level).
        mask: (H, W) float in [0, 1] or bool, at image resolution."""
        if self.vae_encoder is None:
            raise ValueError("run_inpaint needs a vae_encoder Model")
        cfg = cfg or ImageGenConfig()
        img = np.asarray(init_image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = (img.astype(np.float32) * 2.0 - 1.0).transpose(2, 0, 1)[None]
        ctx, extra_feeds = self._encode_cfg(prompt, negative_prompt, cfg)
        moments = np.asarray(self._run(self.vae_encoder,
                                       {"image": img})["moments"])
        lc = moments.shape[1] // 2
        mean, logvar = moments[:, :lc], moments[:, lc:]
        rng = np.random.default_rng(cfg.seed)
        z = mean + np.exp(0.5 * np.clip(logvar, -30, 20)) * \
            rng.standard_normal(mean.shape).astype(np.float32)
        lat0 = ((z - self.vae_shift) * self.vae_scaling).astype(np.float32)

        # mask -> latent resolution (8x8 average pool), broadcast to lat
        m = np.asarray(mask, np.float32)
        H8, W8 = lat0.shape[2], lat0.shape[3]
        m = m.reshape(H8, m.shape[0] // H8, W8,
                      m.shape[1] // W8).mean(axis=(1, 3))
        m = np.broadcast_to(m[None, None], lat0.shape).astype(np.float32)

        sched = make_schedule(cfg.schedule, cfg.steps)
        sigmas, timesteps = sched["sigmas"], sched["timesteps"]
        noise = rng.standard_normal(lat0.shape).astype(np.float32)
        sig0 = float(sigmas[0])
        if cfg.schedule != "rectified_flow":
            latents = (lat0 + noise * np.float32(sig0)).astype(np.float32)
        else:
            latents = ((1.0 - sig0) * lat0 + sig0 * noise).astype(np.float32)
        latents = self._denoise(latents, ctx, extra_feeds, sigmas, timesteps,
                                cfg, observer, inpaint=(m, lat0, noise))
        img = np.asarray(self._run(self.vae, {"latents": latents})["image"])
        pixels = np.clip((img[0].transpose(1, 2, 0) + 1) / 2, 0, 1)
        return Image((pixels * 255).round().astype(np.uint8))


class SDXLImageGenerationInterface(ImageGenerationInterface):
    """Dual text-encoder CFG pipeline (SDXL family).

    Reference equivalent: the dual-encoder branch of
    ImageGenerationInterface (src/interfaces.rs:327-2780). Conditioning:
    per-encoder penultimate hidden states concatenated on the channel
    dim (CLIP-L 768 + OpenCLIP-bigG 1280 = 2048), pooled projection
    from encoder 2 as `text_embeds`, and the 6-value micro-conditioning
    `time_ids` (orig_size, crop_topleft, target_size).
    """

    def __init__(self, text_encoder: Model, text_encoder_2: Model,
                 unet: Model, vae: Model, tokenizer=None, **kw):
        super().__init__(text_encoder, unet, vae, tokenizer=tokenizer, **kw)
        self.text_encoder_2 = text_encoder_2

    def _encode_one(self, ids: np.ndarray):
        o1 = self._run(self.text_encoder, {"input_ids": ids})
        o2 = self._run(self.text_encoder_2, {"input_ids": ids})
        emb = np.concatenate(
            [np.asarray(o1["penultimate_hidden_state"]),
             np.asarray(o2["penultimate_hidden_state"])], axis=-1)
        return emb, np.asarray(o2["text_embeds"])

    def _encode_cfg(self, prompt, negative_prompt, cfg):
        c, pc = self._encode_one(self.encode_prompt(prompt))
        u, pu = self._encode_one(self.encode_prompt(negative_prompt))
        tid = np.asarray([[cfg.height, cfg.width, 0, 0,
                           cfg.height, cfg.width]], dtype=np.float32)
        return (np.concatenate([u, c], axis=0),
                {"text_embeds": np.concatenate([pu, pc], axis=0),
                 "time_ids": np.concatenate([tid, tid], axis=0)})


class SD3ImageGenerationInterface(ImageGenerationInterface):
    """Triple text-encoder rectified-flow pipeline (SD3/SD3.5 family).

    Reference equivalent: the SD3 branch of ImageGenerationInterface
    (src/interfaces.rs:327-2780; compute_flux_schedule :2002).
    Conditioning per the SD3 paper: CLIP-L and CLIP-G penultimate
    hidden states concatenated channel-wise, zero-padded to the T5
    width, then T5 embeddings appended along the sequence; pooled
    conditioning is the concatenated CLIP projections. T5 is optional
    (dropped -> zeros, as the upstream pipeline allows).
    """

    def __init__(self, clip_l: Model, clip_g: Model, mmdit: Model,
                 vae: Model, t5: Optional[Model] = None, tokenizer=None,
                 t5_tokenizer=None, joint_dim: int = 4096,
                 t5_seq_len: int = 0, **kw):
        kw.setdefault("latent_channels", 16)
        super().__init__(clip_l, mmdit, vae, tokenizer=tokenizer, **kw)
        self.clip_g = clip_g
        self.t5 = t5
        self.t5_tokenizer = t5_tokenizer
        self.joint_dim = joint_dim
        self.t5_seq_len = t5_seq_len

    def _encode_one(self, text: str):
        ids = self.encode_prompt(text)
        o1 = self._run(self.text_encoder, {"input_ids": ids})
        o2 = self._run(self.clip_g, {"input_ids": ids})
        clip_emb = np.concatenate(
            [np.asarray(o1["penultimate_hidden_state"]),
             np.asarray(o2["penultimate_hidden_state"])], axis=-1)
        pooled = np.concatenate([np.asarray(o1["text_embeds"]),
                                 np.asarray(o2["text_embeds"])], axis=-1)
        pad = self.joint_dim - clip_emb.shape[-1]
        emb = np.pad(clip_emb, ((0, 0), (0, 0), (0, pad))).astype(np.float32)
        if self.t5 is not None:
            tt = self.t5_tokenizer or self.tokenizer
            t5_ids = [tid for tid in (tt.encode(text) if tt else [])]
            L = self.t5_seq_len or len(t5_ids) or 1
            t5_ids = (t5_ids[:L] + [0] * (L - len(t5_ids)))
            t5_out = self._run(self.t5, {
                "input_ids": np.asarray(t5_ids, dtype=np.int64)[None]})
            key = ("last_hidden_state" if "last_hidden_state" in t5_out
                   else "encoder_states")
            emb = np.concatenate([emb, np.asarray(t5_out[key],
                                                  dtype=np.float32)], axis=1)
        return emb, pooled

    def _encode_cfg(self, prompt, negative_prompt, cfg):
        c, pc = self._encode_one(prompt)
        u, pu = self._encode_one(negative_prompt)
        return (np.concatenate([u, c], axis=0),
                {"pooled_projections": np.concatenate([pu, pc], axis=0)})

    def _unet_feeds(self, sample, t, ctx, extra):
        B = sample.shape[0]
        return {"hidden_states": sample,
                "timestep": np.full((B,), t, dtype=np.float32),
                "encoder_hidden_states": ctx, **extra}

    def _unet_feeds_traced(self, sample, t, ctx, extra):
        import jax.numpy as jnp

        B = sample.shape[0]
        return {"hidden_states": sample,
                "timestep": jnp.full((B,), t, dtype=jnp.float32),
                "encoder_hidden_states": ctx, **extra}


class FluxImageGenerationInterface(ImageGenerationInterface):
    """Flux (dev/schnell) rectified-flow pipeline — guidance-distilled, so
    there is NO CFG pair: one sample per step, guidance passed as a model
    input (flux-dev) or omitted (schnell).

    Reference equivalent: the flux branch of ImageGenerationInterface
    (src/interfaces.rs:327-2780; compute_flux_schedule :2002).
    Conditioning: CLIP-L pooled output + T5 sequence embeddings.
    """

    def __init__(self, clip: Model, t5: Model, transformer: Model,
                 vae: Model, tokenizer=None, t5_tokenizer=None,
                 t5_seq_len: int = 512, guidance_embeds: bool = True, **kw):
        kw.setdefault("latent_channels", 16)
        super().__init__(clip, transformer, vae, tokenizer=tokenizer, **kw)
        self.t5 = t5
        self.t5_tokenizer = t5_tokenizer
        self.t5_seq_len = t5_seq_len
        self.guidance_embeds = guidance_embeds

    def run_img2img(self, *a, **kw):
        raise NotImplementedError(
            "img2img is not wired for the flux pipeline yet (its loop "
            "has no CFG pair); use an sd/sdxl/sd3 pipeline")

    def _encode(self, text: str):
        pooled = np.asarray(self._run(self.text_encoder, {
            "input_ids": self.encode_prompt(text)})["pooled"])
        tt = self.t5_tokenizer or self.tokenizer
        ids = list(tt.encode(text))[: self.t5_seq_len] if tt else []
        ids = ids + [0] * (self.t5_seq_len - len(ids))
        t5_out = self._run(self.t5, {
            "input_ids": np.asarray(ids, dtype=np.int64)[None]})
        key = ("encoder_states" if "encoder_states" in t5_out
               else "last_hidden_state")
        return np.asarray(t5_out[key], dtype=np.float32), pooled

    def run(self, prompt: str, negative_prompt: str = "",
            cfg: Optional[ImageGenConfig] = None, observer=None) -> Image:
        cfg = cfg or ImageGenConfig(schedule="rectified_flow")
        h8, w8 = cfg.height // 8, cfg.width // 8
        ctx, pooled = self._encode(prompt)
        sched = rectified_flow_schedule(cfg.steps)
        sigmas, timesteps = sched["sigmas"], sched["timesteps"]
        rng = np.random.default_rng(cfg.seed)
        latents = rng.standard_normal(
            (1, self.latent_channels, h8, w8)).astype(np.float32)
        if self._use_compiled_loop():
            latents = self._flux_denoise_compiled(latents, ctx, pooled,
                                                  sigmas, cfg)
            if observer is not None:
                observer.on_progress(self, 1.0)
        else:
            for i in range(cfg.steps):
                sig = float(sigmas[i])
                feeds = {"hidden_states": latents,
                         "timestep": np.asarray([sig], np.float32),
                         "pooled_projections": pooled,
                         "encoder_hidden_states": ctx}
                if self.guidance_embeds:
                    feeds["guidance"] = np.asarray([cfg.guidance_scale],
                                                   np.float32)
                v = np.asarray(self._run(self.unet, feeds)["out"])
                latents = latents + (float(sigmas[i + 1]) - sig) * v
                if observer is not None:
                    observer.on_progress(self, (i + 1) / cfg.steps)
        img = np.asarray(self._run(self.vae, {"latents": latents})["image"])
        pixels = np.clip((img[0].transpose(1, 2, 0) + 1) / 2, 0, 1)
        return Image((pixels * 255).round().astype(np.uint8))

    def _flux_denoise_compiled(self, latents, ctx, pooled, sigmas, cfg):
        import jax
        import jax.numpy as jnp

        key = ("flux_denoise", cfg.steps, latents.shape, ctx.shape,
               pooled.shape, self.guidance_embeds)
        progs = getattr(self, "_programs", None)
        if progs is None:
            self._programs = progs = {}
        if key not in progs:
            step = self._traced_unet()
            guidance_embeds = self.guidance_embeds
            steps = cfg.steps

            def run(latents, ctx, pooled, sigmas, gscale, weights):
                def body(lat, i):
                    sig = sigmas[i]
                    named = {"hidden_states": lat,
                             "timestep": sig[None].astype(jnp.float32),
                             "pooled_projections": pooled,
                             "encoder_hidden_states": ctx}
                    if guidance_embeds:
                        named["guidance"] = gscale[None]
                    v = step(named, weights).astype(jnp.float32)
                    return lat + (sigmas[i + 1] - sig) * v, None

                latents, _ = jax.lax.scan(body, latents, jnp.arange(steps))
                return latents

            progs[key] = jax.jit(run)
        return np.asarray(progs[key](
            jnp.asarray(latents), jnp.asarray(ctx), jnp.asarray(pooled),
            jnp.asarray(sigmas),
            jnp.asarray(cfg.guidance_scale, jnp.float32),
            self._unet_weights_device()))


def image_interface_from_bundle(bundle, mode: str = "xla"):
    """Build the right pipeline interface from a DiffusersPipelineLoader
    bundle (importers.loaders): SD/SD2 -> ImageGenerationInterface,
    SDXL/SD3/Flux -> their subclasses."""
    spec = bundle.interfaces["image"]
    m = bundle.models
    tok = None
    if bundle.tokenizer_source:
        from ..tokenizer import AnyTokenizer
        tok = AnyTokenizer.load(bundle.tokenizer_source)
    kind = spec["pipeline"]
    common = dict(tokenizer=tok, latent_channels=spec["latent_channels"],
                  bos_token_id=spec.get("bos_token_id", 49406),
                  uncond_token_id=spec.get("eos_token_id", 49407),
                  seq_len=spec.get("seq_len", 77))
    if spec.get("vae_encoder"):
        common["vae_encoder"] = m[spec["vae_encoder"]]
        common["vae_scaling"] = spec.get("vae_scaling", 0.18215)
        common["vae_shift"] = spec.get("vae_shift", 0.0)
    if kind == "sd":
        iface = ImageGenerationInterface(
            m[spec["text_encoder"]], m[spec["unet"]], m[spec["vae"]],
            prediction_type=spec.get("prediction_type", "epsilon"), **common)
    elif kind == "sdxl":
        iface = SDXLImageGenerationInterface(
            m[spec["text_encoder"]], m[spec["text_encoder_2"]],
            m[spec["unet"]], m[spec["vae"]], **common)
    elif kind == "sd3":
        iface = SD3ImageGenerationInterface(
            m[spec["text_encoder"]], m[spec["text_encoder_2"]],
            m[spec["transformer"]], m[spec["vae"]],
            t5=m.get(spec.get("text_encoder_3")),
            joint_dim=spec["joint_dim"], t5_seq_len=spec.get("t5_seq_len", 0),
            **common)
    elif kind == "flux":
        iface = FluxImageGenerationInterface(
            m[spec["text_encoder"]], m[spec["text_encoder_2"]],
            m[spec["transformer"]], m[spec["vae"]],
            t5_seq_len=spec.get("t5_seq_len", 77),
            guidance_embeds=spec.get("guidance_embeds", True), **common)
    else:
        raise ValueError(kind)
    if mode != "xla":
        from ..backends.eval_backend import EvalBackend
        iface._backends = {mm.id: EvalBackend(mode) for mm in m.values()}
    return iface
