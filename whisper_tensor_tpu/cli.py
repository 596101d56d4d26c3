"""Command-line interface.

Reference equivalent: crates/whisper-tensor-cli/src/main.rs:22-234
(generate / image / tts / stt subcommands, loader flag + key=value
config passthrough). Adds `serve` and `inspect`.

Usage:
  python -m whisper_tensor_tpu.cli generate --model PATH --prompt "..." \
      [--loader auto] [--tokenizer PATH] [--max-new-tokens 64] [-c k=v ...]
  python -m whisper_tensor_tpu.cli image --unet PATH ... --prompt "..."
  python -m whisper_tensor_tpu.cli inspect --model PATH
  python -m whisper_tensor_tpu.cli serve [--port 3000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Dict, List


def _parse_kv(pairs: List[str]) -> Dict[str, object]:
    out: Dict[str, object] = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"bad config entry {p!r}; expected key=value")
        k, v = p.split("=", 1)
        for cast in (int, float):
            try:
                out[k] = cast(v)
                break
            except ValueError:
                continue
        else:
            out[k] = {"true": True, "false": False}.get(v.lower(), v)
    return out


def cmd_generate(args) -> None:
    import numpy as np

    from .importers.loaders import identify_and_load, loader_registry
    from .interfaces.text import TextInferenceInterface
    from .tokenizer import AnyTokenizer

    cfg = _parse_kv(args.config)
    cfg.setdefault("max_len", args.max_len)
    t0 = time.time()
    if args.loader == "auto":
        bundle = identify_and_load(args.model, **cfg)
    else:
        bundle = loader_registry()[args.loader].load({"path": args.model, **cfg})
    if "text2text" in bundle.interfaces and "text" not in bundle.interfaces:
        from .interfaces.seq2seq import Seq2SeqInterface

        spec = bundle.interfaces["text2text"]
        s2s = Seq2SeqInterface(bundle.models[spec["encoder"]],
                               bundle.models[spec["decoder"]],
                               max_len=spec["max_len"],
                               start_token=spec.get("start", 0),
                               eos_token=spec.get("eos", 1))
        s2s.tokenizer = AnyTokenizer.load(
            args.tokenizer or bundle.tokenizer_source or "bytes")
        t1 = time.time()
        text = s2s.run_string_in_string_out(args.prompt, args.max_new_tokens)
        print(text)
        print(f"[{args.max_new_tokens} tokens in {time.time() - t1:.2f}s]",
              file=sys.stderr)
        return
    iface_cfg = bundle.interfaces.get("text") or {}
    name = iface_cfg.get("model") or next(iter(bundle.models))
    model = bundle.models[name]
    print(f"loaded {name} in {time.time() - t0:.1f}s", file=sys.stderr)
    tok_src = args.tokenizer or bundle.tokenizer_source or "bytes"
    window_models = {int(w): bundle.models[mn]
                     for w, mn in (iface_cfg.get("windows") or {}).items()}
    iface = TextInferenceInterface(model,
                                   max_len=int(iface_cfg.get("max_len",
                                                             args.max_len)),
                                   window_models=window_models or None,
                                   quantize=iface_cfg.get("quantize")
                                   or None)
    iface.tokenizer = AnyTokenizer.load(tok_src)
    if getattr(args, "chat", False):
        from .tokenizer import apply_chat_template

        messages = ([{"role": "system", "content": args.system}]
                    if getattr(args, "system", None) else [])
        messages.append({"role": "user", "content": args.prompt})
        args.prompt = apply_chat_template(iface.tokenizer, messages)
    t1 = time.time()
    if (getattr(args, "regex", None) or getattr(args, "json_schema", None)) \
            and (getattr(args, "num_beams", 1) > 1
                 or getattr(args, "draft_model", None)):
        raise SystemExit("--regex/--json-schema are not supported with "
                         "--num-beams or --draft-model")
    if getattr(args, "num_beams", 1) and args.num_beams > 1:
        ids = np.asarray(iface.tokenizer.encode(args.prompt),
                         dtype=np.int64)[None]
        toks = iface.beam_search_tokens(ids, args.max_new_tokens,
                                        beam=args.num_beams)[0]
        text = iface.tokenizer.decode([int(t) for t in toks])
    elif getattr(args, "draft_model", None):
        # speculative decoding: a small draft model proposes blocks the
        # target verifies in one forward — greedy, token-exact vs plain
        from .interfaces.speculative import SpeculativeDecoder

        if args.loader == "auto":
            dbundle = identify_and_load(args.draft_model, **cfg)
        else:
            dbundle = loader_registry()[args.loader].load(
                {"path": args.draft_model, **cfg})
        dname = (dbundle.interfaces.get("text") or {}).get("model") \
            or next(iter(dbundle.models))
        draft = TextInferenceInterface(
            dbundle.models[dname],
            max_len=int(iface_cfg.get("max_len", args.max_len)))
        dec = SpeculativeDecoder(iface, draft, k=args.draft_k)
        sampling = None
        if args.temperature > 0 or args.repetition_penalty != 1.0:
            from .interfaces.text import SamplingParams

            # rejection-sampling speculative path; repetition_penalty
            # is rejected by the decoder with a clear error
            sampling = SamplingParams(
                temperature=args.temperature, top_k=args.top_k,
                top_p=args.top_p,
                repetition_penalty=args.repetition_penalty,
                seed=args.seed)
        ids = np.asarray(iface.tokenizer.encode(args.prompt),
                         dtype=np.int64)
        toks = dec.generate_tokens(ids, args.max_new_tokens,
                                   sampling=sampling)[0]
        text = iface.tokenizer.decode([int(t) for t in toks])
    else:
        sampling = None
        if (args.temperature > 0 or args.repetition_penalty != 1.0
                or args.presence_penalty != 0.0
                or args.frequency_penalty != 0.0):
            from .interfaces.text import SamplingParams

            sampling = SamplingParams(
                temperature=args.temperature, top_k=args.top_k,
                top_p=args.top_p, min_p=args.min_p,
                repetition_penalty=args.repetition_penalty,
                presence_penalty=args.presence_penalty,
                frequency_penalty=args.frequency_penalty, seed=args.seed)
        schema = None
        if getattr(args, "json_schema", None):
            import json as _json

            schema = _json.loads(args.json_schema)
        text = iface.run_string_in_string_out(args.prompt,
                                              args.max_new_tokens,
                                              sampling=sampling,
                                              regex=getattr(args, "regex",
                                                            None),
                                              json_schema=schema)
    for s in (getattr(args, "stop", None) or []):
        i = text.find(s)
        if i >= 0:
            text = text[:i]
    dt = time.time() - t1
    print(text)
    print(f"[{args.max_new_tokens} tokens in {dt:.2f}s "
          f"({args.max_new_tokens / dt:.1f} tok/s)]", file=sys.stderr)


def cmd_embed(args) -> None:
    """Text embeddings from any causal LM via the hidden-state capture
    tap (llama.cpp `embedding`-style; same pooling as /v1/embeddings)."""
    import numpy as np

    from .importers.loaders import identify_and_load, loader_registry
    from .interfaces.text import TextInferenceInterface
    from .tokenizer import AnyTokenizer

    cfg = _parse_kv(args.config)
    cfg.setdefault("max_len", args.max_len)
    if args.loader == "auto":
        bundle = identify_and_load(args.model, **cfg)
    else:
        bundle = loader_registry()[args.loader].load(
            {"path": args.model, **cfg})
    iface_cfg = bundle.interfaces.get("text") or {}
    name = iface_cfg.get("model") or next(iter(bundle.models))
    iface = TextInferenceInterface(
        bundle.models[name],
        max_len=int(iface_cfg.get("max_len", args.max_len)),
        quantize=iface_cfg.get("quantize") or None)
    tok = AnyTokenizer.load(args.tokenizer or bundle.tokenizer_source
                            or "bytes")
    ids_list = [np.asarray(tok.encode(t), np.int64) for t in args.text]
    for i, v in enumerate(iface.embed(ids_list, pooling=args.pooling)):
        print(json.dumps({"index": i, "embedding":
                          [round(float(x), 7) for x in v]}))


def cmd_image(args) -> None:
    import numpy as np

    from .interfaces.image_gen import (ImageGenConfig,
                                       ImageGenerationInterface,
                                       image_interface_from_bundle)
    from .model import Model
    from .tokenizer import AnyTokenizer

    if args.model:
        from .importers.loaders import identify_and_load

        extra = _parse_kv(args.config)
        if args.init_image:
            extra.setdefault("img2img", "1")
        bundle = identify_and_load(args.model, height=args.height,
                                   width=args.width, **extra)
        if "image" not in bundle.interfaces:
            raise SystemExit(f"{args.model} is not an image pipeline "
                             f"(got: {sorted(bundle.interfaces) or 'none'})")
        iface = image_interface_from_bundle(bundle)
        schedule = ("rectified_flow"
                    if bundle.interfaces["image"]["pipeline"] in
                    ("sd3", "flux") else
                    ("euler_karras" if args.karras else "euler"))
    else:
        if not (args.text_encoder and args.unet and args.vae):
            raise SystemExit("need --model <diffusers dir> OR all of "
                             "--text-encoder/--unet/--vae")
        te = Model.new_from_onnx_file(args.text_encoder)
        unet = Model.new_from_onnx_file(args.unet)
        vae = Model.new_from_onnx_file(args.vae)
        tok = AnyTokenizer.load(args.tokenizer) if args.tokenizer else None
        iface = ImageGenerationInterface(te, unet, vae, tokenizer=tok)
        schedule = "euler_karras" if args.karras else "euler"
    gcfg = ImageGenConfig(steps=args.steps, guidance_scale=args.cfg,
                          height=args.height, width=args.width,
                          seed=args.seed, schedule=schedule)
    if args.init_image and args.mask_image:
        init = _read_ppm(args.init_image)
        mask = _read_ppm(args.mask_image).mean(axis=-1) / 255.0
        img = iface.run_inpaint(args.prompt, init, mask,
                                negative_prompt=args.negative_prompt,
                                cfg=gcfg)
    elif args.init_image:
        init = _read_ppm(args.init_image)
        img = iface.run_img2img(args.prompt, init, strength=args.strength,
                                negative_prompt=args.negative_prompt,
                                cfg=gcfg)
    else:
        img = iface.run(args.prompt, args.negative_prompt, gcfg)
    _write_ppm(args.output, img.pixels)
    print(f"wrote {args.output} ({img.pixels.shape[1]}x{img.pixels.shape[0]})")


def _write_ppm(path: str, pixels) -> None:
    """Dependency-free image writer (PPM P6)."""
    h, w, _ = pixels.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(pixels.tobytes())


def _read_ppm(path: str):
    """Dependency-free PPM P6 reader -> (H, W, 3) uint8."""
    import numpy as np

    with open(path, "rb") as f:
        data = f.read()
    parts = []
    i = 0
    while len(parts) < 4:          # magic, w, h, maxval
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":  # comment line
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        parts.append(data[i:j])
        i = j
    if parts[0] != b"P6":
        raise ValueError(f"{path}: not a P6 PPM")
    w, h = int(parts[1]), int(parts[2])
    i += 1  # single whitespace after maxval
    return np.frombuffer(data[i:i + w * h * 3],
                         dtype=np.uint8).reshape(h, w, 3).copy()


def cmd_inspect(args) -> None:
    from .importers.loaders import identify_and_load

    bundle = identify_and_load(args.model, **_parse_kv(args.config))
    for name, model in bundle.models.items():
        g = model.graph
        census: Dict[str, int] = {}
        for sop in g.ops:
            census[sop.op.OP_TYPE] = census.get(sop.op.OP_TYPE, 0) + 1
        print(json.dumps({
            "name": name, "ops": len(g.ops),
            "weights": len(g.store),
            "weight_bytes": g.store.total_bytes(),
            "inputs": [g.tensors[t].name for t in g.inputs],
            "outputs": [g.tensors[t].name for t in g.outputs],
            "op_census": dict(sorted(census.items(), key=lambda kv: -kv[1])),
            "interfaces": {k: {kk: vv for kk, vv in v.items()
                               if isinstance(vv, (str, int, float, bool))}
                           for k, v in bundle.interfaces.items()},
        }, indent=2))


def cmd_export(args) -> None:
    """Convert any supported checkpoint (HF/GGUF/diffusers/.pth/...) to
    ONNX — the reference importer's product (identify_and_load ->
    ONNX bytes, crates/whisper-tensor-import/src/lib.rs:38)."""
    import os

    from .importers.loaders import identify_and_load, loader_registry

    cfg = _parse_kv(args.config)
    if args.loader == "auto":
        bundle = identify_and_load(args.model, **cfg)
    else:
        bundle = loader_registry()[args.loader].load(
            {"path": args.model, **cfg})
    names = list(bundle.models)
    if args.name:
        if args.name not in bundle.models:
            raise SystemExit(f"no model {args.name!r}; have {names}")
        names = [args.name]
    multi = len(names) > 1
    for name in names:
        out = args.output
        if multi:
            stem, ext = os.path.splitext(out)
            out = f"{stem}.{name}{ext or '.onnx'}"
        bundle.models[name].save_onnx(out, weights=args.weights)
        size = os.path.getsize(out)
        extra = ""
        if args.weights == "external":
            extra = f" + {os.path.getsize(out + '.bin')} B weights"
        print(f"{name}: wrote {out} ({size} B{extra})")


def cmd_tts(args) -> None:
    from .importers.loaders import identify_and_load
    from .interfaces.tts import TextToSpeechInterface
    from .utils.audio import write_wav

    bundle = identify_and_load(args.model, **_parse_kv(args.config))
    if "tts" not in bundle.interfaces:
        raise SystemExit(f"{args.model} does not expose a TTS interface "
                         f"(got: {sorted(bundle.interfaces) or 'none'})")
    iface = TextToSpeechInterface.from_bundle(bundle, mode=args.mode)
    from .interfaces.tts import F5Synthesizer

    if isinstance(iface, F5Synthesizer):
        if not args.ref_audio:
            raise SystemExit("F5-TTS needs --ref-audio <voice prompt .wav>")
        from .super_graph.links import AudioClip
        from .utils.audio import read_wav
        samples, sr = read_wav(args.ref_audio)
        clip = iface.run_text_to_audio(args.text,
                                       ref_audio=AudioClip(samples, sr))
    else:
        voice = 0
        if args.voice and iface.voice_names:
            if args.voice not in iface.voice_names:
                raise SystemExit(f"unknown voice {args.voice!r}; available: "
                                 f"{iface.voice_names}")
            voice = iface.voice_names.index(args.voice)
        clip = iface.run_text_to_audio(args.text, voice=voice)
    write_wav(args.output, clip.samples, clip.sample_rate)
    print(json.dumps({"output": args.output, "samples": len(clip.samples),
                      "sample_rate": clip.sample_rate,
                      "seconds": round(len(clip.samples)
                                       / clip.sample_rate, 3)}))


def cmd_stt(args) -> None:
    import numpy as np

    from .interfaces.stt import SpeechToTextInterface
    from .model import Model
    from .super_graph.links import AudioClip
    from .utils.audio import read_wav

    samples, sr = read_wav(args.audio)
    tok = None
    if args.tokenizer:
        from .tokenizer import AnyTokenizer
        tok = AnyTokenizer.load(args.tokenizer)
    if args.model:
        from .importers.loaders import identify_and_load

        bundle = identify_and_load(args.model, **_parse_kv(args.config))
        if "stt" not in bundle.interfaces:
            raise SystemExit(f"{args.model} has no STT interface")
        iface = SpeechToTextInterface.from_bundle(bundle, tokenizer=tok)
        tok = iface.tokenizer
    else:
        if not (args.encoder and args.decoder):
            raise SystemExit("need --model <whisper dir> OR --encoder + "
                             "--decoder")
        enc = Model.new_from_onnx_file(args.encoder)
        dec = Model.new_from_onnx_file(args.decoder)
        sot = [int(x) for x in args.sot.split(",")] if args.sot else None
        iface = SpeechToTextInterface(enc, dec, tokenizer=tok,
                                      sot_sequence=sot, eot_token=args.eot)
    clip = AudioClip(samples, sr)
    if getattr(args, "stream", 0):
        # simulate live input: feed the file in --stream-second chunks,
        # print commits as they stabilize (LocalAgreement-2)
        from .interfaces.stt import StreamingTranscriber
        from .utils.audio import resample

        s16 = samples if sr == 16000 else resample(
            np.asarray(samples, np.float32).reshape(-1), sr, 16000)
        st = StreamingTranscriber(iface, max_new_per_window=args.max_tokens)
        step = max(int(args.stream * 16000), 1)
        for off in range(0, len(s16), step):
            new = st.feed(s16[off:off + step])
            if new:
                txt = tok.decode(new) if tok is not None else json.dumps(new)
                print(txt, flush=True, end="" if tok is not None else "\n")
        new = st.flush()
        if new:
            print(tok.decode(new) if tok is not None else json.dumps(new),
                  end="")
        print()
        return
    if args.beam > 1:
        toks = iface.transcribe_beam(clip, max_new=args.max_tokens,
                                     beam=args.beam)
        print(tok.decode(toks) if tok is not None else json.dumps(toks))
    elif tok is not None:
        print(iface.run_audio_in_text_out(clip, max_new=args.max_tokens))
    else:
        print(json.dumps(iface.transcribe_tokens(clip,
                                                 max_new=args.max_tokens)))


def cmd_serve(args) -> None:
    import asyncio

    from .server.main import Server

    srv = Server()
    if getattr(args, "model", None):
        cfg = dict(kv.split("=", 1) for kv in (args.config or []))
        cfg["path"] = args.model
        entries = srv.models.run_loader(args.loader, cfg)
        for e in entries:
            print(f"loaded model #{e.id} {e.name}", file=sys.stderr)
    if getattr(args, "http_port", None) is not None:
        from .server.openai_api import OpenAIApi

        api = OpenAIApi(srv, args.host, args.http_port).start()
        print(f"OpenAI-compatible API on http://{args.host}:{api.port}/v1")
    print(f"whisper-tensor-tpu server on ws://{args.host}:{args.port}")
    asyncio.run(srv.run(args.host, args.port))


def main(argv=None) -> None:
    from .compile_cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser("whisper-tensor-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="LLM text generation")
    g.add_argument("--model", required=True)
    g.add_argument("--prompt", required=True)
    g.add_argument("--loader", default="auto")
    g.add_argument("--tokenizer")
    g.add_argument("--max-new-tokens", type=int, default=64)
    g.add_argument("--max-len", type=int, default=1024)
    g.add_argument("--temperature", type=float, default=0.0)
    g.add_argument("--top-k", type=int, default=0)
    g.add_argument("--top-p", type=float, default=1.0)
    g.add_argument("--min-p", type=float, default=0.0)
    g.add_argument("--repetition-penalty", type=float, default=1.0)
    g.add_argument("--presence-penalty", type=float, default=0.0)
    g.add_argument("--frequency-penalty", type=float, default=0.0)
    g.add_argument("--num-beams", type=int, default=1)
    g.add_argument("--draft-model",
                   help="speculative decoding: path to a small draft "
                        "model sharing the target's vocab (greedy only)")
    g.add_argument("--draft-k", type=int, default=4,
                   help="speculation block length (k-1 proposals/round)")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--stop", action="append", default=[],
                   help="stop sequence: truncate the output at its first "
                        "occurrence (repeatable)")
    g.add_argument("--regex",
                   help="constrain output to match this regex "
                        "(token-DFA guided decoding)")
    g.add_argument("--json-schema",
                   help="constrain output to a JSON document matching "
                        "this schema (JSON string)")
    g.add_argument("--chat", action="store_true",
                   help="treat --prompt as a user message and render the "
                        "tokenizer's chat template (ChatML fallback)")
    g.add_argument("--system", help="system message for --chat")
    g.add_argument("-c", "--config", action="append", default=[],
                   help="loader config key=value")
    g.set_defaults(fn=cmd_generate)

    e = sub.add_parser("embed", help="text embeddings from a causal LM "
                       "(hidden-state tap, one JSON line per input)")
    e.add_argument("--model", required=True)
    e.add_argument("--loader", default="auto")
    e.add_argument("--tokenizer", default=None)
    e.add_argument("--max-len", type=int, default=1024)
    e.add_argument("--pooling", choices=["last", "mean"], default="last")
    e.add_argument("-c", "--config", action="append", default=[],
                   help="loader config key=value")
    e.add_argument("text", nargs="+", help="input text(s)")
    e.set_defaults(fn=cmd_embed)

    i = sub.add_parser("image", help="text-to-image generation")
    i.add_argument("--model", help="diffusers pipeline dir "
                                   "(sd/sdxl/sd3/flux; model_index.json)")
    i.add_argument("-c", "--config", action="append", default=[])
    i.add_argument("--text-encoder")
    i.add_argument("--unet")
    i.add_argument("--vae")
    i.add_argument("--tokenizer")
    i.add_argument("--prompt", required=True)
    i.add_argument("--negative-prompt", default="")
    i.add_argument("--steps", type=int, default=20)
    i.add_argument("--cfg", type=float, default=7.5)
    i.add_argument("--height", type=int, default=512)
    i.add_argument("--width", type=int, default=512)
    i.add_argument("--seed", type=int, default=0)
    i.add_argument("--output", default="out.ppm")
    i.add_argument("--init-image", help="PPM image for img2img/inpaint")
    i.add_argument("--strength", type=float, default=0.6,
                   help="img2img strength (1.0 = full txt2img noise)")
    i.add_argument("--mask-image",
                   help="PPM mask (white = repaint) -> inpainting")
    i.add_argument("--karras", action="store_true",
                   help="Karras rho-spaced sigmas (euler pipelines)")
    i.set_defaults(fn=cmd_image)

    n = sub.add_parser("inspect", help="load a model and print its structure")
    n.add_argument("--model", required=True)
    n.add_argument("-c", "--config", action="append", default=[])
    n.set_defaults(fn=cmd_inspect)

    x = sub.add_parser("export",
                       help="convert any supported checkpoint to ONNX")
    x.add_argument("--model", required=True)
    x.add_argument("--loader", default="auto")
    x.add_argument("-o", "--output", required=True,
                   help="output .onnx path (per-model suffix added when "
                        "the bundle has several models)")
    x.add_argument("--weights", default="external",
                   choices=["embed", "external", "none"])
    x.add_argument("--name", default=None,
                   help="export only this model from the bundle")
    x.add_argument("-c", "--config", action="append", default=[])
    x.set_defaults(fn=cmd_export)

    t = sub.add_parser("tts", help="text-to-speech (piper/kokoro voice)")
    t.add_argument("--model", required=True,
                   help="piper .onnx(+.onnx.json) or kokoro dir")
    t.add_argument("--text", required=True)
    t.add_argument("--voice", help="kokoro voice name (see voices/)")
    t.add_argument("--ref-audio", help="f5: reference voice-prompt WAV")
    t.add_argument("--output", default="out.wav")
    t.add_argument("--mode", default="xla", choices=["xla", "oracle"])
    t.add_argument("-c", "--config", action="append", default=[])
    t.set_defaults(fn=cmd_tts)

    st = sub.add_parser("stt", help="speech-to-text (whisper)")
    st.add_argument("--model", help="HF whisper checkpoint dir")
    st.add_argument("-c", "--config", action="append", default=[])
    st.add_argument("--encoder")
    st.add_argument("--decoder")
    st.add_argument("--audio", required=True, help="WAV file")
    st.add_argument("--tokenizer")
    st.add_argument("--max-tokens", type=int, default=128)
    st.add_argument("--sot", help="comma-separated start-of-transcript ids "
                                  "(default: whisper 50258)")
    st.add_argument("--eot", type=int, default=50257)
    st.add_argument("--beam", type=int, default=1,
                    help="beam width (>1 = compiled beam search)")
    st.add_argument("--stream", type=float, default=0,
                    help="simulate live input: feed the file in this "
                         "many seconds per chunk and print text as it "
                         "stabilizes (LocalAgreement-2)")
    st.set_defaults(fn=cmd_stt)

    s = sub.add_parser("serve", help="run the WebSocket server")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=3000)
    s.add_argument("--http-port", type=int,
                   help="also serve an OpenAI-compatible HTTP API "
                        "(/v1/completions, /v1/chat/completions) on this "
                        "port (0 = auto-pick)")
    s.add_argument("--model", help="preload a model at startup")
    s.add_argument("--loader", default="auto")
    s.add_argument("-c", "--config", action="append", default=[],
                   help="loader config key=value (repeatable)")
    s.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
