"""WebSocket server main: routes protocol messages to ModelServer +
Scheduler and streams reports back.

Reference equivalent: crates/whisper-tensor-server/src/main.rs:119-466
(axum HTTP+WS at :3000, per-socket task). Run: python -m
whisper_tensor_tpu.server.main [--port 3000].
"""

from __future__ import annotations

import asyncio
import json
import os
import queue
import threading
from typing import Any, Dict, Optional, Set

import numpy as np

from ..super_graph.graph import ExecutionContext, SuperGraph
from . import protocol as P
from .model_server import ModelServer
from .scheduler import ObserverSettings, Scheduler
from .ws import WebSocketConnection, serve_websocket


def _latent_preview_rgb(lat) -> dict:
    """(1,C,H,W) latents -> small RGB frame dict for the live SD
    preview stream (no VAE decode — the standard cheap latent->RGB
    linear approximation, normalized per frame)."""
    import base64

    a = np.asarray(lat, dtype=np.float32)[0]
    rgb = a[:3] if a.shape[0] >= 3 else np.repeat(a[:1], 3, axis=0)
    lo, hi = float(rgb.min()), float(rgb.max())
    u8 = ((rgb - lo) / ((hi - lo) or 1.0) * 255).astype(np.uint8)
    u8 = u8.transpose(1, 2, 0)                      # (H, W, 3)
    return {"width": int(u8.shape[1]), "height": int(u8.shape[0]),
            "rgb_b64": base64.b64encode(
                np.ascontiguousarray(u8).tobytes()).decode()}


class Server:
    def __init__(self):
        from ..compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.models = ModelServer()
        self.scheduler = Scheduler()
        self._conns: Set[WebSocketConnection] = set()
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        # per-model text interfaces: compiled decode programs are cached
        # inside, so repeat generates (and compile_model warmup) stay hot
        self._text_ifaces: dict = {}
        # per-model continuous batchers (ragged-decode models)
        self._batchers: dict = {}
        self._batch_jobs: dict = {}       # job_id -> (batcher, future)
        self._spec_decoders: dict = {}    # (target, draft, k) -> decoder
        self._mm_ifaces: dict = {}        # bundle_id -> multimodal iface
        self._stt_streams: dict = {}      # stream_id -> StreamingTranscriber
        self._stt_ifaces: dict = {}       # entry_id -> SpeechToTextInterface
        # guards get-then-create on the caches above: the HTTP front end
        # is a ThreadingHTTPServer, so two concurrent first requests
        # would otherwise both build (and device-upload) a batcher or
        # interface, leaking the loser's weights/threads forever
        self._cache_lock = threading.RLock()

    # -- report pump: scheduler queue -> all sockets ----------------------
    def _start_report_pump(self):
        def pump():
            while True:
                report = self.scheduler.reports.get()
                if report is None:
                    return
                data = json.dumps(_json_safe(report))
                loop = self._loop
                if loop is None:
                    continue
                for conn in list(self._conns):
                    asyncio.run_coroutine_threadsafe(conn.send_text(data), loop)

        threading.Thread(target=pump, daemon=True).start()

    # -- message handling ----------------------------------------------------
    async def handle(self, conn: WebSocketConnection):
        self._conns.add(conn)
        try:
            while True:
                raw = await conn.recv()
                if raw is None:
                    return
                try:
                    msg = P.parse_message(raw)
                    reply = await asyncio.get_event_loop().run_in_executor(
                        None, self._dispatch, msg)
                except Exception as e:  # noqa: BLE001
                    reply = {"type": P.JOB_ERROR, "error": str(e)}
                if reply is not None:
                    await conn.send_text(json.dumps(_json_safe(reply)))
        finally:
            self._conns.discard(conn)

    def _dispatch(self, msg: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        t = msg["type"]
        if t == P.PING:
            return {"type": P.PONG}
        if t == P.LIST_LOADERS:
            from ..importers.loaders import loader_registry

            return {"type": P.LOADERS_REPORT, "loaders": {
                name: {"description": l.DESCRIPTION,
                       "config": [f.to_json() for f in l.config_schema()]}
                for name, l in loader_registry().items()}}
        if t == P.RUN_LOADER:
            entries = self.models.run_loader(msg["loader"], msg.get("config", {}))
            return {"type": P.MODELS_REPORT, "models": self.models.list_models(),
                    "loaded": [e.id for e in entries]}
        if t == P.UNLOAD_MODEL:
            mid = int(msg["model_id"])
            with self._cache_lock:
                bat = self._batchers.pop(mid, None)
                self._text_ifaces.pop(mid, None)
                # every cache that can hold this model's device weights
                # must drop its entry, or repeated load/unload cycles
                # leak HBM: the rnn-path iface, speculative decoders,
                # STT ifaces, and the bundle's multimodal iface
                self._text_ifaces.pop(("rnn", mid), None)
                self._stt_ifaces.pop(mid, None)
                self._spec_decoders = {k: v for k, v in
                                       self._spec_decoders.items()
                                       if mid not in k[:2]}
                try:
                    bid = int(self.models.get(mid).meta.get("bundle_id", -1))
                except KeyError:
                    bid = -1
                self._mm_ifaces.pop(bid, None)
            if bat is not None:
                bat.stop()
            self.models.unload(mid)
            return {"type": P.MODELS_REPORT, "models": self.models.list_models()}
        if t == P.LIST_MODELS:
            return {"type": P.MODELS_REPORT, "models": self.models.list_models()}
        if t == "get_batcher_stats":
            bat = self._batchers.get(int(msg["model_id"]))
            return {"type": "batcher_stats", "model_id": msg["model_id"],
                    "stats": bat.stats() if bat is not None else None}
        if t == P.GET_MODEL_GRAPH:
            return {"type": P.MODEL_GRAPH,
                    "graph": self.models.graph_json(int(msg["model_id"]))}
        if t == "get_graph_layout":
            # server-side layered layout (graph_layout.py — the
            # reference computes this client-side in egui,
            # graph_explorer/graph_layout.rs; here it is a tested
            # server component and the UI just renders coordinates)
            from .graph_layout import build_layout

            g = self.models.graph_json(int(msg["model_id"]))
            for key in msg.get("subgraph_path", ()):
                oid, attr = key
                op = next(o for o in g["ops"] if o["id"] == int(oid))
                g = op["subgraphs"][attr]
            return {"type": "graph_layout", "model_id": msg["model_id"],
                    "layout": build_layout(
                        g, max_ops=msg.get("max_ops"))}
        if t == P.GET_STORED_TENSOR:
            entry = self.models.get(int(msg["model_id"]))
            arr = entry.model.graph.store.get_numeric(msg["name"]).numpy()
            if msg.get("abbreviated", True):
                return {"type": P.STORED_TENSOR, "name": msg["name"],
                        "tensor": P.AbbreviatedTensor.from_array(arr).__dict__}
            return {"type": P.STORED_TENSOR, "name": msg["name"],
                    "tensor": P.encode_tensor(arr)}
        if t == "get_tensor_slice":
            # exact-value N-D slicing for the UI inspect windows
            # (reference inspect_windows.rs value tables): `fix` pins an
            # index per axis; nulls mark the (up to 2) display axes.
            entry = self.models.get(int(msg["model_id"]))
            arr = entry.model.graph.store.get_numeric(msg["name"]).numpy()
            a = np.asarray(arr)
            af = a.astype(np.float32, copy=False)
            finite = af[np.isfinite(af)] if af.size else af
            stats = {"min": float(finite.min()) if finite.size else 0.0,
                     "max": float(finite.max()) if finite.size else 0.0,
                     "mean": float(finite.mean()) if finite.size else 0.0,
                     "std": float(finite.std()) if finite.size else 0.0,
                     "nan": int(np.isnan(af).sum()) if af.size else 0}
            fix = msg.get("fix") or [None] * a.ndim
            if len(fix) != a.ndim:
                raise ValueError(f"fix has {len(fix)} entries for a "
                                 f"{a.ndim}-d tensor")
            free = [d for d, v in enumerate(fix) if v is None]
            if len(free) > 2:       # display the trailing two free axes
                for d in free[:-2]:
                    fix[d] = 0
                free = free[-2:]
            idx = tuple(slice(None) if v is None else
                        int(v) % max(int(a.shape[d]), 1)
                        for d, v in enumerate(fix))
            sl = np.atleast_2d(af[idx])     # 0 free axes -> (1,1); 1 -> (1,N)
            ro = min(max(int(msg.get("row_off", 0)), 0), max(sl.shape[0] - 1, 0))
            co = min(max(int(msg.get("col_off", 0)), 0), max(sl.shape[1] - 1, 0))
            mr = min(int(msg.get("max_rows", 64)), 512)
            mc = min(int(msg.get("max_cols", 64)), 512)
            view = sl[ro:ro + mr, co:co + mc]
            return {"type": "tensor_slice", "name": msg["name"],
                    "shape": list(a.shape), "dtype": str(a.dtype),
                    "slice_shape": list(sl.shape),
                    "row_off": ro, "col_off": co,
                    "free_axes": free, "fix": fix,
                    "values": [[(None if not np.isfinite(v) else
                                 round(float(v), 6)) for v in row]
                               for row in view],
                    "stats": stats}
        if t == P.CANCEL_REQUEST:
            jid = int(msg["job"])
            batched = self._batch_jobs.get(jid)
            if batched is not None:
                bat, fut = batched
                ok = bat.cancel(fut)
            else:
                ok = self.scheduler.cancel(jid)
            return {"type": "cancel_ack", "job": msg["job"], "ok": ok}
        if t == P.UPDATE_OBSERVER_SETTINGS:
            ok = self.scheduler.update_settings(int(msg["job"]),
                                                **msg.get("settings", {}))
            return {"type": "settings_ack", "job": msg["job"], "ok": ok}
        if t == P.COMPILE_MODEL:
            # pre-trace + jit-compile the decode program so the first
            # generate call is warm (reference: CompileModel message)
            entry = self.models.get(int(msg["model_id"]))
            iface_cfg = entry.interfaces.get("text")
            if iface_cfg is None:
                raise ValueError("model has no text interface to compile")
            import time as _time
            t0 = _time.time()
            iface = self._text_iface(entry)
            B = int(msg.get("batch", 1))
            n_new = int(msg.get("max_new_tokens", 32))
            import numpy as _np
            iface.generate_tokens(_np.zeros((B, 8), dtype=_np.int64), n_new)
            entry.meta["compiled"] = True
            return {"type": P.MODEL_COMPILED, "model_id": msg["model_id"],
                    "seconds": round(_time.time() - t0, 2)}
        if t == P.GET_TOKENIZER:
            entry = self.models.get(int(msg["model_id"]))
            src = entry.tokenizer_source
            if not src:
                raise ValueError("model has no tokenizer source")
            import os as _os
            path = (src if _os.path.isfile(src)
                    else _os.path.join(src, "tokenizer.json"))
            with open(path, encoding="utf-8") as f:
                return {"type": P.TOKENIZER_FILE,
                        "model_id": msg["model_id"], "json": f.read()}
        if t == "start_profiler":
            # device-level timing for compiled programs (SURVEY §5 "JAX
            # profiler traces"); view with tensorboard/xprof
            import jax

            pdir = msg.get("dir") or os.environ.get("WT_PROFILE_DIR",
                                                    "/tmp/wt_profile")
            jax.profiler.start_trace(pdir)
            self._profile_dir = pdir
            return {"type": "profiler_ack", "started": True, "dir": pdir}
        if t == "stop_profiler":
            import jax

            jax.profiler.stop_trace()
            return {"type": "profiler_ack", "started": False,
                    "dir": getattr(self, "_profile_dir", None)}
        if t == P.GENERATE_TEXT:
            return self._generate_text(msg)
        if t == P.GENERATE_IMAGE:
            return self._generate_image(msg)
        if t == "load_adapter":
            return self._load_adapter(msg)
        if t == "generate_multimodal":
            return self._generate_multimodal(msg)
        if t == "generate_speech":
            return self._generate_speech(msg)
        if t == "transcribe":
            return self._transcribe(msg)
        if t == "transcribe_stream":
            return self._transcribe_stream(msg)
        if t == "get_op_milli":
            return self._get_op_milli(msg)
        if t == "get_super_graph":
            return self._get_super_graph(msg)
        if t == P.SUPER_GRAPH_REQUEST:
            return self._super_graph_request(msg)
        raise ValueError(f"unknown message type {t!r}")

    def _get_super_graph(self, msg) -> dict:
        """The SuperGraph-level view of a loaded text model: the full
        tokenize -> prefill -> Scan(decode) -> detokenize job as JSON,
        with nested Scan bodies included — the top layer of the
        reference UI's SuperGraph -> Symbolic -> Milli navigation
        (crates/whisper-tensor-ui/src/graph_explorer/)."""
        from ..super_graph.llm import build_llm_supergraph

        entry = self.models.get(int(msg["model_id"]))
        cfg = entry.interfaces.get("text")
        if cfg is None:
            raise ValueError("model has no text interface")
        sg = build_llm_supergraph(
            entry.name, entry.tokenizer_source or "bytes",
            n_layers=int(cfg["n_layers"]),
            n_kv_heads=int(cfg["n_kv_heads"]), max_len=int(cfg["max_len"]),
            head_dim=int(cfg["head_dim"]),
            n_new=int(msg.get("n_new", 16)))
        return {"type": "super_graph", "model_id": int(msg["model_id"]),
                "graph": sg.to_json()}

    def _get_op_milli(self, msg) -> dict:
        """Lower ONE symbolic op to its milli ops (the nested
        symbolic->milli graph navigation of the reference UI,
        crates/whisper-tensor-ui/src/graph_explorer/)."""
        from ..milli.ir import MilliGraph
        from ..symbolic_graph.ops.base import LowerCtx

        entry = self.models.get(int(msg["model_id"]))
        g = entry.model.graph
        sop = next((o for o in g.ops if o.id == int(msg["op_id"])), None)
        if sop is None:
            raise ValueError(f"no op {msg['op_id']}")
        milli = MilliGraph(f"op:{sop.op.OP_TYPE}")
        ctx = LowerCtx(milli)
        in_ids = [milli.add_input(g.tensors[i].name) if i is not None
                  else None for i in sop.inputs]
        outs = sop.op.lower(ctx, in_ids, len(sop.outputs))
        for k, o in enumerate(outs):
            name = (g.tensors[sop.outputs[k]].name
                    if sop.outputs[k] is not None else f"o{k}")
            milli.mark_output(name, o)
        nodes = []
        for node in milli.nodes:
            import dataclasses

            params = {}
            if dataclasses.is_dataclass(node.op):
                for f in dataclasses.fields(node.op):
                    v = getattr(node.op, f.name)
                    if isinstance(v, np.ndarray):
                        v = f"ndarray{list(v.shape)}"
                    params[f.name] = v
            nodes.append({"kind": node.op.KIND, "params": params,
                          "inputs": node.inputs, "outputs": node.outputs})
        return {"type": "op_milli", "op_id": sop.id,
                "op_type": sop.op.OP_TYPE,
                "inputs": {n: tid for n, tid in milli.inputs.items()},
                "outputs": {n: tid for n, tid in milli.outputs.items()},
                "nodes": nodes}

    def _generate_speech(self, msg) -> dict:
        """TTS: text -> WAV bytes (reference UI's audio-out tab)."""
        import base64

        from ..interfaces.tts import TextToSpeechInterface
        from ..utils.audio import wav_bytes

        entry = self.models.get(int(msg["model_id"]))
        bundle = self.models.bundle(int(entry.meta["bundle_id"]))
        if "tts" not in bundle.interfaces:
            raise ValueError("model has no TTS interface")
        iface = TextToSpeechInterface.from_bundle(bundle)
        voice = int(msg.get("voice", 0))
        settings = ObserverSettings()

        def job(obs):
            clip = iface.run_text_to_audio(msg["text"], voice=voice)
            return {"wav_b64": base64.b64encode(
                wav_bytes(clip.samples, clip.sample_rate)).decode(),
                "sample_rate": clip.sample_rate,
                "seconds": round(len(clip.samples) / clip.sample_rate, 3)}

        self.scheduler.submit(job, settings)
        return None

    def _load_adapter(self, msg) -> dict:
        """Dynamically add a PEFT adapter to a served ragged model
        (vLLM-style runtime LoRA loading): the current batcher DRAINS
        in the background (in-flight requests finish on it) while new
        requests immediately build a replacement batcher carrying the
        extended adapter set."""
        import threading as _threading

        from ..importers.lora import load_peft_adapter_arrays

        entry = self.models.get(int(msg["model_id"]))
        cfg = entry.interfaces.get("text") or {}
        if not cfg.get("ragged"):
            raise ValueError("load_adapter needs a ragged-decode "
                             "(batcher-served) model")
        if not cfg.get("weight_map"):
            raise ValueError("this model family has no weight map for "
                             "adapter serving")
        name, path = str(msg["name"]), str(msg["path"])
        old_ads = dict(cfg.get("adapters") or {})
        if name in old_ads:
            raise ValueError(f"adapter {name!r} already loaded")
        # fail-fast name/shape resolution, then build the REPLACEMENT
        # batcher eagerly (install_adapters runs in its constructor) —
        # only a fully working batcher touches the registry, so a bad
        # adapter can't wedge the model
        load_peft_adapter_arrays(path, cfg["weight_map"])
        cfg["adapters"] = {**old_ads, name: path}
        try:
            new_bat = self._make_batcher(entry)
        except Exception:
            cfg["adapters"] = old_ads
            raise
        with self._cache_lock:
            old = self._batchers.pop(entry.id, None)
            self._batchers[entry.id] = new_bat.start()
        if old is not None:
            _threading.Thread(target=old.drain, daemon=True).start()
        return {"type": "adapter_loaded", "model_id": entry.id,
                "name": name, "adapters": sorted(cfg["adapters"])}

    def _sampling_from_msg(self, msg):
        """Message sampling knobs -> SamplingParams (None = greedy)."""
        if (float(msg.get("temperature", 0.0)) <= 0.0
                and float(msg.get("repetition_penalty", 1.0)) == 1.0
                and float(msg.get("presence_penalty", 0.0)) == 0.0
                and float(msg.get("frequency_penalty", 0.0)) == 0.0):
            return None
        from ..interfaces.text import SamplingParams

        # temperature defaults to 0 here: a penalties-only message must
        # stay penalized-GREEDY, not silently sample at 1.0 (mirrors
        # the generate_text path)
        return SamplingParams(
            temperature=max(float(msg.get("temperature", 0.0)), 0.0),
            top_k=int(msg.get("top_k", 0)),
            top_p=float(msg.get("top_p", 1.0)),
            min_p=float(msg.get("min_p", 0.0)),
            repetition_penalty=float(msg.get("repetition_penalty", 1.0)),
            presence_penalty=float(msg.get("presence_penalty", 0.0)),
            frequency_penalty=float(msg.get("frequency_penalty", 0.0)),
            seed=int(msg.get("seed", 0)))

    def _rnn_iface(self, entry):
        """Cached RnnTextInterface for constant-state (RWKV) models."""
        with self._cache_lock:
            iface = self._text_ifaces.get(("rnn", entry.id))
            if iface is None:
                from ..interfaces.rnn_text import RnnTextInterface

                iface = RnnTextInterface(entry.model)
                self._text_ifaces[("rnn", entry.id)] = iface
            return iface

    def _mm_iface(self, entry):
        """Cached MultimodalLanguageInterface + spec for a llava-style
        bundle (one per bundle; shares the text entry's interface)."""
        from ..interfaces.multimodal import MultimodalLanguageInterface

        bid = int(entry.meta["bundle_id"])
        bundle = self.models.bundle(bid)
        if "multimodal" not in bundle.interfaces:
            raise ValueError("model has no multimodal interface")
        spec = bundle.interfaces["multimodal"]
        with self._cache_lock:
            mm = self._mm_ifaces.get(bid)
            if mm is None:
                text_entry = next(
                    e for e in self.models._models.values()
                    if e.name == spec["model"]
                    and int(e.meta.get("bundle_id", -1)) == bid)
                mm = MultimodalLanguageInterface(
                    self._text_iface(text_entry),
                    embed_weight_name=spec["embed_weight"],
                    vision_encoder=bundle.models[spec["vision"]])
                self._mm_ifaces[bid] = mm
            return mm, spec

    def _mm_items(self, spec, items):
        """Wire items [{text}|{image_b64 PNG}|{rgb_b64+width+height}]
        -> MultimodalItem list; images resize to the vision encoder's
        square input."""
        import base64

        from ..super_graph.links import Image as ImageLink, MultimodalItem
        from ..utils.image import png_to_array, resize_bilinear

        size = int(spec.get("image_size", 224))

        def _fit(px):
            if px.ndim == 2:
                px = px[:, :, None]
            if px.shape[2] == 2:     # PNG color type 4: gray + alpha
                px = px[:, :, :1]
            if px.shape[2] == 1:
                px = np.repeat(px, 3, axis=2)
            if px.shape[2] == 4:
                px = px[:, :, :3]
            if px.shape[:2] != (size, size):
                px = resize_bilinear(px, size, size)
            return px

        out = []
        for it in items:
            if it.get("text"):
                out.append(MultimodalItem(text=it["text"]))
            elif it.get("image_b64"):
                px = png_to_array(base64.b64decode(it["image_b64"]))
                out.append(MultimodalItem(image=ImageLink(_fit(px))))
            elif it.get("rgb_b64"):
                raw = base64.b64decode(it["rgb_b64"])
                px = np.frombuffer(raw, np.uint8).reshape(
                    int(it["height"]), int(it["width"]), 3)
                out.append(MultimodalItem(image=ImageLink(_fit(px))))
            else:
                raise ValueError("item needs text, image_b64, or rgb_b64")
        if not out:
            raise ValueError("no items")
        return out

    def _generate_multimodal(self, msg) -> dict:
        """LLaVA-style interleaved image+text generation through the
        TRUE inputs_embeds prefill (reference
        MultimodalLanguageInterface, src/interfaces.rs:185-327)."""
        entry = self.models.get(int(msg["model_id"]))
        mm, spec = self._mm_iface(entry)
        if mm.text.tokenizer is None:
            from ..tokenizer import AnyTokenizer

            mm.text.tokenizer = AnyTokenizer.load(
                entry.tokenizer_source or "bytes")
        items = self._mm_items(spec, msg.get("items") or [])
        n_new = int(msg.get("max_new_tokens", 32))
        sampling = self._sampling_from_msg(msg)
        settings = ObserverSettings()

        def job(obs):
            return {"text": mm.run_items_in_string_out(
                items, n_new, sampling=sampling)}

        self.scheduler.submit(job, settings)
        return None

    def _stt_iface(self, entry):
        """Cached SpeechToTextInterface per model entry: the compiled
        decode scan and the decoder's device weights live on the
        instance, so building one per request would re-trace, re-jit
        and re-upload on every transcription call."""
        with self._cache_lock:
            iface = self._stt_ifaces.get(entry.id)
            if iface is None:
                from ..interfaces.stt import SpeechToTextInterface

                bundle = self.models.bundle(int(entry.meta["bundle_id"]))
                if "stt" not in bundle.interfaces:
                    raise ValueError("model has no STT interface")
                tok = None
                if entry.tokenizer_source:
                    from ..tokenizer import AnyTokenizer

                    tok = AnyTokenizer.load(entry.tokenizer_source)
                iface = SpeechToTextInterface.from_bundle(bundle,
                                                          tokenizer=tok)
                self._stt_ifaces[entry.id] = iface
            return iface

    def _transcribe(self, msg) -> dict:
        """STT: f32 samples -> text (reference UI's audio-in tab)."""
        import base64

        from ..super_graph.links import AudioClip

        entry = self.models.get(int(msg["model_id"]))
        iface = self._stt_iface(entry)
        if msg.get("language") or msg.get("task"):
            # per-request SOT override on a shallow copy: program and
            # device-weight caches (dict attrs) stay shared with the
            # cached instance, only the sot_sequence attribute differs
            import copy

            sot = iface.sot_with(language=msg.get("language") or None,
                                 task=msg.get("task") or None)
            iface = copy.copy(iface)
            iface.sot_sequence = sot
        samples = np.frombuffer(base64.b64decode(msg["samples_b64"]),
                                dtype=np.float32)
        clip = AudioClip(samples, int(msg.get("sample_rate", 16000)))
        settings = ObserverSettings()

        def job(obs):
            beam = int(msg.get("beam", 1))
            max_new = int(msg.get("max_new_tokens", 64))
            if beam > 1:
                if iface.tokenizer is None:
                    raise ValueError("no tokenizer configured for "
                                     "text output")
                toks = iface.transcribe_beam(clip, max_new=max_new,
                                             beam=beam)
                return {"text": iface.tokenizer.decode(toks)}
            return {"text": iface.run_audio_in_text_out(clip,
                                                        max_new=max_new)}

        self.scheduler.submit(job, settings)
        return None

    def _transcribe_stream(self, msg) -> dict:
        """Streaming STT: feed audio chunks under a stream_id, text
        comes back as it stabilizes (LocalAgreement-2; conservative
        window-boundary commits with local_agreement=null). `final`
        flushes and closes the stream. Synchronous per message —
        partials return in the reply, not via the report pump."""
        import base64

        from ..interfaces.stt import StreamingTranscriber

        sid = str(msg.get("stream_id", "default"))
        st = self._stt_streams.get(sid)
        if st is None:
            entry = self.models.get(int(msg["model_id"]))
            iface = self._stt_iface(entry)
            if msg.get("language") or msg.get("task"):
                import copy

                sot = iface.sot_with(language=msg.get("language") or None,
                                     task=msg.get("task") or None)
                iface = copy.copy(iface)
                iface.sot_sequence = sot
            agreement = msg.get("local_agreement", 2)
            st = StreamingTranscriber(
                iface, local_agreement=agreement,
                max_new_per_window=int(msg.get("max_new_tokens", 224)))
            self._stt_streams[sid] = st
        new = []
        if msg.get("samples_b64") is not None:
            # an empty chunk still re-decodes the buffer (it advances
            # the LocalAgreement hypothesis window)
            samples = np.frombuffer(base64.b64decode(msg["samples_b64"]),
                                    dtype=np.float32)
            new = st.feed(samples, int(msg.get("sample_rate", 16000)))
        final = bool(msg.get("final"))
        if final:
            new = new + st.flush()
            self._stt_streams.pop(sid, None)
        tok = st.iface.tokenizer
        return {"type": "transcribe_stream_update", "stream_id": sid,
                "tokens": [int(x) for x in new],
                "text": (tok.decode(new) if tok is not None else None),
                "pending": (tok.decode(st.pending)
                            if tok is not None and not final else ""),
                "final": final}

    def _text_iface(self, entry):
        with self._cache_lock:
            iface = self._text_ifaces.get(entry.id)
            if iface is None:
                from ..dtype import DType
                from ..interfaces.text import TextInferenceInterface

                cfg = entry.interfaces["text"]
                window_models = None
                wins = cfg.get("windows") or {}
                if wins:
                    by_name = {e.name: e.model
                               for e in self.models._models.values()}
                    window_models = {int(w): by_name[mn]
                                     for w, mn in wins.items()
                                     if mn in by_name}
                iface = TextInferenceInterface(
                    entry.model,
                    max_len=int(cfg["max_len"]),
                    cache_dtype=DType.BF16,
                    window_models=window_models,
                    eos_token_id=cfg.get("eos_token_id"),
                    quantize=cfg.get("quantize") or None)
                self._text_ifaces[entry.id] = iface
            return iface

    def _score_iface(self, entry):
        """Interface for teacher-forced scoring (logprobs / echo /
        best_of / embeddings). Batcher-served models reuse the
        batcher's own interface — its weights are already on device;
        building a second TextInferenceInterface would upload a full
        duplicate copy of the model into HBM."""
        if (entry.interfaces.get("text") or {}).get("ragged"):
            return self._batcher(entry).iface
        return self._text_iface(entry)

    def _batcher(self, entry):
        """Shared ContinuousBatcher for ragged-decode models: concurrent
        generate_text requests batch into one decode program instead of
        serializing through the job worker."""
        with self._cache_lock:
            bat = self._batchers.get(entry.id)
            if bat is None:
                bat = self._make_batcher(entry).start()
                self._batchers[entry.id] = bat
            return bat

    def _make_batcher(self, entry):
        """Construct (not start) a ContinuousBatcher from the entry's
        text spec — install_adapters runs here, so invalid adapter
        sets fail at construction, before any registry mutation."""
        from ..dtype import DType
        from .batching import ContinuousBatcher

        cfg = entry.interfaces["text"]
        pc = cfg.get("prefill_chunk")
        adapters = None
        if cfg.get("adapters"):
            # multi-LoRA serving: resolve each PEFT dir against the
            # recipe's weight map into per-weight (A, B, scale)
            from ..importers.lora import load_peft_adapter_arrays

            adapters = {
                aname: load_peft_adapter_arrays(apath, cfg["weight_map"])
                for aname, apath in cfg["adapters"].items()}
        return ContinuousBatcher(
            entry.model, max_len=int(cfg["max_len"]),
            max_batch=int(cfg.get("max_batch", 8)),
            chunk=int(cfg.get("chunk", 16)),
            chunk_max=(int(cfg["chunk_max"]) if cfg.get("chunk_max")
                       else None),
            admit_coalesce_s=float(cfg.get("admit_coalesce_s", 0.05)),
            auto_prefix=int(cfg.get("auto_prefix", 0) or 0),
            cache_dtype=DType.BF16,
            prefill_chunk=int(pc) if pc else None,
            quantize=cfg.get("quantize") or None,
            eos_token_id=cfg.get("eos_token_id"),
            adapters=adapters)

    def _generate_text_ragged(self, msg, entry, tok, n_new,
                              sampling=None) -> None:
        import numpy as _np

        bat = self._batcher(entry)
        ids = _np.asarray(tok.encode(msg["prompt"]), dtype=_np.int64)
        adapter = msg.get("adapter") or None
        if adapter is not None and \
                adapter not in bat.iface.adapter_slots:
            # validate BEFORE reporting JOB_ACCEPTED: a submit() raise
            # after acceptance would strand the job in the UI forever
            raise ValueError(
                f"unknown adapter {adapter!r} (loaded: "
                f"{[n for n in bat.iface.adapter_slots if n]})")
        job_id = next(self.scheduler._next)
        self.scheduler.reports.put({"type": P.JOB_ACCEPTED, "job": job_id})
        stops = [s for s in (msg.get("stop") or []) if s]
        # incremental detokenization: on_tok runs on the batcher's
        # single scheduler thread, so per-token work must stay O(1) —
        # a full decode of the accumulated list per token is O(n^2)
        # and stalls every other slot in the batch
        from ..tokenizer import IncrementalDecoder

        dec = IncrementalDecoder(tok) if stops else None
        max_stop = max((len(s) for s in stops), default=0)
        state = {"hit": None, "fut": None, "prev": 0}

        def on_tok(t):
            self.scheduler.reports.put({"type": P.PROGRESS, "job": job_id,
                                        "token": int(t)})
            if stops and state["hit"] is None:
                dec.push(int(t))
                # a stop can only newly appear within max_stop chars of
                # the previous end — search that window, not all text
                start = max(0, state["prev"] - max_stop)
                ctx = dec.text_from(start)
                state["prev"] = dec.length
                best = None
                for s in stops:
                    i = ctx.find(s)
                    if i >= 0 and (best is None or start + i < best):
                        best = start + i
                if best is not None:
                    state["hit"] = dec.text[:best]
                    # a hit also stops the row on the device — the
                    # batcher frees the slot instead of decoding
                    # the remaining budget (state["fut"] can lag
                    # the first streamed token by one race window;
                    # the result is trimmed either way)
                    if state["fut"] is not None:
                        bat.cancel(state["fut"])
                    return

        fut = bat.submit(ids, n_new, on_token=on_tok, sampling=sampling,
                         adapter=adapter)
        state["fut"] = fut
        if state["hit"] is not None:       # hit during the race window
            bat.cancel(fut)
        self._batch_jobs[job_id] = (bat, fut)

        def done(f):
            self._batch_jobs.pop(job_id, None)
            try:
                toks = [int(x) for x in f.result()]
                if bat.eos_token_ids:
                    hits = [toks.index(e) for e in bat.eos_token_ids
                            if e in toks]
                    if hits:
                        toks = toks[:min(hits)]
                if state["hit"] is not None:
                    text = state["hit"]
                else:
                    text = tok.decode(toks)
                    for s in stops:
                        i = text.find(s)
                        if i >= 0:
                            text = text[:i]
                            break
                self.scheduler.reports.put({"type": P.JOB_RESULT,
                                            "job": job_id,
                                            "result": {"text": text}})
            except Exception as e:  # noqa: BLE001
                self.scheduler.reports.put({"type": P.JOB_ERROR,
                                            "job": job_id,
                                            "error": f"{type(e).__name__}: {e}"})

        fut.add_done_callback(done)

    def _generate_text(self, msg) -> dict:
        entry = self.models.get(int(msg["model_id"]))
        iface_cfg = entry.interfaces.get("text")
        if iface_cfg is None:
            raise ValueError("model has no text interface")
        from ..tokenizer import AnyTokenizer

        tok_src = msg.get("tokenizer") or entry.tokenizer_source or "bytes"
        tok = AnyTokenizer.load(tok_src)
        if msg.get("messages") and not msg.get("prompt"):
            # chat form: render the tokenizer's chat template (or the
            # ChatML fallback) into the prompt every path below uses
            from ..tokenizer import apply_chat_template

            msg["prompt"] = apply_chat_template(tok, msg["messages"])
        n_new = int(msg.get("max_new_tokens", 32))
        if iface_cfg.get("rnn_state"):
            # RWKV-style constant-state models: greedy compiled scan
            # (the reference's LLM explorer serves RWKV the same way)
            if float(msg.get("temperature", 0.0)) > 0.0:
                raise ValueError("rnn models serve greedy decoding "
                                 "only (set temperature 0)")
            iface = self._rnn_iface(entry)
            iface.tokenizer = tok
            stops = [s for s in (msg.get("stop") or []) if s]

            def rnn_job(obs):
                import numpy as _np

                ids = _np.asarray(tok.encode(msg["prompt"]),
                                  dtype=_np.int64)
                toks = iface.generate_tokens(ids[None], n_new)[0]
                text = tok.decode([int(t) for t in toks])
                for s in stops:
                    i = text.find(s)
                    if i >= 0:
                        text = text[:i]
                return {"text": text}

            self.scheduler.submit(rnn_job, ObserverSettings())
            return None
        beams = int(msg.get("num_beams", 1))
        if (msg.get("regex") is not None
                or msg.get("json_schema") is not None) \
                and (beams > 1 or msg.get("draft_model_id") is not None):
            raise ValueError("regex/json_schema constraints are not "
                             "supported with num_beams or draft_model_id")
        if beams > 1:
            iface = self._text_iface(entry)

            def beam_job(obs):
                import numpy as _np

                ids = _np.asarray(tok.encode(msg["prompt"]),
                                  dtype=_np.int64)[None]
                toks = iface.beam_search_tokens(
                    ids, n_new, beam=beams,
                    length_penalty=float(msg.get("length_penalty", 0.0)),
                    eos_token_id=msg.get("eos_token_id"))[0]
                return {"text": tok.decode([int(t) for t in toks])}

            self.scheduler.submit(beam_job, ObserverSettings())
            return None
        if msg.get("draft_model_id") is not None:
            # speculative decoding: a second loaded model drafts token
            # blocks the target verifies (greedy token-exact; sampled
            # distribution-exact — interfaces/speculative.py)
            from ..interfaces.speculative import SpeculativeDecoder
            from ..interfaces.text import SamplingParams

            dentry = self.models.get(int(msg["draft_model_id"]))
            if dentry.interfaces.get("text") is None:
                raise ValueError("draft model has no text interface")
            dkey = (entry.id, dentry.id, int(msg.get("draft_k", 4)))
            dec = self._spec_decoders.get(dkey)
            if dec is None:
                dec = SpeculativeDecoder(self._text_iface(entry),
                                         self._text_iface(dentry),
                                         k=dkey[2])
                # cache the decoder: its jitted draft-verify program is
                # the expensive part, and a fresh instance per request
                # would recompile it every time
                self._spec_decoders[dkey] = dec
            sampling = None
            if float(msg.get("temperature", 0.0)) > 0.0:
                sampling = SamplingParams(
                    temperature=float(msg.get("temperature", 1.0)),
                    top_k=int(msg.get("top_k", 0)),
                    top_p=float(msg.get("top_p", 1.0)),
                    min_p=float(msg.get("min_p", 0.0)),
                    seed=int(msg.get("seed", 0)))

            def spec_job(obs):
                import numpy as _np

                ids = _np.asarray(tok.encode(msg["prompt"]),
                                  dtype=_np.int64)
                toks = dec.generate_tokens(ids, n_new, sampling=sampling)[0]
                return {"text": tok.decode([int(t) for t in toks])}

            self.scheduler.submit(spec_job, ObserverSettings())
            return None
        regex = msg.get("regex")
        json_schema = msg.get("json_schema")
        constrained = regex is not None or json_schema is not None
        sampling = None
        if (float(msg.get("temperature", 0.0)) > 0.0
                or float(msg.get("repetition_penalty", 1.0)) != 1.0
                or float(msg.get("presence_penalty", 0.0)) != 0.0
                or float(msg.get("frequency_penalty", 0.0)) != 0.0):
            from ..interfaces.text import SamplingParams

            sampling = SamplingParams(
                temperature=float(msg.get("temperature", 1.0))
                if float(msg.get("temperature", 0.0)) > 0.0 else 0.0,
                top_k=int(msg.get("top_k", 0)),
                top_p=float(msg.get("top_p", 1.0)),
                min_p=float(msg.get("min_p", 0.0)),
                repetition_penalty=float(msg.get("repetition_penalty", 1.0)),
                presence_penalty=float(msg.get("presence_penalty", 0.0)),
                frequency_penalty=float(msg.get("frequency_penalty", 0.0)),
                seed=int(msg.get("seed", 0)))
        if (iface_cfg.get("ragged") and not constrained
                and not msg.get("with_probs")):
            # sampled requests batch too: every sampling knob is a
            # per-row array inside the shared chunk program. Constrained
            # requests take the direct path (no per-row DFA state), and
            # with_probs needs the direct path's teacher-forced rescore.
            self._generate_text_ragged(msg, entry, tok, n_new,
                                       sampling=sampling)
            return None
        iface = self._text_iface(entry)
        iface.tokenizer = tok
        settings = ObserverSettings(
            tensor_subscriptions=set(msg.get("tensor_subscriptions", [])))

        with_probs = bool(msg.get("with_probs"))

        stops = [s for s in (msg.get("stop") or []) if s]

        def _trim(text):
            for s in stops:
                i = text.find(s)
                if i >= 0:
                    return text[:i]
            return text

        def job(obs):
            import numpy as _np

            if not with_probs:
                return {"text": _trim(iface.run_string_in_string_out(
                    msg["prompt"], n_new, sampling=sampling,
                    regex=regex, json_schema=json_schema))}
            constraint = (iface.compile_constraint(regex, json_schema)
                          if constrained else None)
            ids = _np.asarray(tok.encode(msg["prompt"]), dtype=_np.int64)[None]
            toks = iface.generate_tokens(ids, n_new, sampling=sampling,
                                         constraint=constraint)[0]
            if constraint is not None:
                # the DFA emits its own eos once the pattern completes;
                # trim so text + probability table cover only the match
                eos = _np.nonzero(toks == constraint.eos_token_id)[0]
                if eos.size:
                    toks = toks[:int(eos[0])]
                toks = [int(t) for t in toks]
            elif iface.eos_token_ids:
                eos = _np.nonzero(_np.isin(
                    toks, _np.asarray(iface.eos_token_ids)))[0]
                if eos.size:
                    toks = toks[:int(eos[0])]
                toks = [int(t) for t in toks]
            if stops:
                # trim the token list at the first stop hit so the
                # probability table matches the returned text
                kept, acc = [], ""
                for t in toks:
                    nxt = tok.decode([int(x) for x in kept] + [int(t)])
                    if any(s in nxt for s in stops):
                        break
                    kept.append(int(t))
                    acc = nxt
                toks = kept
                text = _trim(acc)
            else:
                text = tok.decode([int(t) for t in toks])
            # token-probability coloring (reference llm_explorer.rs):
            # one teacher-forced prefill over prompt+generated scores
            # every emitted token under the model — p(tok_i | prefix)
            full = _np.concatenate(
                [ids[0], _np.asarray(toks, dtype=_np.int64)])[None]
            logits = iface.logits(full[:, :-1]).astype(_np.float32)
            start = ids.shape[1] - 1
            token_info = []
            for k, t in enumerate(toks):
                lg = logits[0, start + k]
                lg = lg - lg.max()
                p = float(_np.exp(lg[int(t)]) / _np.exp(lg).sum())
                token_info.append({"id": int(t),
                                   "text": tok.decode([int(t)]),
                                   "p": round(p, 4)})
            return {"text": text, "tokens": token_info}

        job_id = self.scheduler.submit(job, settings)
        return None  # job_accepted is emitted via the report pump (FIFO with reports)

    def _generate_image(self, msg) -> dict:
        """Run an image pipeline bundle (diffusers loader). Returns the
        job id; the result carries raw RGB bytes + dims (canvas-ready)."""
        import base64

        from ..interfaces.image_gen import (ImageGenConfig,
                                            image_interface_from_bundle)

        bid = msg.get("bundle_id")
        if bid is None:
            entry = self.models.get(int(msg["model_id"]))
            bid = entry.meta.get("bundle_id")
        bundle = self.models.bundle(int(bid))
        if "image" not in bundle.interfaces:
            raise ValueError("bundle has no image interface")
        iface = image_interface_from_bundle(bundle)
        spec = bundle.interfaces["image"]
        cfg = ImageGenConfig(
            steps=int(msg.get("steps", 20)),
            guidance_scale=float(msg.get("guidance_scale", 7.5)),
            height=int(msg.get("height", spec.get("height", 512))),
            width=int(msg.get("width", spec.get("width", 512))),
            schedule=("rectified_flow" if spec["pipeline"] in ("sd3", "flux")
                      else "euler"),
            seed=int(msg.get("seed", 0)))
        settings = ObserverSettings(report_progress=True)

        if msg.get("preview") and spec["pipeline"] == "sd":
            # live per-step latent previews (reference sd_explorer.rs):
            # run the INTROSPECTABLE SuperGraph job — each denoise step
            # executes as a node and streams its latents; the observer
            # converts them to small RGB frames ("step_preview").
            from ..super_graph.graph import ExecutionContext
            from ..super_graph.image import build_diffusion_supergraph

            te = bundle.models[spec["text_encoder"]]
            unet = bundle.models[spec["unet"]]
            vae = bundle.models[spec["vae"]]
            sg = build_diffusion_supergraph(
                te.name, unet.name, vae.name, steps=cfg.steps,
                guidance_scale=cfg.guidance_scale,
                latent_channels=spec["latent_channels"],
                latent_hw=(cfg.height // 8, cfg.width // 8),
                seed=cfg.seed,
                prediction_type=spec.get("prediction_type", "epsilon"),
                bos_token_id=spec.get("bos_token_id", 49406),
                eos_token_id=spec.get("eos_token_id", 49407),
                seq_len=spec.get("seq_len", 77))
            ids = iface.encode_prompt(msg.get("prompt", ""))
            nids = iface.encode_prompt(msg.get("negative_prompt", ""))

            def preview_job(obs):
                out_q = obs.out
                job_id = obs.job_id
                orig_assign = obs.on_tensor_assigned

                def on_assign(link_name, value):
                    if link_name == "step_latents":
                        out_q.put({"type": "step_preview", "job": job_id,
                                   **_latent_preview_rgb(value)})
                    orig_assign(link_name, value)

                obs.on_tensor_assigned = on_assign
                ctx = ExecutionContext(
                    models={te.name: te, unet.name: unet, vae.name: vae},
                    backend_mode="xla", observer=obs)
                out = sg.run(ctx, {"prompt_ids": ids, "negative_ids": nids})
                img = out["image"]
                return {"width": img.pixels.shape[1],
                        "height": img.pixels.shape[0],
                        "rgb_b64": base64.b64encode(
                            img.pixels.tobytes()).decode()}

            self.scheduler.submit(preview_job, settings)
            return None

        init = msg.get("init_image")     # {rgb_b64, width, height}
        mask = msg.get("mask_image")
        strength = float(msg.get("strength", 0.6))

        def _decode_rgb(d):
            import numpy as _np

            raw = base64.b64decode(d["rgb_b64"])
            return _np.frombuffer(raw, _np.uint8).reshape(
                int(d["height"]), int(d["width"]), 3)

        def job(obs):
            if init is not None and mask is not None:
                import numpy as _np

                m = _decode_rgb(mask).astype(_np.float32).mean(-1) / 255.0
                img = iface.run_inpaint(
                    msg.get("prompt", ""), _decode_rgb(init), m,
                    negative_prompt=msg.get("negative_prompt", ""),
                    cfg=cfg, observer=obs)
            elif init is not None:
                img = iface.run_img2img(
                    msg.get("prompt", ""), _decode_rgb(init),
                    strength=strength,
                    negative_prompt=msg.get("negative_prompt", ""),
                    cfg=cfg, observer=obs)
            else:
                img = iface.run(msg.get("prompt", ""),
                                msg.get("negative_prompt", ""), cfg,
                                observer=obs)
            return {"width": img.pixels.shape[1],
                    "height": img.pixels.shape[0],
                    "rgb_b64": base64.b64encode(
                        img.pixels.tobytes()).decode()}

        job_id = self.scheduler.submit(job, settings)
        return None  # job_accepted is emitted via the report pump (FIFO with reports)

    def _super_graph_request(self, msg) -> dict:
        graph = SuperGraph.from_json(msg["graph"])
        def decode_value(v):
            if isinstance(v, dict) and "data_b64" in v:
                return P.decode_tensor(v)
            if isinstance(v, dict):  # tensor map
                return {k: decode_value(x) for k, x in v.items()}
            return v

        feeds: Dict[str, Any] = {name: decode_value(v)
                                 for name, v in msg.get("inputs", {}).items()}
        models = {e.name: e.model for e in
                  (self.models.get(int(i)) for i in msg.get("model_ids", []))}
        backend_mode = msg.get("backend_mode", "oracle")
        settings = ObserverSettings(
            tensor_subscriptions=set(msg.get("tensor_subscriptions", [])))

        def job(obs):
            ctx = ExecutionContext(models=models, backend_mode=backend_mode,
                                   observer=obs,
                                   capture_labels=settings.tensor_subscriptions)
            out = graph.run(ctx, feeds)
            return {k: (P.encode_tensor(v) if isinstance(v, np.ndarray) else
                        v if isinstance(v, (str, int, float, bool, list)) else
                        repr(v))
                    for k, v in out.items()}

        job_id = self.scheduler.submit(job, settings)
        return None  # job_accepted is emitted via the report pump (FIFO with reports)

    # -- lifecycle ---------------------------------------------------------------
    async def run(self, host: str = "127.0.0.1", port: int = 3000):
        self._loop = asyncio.get_event_loop()
        self._start_report_pump()
        server = await serve_websocket(self.handle, host, port)
        async with server:
            await server.serve_forever()


def _json_safe(v):
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.ndarray):
        return P.encode_tensor(v)
    return v


def main():
    import argparse

    ap = argparse.ArgumentParser("whisper-tensor-tpu server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=3000)
    args = ap.parse_args()
    asyncio.run(Server().run(args.host, args.port))


if __name__ == "__main__":
    main()
