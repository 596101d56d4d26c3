"""Multimodal language interface: interleaved text/image/embedding inputs.

Reference equivalent: MultimodalLanguageInterface (src/interfaces.rs:185;
item roles :166-183). Real `inputs_embeds` path: graph surgery derives
an embedding-entry variant of the text model's step graph
(symbolic_graph/surgery.py) that SHARES its weights and KV-cache
layout, so fused image/text embeddings run prefill through one compiled
program and hand the caches to the text interface's decode scan —
image information flows through unquantized (the reference feeds fused
embeddings the same way, src/interfaces.rs:236-327).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..dtype import DType
from ..model import Model
from ..super_graph.links import MultimodalItem
from .text import SamplingParams, _bucket, _pick_token


class MultimodalLanguageInterface:
    """Wraps a TextInferenceInterface. Images pass through an optional
    vision-encoder Model (pixels -> "embeddings" (1, n, E)); text
    tokenizes and embeds via the model's own table; the fused (1, S, E)
    sequence prefills through the inputs_embeds program."""

    def __init__(self, text_interface, embed_weight_name: str = "wte",
                 vision_encoder: Optional[Model] = None):
        self.text = text_interface
        self.vision_encoder = vision_encoder
        self.embed_weight_name = embed_weight_name
        self._embeds_milli = None
        self._embeds_weight_names: List[str] = []
        self._prefill_programs: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    def _wte(self) -> np.ndarray:
        return self.text.model.graph.store.get_numeric(
            self.embed_weight_name, self.text.weight_dtype).numpy()

    def embed_items(self, items: List[MultimodalItem]) -> np.ndarray:
        """Fuse items into one (1, S, E) embedding sequence."""
        wte = self._wte()
        parts: List[np.ndarray] = []
        for item in items:
            if item.text is not None:
                if self.text.tokenizer is None:
                    raise ValueError("no tokenizer for text items")
                ids = np.asarray(self.text.tokenizer.encode(item.text))
                parts.append(wte[ids])
            if item.embedding is not None:
                emb = np.asarray(item.embedding, dtype=wte.dtype)
                parts.append(emb.reshape(-1, wte.shape[1]))
            if item.image is not None:
                if self.vision_encoder is None:
                    raise ValueError("no vision encoder configured")
                from ..backends.eval_backend import EvalBackend

                pixels = (item.image.pixels.astype(np.float32) / 127.5) - 1.0
                feeds = {"pixels": np.transpose(pixels, (2, 0, 1))[None]}
                out = EvalBackend("xla").run(self.vision_encoder.graph, feeds)
                parts.append(np.asarray(out["embeddings"], dtype=wte.dtype)
                             .reshape(-1, wte.shape[1]))
        return np.concatenate(parts, axis=0)[None]

    # ------------------------------------------------------------------
    def _ensure_embeds_milli(self):
        if self._embeds_milli is not None:
            return
        from ..symbolic_graph.surgery import replace_ids_with_embeds

        graph = replace_ids_with_embeds(self.text.model.graph)
        milli, weight_inputs = graph.to_milli()
        if self.text._fused:
            # mirror the text interface's fusion so the fused device
            # buffers keep sharing by name
            from ..milli.transforms import fuse_parallel_matmuls

            fuse_parallel_matmuls(milli, set(weight_inputs))
        self._embeds_milli = milli
        self._embeds_weight_names = [n for n in milli.inputs
                                     if n in weight_inputs
                                     or n in self.text._fused]
        self._embeds_cache_ins = [n for n in milli.inputs
                                  if n.startswith("cache_")]
        self._embeds_cache_outs = [n for n in milli.outputs
                                   if n.startswith("new_cache_")]

    def _embeds_weights(self) -> List[Any]:
        """Device weights by name — reusing the text interface's buffers
        (the graphs share one TensorStore; nothing is duplicated)."""
        import jax

        by_name = dict(zip(self.text.weight_names, self.text._weights()))
        out = []
        for n in self._embeds_weight_names:
            if n in by_name:
                out.append(by_name[n])
            else:
                out.append(jax.device_put(self.text._dense_np(n)))
        return out

    def _prefill_program(self, batch: int, bucket: int):
        import jax
        import jax.numpy as jnp

        key = (batch, bucket)
        if key in self._prefill_programs:
            return self._prefill_programs[key]
        from ..backends.xla.compiler import _trace_graph, ensure_x64

        ensure_x64()
        self._ensure_embeds_milli()
        milli = self._embeds_milli
        fn = _trace_graph(milli, {})
        order = list(milli.inputs)
        weight_names = self._embeds_weight_names
        cache_ins = self._embeds_cache_ins
        cache_outs = self._embeds_cache_outs
        out_names = list(milli.outputs)

        def prefill(embeds, caches, weights):
            by_name = {"inputs_embeds": embeds,
                       "pos": jnp.asarray(0, dtype=jnp.int64)}
            by_name.update(dict(zip(cache_ins, caches)))
            by_name.update(dict(zip(weight_names, weights)))
            outs = fn(*[by_name[n] for n in order])
            named = dict(zip(out_names, outs))
            return named["logits"], [named[n] for n in cache_outs]

        jitted = jax.jit(prefill, donate_argnums=(1,))
        self._prefill_programs[key] = jitted
        return jitted

    # ------------------------------------------------------------------
    def generate_from_embeds(self, embeds: np.ndarray, n_new: int,
                             sampling: Optional[SamplingParams] = None
                             ) -> np.ndarray:
        """(B, L, E) fused embeddings -> (B, n_new) generated ids, via
        the embeds-prefill program + the text decode scan."""
        import jax
        import jax.numpy as jnp

        embeds = np.asarray(embeds)
        if embeds.ndim == 2:
            embeds = embeds[None]
        B, L, E = embeds.shape
        Sb = _bucket(L, self.text.prompt_buckets)
        np_dt = self.text.weight_dtype.to_numpy()
        padded = np.zeros((B, Sb, E), dtype=np_dt)
        padded[:, :L] = embeds.astype(np_dt)
        caches = self.text.fresh_cache(B)
        prog = self._prefill_program(B, Sb)
        logits, caches = prog(jnp.asarray(padded), caches,
                              self._embeds_weights())
        rng = jax.random.PRNGKey(sampling.seed if sampling else 0)
        first = _pick_token(logits[:, L - 1, :],
                            jax.random.fold_in(rng, 0), sampling)
        return self.text.decode_tokens(np.asarray(first), L, caches, n_new,
                                       sampling=sampling)

    def run_items_in_string_out(self, items: List[MultimodalItem],
                                n_new: int = 32,
                                sampling: Optional[SamplingParams] = None
                                ) -> str:
        """Generation conditioned on the fused sequence through the TRUE
        inputs_embeds path (no token requantization)."""
        embeds = self.embed_items(items)
        toks = self.generate_from_embeds(embeds, n_new, sampling=sampling)[0]
        if self.text.tokenizer is None:
            return " ".join(str(t) for t in toks)
        return self.text.tokenizer.decode([int(t) for t in toks])

    # ------------------------------------------------------------------
    def run_items_nearest_token(self, items: List[MultimodalItem],
                                n_new: int = 32) -> str:
        """Explicit lossy fallback: re-quantize embeddings to their
        nearest vocab tokens and run the plain token path. Only exact
        for text-only item lists; kept for models whose step graph
        cannot take surgery (control-flow entries)."""
        embeds = self.embed_items(items)
        wte = self._wte()
        flat = embeds[0].astype(np.float32)
        w32 = wte.astype(np.float32)
        norms = (w32 ** 2).sum(-1)
        ids = np.argmax(flat @ w32.T - 0.5 * norms[None, :], axis=-1)
        toks = self.text.generate_tokens(ids[None].astype(np.int64), n_new)[0]
        if self.text.tokenizer is None:
            return " ".join(str(t) for t in toks)
        return self.text.tokenizer.decode([int(t) for t in toks])
