"""SuperGraph: serializable heterogeneous job graph + execution.

Reference equivalent: src/super_graph/mod.rs (SuperGraph::run/eval with
greedy data-driven scheduling :105-130; SuperGraphBuilder + validation
:184-203). The ExecutionContext supplies model registry, backend mode,
caches, tokenizers and the observer — the seam where the server's
scheduler plugs in (reference crates/whisper-tensor-server/scheduler.rs).
"""

from __future__ import annotations

import json
import time
from typing import Any, Dict, List, Optional

import numpy as np

from ..graph import new_global_id
from .cache import SuperGraphCache, SuperGraphTensorCache
from .links import LinkKind, SuperLink
from .nodes import SuperNode, node_registry


class SuperObserver:
    """Reference src/super_graph/observer.rs:7-27."""

    def on_node_executed(self, node, ms: float) -> None:
        pass

    def on_tensor_assigned(self, link_name: str, value) -> None:
        pass

    def on_loading_weight(self, name: str) -> None:
        pass

    def on_progress(self, node, fraction: float) -> None:
        pass

    def should_cancel(self) -> bool:
        return False


class ExecutionContext:
    def __init__(self, models: Optional[Dict[str, Any]] = None,
                 tokenizers: Optional[Dict[str, Any]] = None,
                 backend_mode: str = "oracle",
                 observer: Optional[SuperObserver] = None,
                 cache: Optional[SuperGraphCache] = None,
                 tensor_cache: Optional[SuperGraphTensorCache] = None,
                 capture_labels: Optional[set] = None):
        self.models = models or {}
        self.tokenizers = tokenizers or {}
        self.backend_mode = backend_mode
        self.observer = observer or SuperObserver()
        self.cache = cache or SuperGraphCache()
        self.tensor_cache = tensor_cache or SuperGraphTensorCache()
        # intermediate model-tensor names to stream through the observer
        # even when models run compiled (XLA) — selected at compile time
        self.capture_labels = set(capture_labels or ())
        self._backends: Dict[int, Any] = {}

    def run_model(self, model, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        from ..backends.eval_backend import EvalBackend, SymbolicObserver

        be = self._backends.get(model.id)
        if be is None:
            sup = self.observer

            class _Fwd(SymbolicObserver):
                def on_tensor_assigned(self, graph, name, value):
                    sup.on_tensor_assigned(name, value)

                def on_loading_weight(self, name):
                    sup.on_loading_weight(name)

                def should_cancel(self):
                    return sup.should_cancel()

            be = EvalBackend(self.backend_mode, observer=_Fwd(),
                             capture=self.capture_labels)
            self._backends[model.id] = be
        return be.run(model.graph, feeds)

    def get_tokenizer(self, source: str):
        if source in self.tokenizers:
            return self.tokenizers[source]
        from ..tokenizer import AnyTokenizer

        tok = AnyTokenizer.load(source)
        self.tokenizers[source] = tok
        return tok


class SuperGraph:
    def __init__(self, name: str = ""):
        self.id = new_global_id()
        self.name = name
        self.links: Dict[int, SuperLink] = {}
        self.nodes: List[SuperNode] = []
        self.inputs: Dict[str, int] = {}
        self.outputs: Dict[str, int] = {}
        self._next_link = 0

    # -- builder (reference SuperGraphBuilder) ---------------------------
    def link(self, kind: LinkKind, name: Optional[str] = None) -> int:
        lid = self._next_link
        self._next_link += 1
        self.links[lid] = SuperLink(lid, kind, name)
        return lid

    def mark_input(self, name: str, lid: int) -> int:
        self.inputs[name] = lid
        return lid

    def mark_output(self, name: str, lid: int) -> int:
        self.outputs[name] = lid
        return lid

    def add(self, node: SuperNode) -> SuperNode:
        self.nodes.append(node)
        return node

    def validate(self) -> None:
        produced = set(self.inputs.values())
        for n in self.nodes:
            for port, lid in n.inputs.items():
                if lid not in self.links:
                    raise ValueError(f"{n.name}.{port}: unknown link {lid}")
            for port, lid in n.outputs.items():
                if lid in produced:
                    raise ValueError(f"{n.name}.{port}: link {lid} produced twice")
                produced.add(lid)
        for name, lid in self.outputs.items():
            if lid not in produced:
                raise ValueError(f"output {name}: link {lid} never produced")

    # -- execution: greedy data-driven scheduling -------------------------
    def run(self, ctx: ExecutionContext, feeds: Dict[str, Any]) -> Dict[str, Any]:
        values: Dict[int, Any] = {}
        for name, lid in self.inputs.items():
            if name not in feeds:
                raise KeyError(f"missing super-graph input {name!r}")
            values[lid] = feeds[name]
        pending = list(self.nodes)
        while pending:
            progressed = False
            rest = []
            for node in pending:
                if all(lid in values for lid in node.inputs.values()):
                    ins = {port: values[lid] for port, lid in node.inputs.items()}
                    t0 = time.perf_counter()
                    outs = node.execute(ctx, ins)
                    ms = (time.perf_counter() - t0) * 1e3
                    ctx.observer.on_node_executed(node, ms)
                    for port, lid in node.outputs.items():
                        if port not in outs:
                            raise RuntimeError(f"{node.name}: missing output {port!r}")
                        values[lid] = outs[port]
                        link = self.links[lid]
                        if link.name:
                            ctx.observer.on_tensor_assigned(link.name, outs[port])
                    progressed = True
                else:
                    rest.append(node)
            pending = rest
            if not progressed and pending:
                stuck = [n.name for n in pending[:5]]
                raise RuntimeError(f"super graph stuck (missing inputs): {stuck}")
        return {name: values[lid] for name, lid in self.outputs.items()}

    # -- serialization -------------------------------------------------------
    def to_json(self) -> dict:
        return {
            "name": self.name,
            "links": [l.to_json() for l in self.links.values()],
            "nodes": [n.to_json() for n in self.nodes],
            "inputs": self.inputs,
            "outputs": self.outputs,
        }

    def dumps(self) -> str:
        return json.dumps(self.to_json())

    @staticmethod
    def from_json(d: dict) -> "SuperGraph":
        g = SuperGraph(d.get("name", ""))
        for lj in d["links"]:
            link = SuperLink.from_json(lj)
            g.links[link.id] = link
            g._next_link = max(g._next_link, link.id + 1)
        for nj in d["nodes"]:
            g.nodes.append(SuperNode.from_json(nj))
        g.inputs = {k: int(v) for k, v in d["inputs"].items()}
        g.outputs = {k: int(v) for k, v in d["outputs"].items()}
        return g

    @staticmethod
    def loads(s: str) -> "SuperGraph":
        return SuperGraph.from_json(json.loads(s))

    def __repr__(self):
        return (f"SuperGraph({self.name!r}, {len(self.nodes)} nodes, "
                f"{len(self.links)} links)")
