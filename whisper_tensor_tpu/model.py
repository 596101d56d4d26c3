"""Model: a SymbolicGraph + TensorStore + execution convenience.

Reference equivalent: src/model.rs:47-182 (Model::new_from_onnx, eval,
load_tensors, get_input_tensor_info).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

from .backends.eval_backend import EvalBackend, SymbolicObserver
from .graph import new_global_id
from .symbolic_graph.ir import SymbolicGraph, TensorKind
from .tensor_info import TensorInfo


class Model:
    def __init__(self, graph: SymbolicGraph, name: str = ""):
        self.id = new_global_id()
        self.name = name or graph.name
        self.graph = graph
        self._backends: Dict[str, EvalBackend] = {}

    # -- constructors -----------------------------------------------------
    @staticmethod
    def new_from_onnx(data: bytes, base_dir: Optional[str] = None,
                      name: str = "") -> "Model":
        return Model(SymbolicGraph.from_onnx_bytes(data, base_dir), name)

    @staticmethod
    def new_from_onnx_file(path: str, name: str = "") -> "Model":
        with open(path, "rb") as f:
            data = f.read()
        return Model.new_from_onnx(data, base_dir=os.path.dirname(path),
                                   name=name or os.path.basename(path))

    def save_onnx(self, path: str, weights: str = "embed") -> None:
        """Serialize back to ONNX (weights: embed | external | none) —
        the inverse of new_from_onnx, including after graph surgery."""
        self.graph.save_onnx(path, weights=weights)

    # -- execution ----------------------------------------------------------
    def backend(self, mode: str = "oracle", validate: Optional[bool] = None,
                observer: Optional[SymbolicObserver] = None) -> EvalBackend:
        # validate=None defers to EvalBackend's default: validate every
        # assignment on the oracle path (reference eval_backend.rs:230-
        # 270), structural trace-time validation on the XLA path
        key = f"{mode}:{validate}:{id(observer)}"
        if key not in self._backends:
            self._backends[key] = EvalBackend(mode, validate, observer)
        return self._backends[key]

    def eval(self, feeds: Dict[str, np.ndarray], mode: str = "oracle",
             validate: Optional[bool] = None,
             observer: Optional[SymbolicObserver] = None) -> Dict[str, np.ndarray]:
        return self.backend(mode, validate, observer).run(self.graph, feeds)

    def load_tensors(self, mode: str = "xla") -> None:
        """Pre-materialize all weights (device upload for xla mode).

        Reference: Model::load_tensors weight pre-upload via
        ModelLoadedTensorCache (src/model.rs:120+).
        """
        if mode == "xla":
            import jax

            be = self.backend("xla")
            cache = be._weights_device_cache.setdefault(self.graph.id, {})
            for name in self.graph.store.names():
                if name not in cache:
                    cache[name] = jax.device_put(
                        self.graph.store.get_numeric(name).numpy())
        else:
            for name in self.graph.store.names():
                self.graph.store.get(name)

    # -- introspection ------------------------------------------------------
    def input_infos(self) -> Dict[str, Optional[TensorInfo]]:
        return {self.graph.tensors[t].name: self.graph.tensors[t].info
                for t in self.graph.inputs}

    def output_names(self) -> List[str]:
        return [self.graph.tensors[t].name for t in self.graph.outputs]

    def __repr__(self) -> str:
        return f"Model({self.name!r}, {self.graph!r})"
