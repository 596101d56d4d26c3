"""Compiler facade: the stable compile-and-run contract.

Reference equivalent: src/compiler/mod.rs:66-163 (CompilationSubject /
build_program / CompiledProgram + interpret_milli_graph / op_census).
Where the reference's facade wraps a pass-through interpreter while its
v1-v10 Cranelift attempts matured, here build_program targets the XLA
backend directly (the "attempt" that subsumed them all) with automatic
fallback to the oracle interpreter for non-jittable graphs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from .backends.xla.compiler import GraphNotJittable, compile_milli
from .milli.ir import MilliGraph
from .model import Model


@dataclass
class CompilationSubject:
    """What to compile: a Model (symbolic graph) or a raw MilliGraph."""

    model: Optional[Model] = None
    milli: Optional[MilliGraph] = None
    capture_labels: List[str] = field(default_factory=list)

    def graph(self) -> MilliGraph:
        if self.milli is not None:
            return self.milli
        milli, weights = self.model.graph.to_milli()
        self._weight_inputs = weights
        return milli


class CompiledProgram:
    """Executable program; `backend` reports which path actually compiled
    ("xla" or "interpreter")."""

    def __init__(self, milli: MilliGraph, weight_feeder: Optional[Callable] = None):
        self.milli = milli
        self.backend = "interpreter"
        self._compiled = None
        self._weight_feeder = weight_feeder
        self.stats: Dict[str, Any] = {"compile_ms": None, "op_count": len(milli.nodes)}

    def run(self, feeds: Dict[str, np.ndarray],
            observer=None) -> Dict[str, np.ndarray]:
        all_feeds = dict(feeds)
        if self._weight_feeder is not None:
            for name in self.milli.inputs:
                if name not in all_feeds:
                    w = self._weight_feeder(name)
                    if w is not None:
                        all_feeds[name] = w
        if self._compiled is None and self.backend != "failed-xla":
            t0 = time.perf_counter()
            try:
                self._compiled = compile_milli(self.milli, all_feeds)
                self.backend = "xla"
                self.stats["compile_ms"] = (time.perf_counter() - t0) * 1e3
            except GraphNotJittable as e:
                self.backend = "failed-xla"
                self.stats["fallback_reason"] = str(e)
        if self._compiled is not None:
            out = self._compiled(all_feeds)
            return {k: np.asarray(v) for k, v in out.items()}
        return self.milli.eval(all_feeds, observer=observer)


def build_program(subject: CompilationSubject) -> CompiledProgram:
    milli = subject.graph()
    feeder = None
    if subject.model is not None:
        store = subject.model.graph.store

        def feeder(name):  # noqa: F811
            if name in store:
                return store.get_numeric(name).numpy()
            return None

    return CompiledProgram(milli, feeder)


def interpret_milli_graph(milli: MilliGraph, feeds: Dict[str, np.ndarray]
                          ) -> Dict[str, np.ndarray]:
    """The validation interpreter (reference compiler/mod.rs:18-33)."""
    return milli.eval(feeds, validate=True)


def op_census(milli: MilliGraph) -> Dict[str, int]:
    return milli.op_census()
