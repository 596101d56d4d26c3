"""Segmented execution: compile maximal jittable spans, run the rest on
the oracle.

Reference equivalent: the v9 hybrid ExecutionPlan (src/compiler/attempts/
v9_fused_expr/mod.rs:36-58) — interleave compiled kernels with
interpreted ops for coverage gaps. Needed on TPU because data-dependent-
shape ops (NonZero & co) can never jit, and the axon runtime additionally
has no host-callback escape hatch inside programs.

Plan construction (one host pass, no trial compiles):
  1. propagate trace-time statics (same folding the compiler does);
  2. infer a concrete shape for every tensor from the feeds; tensors
     with un-inferable shapes are "dynamic" — anything touching them
     runs on the oracle;
  3. per remaining node, abstractly trace its to_jax with
     jax.eval_shape; failures go to the oracle;
  4. contiguous jittable runs become compiled sub-graphs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Set, Tuple

import numpy as np

from ...dtype import DType
from ...milli.ir import MilliGraph
from ...tensor_info import TensorInfo
from .compiler import _FOLD_BLOCKLIST, _SHAPE_ONLY_OPS, compile_milli, ensure_x64


def _analyze(graph: MilliGraph, feeds: Dict[str, np.ndarray]):
    """Returns (statics, shapes, oracle_node_indices). shapes[tid] is a
    (shape, dtype) tuple or None when dynamic."""
    import jax

    ensure_x64()
    statics: Dict[int, np.ndarray] = {}
    shapes: Dict[int, Optional[Tuple[Tuple[int, ...], np.dtype]]] = {}
    for name, tid in graph.inputs.items():
        v = feeds[name]
        shapes[tid] = (tuple(int(d) for d in np.shape(v)),
                       np.asarray(v).dtype if isinstance(v, np.ndarray)
                       else np.dtype(v.dtype))
    oracle: Set[int] = set()

    for idx, node in enumerate(graph.nodes):
        in_statics = [statics.get(i) if i is not None else None
                      for i in node.inputs]
        in_shapes = [shapes.get(i) if i is not None else None
                     for i in node.inputs]
        # statics fold (incl. shape-only ops over known shapes)
        try:
            if node.op.KIND in _SHAPE_ONLY_OPS and \
                    all(s is not None or sh is not None
                        for s, sh in zip(in_statics, in_shapes)):
                dummies = [s if s is not None else
                           np.broadcast_to(np.zeros((), dtype=sh[1]), sh[0])
                           for s, sh in zip(in_statics, in_shapes)]
                folded = node.op.eval([np.asarray(d) for d in dummies])
                for tid, f in zip(node.outputs, folded):
                    statics[tid] = np.asarray(f)
                    shapes[tid] = (tuple(np.shape(f)), np.asarray(f).dtype)
                continue
            if node.op.KIND not in _FOLD_BLOCKLIST and \
                    all(s is not None or i is None
                        for s, i in zip(in_statics, node.inputs)):
                folded = node.op.eval([None if s is None else np.asarray(s)
                                       for s in in_statics])
                for tid, f in zip(node.outputs, folded):
                    statics[tid] = np.asarray(f)
                    shapes[tid] = (tuple(np.shape(f)), np.asarray(f).dtype)
                continue
        except Exception:
            pass

        dynamic_input = any(sh is None and i is not None
                            for sh, i in zip(in_shapes, node.inputs))
        out_infos = None
        if not dynamic_input:
            infos = []
            for s, sh, i in zip(in_statics, in_shapes, node.inputs):
                if i is None:
                    infos.append(None)
                elif s is not None:
                    infos.append(TensorInfo.numeric(np.asarray(s)))
                else:
                    infos.append(TensorInfo.shaped(
                        DType.from_numpy(sh[1]), list(sh[0])))
            try:
                out_infos = node.op.infer(infos)
            except Exception:
                out_infos = None

        concrete_outs = []
        if out_infos is not None:
            for oi in out_infos:
                cs = oi.concrete_shape() if oi is not None else None
                concrete_outs.append(None if cs is None
                                     else (cs, oi.dtype.to_numpy()))
        else:
            concrete_outs = [None] * len(node.outputs)

        jittable = not dynamic_input and all(c is not None for c in concrete_outs)
        if jittable:
            # abstract-trace the op itself
            def one(*args):
                ins = list(args)
                full = []
                k = 0
                for i in node.inputs:
                    if i is None:
                        full.append(None)
                    else:
                        full.append(ins[k])
                        k += 1
                return tuple(node.op.to_jax(full, static=in_statics))

            try:
                jax.eval_shape(one, *[jax.ShapeDtypeStruct(sh[0], sh[1])
                                      for sh, i in zip(in_shapes, node.inputs)
                                      if i is not None])
            except Exception:
                jittable = False
        if not jittable:
            oracle.add(idx)
        for tid, c in zip(node.outputs, concrete_outs):
            shapes[tid] = c
    return statics, shapes, oracle


def _slice_graph(graph: MilliGraph, lo: int, hi: int):
    """Sub-graph over nodes[lo:hi]; crossing tensors become named I/O."""
    sub = MilliGraph(f"{graph.name}[{lo}:{hi}]")
    tmap: Dict[int, int] = {}
    in_map: Dict[int, str] = {}
    used_later: Set[int] = set(graph.outputs.values())
    for node in graph.nodes[hi:]:
        used_later.update(i for i in node.inputs if i is not None)
    produced_here: Set[int] = set()
    for node in graph.nodes[lo:hi]:
        ins = []
        for i in node.inputs:
            if i is None:
                ins.append(None)
            elif i in tmap:
                ins.append(tmap[i])
            else:
                name = f"t{i}"
                tmap[i] = sub.add_input(name, graph.tensors[i].info)
                in_map[i] = name
                ins.append(tmap[i])
        outs = sub.add_op(node.op, [0] * 0, n_outputs=len(node.outputs))
        sub.nodes[-1].inputs = ins
        for st, mt in zip(node.outputs, outs):
            tmap[st] = mt
            produced_here.add(st)
    out_map: Dict[str, int] = {}
    for node in graph.nodes[lo:hi]:
        for st in node.outputs:
            if st in used_later and f"t{st}" not in out_map:
                sub.mark_output(f"t{st}", tmap[st])
                out_map[f"t{st}"] = st
    return sub, in_map, out_map


class SegmentedPlan:
    def __init__(self, graph: MilliGraph):
        self.graph = graph
        self.segments: List[Tuple[str, Any]] = []
        self.n_oracle = 0

    @staticmethod
    def build(graph: MilliGraph, feeds: Dict[str, np.ndarray]) -> "SegmentedPlan":
        _, _, oracle = _analyze(graph, feeds)
        plan = SegmentedPlan(graph)
        plan.n_oracle = len(oracle)
        lo = 0
        for idx in sorted(oracle) + [len(graph.nodes)]:
            if idx > lo:
                plan.segments.append(("xla", _slice_graph(graph, lo, idx)))
            if idx < len(graph.nodes):
                plan.segments.append(("oracle", idx))
            lo = idx + 1
        return plan

    def run(self, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        values: Dict[int, Any] = {}
        for name, tid in self.graph.inputs.items():
            values[tid] = feeds[name]
        for kind, payload in self.segments:
            if kind == "oracle":
                node = self.graph.nodes[payload]
                ins = [np.asarray(values[i]) if i is not None else None
                       for i in node.inputs]
                outs = node.op.eval(ins)
                for tid, v in zip(node.outputs, outs):
                    values[tid] = np.asarray(v)
            else:
                sub, in_map, out_map = payload
                sub_feeds = {name: values[tid] for tid, name in in_map.items()}
                compiled = compile_milli(sub, sub_feeds)
                out = compiled(sub_feeds)
                for name, st in out_map.items():
                    values[st] = out[name]
        return {name: np.asarray(values[tid])
                for name, tid in self.graph.outputs.items()}
