"""XLA backend: compile a MilliOpGraph into one jitted XLA program.

This is the TPU-native replacement for both the reference's Vulkan
backend (src/backends/vulkan_backend/) and its entire compiler sandbox
(src/compiler/attempts/v1-v10): instead of per-op dispatch or hand-built
JIT kernels, the whole milli graph is traced into a single jaxpr and
compiled by XLA, which performs the fusion/tiling the reference's
v1-v10 attempts were searching for.

Key mechanisms:
  * static propagation — ops whose inputs are all trace-time-known
    (Constant / Shape-of-static / integer arithmetic chains) are folded
    on host during tracing; their values feed ops like Reshape/Slice as
    static shape arguments. This is how ONNX's dynamic-shape idioms
    become static XLA programs.
  * per-op fallback — an op with no to_jax rule (or data-independent
    shape) executes via jax.pure_callback against the numpy oracle
    (reference per-op NDArray fallback, src/numeric_tensor.rs:844-880).
  * graph-partition fallback — if an op's output *shape* is data-
    dependent (NonZero & co), compilation raises and the caller runs the
    oracle interpreter instead.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ...dtype import DType
from ...milli.ir import MilliGraph, MilliNode
from ...tensor_info import Level, TensorInfo

_X64_LOCK = threading.Lock()
_X64_DONE = False


def ensure_x64() -> None:
    """ONNX semantics need i64/f64 fidelity; enable once, process-wide.

    NOTE on precision: f32 matmul/conv fidelity on the MXU (the default
    single-pass bf16 shows ~0.5% error vs the oracle on-chip) is handled
    PER-OP — MatMul (basic.py), Einsum, and the conv family pass
    Precision.HIGHEST only for f32/f64 inputs. Do NOT set the global
    jax_default_matmul_precision="highest" here: it also changes how
    bf16 operands are handled and was measured to cut bf16 decode
    throughput 3.5x (90.9k -> 26.2k tok/s, BENCH r3)."""
    global _X64_DONE
    with _X64_LOCK:
        if not _X64_DONE:
            import jax

            jax.config.update("jax_enable_x64", True)
            _X64_DONE = True


class GraphNotJittable(Exception):
    """Raised when a graph cannot compile (data-dependent shapes etc.);
    callers fall back to the oracle interpreter at graph granularity."""


class CompiledMilliGraph:
    """A jit-compiled milli graph. Call with a feeds dict; returns dict."""

    def __init__(self, graph: MilliGraph, jitted: Callable, input_names: List[str],
                 output_names: List[str], capture_labels: Optional[List[str]] = None):
        self.graph = graph
        self._jitted = jitted
        self.input_names = input_names
        self.output_names = output_names
        self.capture_labels = capture_labels or []

    def __call__(self, feeds: Dict[str, Any]) -> Dict[str, Any]:
        args = [feeds[n] for n in self.input_names]
        outs = self._jitted(*args)
        return dict(zip(self.output_names + self.capture_labels, outs))

    def lower_text(self, feeds: Dict[str, Any]) -> str:
        import jax

        args = [feeds[n] for n in self.input_names]
        return jax.jit(self._jitted.__wrapped__).lower(*args).as_text()  # type: ignore[attr-defined]


_FOLD_BLOCKLIST = {"RandomNormalLike"}
_SHAPE_ONLY_OPS = {"Shape", "SizeOf"}
# Folding is for *small* host-side shape math; never materialize big
# constants on host during tracing.
_FOLD_MAX_ELEMENTS = 1 << 16


def _trace_graph(graph: MilliGraph, input_avals: Dict[str, Tuple[Tuple[int, ...], np.dtype]],
                 static_inputs: Optional[Dict[str, np.ndarray]] = None,
                 capture_tids: Optional[Sequence[int]] = None):
    """Build the traceable python callable for this graph."""
    import jax.numpy as jnp

    static_inputs = static_inputs or {}
    capture_tids = list(capture_tids or [])

    def fn(*args):
        vals: Dict[int, Any] = {}
        statics: Dict[int, np.ndarray] = {}
        for (name, tid), arr in zip(graph.inputs.items(), args):
            vals[tid] = arr
            if name in static_inputs:
                statics[tid] = np.asarray(static_inputs[name])

        def traced(tid: int):
            if tid in vals:
                return vals[tid]
            # lift a folded static to a device constant lazily
            return jnp.asarray(statics[tid])

        for node in graph.nodes:
            in_statics = [statics.get(i) if i is not None else None
                          for i in node.inputs]
            has_none_input = any(i is None for i in node.inputs)
            # 0) shape-only ops fold from traced avals: the shape of a traced
            #    value IS trace-time static even when its data is not.
            if node.op.KIND in _SHAPE_ONLY_OPS and any(s is None for s in in_statics):
                try:
                    dummies = [
                        s if s is not None else (None if i is None else np.broadcast_to(
                            np.zeros((), dtype=np.dtype(vals[i].dtype)), vals[i].shape))
                        for s, i in zip(in_statics, node.inputs)
                    ]
                    folded = node.op.eval([np.asarray(d) for d in dummies])
                    for tid, f in zip(node.outputs, folded):
                        statics[tid] = np.asarray(f)
                    continue
                except Exception:
                    pass
            # 1) host-side constant fold: every present input is static
            if (node.op.KIND not in _FOLD_BLOCKLIST
                    and all(s is not None or i is None
                            for s, i in zip(in_statics, node.inputs))):
                try:
                    folded = node.op.eval([
                        None if s is None else np.asarray(s) for s in in_statics])
                    if all(np.asarray(f).size <= _FOLD_MAX_ELEMENTS for f in folded):
                        for tid, f in zip(node.outputs, folded):
                            statics[tid] = np.asarray(f)
                        continue
                except Exception:
                    pass
            ins = [traced(i) if i is not None else None for i in node.inputs]
            # 2) trace into jax
            try:
                outs = node.op.to_jax(ins, static=in_statics)
            except NotImplementedError:
                outs = _callback_fallback(node, ins, in_statics)
            for tid, o in zip(node.outputs, outs):
                vals[tid] = o

        result = [traced(t) for t in graph.outputs.values()]
        result += [traced(t) for t in capture_tids]
        return tuple(result)

    return fn


def _callbacks_supported() -> bool:
    """pure_callback works on the CPU platform but NOT on the axon TPU
    plugin (no host-callback transport) — and even where TPU callbacks
    exist, a per-step host round-trip inside a compiled program is the
    wrong design. On non-CPU platforms we refuse at COMPILE time so the
    segmented graph-partition fallback (backends/xla/segmented.py) takes
    over; the reference's per-op-fallback contract never fails at
    runtime either (src/numeric_tensor.rs:844-880). Override with
    WT_TPU_CALLBACK=1 on platforms known to support it."""
    import os

    import jax

    if os.environ.get("WT_TPU_CALLBACK") == "1":
        return True
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return True


def _callback_fallback(node: MilliNode, ins: List[Any], in_statics: List[Optional[np.ndarray]]):
    """Run this op on host via pure_callback (needs static output shapes)."""
    import jax
    import jax.numpy as jnp

    if not _callbacks_supported():
        raise GraphNotJittable(
            f"op {node.op.KIND}: needs the host-callback fallback, which is "
            f"unavailable on platform {jax.default_backend()!r}; the graph "
            f"must run through the segmented plan")

    infos: List[TensorInfo] = []
    for x, s in zip(ins, in_statics):
        if s is not None:
            infos.append(TensorInfo.numeric(np.asarray(s)))
        else:
            dt = DType.from_numpy(np.dtype(x.dtype))
            infos.append(TensorInfo.shaped(dt, [int(d) for d in x.shape]))
    try:
        out_infos = node.op.infer(infos)
    except Exception as e:
        raise GraphNotJittable(f"op {node.op.KIND}: no to_jax and infer failed: {e}") from e
    shapes = []
    for oi in out_infos:
        cs = oi.concrete_shape()
        if cs is None:
            raise GraphNotJittable(
                f"op {node.op.KIND}: data-dependent output shape; cannot jit")
        shapes.append(jax.ShapeDtypeStruct(cs, oi.dtype.to_numpy()))

    op = node.op

    def host_fn(*arrs):
        outs = op.eval([np.asarray(a) for a in arrs])
        return tuple(np.asarray(o) for o in outs)

    outs = jax.pure_callback(host_fn, tuple(shapes), *ins, vmap_method="sequential")
    return list(outs)


_COMPILE_CACHE: Dict[Tuple, CompiledMilliGraph] = {}
_CACHE_LOCK = threading.Lock()


def compile_milli(
    graph: MilliGraph,
    example_feeds: Dict[str, Any],
    static_inputs: Optional[Dict[str, np.ndarray]] = None,
    capture_labels: Optional[Sequence[str]] = None,
    donate: Sequence[str] = (),
    device=None,
    in_shardings=None,
    out_shardings=None,
    use_cache: bool = True,
) -> CompiledMilliGraph:
    """Compile `graph` for the shapes/dtypes of `example_feeds`.

    capture_labels: labels of intermediate tensors to additionally return
    (the introspection tap mechanism — selected at compile time so
    unselected taps cost nothing).
    """
    ensure_x64()
    from ...compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    avals = {}
    for name in graph.inputs:
        if name not in example_feeds:
            raise KeyError(f"missing example feed {name!r}")
        a = example_feeds[name]
        avals[name] = (tuple(int(d) for d in np.shape(a)), np.asarray(a).dtype if isinstance(a, np.ndarray) else np.dtype(a.dtype))

    key = None
    if use_cache:
        stat_key = tuple(sorted(
            (n, np.asarray(v).tobytes())
            for n, v in (static_inputs or {}).items()))
        key = (graph.id, tuple(sorted((n, s, str(d)) for n, (s, d) in avals.items())),
               tuple(capture_labels or ()), tuple(donate),
               str(in_shardings), str(out_shardings), stat_key)
        with _CACHE_LOCK:
            if key in _COMPILE_CACHE:
                return _COMPILE_CACHE[key]

    capture_tids: List[int] = []
    cap_names: List[str] = []
    if capture_labels:
        by_label = {t.label: tid for tid, t in graph.tensors.items() if t.label}
        for lbl in capture_labels:
            if lbl in by_label:
                capture_tids.append(by_label[lbl])
                cap_names.append(lbl)

    fn = _trace_graph(graph, avals, static_inputs, capture_tids)

    donate_argnums = tuple(i for i, n in enumerate(graph.inputs) if n in donate)
    jit_kwargs: Dict[str, Any] = {}
    if donate_argnums:
        jit_kwargs["donate_argnums"] = donate_argnums
    if in_shardings is not None:
        jit_kwargs["in_shardings"] = in_shardings
    if out_shardings is not None:
        jit_kwargs["out_shardings"] = out_shardings
    if device is not None:
        jit_kwargs["device"] = device
    jitted = jax.jit(fn, **jit_kwargs)

    compiled = CompiledMilliGraph(graph, jitted, list(graph.inputs), list(graph.outputs),
                                  cap_names)
    # force trace now to surface GraphNotJittable eagerly
    example_args = [example_feeds[n] for n in graph.inputs]
    try:
        jitted.trace(*example_args)  # jax >= 0.4.30
    except GraphNotJittable:
        raise
    except AttributeError:
        pass
    if use_cache and key is not None:
        with _CACHE_LOCK:
            _COMPILE_CACHE[key] = compiled
    return compiled
