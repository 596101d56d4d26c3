"""Milli-graph transformation passes.

quantize_matmul_weights: swap MatMul(x, W) -> QuantMatMul(x, W_i8, scale)
for 2-D weight inputs — the int8 weight-compression pass feeding the
fused dequant-matmul Pallas kernel (TPU equivalent of the reference's
QuantMatMul execution path for GGUF weights).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..tensor_info import Level, TensorInfo
from .ir import MilliGraph, MilliOp


@dataclass
class QuantMatMulMilli(MilliOp):
    """x (…,K) float, w_i8 (K,N) int8, scale (N,) f32 -> (…,N) in x.dtype."""

    KIND = "QuantMatMul"

    def eval(self, inputs):
        x, w_i8, scale = inputs
        xf = x.astype(np.float32)
        out = (xf @ w_i8.astype(np.float32)) * scale[None, :].astype(np.float32)
        return [out.astype(x.dtype)]

    def to_jax(self, inputs, static=None):
        from ..backends.pallas.quant_matmul import int8_matmul

        x, w_i8, scale = inputs
        return [int8_matmul(x, w_i8, scale)]

    def infer(self, infos):
        x, w, s = infos
        if all(i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        dx, dw = x.dims(), w.dims()
        if dx is not None and dw is not None:
            return [TensorInfo.shaped(x.dtype, list(dx[:-1]) + [dw[-1]])]
        if x.rank is not None:
            return [TensorInfo.ranked(x.dtype, x.rank)]
        return [TensorInfo.minimal(x.dtype)]


def quantize_matmul_weights(
    milli: MilliGraph,
    weight_names: Sequence[str],
    weight_getter,
    min_elements: int = 1 << 16,
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Mutate `milli`: every MatMul whose RHS is a 2-D weight input from
    `weight_names` (and large enough to matter) becomes QuantMatMul with
    an extra `<name>::scale` input. Returns {name: (w_i8, scale)} —
    callers feed w_i8 under the original name and scale under the new.
    """
    from ..backends.pallas.quant_matmul import quantize_int8
    from .ops import MatMul

    name_to_tid = {name: tid for name, tid in milli.inputs.items()}
    quantized: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    scale_tid: Dict[str, int] = {}
    for node in milli.nodes:
        if not isinstance(node.op, MatMul) or len(node.inputs) != 2:
            continue
        rhs = node.inputs[1]
        rhs_name = None
        for name in weight_names:
            if name_to_tid.get(name) == rhs:
                rhs_name = name
                break
        if rhs_name is None:
            continue
        w = np.asarray(weight_getter(rhs_name))
        if w.ndim != 2 or w.size < min_elements:
            continue
        if rhs_name not in quantized:
            quantized[rhs_name] = quantize_int8(w.astype(np.float32))
            scale_tid[rhs_name] = milli.add_input(f"{rhs_name}::scale")
        node.op = QuantMatMulMilli()
        node.inputs = [node.inputs[0], rhs, scale_tid[rhs_name]]
    return quantized
