"""Einsum milli op (np.einsum / jnp.einsum semantics, ONNX equation)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp
from .common import downcast_result, upcast_for_compute


@dataclass
class EinsumMilli(MilliOp):
    equation: str = ""
    KIND = "Einsum"

    def eval(self, inputs):
        ups = [upcast_for_compute(x) for x in inputs]
        out = np.einsum(self.equation, *[u[0] for u in ups])
        return [downcast_result(np.asarray(out), ups[0][1])]

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        prec = (jax.lax.Precision.HIGHEST
                if np.dtype(inputs[0].dtype) in (np.float32, np.float64,
                                                 np.float16) else None)
        return [jnp.einsum(self.equation, *inputs, precision=prec)]

    def infer(self, infos):
        if all(i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        cs = [i.concrete_shape() for i in infos]
        if all(c is not None for c in cs):
            dummies = [np.zeros(c, dtype=np.float32) for c in cs]
            out_shape = np.einsum(self.equation, *dummies).shape
            return [TensorInfo.shaped(infos[0].dtype, list(out_shape))]
        return [TensorInfo.minimal(infos[0].dtype)]
