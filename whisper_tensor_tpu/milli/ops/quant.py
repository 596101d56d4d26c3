"""Affine quantize/dequantize milli ops (ONNX Q/DQ semantics)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ...dtype import DType
from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp


def _reshape_for_axis(p, ndim, axis):
    if p.ndim == 0:
        return p
    shape = [1] * ndim
    shape[axis % ndim] = -1
    return p.reshape(shape)


@dataclass
class QuantizeLinearMilli(MilliOp):
    axis: int = 1
    dtype: Optional[DType] = None  # target (from zero_point or attr)
    KIND = "QuantizeLinear"

    def eval(self, inputs):
        x, scale = inputs[0], inputs[1]
        zp = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        tgt = self.dtype or (DType.from_numpy(zp.dtype) if zp is not None else DType.U8)
        s = _reshape_for_axis(scale.astype(np.float32), x.ndim, self.axis)
        z = (_reshape_for_axis(zp.astype(np.float32), x.ndim, self.axis)
             if zp is not None else 0.0)
        q = np.round(x.astype(np.float32) / s) + z
        np_t = tgt.to_numpy()
        info = np.iinfo(np_t) if tgt.is_int else None
        if info is not None:
            q = np.clip(q, info.min, info.max)
        return [q.astype(np_t)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x, scale = inputs[0], inputs[1]
        zp = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        tgt = self.dtype or (DType.from_numpy(np.dtype(zp.dtype)) if zp is not None else DType.U8)
        s = _reshape_for_axis(scale.astype(jnp.float32), x.ndim, self.axis)
        z = (_reshape_for_axis(zp.astype(jnp.float32), x.ndim, self.axis)
             if zp is not None else 0.0)
        q = jnp.round(x.astype(jnp.float32) / s) + z
        if tgt.is_int:
            info = np.iinfo(tgt.to_numpy())
            q = jnp.clip(q, info.min, info.max)
        return [q.astype(tgt.to_jax())]

    def infer(self, infos):
        x = infos[0]
        tgt = self.dtype or (infos[2].dtype if len(infos) > 2 and infos[2] is not None else DType.U8)
        if all(i is not None and i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        return [TensorInfo(tgt, min(x.level, 2), shape=x.shape, rank_=x.rank_)]


@dataclass
class DequantizeLinearMilli(MilliOp):
    axis: int = 1
    KIND = "DequantizeLinear"

    def eval(self, inputs):
        x, scale = inputs[0], inputs[1]
        zp = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        s = _reshape_for_axis(scale.astype(np.float32), x.ndim, self.axis)
        z = (_reshape_for_axis(zp.astype(np.float32), x.ndim, self.axis)
             if zp is not None else 0.0)
        out = (x.astype(np.float32) - z) * s
        return [out.astype(scale.dtype)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x, scale = inputs[0], inputs[1]
        zp = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        s = _reshape_for_axis(scale.astype(jnp.float32), x.ndim, self.axis)
        z = (_reshape_for_axis(zp.astype(jnp.float32), x.ndim, self.axis)
             if zp is not None else 0.0)
        out = (x.astype(jnp.float32) - z) * s
        return [out.astype(scale.dtype)]

    def infer(self, infos):
        x = infos[0]
        dt = infos[1].dtype
        if all(i is not None and i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        return [TensorInfo(dt, min(x.level, 2), shape=x.shape, rank_=x.rank_)]
