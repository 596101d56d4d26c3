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


def _finfo(np_t):
    """np.finfo that also accepts ml_dtypes scalar classes."""
    try:
        return np.finfo(np_t)
    except ValueError:
        import ml_dtypes

        return ml_dtypes.finfo(np_t)


def _q_range(tgt: DType):
    """clip range for the quantize target (4-bit logical ranges differ
    from their widened host containers)."""
    if tgt is DType.I4:
        return -8, 7
    if tgt is DType.U4:
        return 0, 15
    info = np.iinfo(tgt.to_numpy())
    return info.min, info.max


def _expand_block(xp, s, axis, dim, block):
    """Blocked (ONNX-21) scale/zp: repeat each block along `axis` to
    the data length."""
    rep = xp.repeat(s, block, axis=axis)
    sl = [slice(None)] * s.ndim
    sl[axis] = slice(0, dim)
    return rep[tuple(sl)]


@dataclass
class QuantizeLinearMilli(MilliOp):
    axis: int = 1
    dtype: Optional[DType] = None  # target (from zero_point or attr)
    block_size: int = 0
    KIND = "QuantizeLinear"

    def _scales(self, xp, x, scale, zp):
        ax = self.axis % x.ndim
        if self.block_size:
            s = _expand_block(xp, scale.astype(xp.float32), ax,
                              x.shape[ax], self.block_size)
            z = (_expand_block(xp, zp.astype(xp.float32), ax, x.shape[ax],
                               self.block_size) if zp is not None else 0.0)
            return s, z
        s = _reshape_for_axis(scale.astype(np.float32), x.ndim, self.axis)
        z = (_reshape_for_axis(zp.astype(np.float32), x.ndim, self.axis)
             if zp is not None else 0.0)
        return s, z

    def eval(self, inputs):
        x, scale = inputs[0], inputs[1]
        zp = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        tgt = self.dtype or (DType.from_numpy(zp.dtype) if zp is not None else DType.U8)
        s, z = self._scales(np, x, scale, zp)
        np_t = tgt.to_numpy()
        if tgt.is_float:
            # float8/float4 targets: saturating cast of x/s + z (no
            # integer rounding), per the ONNX saturate=1 default
            v = x.astype(np.float32) / s + z
            fi = _finfo(np_t)
            v = np.clip(v, float(fi.min), float(fi.max))
            return [v.astype(np_t)]
        q = np.round(x.astype(np.float32) / s) + z
        lo, hi = _q_range(tgt)
        q = np.clip(q, lo, hi)
        return [q.astype(np_t)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x, scale = inputs[0], inputs[1]
        zp = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        tgt = self.dtype or (DType.from_numpy(np.dtype(zp.dtype)) if zp is not None else DType.U8)
        if self.block_size:
            s, z = self._scales(jnp, x, scale, zp)
        else:
            s = _reshape_for_axis(scale.astype(jnp.float32), x.ndim, self.axis)
            z = (_reshape_for_axis(zp.astype(jnp.float32), x.ndim, self.axis)
                 if zp is not None else 0.0)
        if tgt.is_float:
            fi = _finfo(tgt.to_numpy())
            v = jnp.clip(x.astype(jnp.float32) / s + z,
                         float(fi.min), float(fi.max))
            return [v.astype(tgt.to_jax())]
        q = jnp.round(x.astype(jnp.float32) / s) + z
        lo, hi = _q_range(tgt)
        q = jnp.clip(q, lo, hi)
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
    block_size: int = 0
    KIND = "DequantizeLinear"

    def _sz(self, xp, x, scale, zp):
        if self.block_size:
            ax = self.axis % x.ndim
            s = _expand_block(xp, scale.astype(xp.float32), ax,
                              x.shape[ax], self.block_size)
            z = (_expand_block(xp, zp.astype(xp.float32), ax, x.shape[ax],
                               self.block_size) if zp is not None else 0.0)
            return s, z
        s = _reshape_for_axis(scale.astype(np.float32), x.ndim, self.axis)
        z = (_reshape_for_axis(zp.astype(np.float32), x.ndim, self.axis)
             if zp is not None else 0.0)
        return s, z

    def eval(self, inputs):
        x, scale = inputs[0], inputs[1]
        zp = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        s, z = self._sz(np, x, scale, zp)
        out = (x.astype(np.float32) - z) * s
        return [out.astype(scale.dtype)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x, scale = inputs[0], inputs[1]
        zp = inputs[2] if len(inputs) > 2 and inputs[2] is not None else None
        if self.block_size:
            s, z = self._sz(jnp, x, scale, zp)
        else:
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
