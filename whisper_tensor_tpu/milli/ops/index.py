"""Indexing milli ops: Gather family, ScatterND, Range.

Reference equivalents: src/milli_graph/ops/{gather,gather_grad}.rs and
the symbolic GatherElements/GatherND/ScatterND lowerings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ...dtype import DType
from ...scalar_info import ScalarInfo
from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp, Phase


@dataclass
class Gather(MilliOp):
    """ONNX Gather: index axis `axis` of data with arbitrary-rank indices."""

    axis: int = 0
    KIND = "Gather"

    def eval(self, inputs):
        data, idx = inputs
        ax = self.axis % data.ndim
        idx = idx.astype(np.int64)
        idx = np.where(idx < 0, idx + data.shape[ax], idx)
        return [np.take(data, idx, axis=ax)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        data, idx = inputs
        ax = self.axis % data.ndim
        idx = jnp.where(idx < 0, idx + data.shape[ax], idx)
        return [jnp.take(data, idx, axis=ax)]

    def infer(self, infos):
        data, idx = infos
        if data.level is Level.NUMERIC and idx.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([data.value, idx.value])[0])]
        dd, di = data.dims(), idx.dims()
        if dd is not None and di is not None:
            ax = self.axis % len(dd)
            out = list(dd[:ax]) + list(di) + list(dd[ax + 1:])
            return [TensorInfo.shaped(data.dtype, out)]
        if data.rank is not None and idx.rank is not None:
            return [TensorInfo.ranked(data.dtype, data.rank - 1 + idx.rank)]
        return [TensorInfo.minimal(data.dtype)]

    def backward(self, b, node, out_grads):
        g = out_grads[0]
        if g is None:
            return [None, None]
        P = Phase.BACKWARD
        from .shape import Shape

        shp = b.op1(Shape(), node.inputs[0], phase=P)
        gg = b.op1(GatherGrad(axis=self.axis), shp, node.inputs[1], g, phase=P)
        return [gg, None]


@dataclass
class GatherGrad(MilliOp):
    """Scatter-add gradient of Gather: (data_shape, indices, grad) -> d(data).

    Reference: src/milli_graph/ops/mod.rs GatherGrad. On TPU this is a
    segment-sum (jax .at[].add with unique_indices=False).
    """

    axis: int = 0
    KIND = "GatherGrad"

    def eval(self, inputs):
        shape, idx, g = inputs
        shape = tuple(int(x) for x in np.asarray(shape).reshape(-1))
        ax = self.axis % len(shape)
        from .common import downcast_result, upcast_for_compute

        gc, orig = upcast_for_compute(g)
        out = np.zeros(shape, dtype=gc.dtype)
        idxf = idx.astype(np.int64).reshape(-1)
        idxf = np.where(idxf < 0, idxf + shape[ax], idxf)
        # flatten index dims into the gather axis, move that axis to front
        g_flat = gc.reshape(shape[:ax] + (idxf.size,) + shape[ax + 1:])
        out_moved = np.moveaxis(out, ax, 0)
        np.add.at(out_moved, idxf, np.moveaxis(g_flat, ax, 0))
        return [downcast_result(out, orig)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        from .shape import _need_static

        shape = tuple(int(x) for x in _need_static(static, 0, "GatherGrad").reshape(-1))
        idx, g = inputs[1], inputs[2]
        ax = self.axis % len(shape)
        idxf = idx.reshape(-1)
        g2 = g.reshape(shape[:ax] + (idxf.size,) + shape[ax + 1:])
        acc_dt = jnp.float32 if g.dtype in (jnp.bfloat16, jnp.float16) else g.dtype
        out = jnp.zeros(shape, dtype=acc_dt)
        gm = jnp.moveaxis(g2.astype(acc_dt), ax, 0)
        om = jnp.moveaxis(out, ax, 0)
        om = om.at[idxf].add(gm)
        return [jnp.moveaxis(om, 0, ax).astype(g.dtype)]

    def infer(self, infos):
        shape = infos[0]
        dt = infos[2].dtype
        if shape.level is Level.NUMERIC:
            dims = [int(x) for x in shape.value.reshape(-1)]
            return [TensorInfo.shaped(dt, dims)]
        return [TensorInfo.minimal(dt)]


@dataclass
class GatherElements(MilliOp):
    """ONNX GatherElements: np.take_along_axis."""

    axis: int = 0
    KIND = "GatherElements"

    def eval(self, inputs):
        data, idx = inputs
        ax = self.axis % data.ndim
        idx = idx.astype(np.int64)
        idx = np.where(idx < 0, idx + data.shape[ax], idx)
        return [np.take_along_axis(data, idx, axis=ax)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        data, idx = inputs
        ax = self.axis % data.ndim
        idx = jnp.where(idx < 0, idx + data.shape[ax], idx)
        return [jnp.take_along_axis(data, idx, axis=ax)]

    def infer(self, infos):
        data, idx = infos
        if data.level is Level.NUMERIC and idx.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([data.value, idx.value])[0])]
        if idx.dims() is not None:
            return [TensorInfo.shaped(data.dtype, list(idx.dims()))]
        if idx.rank is not None:
            return [TensorInfo.ranked(data.dtype, idx.rank)]
        return [TensorInfo.minimal(data.dtype)]

    def backward(self, b, node, out_grads):
        """grad_data = sum_K onehot(idx) * g along the gathered axis.
        Non-last axes transpose the axis to the end, apply the last-axis
        rule, and transpose back (needs rank info)."""
        g = out_grads[0]
        if g is None:
            return [None, None]
        info = b.tensors[node.inputs[0]].info
        rank = info.rank if info is not None else None
        last = self.axis == -1 or (rank is not None
                                   and self.axis % rank == rank - 1)
        if not last and rank is None:
            raise NotImplementedError(
                "GatherElements backward: non-last axis without rank info")
        from .misc import OneHotMilli
        from .shape import GatherShape, Shape, Transpose, Unsqueeze

        P = Phase.BACKWARD
        data, idx = node.inputs
        from .basic import CastLike, Constant, SimpleBinary

        if last:
            depth_src, g_in, idx_in = data, g, idx
            shp = b.op1(Shape(start=-1), data, phase=P)               # [V]
            depth = b.op1(GatherShape(0), shp, phase=P)
        else:
            ax = self.axis % rank
            perm = [i for i in range(rank) if i != ax] + [ax]
            inv = [int(i) for i in np.argsort(perm)]
            g_in = b.op1(Transpose(perm=perm), g, phase=P)
            idx_in = b.op1(Transpose(perm=perm), idx, phase=P)
            shp = b.op1(Shape(), data, phase=P)
            depth = b.op1(GatherShape(ax), shp, phase=P)
        vals = b.op1(Constant(np.asarray([0.0, 1.0], dtype=np.float32)), phase=P)
        valsc = b.op1(CastLike(), vals, g, phase=P)
        hot = b.op1(OneHotMilli(axis=-1), idx_in, depth, valsc, phase=P)  # (...,K,V)
        gk = b.op1(Unsqueeze(axes=[-1]), g_in, phase=P)                   # (...,K,1)
        contrib = b.op1(SimpleBinary("mul"), hot, gk, phase=P)
        from .reduce import Reduce

        gd = b.op1(Reduce("sum", axes=[-2], keepdims=False), contrib, phase=P)
        if not last:
            gd = b.op1(Transpose(perm=inv), gd, phase=P)
        return [gd, None]


@dataclass
class GatherND(MilliOp):
    batch_dims: int = 0
    KIND = "GatherND"

    def eval(self, inputs):
        data, idx = inputs
        idx = idx.astype(np.int64)
        b = self.batch_dims
        if b == 0:
            k = idx.shape[-1]
            flat_idx = idx.reshape(-1, k)
            out = data[tuple(flat_idx.T)]
            return [out.reshape(idx.shape[:-1] + data.shape[k:])]
        # batched: iterate batch dims
        batch_shape = data.shape[:b]
        k = idx.shape[-1]
        out_shape = idx.shape[:-1] + data.shape[b + k:]
        out = np.empty(out_shape, dtype=data.dtype)
        for bi in np.ndindex(*batch_shape):
            sub_idx = idx[bi].reshape(-1, k)
            sub = data[bi][tuple(sub_idx.T)]
            out[bi] = sub.reshape(idx[bi].shape[:-1] + data.shape[b + k:])
        return [out]

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        data, idx = inputs
        bd = self.batch_dims
        k = idx.shape[-1]
        if bd == 0:
            flat_idx = idx.reshape(-1, k)
            out = data[tuple(flat_idx.T)]
            return [out.reshape(idx.shape[:-1] + data.shape[k:])]
        # batched gather: prepend broadcast batch-coordinate columns so
        # the whole thing is one static advanced-index (no host loop)
        coords = [jnp.broadcast_to(
            jax.lax.broadcasted_iota(idx.dtype, idx.shape[:-1] + (1,), i),
            idx.shape[:-1] + (1,)) for i in range(bd)]
        full_idx = jnp.concatenate(coords + [idx], axis=-1)  # (..., bd+k)
        flat_idx = full_idx.reshape(-1, bd + k)
        out = data[tuple(flat_idx.T)]
        return [out.reshape(idx.shape[:-1] + data.shape[bd + k:])]

    def infer(self, infos):
        data, idx = infos
        if data.level is Level.NUMERIC and idx.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([data.value, idx.value])[0])]
        dd, di = data.dims(), idx.dims()
        if dd is not None and di is not None and di[-1].is_known:
            k = int(di[-1].value())
            out = list(di[:-1]) + list(dd[self.batch_dims + k:])
            return [TensorInfo.shaped(data.dtype, out)]
        return [TensorInfo.minimal(data.dtype)]


@dataclass
class ScatterND(MilliOp):
    reduction: str = "none"  # none | add | mul | max | min
    KIND = "ScatterND"

    def eval(self, inputs):
        data, idx, updates = inputs
        out = data.copy()
        idx = idx.astype(np.int64)
        k = idx.shape[-1]
        flat_idx = tuple(idx.reshape(-1, k).T)
        upd = updates.reshape((-1,) + data.shape[k:])
        if self.reduction == "none":
            out[flat_idx] = upd
        elif self.reduction == "add":
            np.add.at(out, flat_idx, upd)
        elif self.reduction == "mul":
            np.multiply.at(out, flat_idx, upd)
        elif self.reduction == "max":
            np.maximum.at(out, flat_idx, upd)
        elif self.reduction == "min":
            np.minimum.at(out, flat_idx, upd)
        return [out]

    def to_jax(self, inputs, static=None):
        data, idx, updates = inputs
        k = idx.shape[-1]
        flat_idx = tuple(idx.reshape(-1, k).T)
        upd = updates.reshape((-1,) + data.shape[k:])
        at = data.at[flat_idx]
        if self.reduction == "none":
            return [at.set(upd)]
        if self.reduction == "add":
            return [at.add(upd)]
        if self.reduction == "mul":
            return [at.multiply(upd)]
        if self.reduction == "max":
            return [at.max(upd)]
        if self.reduction == "min":
            return [at.min(upd)]
        raise NotImplementedError(self.reduction)

    def infer(self, infos):
        data = infos[0]
        if all(i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        return [data.forget_value()]


@dataclass
class Range(MilliOp):
    """start, limit, delta (scalars) -> 1-D tensor. Static under jit."""

    KIND = "Range"

    def eval(self, inputs):
        s, l, d = (np.asarray(x).reshape(()) for x in inputs)
        return [np.arange(s, l, d, dtype=inputs[0].dtype)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        from .shape import _need_static

        s = _need_static(static, 0, "Range").reshape(())
        l = _need_static(static, 1, "Range").reshape(())
        d = _need_static(static, 2, "Range").reshape(())
        return [jnp.arange(s, l, d, dtype=inputs[0].dtype)]

    def infer(self, infos):
        if all(i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        return [TensorInfo.ranked(infos[0].dtype, 1)]


@dataclass
class ScatterElementsMilli(MilliOp):
    """ONNX ScatterElements: the inverse of GatherElements — write
    `updates` into `data` at per-element positions `idx` along `axis`,
    with optional add/mul/max/min reduction."""

    axis: int = 0
    reduction: str = "none"  # none | add | mul | max | min
    KIND = "ScatterElements"

    def eval(self, inputs):
        data, idx, upd = inputs
        ax = self.axis % data.ndim
        idx = idx.astype(np.int64)
        idx = np.where(idx < 0, idx + data.shape[ax], idx)
        out = data.copy()
        if self.reduction == "none":
            np.put_along_axis(out, idx, upd, axis=ax)
            return [out]
        grids = list(np.indices(idx.shape))
        grids[ax] = idx
        fi = tuple(g.reshape(-1) for g in grids)
        uf = upd.reshape(-1)
        if self.reduction == "add":
            np.add.at(out, fi, uf)
        elif self.reduction == "mul":
            np.multiply.at(out, fi, uf)
        elif self.reduction == "max":
            np.maximum.at(out, fi, uf)
        elif self.reduction == "min":
            np.minimum.at(out, fi, uf)
        else:
            raise NotImplementedError(self.reduction)
        return [out]

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        data, idx, upd = inputs
        ax = self.axis % data.ndim
        idx = jnp.where(idx < 0, idx + data.shape[ax], idx)
        grids = [jax.lax.broadcasted_iota(idx.dtype, idx.shape, i)
                 for i in range(data.ndim)]
        grids[ax] = idx
        at = data.at[tuple(grids)]
        if self.reduction == "none":
            return [at.set(upd)]
        if self.reduction == "add":
            return [at.add(upd)]
        if self.reduction == "mul":
            return [at.multiply(upd)]
        if self.reduction == "max":
            return [at.max(upd)]
        if self.reduction == "min":
            return [at.min(upd)]
        raise NotImplementedError(self.reduction)

    def infer(self, infos):
        data = infos[0]
        if all(i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        return [data.forget_value()]
