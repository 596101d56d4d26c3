"""Misc milli ops: Trilu, EyeLike, OneHot, Tile."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ...dtype import DType
from ...scalar_info import ScalarInfo
from ...tensor_info import Level, TensorInfo
from ..ir import MilliOp


@dataclass
class TriluMilli(MilliOp):
    upper: bool = True
    KIND = "Trilu"

    def eval(self, inputs):
        x = inputs[0]
        k = int(np.asarray(inputs[1]).reshape(())) if len(inputs) > 1 and inputs[1] is not None else 0
        return [np.triu(x, k) if self.upper else np.tril(x, k)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        from .shape import _need_static

        k = 0
        if len(inputs) > 1:
            k = int(np.asarray(_need_static(static, 1, "Trilu")).reshape(()))
        x = inputs[0]
        return [jnp.triu(x, k) if self.upper else jnp.tril(x, k)]

    def infer(self, infos):
        i = infos[0]
        if all(f.level is Level.NUMERIC for f in infos):
            return [TensorInfo.numeric(self.eval([f.value for f in infos])[0])]
        return [i.forget_value()]


@dataclass
class EyeLikeMilli(MilliOp):
    dtype: Optional[DType] = None
    k: int = 0
    KIND = "EyeLike"

    def _dt(self, x):
        return (self.dtype or DType.from_numpy(x.dtype)).to_numpy()

    def eval(self, inputs):
        x = inputs[0]
        return [np.eye(x.shape[0], x.shape[1], k=self.k, dtype=self._dt(x))]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x = inputs[0]
        return [jnp.eye(x.shape[0], x.shape[1], k=self.k, dtype=self._dt(np.zeros((), np.dtype(x.dtype))))]

    def infer(self, infos):
        i = infos[0]
        dt = self.dtype or i.dtype
        if i.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([i.value])[0])]
        return [TensorInfo(dt, min(i.level, Level.SHAPED), shape=i.shape, rank_=i.rank_)]


@dataclass
class OneHotMilli(MilliOp):
    """indices, depth, values([off,on]) -> one-hot."""

    axis: int = -1
    KIND = "OneHot"

    def eval(self, inputs):
        idx, depth, values = inputs
        d = int(np.asarray(depth).reshape(-1)[0])
        off, on = np.asarray(values).reshape(-1)[:2]
        ax = self.axis % (idx.ndim + 1)
        ii = idx.astype(np.int64)
        ii = np.where(ii < 0, ii + d, ii)
        eye = np.arange(d).reshape((1,) * idx.ndim + (d,))
        hot = (np.expand_dims(ii, -1) == eye)
        out = np.where(hot, on, off).astype(np.asarray(values).dtype)
        return [np.moveaxis(out, -1, ax)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        from .shape import _need_static

        idx, _, values = inputs
        d = int(np.asarray(_need_static(static, 1, "OneHot")).reshape(-1)[0])
        off = values.reshape(-1)[0]
        on = values.reshape(-1)[1]
        ax = self.axis % (idx.ndim + 1)
        ii = jnp.where(idx < 0, idx + d, idx)
        eye = jnp.arange(d).reshape((1,) * idx.ndim + (d,))
        hot = jnp.expand_dims(ii, -1) == eye
        out = jnp.where(hot, on, off)
        return [jnp.moveaxis(out, -1, ax)]

    def infer(self, infos):
        if all(f.level is Level.NUMERIC for f in infos):
            return [TensorInfo.numeric(self.eval([f.value for f in infos])[0])]
        idx, depth, values = infos
        dt = values.dtype
        dims = idx.dims()
        if dims is not None and depth.level is Level.NUMERIC:
            d = int(np.asarray(depth.value).reshape(-1)[0])
            ax = self.axis % (len(dims) + 1)
            out = list(dims)
            out.insert(ax, ScalarInfo.of(d))
            return [TensorInfo.shaped(dt, out)]
        if idx.rank is not None:
            return [TensorInfo.ranked(dt, idx.rank + 1)]
        return [TensorInfo.minimal(dt)]


@dataclass
class TileMilli(MilliOp):
    """data, repeats(i64) -> np.tile."""

    KIND = "Tile"

    def eval(self, inputs):
        x, reps = inputs
        return [np.tile(x, tuple(int(r) for r in np.asarray(reps).reshape(-1)))]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        from .shape import _need_static

        reps = _need_static(static, 1, "Tile")
        return [jnp.tile(inputs[0], tuple(int(r) for r in reps.reshape(-1)))]

    def infer(self, infos):
        x, reps = infos
        if x.level is Level.NUMERIC and reps.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([x.value, reps.value])[0])]
        dims = x.dims()
        if dims is not None and reps.level is Level.NUMERIC:
            rv = [int(r) for r in reps.value.reshape(-1)]
            out = [d * ScalarInfo.of(r) for d, r in zip(dims, rv)]
            return [TensorInfo.shaped(x.dtype, out)]
        if x.rank is not None:
            return [TensorInfo.ranked(x.dtype, x.rank)]
        return [TensorInfo.minimal(x.dtype)]


@dataclass
class DepthToSpaceMilli(MilliOp):
    blocksize: int = 1
    mode: str = "DCR"
    KIND = "DepthToSpace"

    def _apply(self, x, xp):
        b = self.blocksize
        N, C, H, W = x.shape
        if self.mode == "DCR":
            t = x.reshape(N, b, b, C // (b * b), H, W)
            t = xp.transpose(t, (0, 3, 4, 1, 5, 2))
        else:  # CRD
            t = x.reshape(N, C // (b * b), b, b, H, W)
            t = xp.transpose(t, (0, 1, 4, 2, 5, 3))
        return t.reshape(N, C // (b * b), H * b, W * b)

    def eval(self, inputs):
        return [self._apply(inputs[0], np)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        return [self._apply(inputs[0], jnp)]

    def infer(self, infos):
        i = infos[0]
        if i.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([i.value])[0])]
        cs = i.concrete_shape()
        if cs is not None:
            b = self.blocksize
            N, C, H, W = cs
            return [TensorInfo.shaped(i.dtype, [N, C // (b * b), H * b, W * b])]
        if i.rank is not None:
            return [TensorInfo.ranked(i.dtype, i.rank)]
        return [TensorInfo.minimal(i.dtype)]


@dataclass
class SpaceToDepthMilli(MilliOp):
    blocksize: int = 1
    KIND = "SpaceToDepth"

    def _apply(self, x, xp):
        b = self.blocksize
        N, C, H, W = x.shape
        t = x.reshape(N, C, H // b, b, W // b, b)
        t = xp.transpose(t, (0, 3, 5, 1, 2, 4))
        return t.reshape(N, C * b * b, H // b, W // b)

    def eval(self, inputs):
        return [self._apply(inputs[0], np)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        return [self._apply(inputs[0], jnp)]

    def infer(self, infos):
        i = infos[0]
        if i.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([i.value])[0])]
        cs = i.concrete_shape()
        if cs is not None:
            b = self.blocksize
            N, C, H, W = cs
            return [TensorInfo.shaped(i.dtype, [N, C * b * b, H // b, W // b])]
        if i.rank is not None:
            return [TensorInfo.ranked(i.dtype, i.rank)]
        return [TensorInfo.minimal(i.dtype)]


@dataclass
class DynUpdateSliceMilli(MilliOp):
    """data, update, start(scalar i64 | (B,) i64) -> data with update
    written at offset `start` along `axis`. The static-shape KV-cache
    write: maps to jax.lax.dynamic_update_slice_in_dim (XLA
    DynamicUpdateSlice), which donated-buffer jit turns into an in-place
    write on TPU. A (B,) start writes PER BATCH ROW (dim 0) — the
    ragged-decode KV write for continuous batching (lowered via vmap)."""

    axis: int = 0
    KIND = "DynUpdateSlice"

    def eval(self, inputs):
        data, update, start = inputs
        ax = self.axis % data.ndim
        s_arr = np.asarray(start)
        out = data.copy()
        if s_arr.ndim == 1:
            for bi in range(data.shape[0]):
                s = int(s_arr[bi])
                idx = [slice(None)] * (data.ndim - 1)
                idx[ax - 1] = slice(s, s + update.shape[ax])
                out[bi][tuple(idx)] = update[bi].astype(data.dtype)
            return [out]
        s = int(s_arr.reshape(()))
        idx = [slice(None)] * data.ndim
        idx[ax] = slice(s, s + update.shape[ax])
        out[tuple(idx)] = update.astype(data.dtype)
        return [out]

    def to_jax(self, inputs, static=None):
        import jax

        data, update, start = inputs
        ax = self.axis % data.ndim
        if start.ndim == 1:
            if ax == 2 and data.ndim == 4:
                from ...backends.pallas.kv_write import (
                    ragged_kv_write, ragged_kv_write_usable)

                if ragged_kv_write_usable(data, update, start):
                    # true in-place ragged write: XLA's lowering of the
                    # vmapped DUS rewrites the FULL cache every step
                    # (masked select); the Pallas kernel touches only
                    # each row's (H, 1, D) slab
                    return [ragged_kv_write(data, update, start)]
            return [jax.vmap(
                lambda d, u, s: jax.lax.dynamic_update_slice_in_dim(
                    d, u.astype(d.dtype), s, axis=ax - 1))(
                data, update, start)]
        return [jax.lax.dynamic_update_slice_in_dim(
            data, update.astype(data.dtype), start.reshape(()),
            axis=ax)]

    def infer(self, infos):
        if all(f.level is Level.NUMERIC for f in infos):
            return [TensorInfo.numeric(self.eval([f.value for f in infos])[0])]
        return [infos[0].forget_value()]
