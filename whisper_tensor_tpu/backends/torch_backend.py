"""Torch (CPU) alternate execution backend — per-milli-op dispatch.

Reference equivalent: the Candle/TCH runtime backends the user can
select at run time (src/backends/eval_backend.rs:18-27) — partial op
coverage with per-op fallback to the NDArray interpreter, exactly the
dispatch shape reproduced here: `TorchDispatch(op, inputs)` executes
the op through torch kernels when a rule exists and the dtypes are in
torch's wheelhouse, and returns None otherwise so MilliGraph.eval
falls back to the numpy oracle for that op.

Scope: f32/f64/int/bool tensors (the reference's TCH path is also a
float-major runtime); bf16/f16/f8/packed inputs fall back to the
oracle, whose reduced-precision contract (f32-compute-round-back) is
the semantic source of truth.
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np

_OK_DTYPES = ("float32", "float64", "int64", "int32", "int16", "int8",
              "uint8", "bool")

_UNARY = {
    "neg": "neg", "abs": "abs", "sign": "sign", "exp": "exp",
    "log": "log", "sqrt": "sqrt", "floor": "floor", "ceil": "ceil",
    "round": "round", "sin": "sin", "cos": "cos", "tan": "tan",
    "asin": "asin", "acos": "acos", "atan": "atan", "sinh": "sinh",
    "cosh": "cosh", "tanh": "tanh", "asinh": "asinh", "acosh": "acosh",
    "atanh": "atanh", "erf": "erf", "sigmoid": "sigmoid",
    "reciprocal": "reciprocal", "not": "logical_not",
}

_BINARY = {
    "add": "add", "sub": "sub", "mul": "mul", "max": "maximum",
    "min": "minimum", "eq": "eq", "ne": "ne", "lt": "lt", "le": "le",
    "gt": "gt", "ge": "ge", "and": "logical_and", "or": "logical_or",
    "xor": "logical_xor",
}

_REDUCE = {"sum": "sum", "mean": "mean", "max": "amax", "min": "amin",
           "prod": "prod"}


class TorchDispatch:
    """Callable per-op executor for MilliGraph.eval(op_impl=...).

    Counts hits/fallbacks so callers (and tests) can see how much of a
    graph actually ran on torch."""

    def __init__(self) -> None:
        import torch  # noqa: F401  (fail fast if absent)

        self.hits = 0
        self.fallbacks = 0
        self.hit_kinds: dict = {}

    # -- helpers --------------------------------------------------------
    @staticmethod
    def _ok(*arrs) -> bool:
        return all(a is None or (isinstance(a, np.ndarray)
                                 and a.dtype.name in _OK_DTYPES)
                   for a in arrs)

    @staticmethod
    def _t(a):
        import torch

        arr = np.ascontiguousarray(a)
        if not arr.flags.writeable:    # torch warns on frozen views
            arr = arr.copy()
        return torch.from_numpy(arr)

    def _done(self, op, outs: List[Any]) -> List[np.ndarray]:
        self.hits += 1
        self.hit_kinds[op.KIND] = self.hit_kinds.get(op.KIND, 0) + 1
        return [o.numpy() if hasattr(o, "numpy") else np.asarray(o)
                for o in outs]

    # -- dispatch -------------------------------------------------------
    def __call__(self, op, ins: List[Optional[np.ndarray]]
                 ) -> Optional[List[np.ndarray]]:
        try:
            out = self._dispatch(op, ins)
        except Exception:  # noqa: BLE001 — any torch-side surprise
            out = None     # falls back to the oracle, never fails the run
        if out is None:
            self.fallbacks += 1
        return out

    def _dispatch(self, op, ins):
        import torch

        kind = op.KIND
        if not self._ok(*ins):
            return None

        if kind == "MatMul":
            a, b = ins
            if a.dtype.kind != "f" or a.dtype != b.dtype:
                return None
            return self._done(op, [torch.matmul(self._t(a), self._t(b))])

        if kind == "SimpleUnary":
            name = _UNARY.get(op.mode)
            x = ins[0]
            if name is None:
                return None
            if x.dtype.kind != "f" and op.mode not in ("neg", "abs",
                                                       "sign", "not"):
                return None
            return self._done(op, [getattr(torch, name)(self._t(x))])

        if kind == "SimpleBinary":
            name = _BINARY.get(op.mode)
            a, b = ins
            if name is None or a.dtype != b.dtype:
                return None
            if op.mode in ("add", "sub", "mul", "max", "min") \
                    and a.dtype.kind not in "fiu":
                return None
            out = getattr(torch, name)(self._t(a), self._t(b))
            return self._done(op, [out])

        if kind == "Pow":
            a, b = ins
            if a.dtype.kind != "f":
                return None
            return self._done(op, [torch.pow(self._t(a),
                                             self._t(b.astype(a.dtype)))])

        if kind == "Where":
            c, a, b = ins
            if a.dtype != b.dtype:
                return None
            return self._done(op, [torch.where(self._t(c) != 0,
                                               self._t(a), self._t(b))])

        if kind == "Transpose":
            x = ins[0]
            perm = getattr(op, "perm", None)
            if getattr(op, "swap_last2", False) and x.ndim >= 2:
                perm = list(range(x.ndim - 2)) + [x.ndim - 1, x.ndim - 2]
            if perm is None:
                perm = list(range(x.ndim))[::-1]
            return self._done(op, [self._t(x).permute(list(perm))
                                   .contiguous()])

        if kind == "Reduce":
            if op.mode not in _REDUCE:
                return None
            x = ins[0]
            if x.dtype.kind != "f" or len(ins) > 1:
                return None
            axes = getattr(op, "axes", None)
            if axes is None:
                if getattr(op, "noop_with_empty_axes", False):
                    return None
                axes = tuple(range(x.ndim))
            out = getattr(torch, _REDUCE[op.mode])(
                self._t(x), dim=tuple(int(a) % x.ndim for a in axes),
                keepdim=bool(getattr(op, "keepdims", True)))
            return self._done(op, [out])

        if kind == "Gather":
            data, idx = ins
            ax = int(getattr(op, "axis", 0))
            if idx.size and idx.min() < 0:
                return None  # negative ONNX indices: oracle path
            out = torch.index_select(
                self._t(data), ax,
                self._t(idx.astype(np.int64)).reshape(-1))
            shape = (data.shape[:ax] + idx.shape
                     + data.shape[ax + 1:])
            return self._done(op, [out.reshape(shape)])

        if kind == "Concat":
            if any(i is None for i in ins) or \
                    len({i.dtype for i in ins}) != 1:
                return None
            ax = int(getattr(op, "axis", 0))
            return self._done(op, [torch.cat([self._t(i) for i in ins],
                                             dim=ax)])

        if kind == "LayerNorm":
            x, scale = ins[0], ins[1]
            bias = ins[2] if len(ins) > 2 else None
            if x.dtype != np.float32 or getattr(op, "n_out", 1) != 1:
                return None
            ax = int(getattr(op, "axis", -1)) % x.ndim
            if ax != x.ndim - 1 or scale.shape != x.shape[ax:]:
                return None
            out = torch.nn.functional.layer_norm(
                self._t(x), x.shape[ax:], self._t(scale),
                None if bias is None else self._t(bias),
                eps=float(getattr(op, "epsilon", 1e-5)))
            return self._done(op, [out])

        if kind == "Attention":
            # only the plain inference surface (Y output, additive or
            # boolean mask); GQA/3-D/qk-capture go to the oracle
            if getattr(op, "n_out", 1) != 1 or op.softcap or op.q_heads:
                return None
            if len(ins) > 4:
                return None
            q, k, v = ins[0], ins[1], ins[2]
            mask = ins[3] if len(ins) > 3 else None
            if mask is not None and op.is_causal:
                return None  # torch SDPA takes one of mask/is_causal
            if q.ndim != 4 or q.dtype != np.float32 \
                    or k.shape[1] != q.shape[1]:
                return None
            am = None
            if mask is not None:
                if mask.ndim == 1:   # wt rank-1 position mask
                    Skv = k.shape[2]
                    j = np.arange(Skv)[None, None, None, :]
                    s = np.arange(q.shape[2])[None, None, :, None]
                    am = self._t((j <= mask[:, None, None, None] + s))
                elif mask.dtype == np.bool_:
                    am = self._t(mask)
                else:
                    am = self._t(mask.astype(np.float32))
            scale = op.scale
            out = torch.nn.functional.scaled_dot_product_attention(
                self._t(q), self._t(k), self._t(v), attn_mask=am,
                is_causal=bool(op.is_causal), scale=scale)
            return self._done(op, [out])

        return None
