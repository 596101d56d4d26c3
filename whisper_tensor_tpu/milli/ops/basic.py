"""Core milli ops: constants, casts, unary/binary elementwise, matmul, where.

Reference equivalents: src/milli_graph/ops/{mod,binary,unary}.rs.
Each op implements the numpy oracle (eval), JAX tracing (to_jax),
symbolic inference (infer), and the reverse-mode rule (backward).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import numpy as np

from ...dtype import DType
from ...tensor_info import Level, TensorInfo
from ..ir import MilliGraph, MilliNode, MilliOp, Phase
from .common import (binary_compute, elementwise_infer, unary_compute,
                     upcast_for_compute)


def _sum_to_like(b: MilliGraph, grad: int, ref: int, phase: Phase) -> int:
    """Reduce `grad` to the shape of tensor `ref` (broadcast-aware grad
    accumulation; reference analyze_broadcast + SumTo,
    src/milli_graph/mod.rs:1107-1167)."""
    from .shape import Shape, SumTo

    shp = b.op1(Shape(), ref, phase=phase)
    return b.op1(SumTo(), grad, shp, phase=phase)


# ---------------------------------------------------------------------------
@dataclass
class Constant(MilliOp):
    """Embedded constant value."""

    value: np.ndarray = None  # type: ignore[assignment]
    KIND = "Constant"

    def eval(self, inputs):
        return [np.asarray(self.value)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        from .common import SMALL_FLOAT_NP

        v = np.asarray(self.value)
        return [jnp.asarray(v)]

    def infer(self, infos):
        return [TensorInfo.numeric(np.asarray(self.value))]

    def properties(self):
        v = np.asarray(self.value)
        return {"dtype": str(v.dtype), "shape": list(v.shape)}


@dataclass
class ConstantOfShape(MilliOp):
    """Fill tensor of runtime shape (input 0 = 1-D i64 shape)."""

    value: np.ndarray = None  # scalar fill, carries dtype
    KIND = "ConstantOfShape"

    def eval(self, inputs):
        shape = tuple(int(x) for x in np.asarray(inputs[0]).reshape(-1))
        fill = np.asarray(self.value).reshape(())
        return [np.full(shape, fill, dtype=fill.dtype)]

    def to_jax(self, inputs, static=None):
        # shape must be trace-time static: handled by the XLA compiler's
        # constant propagation; dynamic shape here is not jittable.
        raise NotImplementedError

    def infer(self, infos):
        fill = np.asarray(self.value).reshape(())
        dt = DType.from_numpy(fill.dtype)
        si = infos[0]
        if si.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([si.value])[0])]
        if si.dims() is not None and si.dims()[0].is_known:
            return [TensorInfo.ranked(dt, int(si.dims()[0].value()))]
        return [TensorInfo.minimal(dt)]


@dataclass
class Cast(MilliOp):
    dtype: DType = DType.F32
    KIND = "Cast"

    def eval(self, inputs):
        x = inputs[0]
        if self.dtype is DType.STRING:
            return [np.asarray(x).astype(str).astype(object)]
        if x.dtype == np.dtype(object) or x.dtype.kind in ("U", "S"):
            tgt = self.dtype.to_numpy()
            return [np.asarray(x).astype(np.float64 if self.dtype.is_float else np.int64).astype(tgt)]
        if self.dtype is DType.BOOL:
            return [np.asarray(x).astype(np.bool_)]
        return [np.asarray(x).astype(self.dtype.to_numpy())]

    def to_jax(self, inputs, static=None):
        return [inputs[0].astype(self.dtype.to_jax())]

    def infer(self, infos):
        i = infos[0]
        if i.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([i.value])[0], self.dtype)]
        return [TensorInfo(self.dtype, i.level, shape=i.shape, rank_=i.rank_)]

    def backward(self, b, node, out_grads):
        g = out_grads[0]
        if g is None:
            return [None]
        src_info = b.tensors[node.inputs[0]].info
        src_dt = src_info.dtype if src_info is not None else DType.F32
        if not src_dt.is_float:
            return [None]
        return [b.op1(Cast(src_dt), g, phase=Phase.BACKWARD)]


@dataclass
class CastLike(MilliOp):
    """Cast input 0 to the dtype of input 1."""

    KIND = "CastLike"

    def eval(self, inputs):
        return [np.asarray(inputs[0]).astype(inputs[1].dtype)]

    def to_jax(self, inputs, static=None):
        return [inputs[0].astype(inputs[1].dtype)]

    def infer(self, infos):
        x, like = infos
        dt = like.dtype
        if x.level is Level.NUMERIC:
            return [TensorInfo.numeric(x.value.astype(dt.to_numpy()), dt)]
        return [TensorInfo(dt, x.level, shape=x.shape, rank_=x.rank_)]

    def backward(self, b, node, out_grads):
        g = out_grads[0]
        if g is None:
            return [None, None]
        from ..ir import Phase

        return [b.op1(CastLike(), g, node.inputs[0], phase=Phase.BACKWARD),
                None]


# ---------------------------------------------------------------------------
# unary
# ---------------------------------------------------------------------------


def _np_erf(x: np.ndarray) -> np.ndarray:
    # torch is the oracle for special functions (baked-in, CPU);
    # ascontiguousarray promotes 0-d to (1,), so restore the shape
    import torch

    out = torch.erf(torch.from_numpy(np.ascontiguousarray(x))).numpy()
    return out.reshape(np.shape(x))


def _np_round(x):
    return np.round(x)  # half-to-even, matches ONNX Round


_UNARY_TABLE = {
    # mode: (numpy_fn, jax_name, bool_out)
    "neg": (lambda x: -x, "negative", False),
    "abs": (np.abs, "abs", False),
    "exp": (np.exp, "exp", False),
    "log": (np.log, "log", False),
    "sqrt": (np.sqrt, "sqrt", False),
    "sin": (np.sin, "sin", False),
    "cos": (np.cos, "cos", False),
    "tan": (np.tan, "tan", False),
    "asin": (np.arcsin, "arcsin", False),
    "acos": (np.arccos, "arccos", False),
    "atan": (np.arctan, "arctan", False),
    "sinh": (np.sinh, "sinh", False),
    "cosh": (np.cosh, "cosh", False),
    "tanh": (np.tanh, "tanh", False),
    "asinh": (np.arcsinh, "arcsinh", False),
    "acosh": (np.arccosh, "arccosh", False),
    "atanh": (np.arctanh, "arctanh", False),
    "sigmoid": (lambda x: 1.0 / (1.0 + np.exp(-x)), "_sigmoid", False),
    "erf": (_np_erf, "_erf", False),
    "floor": (np.floor, "floor", False),
    "ceil": (np.ceil, "ceil", False),
    "round": (_np_round, "round", False),
    "reciprocal": (lambda x: 1.0 / x, "_reciprocal", False),
    "not": (np.logical_not, "logical_not", True),
    "bitnot": (np.invert, "invert", False),
    "sign": (np.sign, "sign", False),
    "relu": (lambda x: np.maximum(x, 0), "_relu", False),
    "isnan": (np.isnan, "isnan", True),
    "softplus": (lambda x: np.logaddexp(x, 0.0), "_softplus", False),
}


@dataclass
class SimpleUnary(MilliOp):
    mode: str = "neg"
    KIND = "SimpleUnary"

    def eval(self, inputs):
        fn, _, bool_out = _UNARY_TABLE[self.mode]
        x = inputs[0]
        if self.mode in ("not",):
            return [np.logical_not(x)]
        if x.dtype.kind in "iub" and self.mode in ("neg", "abs", "sign",
                                                   "bitnot"):
            return [fn(x)]
        if bool_out:
            # isnan etc.: BOOL result — never round back to the input
            # dtype (the f32-compute contract applies to float outputs)
            from .common import upcast_for_compute

            return [fn(upcast_for_compute(x)[0]).astype(np.bool_)]
        return [unary_compute(x, fn)]

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        x = inputs[0]
        # oracle contract: bf16/f16/f8 elementwise math computes in f32
        # and rounds back (exact); mirror that here so backends agree.
        orig = None
        if x.dtype in (jnp.bfloat16, jnp.float16,
                       jnp.float8_e4m3fn, jnp.float8_e5m2):
            orig = x.dtype
            x = x.astype(jnp.float32)
        name = _UNARY_TABLE[self.mode][1]
        if name == "_sigmoid":
            out = jax.nn.sigmoid(x)
        elif name == "_erf":
            out = jax.lax.erf(x)
        elif name == "_reciprocal":
            out = 1.0 / x
        elif name == "_relu":
            out = jnp.maximum(x, 0)
        elif name == "_softplus":
            out = jax.nn.softplus(x)
        else:
            out = getattr(jnp, name)(x)
        if orig is not None and out.dtype == jnp.float32:
            out = out.astype(orig)
        return [out]

    def infer(self, infos):
        i = infos[0]
        bool_out = _UNARY_TABLE[self.mode][2]
        dt = DType.BOOL if bool_out else i.dtype
        if i.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([i.value])[0], dt)]
        return [TensorInfo(dt, min(i.level, Level.SHAPED), shape=i.shape, rank_=i.rank_)]

    def backward(self, b, node, out_grads):
        g = out_grads[0]
        if g is None:
            return [None]
        x = node.inputs[0]
        y = node.outputs[0]
        P = Phase.BACKWARD
        m = self.mode

        def u(mode, t):
            return b.op1(SimpleUnary(mode), t, phase=P)

        def bin(mode, a, c):
            return b.op1(SimpleBinary(mode), a, c, phase=P)

        if m == "neg":
            return [u("neg", g)]
        if m == "exp":
            return [bin("mul", g, y)]
        if m == "log":
            return [bin("div", g, x)]
        if m == "sqrt":
            two = b.op1(Constant(np.asarray(2.0, dtype=np.float32)), phase=P)
            twoc = b.op1(CastLike(), two, y, phase=P)
            return [bin("div", g, bin("mul", twoc, y))]
        if m == "tanh":
            one = _const_like(b, 1.0, y, P)
            return [bin("mul", g, bin("sub", one, bin("mul", y, y)))]
        if m == "sigmoid":
            one = _const_like(b, 1.0, y, P)
            return [bin("mul", g, bin("mul", y, bin("sub", one, y)))]
        if m == "relu":
            zero = _const_like(b, 0.0, x, P)
            gt = b.op1(SimpleBinary("gt"), x, zero, phase=P)
            mask = b.op1(CastLike(), gt, g, phase=P)
            return [bin("mul", g, mask)]
        if m == "erf":
            # d/dx erf(x) = 2/sqrt(pi) * exp(-x^2)
            c = _const_like(b, 2.0 / np.sqrt(np.pi), x, P)
            xx = bin("mul", x, x)
            e = u("exp", u("neg", xx))
            return [bin("mul", g, bin("mul", c, e))]
        if m == "abs":
            return [bin("mul", g, u("sign", x))]
        if m == "sin":
            return [bin("mul", g, u("cos", x))]
        if m == "cos":
            return [u("neg", bin("mul", g, u("sin", x)))]
        if m == "reciprocal":
            return [u("neg", bin("mul", g, bin("mul", y, y)))]
        if m == "softplus":
            return [bin("mul", g, u("sigmoid", x))]
        if m in ("floor", "ceil", "round", "sign"):
            # piecewise-constant: zero gradient almost everywhere
            zero = _const_like(b, 0.0, g, P)
            return [bin("mul", g, zero)]
        if m == "tan":
            one = _const_like(b, 1.0, y, P)
            return [bin("mul", g, bin("add", one, bin("mul", y, y)))]
        if m in ("asin", "acos"):
            one = _const_like(b, 1.0, x, P)
            d = u("sqrt", bin("sub", one, bin("mul", x, x)))
            r = bin("div", g, d)
            return [u("neg", r) if m == "acos" else r]
        if m == "atan":
            one = _const_like(b, 1.0, x, P)
            return [bin("div", g, bin("add", one, bin("mul", x, x)))]
        if m == "sinh":
            return [bin("mul", g, u("cosh", x))]
        if m == "cosh":
            return [bin("mul", g, u("sinh", x))]
        if m == "asinh":
            one = _const_like(b, 1.0, x, P)
            return [bin("div", g, u("sqrt", bin("add", bin("mul", x, x),
                                                one)))]
        if m == "acosh":
            one = _const_like(b, 1.0, x, P)
            return [bin("div", g, u("sqrt", bin("sub", bin("mul", x, x),
                                                one)))]
        if m == "atanh":
            one = _const_like(b, 1.0, x, P)
            return [bin("div", g, bin("sub", one, bin("mul", x, x)))]
        raise NotImplementedError(f"backward for unary {m}")


def _const_like(b: MilliGraph, v: float, like: int, phase: Phase) -> int:
    c = b.op1(Constant(np.asarray(v, dtype=np.float32)), phase=phase)
    return b.op1(CastLike(), c, like, phase=phase)


# ---------------------------------------------------------------------------
# binary
# ---------------------------------------------------------------------------

_BOOL_MODES = ("eq", "ne", "lt", "le", "gt", "ge", "and", "or", "xor")


@dataclass
class SimpleBinary(MilliOp):
    mode: str = "add"
    KIND = "SimpleBinary"

    def eval(self, inputs):
        a, c = inputs
        m = self.mode
        if m == "add":
            return [binary_compute(a, c, np.add)]
        if m == "sub":
            return [binary_compute(a, c, np.subtract)]
        if m == "mul":
            return [binary_compute(a, c, np.multiply)]
        if m == "div":
            if a.dtype.kind == "u":
                return [a // c]
            if a.dtype.kind == "i":  # ONNX integer Div truncates toward zero
                q = (np.abs(a) // np.abs(c)) * (np.sign(a) * np.sign(c))
                return [q.astype(a.dtype)]
            return [binary_compute(a, c, np.divide)]
        if m == "mod":  # fmod=0: sign of divisor (python %)
            return [binary_compute(a, c, np.mod)]
        if m == "fmod":
            return [binary_compute(a, c, np.fmod)]
        if m == "max":
            return [binary_compute(a, c, np.maximum)]
        if m == "min":
            return [binary_compute(a, c, np.minimum)]
        if m == "and":
            return [np.logical_and(a, c)]
        if m == "or":
            return [np.logical_or(a, c)]
        if m == "xor":
            return [np.logical_xor(a, c)]
        if m == "bitand":
            return [np.bitwise_and(a, c)]
        if m == "bitor":
            return [np.bitwise_or(a, c)]
        if m == "bitxor":
            return [np.bitwise_xor(a, c)]
        if m == "bitshift_left":
            return [np.left_shift(a, c)]
        if m == "bitshift_right":
            return [np.right_shift(a, c)]
        if m in _BOOL_MODES:
            fn = {"eq": np.equal, "ne": np.not_equal, "lt": np.less, "le": np.less_equal,
                  "gt": np.greater, "ge": np.greater_equal}[m]
            return [binary_compute(a, c, fn, bool_out=True)]
        raise NotImplementedError(m)

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        a, c = inputs
        m = self.mode
        table = {
            "add": jnp.add, "sub": jnp.subtract, "mul": jnp.multiply,
            "div": jnp.divide, "mod": jnp.mod, "fmod": jnp.fmod,
            "max": jnp.maximum, "min": jnp.minimum,
            "and": jnp.logical_and, "or": jnp.logical_or, "xor": jnp.logical_xor,
            "bitand": jnp.bitwise_and, "bitor": jnp.bitwise_or, "bitxor": jnp.bitwise_xor,
            "bitshift_left": jnp.left_shift, "bitshift_right": jnp.right_shift,
            "eq": jnp.equal, "ne": jnp.not_equal, "lt": jnp.less, "le": jnp.less_equal,
            "gt": jnp.greater, "ge": jnp.greater_equal,
        }
        out = table[m](a, c)
        if m == "div" and jnp.issubdtype(a.dtype, jnp.integer):
            # ONNX integer Div truncates toward zero
            out = jnp.sign(a) * jnp.sign(c) * (jnp.abs(a) // jnp.abs(c))
            out = out.astype(a.dtype)
        return [out]

    def infer(self, infos):
        if all(i.level is Level.NUMERIC for i in infos):
            out = self.eval([i.value for i in infos])[0]
            return [TensorInfo.numeric(out)]
        dt = DType.BOOL if self.mode in _BOOL_MODES else None
        return [elementwise_infer(infos, out_dtype=dt)]

    def backward(self, b, node, out_grads):
        g = out_grads[0]
        if g is None:
            return [None, None]
        a, c = node.inputs
        P = Phase.BACKWARD
        m = self.mode

        def bin(mode, x, y):
            return b.op1(SimpleBinary(mode), x, y, phase=P)

        if m == "add":
            return [_sum_to_like(b, g, a, P), _sum_to_like(b, g, c, P)]
        if m == "sub":
            ng = b.op1(SimpleUnary("neg"), g, phase=P)
            return [_sum_to_like(b, g, a, P), _sum_to_like(b, ng, c, P)]
        if m == "mul":
            return [_sum_to_like(b, bin("mul", g, c), a, P),
                    _sum_to_like(b, bin("mul", g, a), c, P)]
        if m == "div":
            ga = bin("div", g, c)
            y = node.outputs[0]
            gc = b.op1(SimpleUnary("neg"), bin("div", bin("mul", g, y), c), phase=P)
            return [_sum_to_like(b, ga, a, P), _sum_to_like(b, gc, c, P)]
        if m in ("max", "min"):
            cmp = "ge" if m == "max" else "le"
            mask = b.op1(SimpleBinary(cmp), a, c, phase=P)
            maskf = b.op1(CastLike(), mask, g, phase=P)
            one = _const_like(b, 1.0, g, P)
            inv = bin("sub", one, maskf)
            return [_sum_to_like(b, bin("mul", g, maskf), a, P),
                    _sum_to_like(b, bin("mul", g, inv), c, P)]
        raise NotImplementedError(f"backward for binary {m}")


@dataclass
class Pow(MilliOp):
    KIND = "Pow"

    def eval(self, inputs):
        a, c = inputs
        xa, oa = upcast_for_compute(a)
        xc, _ = upcast_for_compute(c)
        out = np.power(xa, xc.astype(xa.dtype) if xa.dtype.kind == "f" else xc)
        from .common import downcast_result

        return [downcast_result(out.astype(xa.dtype), oa)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        a, c = inputs
        return [jnp.power(a, c.astype(a.dtype)).astype(a.dtype)]

    def infer(self, infos):
        if all(i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        return [elementwise_infer([infos[0], TensorInfo(infos[0].dtype, infos[1].level,
                                                        shape=infos[1].shape, rank_=infos[1].rank_)])]

    def backward(self, b, node, out_grads):
        g = out_grads[0]
        if g is None:
            return [None, None]
        a, c = node.inputs
        y = node.outputs[0]
        P = Phase.BACKWARD

        def bin(mode, x, z):
            return b.op1(SimpleBinary(mode), x, z, phase=P)

        one = _const_like(b, 1.0, a, P)
        cm1 = bin("sub", b.op1(CastLike(), c, a, phase=P), one)
        ga = bin("mul", g, bin("mul", b.op1(CastLike(), c, a, phase=P), b.op1(Pow(), a, cm1, phase=P)))
        lg = b.op1(SimpleUnary("log"), a, phase=P)
        gc = bin("mul", g, bin("mul", y, lg))
        return [_sum_to_like(b, ga, a, P), _sum_to_like(b, gc, c, P)]


@dataclass
class ClampMin(MilliOp):
    """Elementwise max with a scalar (used by clip lowering and norms)."""

    value: float = 0.0
    KIND = "ClampMin"

    def eval(self, inputs):
        x = inputs[0]
        return [unary_compute(x, lambda v: np.maximum(v, np.asarray(self.value, dtype=v.dtype)))]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        x = inputs[0]
        return [jnp.maximum(x, jnp.asarray(self.value, dtype=x.dtype))]

    def infer(self, infos):
        i = infos[0]
        if i.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([i.value])[0])]
        return [i]


@dataclass
class Where(MilliOp):
    """Select(cond, a, b)."""

    KIND = "Where"

    def eval(self, inputs):
        cond, a, c = inputs
        return [np.where(cond, a, c).astype(np.result_type(a, c) if a.dtype != c.dtype else a.dtype)]

    def to_jax(self, inputs, static=None):
        import jax.numpy as jnp

        return [jnp.where(*inputs)]

    def infer(self, infos):
        if all(i.level is Level.NUMERIC for i in infos):
            return [TensorInfo.numeric(self.eval([i.value for i in infos])[0])]
        dt = infos[1].dtype
        return [elementwise_infer(infos, out_dtype=dt)]

    def backward(self, b, node, out_grads):
        g = out_grads[0]
        if g is None:
            return [None, None, None]
        cond, a, c = node.inputs
        P = Phase.BACKWARD
        zero = _const_like(b, 0.0, g, P)
        ga = b.op1(Where(), cond, g, zero, phase=P)
        gc = b.op1(Where(), cond, zero, g, phase=P)
        return [None, _sum_to_like(b, ga, a, P), _sum_to_like(b, gc, c, P)]


# ---------------------------------------------------------------------------
# matmul with explicit accumulate dtype
# ---------------------------------------------------------------------------


@dataclass
class MatMul(MilliOp):
    """Batched matmul (numpy semantics) with explicit accumulation dtype.

    Reference: src/milli_graph/ops/binary.rs:530-620 — bf16/f16 inputs
    accumulate in f32. On TPU this maps to the MXU's native f32
    accumulator via preferred_element_type (or the Pallas matmul kernel).
    """

    accumulate: Optional[DType] = None  # None = dtype-default
    out_dtype: Optional[DType] = None   # None = input dtype
    KIND = "MatMul"

    def _acc(self, in_dt: DType) -> DType:
        return self.accumulate or in_dt.accumulate_dtype()

    def eval(self, inputs):
        a, c = inputs
        in_dt = DType.from_numpy(a.dtype)
        acc = self._acc(in_dt)
        out_dt = self.out_dtype or in_dt
        an = a.astype(acc.to_numpy(), copy=False)
        cn = c.astype(acc.to_numpy(), copy=False)
        out = np.matmul(an, cn)
        return [out.astype(out_dt.to_numpy(), copy=False)]

    def to_jax(self, inputs, static=None):
        import jax
        import jax.numpy as jnp

        a, c = inputs
        in_dt = DType.from_numpy(np.dtype(a.dtype))
        acc = self._acc(in_dt)
        out_dt = self.out_dtype or in_dt
        # f32/f64 inputs: force true-precision MXU passes to match the
        # oracle. f16 too — the MXU would truncate its 10-bit mantissa
        # to bf16's 7. bf16/int inputs are natively exact.
        precision = (jax.lax.Precision.HIGHEST
                     if in_dt in (DType.F32, DType.F64, DType.F16)
                     else None)
        out = jnp.matmul(a, c, preferred_element_type=acc.to_jax(),
                         precision=precision)
        return [out.astype(out_dt.to_jax())]

    def infer(self, infos):
        a, c = infos
        out_dt = self.out_dtype or a.dtype
        if a.level is Level.NUMERIC and c.level is Level.NUMERIC:
            return [TensorInfo.numeric(self.eval([a.value, c.value])[0], out_dt)]
        da, dc = a.dims(), c.dims()
        if da is not None and dc is not None:
            from ...scalar_info import ScalarInfo

            da, dc = list(da), list(dc)
            squeeze_a = squeeze_c = False
            if len(da) == 1:
                da = [ScalarInfo.of(1)] + da
                squeeze_a = True
            if len(dc) == 1:
                dc = dc + [ScalarInfo.of(1)]
                squeeze_c = True
            from .common import broadcast_dims

            batch = broadcast_dims(da[:-2], dc[:-2])
            if batch is not None:
                dims = batch + [da[-2], dc[-1]]
                if squeeze_a:
                    dims.pop(-2)
                if squeeze_c:
                    dims.pop(-1)
                return [TensorInfo.shaped(out_dt, dims)]
        if a.rank is not None and c.rank is not None:
            return [TensorInfo.ranked(out_dt, max(a.rank, c.rank))]
        return [TensorInfo.minimal(out_dt)]

    def backward(self, b, node, out_grads):
        from .shape import Transpose

        g = out_grads[0]
        if g is None:
            return [None, None]
        a, c = node.inputs
        P = Phase.BACKWARD
        # dA = g @ c^T ; dC = a^T @ g   (last-two-dims transpose)
        ct = b.op1(Transpose(perm=None, swap_last2=True), c, phase=P)
        at = b.op1(Transpose(perm=None, swap_last2=True), a, phase=P)
        ga = b.op1(MatMul(self.accumulate, self.out_dtype), g, ct, phase=P)
        gc = b.op1(MatMul(self.accumulate, self.out_dtype), at, g, phase=P)
        return [_sum_to_like(b, ga, a, P), _sum_to_like(b, gc, c, P)]
