"""Seeded differential fuzzing: random small ONNX graphs through the
full Model path on BOTH backends (oracle interpreter vs XLA jit).

Extends the reference's cross-backend differential strategy (NDArray vs
Vulkan, SURVEY §4) from fixed cases to generated graphs: random chains
of elementwise/activation ops with random broadcastable shapes, random
reduce/shape tails. Failures reproduce from the printed seed.
"""

import numpy as np
import pytest

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
from whisper_tensor_tpu.model import Model

UNARY = ["Neg", "Abs", "Sigmoid", "Tanh", "Relu", "Softplus", "Exp",
         "Sin", "Cos", "Erf", "Gelu", "HardSwish", "Mish", "Softsign"]
BINARY = ["Add", "Sub", "Mul", "Max", "Min"]
REDUCE = ["ReduceSum", "ReduceMean", "ReduceMax", "ReduceMin"]


def _random_graph(rng: np.random.Generator):
    """Build a random graph; returns (model, feeds)."""
    b = OnnxBuilder("fuzz", opset=23)
    rank = int(rng.integers(1, 5))
    shape = [int(rng.integers(1, 5)) for _ in range(rank)]
    x = rng.standard_normal(shape).astype(np.float32)
    b.input("x", DType.F32, shape)
    feeds = {"x": x}
    cur, cur_shape = "x", list(shape)
    n_ops = int(rng.integers(2, 7))
    for k in range(n_ops):
        kind = rng.choice(["unary", "binary", "transpose", "unsqueeze"])
        if kind == "unary":
            cur = b.node(str(rng.choice(UNARY)), [cur])
        elif kind == "binary":
            # random broadcastable second operand (suffix dims, some 1s)
            nb = int(rng.integers(1, len(cur_shape) + 1))
            bshape = [d if rng.random() < 0.6 else 1
                      for d in cur_shape[-nb:]]
            name = f"y{k}"
            yv = (rng.standard_normal(bshape) * 0.7 + 0.5).astype(np.float32)
            b.input(name, DType.F32, bshape)
            feeds[name] = yv
            cur = b.node(str(rng.choice(BINARY)), [cur, name])
        elif kind == "transpose" and len(cur_shape) > 1:
            perm = list(rng.permutation(len(cur_shape)))
            cur = b.node("Transpose", [cur], perm=[int(p) for p in perm])
            cur_shape = [cur_shape[p] for p in perm]
        else:
            ax = int(rng.integers(0, len(cur_shape) + 1))
            cur = b.node("Unsqueeze",
                         [cur, b.const(np.asarray([ax], np.int64))])
            cur_shape.insert(ax, 1)
    if rng.random() < 0.5 and len(cur_shape) >= 1:
        ax = int(rng.integers(0, len(cur_shape)))
        keep = int(rng.integers(0, 2))
        cur = b.node(str(rng.choice(REDUCE)),
                     [cur, b.const(np.asarray([ax], np.int64))],
                     keepdims=keep)
        if keep:
            cur_shape[ax] = 1
        else:
            cur_shape.pop(ax)
    b.node("Identity", [cur], outputs=["out"])
    b.output("out", DType.F32, cur_shape)
    return Model.new_from_onnx(b.build(), name="fuzz"), feeds


@pytest.mark.parametrize("seed", range(60))
def test_random_graph_oracle_vs_xla(seed):
    rng = np.random.default_rng(987_000 + seed)
    model, feeds = _random_graph(rng)
    a = np.asarray(model.eval(feeds, mode="oracle")["out"])
    c = np.asarray(model.eval(feeds, mode="xla")["out"])
    assert a.shape == c.shape, (seed, a.shape, c.shape)
    np.testing.assert_allclose(c, a, rtol=1e-4, atol=1e-5,
                               err_msg=f"seed={seed}")
