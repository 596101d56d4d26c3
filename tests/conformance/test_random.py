"""RandomNormalLike conformance: statistical (the one node the exact
harness can't cover — the official corpus also checks it by moments)."""

import numpy as np

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import OnnxBuilder
from whisper_tensor_tpu.model import Model


def _build(mean, scale, seed=None):
    b = OnnxBuilder("rnl", opset=23)
    b.input("x", DType.F32, [200, 500])
    attrs = {"mean": mean, "scale": scale}
    if seed is not None:
        attrs["seed"] = float(seed)
    b.node("RandomNormalLike", ["x"], outputs=["out_0"], **attrs)
    b.output("out_0", DType.F32, [200, 500])
    return Model.new_from_onnx(b.build(), name="rnl")


def test_random_normal_like_moments():
    x = np.zeros((200, 500), np.float32)
    for mode in ("oracle", "xla"):
        out = np.asarray(_build(1.5, 0.5, seed=7).eval(
            {"x": x}, mode=mode)["out_0"])
        assert out.shape == x.shape and out.dtype == np.float32
        # se(mean) = 0.5/sqrt(1e5) ~ 0.0016; allow 6 sigma
        assert abs(out.mean() - 1.5) < 0.01, out.mean()
        assert abs(out.std() - 0.5) < 0.01, out.std()


def test_random_normal_like_seed_variation():
    x = np.zeros((200, 500), np.float32)
    a = np.asarray(_build(0.0, 1.0, seed=1).eval({"x": x},
                                                 mode="oracle")["out_0"])
    b = np.asarray(_build(0.0, 1.0, seed=2).eval({"x": x},
                                                 mode="oracle")["out_0"])
    assert not np.allclose(a, b)
