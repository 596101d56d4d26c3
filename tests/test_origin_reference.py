"""WeightStorage.origin_reference(): exported ONNX initializers point
back at the ORIGINAL checkpoint file instead of embedding payloads.

Reference: crates/whisper-tensor-import/src/onnx_graph/mod.rs:56-80
(WeightStorageStrategy::OriginReference) + weights.rs:233-420
(OriginReferenceOutputManager): external_data entries carry
format/tensor_name/location (+offset/length for pth), and loading the
exported model resolves weights from the origin checkpoint.
"""

import numpy as np
import torch

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.importers.onnx_builder import (OnnxBuilder,
                                                       WeightStorage)
from whisper_tensor_tpu.model import Model
from whisper_tensor_tpu.onnx_pb import ModelProto

rng = np.random.default_rng(11)


def _build(w_lazy, b_arr):
    b = OnnxBuilder()
    x = b.input("x", DType.F32, (2, 4))
    w = b.initializer("w", w_lazy)
    bias = b.initializer("b", b_arr)
    h = b.node("MatMul", [x, w])
    b.node("Add", [h, bias], outputs=["y"])
    b.output("y", DType.F32, (2, 3))
    return b


def test_safetensors_origin_round_trip(tmp_path):
    from safetensors.numpy import save_file

    from whisper_tensor_tpu.importers.safetensors_io import SafetensorsStore

    W = rng.standard_normal((4, 3)).astype(np.float32)
    B = rng.standard_normal((3,)).astype(np.float32)
    ckpt = tmp_path / "model.safetensors"
    save_file({"w": W}, str(ckpt))

    st = SafetensorsStore([str(ckpt)])
    onnx_bytes = _build(st.lazy("w"), B).build(
        WeightStorage.origin_reference())

    # the exported bytes carry NO payload for w: external_data points
    # at the origin checkpoint with the reference's key set
    mp = ModelProto.parse(onnx_bytes)
    tp = {t.name: t for t in mp.graph.initializer}["w"]
    assert tp.data_location == 1 and not tp.raw_data
    meta = {e.key: e.value for e in tp.external_data}
    assert meta["format"] == "safetensors"
    assert meta["tensor_name"] == "w"
    assert meta["location"] == str(ckpt)
    # origin-less initializers (generated arrays) embed inline
    tb = {t.name: t for t in mp.graph.initializer}["b"]
    assert tb.data_location != 1

    m = Model.new_from_onnx(onnx_bytes)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    out = np.asarray(m.eval({"x": x}, mode="oracle")["y"])
    np.testing.assert_allclose(out, x @ W + B, rtol=1e-5)


def test_pth_origin_round_trip(tmp_path):
    from whisper_tensor_tpu.importers.pth import load_pth_lazy

    W = rng.standard_normal((4, 3)).astype(np.float32)
    B = rng.standard_normal((3,)).astype(np.float32)
    ckpt = tmp_path / "model.pth"
    torch.save({"w": torch.from_numpy(W), "b": torch.from_numpy(B)},
               str(ckpt))

    lazy = load_pth_lazy(str(ckpt))
    assert set(lazy) == {"w", "b"}
    lw = lazy["w"]
    assert lw.origin is not None and lw.origin["format"] == "pth"
    # the byte span must BE the tensor: raw seek+read reproduces it
    with open(ckpt, "rb") as f:
        f.seek(lw.origin["offset"])
        raw = f.read(lw.origin["length"])
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.float32).reshape(4, 3), W)
    # and the LazyWeight loader agrees
    np.testing.assert_array_equal(lw.load(), W)

    onnx_bytes = _build(lw, B).build(WeightStorage.origin_reference())
    mp = ModelProto.parse(onnx_bytes)
    tp = {t.name: t for t in mp.graph.initializer}["w"]
    meta = {e.key: e.value for e in tp.external_data}
    assert meta["format"] == "pth" and meta["tensor_name"] == "w"
    assert int(meta["length"]) == W.nbytes

    m = Model.new_from_onnx(onnx_bytes)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    out = np.asarray(m.eval({"x": x}, mode="oracle")["y"])
    np.testing.assert_allclose(out, x @ W + B, rtol=1e-5)


def test_pth_lazy_nested_and_noncontiguous(tmp_path):
    """Nested state dicts flatten dotted; non-contiguous tensors still
    load (via the pickle VM) but carry NO origin span."""
    W = rng.standard_normal((6, 4)).astype(np.float32)
    ckpt = tmp_path / "m.pth"
    torch.save({"enc": {"w": torch.from_numpy(W).t()}}, str(ckpt))
    from whisper_tensor_tpu.importers.pth import load_pth_lazy

    lazy = load_pth_lazy(str(ckpt))
    lw = lazy["enc.w"]
    # torch.save(.t()) stores the transposed VIEW with swapped strides
    np.testing.assert_array_equal(lw.load(), W.T)
    assert lw.origin is None  # non-contiguous: no raw byte span
