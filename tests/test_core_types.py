"""Core type system tests: dtypes, packed formats, scalar/tensor info,
ONNX protobuf codec round-trips.

Mirrors the reference's inline unit tests for dtype/packed_format/
tensor_info (reference: src/dtype.rs, src/packed_format.rs:44-79,
src/tensor_info.rs) and the prost codec usage.
"""

import numpy as np
import pytest

from whisper_tensor_tpu import (DType, Level, NumericTensor, PackedFormat,
                                PackedTensor, ScalarInfo, SymbolicResolver,
                                TensorInfo)
from whisper_tensor_tpu.onnx_pb import (AttributeProto, AttrType, GraphProto,
                                        ModelProto, NodeProto,
                                        OperatorSetIdProto,
                                        numpy_to_tensor_proto,
                                        tensor_proto_to_numpy)


class TestDType:
    def test_sizes(self):
        assert DType.F32.size_bytes == 4
        assert DType.BF16.size_bytes == 2
        assert DType.F8E4M3.size_bytes == 1
        assert DType.U4.size_bytes == 0.5
        assert DType.STRING.size_bytes is None

    def test_numpy_round_trip(self):
        for dt in DType:
            if dt in (DType.STRING, DType.U4, DType.I4):
                continue
            assert DType.from_numpy(dt.to_numpy()) == dt

    def test_accumulate(self):
        assert DType.BF16.accumulate_dtype() == DType.F32
        assert DType.F16.accumulate_dtype() == DType.F32
        assert DType.I8.accumulate_dtype() == DType.I32
        assert DType.F32.accumulate_dtype() == DType.F32

    def test_bf16_is_real_bf16(self):
        arr = np.asarray([1.0, 2.5], dtype=DType.BF16.to_numpy())
        assert arr.dtype.itemsize == 2


class TestPackedFormat:
    def test_block_math(self):
        assert PackedFormat.Q4_0.block_size == 32
        assert PackedFormat.Q4_0.block_bytes == 18
        assert PackedFormat.Q8_0.block_bytes == 34
        assert PackedFormat.Q4_K.block_size == 256
        assert PackedFormat.Q4_K.block_bytes == 144
        assert PackedFormat.Q6_K.block_bytes == 210
        assert abs(PackedFormat.Q4_0.bits_per_weight - 4.5) < 1e-9

    def test_storage_bytes(self):
        assert PackedFormat.Q8_0.storage_bytes(64) == 68
        with pytest.raises(ValueError):
            PackedFormat.Q8_0.storage_bytes(33)


class TestDequant:
    def test_q8_0_round_trip(self):
        # build a Q8_0 block by hand: d=0.5 (f16), weights -3..28
        import struct

        q = np.arange(-3, 29, dtype=np.int8)
        data = struct.pack("<e", 0.5) + q.tobytes()
        t = PackedTensor(data, PackedFormat.Q8_0, (32,))
        out = t.dequantize().numpy()
        np.testing.assert_allclose(out, q.astype(np.float32) * 0.5, rtol=1e-3)

    def test_q4_0_round_trip(self):
        import struct

        lo = np.arange(16, dtype=np.uint8)
        hi = np.arange(16, dtype=np.uint8)[::-1]
        packed = (lo | (hi << 4)).astype(np.uint8)
        data = struct.pack("<e", 2.0) + packed.tobytes()
        t = PackedTensor(data, PackedFormat.Q4_0, (32,))
        out = t.dequantize().numpy()
        expect = np.concatenate([lo.astype(np.int8) - 8, hi.astype(np.int8) - 8]).astype(np.float32) * 2.0
        np.testing.assert_allclose(out, expect)


class TestScalarInfo:
    def test_arith(self):
        r = SymbolicResolver()
        s = r.new_symbol("seq")
        a = ScalarInfo.of(s)
        b = a + ScalarInfo.of(3)
        assert b.symbolic.offset == 3
        assert b.equals(ScalarInfo.of(s) + ScalarInfo.of(3)) is True
        assert a.equals(b) is False
        assert ScalarInfo.of(4).equals(ScalarInfo.of(4)) is True

    def test_named_interning(self):
        r = SymbolicResolver()
        assert r.new_symbol("x").same_symbol(r.new_symbol("x"))
        assert not r.new_symbol("x").same_symbol(r.new_symbol("y"))


class TestTensorInfo:
    def test_lattice_levels(self):
        v = TensorInfo.numeric(np.arange(6, dtype=np.float32).reshape(2, 3))
        assert v.level == Level.NUMERIC
        s = v.forget_value()
        assert s.level == Level.SHAPED and s.concrete_shape() == (2, 3)
        rk = s.forget_shape()
        assert rk.level == Level.RANKED and rk.rank == 2
        m = rk.forget_rank()
        assert m.level == Level.MINIMAL

    def test_consistency(self):
        truth = TensorInfo.numeric(np.zeros((2, 3), dtype=np.float32))
        assert TensorInfo.shaped(DType.F32, [2, 3]).consistent_with(truth)
        assert not TensorInfo.shaped(DType.F32, [2, 4]).consistent_with(truth)
        assert not TensorInfo.minimal(DType.I32).consistent_with(truth)
        r = SymbolicResolver()
        sym_shape = TensorInfo.shaped(DType.F32, [2, r.new_symbol()])
        assert sym_shape.consistent_with(truth)


class TestOnnxPb:
    def test_model_round_trip(self):
        m = ModelProto(ir_version=9, producer_name="wt-tpu")
        attr = AttributeProto(name="axis", i=-1, type=AttrType.INT)
        n = NodeProto(op_type="Softmax", input=["x"], output=["y"], attribute=[attr])
        w = numpy_to_tensor_proto(np.arange(6, dtype=np.float32).reshape(2, 3), "w")
        m.graph = GraphProto(name="g", node=[n], initializer=[w])
        m.opset_import = [OperatorSetIdProto(domain="", version=21)]
        m2 = ModelProto.parse(m.dumps())
        assert m2.ir_version == 9
        assert m2.graph.node[0].op_type == "Softmax"
        assert m2.graph.node[0].attribute[0].i == -1
        arr = tensor_proto_to_numpy(m2.graph.initializer[0])
        np.testing.assert_array_equal(arr, np.arange(6, dtype=np.float32).reshape(2, 3))

    def test_bf16_tensor_proto(self):
        arr = np.asarray([[1.5, -2.0]], dtype=DType.BF16.to_numpy())
        tp = numpy_to_tensor_proto(arr, "t", DType.BF16)
        back = tensor_proto_to_numpy(tp)
        assert back.dtype == DType.BF16.to_numpy()
        np.testing.assert_array_equal(back.astype(np.float32), arr.astype(np.float32))

    def test_string_tensor(self):
        arr = np.array(["ab", "cd"], dtype=object)
        tp = numpy_to_tensor_proto(arr, "s", DType.STRING)
        back = tensor_proto_to_numpy(tp)
        assert list(back) == ["ab", "cd"]
