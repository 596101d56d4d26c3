"""Milli-op oracle unit tests, cross-checked against torch where torch has
the op (oracles-instead-of-mocks strategy; reference tests/numeric_tensor_tests/).
"""

import numpy as np
import pytest

import ml_dtypes

from whisper_tensor_tpu.dtype import DType
from whisper_tensor_tpu.milli import MilliGraph
from whisper_tensor_tpu.milli.ops import (ArgMinMax, Cast, Concat, Conv,
                                          CumSum, Expand, Gather,
                                          GatherElements, GatherGrad, MatMul,
                                          Pad, Pow, Reduce, Reshape, Resize,
                                          SimpleBinary, SimpleUnary, Slice,
                                          Split, SumTo, TopK, Transpose,
                                          Where)


def run1(op, *arrays, n_outputs=None):
    g = MilliGraph()
    ids = [g.add_input(f"i{k}") for k in range(len(arrays))]
    outs = g.add_op(op, ids, n_outputs=n_outputs)
    for k, o in enumerate(outs):
        g.mark_output(f"o{k}", o)
    res = g.eval({f"i{k}": a for k, a in enumerate(arrays)})
    return [res[f"o{k}"] for k in range(len(outs))]


class TestMatMul:
    def test_f32(self):
        a = np.random.randn(3, 4, 5).astype(np.float32)
        b = np.random.randn(5, 6).astype(np.float32)
        (out,) = run1(MatMul(), a, b)
        np.testing.assert_allclose(out, a @ b, rtol=1e-6)

    def test_bf16_f32_accumulate_bit_exact(self):
        a = np.random.randn(16, 32).astype(ml_dtypes.bfloat16)
        b = np.random.randn(32, 8).astype(ml_dtypes.bfloat16)
        (out,) = run1(MatMul(), a, b)
        ref = (a.astype(np.float32) @ b.astype(np.float32)).astype(ml_dtypes.bfloat16)
        assert out.dtype == np.dtype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(out.view(np.uint16), ref.view(np.uint16))

    def test_int_matmul(self):
        a = np.random.randint(-5, 5, (4, 4)).astype(np.int8)
        b = np.random.randint(-5, 5, (4, 4)).astype(np.int8)
        (out,) = run1(MatMul(), a, b)
        ref = a.astype(np.int32) @ b.astype(np.int32)
        np.testing.assert_array_equal(out.astype(np.int32), ref.astype(np.int8))

    def test_1d_cases(self):
        a = np.random.randn(5).astype(np.float32)
        b = np.random.randn(5, 3).astype(np.float32)
        (out,) = run1(MatMul(), a, b)
        assert out.shape == (3,)
        np.testing.assert_allclose(out, a @ b, rtol=1e-6)


class TestElementwise:
    def test_binary_vs_torch(self):
        import torch

        a = np.random.randn(3, 4).astype(np.float32)
        b = np.random.randn(4).astype(np.float32)
        for mode, tfn in [("add", torch.add), ("sub", torch.sub),
                          ("mul", torch.mul), ("div", torch.div),
                          ("max", torch.maximum), ("min", torch.minimum)]:
            (out,) = run1(SimpleBinary(mode), a, b)
            ref = tfn(torch.from_numpy(a), torch.from_numpy(b)).numpy()
            np.testing.assert_allclose(out, ref, rtol=1e-6, err_msg=mode)

    def test_int_div_truncates(self):
        a = np.asarray([-7, 7, -7], dtype=np.int32)
        b = np.asarray([2, -2, -2], dtype=np.int32)
        (out,) = run1(SimpleBinary("div"), a, b)
        np.testing.assert_array_equal(out, [-3, -3, 3])

    def test_unary_vs_torch(self):
        import torch

        x = np.random.randn(64).astype(np.float32)
        cases = {"exp": torch.exp, "tanh": torch.tanh, "erf": torch.erf,
                 "sigmoid": torch.sigmoid, "sqrt": lambda t: torch.sqrt(torch.abs(t)),
                 "relu": torch.relu, "floor": torch.floor, "round": torch.round}
        for mode, tfn in cases.items():
            xin = np.abs(x) if mode == "sqrt" else x
            (out,) = run1(SimpleUnary(mode), xin)
            ref = tfn(torch.from_numpy(x)).numpy()
            np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7, err_msg=mode)

    def test_bf16_elementwise_bit_exact(self):
        x = np.random.randn(33).astype(ml_dtypes.bfloat16)
        (out,) = run1(SimpleUnary("exp"), x)
        ref = np.exp(x.astype(np.float32)).astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(out.view(np.uint16), ref.view(np.uint16))

    def test_pow(self):
        a = np.abs(np.random.randn(8)).astype(np.float32) + 0.1
        b = np.asarray(2.0, dtype=np.float32)
        (out,) = run1(Pow(), a, b)
        np.testing.assert_allclose(out, a ** 2, rtol=1e-6)

    def test_where(self):
        c = np.asarray([True, False, True])
        (out,) = run1(Where(), c, np.asarray([1, 2, 3]), np.asarray([9, 9, 9]))
        np.testing.assert_array_equal(out, [1, 9, 3])


class TestShapeOps:
    def test_reshape_infer_neg1_zero(self):
        x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        (out,) = run1(Reshape(), x, np.asarray([0, -1], dtype=np.int64))
        assert out.shape == (2, 12)

    def test_transpose(self):
        x = np.random.randn(2, 3, 4).astype(np.float32)
        (out,) = run1(Transpose(perm=[2, 0, 1]), x)
        np.testing.assert_array_equal(out, np.transpose(x, (2, 0, 1)))

    def test_slice_negative_step(self):
        x = np.arange(10, dtype=np.float32)
        (out,) = run1(Slice(), x,
                      np.asarray([9], dtype=np.int64),
                      np.asarray([-100], dtype=np.int64),
                      np.asarray([0], dtype=np.int64),
                      np.asarray([-2], dtype=np.int64))
        np.testing.assert_array_equal(out, [9, 7, 5, 3, 1])

    def test_concat_split(self):
        a = np.random.randn(2, 3).astype(np.float32)
        b = np.random.randn(2, 5).astype(np.float32)
        (cat,) = run1(Concat(axis=1), a, b)
        assert cat.shape == (2, 8)
        parts = run1(Split(axis=1, sizes=[3, 5]), cat)
        np.testing.assert_array_equal(parts[0], a)
        np.testing.assert_array_equal(parts[1], b)

    def test_pad_modes(self):
        x = np.arange(6, dtype=np.float32).reshape(2, 3)
        pads = np.asarray([0, 1, 0, 1], dtype=np.int64)
        (out,) = run1(Pad(mode="constant"), x, pads, np.asarray(9.0, dtype=np.float32))
        assert out.shape == (2, 5)
        assert out[0, 0] == 9.0
        (refl,) = run1(Pad(mode="reflect"), x, pads)
        np.testing.assert_array_equal(refl[0], [1, 0, 1, 2, 1])

    def test_sum_to(self):
        x = np.ones((4, 3, 5), dtype=np.float32)
        (out,) = run1(SumTo(), x, np.asarray([3, 1], dtype=np.int64))
        assert out.shape == (3, 1)
        np.testing.assert_array_equal(out, np.full((3, 1), 20.0))

    def test_expand(self):
        x = np.arange(3, dtype=np.float32).reshape(3, 1)
        (out,) = run1(Expand(), x, np.asarray([2, 3, 4], dtype=np.int64))
        assert out.shape == (2, 3, 4)


class TestIndexOps:
    def test_gather_negative_indices(self):
        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        (out,) = run1(Gather(axis=0), x, np.asarray([-1, 0], dtype=np.int64))
        np.testing.assert_array_equal(out, x[[2, 0]])

    def test_gather_grad_scatter_add(self):
        shape = np.asarray([4, 3], dtype=np.int64)
        idx = np.asarray([1, 1, 2], dtype=np.int64)
        g = np.ones((3, 3), dtype=np.float32)
        (out,) = run1(GatherGrad(axis=0), shape, idx, g)
        np.testing.assert_array_equal(out[1], [2, 2, 2])
        np.testing.assert_array_equal(out[0], [0, 0, 0])

    def test_gather_elements_vs_torch(self):
        import torch

        x = np.random.randn(3, 4).astype(np.float32)
        idx = np.random.randint(0, 4, (3, 2)).astype(np.int64)
        (out,) = run1(GatherElements(axis=1), x, idx)
        ref = torch.gather(torch.from_numpy(x), 1, torch.from_numpy(idx)).numpy()
        np.testing.assert_array_equal(out, ref)


class TestReduce:
    def test_reduce_modes_vs_numpy(self):
        x = np.random.randn(3, 4, 5).astype(np.float32)
        for mode, ref in [("sum", x.sum(axis=(1,))), ("mean", x.mean(axis=(1,))),
                          ("max", x.max(axis=(1,))), ("min", x.min(axis=(1,))),
                          ("prod", x.prod(axis=(1,)))]:
            (out,) = run1(Reduce(mode, axes=[1], keepdims=False), x)
            np.testing.assert_allclose(out, ref, rtol=1e-5, err_msg=mode)

    def test_logsumexp(self):
        import torch

        x = np.random.randn(4, 7).astype(np.float32)
        (out,) = run1(Reduce("logsumexp", axes=[1], keepdims=False), x)
        ref = torch.logsumexp(torch.from_numpy(x), dim=1).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-5)

    def test_argmax_select_last(self):
        x = np.asarray([[1, 3, 3], [2, 2, 0]], dtype=np.float32)
        (out,) = run1(ArgMinMax("max", axis=1, keepdims=False), x)
        np.testing.assert_array_equal(out, [1, 0])
        (out2,) = run1(ArgMinMax("max", axis=1, keepdims=False, select_last_index=True), x)
        np.testing.assert_array_equal(out2, [2, 1])

    def test_cumsum(self):
        x = np.arange(6, dtype=np.float32).reshape(2, 3)
        (out,) = run1(CumSum(), x, np.asarray(1, dtype=np.int64))
        np.testing.assert_array_equal(out, np.cumsum(x, axis=1))
        (exc,) = run1(CumSum(exclusive=True), x, np.asarray(1, dtype=np.int64))
        np.testing.assert_array_equal(exc[:, 0], [0, 0])

    def test_topk_vs_torch(self):
        import torch

        x = np.random.randn(3, 10).astype(np.float32)
        vals, idx = run1(TopK(axis=1), x, np.asarray([4], dtype=np.int64), n_outputs=2)
        tv, ti = torch.topk(torch.from_numpy(x), 4, dim=1)
        np.testing.assert_allclose(vals, tv.numpy(), rtol=1e-6)
        np.testing.assert_array_equal(idx, ti.numpy())


class TestConvResize:
    def test_conv2d_vs_torch(self):
        import torch

        x = np.random.randn(2, 3, 9, 10).astype(np.float32)
        w = np.random.randn(4, 3, 3, 3).astype(np.float32)
        b = np.random.randn(4).astype(np.float32)
        (out,) = run1(Conv(strides=[2, 1], pads=[1, 1, 1, 1], dilations=[1, 2]), x, w, b)
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=(2, 1), padding=(1, 1), dilation=(1, 2)).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_grouped_conv1d_vs_torch(self):
        import torch

        x = np.random.randn(1, 6, 20).astype(np.float32)
        w = np.random.randn(6, 3, 5).astype(np.float32)
        (out,) = run1(Conv(strides=[1], pads=[2, 2], groups=2), x, w)
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), None, padding=2, groups=2).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_resize_linear_vs_torch(self):
        import torch

        x = np.random.randn(1, 2, 5, 7).astype(np.float32)
        scales = np.asarray([1, 1, 2, 2], dtype=np.float32)
        (out,) = run1(Resize(mode="linear", coord_mode="half_pixel"),
                      x, np.zeros(0, dtype=np.float32), scales)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), scale_factor=2, mode="bilinear",
            align_corners=False).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_resize_nearest(self):
        x = np.arange(4, dtype=np.float32).reshape(1, 1, 2, 2)
        scales = np.asarray([1, 1, 2, 2], dtype=np.float32)
        (out,) = run1(Resize(mode="nearest", coord_mode="asymmetric",
                             nearest_mode="floor"),
                      x, np.zeros(0, dtype=np.float32), scales)
        np.testing.assert_array_equal(out[0, 0, 0], [0, 0, 1, 1])


class TestCast:
    def test_cast_f32_to_bf16(self):
        x = np.asarray([1.0000001, 3.14159], dtype=np.float32)
        (out,) = run1(Cast(DType.BF16), x)
        assert out.dtype == np.dtype(ml_dtypes.bfloat16)

    def test_cast_to_bool(self):
        (out,) = run1(Cast(DType.BOOL), np.asarray([0.0, 2.0, -1.0], dtype=np.float32))
        np.testing.assert_array_equal(out, [False, True, True])
