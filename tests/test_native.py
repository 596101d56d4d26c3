"""Native C++ module tests: build, bit-exact parity with the numpy
dequant kernels, int8 quantizer parity."""

import struct

import numpy as np
import pytest

from whisper_tensor_tpu.packed_format import PackedFormat
from whisper_tensor_tpu.utils.native import (native_available,
                                             native_dequantize,
                                             native_quantize_int8)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def _numpy_dequant(data, fmt, n):
    import whisper_tensor_tpu.backends.cpu.dequant as dq

    fn = dq._DEQUANT_FNS[fmt]
    nblocks = n // fmt.block_size
    raw = np.frombuffer(data, dtype=np.uint8).reshape(nblocks, fmt.block_bytes)
    return fn(raw).reshape(-1).astype(np.float32)


@pytest.mark.parametrize("fmt", [PackedFormat.Q4_0, PackedFormat.Q4_1,
                                 PackedFormat.Q5_0, PackedFormat.Q5_1,
                                 PackedFormat.Q8_0, PackedFormat.Q8_1,
                                 PackedFormat.Q4_K, PackedFormat.Q6_K,
                                 PackedFormat.Q8_K])
def test_native_dequant_matches_numpy(fmt):
    rng = np.random.default_rng(hash(fmt.name) % 2**31)
    nblocks = 7
    n = nblocks * fmt.block_size
    data = rng.integers(0, 256, nblocks * fmt.block_bytes).astype(np.uint8)
    # keep f16 scale fields finite: clear the exponent-top bits
    data = data.copy()
    raw = data.reshape(nblocks, fmt.block_bytes)
    if fmt in (PackedFormat.Q4_0, PackedFormat.Q4_1, PackedFormat.Q5_0,
               PackedFormat.Q5_1, PackedFormat.Q8_0, PackedFormat.Q8_1):
        raw[:, 1] &= 0x3B
        if fmt in (PackedFormat.Q4_1, PackedFormat.Q5_1, PackedFormat.Q8_1):
            raw[:, 3] &= 0x3B
    elif fmt in (PackedFormat.Q4_K,):
        raw[:, 1] &= 0x3B
        raw[:, 3] &= 0x3B
    elif fmt is PackedFormat.Q6_K:
        raw[:, 209] &= 0x3B
    elif fmt is PackedFormat.Q8_K:
        raw[:, 3] &= 0x3B  # keep f32 d sane
    data = raw.tobytes()

    ref = _numpy_dequant(data, fmt, n)
    out = native_dequantize(data, fmt, n)
    assert out is not None
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_native_int8_quantize_matches_numpy():
    from whisper_tensor_tpu.backends.pallas.quant_matmul import quantize_int8

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 96)).astype(np.float32)
    qn, sn = quantize_int8(w)
    res = native_quantize_int8(w)
    assert res is not None
    qc, sc = res
    np.testing.assert_allclose(sc, sn, rtol=1e-6)
    np.testing.assert_array_equal(qc, qn)


def test_dequant_dispatch_uses_native():
    """The PackedTensor dequant path must route through the native lib
    when available and produce identical results either way."""
    import os

    from whisper_tensor_tpu.backends.cpu.dequant import dequantize_blocks
    from whisper_tensor_tpu.tensor import PackedTensor

    rng = np.random.default_rng(1)
    q = rng.integers(-100, 100, 64).astype(np.int8)
    data = b"".join(struct.pack("<e", 0.25) + q[i * 32:(i + 1) * 32].tobytes()
                    for i in range(2))
    t = PackedTensor(data, PackedFormat.Q8_0, (2, 32))
    out = t.dequantize().numpy()
    os.environ["WT_NO_NATIVE"] = "1"
    try:
        # force numpy path via a fresh call (module-level flag honored
        # inside native_dequantize's loader on first call only; compare
        # against the direct numpy kernel instead)
        ref = _numpy_dequant(data, PackedFormat.Q8_0, 64).reshape(2, 32)
    finally:
        os.environ.pop("WT_NO_NATIVE", None)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
