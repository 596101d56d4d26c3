"""NumericTensor: the backend-tagged tensor facade.

Equivalent of the reference's NumericTensor enum
(src/numeric_tensor.rs:45-57) redesigned for a JAX stack: a tensor is
either

  * ``numpy`` — host array, the CPU-oracle representation (bit-exact
    bf16/f16/f8 via ml_dtypes), or
  * ``jax``   — a jax.Array (possibly sharded across a Mesh).

Unlike the reference there is no per-op method surface here; compute
kernels live in ``backends.cpu.kernels`` (the oracle) and in the XLA
trace path (``backends.xla``), because on TPU the unit of execution is
a whole jitted graph, not a tensor method call. The facade's job is
identity, dtype bookkeeping, and host<->device movement.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import numpy as np

from .dtype import DType
from .packed_format import PackedFormat


class NumericTensor:
    __slots__ = ("_data", "_dtype", "_backend")

    def __init__(self, data: Any, dtype: Optional[DType] = None, backend: Optional[str] = None):
        if backend is None:
            backend = "jax" if _is_jax_array(data) else "numpy"
        if backend == "numpy":
            if dtype is None:
                data = np.asarray(data)
                dtype = DType.from_numpy(data.dtype)
            else:
                data = np.asarray(data, dtype=dtype.to_numpy())
        else:
            if dtype is None:
                dtype = DType.from_numpy(np.dtype(data.dtype))
        self._data = data
        self._dtype = dtype
        self._backend = backend

    # ------------------------------------------------------------------
    @staticmethod
    def from_numpy(arr: np.ndarray, dtype: Optional[DType] = None) -> "NumericTensor":
        return NumericTensor(np.asarray(arr), dtype=dtype, backend="numpy")

    @staticmethod
    def from_jax(arr, dtype: Optional[DType] = None) -> "NumericTensor":
        return NumericTensor(arr, dtype=dtype, backend="jax")

    @staticmethod
    def scalar(v, dtype: DType) -> "NumericTensor":
        return NumericTensor(np.asarray(v, dtype=dtype.to_numpy()), dtype=dtype)

    @staticmethod
    def zeros(shape: Sequence[int], dtype: DType) -> "NumericTensor":
        return NumericTensor(np.zeros(tuple(shape), dtype=dtype.to_numpy()), dtype=dtype)

    # ------------------------------------------------------------------
    @property
    def dtype(self) -> DType:
        return self._dtype

    @property
    def backend(self) -> str:
        return self._backend

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(int(d) for d in self._data.shape)

    @property
    def ndim(self) -> int:
        return len(self._data.shape)

    @property
    def size(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def raw(self) -> Any:
        """The underlying array (numpy or jax)."""
        return self._data

    # -- movement -------------------------------------------------------
    def numpy(self) -> np.ndarray:
        """Materialize on host as numpy (exact dtype via ml_dtypes)."""
        if self._backend == "numpy":
            return self._data
        return np.asarray(self._data).astype(self._dtype.to_numpy(), copy=False)

    def jax(self, device=None):
        """Materialize as a jax.Array (optionally on a device/sharding)."""
        import jax
        import jax.numpy as jnp

        if self._backend == "jax":
            arr = self._data
        else:
            if self._dtype is DType.STRING:
                raise ValueError("STRING tensors cannot move to device")
            arr = jnp.asarray(self._data, dtype=self._dtype.to_jax())
        if device is not None:
            arr = jax.device_put(arr, device)
        return arr

    def to_backend(self, backend: str) -> "NumericTensor":
        if backend == self._backend:
            return self
        if backend == "numpy":
            return NumericTensor.from_numpy(self.numpy(), self._dtype)
        if backend == "jax":
            return NumericTensor.from_jax(self.jax(), self._dtype)
        raise ValueError(f"unknown backend {backend}")

    # -- dtype ------------------------------------------------------------
    def astype(self, dtype: DType) -> "NumericTensor":
        if dtype == self._dtype:
            return self
        if self._backend == "numpy":
            if dtype is DType.BOOL:
                out = self._data.astype(np.bool_)
            else:
                out = self._data.astype(dtype.to_numpy())
            return NumericTensor.from_numpy(out, dtype)
        import jax.numpy as jnp

        return NumericTensor.from_jax(self._data.astype(dtype.to_jax()), dtype)

    # -- misc -------------------------------------------------------------
    def item(self):
        arr = self.numpy()
        return arr.reshape(()).item() if arr.size == 1 else arr

    def has_nan(self) -> bool:
        if not self._dtype.is_float:
            return False
        return bool(np.isnan(self.numpy().astype(np.float32)).any())

    def __repr__(self) -> str:
        return f"NumericTensor({self._dtype.name}, shape={self.shape}, backend={self._backend})"


class PackedTensor:
    """Raw-byte block-quantized tensor (GGUF formats) + dequantize.

    Equivalent of the reference's PackedTensor (src/packed_tensor.rs:16,96).
    Dequantization kernels live in ``backends.cpu.dequant`` (vectorized
    numpy, optionally accelerated by the native C++ module) and
    ``backends.pallas.dequant_matmul`` (fused on-device dequant-matmul).
    """

    __slots__ = ("data", "fmt", "shape")

    def __init__(self, data: bytes, fmt: PackedFormat, shape: Sequence[int]):
        self.data = data
        self.fmt = fmt
        self.shape = tuple(int(d) for d in shape)
        n = 1
        for d in self.shape:
            n *= d
        expect = fmt.storage_bytes(n)
        if len(data) != expect:
            raise ValueError(f"{fmt} tensor {self.shape}: got {len(data)} bytes, want {expect}")

    @property
    def num_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    def dequantize(self, dtype: DType = DType.F32) -> NumericTensor:
        from .backends.cpu.dequant import dequantize_blocks

        flat = dequantize_blocks(self.data, self.fmt, self.num_elements)
        out = flat.reshape(self.shape).astype(dtype.to_numpy())
        return NumericTensor.from_numpy(out, dtype)

    def __repr__(self) -> str:
        return f"PackedTensor({self.fmt.name}, shape={self.shape})"


def _is_jax_array(x) -> bool:
    mod = type(x).__module__
    return mod.startswith("jax") or type(x).__name__ == "ArrayImpl"


TensorLike = Union[NumericTensor, np.ndarray, int, float, bool]


def as_tensor(x: TensorLike, dtype: Optional[DType] = None) -> NumericTensor:
    if isinstance(x, NumericTensor):
        return x.astype(dtype) if dtype is not None else x
    return NumericTensor(np.asarray(x), dtype=dtype, backend=None if _is_jax_array(x) else "numpy")
